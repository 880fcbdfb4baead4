"""Build the native runtime (g++ -> shared object), with caching.

The .so is rebuilt automatically when the source is newer than the binary;
failures degrade gracefully (callers fall back to the pure-python maps).
"""

import logging
import subprocess
from pathlib import Path

LOGGER = logging.getLogger(__name__)

_HERE = Path(__file__).parent
_SOURCE = _HERE / "idmap.cc"
_LIB = _HERE / "_idmap.so"


def build_idmap() -> Path | None:
    """Compile (if needed) and return the shared-object path, or ``None``."""
    if _LIB.exists() and _LIB.stat().st_mtime >= _SOURCE.stat().st_mtime:
        return _LIB
    cmd = [
        "g++",
        "-O3",
        "-std=c++20",
        "-shared",
        "-fPIC",
        "-o",
        str(_LIB),
        str(_SOURCE),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        LOGGER.info("built native idmap: %s", _LIB)
        return _LIB
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        LOGGER.warning("native idmap build failed (%s); using python fallback", e)
        return None
