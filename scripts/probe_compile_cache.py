"""Probe whether the persistent XLA compilation cache works on this backend.

``bench.py`` configures ``jax_compilation_cache_dir`` every run, yet
``.jax_cache`` never materializes on the TPU backend — so every process
pays the full remote compile (the flagship warm is minutes).  This probe
compiles one tiny program with compilation-cache DEBUG logging and
reports whether the backend served / wrote the cache, and why not if it
didn't (e.g. the PJRT plugin not supporting executable serialization).

Run twice: the second run should be a cache HIT if persistence works.
"""

import logging
import sys
import time
from pathlib import Path

logging.basicConfig(level=logging.WARNING)
for name in ("jax._src.compilation_cache", "jax._src.compiler"):
    logging.getLogger(name).setLevel(logging.DEBUG)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

CACHE = Path(__file__).resolve().parent.parent / ".jax_cache"
jax.config.update("jax_compilation_cache_dir", str(CACHE))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

print(f"backend: {jax.default_backend()} devices: {jax.devices()}")
t0 = time.perf_counter()
f = jax.jit(lambda x: (x @ x).sum())
out = f(jnp.ones((512, 512), jnp.float32))
print(f"result fetch: {float(out):.1f} (sync point)")
print(f"compile+run: {time.perf_counter() - t0:.2f}s")
entries = sorted(p.name for p in CACHE.glob("*")) if CACHE.exists() else []
print(f"cache dir exists: {CACHE.exists()}, entries: {len(entries)}")
for e in entries[:5]:
    print(f"  {e}")
sys.exit(0)
