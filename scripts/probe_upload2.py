"""Probe 2: chunk-size sweet spot + donated in-place placement.

probe_upload.py: one big ``jnp.asarray`` = 6 MB/s; 8 serial 269 MB
``device_put`` + concat = 60 MB/s; threads and non-donated
``dynamic_update_slice`` slower.  Open questions:

1. chunk-size sweep for serial device_put (+ concat);
2. DONATED dynamic_update_slice (true in-place: peak HBM = table + chunk,
   needed so the overlapped preload never holds 3x the table while the
   zeros-twin is alive).

Usage: timeout 1200 python scripts/probe_upload2.py [--gb 2]
"""

import argparse
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fastforward_tpu.index.base import Index as _Index  # noqa: E402

_Index._ensure_compile_cache()


def sync(x):
    np.asarray(x[0, :1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gb", type=float, default=2.0)
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)

    DIM = 768
    row_bytes = DIM * 4
    rows = int(args.gb * (1 << 30) / row_bytes)
    rows -= rows % 1024
    nbytes = rows * row_bytes
    data = np.random.default_rng(0).standard_normal((rows, DIM)).astype(
        np.float32
    )
    print(f"table: {rows} x {DIM} fp32 = {nbytes / 1e9:.2f} GB", flush=True)

    for mb in (64, 128, 256, 512):
        cs = (mb << 20) // row_bytes
        bounds = list(range(0, rows, cs))

        t0 = time.perf_counter()
        devs = [jax.device_put(data[b : b + cs]) for b in bounds]
        out = jnp.concatenate(devs)
        sync(out)
        dt = time.perf_counter() - t0
        print(
            f"serial device_put {mb:>4} MB x{len(bounds):>3} + concat: "
            f"{dt:6.1f}s  ({nbytes / dt / 1e6:.0f} MB/s)",
            flush=True,
        )
        del devs, out

    # donated in-place placement at the best-looking chunk size
    @partial(jax.jit, donate_argnums=(0,))
    def place(buf, chunk, start):
        return jax.lax.dynamic_update_slice(buf, chunk, (start, jnp.int32(0)))

    cs = rows // 8  # divides rows exactly: no ragged tail in the probe
    t0 = time.perf_counter()
    buf = jnp.zeros((rows, DIM), jnp.float32)
    for b in range(0, rows, cs):
        buf = place(buf, jax.device_put(data[b : b + cs]), np.int32(b))
    sync(buf)
    dt = time.perf_counter() - t0
    print(
        f"donated dus {cs * row_bytes >> 20:>4} MB x  8         : "
        f"{dt:6.1f}s  ({nbytes / dt / 1e6:.0f} MB/s)",
        flush=True,
    )
    del buf


if __name__ == "__main__":
    main()
