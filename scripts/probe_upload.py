"""Probe: how fast can the table H2D transfer actually go over the tunnel?

``jnp.asarray`` of the flagship 6.1 GB table measures ~22 MB/s end-to-end
(enqueue 154 s + a ~120 s async tail, bench_logs/r5b_bench_overlap.log) —
far below any realistic link limit.  This probe times, for a smaller table:

a) one big ``jnp.asarray`` (sync-fetched, so the FULL transfer is timed);
b) serial chunked ``jax.device_put`` + one device-side ``jnp.concatenate``;
c) the same chunks dispatched from N threads (concurrent streams);
d) chunked ``dynamic_update_slice`` into a preallocated device buffer
   (no 2x concat allocation).

Usage: timeout 900 python scripts/probe_upload.py [--gb 2] [--chunks 8]
"""

import argparse
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fastforward_tpu.index.base import Index as _Index  # noqa: E402

_Index._ensure_compile_cache()


def sync(x):
    np.asarray(x[(0,) * (x.ndim - 1) + (slice(0, 1),)])


def t(label, nbytes, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.1f}s  ({nbytes / dt / 1e6:.0f} MB/s)", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gb", type=float, default=2.0)
    ap.add_argument("--chunks", type=int, default=8)
    ap.add_argument("--threads", type=int, default=4)
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)

    DIM = 768
    rows = int(args.gb * (1 << 30) / (DIM * 4))
    rows -= rows % args.chunks
    nbytes = rows * DIM * 4
    data = np.random.default_rng(0).standard_normal((rows, DIM)).astype(
        np.float32
    )
    print(f"table: {rows} x {DIM} fp32 = {nbytes / 1e9:.2f} GB", flush=True)

    # (a) one big asarray, fully synced
    tab = t("a) one jnp.asarray (synced)", nbytes, lambda: _one(data))
    del tab

    # (b) serial chunks + concat
    cs = rows // args.chunks
    chunks = [data[i * cs : (i + 1) * cs] for i in range(args.chunks)]

    def _serial():
        devs = [jax.device_put(c) for c in chunks]
        out = jnp.concatenate(devs)
        sync(out)
        return out

    tab = t(f"b) {args.chunks} serial device_put + concat", nbytes, _serial)
    del tab

    # (c) threaded chunks + concat
    def _threaded():
        devs: list = [None] * args.chunks
        idxs = list(range(args.chunks))

        def worker(js):
            for j in js:
                devs[j] = jax.device_put(chunks[j])
                sync(devs[j])

        per = [idxs[i :: args.threads] for i in range(args.threads)]
        ths = [threading.Thread(target=worker, args=(p,)) for p in per]
        for th in ths:
            th.start()
        for th in ths:
            th.join()
        out = jnp.concatenate(devs)
        sync(out)
        return out

    tab = t(
        f"c) {args.chunks} chunks from {args.threads} threads + concat",
        nbytes,
        _threaded,
    )
    del tab

    # (d) chunked dynamic_update_slice into a preallocated buffer
    @jax.jit
    def place(buf, chunk, start):
        return jax.lax.dynamic_update_slice(
            buf, chunk, (start, jnp.int32(0))
        )

    def _dus():
        buf = jnp.zeros((rows, DIM), jnp.float32)
        for j in range(args.chunks):
            buf = place(buf, jax.device_put(chunks[j]), np.int32(j * cs))
        sync(buf)
        return buf

    tab = t(f"d) {args.chunks} chunks via dynamic_update_slice", nbytes, _dus)
    del tab


def _one(data):
    tab = jnp.asarray(data)
    sync(tab)
    return tab


if __name__ == "__main__":
    main()
