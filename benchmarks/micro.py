"""Microbenchmarks isolating device, transfer, and host costs.

Run on the TPU host:  python benchmarks/micro.py [--n 500000]
Prints one line per measurement (stderr-free, machine-parsable).
"""

import argparse
import sys
import time
import os
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

try:
    from fastforward_tpu.index.base import Index as _Index

    _Index._ensure_compile_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

from fastforward_tpu import ops  # noqa: E402


def timeit(name, fn, reps=20, warmup=2):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt * 1000:.2f} ms")
    return dt


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=500_000)
    parser.add_argument("--pairs", type=int, default=262_144)
    parser.add_argument("--dim", type=int, default=768)
    args = parser.parse_args()

    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    n_pad = -(-args.n // 4096) * 4096
    table = jnp.asarray(
        rng.normal(size=(n_pad, args.dim // 128, 128)).astype(np.float32)
    )
    table.block_until_ready()

    q = np.zeros((256, args.dim), np.float32)
    sb = args.pairs
    idx_host = np.zeros((2, sb), dtype=np.int32)
    idx_host[0] = rng.integers(0, args.n, size=sb)
    idx_host[1] = (rng.integers(0, 256, size=sb) << 8) | 1
    idx_dev = jnp.asarray(idx_host)
    q_dev = jnp.asarray(q)

    # RTT floor
    @jax.jit
    def tiny(x):
        return x + 1.0

    x = jnp.zeros((8, 128), jnp.float32)
    tiny(x).block_until_ready()
    timeit("tiny exec-only (RTT floor)", lambda: tiny(x).block_until_ready())

    # exec-only scoring (device-resident args, no fetch)
    out = ops.score_pairs_grouped(table, q_dev, idx_dev, "first")
    out.block_until_ready()
    timeit(
        "score exec-only (P=262144)",
        lambda: ops.score_pairs_grouped(table, q_dev, idx_dev, "first")
        .block_until_ready(),
        reps=10,
    )
    bytes_read = args.pairs * args.dim * 4
    dt = timeit(
        "score exec-only again",
        lambda: ops.score_pairs_grouped(table, q_dev, idx_dev, "first")
        .block_until_ready(),
        reps=10,
    )
    print(f"  -> effective gather bandwidth ~{bytes_read / dt / 1e9:.0f} GB/s")

    # transfer costs
    timeit("upload idx (2 MB)", lambda: jnp.asarray(idx_host).block_until_ready(), reps=10)
    timeit("upload qvecs (0.75 MB)", lambda: jnp.asarray(q).block_until_ready(), reps=10)
    timeit(
        "fetch scores (1 MB)",
        lambda: np.asarray(
            ops.score_pairs_grouped(table, q_dev, idx_dev, "first")
        ),
        reps=10,
    )

    # full call with host-resident inputs (what Index.__call__ pays)
    timeit(
        "score with np args + fetch",
        lambda: np.asarray(
            ops.score_pairs_grouped(table, q, idx_host, "first")
        ),
        reps=10,
    )




def n_scaling_probe():
    """Is gather runtime N-dependent? Same P, two table sizes."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(np.zeros((256, 768), np.float32))
    sb = 262_144
    for n in (102_400, 503_808):
        table = jnp.asarray(
            rng.normal(size=(n, 6, 128)).astype(np.float32)
        )
        table.block_until_ready()
        rows = jnp.asarray(rng.integers(0, n, size=sb).astype(np.int32))
        bounds = jnp.asarray(
            np.full(256, sb // 256, np.int32).cumsum().astype(np.int32)
        )
        out = ops.score_pairs_bounded(table, q, rows, bounds)
        np.asarray(out[:8])  # force
        timeit(
            f"exec-forced bounded N={n}",
            lambda: np.asarray(
                ops.score_pairs_bounded(table, q, rows, bounds)[:8]
            ),
            reps=10,
        )
        del table


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        n_scaling_probe()
    else:
        main()
