"""Micro-benchmark of the device->host link feeding the serving path.

Times one-shot and chunked fetches of fresh device buffers at the
flagship score-fetch size (512k pairs) across dtypes and chunk counts.
Findings on the axon dev tunnel (2026-08-18, best-of-4, high variance):

  - large FIXED cost per fetch (~29 ms) + ~19 ms/MB marginal
  - time scales with LOGICAL bytes (u16 ships 2 B/elem, not padded):
    f32 2 MB one-shot 67.7 ms, u16 1 MB 45.7 ms, u8 0.5 MB 37.3 ms
  - threaded chunk waits don't beat sequential (single stream saturates)
  - host work inside on_chunk stalls transfer progress ~1:1 (overlap
    hides nothing ON THIS LINK; PCIe-local hosts do overlap)

These motivated `score_transport="u16"` with the in-band header
(`ops.encode_scores_u16`) and bound what fetch scheduling can win.

Usage: timeout 580 python scripts/bench_fetch.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fastforward_tpu import ops  # noqa: E402

print("backend:", jax.default_backend(), flush=True)

N = 512 * 1000
ITERS = 4


@jax.jit
def make(seed):
    k = jax.random.key(seed)
    x = jax.random.normal(k, (N,), dtype=jnp.float32)
    u16 = jnp.clip(jnp.round((x + 6) * 5000), 0, 65535).astype(jnp.uint16)
    u8 = (u16 >> 8).astype(jnp.uint8)
    return x, u16, u8


np.asarray(make(0)[0][:1])
seed = [100]


def fresh(i):
    a = make(seed[0])[i]
    seed[0] += 1
    np.asarray(a[:1])  # sync execution out of the timed region
    return a


def timed(label, fn):
    best = min(fn() for _ in range(ITERS))
    print(f"{label:>26}: {best * 1e3:8.2f} ms", flush=True)


def one_shot(i):
    a = fresh(i)
    t0 = time.perf_counter()
    np.asarray(jax.device_get(a))
    return time.perf_counter() - t0


def chunked(i, chunks):
    a = fresh(i)
    t0 = time.perf_counter()
    ops.fetch_np_overlapped(a, chunks=chunks)
    return time.perf_counter() - t0


for i, name in ((0, "f32 2MB"), (1, "u16 1MB"), (2, "u8 0.5MB")):
    timed(f"{name} one-shot", lambda i=i: one_shot(i))
for i, name in ((0, "f32 2MB"), (1, "u16 1MB")):
    for c in (4, 8, 16):
        timed(f"{name} chunks={c}", lambda i=i, c=c: chunked(i, c))
print("rc=0", flush=True)
