"""Tunnel fetch micro-benchmark: chunk count x sequential/threaded waits.

A fresh device buffer per measurement (the tunnel caches host copies of
previously-fetched buffers), sized like the flagship score fetch
(512k f32 = 2 MB).
"""

import concurrent.futures as cf
import time

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

N = 512 * 1000
ITERS = 5


@jax.jit
def make(seed):
    k = jax.random.key(seed)
    return jax.random.normal(k, (N,), dtype=jnp.float32)


# warm compile
np.asarray(make(0))

from fastforward_tpu.ops.scoring import _split_even  # noqa: E402

seed = [100]


def fresh():
    s = seed[0]
    seed[0] += 1
    a = make(s)
    # ensure computed before timing the fetch: fetch 1 element via a
    # separate tiny slice (cheap, sync point)
    np.asarray(a[:1])
    return a


def t_oneshot():
    a = fresh()
    t0 = time.perf_counter()
    np.asarray(jax.device_get(a))
    return time.perf_counter() - t0


def t_chunks(k, threaded=False):
    a = fresh()
    step = -(-N // k)
    bounds = tuple(min(i * step, N) for i in range(k + 1))
    t0 = time.perf_counter()
    parts = _split_even(a, bounds)
    for p in parts:
        p.copy_to_host_async()
    if threaded:
        with cf.ThreadPoolExecutor(max_workers=min(k, 8)) as ex:
            list(ex.map(np.asarray, parts))
    else:
        for p in parts:
            np.asarray(p)
    return time.perf_counter() - t0


def report(label, fn):
    best = min(fn() for _ in range(ITERS))
    mb = N * 4 / 1e6
    print(f"{label:>24}: {best * 1e3:8.2f} ms  ({mb / best:6.1f} MB/s)", flush=True)


report("one-shot device_get", t_oneshot)
for k in (2, 4, 8, 16, 32):
    report(f"chunks={k} seq", lambda k=k: t_chunks(k))
for k in (2, 4, 8, 16):
    report(f"chunks={k} threaded", lambda k=k: t_chunks(k, threaded=True))
print("rc=0", flush=True)
