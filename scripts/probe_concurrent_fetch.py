"""Is the dev tunnel's ~29 ms per-fetch cost latency or occupancy?

If it is round-trip latency, several small fetches issued from different
threads should overlap (PJRT transfers release the GIL), and a serving
pipeline could hide the fetch entirely behind dispatch.  If the link
serializes transfers, threaded fetches take as long as sequential ones.

Run on the real chip:  timeout 600 python scripts/probe_concurrent_fetch.py
"""

import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)

SIZE = 10_240  # 40 KB fp32 — the (2, 512, 10) serve result scale
K = 8


@jax.jit
def make(x):
    return x * 2.0


bufs = [make(jnp.full((SIZE,), float(i))) for i in range(K)]
for b in bufs:
    np.asarray(b)  # warm: materialize + first fetch


def fetch(b):
    return np.asarray(jax.device_get(b))


for trial in range(3):
    bufs = [make(jnp.full((SIZE,), float(trial * K + i))) for i in range(K)]
    t0 = time.perf_counter()
    for b in bufs:
        fetch(b)
    serial = time.perf_counter() - t0

    bufs = [make(jnp.full((SIZE,), float(100 + trial * K + i))) for i in range(K)]
    with ThreadPoolExecutor(max_workers=K) as pool:
        t0 = time.perf_counter()
        list(pool.map(fetch, bufs))
        threaded = time.perf_counter() - t0

    bufs = [make(jnp.full((SIZE,), float(200 + trial * K + i))) for i in range(K)]
    with ThreadPoolExecutor(max_workers=2) as pool:
        t0 = time.perf_counter()
        list(pool.map(fetch, bufs))
        two = time.perf_counter() - t0

    print(
        f"trial {trial}: {K} fetches of {SIZE * 4 // 1024} KiB — "
        f"serial {serial * 1e3:.1f} ms ({serial / K * 1e3:.1f}/fetch), "
        f"8 threads {threaded * 1e3:.1f} ms, "
        f"2 threads {two * 1e3:.1f} ms",
        flush=True,
    )

# and copy_to_host_async: issue all, then collect
for trial in range(3):
    bufs = [make(jnp.full((SIZE,), float(300 + trial * K + i))) for i in range(K)]
    t0 = time.perf_counter()
    for b in bufs:
        b.copy_to_host_async()
    for b in bufs:
        np.asarray(b)
    asy = time.perf_counter() - t0
    print(
        f"trial {trial}: async-issue-then-collect {asy * 1e3:.1f} ms "
        f"({asy / K * 1e3:.1f}/fetch)",
        flush=True,
    )
