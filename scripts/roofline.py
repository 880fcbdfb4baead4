"""Measure the flagship serve call's device-busy fraction (roofline).

The steady pipelined serve call costs ~20-26 ms of wall at the flagship
shape, but the DEVICE work is a bf16 candidate scan + a tiny fp32 rescore
— bandwidth math says ~1 ms on a v5e.  This script separates the two on
the real chip without trusting ``block_until_ready`` (which returns before
execution on the tunnel runtime):

- dispatch K submit_serve calls back-to-back and fetch ONLY the last
  result; the wall-clock slope over K is the per-call device + dispatch
  cost (the fetch and its RTT are paid once);
- contrast K=1 (one RTT + one device pass) with K=8/16/32.

Writes the numbers the ARCHITECTURE.md roofline table cites.

Usage: timeout 1750 python scripts/roofline.py [--n 2000000]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

parser = argparse.ArgumentParser()
parser.add_argument("--n", type=int, default=2_000_000)
parser.add_argument("--q", type=int, default=512)
parser.add_argument("--depth", type=int, default=1000)
parser.add_argument("--dim", type=int, default=768)
args = parser.parse_args()

import os  # noqa: E402

import jax  # noqa: E402

# honor an explicit JAX_PLATFORMS=cpu even under the sitecustomize that
# pins the tunnel backend (the env var alone is overridden)
_p = os.environ.get("JAX_PLATFORMS")
if _p and "," not in _p:
    jax.config.update("jax_platforms", _p)

from fastforward_tpu import Ranking  # noqa: E402
from fastforward_tpu.encoder import LambdaEncoder  # noqa: E402
from fastforward_tpu.index import InMemoryIndex, Mode  # noqa: E402
from fastforward_tpu.index.base import Index as _Index  # noqa: E402

_Index._ensure_compile_cache()
print("backend:", jax.default_backend(), flush=True)

N, Q, DEPTH, DIM = args.n, args.q, args.depth, args.dim
rng = np.random.default_rng(0)
corpus = rng.standard_normal((N, DIM), dtype=np.float32)
qvecs = rng.standard_normal((Q, DIM), dtype=np.float32)
queries = {f"q{i:04d}": f"query {i}" for i in range(Q)}
by_text = {f"query {i}": qvecs[i] for i in range(Q)}

index = InMemoryIndex(
    LambdaEncoder(lambda t: by_text[t]),
    mode=Mode.PASSAGE,
    precision="high",
)
index.add(corpus, psg_ids=[f"p{i}" for i in range(N)])

t0 = time.perf_counter()
index.preload(warm=(Q, DEPTH), serve=(0.2, 10, 22))
print(f"preload: {time.perf_counter() - t0:.1f}s", flush=True)

# one ranking per in-flight slot (distinct plans, like production traffic)
import pandas as pd  # noqa: E402

rankings = []
# stay within the plan cache (Index._MAX_PLANS = 4): the sweep must
# measure the device program, not plan rebuilds
for s in range(4):
    pos = (np.arange(Q * DEPTH, dtype=np.int64) * N) // (Q * DEPTH)
    pos = (pos + s * 997) % N  # distinct candidate sets per slot
    frame = pd.DataFrame(
        {
            "q_id": np.repeat(
                [f"q{i:04d}" for i in range(Q - 1, -1, -1)], DEPTH
            ),
            "id": [f"p{p}" for p in pos],
            "score": np.tile(
                np.arange(DEPTH, 0, -1, dtype=np.float32), Q
            ),
        }
    )
    rankings.append(
        Ranking(frame, queries=queries, copy=False, is_sorted=True)
    )

# warm every plan once (candidate resolution + uploads off the timed path)
for r in rankings:
    index.serve(r, 0.2, 10, refine=22)

# K-sweep: dispatch K, fetch only the last
print("\nK-sweep (dispatch K submit_serve, fetch last only):", flush=True)
results = {}
for K in (1, 2, 4, 8, 16, 32):
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        futs = [index.submit_serve(rankings[i % 4], 0.2, 10, refine=22)
                for i in range(K)]
        futs[-1].result()
        best = min(best, time.perf_counter() - t0)
    results[K] = best
    print(f"  K={K:>2}: {best * 1000:8.1f} ms  ({best * 1000 / K:6.2f} ms/call)",
          flush=True)

ks = sorted(results)
# slope between the two largest K values = marginal per-call cost with the
# RTT fully amortized
k1, k2 = ks[-2], ks[-1]
slope_ms = (results[k2] - results[k1]) / (k2 - k1) * 1000
print(f"\nmarginal per-call cost (K={k1}->{k2} slope): {slope_ms:.2f} ms")
print(f"fixed cost (K=1 intercept): {results[1] * 1000:.1f} ms")

# bandwidth math
cand_bytes_bf16 = Q * DEPTH * DIM * 2
rescore_rows = Q * (10 + 22)
rescore_bytes = rescore_rows * DIM * 4
bw = 819e9  # v5e HBM GB/s
print(
    f"\nbandwidth floor: bf16 scan {cand_bytes_bf16 / 2**20:.0f} MiB "
    f"-> {cand_bytes_bf16 / bw * 1000:.2f} ms; fp32 rescore "
    f"{rescore_bytes / 2**20:.1f} MiB -> {rescore_bytes / bw * 1000:.3f} ms"
)
print(
    f"device-busy fraction at steady state: "
    f"{slope_ms:.2f} ms marginal / {results[1] * 1000:.1f} ms solo call; "
    f"HBM floor {(cand_bytes_bf16 + rescore_bytes) / bw * 1000:.2f} ms "
    f"=> scan efficiency "
    f"{(cand_bytes_bf16 + rescore_bytes) / bw * 1000 / max(slope_ms, 1e-9) * 100:.0f}%"
)
