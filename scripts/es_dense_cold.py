"""Apples-to-apples ES vs dense at depth-5000: fresh-ranking (cold) and
repeated-ranking (warm) QPS for both engines on the real chip.

The round-4 verdict compared ES *cold* (fresh ranking per call) against
the dense fused-serve row — but that dense row reuses one plan-cached
ranking, i.e. it is a WARM number.  This script measures the full 2x2 at
the depth-5000 workload (the regime early stopping exists for, reference
``index/base.py:316-387``):

  dense cold  — fresh Ranking per call, full __call__ (scores all pairs)
  dense warm  — same ranking repeated (plan-cached)
  ES cold     — fresh Ranking per call, cutoff-10, depths (200,1k,5k)
  ES warm     — same ranking repeated (per-ranking ES state)

Usage: timeout 3000 python scripts/es_dense_cold.py [--n 2000000]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import os  # noqa: E402

import jax  # noqa: E402

_p = os.environ.get("JAX_PLATFORMS")
if _p and "," not in _p:
    jax.config.update("jax_platforms", _p)

parser = argparse.ArgumentParser()
parser.add_argument("--n", type=int, default=2_000_000)
parser.add_argument("--q", type=int, default=512)
parser.add_argument("--depth", type=int, default=5000)
parser.add_argument("--dim", type=int, default=768)
parser.add_argument("--repeats", type=int, default=8)
args = parser.parse_args()

print("backend:", jax.default_backend(), flush=True)

from fastforward_tpu.encoder import LambdaEncoder  # noqa: E402
from fastforward_tpu.index import InMemoryIndex, Mode  # noqa: E402
from fastforward_tpu.ranking import Ranking  # noqa: E402

rng = np.random.default_rng(0)
corpus = rng.normal(size=(args.n, args.dim)).astype(np.float32)
qvecs = rng.normal(size=(args.q, args.dim)).astype(np.float32)
queries = {f"q{i}": f"query {i}" for i in range(args.q)}
qmap = {f"query {i}": qvecs[i] for i in range(args.q)}

index = InMemoryIndex(
    LambdaEncoder(lambda q: qmap[q]), mode=Mode.PASSAGE, precision="high"
)
index.add(corpus, psg_ids=[f"p{i}" for i in range(args.n)])

run = {
    f"q{i}": {
        f"p{j}": float(args.depth - k)
        for k, j in enumerate(
            rng.choice(args.n, size=args.depth, replace=False)
        )
    }
    for i in range(args.q)
}

t0 = time.perf_counter()
index.preload(warm=(args.q, args.depth))
print(f"preload: {time.perf_counter() - t0:.1f}s", flush=True)

kw_es = dict(
    early_stopping=10,
    early_stopping_alpha=0.2,
    early_stopping_depths=(200, 1000, args.depth),
)


def rate(label, fn, rankings):
    t0 = time.perf_counter()
    for r in rankings:
        fn(r)
    dt = time.perf_counter() - t0
    qps = args.q * len(rankings) / dt
    print(f"{label:28s} {qps:9.1f} QPS  ({dt:.3f}s / {len(rankings)} calls)",
          flush=True)
    return qps


results = {}
for label, fn in (
    ("dense", lambda r: index(r)),
    ("ES", lambda r: index(r, **kw_es)),
):
    # compile + warm off the timed path
    fn(Ranking.from_run(run, queries=queries))
    fresh = [
        Ranking.from_run(run, queries=queries) for _ in range(args.repeats)
    ]
    results[f"{label} cold"] = rate(f"{label} cold (fresh ranking)", fn, fresh)
    same = Ranking.from_run(run, queries=queries)
    fn(same)
    fn(same)
    results[f"{label} warm"] = rate(
        f"{label} warm (same ranking)", fn, [same] * args.repeats
    )

print(flush=True)
print(
    "crossover: ES/dense cold "
    f"{results['ES cold'] / results['dense cold']:.2f}x, warm "
    f"{results['ES warm'] / results['dense warm']:.2f}x",
    flush=True,
)
print("rc=0", flush=True)
