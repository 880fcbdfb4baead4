"""ES vs dense at depth-5000: the cold (fresh-ranking) crossover.

The regime early stopping exists for (reference ``index/base.py:316-387``):
deep candidate lists where most of the work can be skipped.  Measures both
engines with the SAME protocol — a fresh ``Ranking`` object per call (no
per-ranking plan/state reuse) — plus the warm contrast.

Run AFTER the depth-5000 benches so the program shapes are compiled.

Usage: timeout 1750 python scripts/es_crossover.py [--n 2000000]
"""

import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402

_p = os.environ.get("JAX_PLATFORMS")
if _p and "," not in _p:
    jax.config.update("jax_platforms", _p)

from fastforward_tpu import Ranking  # noqa: E402
from fastforward_tpu.encoder import LambdaEncoder  # noqa: E402
from fastforward_tpu.index import InMemoryIndex, Mode  # noqa: E402
from fastforward_tpu.index.base import Index as _Index  # noqa: E402

_Index._ensure_compile_cache()

parser = argparse.ArgumentParser()
parser.add_argument("--n", type=int, default=2_000_000)
parser.add_argument("--q", type=int, default=512)
parser.add_argument("--depth", type=int, default=5000)
parser.add_argument("--repeats", type=int, default=3)
args = parser.parse_args()
print("backend:", jax.default_backend(), flush=True)

N, Q, DEPTH = args.n, args.q, args.depth
DIM = 768
rng = np.random.default_rng(0)
corpus = rng.standard_normal((N, DIM), dtype=np.float32)
qvecs = rng.standard_normal((Q, DIM), dtype=np.float32)
by_text = {f"query {i}": qvecs[i] for i in range(Q)}
queries = {f"q{i}": f"query {i}" for i in range(Q)}
run = {
    f"q{i}": {
        f"p{c}": float(DEPTH - j)
        for j, c in enumerate(rng.choice(N, size=DEPTH, replace=False))
    }
    for i in range(Q)
}

index = InMemoryIndex(
    LambdaEncoder(lambda t: by_text[t]), mode=Mode.PASSAGE, precision="high"
)
index.add(corpus, psg_ids=[f"p{i}" for i in range(N)])
t0 = time.perf_counter()
index.preload(warm=(Q, DEPTH), serve=(0.2, 10, 22))
print(f"preload: {time.perf_counter() - t0:.1f}s", flush=True)

kw = dict(
    early_stopping=10,
    early_stopping_alpha=0.2,
    early_stopping_depths=(200, 1000, 5000),
)

# untimed shape warm for both paths on REAL-spread rankings
t0 = time.perf_counter()
index(Ranking.from_run(run, queries=queries), **kw)
print(f"ES shape warm: {time.perf_counter() - t0:.1f}s", flush=True)
t0 = time.perf_counter()
index.serve(Ranking.from_run(run, queries=queries), 0.2, 10, refine=22)
print(f"dense shape warm: {time.perf_counter() - t0:.1f}s", flush=True)

R = args.repeats
for label, fn in (
    ("ES   cold", lambda r: index(r, **kw)),
    ("dense cold", lambda r: index.serve(r, 0.2, 10, refine=22)),
):
    rankings = [Ranking.from_run(run, queries=queries) for _ in range(R)]
    t0 = time.perf_counter()
    for r in rankings:
        fn(r)
    dt = time.perf_counter() - t0
    print(f"{label} (fresh ranking/call): {Q * R / dt:8.1f} QPS "
          f"({dt / R * 1000:.0f} ms/call)", flush=True)

for label, fn in (
    ("ES   warm", lambda r: index(r, **kw)),
    ("dense warm", lambda r: index.serve(r, 0.2, 10, refine=22)),
):
    r = Ranking.from_run(run, queries=queries)
    for _ in range(2):
        fn(r)
    t0 = time.perf_counter()
    for _ in range(R):
        fn(r)
    dt = time.perf_counter() - t0
    print(f"{label} (same ranking repeated): {Q * R / dt:8.1f} QPS "
          f"({dt / R * 1000:.0f} ms/call)", flush=True)
