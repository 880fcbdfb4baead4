"""Serve-pipeline depth sweep + pure device time of the fused serve program.

Answers two questions the depth-2 profile can't:

1. What is the *device-only* time of one warm fused-serve execution (chain
   K dispatches with no host fetch in between, block once)?  This bounds
   the achievable QPS if every host round trip were hidden.
2. How does throughput scale with the number of in-flight submit_serve
   futures (depth 1/2/4/8/issue-all)?  The concurrent-fetch probe showed
   in-flight tunnel transfers overlap almost perfectly (3.7 ms/fetch for
   8 concurrent vs 23 ms serial), so deeper pipelines should approach the
   device bound.

Usage: timeout 1200 python scripts/probe_serve_depth.py [--n 200000]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

parser = argparse.ArgumentParser()
parser.add_argument("--n", type=int, default=200_000)
parser.add_argument("--q", type=int, default=512)
parser.add_argument("--depth", type=int, default=1000)
parser.add_argument("--dim", type=int, default=768)
parser.add_argument("--iters", type=int, default=16)
parser.add_argument("--refine", type=int, default=22)
args = parser.parse_args()

import jax  # noqa: E402

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
    LambdaEncoder(lambda q: qmap[q]),
    mode=Mode.PASSAGE,
    precision="high",
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
ranking = Ranking.from_run(run, queries=queries)

t0 = time.perf_counter()
index.preload(warm=(args.q, args.depth))
print(f"preload: {time.perf_counter() - t0:.1f}s", flush=True)

ALPHA, CUTOFF = 0.2, 10
index.serve(ranking, ALPHA, CUTOFF, refine=args.refine)  # compile + plan
index.serve(ranking, ALPHA, CUTOFF, refine=args.refine)

# --- 1. pure device time: chain K dispatches, block once -----------------
# submit_serve with the fetch deferred; never call result() until the end.
for chained in (4, args.iters):
    futs = []
    t0 = time.perf_counter()
    for _ in range(chained):
        futs.append(
            index.submit_serve(ranking, ALPHA, CUTOFF, refine=args.refine)
        )
    t_issue = time.perf_counter() - t0
    outs = [f.result() for f in futs]
    dt = time.perf_counter() - t0
    assert all(o is not None for o in outs)
    print(
        f"issue-all x{chained}: issue {t_issue * 1e3:.1f} ms, "
        f"total {dt:.3f}s -> {args.q * chained / dt:.1f} QPS "
        f"({dt / chained * 1e3:.1f} ms/call)",
        flush=True,
    )

# --- 2. pipeline depth sweep ---------------------------------------------
for depth in (1, 2, 4, 8):
    # warm one round
    fut = index.submit_serve(ranking, ALPHA, CUTOFF, refine=args.refine)
    fut.result()
    pending = []
    t0 = time.perf_counter()
    for _ in range(args.iters):
        pending.append(
            index.submit_serve(ranking, ALPHA, CUTOFF, refine=args.refine)
        )
        if len(pending) >= depth:
            pending.pop(0).result()
    for f in pending:
        f.result()
    dt = time.perf_counter() - t0
    print(
        f"pipeline depth {depth}: {args.iters} calls in {dt:.3f}s -> "
        f"{args.q * args.iters / dt:.1f} QPS "
        f"({dt / args.iters * 1e3:.1f} ms/call)",
        flush=True,
    )
print("rc=0", flush=True)
