"""Stage breakdown of one BatchingServer round (bench --config server).

The server bench coalesces 64 x 8-query requests into one merged fused
serve call per round; every round gets fresh namespace tags, so the serve
plan cache misses and the call pays the full cold-plan cost.  This script
times the stages of that cold path:

  merge      concat + q_id namespacing of 64 request frames (host)
  cold serve submit_serve on the merged ranking (plan build + dispatch)
  wait       result fetch + per-request split
  warm serve the same merged ranking again (plan cache hit) as contrast

Usage: timeout 1200 python scripts/profile_server.py [--n 200000]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).parent.parent))

parser = argparse.ArgumentParser()
parser.add_argument("--n", type=int, default=200_000)
parser.add_argument("--q", type=int, default=512)
parser.add_argument("--req-q", type=int, default=8)
parser.add_argument("--depth", type=int, default=1000)
parser.add_argument("--dim", type=int, default=768)
parser.add_argument("--iters", type=int, default=5)
args = parser.parse_args()

import jax  # noqa: E402

print("backend:", jax.default_backend(), flush=True)

from fastforward_tpu.encoder import LambdaEncoder  # noqa: E402
from fastforward_tpu.index import InMemoryIndex, Mode  # noqa: E402
from fastforward_tpu.ranking import Ranking, _plain_ids  # noqa: E402
from fastforward_tpu.utils.serving import _SEP  # noqa: E402

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
requests = []
q_ids = list(run)
for start in range(0, len(q_ids), args.req_q):
    chunk = q_ids[start : start + args.req_q]
    requests.append(
        Ranking.from_run(
            {q: run[q] for q in chunk},
            queries={q: queries[q] for q in chunk},
        )
    )
print(f"{len(requests)} requests x {args.req_q} queries", flush=True)

ALPHA, CUTOFF = 0.2, 10
t0 = time.perf_counter()
index.preload(warm=(args.q, args.depth), serve=(ALPHA, CUTOFF))
print(f"preload: {time.perf_counter() - t0:.1f}s", flush=True)

seq = 0


def merge(batch):
    global seq
    frames = []
    for r in sorted(
        batch, key=lambda r: r._tag, reverse=True
    ):
        df = _plain_ids(r.ranking._df)[["q_id", "id", "score", "query"]]
        frames.append(df.assign(q_id=r._tag + _SEP + df["q_id"]))
    return Ranking._from_trusted_frame(
        pd.concat(frames, ignore_index=True), None
    )


class _Req:
    def __init__(self, ranking, tag):
        self.ranking = ranking
        self._tag = tag


def timed(label, fn, iters=args.iters):
    best, out = float("inf"), None
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:>12}: {best * 1e3:8.2f} ms (best of {iters})", flush=True)
    return out


for it in range(args.iters):
    batch = [_Req(r, f"{seq + i:012d}") for i, r in enumerate(requests)]
    seq += len(batch)
    t0 = time.perf_counter()
    merged = merge(batch)
    t_merge = time.perf_counter() - t0
    t0 = time.perf_counter()
    fut = index.submit_serve(merged, ALPHA, CUTOFF)
    t_disp = time.perf_counter() - t0
    t0 = time.perf_counter()
    served = fut.result()
    t_wait = time.perf_counter() - t0
    t0 = time.perf_counter()
    served2 = index.serve(merged, ALPHA, CUTOFF)
    t_warm = time.perf_counter() - t0
    print(
        f"round {it}: merge {t_merge * 1e3:7.1f} ms | cold dispatch "
        f"{t_disp * 1e3:7.1f} ms | wait {t_wait * 1e3:7.1f} ms | "
        f"warm repeat {t_warm * 1e3:7.1f} ms",
        flush=True,
    )

# where does the cold dispatch go? time sub-steps on a fresh namespace
batch = [_Req(r, f"{seq + i:012d}") for i, r in enumerate(requests)]
merged = merge(batch)
df = merged._df
t0 = time.perf_counter()
prep = index._candidate_arrays(df)
print(
    f"candidate_arrays: {(time.perf_counter() - t0) * 1e3:.1f} ms",
    flush=True,
)
print("rc=0", flush=True)
