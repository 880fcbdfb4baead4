"""Stage breakdown of the BatchingServer ARRAY path (no threads).

Calls the server's internals directly on one thread to attribute the
per-batch cost: per-request prep (client-side), merged dispatch
(``Index._serve_arrays``), result fetch, and per-request fanout —
contrasted with the legacy frame path (merge + ``submit_serve``).

Usage: timeout 1750 python scripts/profile_server_arrays.py [--n 200000]
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
parser.add_argument("--iters", type=int, default=6)
args = parser.parse_args()

import os  # noqa: E402

import jax  # noqa: E402

# honor an explicit JAX_PLATFORMS=cpu even under the sitecustomize that
# pins the tunnel backend (the env var alone is overridden)
_p = os.environ.get("JAX_PLATFORMS")
if _p and "," not in _p:
    jax.config.update("jax_platforms", _p)

print("backend:", jax.default_backend(), flush=True)

from fastforward_tpu.encoder import LambdaEncoder  # noqa: E402
from fastforward_tpu.index import InMemoryIndex, Mode  # noqa: E402
from fastforward_tpu.ranking import Ranking, _plain_ids  # noqa: E402
from fastforward_tpu.utils.serving import _SEP, BatchingServer  # noqa: E402

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

for it in range(args.iters):
    t0 = time.perf_counter()
    preps = [index._serve_prep(r) for r in requests]
    t_prep = time.perf_counter() - t0
    assert all(p is not None for p in preps), "prep fell back!"
    t0 = time.perf_counter()
    finish = index._serve_arrays(preps, ALPHA, CUTOFF)
    t_dispatch = time.perf_counter() - t0
    assert finish is not None, "array serve fell back!"
    t0 = time.perf_counter()
    vals, idx = finish()
    t_fetch = time.perf_counter() - t0
    print(
        f"arrays round {it}: prep {t_prep * 1e3:7.1f} ms "
        f"(all {len(requests)} requests) | dispatch "
        f"{t_dispatch * 1e3:7.1f} ms | fetch {t_fetch * 1e3:7.1f} ms",
        flush=True,
    )

# legacy contrast: frame merge + submit_serve on the merged ranking
seq = 0
for it in range(args.iters):
    t0 = time.perf_counter()
    frames = []
    for i, r in enumerate(requests):
        df = _plain_ids(r._df)[["q_id", "id", "score", "query"]]
        frames.append(df.assign(q_id=f"{seq + i:012d}" + _SEP + df["q_id"]))
    seq += len(requests)
    frames.reverse()  # tag-descending
    merged = Ranking._from_trusted_frame(
        pd.concat(frames, ignore_index=True), None
    )
    t_merge = time.perf_counter() - t0
    t0 = time.perf_counter()
    fut = index.submit_serve(merged, ALPHA, CUTOFF)
    t_dispatch = time.perf_counter() - t0
    t0 = time.perf_counter()
    fut.result()
    t_fetch = time.perf_counter() - t0
    print(
        f"frames round {it}: merge {t_merge * 1e3:7.1f} ms | dispatch "
        f"{t_dispatch * 1e3:7.1f} ms | wait {t_fetch * 1e3:7.1f} ms",
        flush=True,
    )

# end-to-end sanity: the threaded server over the same requests
with BatchingServer(index, ALPHA, CUTOFF, max_wait_ms=5.0) as server:
    futs = [server.submit(r) for r in requests]
    for f in futs:
        f.result()
    t0 = time.perf_counter()
    for _ in range(3):
        futs = [server.submit(r) for r in requests]
        for f in futs:
            f.result()
    dt = time.perf_counter() - t0
    print(
        f"threaded server: 3x{len(requests)} requests in {dt:.3f}s -> "
        f"{3 * args.q / dt:.1f} QPS aggregate",
        flush=True,
    )
print("rc=0", flush=True)
