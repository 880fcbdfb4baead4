"""Stage breakdown of one warm serving call on the current backend.

Times the components of the prepared-run fast path at the flagship query
shape (Q=512, depth-1000 -> 512k pair scores) against a smaller table
(N defaults to 200k: per-call work depends on Q x depth, not N, and the
upload stays ~30 s over the dev tunnel).  Stages:

  encode    LambdaEncoder lookup + stacking (host)
  dispatch  _device_score_grouped(fetch=False) returning the async array
  fetch     one-shot synchronous score fetch (includes device execution)
  ovl+sort  production path: chunked fetch overlapped with the native
            segmented rank sort
  assemble  categorical takes + result frame + Ranking ctor
  full call index(ranking), the number bench.py reports

Usage: timeout 1200 python scripts/profile_serving.py [--n 200000]
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
parser.add_argument("--iters", type=int, default=10)
parser.add_argument("--transport", choices=["f32", "u16"], default="f32")
args = parser.parse_args()

import jax  # noqa: E402

print("backend:", jax.default_backend(), flush=True)

from fastforward_tpu.encoder import LambdaEncoder  # noqa: E402
from fastforward_tpu.index import InMemoryIndex, Mode  # noqa: E402
from fastforward_tpu.index.base import _overlap_fetch_sort  # noqa: E402
from fastforward_tpu import ops  # noqa: E402
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
    score_transport=args.transport,
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

t0 = time.perf_counter()
index(ranking)
print(f"first call: {time.perf_counter() - t0:.2f}s", flush=True)
index(ranking)

plan = index._get_plan(ranking)
assert plan is not None and plan.get("ready"), "plan must be warm"
view = index._device_view()
q_list = plan["queries"]
segments = plan["segments"]
n_pairs = plan["n_pairs"]


def timed(label, fn, iters=args.iters):
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:>10}: {best * 1e3:8.2f} ms (best of {iters})", flush=True)
    return out


qv = timed("encode", lambda: index.encode_queries(q_list))

scores_dev = timed(
    "dispatch",
    lambda: index._device_score_grouped(
        view, qv, plan["rows_mat"], plan["pair_qno"], plan["counts_pp"],
        plan["k"], fetch=False, plan=plan,
    ),
)

timed("fetch", lambda: np.asarray(jax.device_get(scores_dev))[:n_pairs])


def dispatch_and_overlap():
    sd = index._device_score_grouped(
        view, qv, plan["rows_mat"], plan["pair_qno"], plan["counts_pp"],
        plan["k"], fetch=False, plan=plan,
    )
    return _overlap_fetch_sort(sd, segments, n_pairs)


fetched = timed("disp+ovl", dispatch_and_overlap)
assert fetched is not None, "overlapped path must be live"
scores_np, take, _ = fetched


def dispatch_overlap_materialize():
    import pandas as pd

    sd = index._device_score_grouped(
        view, qv, plan["rows_mat"], plan["pair_qno"], plan["counts_pp"],
        plan["k"], fetch=False, plan=plan,
    )
    cats = plan["out_arrays"]
    dst = (
        np.empty(n_pairs, dtype=np.float32),
        *(np.empty(n_pairs, dtype=a.codes.dtype) for a in cats),
    )
    sinks = ((None, *(a.codes for a in cats)), dst)
    assert all(isinstance(a, pd.Categorical) for a in cats)
    return _overlap_fetch_sort(sd, segments, n_pairs, sinks)


got = timed("disp+ovl+mat", dispatch_overlap_materialize)
assert got is not None and got[2], "materialized path must engage"

qid_arr, id_arr, query_arr = plan["out_arrays"]


def assemble():
    import pandas as pd

    out = pd.DataFrame(
        {
            "q_id": qid_arr.take(take),
            "id": id_arr.take(take),
            "score": scores_np[take].astype(np.float32, copy=False),
            "query": query_arr.take(take),
        }
    )
    return Ranking._from_trusted_frame(out, "fast-forward")


timed("assemble", assemble)

timed("full call", lambda: index(ranking))

# steady-state rate over a longer window (what bench.py reports)
t0 = time.perf_counter()
for _ in range(args.iters):
    index(ranking)
dt = time.perf_counter() - t0
print(
    f"steady: {args.iters} calls in {dt:.3f}s -> "
    f"{args.q * args.iters / dt:.1f} QPS",
    flush=True,
)

# depth-2 submit pipeline (bench.py --config pipelined)
t0 = time.perf_counter()
pending = None
for _ in range(args.iters):
    fut = index.submit(ranking)
    assert fut.pipelined
    if pending is not None:
        pending.result()
    pending = fut
pending.result()
dt = time.perf_counter() - t0
print(
    f"steady pipelined: {args.iters} calls in {dt:.3f}s -> "
    f"{args.q * args.iters / dt:.1f} QPS",
    flush=True,
)

# --- fused serve breakdown (bench.py --config serve) ---------------------
ALPHA, CUTOFF = 0.2, 10
index.serve(ranking, ALPHA, CUTOFF)  # compile + plan-cache the fused tail

srv_fut = timed(
    "srv disp",
    lambda: index.submit_serve(ranking, ALPHA, CUTOFF),
)
assert srv_fut.pipelined, "fused serve must stay on the device path"
timed("srv wait", srv_fut.result, iters=1)  # fetch+assemble of that call
timed("srv call", lambda: index.serve(ranking, ALPHA, CUTOFF))

t0 = time.perf_counter()
pending = None
for _ in range(args.iters):
    fut = index.submit_serve(ranking, ALPHA, CUTOFF)
    assert fut.pipelined
    if pending is not None:
        pending.result()
    pending = fut
pending.result()
dt = time.perf_counter() - t0
print(
    f"steady serve pipelined: {args.iters} calls in {dt:.3f}s -> "
    f"{args.q * args.iters / dt:.1f} QPS",
    flush=True,
)
