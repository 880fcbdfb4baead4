"""Timeline of the BatchingServer continuous-load pipeline on the chip.

Wraps the server's stage functions (`_serve_prep`, `_dispatch`,
`_resolve`) with monotonic start/end stamps and prints a per-batch
timeline, to see which stages actually overlap under continuous load
(the sequential stage sum ~285 ms/batch matches the measured continuous
rate, so something serializes).

Usage: timeout 1500 python scripts/probe_server_timeline.py [--n 200000]
"""

import argparse
import sys
import threading
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
parser.add_argument("--n", type=int, default=200_000)
parser.add_argument("--q", type=int, default=512)
parser.add_argument("--req-q", type=int, default=8)
parser.add_argument("--depth", type=int, default=1000)
parser.add_argument("--dim", type=int, default=768)
parser.add_argument("--prep-workers", type=int, default=2)
args = parser.parse_args()

print("backend:", jax.default_backend(), flush=True)

from fastforward_tpu.encoder import LambdaEncoder  # noqa: E402
from fastforward_tpu.index import InMemoryIndex, Mode  # noqa: E402
from fastforward_tpu.ranking import Ranking  # noqa: E402
from fastforward_tpu.utils import serving  # noqa: E402

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
q_ids = list(run)
requests = []
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

EVENTS: "list[tuple[str, str, float, float]]" = []
_ev_lock = threading.Lock()
T0 = time.perf_counter()


def record(stage, fn):
    def wrapped(*a, **kw):
        s = time.perf_counter()
        out = fn(*a, **kw)
        e = time.perf_counter()
        with _ev_lock:
            EVENTS.append(
                (stage, threading.current_thread().name, s - T0, e - T0)
            )
        return out

    return wrapped


orig_prep = index._serve_prep
orig_arrays = index._serve_arrays
index._serve_prep = record("prep", orig_prep)
index._serve_arrays = record("arrays_dispatch", orig_arrays)

_orig_resolve = serving.BatchingServer._resolve
_orig_dispatch = serving.BatchingServer._dispatch
serving.BatchingServer._resolve = record("resolve", _orig_resolve)
serving.BatchingServer._dispatch = record("dispatch", _orig_dispatch)

import concurrent.futures  # noqa: E402

with serving.BatchingServer(
    index,
    ALPHA,
    CUTOFF,
    max_batch_queries=args.q,
    max_wait_ms=5.0,
    prep_workers=args.prep_workers,
) as server:
    pool = concurrent.futures.ThreadPoolExecutor(max_workers=16)
    # warm
    futs = list(pool.map(server.submit, requests))
    for f in futs:
        f.result()
    EVENTS.clear()
    T0 = time.perf_counter()
    futs = list(pool.map(server.submit, requests * 5))
    for f in futs:
        f.result()
    total = time.perf_counter() - T0
    print(
        f"continuous: {5 * len(requests)} requests in {total:.3f}s -> "
        f"{5 * args.q / total:.1f} QPS aggregate",
        flush=True,
    )
    pool.shutdown()

with _ev_lock:
    evs = sorted(EVENTS, key=lambda e: e[2])
per_stage: dict = {}
for stage, thread, s, e in evs:
    per_stage.setdefault(stage, []).append((s, e, thread))
for stage, spans in per_stage.items():
    busy = sum(e - s for s, e, _ in spans)
    print(f"{stage:16s} n={len(spans):4d} busy {busy * 1e3:8.1f} ms", flush=True)
print("\n-- coarse timeline (batch-level events only) --", flush=True)
for stage, thread, s, e in evs:
    if stage == "prep":
        continue
    print(
        f"{s * 1e3:9.1f} -> {e * 1e3:9.1f} ms  [{(e - s) * 1e3:7.1f}] "
        f"{stage:16s} {thread}",
        flush=True,
    )
# prep summarized in 100ms buckets
preps = per_stage.get("prep", [])
if preps:
    print("\n-- prep activity per 100 ms bucket --", flush=True)
    end = max(e for _, e, _ in preps)
    nb = int(end * 10) + 1
    busy = np.zeros(nb)
    for s, e, _ in preps:
        busy[int(s * 10) : int(e * 10) + 1] += (e - s) / max(
            1, int(e * 10) + 1 - int(s * 10)
        )
    for i, b in enumerate(busy):
        print(f"  {i * 100:5d} ms: {'#' * int(b * 200)}", flush=True)
print("rc=0", flush=True)
