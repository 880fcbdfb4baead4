"""Production serving: concurrent requests through a BatchingServer.

Simulates a serving host receiving many small re-ranking requests at
once (each carrying a handful of queries). The server coalesces them
into single fused device calls — semantic scoring + interpolation +
top-k cut on device, one result round trip per *batch* instead of per
*request* — and resolves every request's future independently.

Run:  python examples/batched_serving.py
"""

import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

# honor an explicit JAX_PLATFORMS override (e.g. cpu) even when the
# environment pins a TPU platform through sitecustomize
import jax

_p = os.environ.get("JAX_PLATFORMS")
if _p and "," not in _p:
    jax.config.update("jax_platforms", _p)

from fastforward_tpu import Ranking
from fastforward_tpu.encoder import LambdaEncoder
from fastforward_tpu.index import InMemoryIndex, Mode
from fastforward_tpu.utils import BatchingServer

DIM = 256
N = 50_000
NUM_REQUESTS = 16
QUERIES_PER_REQUEST = 4
DEPTH = 200
ALPHA, CUTOFF = 0.2, 10

rng = np.random.default_rng(0)

# --- 1. index (swap the LambdaEncoder for a real query tower) -------------
corpus = rng.standard_normal((N, DIM)).astype(np.float32)
qvecs = rng.standard_normal((NUM_REQUESTS * QUERIES_PER_REQUEST, DIM)).astype(
    np.float32
)
by_text = {f"query {i}": qvecs[i] for i in range(qvecs.shape[0])}
index = InMemoryIndex(
    LambdaEncoder(lambda t: by_text[t]), mode=Mode.PASSAGE
)
index.add(corpus, psg_ids=[f"p{i}" for i in range(N)])
index.preload(
    warm=(NUM_REQUESTS * QUERIES_PER_REQUEST, DEPTH), serve=(ALPHA, CUTOFF)
)

# --- 2. incoming requests: first-stage (e.g. BM25) runs ------------------
requests = []
for r in range(NUM_REQUESTS):
    run, queries = {}, {}
    for j in range(QUERIES_PER_REQUEST):
        qi = r * QUERIES_PER_REQUEST + j
        q_id = f"q{j}"  # requests may reuse q_id strings — namespaced inside
        run[q_id] = {
            f"p{row}": float(rng.standard_normal())
            for row in rng.choice(N, size=DEPTH, replace=False)
        }
        queries[q_id] = f"query {qi}"
    requests.append(Ranking.from_run(run, queries=queries))

# --- 3. serve them concurrently ------------------------------------------
with BatchingServer(
    index, ALPHA, CUTOFF, max_batch_queries=256, max_wait_ms=2.0
) as server:
    server.serve(requests[0])  # warm the compiled shapes
    t0 = time.perf_counter()
    futures = [server.submit(r) for r in requests]  # non-blocking
    results = [f.result() for f in futures]
    elapsed = time.perf_counter() - t0

total_q = NUM_REQUESTS * QUERIES_PER_REQUEST
print(
    f"served {NUM_REQUESTS} requests ({total_q} queries) in "
    f"{elapsed * 1e3:.1f} ms -> {total_q / elapsed:.0f} QPS aggregate"
)
top = results[0]["q0"]
print(f"request 0, query q0 top-{CUTOFF}: {list(top)[:3]} ...")
assert all(len(res.q_ids) == QUERIES_PER_REQUEST for res in results)

# equivalence with the one-call flow
want = index.serve(requests[0], ALPHA, CUTOFF)
assert list(top) == list(want["q0"]), "server result != serve result"
print("matches index.serve exactly")
