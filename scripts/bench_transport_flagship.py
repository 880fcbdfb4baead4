"""u16 vs f32 score transport at the FLAGSHIP shape (N=2M), depth-4 pipeline.

The round-4 A/B ran at N=100k with a depth-1 pipeline
(`bench_logs/transport_ab.log`); this measures whether u16 still pays at
N=2M when the depth-4 submit pipeline already overlaps the score fetches
(verdict-4 item #9).  One index, one table upload; the transport flag is
flipped between loops (it is read per call) and the four configurations
interleave twice so link-state drift is visible.

Usage: timeout 2500 python scripts/bench_transport_flagship.py
"""

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

print("backend:", jax.default_backend(), flush=True)

from fastforward_tpu.encoder import LambdaEncoder  # noqa: E402
from fastforward_tpu.index import InMemoryIndex, Mode  # noqa: E402
from fastforward_tpu.ranking import Ranking  # noqa: E402

N, Q, DEPTH, DIM, ITERS, PIPE = 2_000_000, 512, 1000, 768, 10, 4
rng = np.random.default_rng(0)
corpus = rng.normal(size=(N, DIM)).astype(np.float32)
qvecs = rng.normal(size=(Q, DIM)).astype(np.float32)
queries = {f"q{i}": f"query {i}" for i in range(Q)}
qmap = {f"query {i}": qvecs[i] for i in range(Q)}
run = {
    f"q{i}": {
        f"p{j}": float(DEPTH - k)
        for k, j in enumerate(rng.choice(N, size=DEPTH, replace=False))
    }
    for i in range(Q)
}
ranking = Ranking.from_run(run, queries=queries)

index = InMemoryIndex(
    LambdaEncoder(lambda t: qmap[t]),
    mode=Mode.PASSAGE,
    precision="high",
)
index.add(corpus, psg_ids=[f"p{i}" for i in range(N)])
t0 = time.perf_counter()
index.preload(warm=(Q, DEPTH))
print(f"preload: {time.perf_counter() - t0:.1f}s", flush=True)


def piped_loop(label):
    t0 = time.perf_counter()
    pending = []
    for _ in range(ITERS):
        fut = index.submit(ranking)
        pending.append(fut)
        if len(pending) >= PIPE:
            pending.pop(0).result()
    for fut in pending:
        fut.result()
    dt = time.perf_counter() - t0
    print(f"{label} piped(depth-{PIPE}): {Q * ITERS / dt:7.1f} QPS", flush=True)


# warm both transports' programs off the timed path
for transport in ("f32", "u16"):
    index._score_transport = transport
    index(ranking)
    index(ranking)

for round_no in range(2):
    for transport in ("f32", "u16", "u16", "f32"):
        index._score_transport = transport
        piped_loop(f"round{round_no} {transport}")
print("rc=0", flush=True)
