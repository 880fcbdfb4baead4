"""Single-process A/B: f32 vs u16 transport, sync vs pipelined steady QPS.

Interleaves the four (transport x loop) measurements twice so link-state
drift is visible (the dev tunnel wanders +-40% over minutes).  Captured
run: bench_logs/transport_ab.log — u16 sync peaked at 6769 QPS vs f32
4728 in the same link state (+43%); a mid-run link degradation pulled
the second round of all configs down to ~4200-5200.

Usage: timeout 1100 python scripts/bench_transport_ab.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402

print("backend:", jax.default_backend(), flush=True)

from fastforward_tpu.encoder import LambdaEncoder
from fastforward_tpu.index import InMemoryIndex, Mode
from fastforward_tpu.ranking import Ranking

N, Q, DEPTH, DIM, ITERS = 100_000, 512, 1000, 768, 10
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


def steady(index, label):
    index.preload(warm=(Q, DEPTH))
    index(ranking)
    index(ranking)
    for loop in range(2):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            index(ranking)
        dt = time.perf_counter() - t0
        print(f"{label} sync   loop{loop}: {Q * ITERS / dt:7.1f} QPS", flush=True)
    for loop in range(2):
        t0 = time.perf_counter()
        pending = None
        for _ in range(ITERS):
            fut = index.submit(ranking)
            if pending is not None:
                pending.result()
            pending = fut
        pending.result()
        dt = time.perf_counter() - t0
        print(f"{label} piped  loop{loop}: {Q * ITERS / dt:7.1f} QPS", flush=True)


for transport in ("f32", "u16", "f32", "u16"):
    index = InMemoryIndex(
        LambdaEncoder(lambda t: qmap[t]),
        mode=Mode.PASSAGE,
        precision="high",
        score_transport=transport,
    )
    index.add(corpus, psg_ids=[f"p{i}" for i in range(N)])
    steady(index, transport)
print("rc=0", flush=True)
