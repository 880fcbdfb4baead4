"""Compression + multi-chip tiers: int8, PQ/OPQ, and mesh-sharded scoring.

Walks the three capacity tiers the framework offers beyond dense fp32:

1. int8 scalar quantization (4x less HBM, 'high' precision is lossless on
   the table side) — the TPU-native recommendation;
2. PQ/OPQ product quantization (32x compression, ADC scoring);
3. a row-sharded table over a jax.sharding.Mesh — combine with either
   quantizer to fit MS MARCO v2-scale corpora across chips.

Runs on whatever devices are available; for the mesh section it uses a
virtual CPU mesh when fewer than 2 real devices exist (the same sharding
program the real slice runs).

Run:  python examples/quantized_sharded.py
"""

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import numpy as np

_CHILD = os.environ.get("_FFTPU_EXAMPLE_CHILD") == "1"
if _CHILD:
    # virtual 8-device CPU mesh (XLA_FLAGS were set before this init)
    jax.config.update("jax_platforms", "cpu")
if len(jax.devices()) < 2 and not _CHILD:
    # fall back to a virtual CPU mesh — needs a fresh backend, so re-exec
    # with the flags in the environment (the env pins the platform via
    # sitecustomize; the guard prevents a re-exec loop)
    import subprocess

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    ).strip()
    env["_FFTPU_EXAMPLE_CHILD"] = "1"
    sys.exit(subprocess.run([sys.executable, __file__], env=env).returncode)

from fastforward_tpu import Ranking
from fastforward_tpu.encoder import LambdaEncoder
from fastforward_tpu.index import InMemoryIndex, Mode
from fastforward_tpu.parallel import MeshConfig
from fastforward_tpu.quantizer import OPQ, PQ, ScalarQuantizer

rng = np.random.default_rng(0)
N, DIM, Q, DEPTH = 5_000, 128, 8, 100

# low-rank corpus (like real embeddings): PQ/OPQ codebooks have structure
# to capture — pure gaussian noise is the worst case for ADC
basis = rng.normal(size=(16, DIM)).astype(np.float32)
corpus = (
    rng.normal(size=(N, 16)).astype(np.float32) @ basis
    + 0.05 * rng.normal(size=(N, DIM)).astype(np.float32)
)
qvecs = rng.normal(size=(Q, 16)).astype(np.float32) @ basis
by_text = {f"query {i}": qvecs[i] for i in range(Q)}
encoder = LambdaEncoder(lambda t: by_text[t])

run = {
    f"q{i}": {
        f"p{c}": float(DEPTH - r)
        for r, c in enumerate(rng.choice(N, DEPTH, replace=False))
    }
    for i in range(Q)
}
queries = {f"q{i}": f"query {i}" for i in range(Q)}
ranking = Ranking.from_run(run, queries=queries)
psg_ids = [f"p{i}" for i in range(N)]


def exact_top1(q_no):
    cands = [int(p[1:]) for p in run[f"q{q_no}"]]
    scores = corpus[cands] @ qvecs[q_no]
    return f"p{cands[int(np.argmax(scores))]}"


# --- 1. int8 scalar quantization -------------------------------------------
sq = ScalarQuantizer()
sq.fit(corpus[:4096])
int8_index = InMemoryIndex(encoder, quantizer=sq, mode=Mode.PASSAGE, precision="high")
int8_index.add(corpus, psg_ids=psg_ids)
result = int8_index(ranking)
hits = sum(next(iter(result[f"q{i}"])) == exact_top1(i) for i in range(Q))
print(f"int8 (4x less HBM): top-1 agreement with exact fp32 {hits}/{Q}")

# --- 2. PQ / OPQ (32x compression, ADC scoring) ------------------------------
pq = PQ(DIM // 8, 64)  # 8 dims per subspace -> 32x compression
pq.fit(corpus[:2048])
pq_index = InMemoryIndex(encoder, quantizer=pq, mode=Mode.PASSAGE)
pq_index.add(corpus, psg_ids=psg_ids)
result = pq_index(ranking)
hits = sum(next(iter(result[f"q{i}"])) == exact_top1(i) for i in range(Q))
print(f"PQ (32x compression): top-1 agreement {hits}/{Q} (ADC is approximate)")

opq = OPQ(DIM // 8, 64, opq_iters=3)
opq.fit(corpus[:1024])
opq_index = InMemoryIndex(encoder, quantizer=opq, mode=Mode.PASSAGE)
opq_index.add(corpus, psg_ids=psg_ids)
result = opq_index(ranking)
hits = sum(next(iter(result[f"q{i}"])) == exact_top1(i) for i in range(Q))
print(f"OPQ (learned rotation): top-1 agreement {hits}/{Q}")

# --- 3. mesh-sharded scoring (dense | int8 | PQ code rows over chips) --------
n_dev = len(jax.devices())
mesh_config = MeshConfig(data=1, shard=n_dev)
sharded = InMemoryIndex(
    encoder, quantizer=pq, mode=Mode.PASSAGE, mesh_config=mesh_config
)
sharded.add(corpus, psg_ids=psg_ids)
result_sharded = sharded(ranking)
single = pq_index(ranking)
agree = sum(
    list(result_sharded[f"q{i}"]) == list(single[f"q{i}"]) for i in range(Q)
)
print(
    f"PQ sharded over {n_dev} devices: ranking identical to single-device "
    f"for {agree}/{Q} queries"
)
print("OK")
