"""Round-4 TPU validation: quantized + sharded beyond-HBM hybrid tiers.

Run AFTER ``scripts/tpu_validate_r3.py`` whenever the axon tunnel is up
(the round-4 device changes never executed on a real chip until this
passes).  Checks, each printing PASS/FAIL:

1. int8 hybrid tier: tiny ``hbm_budget`` forces resident-prefix + streamed
   int8 tail; parity vs the fully HBM-resident int8 index.
2. PQ hybrid tier: streamed-ADC tail blocks (lane-padded for the Pallas
   kernel) + lane-padded resident prefix; parity vs the resident PQ index.
3. Doc-mode device K-reduction on a quantized hybrid: the warm fetch is
   <= 2 x pairs floats (STATS counters).
4. Hybrid warm-path zero-upload guarantee still holds for dense fp32.

Usage: timeout 1100 python scripts/tpu_validate_r4.py   (background it —
first Mosaic compiles can take minutes).
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

print("backend:", jax.default_backend(), jax.devices(), flush=True)
assert jax.default_backend() != "cpu", "run this on the TPU tunnel"

from fastforward_tpu.encoder import LambdaEncoder
from fastforward_tpu.index import InMemoryIndex, Mode
from fastforward_tpu.ops import host_stream
from fastforward_tpu.quantizer import PQ, ScalarQuantizer
from fastforward_tpu.ranking import Ranking

_T0 = time.time()


def stage(msg):
    print(f"[{time.time() - _T0:6.0f}s] {msg}", flush=True)


rng = np.random.default_rng(4)
# 131072 rows keeps every table > the budgets below while halving the
# tunnel-upload volume (the first run of this script at n=262144 burned
# its whole 1100 s window before the first parity line).
n, dim = 131072, 768
corpus = rng.normal(size=(n, dim)).astype(np.float32)
qvec = rng.normal(size=dim).astype(np.float32)
enc = LambdaEncoder(lambda _: qvec)
run = {"q1": {f"p{i}": 1.0 for i in range(0, n, 8)}}


def build(quantizer, **kwargs):
    stage(f"build start: {type(quantizer).__name__} {kwargs}")
    if quantizer is not None:
        quantizer.fit(corpus[:8192])
        stage("  quantizer fit done")
    index = InMemoryIndex(
        enc, quantizer=quantizer, mode=Mode.PASSAGE, precision="fast",
        **kwargs,
    )
    index.add(corpus, psg_ids=[f"p{i}" for i in range(n)])
    stage("  add done")
    return index


def parity(tag, plain, hybrid, places=2):
    view = hybrid._device_view()
    assert view.kind == "hybrid", (tag, view.kind)
    stage(f"parity {tag}: scoring plain")
    t0 = time.time()
    a = plain(Ranking.from_run(run, queries={"q1": "x"}))["q1"]
    stage(f"parity {tag}: scoring hybrid (cold)")
    b = hybrid(Ranking.from_run(run, queries={"q1": "x"}))["q1"]
    b2 = hybrid(Ranking.from_run(run, queries={"q1": "x"}))["q1"]  # warm
    diff = max(abs(a[k] - b[k]) for k in a)
    diff2 = max(abs(a[k] - b2[k]) for k in a)
    ok = diff < 10 ** -places and diff2 < 10 ** -places
    print(
        f"{'PASS' if ok else 'FAIL'} {tag} hybrid parity "
        f"(cold {diff:.4f}, warm {diff2:.4f}, {time.time() - t0:.0f}s)",
        flush=True,
    )


# --- 1. int8 hybrid --------------------------------------------------------
sq_plain = build(ScalarQuantizer())
# int8 table = 96 MiB padded; 32 MiB budget forces ~1/3 resident
sq_hybrid = build(ScalarQuantizer(), hbm_budget=32 << 20)
parity("int8", sq_plain, sq_hybrid)

# --- 2. PQ hybrid ----------------------------------------------------------
pq_plain = build(PQ(96, 256))
# lane-padded codes = 16 MiB; 6 MiB budget forces streaming
pq_hybrid = build(PQ(96, 256), hbm_budget=6 << 20)
parity("pq", pq_plain, pq_hybrid)

# --- 3. doc-mode device K reduction on a quantized hybrid ------------------
stage("doc-mode K-reduction check")
doc_run = {"q1": {f"d{i}": 1.0 for i in range(0, n // 8, 4)}}
doc_sq = ScalarQuantizer()
doc_sq.fit(corpus[:8192])  # must be fit BEFORE attaching to an index
doc_hybrid = InMemoryIndex(
    enc, quantizer=doc_sq, mode=Mode.MAXP, precision="fast",
    hbm_budget=32 << 20,
)
doc_hybrid.add(corpus, doc_ids=[f"d{i // 8}" for i in range(n)])
doc_ranking = Ranking.from_run(doc_run, queries={"q1": "x"})
n_pairs = len(doc_run["q1"])
doc_hybrid(doc_ranking)
host_stream.reset_stats()
doc_hybrid(doc_ranking)
fetched = host_stream.STATS["fetch_floats"]
print(
    f"{'PASS' if fetched <= 2 * n_pairs else 'FAIL'} doc-mode K reduction "
    f"on device: fetched {fetched} floats for {n_pairs} pairs",
    flush=True,
)

# --- 4. dense hybrid warm zero-upload --------------------------------------
# dense table = 384 MiB; 128 MiB budget keeps a resident prefix + streamed tail
dense_hybrid = build(None, hbm_budget=128 << 20, stream_chunk_rows=1 << 15)
ranking = Ranking.from_run(
    {"q1": {f"p{i}": 1.0 for i in range(0, n, 64)}}, queries={"q1": "x"}
)
dense_hybrid(ranking)
host_stream.reset_stats()
dense_hybrid(ranking)
up = host_stream.STATS["upload_bytes"]
print(
    f"{'PASS' if up == 0 else 'FAIL'} dense hybrid warm path uploaded "
    f"{up} table bytes (budgeted blocks must stay device-resident)",
    flush=True,
)
print("DONE", flush=True)
