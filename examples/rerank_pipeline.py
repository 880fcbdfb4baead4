"""End-to-end Fast-Forward re-ranking pipeline on TPU.

Mirrors the reference workflow (BM25 run -> semantic re-scoring ->
interpolation -> evaluation) with a synthetic corpus standing in for
MS MARCO; swap the marked sections for real data.

Run:  python examples/rerank_pipeline.py
"""

import os
import sys
import tempfile
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
from fastforward_tpu.index import InMemoryIndex, Mode, OnDiskIndex
from fastforward_tpu.utils import Indexer, ndcg_at_k, rr_at_k

workdir = Path(tempfile.mkdtemp())
rng = np.random.default_rng(0)
DIM = 768

# --- 1. corpus indexing (swap for TCTColBERTDocumentEncoder + real docs) ---
# doc encoder stand-in: deterministic vector per text
doc_encoder = LambdaEncoder(
    lambda text: np.asarray(
        np.random.default_rng(abs(hash(text)) % 2**32).standard_normal(DIM),
        dtype=np.float32,
    )
)
index = OnDiskIndex(workdir / "corpus.h5", mode=Mode.MAXP)
indexer = Indexer(index, doc_encoder, batch_size=4096)
indexer.from_dicts(
    {"text": f"document {i} text", "doc_id": f"d{i % 2000}", "psg_id": f"p{i}"}
    for i in range(10_000)
)
print(f"indexed {len(index)} passages / {len(index.doc_ids)} documents")

# --- 2. load for serving: HDF5 -> HBM-resident index --------------------
# (swap LambdaEncoder for TCTColBERTQueryEncoder() with network access)
query_encoder = LambdaEncoder(
    lambda text: np.asarray(
        np.random.default_rng(abs(hash("q" + text)) % 2**32).standard_normal(DIM),
        dtype=np.float32,
    )
)
serving = OnDiskIndex.load(
    workdir / "corpus.h5", query_encoder, mode=Mode.MAXP
).to_memory()
serving.preload()

# --- 3. first-stage run (swap for a real BM25 TREC runfile) ---------------
run = {
    f"q{qi}": {
        f"d{d}": float(1000 - pos)
        for pos, d in enumerate(rng.choice(2000, size=100, replace=False))
    }
    for qi in range(16)
}
queries = {f"q{qi}": f"query {qi} text" for qi in range(16)}
lexical = Ranking.from_run(run, queries=queries)

# --- 4. semantic re-scoring + interpolation -------------------------------
semantic = serving(lexical)
fused = lexical.normalize().interpolate(semantic.normalize(), alpha=0.2)
fused.name = "bm25+ff"
fused.save(workdir / "fused.trec")
print("top-3 for q0:", list(fused["q0"].items())[:3])

# --- 5. evaluation (swap for real qrels) -----------------------------------
qrels = {q: {doc: 1 for doc in list(run[q])[:5]} for q in run}
print(f"nDCG@10 = {ndcg_at_k(fused, qrels):.3f}  RR@10 = {rr_at_k(fused, qrels):.3f}")

# --- 6. fused serving: scoring + interpolation + top-k in ONE device call --
# (raw-score interpolation; only Q x 10 results cross the device->host link)
topk = serving.serve(lexical, alpha=0.2, cutoff=10)
print("fused serve top-3 for q0:", list(topk["q0"].items())[:3])
print(f"artifacts in {workdir}")
