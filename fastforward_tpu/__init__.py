"""fastforward_tpu — TPU-native interpolation-based re-ranking.

A from-scratch JAX/XLA/Pallas re-ranking engine with the capabilities of
Fast-Forward indexes (reference: ``fast_forward`` v0.8.0, see SURVEY.md):
precomputed dense document/passage embeddings live in an HBM-resident
(optionally multi-chip-sharded) table; per-query candidate scoring runs as a
fused gather -> (dequantize) -> dot -> segment-reduce device program; lexical
and semantic scores are interpolated as
``score = alpha * lexical + (1 - alpha) * semantic``.

Subpackages:

- ``ranking`` — host-side run I/O and score algebra (``Ranking``).
- ``encoder`` — query/document encoders (JAX/flax Transformer towers).
- ``quantizer`` — product quantization with decode-in-kernel scoring.
- ``index`` — the vector store + scoring engine (HBM / HDF5 tiers).
- ``ops`` — jitted/Pallas device ops (gather-dot, segment reduce, ADC).
- ``parallel`` — mesh / sharding configuration for multi-chip indexes.
- ``utils`` — corpus indexing, coalescing, evaluation export, PyTerrier.
"""

from fastforward_tpu import encoder, index, quantizer, utils
from fastforward_tpu.ranking import Ranking

__all__ = ["encoder", "index", "quantizer", "utils", "Ranking"]
__version__ = "0.1.0"
