"""Golden-parity tests against the real published checkpoints.

Runs the reference's exact harness (reference: ``tests/test_encoder.py:22,
40-91``) through our JAX encoders: the three reference inputs through all
five pretrained towers, asserted against the reference's hardcoded golden
arrays (``tests/_golden_constants.py``). Same goldens ⇒ numerical parity
with the reference implementation.

Download-gated: each test first tries to materialize the HF checkpoint
(hub download or local cache). This sandbox has **zero network egress and
no pre-populated HuggingFace cache** (verified: ``~/.cache/huggingface``
absent), so in CI here these tests SKIP with that reason; in any
environment with the checkpoints available they run and assert
``decimal=4`` parity (the reference asserts decimal=5 torch-vs-torch; one
decimal is budgeted for XLA-vs-torch reduction-order differences).
"""

import functools
import os
import socket
import unittest

import numpy as np

from ._golden_constants import (
    BGE_ENCODER_EXPECTED,
    CONTRIEVER_EXPECTED,
    TAS_B_EXPECTED,
    TCT_COLBERT_DOCUMENT_EXPECTED,
    TCT_COLBERT_QUERY_EXPECTED,
)

TEST_INPUTS = ["input 1", "second input", "3rd input " * 100]

DECIMAL = 4


@functools.lru_cache(maxsize=1)
def _hub_reachable() -> bool:
    """Cheap connectivity probe so offline CI skips in milliseconds instead
    of sitting through transformers' per-checkpoint retry timeouts."""
    if os.environ.get("HF_HUB_OFFLINE") == "1":
        return False
    try:
        socket.create_connection(("huggingface.co", 443), timeout=3).close()
        return True
    except OSError:
        return False


@functools.lru_cache(maxsize=None)
def _load(encoder_cls_name: str):
    """Instantiate a pretrained encoder; return (encoder, None) or (None, why)."""
    from fastforward_tpu.encoder import transformer

    cls = getattr(transformer, encoder_cls_name)
    try:
        return cls(), None
    except Exception as e:  # network/cache failure → documented skip
        return None, (
            f"checkpoint for {encoder_cls_name} unavailable "
            f"(no network egress and no local HF cache in this sandbox): "
            f"{type(e).__name__}: {e}"
        )


class GoldenParity(unittest.TestCase):
    def _check(self, encoder_cls_name: str, expected: np.ndarray):
        if not _hub_reachable():
            # a pre-populated local cache still works: transformers falls
            # back to cached files when the hub is unreachable, so only
            # probe-skip when there is no cache directory at all
            cache = os.path.expanduser(
                os.environ.get("HF_HOME", "~/.cache/huggingface")
            )
            if not os.path.isdir(cache):
                self.skipTest(
                    "huggingface.co unreachable (zero network egress) and no "
                    "local HF cache — cannot materialize the real checkpoint"
                )
        encoder, why = _load(encoder_cls_name)
        if encoder is None:
            self.skipTest(why)
        np.testing.assert_almost_equal(
            encoder(TEST_INPUTS), expected, decimal=DECIMAL
        )

    def test_tct_colbert_query(self):
        self._check("TCTColBERTQueryEncoder", TCT_COLBERT_QUERY_EXPECTED)

    def test_tct_colbert_document(self):
        self._check("TCTColBERTDocumentEncoder", TCT_COLBERT_DOCUMENT_EXPECTED)

    def test_tas_b(self):
        self._check("TASBEncoder", TAS_B_EXPECTED)

    def test_contriever(self):
        self._check("ContrieverEncoder", CONTRIEVER_EXPECTED)

    def test_bge(self):
        self._check("BGEEncoder", BGE_ENCODER_EXPECTED)


if __name__ == "__main__":
    unittest.main()
