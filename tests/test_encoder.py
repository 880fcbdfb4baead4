"""End-to-end encoder tests with a tiny local checkpoint (no downloads).

The reference's golden-parity harness needs the real HF checkpoints
(reference: ``tests/test_encoder.py``); offline, the same pipeline —
tokenizer templates, length bucketing, jitted encode + pooling — is tested
against a hand-built tiny BERT saved to disk, with expectations computed by
running the torch model directly.
"""

import shutil
import tempfile
import unittest
from pathlib import Path

import numpy as np

from fastforward_tpu.encoder import LambdaEncoder

TEST_INPUTS = ["ab", "abc cab", "ba " * 40]


def _build_tiny_checkpoint(target: Path):
    import torch
    from transformers import BertConfig, BertModel, BertTokenizer

    vocab = (
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "[Q]", "[D]"]
        + ["ab", "abc", "cab", "ba", "a", "b", "c"]
        + ["##a", "##b", "##c"]
    )
    target.mkdir(parents=True, exist_ok=True)
    (target / "vocab.txt").write_text("\n".join(vocab))
    tokenizer = BertTokenizer(str(target / "vocab.txt"))
    tokenizer.save_pretrained(target)

    config = BertConfig(
        vocab_size=len(vocab),
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        max_position_embeddings=128,
    )
    torch.manual_seed(5)
    model = BertModel(config)
    model.eval()
    model.save_pretrained(target)
    return model, tokenizer


class TestLambdaEncoder(unittest.TestCase):
    def test_encoder(self):
        encoder = LambdaEncoder(lambda q: np.zeros(shape=(16,)))
        np.testing.assert_equal(encoder(TEST_INPUTS), np.zeros((3, 16)))


class TestTransformerEncoders(unittest.TestCase):
    @classmethod
    def setUpClass(cls):
        cls.tmp = Path(tempfile.mkdtemp())
        cls.torch_model, cls.tokenizer = _build_tiny_checkpoint(cls.tmp / "tiny")

    @classmethod
    def tearDownClass(cls):
        shutil.rmtree(cls.tmp)

    def _torch_hidden(self, texts, **tokenizer_args):
        import torch

        inputs = self.tokenizer(texts, return_tensors="pt", **tokenizer_args)
        with torch.no_grad():
            hidden = self.torch_model(**inputs).last_hidden_state
        return hidden.numpy(), inputs["attention_mask"].numpy()

    def test_cls_pooling(self):
        from fastforward_tpu.encoder import TransformerEncoder

        encoder = TransformerEncoder(self.tmp / "tiny")
        got = encoder(TEST_INPUTS)
        hidden, _ = self._torch_hidden(TEST_INPUTS, padding=True, truncation=True)
        np.testing.assert_allclose(got, hidden[:, 0], atol=2e-4, rtol=1e-3)

    def test_normalized(self):
        from fastforward_tpu.encoder import TransformerEncoder

        encoder = TransformerEncoder(self.tmp / "tiny", normalize=True)
        got = encoder(TEST_INPUTS)
        np.testing.assert_allclose(
            np.linalg.norm(got, axis=1), np.ones(3), rtol=1e-5
        )

    def test_tct_query_template(self):
        from fastforward_tpu.encoder import TCTColBERTQueryEncoder

        encoder = TCTColBERTQueryEncoder(self.tmp / "tiny", max_length=12)
        got = encoder(TEST_INPUTS)

        templated = ["[CLS] [Q] " + q + "[MASK]" * 12 for q in TEST_INPUTS]
        hidden, _ = self._torch_hidden(
            templated, max_length=12, truncation=True, add_special_tokens=False
        )
        expected = hidden[:, 4:].mean(axis=1)
        np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-3)

    def test_tct_document_pooling(self):
        from fastforward_tpu.encoder import TCTColBERTDocumentEncoder

        encoder = TCTColBERTDocumentEncoder(self.tmp / "tiny", max_length=32)
        got = encoder(TEST_INPUTS)

        templated = ["[CLS] [D] " + d for d in TEST_INPUTS]
        hidden, mask = self._torch_hidden(
            templated,
            max_length=32,
            padding=True,
            truncation=True,
            add_special_tokens=False,
        )
        m = mask[:, 4:, None].astype(np.float32)
        expected = (hidden[:, 4:] * m).sum(axis=1) / np.clip(
            m.sum(axis=1), 1e-9, None
        )
        np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-3)

    def test_contriever_pooling(self):
        from fastforward_tpu.encoder import ContrieverEncoder

        encoder = ContrieverEncoder(self.tmp / "tiny")
        got = encoder(TEST_INPUTS)
        hidden, mask = self._torch_hidden(TEST_INPUTS, padding=True, truncation=True)
        m = mask[..., None].astype(np.float32)
        expected = (hidden * m).sum(axis=1) / m.sum(axis=1)
        np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-3)

    def test_bucketing_invariance(self):
        """Same embeddings whether texts are batched together or separately."""
        from fastforward_tpu.encoder import TransformerEncoder

        encoder = TransformerEncoder(self.tmp / "tiny")
        together = encoder(TEST_INPUTS)
        separate = np.concatenate([encoder([t]) for t in TEST_INPUTS])
        np.testing.assert_allclose(together, separate, atol=2e-4, rtol=1e-3)


if __name__ == "__main__":
    unittest.main()
