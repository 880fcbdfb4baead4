"""Numerical parity of the JAX towers against torch reference models.

The reference's golden-embedding harness (``tests/_constants.py`` there)
requires downloading the real checkpoints; in this offline environment the
same property is tested structurally: a randomly-initialized HF *torch*
BERT/DistilBERT is converted with ``from_hf_torch`` and must reproduce the
torch forward to ~1e-4.  (With real checkpoints the identical conversion path
yields the reference encoders' numerics.)
"""

import unittest

import numpy as np

from fastforward_tpu.models import bert


def _random_inputs(rng, batch, length, vocab):
    ids = rng.integers(0, vocab, size=(batch, length))
    mask = np.ones((batch, length), dtype=np.int64)
    # ragged: last rows padded
    mask[1, length // 2 :] = 0
    mask[-1, 2:] = 0
    ids = ids * mask
    return ids, mask


class TestBertParity(unittest.TestCase):
    def test_bert_matches_torch(self):
        import torch
        from transformers import BertConfig as HFBertConfig
        from transformers import BertModel

        hf_config = HFBertConfig(
            vocab_size=512,
            hidden_size=64,
            num_hidden_layers=3,
            num_attention_heads=4,
            intermediate_size=128,
            max_position_embeddings=64,
        )
        torch.manual_seed(0)
        torch_model = BertModel(hf_config)
        torch_model.eval()

        params, config = bert.from_hf_torch(torch_model)
        rng = np.random.default_rng(0)
        ids, mask = _random_inputs(rng, 4, 12, 512)

        with torch.no_grad():
            expected = torch_model(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
            ).last_hidden_state.numpy()

        got = np.asarray(
            bert.encode(
                params,
                np.asarray(ids, dtype=np.int32),
                np.asarray(mask, dtype=np.int32),
                config,
            )
        )
        np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-3)

    def test_distilbert_matches_torch(self):
        import torch
        from transformers import DistilBertConfig as HFDistilBertConfig
        from transformers import DistilBertModel

        hf_config = HFDistilBertConfig(
            vocab_size=512,
            dim=64,
            n_layers=3,
            n_heads=4,
            hidden_dim=128,
            max_position_embeddings=64,
        )
        torch.manual_seed(1)
        torch_model = DistilBertModel(hf_config)
        torch_model.eval()

        params, config = bert.from_hf_torch(torch_model)
        self.assertEqual(0, config.type_vocab_size)
        rng = np.random.default_rng(1)
        ids, mask = _random_inputs(rng, 4, 10, 512)

        with torch.no_grad():
            expected = torch_model(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
            ).last_hidden_state.numpy()

        got = np.asarray(
            bert.encode(
                params,
                np.asarray(ids, dtype=np.int32),
                np.asarray(mask, dtype=np.int32),
                config,
            )
        )
        np.testing.assert_allclose(got, expected, atol=2e-4, rtol=1e-3)


class TestPooling(unittest.TestCase):
    """Pooling variants reproduce the reference formulas.

    (Reference: ``encoder/transformer.py:62-261``.)
    """

    def setUp(self):
        rng = np.random.default_rng(2)
        self.hidden = rng.normal(size=(3, 10, 8)).astype(np.float32)
        self.mask = np.ones((3, 10), dtype=np.int32)
        self.mask[1, 6:] = 0
        self.mask[2, 3:] = 0

    def test_cls(self):
        np.testing.assert_allclose(
            np.asarray(bert.pool_cls(self.hidden, self.mask)), self.hidden[:, 0]
        )

    def test_mean_from_4(self):
        np.testing.assert_allclose(
            np.asarray(bert.pool_mean_from(self.hidden, self.mask)),
            self.hidden[:, 4:].mean(axis=1),
            rtol=1e-6,
        )

    def test_masked_mean_from_4(self):
        tokens = self.hidden[:, 4:]
        m = self.mask[:, 4:, None].astype(np.float32)
        expected = (tokens * m).sum(axis=1) / np.clip(m.sum(axis=1), 1e-9, None)
        np.testing.assert_allclose(
            np.asarray(bert.pool_masked_mean_from(self.hidden, self.mask)),
            expected,
            rtol=1e-5,
        )

    def test_masked_mean(self):
        m = self.mask[..., None].astype(np.float32)
        expected = (self.hidden * m).sum(axis=1) / m.sum(axis=1)
        np.testing.assert_allclose(
            np.asarray(bert.pool_masked_mean(self.hidden, self.mask)),
            expected,
            rtol=1e-5,
        )

    def test_l2_normalize(self):
        x = np.asarray([[3.0, 4.0], [1.0, 0.0]], dtype=np.float32)
        got = np.asarray(bert.l2_normalize(x))
        np.testing.assert_allclose(
            got, x / np.linalg.norm(x, axis=-1, keepdims=True), rtol=1e-6
        )


class TestEncodeJit(unittest.TestCase):
    def test_tiny_forward_shapes(self):
        config = bert.BertConfig.tiny()
        params = bert.init_params(config)
        ids = np.zeros((2, 16), dtype=np.int32)
        mask = np.ones((2, 16), dtype=np.int32)
        out = bert.encode_jit(params, ids, mask, config)
        self.assertEqual((2, 16, config.hidden_size), out.shape)


if __name__ == "__main__":
    unittest.main()
