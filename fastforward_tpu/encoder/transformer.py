"""Transformer encoders: HF checkpoints running as jitted JAX towers.

Capability match for the reference's torch-based encoders (reference:
``encoder/transformer.py:18-261``): the same five pretrained dual-encoder
variants (TCT-ColBERT query/document, TAS-B, Contriever, BGE) with their
input templates and pooling rules, but the forward pass is the pure-JAX tower
from ``fastforward_tpu.models.bert`` — tokenize on host, pad the batch to a
bucketed sequence length (stable jit shapes), run encode+pool+normalize as
one device program.
"""

import logging
from collections.abc import Mapping, Sequence
from functools import partial
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from fastforward_tpu.encoder.base import Encoder
from fastforward_tpu.models import bert

LOGGER = logging.getLogger(__name__)

_POOLING = {
    "cls": bert.pool_cls,
    "mean_from_4": bert.pool_mean_from,
    "masked_mean_from_4": bert.pool_masked_mean_from,
    "masked_mean": bert.pool_masked_mean,
}


@partial(jax.jit, static_argnames=("config", "pooling", "normalize"))
def _encode_pool(params, input_ids, attention_mask, config, pooling, normalize):
    hidden = bert.encode(params, input_ids, attention_mask, config)
    pooled = _POOLING[pooling](hidden, attention_mask)
    if normalize:
        pooled = bert.l2_normalize(pooled)
    return pooled


def _length_bucket(n: int, maximum: int) -> int:
    """Pad sequence lengths to a small set of buckets to limit recompiles."""
    size = 16
    while size < n:
        size *= 2
    return min(size, maximum)


class TransformerEncoder(Encoder):
    """Encoder backed by a pre-trained BERT-family Transformer.

    By default the CLS-token output of the last hidden layer is used.
    """

    _pooling = "cls"

    def __init__(
        self,
        model: "str | Path",
        device: str | None = None,
        model_args: Mapping[str, Any] = {},
        tokenizer_args: Mapping[str, Any] = {},
        tokenizer_call_args: Mapping[str, Any] = {
            "padding": True,
            "truncation": True,
        },
        normalize: bool = False,
        compute_dtype: str = "float32",
    ) -> None:
        """Create a Transformer encoder.

        :param model: Pre-trained model (HF name or path).
        :param device: Unused (kept for reference API compatibility; JAX
            places computation on the default backend).
        :param model_args: Extra arguments for the HF model loader.
        :param tokenizer_args: Extra arguments for the tokenizer.
        :param tokenizer_call_args: Extra arguments for tokenizer calls.
        :param normalize: L2-normalize the output embeddings.
        :param compute_dtype: ``"float32"`` (reference numerics) or
            ``"bfloat16"`` (~2x MXU throughput).
        """
        del device
        from transformers import AutoModel, AutoTokenizer

        torch_model = AutoModel.from_pretrained(model, **model_args)
        self._params, self._config = bert.from_hf_torch(torch_model)
        if compute_dtype != "float32":
            from dataclasses import replace

            self._config = replace(self._config, dtype=compute_dtype)
        del torch_model
        self._tokenizer = AutoTokenizer.from_pretrained(model, **tokenizer_args)
        self._tokenizer_call_args = dict(tokenizer_call_args)
        self._normalize = normalize

    def _get_tokenizer_inputs(self, texts: Sequence[str]) -> list[str]:
        """Hook: prepare raw texts for tokenization (template insertion)."""
        return list(texts)

    def _encode(self, texts: Sequence[str]) -> np.ndarray:
        call_args = dict(self._tokenizer_call_args)
        call_args.setdefault("padding", True)
        tokenized = self._tokenizer(
            self._get_tokenizer_inputs(texts), return_tensors="np", **call_args
        )
        ids = tokenized["input_ids"]
        mask = tokenized["attention_mask"]

        # pad batch and length to buckets for stable jit shapes; unmasked
        # pooling (mean_from_4) is padding-sensitive, so it keeps the exact
        # tokenizer length (constant anyway for the TCT query template)
        n, length = ids.shape
        max_len = self._config.max_position_embeddings
        if self._pooling == "mean_from_4":
            len_pad = length
        else:
            len_pad = max(_length_bucket(length, max_len), length)
        n_pad = max(8, 1 << max(0, n - 1).bit_length())
        ids_p = np.zeros((n_pad, len_pad), dtype=np.int32)
        mask_p = np.zeros((n_pad, len_pad), dtype=np.int32)
        ids_p[:n, :length] = ids
        mask_p[:n, :length] = mask

        out = _encode_pool(
            self._params,
            jnp.asarray(ids_p),
            jnp.asarray(mask_p),
            self._config,
            self._pooling,
            self._normalize,
        )
        return np.asarray(out)[:n]


class TCTColBERTQueryEncoder(TransformerEncoder):
    """TCT-ColBERT query tower (paper: https://aclanthology.org/2021.repl4nlp-1.17/).

    Template ``[CLS] [Q] <query> [MASK]*n`` with mean pooling over tokens 4+
    (reference: ``encoder/transformer.py:93-134``).
    """

    _pooling = "mean_from_4"

    def __init__(
        self,
        model: "str | Path" = "castorini/tct_colbert-msmarco",
        device: str | None = None,
        max_length: int = 36,
    ) -> None:
        """Create a TCT-ColBERT query encoder.

        :param model: Pre-trained TCT-ColBERT model (name or path).
        :param device: Unused (reference API compatibility).
        :param max_length: Maximum number of query tokens.
        """
        self._max_length = max_length
        super().__init__(
            model,
            tokenizer_call_args={
                "max_length": max_length,
                "truncation": True,
                "add_special_tokens": False,
            },
        )

    def _get_tokenizer_inputs(self, texts: Sequence[str]) -> list[str]:
        return ["[CLS] [Q] " + q + "[MASK]" * self._max_length for q in texts]


class TCTColBERTDocumentEncoder(TransformerEncoder):
    """TCT-ColBERT document tower.

    Template ``[CLS] [D] <doc>`` with attention-masked mean pooling over
    tokens 4+ (reference: ``encoder/transformer.py:137-188``).
    """

    _pooling = "masked_mean_from_4"

    def __init__(
        self,
        model: "str | Path" = "castorini/tct_colbert-msmarco",
        device: str | None = None,
        max_length: int = 512,
    ) -> None:
        """Create a TCT-ColBERT document encoder.

        :param model: Pre-trained TCT-ColBERT model (name or path).
        :param device: Unused (reference API compatibility).
        :param max_length: Maximum number of document tokens.
        """
        self._max_length = max_length
        super().__init__(
            model,
            tokenizer_call_args={
                "max_length": max_length,
                "padding": True,
                "truncation": True,
                "add_special_tokens": False,
            },
        )

    def _get_tokenizer_inputs(self, texts: Sequence[str]) -> list[str]:
        return ["[CLS] [D] " + d for d in texts]


class TASBEncoder(TransformerEncoder):
    """TAS-B (topic-aware sampling) DistilBERT encoder, CLS pooling.

    Paper: https://dl.acm.org/doi/10.1145/3404835.3462891.
    """

    def __init__(
        self,
        model: "str | Path" = "sebastian-hofstaetter/distilbert-dot-tas_b-b256-msmarco",
        device: str | None = None,
    ) -> None:
        """Create a TAS-B encoder.

        :param model: Pre-trained TAS-B model (name or path).
        :param device: Unused (reference API compatibility).
        """
        super().__init__(model)


class ContrieverEncoder(TransformerEncoder):
    """Contriever encoder, masked mean pooling over all tokens.

    Paper: https://openreview.net/forum?id=jKN1pXi7b0.
    """

    _pooling = "masked_mean"

    def __init__(
        self,
        model: "str | Path" = "facebook/contriever",
        device: str | None = None,
    ) -> None:
        """Create a Contriever encoder.

        :param model: Pre-trained Contriever model (name or path).
        :param device: Unused (reference API compatibility).
        """
        super().__init__(model)


class BGEEncoder(TransformerEncoder):
    """BGE encoder, CLS pooling with L2 normalization.

    Paper: https://dl.acm.org/doi/10.1145/3626772.3657878.
    """

    def __init__(
        self,
        model: "str | Path" = "BAAI/bge-base-en-v1.5",
        device: str | None = None,
    ) -> None:
        """Create a BGE encoder.

        :param model: Pre-trained BGE model (name or path).
        :param device: Unused (reference API compatibility).
        """
        super().__init__(model, normalize=True)
