"""BERT-family towers as pure JAX functions (BERT + DistilBERT).

The reference delegates query/document encoding to HuggingFace *torch* models
(reference: ``encoder/transformer.py:18-90``); here the towers are
re-implemented as pure jnp functions over a stacked parameter pytree so the
whole forward is one jitted XLA program: layers are folded with ``lax.scan``
(one compiled layer body regardless of depth), attention/FFN matmuls hit the
MXU in fp32 (or bf16 by casting the params), and pooling variants fuse into
the same program.

Weights convert from HF torch checkpoints (``from_hf_torch``) — covering
BERT (TCT-ColBERT, Contriever, BGE) and DistilBERT (TAS-B) — so the encoders
reproduce the reference's numerics (parity-tested against torch in
``tests/test_models.py``).
"""

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class BertConfig:
    """Shape configuration of a BERT-family tower."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2  # 0: no token-type embeddings (DistilBERT)
    layer_norm_eps: float = 1e-12
    # "bfloat16" runs the matmul-heavy blocks in bf16 (fp32 accumulation on
    # the MXU, layer norms in fp32) for ~2x throughput; "float32" matches
    # the torch reference bit-for-bit within test tolerances
    dtype: str = "float32"

    @classmethod
    def tiny(cls) -> "BertConfig":
        """A small config for tests and compile checks."""
        return cls(
            vocab_size=1024,
            hidden_size=128,
            num_layers=2,
            num_heads=2,
            intermediate_size=256,
            max_position_embeddings=128,
        )


def _layer_norm(x: jnp.ndarray, scale, bias, eps: float) -> jnp.ndarray:
    # always normalize in fp32 (bf16 mean/variance is unstable)
    dt = x.dtype
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    out = (x - mean) * jax.lax.rsqrt(var + eps) * scale.astype(
        jnp.float32
    ) + bias.astype(jnp.float32)
    return out.astype(dt)


def _attention(x, mask_bias, p, num_heads: int):
    """Multi-head self-attention block (pre-residual part)."""
    b, l, h = x.shape
    d = h // num_heads

    def split(t):
        return t.reshape(b, l, num_heads, d).transpose(0, 2, 1, 3)

    q = split((x @ p["q_w"] + p["q_b"]).astype(x.dtype))
    k = split((x @ p["k_w"] + p["k_b"]).astype(x.dtype))
    v = split((x @ p["v_w"] + p["v_b"]).astype(x.dtype))

    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) / np.sqrt(d)
    weights = jax.nn.softmax(logits + mask_bias, axis=-1).astype(v.dtype)
    ctx = jnp.einsum(
        "bhqk,bhkd->bhqd", weights, v, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(b, l, h)
    return ctx @ p["o_w"] + p["o_b"]


def encode(
    params: dict,
    input_ids: jnp.ndarray,
    attention_mask: jnp.ndarray,
    config: BertConfig,
    token_type_ids: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Run the tower; returns the last hidden state ``(B, L, H)``.

    :param params: Parameter pytree (see ``init_params``/``from_hf_torch``).
    :param input_ids: Token ids, ``(B, L)`` int32.
    :param attention_mask: 1 for real tokens, 0 for padding, ``(B, L)``.
    :param config: The tower configuration.
    :param token_type_ids: Optional segment ids, ``(B, L)``.
    """
    emb = params["embeddings"]
    b, l = input_ids.shape
    dt = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
    x = jnp.take(emb["word"], input_ids, axis=0).astype(jnp.float32)
    x = x + emb["position"][None, :l].astype(jnp.float32)
    if config.type_vocab_size > 0:
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        x = x + jnp.take(emb["token_type"], token_type_ids, axis=0).astype(
            jnp.float32
        )
    x = _layer_norm(
        x, emb["ln_scale"], emb["ln_bias"], config.layer_norm_eps
    ).astype(dt)

    # additive attention bias, matching the HF convention of
    # (1 - mask) * finfo.min so padded keys get (effectively) -inf logits
    mask_bias = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * (
        jnp.finfo(jnp.float32).min
    )

    def layer(x, p):
        p = jax.tree.map(lambda a: a.astype(dt), p)
        attn = _attention(x, mask_bias, p, config.num_heads).astype(dt)
        x = _layer_norm(
            x + attn, p["attn_ln_s"], p["attn_ln_b"], config.layer_norm_eps
        )
        ffn = jax.nn.gelu(
            (x @ p["ffn_in_w"] + p["ffn_in_b"]).astype(jnp.float32),
            approximate=False,
        ).astype(dt)
        ffn = (ffn @ p["ffn_out_w"] + p["ffn_out_b"]).astype(dt)
        x = _layer_norm(
            x + ffn, p["ffn_ln_s"], p["ffn_ln_b"], config.layer_norm_eps
        )
        return x, None

    # layers are stacked along a leading axis; scan compiles the body once
    x, _ = jax.lax.scan(layer, x, params["layers"])
    return x.astype(jnp.float32)


# -- pooling variants (reference: encoder/transformer.py:62-261) --------------


def pool_cls(hidden: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
    """CLS-token pooling (TransformerEncoder default / TAS-B / BGE)."""
    del attention_mask
    return hidden[:, 0]


def pool_mean_from(
    hidden: jnp.ndarray, attention_mask: jnp.ndarray, start: int = 4
) -> jnp.ndarray:
    """Unmasked mean over tokens ``start:`` (TCT-ColBERT queries)."""
    del attention_mask
    return jnp.mean(hidden[:, start:], axis=1)


def pool_masked_mean_from(
    hidden: jnp.ndarray, attention_mask: jnp.ndarray, start: int = 4
) -> jnp.ndarray:
    """Attention-mask-weighted mean over tokens ``start:`` (TCT-ColBERT docs)."""
    tokens = hidden[:, start:]
    mask = attention_mask[:, start:, None].astype(hidden.dtype)
    total = jnp.sum(tokens * mask, axis=1)
    denom = jnp.clip(jnp.sum(mask, axis=1), min=1e-9)
    return total / denom


def pool_masked_mean(
    hidden: jnp.ndarray, attention_mask: jnp.ndarray
) -> jnp.ndarray:
    """Masked mean over all tokens (Contriever)."""
    mask = attention_mask[..., None].astype(hidden.dtype)
    return jnp.sum(hidden * mask, axis=1) / jnp.sum(mask, axis=1)


def l2_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """Row-wise L2 normalization (BGE)."""
    return x / jnp.linalg.norm(x, axis=-1, keepdims=True).clip(min=1e-12)


# -- parameter construction ---------------------------------------------------


def init_params(config: BertConfig, seed: int = 0) -> dict:
    """Randomly initialized parameters (for tests / compile checks)."""
    rng = np.random.default_rng(seed)
    h, i = config.hidden_size, config.intermediate_size

    def mat(*shape):
        return jnp.asarray(rng.normal(0, 0.02, size=shape).astype(np.float32))

    def zeros(*shape):
        return jnp.zeros(shape, jnp.float32)

    def ones(*shape):
        return jnp.ones(shape, jnp.float32)

    n = config.num_layers
    params = {
        "embeddings": {
            "word": mat(config.vocab_size, h),
            "position": mat(config.max_position_embeddings, h),
            "ln_scale": ones(h),
            "ln_bias": zeros(h),
        },
        "layers": {
            "q_w": mat(n, h, h),
            "q_b": zeros(n, h),
            "k_w": mat(n, h, h),
            "k_b": zeros(n, h),
            "v_w": mat(n, h, h),
            "v_b": zeros(n, h),
            "o_w": mat(n, h, h),
            "o_b": zeros(n, h),
            "attn_ln_s": ones(n, h),
            "attn_ln_b": zeros(n, h),
            "ffn_in_w": mat(n, h, i),
            "ffn_in_b": zeros(n, i),
            "ffn_out_w": mat(n, i, h),
            "ffn_out_b": zeros(n, h),
            "ffn_ln_s": ones(n, h),
            "ffn_ln_b": zeros(n, h),
        },
    }
    if config.type_vocab_size > 0:
        params["embeddings"]["token_type"] = mat(config.type_vocab_size, h)
    return params


def _stack(tensors: list[np.ndarray]) -> jnp.ndarray:
    return jnp.asarray(np.stack(tensors))


def from_hf_torch(model) -> tuple[dict, BertConfig]:
    """Convert a HuggingFace torch ``BertModel`` or ``DistilBertModel``.

    :param model: The torch model instance (weights already loaded).
    :return: ``(params, config)`` for :func:`encode`.
    """
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    cfg = model.config

    if cfg.model_type == "distilbert":
        config = BertConfig(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.dim,
            num_layers=cfg.n_layers,
            num_heads=cfg.n_heads,
            intermediate_size=cfg.hidden_dim,
            max_position_embeddings=cfg.max_position_embeddings,
            type_vocab_size=0,
            layer_norm_eps=1e-12,
        )
        prefix = "transformer.layer"
        names = {
            "q": "attention.q_lin",
            "k": "attention.k_lin",
            "v": "attention.v_lin",
            "o": "attention.out_lin",
            "attn_ln": "sa_layer_norm",
            "ffn_in": "ffn.lin1",
            "ffn_out": "ffn.lin2",
            "ffn_ln": "output_layer_norm",
        }
    else:
        config = BertConfig(
            vocab_size=cfg.vocab_size,
            hidden_size=cfg.hidden_size,
            num_layers=cfg.num_hidden_layers,
            num_heads=cfg.num_attention_heads,
            intermediate_size=cfg.intermediate_size,
            max_position_embeddings=cfg.max_position_embeddings,
            type_vocab_size=cfg.type_vocab_size,
            layer_norm_eps=cfg.layer_norm_eps,
        )
        prefix = "encoder.layer"
        names = {
            "q": "attention.self.query",
            "k": "attention.self.key",
            "v": "attention.self.value",
            "o": "attention.output.dense",
            "attn_ln": "attention.output.LayerNorm",
            "ffn_in": "intermediate.dense",
            "ffn_out": "output.dense",
            "ffn_ln": "output.LayerNorm",
        }

    def linear(layer, name):
        # torch Linear stores (out, in); we use x @ W with (in, out)
        return (
            sd[f"{prefix}.{layer}.{name}.weight"].T,
            sd[f"{prefix}.{layer}.{name}.bias"],
        )

    n = config.num_layers
    stacked: dict[str, jnp.ndarray] = {}
    for key, hf_name in names.items():
        if key.endswith("_ln"):
            stacked[f"{key}_s"] = _stack(
                [sd[f"{prefix}.{i}.{hf_name}.weight"] for i in range(n)]
            )
            stacked[f"{key}_b"] = _stack(
                [sd[f"{prefix}.{i}.{hf_name}.bias"] for i in range(n)]
            )
        else:
            weights, biases = zip(*(linear(i, hf_name) for i in range(n)))
            stacked[f"{key}_w"] = _stack(list(weights))
            stacked[f"{key}_b"] = _stack(list(biases))

    params = {
        "embeddings": {
            "word": jnp.asarray(sd["embeddings.word_embeddings.weight"]),
            "position": jnp.asarray(sd["embeddings.position_embeddings.weight"]),
            "ln_scale": jnp.asarray(sd["embeddings.LayerNorm.weight"]),
            "ln_bias": jnp.asarray(sd["embeddings.LayerNorm.bias"]),
        },
        "layers": stacked,
    }
    if config.type_vocab_size > 0:
        params["embeddings"]["token_type"] = jnp.asarray(
            sd["embeddings.token_type_embeddings.weight"]
        )
    return params, config


@partial(jax.jit, static_argnames=("config",))
def encode_jit(params, input_ids, attention_mask, config: BertConfig):
    """Jitted :func:`encode` (config is static)."""
    return encode(params, input_ids, attention_mask, config)
