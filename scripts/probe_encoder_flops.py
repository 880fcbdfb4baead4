"""Roofline sanity for the encoder path: raw matmul vs BERT tower, fp32 vs bf16.

Run on the real chip:  timeout 900 python scripts/probe_encoder_flops.py
"""

import sys
import time
from dataclasses import replace
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from fastforward_tpu.models import bert


def timed(fn, *args, n=5):
    out = fn(*args)
    np.asarray(out).ravel()[:1]
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out).ravel()[:1]
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best


def main() -> None:
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)

    # raw matmul roofline: (23040, 768) x (768, 3072) ~ 108 GFLOP
    for dt in (jnp.float32, jnp.bfloat16):
        a = jnp.asarray(rng.standard_normal((23040, 768)), dtype=dt)
        b = jnp.asarray(rng.standard_normal((768, 3072)), dtype=dt)
        f = jax.jit(lambda x, y: (x @ y).sum())
        best = timed(f, a, b)
        gflop = 2 * 23040 * 768 * 3072 / 1e9
        print(
            f"matmul {dt.__name__}: {best*1e3:.2f} ms -> {gflop/best/1e3:.1f} TFLOP/s",
            flush=True,
        )

    import torch
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel

    torch.manual_seed(0)
    hf_model = BertModel(HFBertConfig())
    hf_model.eval()
    params, config = bert.from_hf_torch(hf_model)
    del hf_model

    ids = rng.integers(100, 10_000, size=(640, 36)).astype(np.int32)
    mask = np.ones_like(ids)
    for dtype in ("float32", "bfloat16"):
        cfg = replace(config, dtype=dtype)
        best = timed(
            lambda i, m: bert.encode_jit(params, i, m, cfg), ids, mask, n=5
        )
        gflop = 2 * 640 * 36 * (12 * (4 * 768 * 768 + 2 * 768 * 3072)) / 1e9
        print(
            f"bert 640x36 {dtype}: {best*1e3:.1f} ms -> {gflop/best/1e3:.2f} TFLOP/s "
            f"({640/best:.0f} q/s)",
            flush=True,
        )

    # longer sequence (lane-aligned): does seq=128 change the picture?
    ids2 = rng.integers(100, 10_000, size=(256, 128)).astype(np.int32)
    mask2 = np.ones_like(ids2)
    for dtype in ("float32", "bfloat16"):
        cfg = replace(config, dtype=dtype)
        best = timed(
            lambda i, m: bert.encode_jit(params, i, m, cfg), ids2, mask2, n=5
        )
        print(f"bert 256x128 {dtype}: {best*1e3:.1f} ms ({256/best:.0f} q/s)", flush=True)


if __name__ == "__main__":
    main()
