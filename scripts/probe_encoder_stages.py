"""Stage timing for the query-encoder bench: upload vs dispatch vs fetch.

The encoder bench (bench.py --config encoder) measures ~69 ms per 32-query
call on the dev tunnel, far above the BERT-base compute roofline.  This
probe separates the per-call costs so the bench (and the encoder fast path)
can overlap the right stage.

Run on the real chip:  timeout 900 python scripts/probe_encoder_stages.py
"""

import sys
import time
from pathlib import Path

import jax
import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from fastforward_tpu.models import bert


def main() -> None:
    import torch
    from transformers import BertConfig as HFBertConfig
    from transformers import BertModel

    torch.manual_seed(0)
    hf_model = BertModel(HFBertConfig())
    hf_model.eval()
    params, config = bert.from_hf_torch(hf_model)
    del hf_model

    batch, length, repeats = 32, 36, 20
    rng = np.random.default_rng(0)
    batches = [
        rng.integers(100, 10_000, size=(batch, length)).astype(np.int32)
        for _ in range(repeats)
    ]
    mask = np.ones((batch, length), dtype=np.int32)
    print("backend:", jax.default_backend(), flush=True)

    np.asarray(bert.encode_jit(params, batches[0], mask, config))

    # stage 1: upload all batches (async issue, then block)
    for trial in range(3):
        t0 = time.perf_counter()
        devs = [jax.device_put(b) for b in batches]
        mask_d = jax.device_put(mask)
        for d in devs:
            d.block_until_ready()
        t_up = time.perf_counter() - t0

        # stage 2: dispatch all encodes
        t0 = time.perf_counter()
        outs = [bert.encode_jit(params, d, mask_d, config) for d in devs]
        t_disp = time.perf_counter() - t0

        # stage 3: async-issue host copies, then collect
        t0 = time.perf_counter()
        for o in outs:
            try:
                o.copy_to_host_async()
            except Exception:
                pass
        for o in outs:
            np.asarray(o)
        t_fetch = time.perf_counter() - t0

        total = t_up + t_disp + t_fetch
        print(
            f"trial {trial}: upload {t_up*1e3:.1f} ms  dispatch {t_disp*1e3:.1f} ms  "
            f"fetch+exec {t_fetch*1e3:.1f} ms  -> {batch*repeats/total:.1f} q/s",
            flush=True,
        )

    # variant: single fused upload (all batches as one array) + vmapped-style
    # single dispatch over the stacked batch
    stacked = np.concatenate(batches, axis=0)  # (batch*repeats, length)
    big_mask = np.ones_like(stacked)
    np.asarray(bert.encode_jit(params, stacked, big_mask, config))
    for trial in range(3):
        t0 = time.perf_counter()
        out = bert.encode_jit(params, stacked, big_mask, config)
        np.asarray(out)
        dt = time.perf_counter() - t0
        print(
            f"trial {trial}: one fused call ({stacked.shape[0]}x{length}) "
            f"{dt*1e3:.1f} ms -> {stacked.shape[0]/dt:.1f} q/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
