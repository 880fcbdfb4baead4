"""A/B the classic streamed-ADC PQ kernel vs the pairwise ADC kernel.

Flagship PQ shape (N=2M codes, m=96, Ks=256, dim=768, Q=512, 512k
pairs).  The classic kernel dequantizes every tile row (R=512) per
virtual tile; the pairwise kernel dequantizes only the cap=256 selected
slots — ~2x less MXU work and a TRUE fp32 ADC dot in the exact tier.

Usage: timeout 1750 python scripts/probe_pq_pairwise.py   (background —
Mosaic ADC compiles are erratic, 19-990 s.)
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    str(Path.home() / ".cache" / "fastforward_tpu" / "xla_cache"),
)

print("backend:", jax.default_backend(), flush=True)
assert jax.default_backend() != "cpu", "run this on the TPU tunnel"

from fastforward_tpu.ops import scoring, stream_kernel_pq as skpq

_T0 = time.time()


def log(msg):
    print(f"[{time.time() - _T0:7.1f}s] {msg}", flush=True)


N, M, KS, DS, QB, PAIRS = 2_000_000, 96, 256, 8, 512, 512_000
DIM = M * DS
R = skpq.KERNEL_PQ_TILE_ROWS
N_PAD = ((N + R - 1) // R) * R

rng = np.random.default_rng(11)
codes = rng.integers(0, KS, size=(N_PAD, M)).astype(np.uint8)
cb = rng.normal(size=(M, KS, DS)).astype(np.float32)
q_np = rng.normal(size=(QB, DIM)).astype(np.float32)
rows = rng.choice(N, size=PAIRS, replace=False).astype(np.int64)
qno = np.repeat(np.arange(QB, dtype=np.int64), PAIRS // QB)

cap = scoring._adaptive_cap(PAIRS, N_PAD // R)
cand, tile_idx, slot = scoring.build_streamed_layout(
    rows, qno, N_PAD, QB, r=R, cap=cap
)
tv = cand.shape[0]
log(f"cap={cap}, {tv} virtual tiles, fill {PAIRS / (tv * cap):.2f}")

codes_p = scoring._pad_pq_codes(jnp.asarray(codes), skpq.M_PAD)
np.asarray(codes_p[0, :4])
bd_hi, bd_mid, bd_lo = (
    jnp.asarray(b) for b in skpq.build_blockdiag_codebooks(cb)
)
q_t = jnp.asarray(np.ascontiguousarray(q_np.T))
q = jnp.asarray(q_np)
cand3 = jnp.asarray(cand.reshape(tv, cap // 128, 128))
tile_dev = jnp.asarray(tile_idx)
log("uploaded")

sample = rng.choice(PAIRS, size=2048, replace=False)
deq = cb[np.arange(M)[None, :], codes[rows[sample]]]
gt = np.einsum("pmd,pmd->p", deq, q_np.reshape(QB, M, DS)[qno[sample]])


def bench(name, fn):
    t0 = time.time()
    try:
        out = fn()
        np.asarray(out[0, 0, :8])
    except Exception as e:
        log(f"{name}: FAILED: {type(e).__name__}: {str(e)[:300]}")
        return
    log(f"{name}: first call {time.time() - t0:.1f}s")
    flat = np.asarray(out).reshape(-1)
    err = np.abs(flat[slot[sample]] - gt)
    for _ in range(2):
        iters = 8
        t0 = time.time()
        outs = [fn() for _ in range(iters)]
        np.asarray(outs[-1][0, 0, :8])
        dt = (time.time() - t0) / iters
    log(f"{name}: device {dt * 1e3:.1f} ms/call, max err {err.max():.1e}")


for name, fn in [
    (
        "classic/fast",
        lambda: skpq.stream_select_pq(
            codes_p, bd_hi, bd_mid, bd_lo, q_t, cand3, tile_dev,
            m=M, r=R, precision="fast",
        ),
    ),
    (
        "classic/exact",
        lambda: skpq.stream_select_pq(
            codes_p, bd_hi, bd_mid, bd_lo, q_t, cand3, tile_dev,
            m=M, r=R, precision="exact",
        ),
    ),
    (
        "pairwise/fast",
        lambda: skpq.stream_select_pq_pairwise(
            codes_p, bd_hi, bd_mid, bd_lo, q, cand3, tile_dev,
            m=M, r=R, exact=False,
        ),
    ),
    (
        "pairwise/exact",
        lambda: skpq.stream_select_pq_pairwise(
            codes_p, bd_hi, bd_mid, bd_lo, q, cand3, tile_dev,
            m=M, r=R, exact=True,
        ),
    ),
]:
    bench(name, fn)
print("rc=0", flush=True)
