"""Round-3 TPU validation: run after the axon tunnel returns.

Checks, in order (each prints PASS/FAIL):
1. device enumeration;
2. PQ Pallas ADC kernel, exact tier (3-part hi/mid/lo splits) — compile +
   parity vs numpy decode-then-dot at fp32 tolerance on the REAL chip;
3. the aliased lane-padded PQ view: one InMemoryIndex serving through the
   kernel AND (kernel force-disabled) through the XLA scan from the same
   (N_pad, 128) table;
4. a short dense re-rank through the public API with ground-truth check.

Usage: timeout 1100 python scripts/tpu_validate_r3.py   (background it —
first Mosaic compiles can take minutes).
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

print("backend:", jax.default_backend(), jax.devices(), flush=True)
assert jax.default_backend() != "cpu", "run this on the TPU tunnel"

from fastforward_tpu.encoder import LambdaEncoder
from fastforward_tpu.index import InMemoryIndex, Mode
from fastforward_tpu.ops import scoring
from fastforward_tpu.quantizer import PQ
from fastforward_tpu.ranking import Ranking

rng = np.random.default_rng(0)

# --- 2. kernel exact-tier parity on chip ---------------------------------
import jax.numpy as jnp

from fastforward_tpu.ops import stream_kernel_pq as skpq

n_pad, m, ks, ds, qb, p = 4096, 16, 16, 8, 8, 3000
r = skpq.KERNEL_PQ_TILE_ROWS
codes = rng.integers(0, ks, size=(n_pad, m)).astype(np.uint8)
cb = rng.normal(size=(m, ks, ds)).astype(np.float32)
q = rng.normal(size=(qb, m * ds)).astype(np.float32)
rows = rng.integers(0, n_pad, size=p).astype(np.int64)
qno = rng.integers(0, qb, size=p).astype(np.int64)
cand, tile_idx, slot = scoring.build_streamed_layout(
    rows, qno, n_pad, qb, r=r, cap=512
)
codes_p = scoring._pad_pq_codes(jnp.asarray(codes), skpq.M_PAD)
bd_hi, bd_mid, bd_lo = skpq.build_blockdiag_codebooks(cb)
t0 = time.time()
outs = skpq.stream_select_pq(
    codes_p, jnp.asarray(bd_hi), jnp.asarray(bd_mid), jnp.asarray(bd_lo),
    np.ascontiguousarray(q.T), cand.reshape(cand.shape[0], -1, 128),
    tile_idx, m=m, r=r, precision="exact",
)
got = np.asarray(outs).reshape(-1)[slot]
print(f"kernel exact compile+run: {time.time() - t0:.1f}s", flush=True)
deq = cb[np.arange(m)[None, :], codes[rows]]
expected = np.einsum("pmd,pmd->p", deq, q.reshape(qb, m, ds)[qno])
err = np.abs(got - expected).max()
print(f"{'PASS' if err < 1e-4 else 'FAIL'} kernel exact max abs err {err:.2e}")

# high/fast tiers compile too
for tier in ("high", "fast"):
    outs = skpq.stream_select_pq(
        codes_p, jnp.asarray(bd_hi), jnp.asarray(bd_mid),
        jnp.asarray(bd_lo), np.ascontiguousarray(q.T),
        cand.reshape(cand.shape[0], -1, 128), tile_idx,
        m=m, r=r, precision=tier,
    )
    gt = np.asarray(outs).reshape(-1)[slot]
    scale = np.abs(expected).mean()
    ok = np.abs(gt - expected).mean() < 0.02 * scale
    print(f"{'PASS' if ok else 'FAIL'} kernel {tier} tier", flush=True)

# --- 3. aliased padded view: kernel AND scan from one table ---------------
n, dim = 65536, 768
corpus = rng.normal(size=(n, dim)).astype(np.float32)
qvec = rng.normal(size=dim).astype(np.float32)
quant = PQ(96, 256)
quant.fit(corpus[:8192])
index = InMemoryIndex(
    LambdaEncoder(lambda _: qvec), quantizer=quant,
    mode=Mode.PASSAGE, precision="fast",
)
index.add(corpus, psg_ids=[f"p{i}" for i in range(n)])
view = index._device_view()
print("PQ view table shape:", view.table.shape,
      "(expect lane-padded 128 cols)", flush=True)
run = {"q1": {f"p{i}": 1.0 for i in range(0, n, 16)}}
ranking = Ranking.from_run(run, queries={"q1": "x"})
out_kernel = index(ranking)["q1"]
scoring.set_pallas_stream(False)
try:
    out_scan = index(Ranking.from_run(run, queries={"q1": "x"}))["q1"]
finally:
    scoring.set_pallas_stream(None)
diff = max(abs(out_kernel[k] - out_scan[k]) for k in out_kernel)
decoded = quant.decode(quant.encode(corpus[:64]))
print(f"{'PASS' if diff < 0.05 else 'FAIL'} kernel-vs-scan from one table, "
      f"max diff {diff:.4f}", flush=True)

# --- 4. dense public-API ground truth -------------------------------------
dense = InMemoryIndex(LambdaEncoder(lambda _: qvec), mode=Mode.PASSAGE)
dense.add(corpus, psg_ids=[f"p{i}" for i in range(n)])
out = dense(ranking)["q1"]
errs = [abs(out[f"p{i}"] - float(corpus[i] @ qvec)) for i in range(0, n, 4096)]
print(f"{'PASS' if max(errs) < 1e-2 else 'FAIL'} dense ground truth, "
      f"max err {max(errs):.2e}")
print("DONE", flush=True)
