"""A/B the classic matmul-select stream kernel vs the pairwise kernel.

The classic ``stream_select`` scores every tile row against every query
(R x dim x Qb MACs per tile, independent of how many candidates the tile
holds) and one-hot-selects.  ``stream_select_pairwise`` one-hot-selects
the candidate ROWS and each candidate's QUERY vector, then takes rowwise
dots — cost scales with the candidate count.  At the flagship shape the
pairwise exact tier is ~3x fewer FLOPs than HIGHEST and gives TRUE fp32
dots.  This probe measures both on the real chip at bench shapes and
checks numeric parity vs numpy.

Usage: timeout 1750 python scripts/probe_pairwise_kernel.py   (background
it — Mosaic compile times for new kernel bodies are erratic, 19s-990s.)
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

from fastforward_tpu.ops import scoring, stream_kernel

_T0 = time.time()


def log(msg):
    print(f"[{time.time() - _T0:7.1f}s] {msg}", flush=True)


# flagship shape: N=2M, dim=768, Q=512, depth-1000 -> 512k pairs
N, DIM, QB, PAIRS = 2_000_000, 768, 512, 512_000
R, CAP = stream_kernel.KERNEL_TILE_ROWS, stream_kernel.KERNEL_CAP
N_PAD = ((N + R - 1) // R) * R

rng = np.random.default_rng(7)
table_np = rng.normal(size=(N_PAD, DIM)).astype(np.float32)
q_np = rng.normal(size=(QB, DIM)).astype(np.float32)
rows = rng.choice(N, size=PAIRS, replace=False).astype(np.int64)
qno = np.repeat(np.arange(QB, dtype=np.int64), PAIRS // QB)

cap = scoring._adaptive_cap(PAIRS, N_PAD // R)
log(f"adaptive cap={cap}")
cand, tile_idx, slot = scoring.build_streamed_layout(
    rows, qno, N_PAD, QB, r=R, cap=cap
)
tv = cand.shape[0]
log(f"layout: {tv} virtual tiles x cap {cap} (fill {PAIRS / (tv * cap):.2f})")

log("uploading table (9.8 GB per-shape staging)...")
table = jnp.asarray(table_np)
np.asarray(table[0, :4])  # force
q_t = jnp.asarray(np.ascontiguousarray(q_np.T))
q = jnp.asarray(q_np)
cand3 = jnp.asarray(cand.reshape(tv, cap // 128, 128))
tile_dev = jnp.asarray(tile_idx)
log("uploaded")

# ground truth on a sample of pairs
sample = rng.choice(PAIRS, size=4096, replace=False)
gt = np.einsum("pd,pd->p", table_np[rows[sample]], q_np[qno[sample]])


def run_classic(precision):
    return stream_kernel.stream_select(
        table, q_t, cand3, tile_dev, r=R, precision=precision
    )


def run_pairwise(exact):
    return stream_kernel.stream_select_pairwise(
        table, q, cand3, tile_dev, r=R, exact=exact
    )


def bench(name, fn):
    t0 = time.time()
    try:
        out = fn()
        np.asarray(out[0, 0, :8])  # sync (block_until_ready lies on axon)
    except Exception as e:
        log(f"{name}: FAILED compile/run: {type(e).__name__}: {e}")
        return None
    log(f"{name}: first call (compile) {time.time() - t0:.1f}s")
    # parity on the sampled slots
    flat = np.asarray(out).reshape(-1)
    got = flat[slot[sample]]
    err = np.abs(got - gt)
    rel = err.max() / np.abs(gt).max()
    log(f"{name}: max abs err {err.max():.2e} (rel {rel:.2e})")
    # warm timing: chain a few dispatches, sync via tiny fetch each
    for loop in range(2):
        t0 = time.time()
        iters = 8
        for _ in range(iters):
            out = fn()
            np.asarray(out[0, 0, :8])
        dt = (time.time() - t0) / iters
        log(f"{name}: warm {dt * 1e3:.1f} ms/call ({loop + 1})")
    return dt


results = {}
for name, fn in [
    ("classic/fast", lambda: run_classic("fast")),
    ("classic/high", lambda: run_classic("high")),
    ("classic/exact", lambda: run_classic("exact")),
    ("pairwise/fast", lambda: run_pairwise(False)),
    ("pairwise/exact", lambda: run_pairwise(True)),
]:
    results[name] = bench(name, fn)

log("summary: " + ", ".join(
    f"{k}={v * 1e3:.1f}ms" if v else f"{k}=FAIL" for k, v in results.items()
))
print("rc=0", flush=True)
