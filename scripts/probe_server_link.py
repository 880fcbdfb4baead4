"""Attribute the BatchingServer per-batch cost to link vs host vs device.

The array-path profile (`bench_logs/r5f_arrays_profile.log`) shows a
steady ~110 ms prep + ~36 ms dispatch + ~145 ms fetch per 64x8-query
batch.  This probe times the pieces individually on the real chip:

  a) H2D of the merged candidate arrays (rows int32 + lex f32, ~4 MB)
     at batch granularity, one call vs one fused buffer vs per-request
  b) device compute + D2H for a pre-uploaded batch (pure device cost)
  c) the numpy merge alone
  d) _serve_prep per request (host resolution cost)

Usage: timeout 900 python scripts/probe_server_link.py [--n 200000]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import os  # noqa: E402

import jax  # noqa: E402

_p = os.environ.get("JAX_PLATFORMS")
if _p and "," not in _p:
    jax.config.update("jax_platforms", _p)

import jax.numpy as jnp  # noqa: E402

parser = argparse.ArgumentParser()
parser.add_argument("--n", type=int, default=200_000)
parser.add_argument("--q", type=int, default=512)
parser.add_argument("--req-q", type=int, default=8)
parser.add_argument("--depth", type=int, default=1000)
parser.add_argument("--dim", type=int, default=768)
args = parser.parse_args()

print("backend:", jax.default_backend(), flush=True)

from fastforward_tpu.encoder import LambdaEncoder  # noqa: E402
from fastforward_tpu.index import InMemoryIndex, Mode  # noqa: E402
from fastforward_tpu.ranking import Ranking  # noqa: E402

rng = np.random.default_rng(0)
corpus = rng.normal(size=(args.n, args.dim)).astype(np.float32)
qvecs = rng.normal(size=(args.q, args.dim)).astype(np.float32)
queries = {f"q{i}": f"query {i}" for i in range(args.q)}
qmap = {f"query {i}": qvecs[i] for i in range(args.q)}

index = InMemoryIndex(
    LambdaEncoder(lambda q: qmap[q]), mode=Mode.PASSAGE, precision="high"
)
index.add(corpus, psg_ids=[f"p{i}" for i in range(args.n)])

run = {
    f"q{i}": {
        f"p{j}": float(args.depth - k)
        for k, j in enumerate(
            rng.choice(args.n, size=args.depth, replace=False)
        )
    }
    for i in range(args.q)
}
q_ids = list(run)
requests = []
for start in range(0, len(q_ids), args.req_q):
    chunk = q_ids[start : start + args.req_q]
    requests.append(
        Ranking.from_run(
            {q: run[q] for q in chunk},
            queries={q: queries[q] for q in chunk},
        )
    )
print(f"{len(requests)} requests x {args.req_q} queries", flush=True)

ALPHA, CUTOFF = 0.2, 10
t0 = time.perf_counter()
index.preload(warm=(args.q, args.depth), serve=(ALPHA, CUTOFF))
print(f"preload: {time.perf_counter() - t0:.1f}s", flush=True)


def timed(label, fn, iters=5):
    fn()  # warm
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    ts = np.array(ts) * 1e3
    print(
        f"{label:55s} min {ts.min():7.1f} ms  med {np.median(ts):7.1f} ms"
        f"  max {ts.max():7.1f} ms",
        flush=True,
    )
    return float(np.median(ts))


# -- d) per-request prep ----------------------------------------------------
preps = None


def do_prep():
    global preps
    preps = [index._serve_prep(r) for r in requests]


timed("d) _serve_prep x 64 requests (host resolution)", do_prep)

# -- c) numpy merge ----------------------------------------------------------
k = max(p["k"] for p in preps)
n_pairs = sum(p["n_pairs"] for p in preps)


def do_merge():
    rows_mat = np.concatenate([p["rows_mat"] for p in preps])
    lex = np.concatenate([p["lex"] for p in preps])
    return rows_mat, lex


timed("c) numpy merge (rows + lex concat)", do_merge)
rows_mat, lex = do_merge()
rows_flat = np.ascontiguousarray(rows_mat[:, 0].astype(np.int32))
lex32 = lex.astype(np.float32)
mb = (rows_flat.nbytes + lex32.nbytes) / 1e6
print(f"merged candidate payload: {mb:.1f} MB", flush=True)

dev = jax.devices()[0]


# -- a) H2D variants ----------------------------------------------------------
def h2d_two():
    a = jax.device_put(rows_flat, dev)
    b = jax.device_put(lex32, dev)
    a.block_until_ready()
    b.block_until_ready()


def h2d_fused():
    buf = np.empty(rows_flat.nbytes + lex32.nbytes, dtype=np.uint8)
    buf[: rows_flat.nbytes] = rows_flat.view(np.uint8)
    buf[rows_flat.nbytes :] = lex32.view(np.uint8)
    jax.device_put(buf, dev).block_until_ready()


def h2d_lex_u16():
    # per-batch affine u16 quantized lex (halves the lex bytes)
    lo, hi = lex32.min(), lex32.max()
    q = ((lex32 - lo) * (65535.0 / max(hi - lo, 1e-9))).astype(np.uint16)
    a = jax.device_put(rows_flat, dev)
    b = jax.device_put(q, dev)
    a.block_until_ready()
    b.block_until_ready()


def h2d_per_request():
    outs = []
    for p in preps:
        outs.append(jax.device_put(p["rows_mat"][:, 0].astype(np.int32), dev))
        outs.append(jax.device_put(p["lex"], dev))
    for o in outs:
        o.block_until_ready()


timed("a) H2D merged: 2 arrays (rows i32 + lex f32)", h2d_two)
timed("a) H2D merged: 1 fused u8 buffer", h2d_fused)
timed("a) H2D merged: rows i32 + lex u16", h2d_lex_u16)
timed("a) H2D per-request: 128 small arrays", h2d_per_request, iters=3)

# -- b) device compute + D2H with pre-uploaded arrays ------------------------
finish = index._serve_arrays(preps, ALPHA, CUTOFF, refine=22)
_ = finish()


def full_batch():
    f = index._serve_arrays(preps, ALPHA, CUTOFF, refine=22)
    f()


timed("b) full _serve_arrays dispatch+finish (incl. H2D)", full_batch)

print("rc=0", flush=True)
