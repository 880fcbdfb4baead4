"""End-to-end verification drive: TREC runfile -> re-ranked runfile.

Runs on whatever backend jax selects (real TPU under axon; force CPU with
jax.config). Used by the repo verify skill; asserts ground-truth scores,
runs the HDF5 and PQ paths, and round-trips TREC files.
"""

import sys, time
from pathlib import Path
import numpy as np
sys.path.insert(0, "/root/repo")

import os
import jax
# the env may pin JAX_PLATFORMS to the TPU tunnel via sitecustomize; an
# explicit override (JAX_PLATFORMS=cpu) must win, and only jax.config can
# force it after that
_p = os.environ.get("JAX_PLATFORMS")
if _p and "," not in _p:
    jax.config.update("jax_platforms", _p)
# persistent compile cache: first-compile on the remote TPU toolchain can
# take many minutes; cached re-verifies take seconds.  Use the library
# helper so the location stays single-sourced and user config
# (jax_compilation_cache_dir / FFTPU_NO_COMPILE_CACHE) is honored.
from fastforward_tpu.index.base import Index as _Index
_Index._ensure_compile_cache()
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
print("backend:", jax.default_backend(), jax.devices())

from fastforward_tpu import Ranking
from fastforward_tpu.index import InMemoryIndex, Mode, OnDiskIndex
from fastforward_tpu.encoder import LambdaEncoder
from fastforward_tpu.quantizer import PQ

tmp = Path("/tmp/ffv")
tmp.mkdir(parents=True, exist_ok=True)
rng = np.random.default_rng(0)

# 1. write a lexical TREC runfile (2 queries x 50 candidate passages)
N, DIM, DEPTH = 5000, 768, 50
run_lines = []
for q in ("q1", "q2"):
    for rank, p in enumerate(rng.choice(N, DEPTH, replace=False)):
        run_lines.append(f"{q}\tQ0\tp{p}\t{rank+1}\t{1000-rank}\tbm25")
(tmp / "bm25.trec").write_text("\n".join(run_lines))

# 2. build an index over a synthetic corpus (fixed query vec for determinism)
qvec = rng.normal(size=DIM).astype(np.float32)
corpus = rng.normal(size=(N, DIM)).astype(np.float32)
enc = LambdaEncoder(lambda _: qvec)
index = InMemoryIndex(enc, mode=Mode.PASSAGE)
index.add(corpus, doc_ids=[f"d{i//5}" for i in range(N)], psg_ids=[f"p{i}" for i in range(N)])

# 3. re-rank the runfile through the public API
ranking = Ranking.from_file(tmp / "bm25.trec", queries={"q1": "a", "q2": "b"})
t0 = time.time()
semantic = index(ranking)
print(f"re-ranked in {time.time()-t0:.2f}s (incl. compile)")
t0 = time.time()
semantic = index(ranking)
print(f"re-ranked again in {time.time()-t0:.3f}s (cached)")

# 4. numeric ground truth check vs numpy
got = semantic["q1"]
ok = 0
for pid, score in got.items():
    expected = float(corpus[int(pid[1:])] @ qvec)
    assert abs(expected - score) < 1e-2, (pid, expected, score)
    ok += 1
print(f"q1 scores match numpy ground truth: {ok}/{DEPTH}")

# 5. interpolate + save + reload
final = ranking.interpolate(semantic, 0.2)
final.name = "interp"
final.save(tmp / "final.trec")
back = Ranking.from_file(tmp / "final.trec")
assert back == final
print("interpolated runfile round-trips; top-3 q1:", list(back["q1"].items())[:3])

# 6. HDF5 tier: save via OnDiskIndex, reload, same scores
disk = OnDiskIndex(tmp / "idx.h5", enc, mode=Mode.PASSAGE, overwrite=True)
disk.add(corpus[:500], psg_ids=[f"p{i}" for i in range(500)])
loaded = OnDiskIndex.load(tmp / "idx.h5", enc, mode=Mode.PASSAGE)
small_run = {"q1": {f"p{i}": float(i) for i in range(20)}}
r_small = Ranking.from_run(small_run, queries={"q1": "a"})
s_disk = loaded(r_small)
mem = loaded.to_memory()
s_mem = mem(r_small)
# disk fallback (2D ad-hoc table) and HBM path (3D table) differ in fp
# reduction order on TPU -> compare with tolerance, not exact equality
gd, gm = s_disk["q1"], s_mem["q1"]
assert all(abs(gd[k] - gm[k]) < 1e-3 for k in gd), "disk vs memory scoring mismatch"
print("OnDiskIndex.load + to_memory scoring identical")

# 7. PQ path on device
pq = PQ(8, 64)
pq.fit(corpus[:1024])
qidx = InMemoryIndex(enc, quantizer=pq, mode=Mode.PASSAGE)
qidx.add(corpus[:500], psg_ids=[f"p{i}" for i in range(500)])
s_pq = qidx(r_small)
ref = pq.decode(pq.encode(corpus[:20])) @ qvec
got_pq = s_pq["q1"]
err = max(abs(got_pq[f"p{i}"] - ref[i]) for i in range(20))
print(f"PQ ADC scoring max abs err vs decode-dot: {err:.5f}")
assert err < 1e-2

# 8. u16 score transport: warm call + submit pipeline vs the f32 scores
u16 = InMemoryIndex(enc, mode=Mode.PASSAGE, score_transport="u16")
u16.add(corpus, psg_ids=[f"p{i}" for i in range(N)])
s_u16 = u16(ranking)  # cold (compiles the encode program)
s_u16 = u16.submit(ranking).result()  # warm, deferred fetch
g32, g16 = semantic["q1"], s_u16["q1"]
span = max(g32.values()) - min(g32.values())
tol = span / 131070 * 2 + 1e-3
err16 = max(abs(g32[k] - g16[k]) for k in g32)
print(f"u16 transport max abs err vs f32: {err16:.5f} (bound {tol:.5f})")
assert err16 < tol, (err16, tol)

# 9. fused serve (interpolate + top-k on device) vs the unfused flow
want = ranking.interpolate(semantic, 0.2).cut(10)
served = index.serve(ranking, 0.2, 10)  # cold: compiles serve_topk
served = index.submit_serve(ranking, 0.2, 10).result()  # warm, deferred
assert served.q_ids == want.q_ids
for q in want.q_ids:
    gw, gs = want[q], served[q]
    assert set(gw) == set(gs), (q, set(gw) ^ set(gs))
    errs = max(abs(gw[k] - gs[k]) for k in gw)
    assert errs < 1e-2, (q, errs)
print("fused serve(alpha=0.2, cutoff=10) matches interpolate+cut")

# 10. two-phase refine serve (bf16 fast preselect + exact fp32 rescore)
refined = index.serve(ranking, 0.2, 10, refine=64)
assert refined.q_ids == want.q_ids
for q in want.q_ids:
    gw, gs = want[q], refined[q]
    assert set(gw) == set(gs), (q, set(gw) ^ set(gs))
    errs = max(abs(gw[k] - gs[k]) for k in gw)
    assert errs < 1e-2, (q, errs)
print("two-phase refine serve matches interpolate+cut")
print("ALL DRIVE CHECKS PASSED")
