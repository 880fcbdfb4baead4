"""Probe: what exactly does the FIRST real call after an overlapped preload pay?

Round-5 evidence so far (bench_logs/r5a_diag.log vs r5b_bench_overlap.log):
sequential preload (upload -> warm on the REAL table) gives a 0.6 s first
call; the overlapped zeros-twin preload gives a ~120 s first call even
though the twin warm itself completed.  Leading theory: ``jnp.asarray`` of
the 6 GB table is ASYNC over the tunnel — the upload thread returns (and
``preload`` with it) long before the H2D transfer lands, so the first real
dispatch blocks on the outstanding transfer.  Alternative theory: the twin
warm misses a program variant and the first real call recompiles.

This probe separates the two:

1. ``preload`` (overlapped) with per-stage stats;
2. a TIMED one-row fetch of the REAL table right after preload — if the
   transfer tail is real, this absorbs it (a fetch orders after the H2D);
3. the first real rerank/serve calls wrapped in ``compilestats.collect()``
   — local TRACE events fire only on a local jit-cache miss, so a non-empty
   report here means a genuinely new program variant (and names it).

Usage: timeout 1500 python scripts/probe_first_call.py [--n 2000000]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402

from fastforward_tpu.index.base import Index as _Index  # noqa: E402
from fastforward_tpu.utils import compilestats  # noqa: E402

_Index._ensure_compile_cache()


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{label}: {time.perf_counter() - t0:.1f}s", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--depth", type=int, default=1000)
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)

    from fastforward_tpu.encoder import LambdaEncoder
    from fastforward_tpu.index import InMemoryIndex, Mode
    from fastforward_tpu.ranking import Ranking

    N, DIM, Q, DEPTH = args.n, 768, 512, args.depth
    rng = np.random.default_rng(0)
    vecs = t(
        "datagen", lambda: rng.standard_normal((N, DIM), dtype=np.float32)
    )
    index = InMemoryIndex(
        query_encoder=LambdaEncoder(lambda _: np.zeros(DIM, np.float32)),
        mode=Mode.PASSAGE,
        precision="high",
    )
    t(
        "add",
        lambda: index.add(
            vecs, doc_ids=None, psg_ids=[f"p{i}" for i in range(N)]
        ),
    )

    t(
        "preload total (overlapped)",
        lambda: index.preload(warm=(Q, DEPTH), serve=(0.2, 10, 22)),
    )
    print("preload stats:", getattr(index, "_preload_stats", {}), flush=True)

    # decisive: a one-row fetch of the REAL table orders after its H2D
    view = index._device_view()
    t("table one-row sync fetch", lambda: np.asarray(view.table[0, :8]))

    # real workload
    import pandas as pd

    rng2 = np.random.default_rng(1)
    pos = rng2.integers(0, N, size=Q * DEPTH)
    frame = pd.DataFrame(
        {
            "q_id": np.repeat([f"rq{i:04d}" for i in range(Q - 1, -1, -1)], DEPTH),
            "id": [f"p{p}" for p in pos],
            "score": np.tile(np.arange(DEPTH, 0, -1, dtype=np.float32), Q),
        }
    )
    frame = frame[~frame.duplicated(["q_id", "id"])]
    real = Ranking(
        frame,
        queries={f"rq{i:04d}": "x" for i in range(Q)},
        copy=False,
        is_sorted=True,
    )

    with compilestats.collect() as cs:
        t("first REAL rerank call", lambda: index(real))
    print("-- rerank compile report --\n" + cs.report(), flush=True)
    t("second REAL rerank call", lambda: index(real))
    with compilestats.collect() as cs2:
        t("first REAL serve call", lambda: index.serve(real, 0.2, 10, refine=22))
    print("-- serve compile report --\n" + cs2.report(), flush=True)
    t("second REAL serve call", lambda: index.serve(real, 0.2, 10, refine=22))


if __name__ == "__main__":
    main()
