"""Profile the fresh-ranking (cold) cost of ES and fused serve on CPU.

The device work is tiny at these shapes; what this isolates is the
per-fresh-ranking HOST cost (frame copy, factorize, candidate resolution,
ES state build, assembly) that dominates the on-chip "cold" rows
(432 QPS ES-cold vs 17.8k warm at depth-5000, bench_logs/r5c_es5000.log).

Usage: python scripts/profile_es_cold.py [--rows-profile]
"""

import argparse
import cProfile
import io
import pstats
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import os

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")

from fastforward_tpu.encoder import LambdaEncoder
from fastforward_tpu.index import InMemoryIndex, Mode
from fastforward_tpu.ranking import Ranking

N, DIM, Q, DEPTH = 50_000, 768, 512, 5000
CUTOFF, ALPHA, DEPTHS = 10, 0.2, (200, 1000, 5000)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--serve", action="store_true", help="profile fused serve")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    corpus = rng.standard_normal((N, DIM)).astype(np.float32)
    qids = [f"q{i:04d}" for i in range(Q)]
    queries = {q: q for q in qids}
    qvecs = {q: rng.standard_normal(DIM).astype(np.float32) for q in qids}
    index = InMemoryIndex(
        LambdaEncoder(lambda q: qvecs[q]),
        mode=Mode.PASSAGE,
    )
    index.add(corpus, psg_ids=[f"p{i}" for i in range(N)])

    run = {
        q: {
            f"p{j}": float(DEPTH - k)
            for k, j in enumerate(
                rng.choice(N, size=DEPTH, replace=False).tolist()
            )
        }
        for q in qids
    }

    kwargs = dict(
        early_stopping=CUTOFF,
        early_stopping_alpha=ALPHA,
        early_stopping_depths=DEPTHS,
    )

    def one_cold_es():
        index(Ranking.from_run(run, queries=queries), **kwargs)

    def one_cold_serve():
        index.serve(
            Ranking.from_run(run, queries=queries), ALPHA, CUTOFF, refine=22
        )

    fn = one_cold_serve if args.serve else one_cold_es
    label = "serve" if args.serve else "ES"

    fn()  # compile + warm numba-free paths
    t0 = time.perf_counter()
    fn()
    print(f"cold {label} call (incl. Ranking.from_run): "
          f"{time.perf_counter() - t0:.3f}s", flush=True)

    # split out ranking construction
    t0 = time.perf_counter()
    r = Ranking.from_run(run, queries=queries)
    t_rank = time.perf_counter() - t0
    t0 = time.perf_counter()
    if args.serve:
        index.serve(r, ALPHA, CUTOFF, refine=22)
    else:
        index(r, **kwargs)
    t_call = time.perf_counter() - t0
    print(f"Ranking.from_run: {t_rank:.3f}s; {label} call: {t_call:.3f}s",
          flush=True)

    pr = cProfile.Profile()
    pr.enable()
    fn()
    pr.disable()
    s = io.StringIO()
    pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(35)
    print(s.getvalue())


if __name__ == "__main__":
    main()
