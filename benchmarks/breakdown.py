"""Per-call cost breakdown of the re-ranking fast path at bench config.

Mirrors ``Index._score_and_sort`` stage by stage with timers so the
per-call budget (VERDICT r1: 473 ms/call at Q=512, N=2M) is attributable:
host frame work, ID resolution, streamed-layout build, transfers, kernel
execution, fetch, and result assembly.

Run:  python benchmarks/breakdown.py [--n 2000000 --queries 512]
"""

import argparse
import sys
import time
import os
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

try:
    from fastforward_tpu.index.base import Index as _Index

    _Index._ensure_compile_cache()
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import pandas as pd  # noqa: E402

from fastforward_tpu import ops  # noqa: E402
from fastforward_tpu.encoder import LambdaEncoder  # noqa: E402
from fastforward_tpu.index import InMemoryIndex, Mode  # noqa: E402
from fastforward_tpu.ops import stream_kernel  # noqa: E402
from fastforward_tpu.ranking import Ranking  # noqa: E402

DIM = 768


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=2_000_000)
    parser.add_argument("--queries", type=int, default=512)
    parser.add_argument("--depth", type=int, default=1000)
    parser.add_argument("--reps", type=int, default=5)
    parser.add_argument("--precision", default="high")
    args = parser.parse_args()

    print(f"backend: {jax.default_backend()}")
    rng = np.random.default_rng(0)
    corpus = rng.standard_normal(size=(args.n, DIM), dtype=np.float32)
    qvecs = rng.standard_normal(size=(args.queries, DIM), dtype=np.float32)
    run = {}
    queries = {}
    for q in range(args.queries):
        cand = rng.choice(args.n, size=args.depth, replace=False)
        run[f"q{q}"] = {f"p{c}": float(args.depth - i) for i, c in enumerate(cand)}
        queries[f"q{q}"] = f"query {q}"
    by_text = {f"query {i}": qvecs[i] for i in range(args.queries)}

    index = InMemoryIndex(
        LambdaEncoder(lambda t: by_text[t]),
        mode=Mode.PASSAGE,
        precision=args.precision,
    )
    index.add(corpus, psg_ids=[f"p{i}" for i in range(args.n)])
    ranking = Ranking.from_run(run, queries=queries)

    t0 = time.perf_counter()
    index(ranking)
    print(f"warm-up call (incl. compile): {time.perf_counter() - t0:.1f}s")

    stages: dict[str, float] = {}

    def mark(name, t_start):
        now = time.perf_counter()
        stages[name] = stages.get(name, 0.0) + (now - t_start)
        return now

    for _ in range(args.reps):
        t = time.perf_counter()
        # -- stage 1: frame work (df copy, factorize, query list)
        df = ranking._df.copy()
        q_codes, q_uniques = pd.factorize(df["q_id"], sort=False)
        df["q_no"] = q_codes
        q_texts = df.loc[~df["q_id"].duplicated(), "query"].tolist()
        t = mark("frame", t)

        # -- stage 2: query encoding (host lambda here)
        query_vectors = index.encode_queries(q_texts)
        t = mark("encode", t)

        # -- stage 3: ID -> row resolution (native map)
        rows, _ = index._ids.resolve(df["id"], index.mode)
        pair_qno = df["q_no"].to_numpy(dtype=np.int64)
        t = mark("resolve", t)

        # -- stage 4: streamed layout build (native single pass)
        view = index._device_view()
        n_pad = view.table.shape[0]
        q_pad = index._pad_queries(query_vectors, view)
        qb = q_pad.shape[0]
        r = stream_kernel.KERNEL_TILE_ROWS
        cap = ops.scoring._adaptive_cap(rows.shape[0], n_pad // r)
        layout = ops.scoring.build_streamed_layout(
            rows.astype(np.int64), pair_qno, n_pad, qb, r=r, cap=cap
        )
        cand, tile_idx, slot_of_pair = layout
        t = mark("layout", t)

        # -- stage 5: q transpose + candidate upload (host->device)
        qt = np.ascontiguousarray(q_pad.T.reshape(-1, qb).astype(np.float32))
        cand3 = cand.reshape(cand.shape[0], cap // 128, 128)
        cand_dev = jnp.asarray(cand3)
        tile_dev = jnp.asarray(tile_idx)
        qt_dev = jnp.asarray(qt)
        jax.block_until_ready((cand_dev, tile_dev, qt_dev))
        t = mark("upload", t)

        # -- stage 6: kernel dispatch + execution (sync via 1-elem fetch)
        outs = stream_kernel.stream_select(
            view.table, qt_dev, cand_dev, tile_dev, r=r,
            precision=args.precision,
        )
        np.asarray(outs[0, 0, 0])  # force execution (tunnel-safe sync)
        t = mark("exec", t)

        # -- stage 7: score fetch (device->host, full grid)
        flat = np.asarray(jax.device_get(outs)).reshape(-1)
        t = mark("fetch", t)

        # -- stage 8: slot gather back to pair order
        scores_np = flat[slot_of_pair]
        t = mark("slot-gather", t)

        # -- stage 9: composite sort key + radix argsort
        n_q = len(q_uniques)
        q_rank = np.empty(n_q, dtype=np.uint64)
        q_rank[np.argsort(np.asarray(q_uniques, dtype=object))[::-1]] = (
            np.arange(n_q, dtype=np.uint64)
        )
        bits = scores_np.view(np.uint32)
        score_asc = np.where(bits >> 31 != 0, ~bits, bits | np.uint32(0x80000000))
        key = (q_rank[pair_qno] << np.uint64(32)) | (
            np.uint32(0xFFFFFFFF) - score_asc
        ).astype(np.uint64)
        from fastforward_tpu.runtime.idmap import radix_argsort

        take = radix_argsort(key)
        if take is None:
            take = np.argsort(key, kind="stable")
        t = mark("sort", t)

        # -- stage 10: result assembly (arrow take + Ranking ctor)
        out = pd.DataFrame(
            {
                "q_id": df["q_id"].array.take(take),
                "id": df["id"].array.take(take),
                "score": scores_np[take].astype(np.float32),
                "query": df["query"].array.take(take),
            }
        )
        Ranking._from_trusted_frame(out, "fast-forward")
        t = mark("assemble", t)

    total = sum(stages.values())
    print(f"\nper-call breakdown over {args.reps} reps "
          f"(P={len(ranking._df)}, grid={cand.shape[0]}x{cap}):")
    for name, secs in stages.items():
        ms = secs / args.reps * 1000
        print(f"  {name:>12}: {ms:8.1f} ms  ({100 * secs / total:4.1f}%)")
    print(f"  {'TOTAL':>12}: {total / args.reps * 1000:8.1f} ms")
    qps = args.queries * args.reps / total
    print(f"  -> {qps:.1f} QPS equivalent")

    # prepared-run (planned) path: what repeated re-ranking actually pays —
    # frame work, resolution, layout, and uploads are all plan-cached, the
    # slot gather runs on device, and ordering uses the segmented radix
    t0 = time.perf_counter()
    for _ in range(args.reps):
        index(ranking)
    dt = time.perf_counter() - t0
    print(
        f"\nprepared-run full calls: {dt / args.reps * 1000:.1f} ms/call "
        f"-> {args.queries * args.reps / dt:.1f} QPS"
    )


if __name__ == "__main__":
    main()
