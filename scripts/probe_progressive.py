"""On-chip A/B: progressive (split-plane) preload vs standard at flagship.

Measures, at N (default 2M) x dim 768, Q=512, depth-1000:

- standard:   preload(warm, serve) wall -> first fused serve call;
- progressive: preload(warm, serve, progressive=True) wall (hi planes
  only) -> first INTERIM fused serve call -> preload_join wall (exact
  tail) -> post-join serve call; interim-vs-exact top-10 agreement.

The claim under test: time-to-first-serve ~ max(warm, upload/2) instead
of max(warm, upload) — the hi plane is half the bytes — with the exact
table landing in the background at no serving interruption.

Run one mode per process (--mode standard|progressive): the table upload
dominates and two tables would not coexist in HBM next to the twins.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax


def log(msg):
    print(msg, flush=True)


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    log(f"{label}: {time.perf_counter() - t0:.1f}s")
    return out


def build(n, dim):
    from fastforward_tpu.encoder import LambdaEncoder
    from fastforward_tpu.index import InMemoryIndex, Mode

    rng = np.random.default_rng(0)

    def enc(text):
        seed = int.from_bytes(str(text).encode()[:8].ljust(8, b"\0"), "little")
        return (
            np.random.default_rng(seed % (2**31))
            .standard_normal(dim)
            .astype(np.float32)
        )

    index = InMemoryIndex(
        query_encoder=LambdaEncoder(enc), mode=Mode.PASSAGE, precision="high"
    )
    for lo in range(0, n, 250_000):
        hi = min(lo + 250_000, n)
        index.add(
            rng.standard_normal((hi - lo, dim)).astype(np.float32),
            doc_ids=None,
            psg_ids=[f"p{i}" for i in range(lo, hi)],
        )
    return index


def ranking_for(n, num_q, depth):
    import pandas as pd

    from fastforward_tpu import Ranking

    pos = (np.arange(num_q * depth, dtype=np.int64) * n) // (num_q * depth)
    q_names = np.asarray(
        [f"q{i:04d}" for i in range(num_q - 1, -1, -1)], dtype=object
    )
    frame = pd.DataFrame(
        {
            "q_id": np.repeat(q_names, depth),
            "id": np.asarray([f"p{p}" for p in pos], dtype=object),
            "score": np.tile(
                np.arange(depth, 0, -1, dtype=np.float32), num_q
            ),
        }
    )
    frame = frame[~frame.duplicated(["q_id", "id"])]
    return Ranking(
        frame,
        queries={q: f"query {q}" for q in q_names},
        copy=False,
        is_sorted=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--q", type=int, default=512)
    ap.add_argument("--depth", type=int, default=1000)
    ap.add_argument(
        "--mode", choices=("standard", "progressive"), required=True
    )
    args = ap.parse_args()
    log(f"backend: {jax.default_backend()} mode: {args.mode}")
    DIM, ALPHA, CUTOFF, MARGIN = 768, 0.2, 10, 22

    index = t("build host index", lambda: build(args.n, DIM))
    ranking = t(
        "build ranking", lambda: ranking_for(args.n, args.q, args.depth)
    )

    progressive = args.mode == "progressive"
    t(
        f"preload wall ({args.mode})",
        lambda: index.preload(
            warm=(args.q, args.depth),
            serve=(ALPHA, CUTOFF, MARGIN),
            progressive=progressive,
        ),
    )
    stats = dict(index._preload_stats)
    log(f"preload stats: { {k: (round(v, 1) if isinstance(v, float) else v) for k, v in stats.items()} }")

    first = t(
        "first serve call (time-to-first-serve tail)",
        lambda: index.serve(ranking, ALPHA, CUTOFF, refine=MARGIN),
    )
    if progressive:
        t("preload_join (exact tail)", lambda: index.preload_join())
        log(f"progressive_exact: {index._preload_stats.get('progressive_exact')}")
        exact = t(
            "post-join serve call",
            lambda: index.serve(ranking, ALPHA, CUTOFF, refine=MARGIN),
        )
        agree = []
        fd, ed = first._df, exact._df
        for q in fd["q_id"].unique()[:8]:
            a = list(fd[fd["q_id"] == q]["id"][:CUTOFF])
            b = list(ed[ed["q_id"] == q]["id"][:CUTOFF])
            agree.append(a == b)
        log(f"interim-vs-exact top-{CUTOFF} agreement: {sum(agree)}/{len(agree)}")
    # steady-state rate for context
    t0 = time.perf_counter()
    calls = 6
    for _ in range(calls):
        index.serve(ranking, ALPHA, CUTOFF, refine=MARGIN)
    dt = time.perf_counter() - t0
    log(
        f"steady serve: {calls} calls in {dt:.2f}s -> "
        f"{args.q * calls / dt:.1f} QPS"
    )


if __name__ == "__main__":
    main()
