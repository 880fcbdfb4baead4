"""Probe: where do the preload-warm seconds go, and what can overlap?

Round-4 finding (bench_logs/r5a_diag.log): at the flagship shape the warm
phase is 462 s of wall but only 1.4 s of locally-observed compile, and the
persistent cache reports 0 misses for 24/26 programs — consistent with the
axon tunnel deferring real XLA/Mosaic compilation to the FIRST EXECUTION
server-side, where the local persistent cache cannot see it.  This probe
quantifies three things on a smaller table (default N=200k):

1. stage split: upload vs rerank-warm vs serve-warm wall time;
2. parallel first-executions: two distinct programs dispatched from two
   threads — does the server compile them concurrently? (run with
   --threads; compare against the sequential numbers from a prior run);
3. zeros-twin validity: a program first executed against a device-created
   ``jnp.zeros`` table of identical shape/dtype must be a cache hit when
   re-run against the real uploaded table (this is what lets the real
   upload ride UNDER the warm phase).
"""

import argparse
import sys
import threading
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from fastforward_tpu.index.base import Index as _Index

_Index._ensure_compile_cache()


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt:.1f}s", flush=True)
    return out


def fetch(x):
    # tunnel gotcha: block_until_ready returns before execution; only a
    # fetch reliably syncs
    np.asarray(jax.tree_util.tree_leaves(x)[0][:1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--threads", action="store_true")
    ap.add_argument("--stages", action="store_true")
    ap.add_argument("--twin", action="store_true")
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)

    N, DIM = args.n, 768

    if args.twin:
        # distinct program (unique constant) never run before in this
        # process: first-run against zeros table, re-run against real
        zeros_tab = t(
            "twin: jnp.zeros table on device",
            lambda: jnp.zeros((N, DIM), jnp.float32).block_until_ready(),
        )

        @jax.jit
        def prog(tab, q):
            return (tab[:4096] * 1.00042) @ q.T

        q = jnp.ones((8, DIM), jnp.float32)
        t("twin: first exec on zeros table", lambda: fetch(prog(zeros_tab, q)))
        real = np.random.default_rng(0).standard_normal(
            (N, DIM), dtype=np.float32
        )
        real_tab = t("twin: real table upload", lambda: jnp.asarray(real))
        t("twin: exec on real table", lambda: fetch(prog(real_tab, q)))
        return

    if args.threads:
        tab = t(
            "zeros table",
            lambda: jnp.zeros((N, DIM), jnp.float32).block_until_ready(),
        )

        def mk(c):
            @jax.jit
            def prog(tb, q):
                x = jnp.tanh(tb[: 8192] * c) @ q.T
                return jnp.sort(x, axis=0)[:16]

            return prog

        progs = [mk(1.0 + i * 0.001) for i in range(4)]
        q = jnp.ones((128, DIM), jnp.float32)

        # sequential first-executions
        t0 = time.perf_counter()
        for i, p in enumerate(progs[:2]):
            t(f"seq first-exec prog{i}", lambda p=p: fetch(p(tab, q)))
        print(f"sequential 2 programs: {time.perf_counter() - t0:.1f}s")

        # threaded first-executions (2 fresh programs)
        t0 = time.perf_counter()
        th = [
            threading.Thread(target=lambda p=p: fetch(p(tab, q)))
            for p in progs[2:]
        ]
        for x in th:
            x.start()
        for x in th:
            x.join()
        print(
            f"threaded 2 programs: {time.perf_counter() - t0:.1f}s",
            flush=True,
        )
        return

    # --stages: preload stage split at a reduced flagship shape
    from fastforward_tpu.encoder import LambdaEncoder
    from fastforward_tpu.index import InMemoryIndex, Mode

    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((N, DIM), dtype=np.float32)
    ids = [f"p{i}" for i in range(N)]
    index = InMemoryIndex(
        query_encoder=LambdaEncoder(lambda _: np.zeros(DIM, np.float32)),
        mode=Mode.PASSAGE,
        precision="high",
    )
    index.add(vecs, doc_ids=None, psg_ids=ids)

    Q, DEPTH = 512, 1000

    import fastforward_tpu.index.base as base_mod

    orig_call = base_mod.Index.__call__
    orig_serve = base_mod.Index.serve

    def timed_call(self, ranking, **kw):
        return t("  warm: rerank __call__", lambda: orig_call(self, ranking, **kw))

    def timed_serve(self, ranking, *a, **kw):
        return t("  warm: serve()", lambda: orig_serve(self, ranking, *a, **kw))

    base_mod.Index.__call__ = timed_call
    base_mod.Index.serve = timed_serve
    try:
        t(
            "preload total (overlapped)",
            lambda: index.preload(warm=(Q, DEPTH), serve=(0.2, 10, 22)),
        )
    finally:
        base_mod.Index.__call__ = orig_call
        base_mod.Index.serve = orig_serve
    print("preload stats:", getattr(index, "_preload_stats", {}), flush=True)

    # first REAL call after the twin-warmed preload: must be sub-second —
    # a 100s-class time here means the twin warm missed a program
    rng2 = np.random.default_rng(1)
    import pandas as pd

    pos = rng2.integers(0, N, size=Q * DEPTH)
    frame = pd.DataFrame(
        {
            "q_id": np.repeat(
                [f"rq{i:04d}" for i in range(Q - 1, -1, -1)], DEPTH
            ),
            "id": [f"p{p}" for p in pos],
            "score": np.tile(np.arange(DEPTH, 0, -1, dtype=np.float32), Q),
        }
    )
    frame = frame[~frame.duplicated(["q_id", "id"])]
    from fastforward_tpu.ranking import Ranking

    real = Ranking(
        frame,
        queries={f"rq{i:04d}": "x" for i in range(Q)},
        copy=False,
        is_sorted=True,
    )
    t("first REAL rerank call", lambda: index(real))
    t("second REAL rerank call", lambda: index(real))
    t("first REAL serve call", lambda: index.serve(real, 0.2, 10, refine=22))
    t("second REAL serve call", lambda: index.serve(real, 0.2, 10, refine=22))


if __name__ == "__main__":
    main()
