"""Pipelined serving: ``Index.submit`` / ``ScoreFuture.result``.

``submit`` dispatches the device program and defers the link-bound score
fetch into ``result()`` so consecutive calls overlap
(``index/base.py::Index.submit``).  Results must be identical to the
synchronous ``index(ranking)`` in every configuration.
"""

import unittest

import numpy as np

from fastforward_tpu.encoder import LambdaEncoder
from fastforward_tpu.index import InMemoryIndex, Mode, ScoreFuture
from fastforward_tpu.ranking import Ranking


def _build(n=2048, dim=16, num_q=4, depth=32, mode=Mode.PASSAGE, seed=0):
    rng = np.random.default_rng(seed)
    corpus = rng.standard_normal((n, dim)).astype(np.float32)
    qvecs = rng.standard_normal((num_q, dim)).astype(np.float32)
    by_text = {f"query {i}": qvecs[i] for i in range(num_q)}
    index = InMemoryIndex(LambdaEncoder(lambda t: by_text[t]), mode=mode)
    index.add(corpus, psg_ids=[f"p{i}" for i in range(n)])
    run = {
        f"q{i}": {
            f"p{j}": float(depth - r)
            for r, j in enumerate(rng.choice(n, size=depth, replace=False))
        }
        for i in range(num_q)
    }
    queries = {f"q{i}": f"query {i}" for i in range(num_q)}
    return index, Ranking.from_run(run, queries=queries)


def _assert_same(test, a: Ranking, b: Ranking):
    test.assertEqual(list(a._df["q_id"]), list(b._df["q_id"]))
    test.assertEqual(list(a._df["id"]), list(b._df["id"]))
    np.testing.assert_array_equal(
        a._df["score"].to_numpy(), b._df["score"].to_numpy()
    )
    test.assertEqual(a.q_ids, b.q_ids)


class TestSubmit(unittest.TestCase):
    def test_cold_submit_matches_sync_call(self):
        index, ranking = _build()
        fut = index.submit(ranking)
        self.assertIsInstance(fut, ScoreFuture)
        self.assertTrue(fut.pipelined)
        got = fut.result()
        index2, ranking2 = _build()
        _assert_same(self, got, index2(ranking2))

    def test_warm_submit_uses_the_plan(self):
        index, ranking = _build()
        baseline = index(ranking)  # builds the plan
        fut = index.submit(ranking)
        self.assertTrue(fut.pipelined)
        _assert_same(self, fut.result(), baseline)

    def test_result_is_idempotent(self):
        index, ranking = _build()
        fut = index.submit(ranking)
        self.assertIs(fut.result(), fut.result())

    def test_two_in_flight_futures(self):
        index, ranking_a = _build(seed=1)
        _, ranking_b = _build(seed=2)
        sync_a = index(ranking_a)
        sync_b = index(ranking_b)
        fut_a = index.submit(ranking_a)
        fut_b = index.submit(ranking_b)  # dispatched before a's result
        _assert_same(self, fut_b.result(), sync_b)
        _assert_same(self, fut_a.result(), sync_a)

    def test_pipeline_loop_over_distinct_rankings(self):
        index, _ = _build(seed=3)
        rankings = [_build(seed=10 + i)[1] for i in range(4)]
        sync = [index(r) for r in rankings]
        results = []
        pending = None
        for r in rankings:
            fut = index.submit(r)
            if pending is not None:
                results.append(pending.result())
            pending = fut
        results.append(pending.result())
        for got, want in zip(results, sync):
            _assert_same(self, got, want)

    def test_doc_mode_submit(self):
        # MAXP with multi-passage documents goes through the grouped layout
        rng = np.random.default_rng(5)
        dim, num_q = 8, 3
        qvecs = rng.standard_normal((num_q, dim)).astype(np.float32)
        by_text = {f"query {i}": qvecs[i] for i in range(num_q)}
        index = InMemoryIndex(LambdaEncoder(lambda t: by_text[t]), mode=Mode.MAXP)
        vecs, doc_ids = [], []
        for d in range(64):
            for _ in range(1 + d % 5):
                vecs.append(rng.standard_normal(dim).astype(np.float32))
                doc_ids.append(f"d{d}")
        index.add(np.stack(vecs), doc_ids=doc_ids)
        run = {
            f"q{i}": {f"d{d}": float(20 - r) for r, d in enumerate(range(20))}
            for i in range(num_q)
        }
        ranking = Ranking.from_run(
            run, queries={f"q{i}": f"query {i}" for i in range(num_q)}
        )
        sync = index(ranking)
        fut = index.submit(ranking)
        _assert_same(self, fut.result(), sync)

    def test_ragged_fallback_is_eager_but_correct(self):
        # one document with > _MAX_GROUP_K passages forces the flat
        # segment fallback, which has no deferred-fetch seam
        rng = np.random.default_rng(6)
        dim = 8
        qvec = rng.standard_normal(dim).astype(np.float32)
        index = InMemoryIndex(LambdaEncoder(lambda t: qvec), mode=Mode.MAXP)
        vecs, doc_ids = [], []
        for _ in range(100):  # one very ragged doc
            vecs.append(rng.standard_normal(dim).astype(np.float32))
            doc_ids.append("big")
        for d in range(8):
            vecs.append(rng.standard_normal(dim).astype(np.float32))
            doc_ids.append(f"d{d}")
        index.add(np.stack(vecs), doc_ids=doc_ids)
        run = {"q0": {"big": 9.0, **{f"d{d}": float(d) for d in range(8)}}}
        ranking = Ranking.from_run(run, queries={"q0": "anything"})
        sync = index(ranking)
        fut = index.submit(ranking)
        self.assertFalse(fut.pipelined)
        _assert_same(self, fut.result(), sync)

    def test_submit_requires_queries(self):
        index, ranking = _build()
        bare = Ranking(ranking._df.drop(columns=["query"]))
        with self.assertRaises(ValueError):
            index.submit(bare)


if __name__ == "__main__":
    unittest.main()
