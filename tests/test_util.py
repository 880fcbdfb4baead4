"""Utility tests: evaluation export and device ops helpers."""

import unittest

import numpy as np

from fastforward_tpu import ops
from fastforward_tpu.ranking import Ranking
from fastforward_tpu.utils import cos_dist, to_ir_measures

from .test_ranking import DUMMY_QUERIES, RUN


class TestUtil(unittest.TestCase):
    def test_ir_measures_df(self):
        r = Ranking.from_run(RUN, queries=DUMMY_QUERIES)
        df = to_ir_measures(r)
        self.assertTrue(df["query_id"].equals(r._df["q_id"]))
        self.assertTrue(df["doc_id"].equals(r._df["id"]))
        self.assertTrue(df["score"].equals(r._df["score"]))
        self.assertEqual({"query_id", "doc_id", "score"}, set(df.columns))

    def test_cos_dist(self):
        a = np.array([1.0, 0.0])
        self.assertAlmostEqual(0.0, cos_dist(a, a))
        self.assertAlmostEqual(1.0, cos_dist(a, np.array([0.0, 1.0])))
        self.assertAlmostEqual(2.0, cos_dist(a, -a))


class TestOps(unittest.TestCase):
    def test_bucket(self):
        self.assertEqual(256, ops.bucket(1))
        self.assertEqual(256, ops.bucket(256))
        self.assertEqual(512, ops.bucket(257))
        self.assertEqual(1024, ops.bucket(1000))

    def test_interpolate(self):
        lex = np.array([1.0, 2.0], dtype=np.float32)
        sem = np.array([3.0, 4.0], dtype=np.float32)
        np.testing.assert_allclose(
            np.asarray(ops.interpolate_scores(lex, sem, 0.25)),
            0.25 * lex + 0.75 * sem,
        )

    def test_score_pairs_dense_matches_numpy(self):
        rng = np.random.default_rng(0)
        table = rng.normal(size=(64, 16)).astype(np.float32)
        qvecs = rng.normal(size=(4, 16)).astype(np.float32)
        rows = rng.integers(0, 64, size=40).astype(np.int32)
        qno = rng.integers(0, 4, size=40).astype(np.int32)
        seg = np.repeat(np.arange(8, dtype=np.int32), 5)

        expected_rows = np.einsum("pd,pd->p", qvecs[qno], table[rows])
        expected = expected_rows.reshape(8, 5)

        p_bucket = ops.bucket(40)
        idx = np.stack(
            [
                ops.pad_i32(rows, p_bucket, 0),
                ops.pad_i32(qno, p_bucket, 0),
                ops.pad_i32(seg, p_bucket, 8),
            ]
        )
        got_max = np.asarray(ops.score_pairs_dense(table, qvecs, idx, 8, "max"))
        np.testing.assert_allclose(got_max, expected.max(axis=1), rtol=1e-5)

        got_mean = np.asarray(ops.score_pairs_dense(table, qvecs, idx, 8, "mean"))
        np.testing.assert_allclose(got_mean, expected.mean(axis=1), rtol=1e-5)


if __name__ == "__main__":
    unittest.main()


class TestEvaluate(unittest.TestCase):
    def setUp(self):
        from fastforward_tpu.ranking import Ranking

        self.ranking = Ranking.from_run(
            {
                "q1": {"a": 3.0, "b": 2.0, "c": 1.0},
                "q2": {"a": 3.0, "b": 2.0, "c": 1.0},
            }
        )
        self.qrels = {"q1": {"a": 1}, "q2": {"c": 1}}

    def test_rr(self):
        from fastforward_tpu.utils.evaluate import rr_at_k

        # q1: relevant at rank 1 -> 1.0; q2: rank 3 -> 1/3
        self.assertAlmostEqual((1.0 + 1 / 3) / 2, rr_at_k(self.ranking, self.qrels))

    def test_ndcg_perfect(self):
        from fastforward_tpu.utils.evaluate import ndcg_at_k

        self.assertAlmostEqual(1.0, ndcg_at_k(self.ranking, {"q1": {"a": 2}}))

    def test_ndcg_worst_position(self):
        import math

        from fastforward_tpu.utils.evaluate import ndcg_at_k

        got = ndcg_at_k(self.ranking, {"q1": {"c": 1}})
        self.assertAlmostEqual(1.0 / math.log2(4), got)

    def test_recall(self):
        from fastforward_tpu.utils.evaluate import recall_at_k

        self.assertAlmostEqual(
            1.0, recall_at_k(self.ranking, self.qrels, k=3)
        )
        self.assertAlmostEqual(
            0.5, recall_at_k(self.ranking, self.qrels, k=1)
        )
