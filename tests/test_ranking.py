"""Ranking contract tests (behavioral coverage per SURVEY.md §4)."""

import os
import tempfile
import unittest
from pathlib import Path

import numpy as np
import pandas as pd

from fastforward_tpu.ranking import Ranking

RUN = {
    "q1": {"d0": 1, "d1": 2, "d2": 300},
    "q2": {"d0": 4, "d1": 5, "d2": 600, "d3": 7},
}
DUMMY_QUERIES = {"q1": "query 1", "q2": "query 2"}


class TestRanking(unittest.TestCase):
    def setUp(self):
        self.ranking = Ranking.from_run(RUN)
        self.ranking_with_queries = Ranking.from_run(RUN, queries=DUMMY_QUERIES)

    def test_properties(self):
        self.assertEqual({"q1", "q2"}, self.ranking.q_ids)
        self.assertEqual(2, len(self.ranking))
        self.assertIn("q1", self.ranking)
        self.assertIn("q2", self.ranking)
        self.assertNotIn("q3", self.ranking)

    def test_getitem(self):
        self.assertEqual({"d0": 1, "d1": 2, "d2": 300}, self.ranking["q1"])

    def test_sort_order(self):
        # rows sorted by q_id desc, then score desc
        df = self.ranking._df
        self.assertEqual(["q2"] * 4 + ["q1"] * 3, df["q_id"].tolist())
        self.assertEqual([600.0, 7.0, 5.0, 4.0], df[df.q_id == "q2"]["score"].tolist())

    def test_attach_queries(self):
        self.assertFalse(self.ranking.has_queries)
        self.assertTrue(self.ranking_with_queries.has_queries)

        attached = self.ranking.attach_queries(DUMMY_QUERIES)
        for q_id, query in DUMMY_QUERIES.items():
            got = pd.unique(
                attached._df.loc[attached._df["q_id"] == q_id, "query"]
            ).tolist()
            self.assertEqual([query], got)

        # incomplete queries raise
        with self.assertRaises(ValueError):
            Ranking.from_run(RUN, queries={"qx": "other"})

        # superset of queries is fine
        more = {"qx": "other", **DUMMY_QUERIES}
        self.assertEqual(
            Ranking.from_run(RUN, queries=more), self.ranking_with_queries
        )

    def test_eq(self):
        r1 = Ranking.from_run({"q1": {"d1": 1, "d2": 2}})
        r2 = Ranking.from_run({"q1": {"d2": 2, "d1": 1}})
        r3 = Ranking.from_run({"q1": {"d1": 2, "d2": 3}})
        r4 = Ranking.from_run({"q1": {"d1": 1, "d2": 2}, "q2": {}})
        self.assertEqual(r1, r2)
        self.assertNotEqual(r1, r3)
        self.assertEqual(r1, r4)
        self.assertNotEqual(r1, "not a ranking")
        self.assertNotEqual(r1, 17)

    def test_operators(self):
        self.assertEqual(self.ranking + 0, self.ranking)
        self.assertEqual(self.ranking * 1, self.ranking)
        self.assertEqual(
            self.ranking + 1,
            Ranking.from_run(
                {
                    "q1": {"d0": 2, "d1": 3, "d2": 301},
                    "q2": {"d0": 5, "d1": 6, "d2": 601, "d3": 8},
                }
            ),
        )
        self.assertEqual(
            self.ranking * 2,
            Ranking.from_run(
                {
                    "q1": {"d0": 2, "d1": 4, "d2": 600},
                    "q2": {"d0": 8, "d1": 10, "d2": 1200, "d3": 14},
                }
            ),
        )
        self.assertEqual(1 + self.ranking, self.ranking + 1)
        self.assertEqual(2 * self.ranking, self.ranking * 2)
        self.assertEqual(self.ranking * 2, self.ranking + self.ranking)

        # queries survive algebra
        self.assertTrue((self.ranking_with_queries + 1).has_queries)
        self.assertTrue((self.ranking_with_queries * 2).has_queries)
        self.assertTrue((self.ranking_with_queries + self.ranking).has_queries)
        self.assertTrue((self.ranking + self.ranking_with_queries).has_queries)

        # missing scores count as zero
        self.assertEqual(
            self.ranking
            + Ranking.from_run({"q1": {"d0": 1, "d3": 1}, "q3": {"d0": 1}}),
            Ranking.from_run(
                {
                    "q1": {"d0": 2, "d1": 2, "d2": 300, "d3": 1},
                    "q2": {"d0": 4, "d1": 5, "d2": 600, "d3": 7},
                    "q3": {"d0": 1},
                }
            ),
        )

    def test_cut(self):
        self.assertEqual(
            self.ranking.cut(2),
            Ranking.from_run({"q1": {"d2": 300, "d1": 2}, "q2": {"d2": 600, "d3": 7}}),
        )
        self.assertTrue(self.ranking_with_queries.cut(2).has_queries)

    def test_save_load(self):
        self.ranking.name = "Dummy"
        fd, path = tempfile.mkstemp()
        path = Path(path)
        try:
            self.ranking.save(path)
            loaded = Ranking.from_file(path)
            self.assertEqual(self.ranking, loaded)
            self.assertEqual(self.ranking.name, loaded.name)
        finally:
            os.close(fd)
            os.remove(path)

    def test_normalize(self):
        self.assertEqual(
            Ranking.from_run(
                {"q1": {"d0": 1, "d1": 2, "d2": 3}, "q2": {"d0": 4, "d1": 5, "d2": 6}}
            ).normalize(),
            Ranking.from_run(
                {
                    "q1": {"d0": 0, "d1": 1 / 5, "d2": 2 / 5},
                    "q2": {"d0": 3 / 5, "d1": 4 / 5, "d2": 1},
                }
            ),
        )
        # all-equal scores -> 0
        self.assertEqual(
            Ranking.from_run({"q1": {"d0": 5, "d1": 5}}).normalize(),
            Ranking.from_run({"q1": {"d0": 0, "d1": 0}}),
        )
        self.assertTrue(self.ranking_with_queries.normalize().has_queries)

    def test_interpolate(self):
        df = self.ranking_with_queries._df.copy()
        df["score"] = np.arange(len(df), dtype=np.float32)
        r2 = Ranking(df)
        r_int = self.ranking.interpolate(r2, 0.5)
        self.assertNotEqual(self.ranking, r_int)
        self.assertEqual(r_int["q1"], {"d2": 152.0, "d1": 3.5, "d0": 3.5})
        self.assertEqual(r_int["q2"], {"d2": 300.0, "d3": 4.0, "d1": 3.5, "d0": 3.5})
        self.assertTrue(r_int.has_queries)

        r3 = Ranking.from_run({"q1": {"d1": 1, "d2": 2}})
        self.assertEqual(
            r3.interpolate(r3, 0.5, normalize=True),
            Ranking.from_run({"q1": {"d1": 0, "d2": 1}}),
        )

        # missing scores count as zero
        r4 = Ranking.from_run({"q1": {"d1": 1, "d2": 1}, "q2": {"d0": 1}})
        r5 = Ranking.from_run({"q1": {"d0": 1, "d1": 1}, "q3": {"d0": 1}})
        self.assertEqual(
            r4.interpolate(r5, 0.5),
            Ranking.from_run(
                {
                    "q1": {"d0": 0.5, "d1": 1, "d2": 0.5},
                    "q2": {"d0": 0.5},
                    "q3": {"d0": 0.5},
                }
            ),
        )
        # interpolate == manual mix
        self.assertEqual(r4.interpolate(r5, 0.5), 0.5 * r4 + 0.5 * r5)

    def test_rr_scores(self):
        self.assertEqual(
            self.ranking.rr_scores(k=1),
            Ranking.from_run(
                {
                    "q1": {"d0": 1 / 4, "d1": 1 / 3, "d2": 1 / 2},
                    "q2": {"d0": 1 / 5, "d1": 1 / 4, "d2": 1 / 2, "d3": 1 / 3},
                }
            ),
        )
        self.assertTrue(self.ranking_with_queries.rr_scores().has_queries)

    def test_duplicate_error(self):
        df = pd.DataFrame(
            [["q1", "d1", 1.0], ["q1", "d1", 2.0], ["q1", "d2", 1.0]],
            columns=["q_id", "id", "score"],
        )
        with self.assertRaises(ValueError):
            Ranking(df)


if __name__ == "__main__":
    unittest.main()
