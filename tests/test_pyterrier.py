"""PyTerrier adapter: import gating + transform semantics via a stub ``pt``.

python-terrier is an optional extra, so the transform contract
(reference: ``util/pyterrier.py:26-83``) is exercised against a minimal
stub module that provides the two touchpoints the adapter uses:
``pt.Transformer`` and ``pt.model.add_ranks``.
"""

import importlib
import importlib.util
import sys
import types
import unittest

import numpy as np
import pandas as pd

from fastforward_tpu.encoder import LambdaEncoder
from fastforward_tpu.index import InMemoryIndex, Mode

HAVE_REAL_PT = importlib.util.find_spec("pyterrier") is not None


class TestPyTerrierGating(unittest.TestCase):
    def test_import_behavior(self):
        if HAVE_REAL_PT:  # pragma: no cover - environment-dependent
            from fastforward_tpu.utils.pyterrier import FFInterpolate, FFScore

            self.assertTrue(callable(FFScore))
            self.assertEqual(0.3, FFInterpolate(0.3).alpha)
        else:
            sys.modules.pop("fastforward_tpu.utils.pyterrier", None)
            with self.assertRaises(ImportError):
                import fastforward_tpu.utils.pyterrier  # noqa: F401


def _make_stub_pt():
    """Minimal python-terrier stand-in: Transformer base + add_ranks."""
    pt = types.ModuleType("pyterrier")

    class Transformer:
        def __init__(self, *args, **kwargs):
            pass

    def add_ranks(df, single_query=False):
        out = df.copy()
        out["rank"] = (
            out.groupby("qid")["score"].rank(ascending=False, method="first") - 1
        ).astype(int)
        return out.sort_values(["qid", "rank"]).reset_index(drop=True)

    model = types.ModuleType("pyterrier.model")
    model.add_ranks = add_ranks
    pt.Transformer = Transformer
    pt.model = model
    return pt, model


@unittest.skipIf(HAVE_REAL_PT, "real python-terrier present; stub not needed")
class TestPyTerrierTransforms(unittest.TestCase):
    """Drive FFScore.transform / FFInterpolate.transform end to end."""

    @classmethod
    def setUpClass(cls):
        pt, model = _make_stub_pt()
        sys.modules["pyterrier"] = pt
        sys.modules["pyterrier.model"] = model
        sys.modules.pop("fastforward_tpu.utils.pyterrier", None)
        cls._adapter = importlib.import_module("fastforward_tpu.utils.pyterrier")

        cls.index = InMemoryIndex(
            query_encoder=LambdaEncoder(lambda _: np.ones(5)),
            mode=Mode.MAXP,
        )
        cls.index.add(
            vectors=np.array(
                [
                    [1, 0, 0, 0, 0],
                    [1, 1, 0, 0, 0],
                    [1, 1, 1, 0, 0],
                    [1, 1, 1, 1, 0],
                ],
                dtype=np.float32,
            ),
            doc_ids=["d0", "d0", "d1", "d2"],
        )

    @classmethod
    def tearDownClass(cls):
        sys.modules.pop("pyterrier", None)
        sys.modules.pop("pyterrier.model", None)
        sys.modules.pop("fastforward_tpu.utils.pyterrier", None)

    def _input_frame(self):
        return pd.DataFrame(
            {
                "qid": ["q1", "q1", "q1", "q2", "q2"],
                "docno": ["d0", "d1", "d2", "d0", "d2"],
                "query": ["query one"] * 3 + ["query two"] * 2,
                "score": [10.0, 5.0, 1.0, 7.0, 2.0],
            }
        )

    def test_ffscore_transform(self):
        FFScore = self._adapter.FFScore
        out = FFScore(self.index).transform(self._input_frame())

        # lexical scores moved to score_0, semantic scores in score
        self.assertIn("score_0", out.columns)
        self.assertIn("rank", out.columns)
        by_key = out.set_index(["qid", "docno"])
        # all-ones query vector dots: d0 = max(1, 2) = 2, d1 = 3, d2 = 4
        expected_sem = {"d0": 2.0, "d1": 3.0, "d2": 4.0}
        expected_lex = {
            ("q1", "d0"): 10.0,
            ("q1", "d1"): 5.0,
            ("q1", "d2"): 1.0,
            ("q2", "d0"): 7.0,
            ("q2", "d2"): 2.0,
        }
        for (qid, docno), lex in expected_lex.items():
            row = by_key.loc[(qid, docno)]
            self.assertAlmostEqual(lex, row["score_0"], places=5)
            self.assertAlmostEqual(expected_sem[docno], row["score"], places=5)
        # ranks follow the semantic score ordering (0-based per query)
        q1 = out[out["qid"] == "q1"].sort_values("rank")
        self.assertEqual(["d2", "d1", "d0"], list(q1["docno"]))
        self.assertEqual([0, 1, 2], list(q1["rank"]))

    def test_ffscore_repr_unique_per_index(self):
        FFScore = self._adapter.FFScore
        other = InMemoryIndex(
            query_encoder=LambdaEncoder(lambda _: np.ones(5)), mode=Mode.MAXP
        )
        self.assertNotEqual(repr(FFScore(self.index)), repr(FFScore(other)))

    def test_ffinterpolate_transform(self):
        FFInterpolate = self._adapter.FFInterpolate
        inp = pd.DataFrame(
            {
                "qid": ["q1", "q1", "q2"],
                "docno": ["d0", "d1", "d0"],
                "query": ["query one", "query one", "query two"],
                "score_0": [10.0, 4.0, 8.0],
                "score": [2.0, 3.0, 1.0],
            }
        )
        tf = FFInterpolate(0.25)
        self.assertEqual(0.25, tf.alpha)  # attr name required by GridScan
        out = tf.transform(inp)
        by_key = out.set_index(["qid", "docno"])["score"]
        self.assertAlmostEqual(0.25 * 10 + 0.75 * 2, by_key[("q1", "d0")])
        self.assertAlmostEqual(0.25 * 4 + 0.75 * 3, by_key[("q1", "d1")])
        self.assertAlmostEqual(0.25 * 8 + 0.75 * 1, by_key[("q2", "d0")])
        # interpolated ordering: q1 d0 (4.0) above d1 (3.25)
        q1 = out[out["qid"] == "q1"].sort_values("rank")
        self.assertEqual(["d0", "d1"], list(q1["docno"]))

    def test_pipeline_ffscore_then_interpolate(self):
        FFScore = self._adapter.FFScore
        FFInterpolate = self._adapter.FFInterpolate
        scored = FFScore(self.index).transform(self._input_frame())
        out = FFInterpolate(0.5).transform(scored)
        # q1 d0: 0.5*10 + 0.5*2 = 6; d1: 0.5*5 + 0.5*3 = 4; d2: 0.5*1+0.5*4=2.5
        q1 = out[out["qid"] == "q1"].sort_values("rank")
        self.assertEqual(["d0", "d1", "d2"], list(q1["docno"]))
        np.testing.assert_allclose([6.0, 4.0, 2.5], q1["score"].to_numpy())

    def test_ffrerank_fused_matches_pipeline(self):
        # FFRerank == FFScore >> FFInterpolate >> top-cutoff, in one call
        FFRerank = self._adapter.FFRerank
        out = FFRerank(self.index, 0.5, 2).transform(self._input_frame())
        self.assertEqual(["query", "rank"], sorted(set(out.columns) - {"qid", "docno", "score"}))
        q1 = out[out["qid"] == "q1"].sort_values("rank")
        # q1 interpolated: d0=6, d1=4, d2=2.5 -> top-2 is d0, d1
        self.assertEqual(["d0", "d1"], list(q1["docno"]))
        np.testing.assert_allclose([6.0, 4.0], q1["score"].to_numpy())
        self.assertEqual(["query one", "query one"], list(q1["query"]))
        q2 = out[out["qid"] == "q2"].sort_values("rank")
        # q2 interpolated: d0 = 0.5*7+0.5*2 = 4.5, d2 = 0.5*2+0.5*4 = 3
        self.assertEqual(["d0", "d2"], list(q2["docno"]))
        np.testing.assert_allclose([4.5, 3.0], q2["score"].to_numpy())

    def test_ffrerank_repr_unique(self):
        FFRerank = self._adapter.FFRerank
        a = FFRerank(self.index, 0.5, 10)
        b = FFRerank(self.index, 0.2, 10)
        self.assertNotEqual(repr(a), repr(b))


if __name__ == "__main__":
    unittest.main()
