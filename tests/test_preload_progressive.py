"""Progressive (split-plane) preload: serve at half the upload, exact later.

``preload(progressive=True)`` uploads only the table's high 16-bit planes,
expands them on device into a truncated-fp32 serving table (the FINAL
table's aval, so warmed programs apply), and folds the low planes in on a
background thread.  These tests pin the plane algebra (hi|lo is lossless,
hi alone is fp32-truncation), the view swap lifecycle, the add() race
guard, and end-to-end score parity after ``preload_join``.
"""

import unittest

import numpy as np

import fastforward_tpu.index.memory as memory_mod
from fastforward_tpu import Ranking
from fastforward_tpu.encoder import LambdaEncoder
from fastforward_tpu.index import InMemoryIndex, Mode
from fastforward_tpu.ops.upload import combine_lo, expand_hi, upload_plane

DIM = 256
N = 300


def _vecs(seed=0, n=N):
    return np.random.default_rng(seed).standard_normal((n, DIM)).astype(
        np.float32
    )


def _encoder():
    # deterministic per query TEXT: repeat calls must encode identically
    # (interim scores are compared against a later re-scoring)
    def enc(text):
        seed = int.from_bytes(str(text).encode()[:8].ljust(8, b"\0"), "little")
        return (
            np.random.default_rng(seed % (2**31))
            .standard_normal(DIM)
            .astype(np.float32)
        )

    return LambdaEncoder(enc)


def _add(index, vecs):
    index.add(vecs, doc_ids=None, psg_ids=[f"p{i}" for i in range(len(vecs))])


def _ranking(num_q=4, depth=16):
    rows = []
    for q in range(num_q):
        for d in range(depth):
            rows.append({"q_id": f"q{q}", "id": f"p{(q * 31 + d) % N}",
                         "score": float(depth - d)})
    import pandas as pd

    return Ranking(
        pd.DataFrame(rows),
        queries={f"q{q}": f"query {q}" for q in range(num_q)},
    )


class TestPlaneAlgebra(unittest.TestCase):
    def test_split_is_lossless(self):
        host = _vecs(3, 40)
        # exercise every float shape: negatives, denormal-ish, inf/nan
        host[0, 0] = np.inf
        host[0, 1] = -np.inf
        host[0, 2] = np.nan
        host[0, 3] = 0.0
        host[0, 4] = -0.0
        host[0, 5] = np.float32(1e-42)
        hi = upload_plane(host, "hi")
        lo = upload_plane(host, "lo")
        trunc = expand_hi(hi)
        full = np.asarray(combine_lo(trunc, lo))
        np.testing.assert_array_equal(
            full.view(np.uint32), host.view(np.uint32)
        )

    def test_hi_alone_is_truncation(self):
        host = _vecs(4, 16)
        trunc = np.asarray(expand_hi(upload_plane(host, "hi")))
        expected = (host.view(np.uint32) & 0xFFFF0000).view(np.float32)
        np.testing.assert_array_equal(
            trunc.view(np.uint32), expected.view(np.uint32)
        )
        # truncation error is bf16-magnitude (round-toward-zero: < 2^-7)
        rel = np.abs(trunc - host) / np.maximum(np.abs(host), 1e-6)
        self.assertLess(float(rel.max()), 2 ** -7)

    def test_padded_rows_are_zero(self):
        host = _vecs(5, 10)
        hi = upload_plane(host, "hi", total_rows=16)
        lo = upload_plane(host, "lo", total_rows=16)
        full = np.asarray(combine_lo(expand_hi(hi), lo))
        self.assertEqual(full.shape, (16, DIM))
        np.testing.assert_array_equal(full[10:], 0.0)
        np.testing.assert_array_equal(full[:10], host)

    def test_rejects_bad_args(self):
        host = _vecs(6, 4)
        with self.assertRaises(ValueError):
            upload_plane(host.astype(np.float64), "hi")
        with self.assertRaises(ValueError):
            upload_plane(host, "mid")
        with self.assertRaises(ValueError):
            upload_plane(host, "hi", total_rows=2)


class TestProgressivePreload(unittest.TestCase):
    def setUp(self):
        # the size gate exists for production (small tables gain
        # nothing); tests exercise the machinery on tiny tables
        self._gate = memory_mod._MIN_PROGRESSIVE_BYTES
        memory_mod._MIN_PROGRESSIVE_BYTES = 0

    def tearDown(self):
        memory_mod._MIN_PROGRESSIVE_BYTES = self._gate

    def _index(self, **kwargs):
        index = InMemoryIndex(
            query_encoder=_encoder(), mode=Mode.PASSAGE, **kwargs
        )
        _add(index, _vecs())
        return index

    def test_eligibility(self):
        self.assertIsNotNone(self._index()._progressive_job())
        from fastforward_tpu.quantizer import ScalarQuantizer

        sq = ScalarQuantizer()
        sq.fit(_vecs()[:100])
        for index in (
            self._index(device_dtype="bfloat16"),
            self._index(hbm_budget=1 << 30),
            InMemoryIndex(query_encoder=_encoder(), quantizer=sq,
                          mode=Mode.PASSAGE),
        ):
            if len(index) == 0:
                _add(index, _vecs())
            self.assertIsNone(index._progressive_job())
        # production gate: small tables are ineligible
        memory_mod._MIN_PROGRESSIVE_BYTES = 1 << 30
        self.assertIsNone(self._index()._progressive_job())

    def test_interim_then_exact_scores(self):
        exact_index = self._index()
        ranking = _ranking()
        want = exact_index(ranking)

        index = self._index()
        self.assertTrue(
            index.preload(warm=(4, 16), progressive=True)
        )
        stats = index._preload_stats
        self.assertTrue(stats.get("progressive"))
        self.assertIn("activate_s", stats)
        # interim serving view exists NOW, with the final table's aval
        view = index._device_view()
        self.assertEqual(view.kind, "dense")
        self.assertEqual(str(view.table.dtype), "float32")
        interim = index(ranking)
        # truncation error is bounded by the fast tier's
        a = interim._df.sort_values(["q_id", "id"])["score"].to_numpy()
        b = want._df.sort_values(["q_id", "id"])["score"].to_numpy()
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=5e-2)
        self.assertTrue(index.preload_join(timeout=60.0))
        table = np.asarray(index._device_view().table)[:N]
        np.testing.assert_array_equal(table, exact_index._store[:N])
        after = index(Ranking(ranking._df.copy(), queries=dict(
            (q, f"query {q[1:]}") for q in ranking._df["q_id"].unique()
        )))
        a = after._df.sort_values(["q_id", "id"])["score"].to_numpy()
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-5)

    def test_without_warm(self):
        index = self._index()
        self.assertTrue(index.preload(progressive=True))
        self.assertTrue(index._preload_stats.get("progressive"))
        self.assertIsNotNone(index._dev_view)
        self.assertTrue(index.preload_join(timeout=60.0))
        np.testing.assert_array_equal(
            np.asarray(index._device_view().table)[:N], index._store[:N]
        )

    def test_add_race_discards_swap(self):
        index = self._index()
        job = index._progressive_job()
        self.assertIsNotNone(job)
        job.upload_hi()
        index.add(  # bumps the generation
            _vecs(9, 8), doc_ids=None,
            psg_ids=[f"race{i}" for i in range(8)],
        )
        job.activate()
        # neither the interim nor the exact table may be installed
        self.assertIsNone(index._dev_view)
        thread = index._progressive_thread
        if thread is not None:
            thread.join(60.0)
        self.assertIsNone(index._dev_view)

    def test_preload_join_noop(self):
        index = self._index()
        self.assertTrue(index.preload_join())

    def test_unsupported_config_falls_back(self):
        index = self._index(device_dtype="bfloat16")
        self.assertTrue(index.preload(warm=(2, 8), progressive=True))
        stats = index._preload_stats
        self.assertFalse(stats.get("progressive", False))
        self.assertIsNotNone(index._device_view())


if __name__ == "__main__":
    unittest.main()
