"""Preload overlap: zeros-twin views and the upload/warm overlap.

The twin MUST mirror ``_device_view``'s kind/shape/dtype decisions exactly
— a mismatch silently warms the wrong programs and the first real call
recompiles (the failure mode the twin exists to kill).
"""

import unittest

import numpy as np

from fastforward_tpu import Ranking
from fastforward_tpu.encoder import LambdaEncoder
from fastforward_tpu.index import InMemoryIndex, Mode
from fastforward_tpu.quantizer import PQ, ScalarQuantizer

DIM = 256
N = 300


def _vecs(seed=0, n=N):
    return np.random.default_rng(seed).standard_normal((n, DIM)).astype(
        np.float32
    )


def _encoder():
    rng = np.random.default_rng(7)
    return LambdaEncoder(
        lambda _t: rng.standard_normal(DIM).astype(np.float32)
    )


def _add(index, vecs):
    index.add(vecs, doc_ids=None, psg_ids=[f"p{i}" for i in range(len(vecs))])


def _fitted_pq(vecs):
    pq = PQ(M=8, Ks=16)
    pq.fit(vecs[:200])
    return pq


def _fitted_scalar(vecs):
    sq = ScalarQuantizer()
    sq.fit(vecs[:200])
    return sq


class TestTwinMatchesReal(unittest.TestCase):
    def _check(self, index, vecs):
        _add(index, vecs)
        twin = index._twin_view()
        self.assertIsNotNone(twin)
        real = index._device_view()
        self.assertEqual(twin.kind, real.kind)
        self.assertEqual(twin.table.shape, real.table.shape)
        self.assertEqual(twin.table.dtype, real.table.dtype)
        if real.codebooks is not None:
            self.assertEqual(twin.codebooks.shape, real.codebooks.shape)
            self.assertEqual(twin.codebooks.dtype, real.codebooks.dtype)

    def test_dense_fp32(self):
        self._check(InMemoryIndex(_encoder(), mode=Mode.PASSAGE), _vecs())

    def test_dense_bf16(self):
        self._check(
            InMemoryIndex(
                _encoder(), mode=Mode.PASSAGE, device_dtype="bfloat16"
            ),
            _vecs(),
        )

    def test_int8(self):
        vecs = _vecs(1)
        self._check(
            InMemoryIndex(
                _encoder(), quantizer=_fitted_scalar(vecs), mode=Mode.PASSAGE
            ),
            vecs,
        )

    def test_pq(self):
        vecs = _vecs(2)
        self._check(
            InMemoryIndex(
                _encoder(), quantizer=_fitted_pq(vecs), mode=Mode.PASSAGE
            ),
            vecs,
        )

    def test_no_twin_after_view_built(self):
        index = InMemoryIndex(_encoder(), mode=Mode.PASSAGE)
        _add(index, _vecs())
        index._device_view()
        self.assertIsNone(index._twin_view())

    def test_no_twin_for_hybrid(self):
        index = InMemoryIndex(
            _encoder(), mode=Mode.PASSAGE, hbm_budget=1 << 18
        )
        _add(index, _vecs())
        self.assertIsNone(index._twin_view())


class TestPreloadOverlapCorrectness(unittest.TestCase):
    def _ranking(self, num_q=4, depth=16):
        rows = {
            "q_id": np.repeat(
                [f"q{i}" for i in range(num_q - 1, -1, -1)], depth
            ),
            "id": np.tile([f"p{i}" for i in range(depth)], num_q),
            "score": np.tile(
                np.arange(depth, 0, -1, dtype=np.float32), num_q
            ),
        }
        import pandas as pd

        return Ranking(
            pd.DataFrame(rows),
            queries={f"q{i}": f"query {i}" for i in range(num_q)},
            copy=False,
            is_sorted=True,
        )

    def test_overlapped_preload_scores_match_plain(self):
        vecs = _vecs(3)
        a = InMemoryIndex(_encoder(), mode=Mode.PASSAGE)
        b = InMemoryIndex(_encoder(), mode=Mode.PASSAGE)
        _add(a, vecs)
        _add(b, vecs)
        ranking = self._ranking()
        self.assertTrue(a.preload(warm=(4, 16), serve=(0.2, 5, 8)))
        self.assertTrue(a._preload_stats.get("overlap"))
        self.assertIsNone(a._view_override)
        got = a(ranking)
        want = b(ranking)
        for q in want.q_ids:
            g, w = got[q], want[q]
            self.assertEqual(set(g), set(w))
            for d, s in w.items():
                self.assertAlmostEqual(g[d], s, places=4)
        gs = a.serve(ranking, 0.2, 5)
        ws = b.serve(ranking, 0.2, 5)
        for q in ws.q_ids:
            g, w = gs[q], ws[q]
            self.assertEqual(set(g), set(w))
            for d, s in w.items():
                self.assertAlmostEqual(g[d], s, places=4)

    def test_preload_stats_phases_recorded(self):
        vecs = _vecs(4)
        index = InMemoryIndex(_encoder(), mode=Mode.PASSAGE)
        _add(index, vecs)
        index.preload(warm=(2, 8), serve=(0.3, 3))
        stats = index._preload_stats
        self.assertIn("warm_rerank_s", stats)
        self.assertIn("warm_serve_s", stats)
        self.assertIn("upload_s", stats)

    def test_warm_retry_fires_on_masked_kernel_failure(self):
        # a kernel failure in one warm thread followed by a kernel SUCCESS
        # in the other resets the consecutive-failure counter — the retry
        # must key on the monotonic total, or the masked failure leaves the
        # kernel uncompiled for the first real call
        from unittest import mock

        from fastforward_tpu.index import base as base_mod
        from fastforward_tpu.ops import scoring

        vecs = _vecs(4)
        index = InMemoryIndex(_encoder(), mode=Mode.PASSAGE)
        _add(index, vecs)

        calls: list[str] = []
        orig_call = base_mod.Index.__call__

        def warm_call(self, ranking, **kw):
            calls.append("rerank")
            if len(calls) == 1:
                # simulate: this thread's kernel fails (silent XLA
                # fallback), another thread's kernel then succeeds
                scoring._note_pallas_failure(RuntimeError("transient"))
                scoring._pallas_success()
            return ranking

        with mock.patch.object(base_mod.Index, "__call__", warm_call), \
                mock.patch.object(
                    scoring, "pallas_stream_enabled", lambda: True
                ):
            index.preload(warm=(2, 8))
        self.assertEqual(calls.count("rerank"), 2)
        self.assertIn("warm_retry_s", index._preload_stats)
        # the real __call__ still works after the patch is lifted
        self.assertIs(base_mod.Index.__call__, orig_call)

    def test_sequential_fallback_still_warms(self):
        # hybrid config: no twin — preload must fall back to sequential
        vecs = _vecs(5)
        index = InMemoryIndex(
            _encoder(), mode=Mode.PASSAGE, hbm_budget=1 << 30
        )
        _add(index, vecs)
        self.assertTrue(index.preload(warm=(2, 8)))
        self.assertFalse(index._preload_stats.get("overlap"))


if __name__ == "__main__":
    unittest.main()
