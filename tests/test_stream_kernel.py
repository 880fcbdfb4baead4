"""Pallas stream kernel: interpret-mode correctness (CPU)."""

import unittest

import numpy as np

from fastforward_tpu.ops import scoring, stream_kernel


class TestStreamKernelInterpret(unittest.TestCase):
    def _run(self, precision):
        rng = np.random.default_rng(0)
        n_pad, dim, qb, p = 4096, 256, 16, 5000
        r, cap = stream_kernel.KERNEL_TILE_ROWS, stream_kernel.KERNEL_CAP
        table = rng.normal(size=(n_pad, dim // 128, 128)).astype(np.float32)
        q = rng.normal(size=(qb, dim)).astype(np.float32)
        rows = rng.integers(0, n_pad, size=p).astype(np.int64)
        qno = rng.integers(0, qb, size=p).astype(np.int64)
        cand, tile_idx, slot = scoring.build_streamed_layout(
            rows, qno, n_pad, qb, r=r, cap=cap
        )
        outs = stream_kernel.stream_select(
            table,
            np.ascontiguousarray(q.T.astype(np.float32)),
            cand.reshape(cand.shape[0], cap // 128, 128),
            tile_idx,
            r=r,
            interpret=True,
            precision=precision,
        )
        got = np.asarray(outs).reshape(-1)[slot]
        expected = np.einsum("pd,pd->p", table.reshape(n_pad, dim)[rows], q[qno])
        return got, expected

    def test_matches_reference_dot(self):
        got, expected = self._run("exact")
        np.testing.assert_allclose(got, expected, atol=1e-3, rtol=1e-4)

    def test_high_tier_close(self):
        """Manual bf16x3: ~1e-6 relative error on unit-scale inputs."""
        got, expected = self._run("high")
        np.testing.assert_allclose(got, expected, atol=5e-3, rtol=1e-3)

    def test_fast_tier_coarse(self):
        """bf16 inputs: ~0.5% relative error, rank-preserving in the large."""
        got, expected = self._run("fast")
        scale = np.abs(expected).mean()
        self.assertLess(np.abs(got - expected).mean(), 0.02 * scale)
        # correlation with the exact scores stays essentially perfect
        self.assertGreater(np.corrcoef(got, expected)[0, 1], 0.999)


class TestPallasFallbackRecovery(unittest.TestCase):
    def test_transient_failure_does_not_disable(self):
        scoring.set_pallas_stream(None)
        try:
            scoring._note_pallas_failure(RuntimeError("transient"))
            # one (or two) failures: the kernel stays available
            self.assertNotEqual(scoring._pallas_stream, False)
            scoring._pallas_success()
            self.assertEqual(0, scoring._pallas_failures)
            for _ in range(scoring._PALLAS_MAX_FAILURES):
                scoring._note_pallas_failure(RuntimeError("persistent"))
            self.assertIs(scoring._pallas_stream, False)
        finally:
            scoring.set_pallas_stream(None)


if __name__ == "__main__":
    unittest.main()
