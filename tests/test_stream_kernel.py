"""Pallas stream kernel: interpret-mode correctness (CPU)."""

import unittest

import numpy as np

from fastforward_tpu.ops import scoring, stream_kernel


class TestStreamKernelInterpret(unittest.TestCase):
    def test_matches_reference_dot(self):
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
        )
        got = np.asarray(outs).reshape(-1)[slot]
        expected = np.einsum("pd,pd->p", table.reshape(n_pad, dim)[rows], q[qno])
        np.testing.assert_allclose(got, expected, atol=1e-3, rtol=1e-4)


if __name__ == "__main__":
    unittest.main()
