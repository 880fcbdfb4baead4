"""Native runtime units: layout builder and radix argsort edge cases."""

import unittest

import numpy as np

from fastforward_tpu import ops
from fastforward_tpu.runtime.idmap import radix_argsort


class TestRadixArgsort(unittest.TestCase):
    def test_matches_numpy(self):
        rng = np.random.default_rng(1)
        for n in (0, 1, 7, 1000, 100_000):
            keys = rng.integers(0, 2**63, size=n, dtype=np.uint64)
            got = radix_argsort(keys)
            if got is None:  # no native lib in this environment
                self.skipTest("native runtime unavailable")
            np.testing.assert_array_equal(np.argsort(keys, kind="stable"), got)

    def test_stability(self):
        keys = np.array([3, 1, 1, 3, 1], dtype=np.uint64)
        got = radix_argsort(keys)
        if got is None:
            self.skipTest("native runtime unavailable")
        np.testing.assert_array_equal([1, 2, 4, 0, 3], got)


class TestStreamedLayout(unittest.TestCase):
    def test_skewed_tiles_spill_to_virtual_tiles(self):
        """More candidates than CAP in one tile -> repeated tile index."""
        cap = ops.STREAM_CAP
        n_pad = ops.STREAM_TILE_ROWS * 4
        qb = 4
        # all candidates in tile 0
        rows = np.zeros(cap + 10, dtype=np.int64)
        qno = np.zeros(cap + 10, dtype=np.int64)
        cand, tile_idx, slot = ops.build_streamed_layout(rows, qno, n_pad, qb)
        self.assertGreaterEqual((tile_idx == 0).sum(), 2)
        self.assertEqual(len(np.unique(slot)), cap + 10)

    def test_empty(self):
        self.assertIsNone(
            ops.build_streamed_layout(
                np.array([], dtype=np.int64),
                np.array([], dtype=np.int64),
                ops.STREAM_TILE_ROWS,
                4,
            )
        )


if __name__ == "__main__":
    unittest.main()
