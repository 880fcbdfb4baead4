"""Chunked host->device upload (``fastforward_tpu.ops.upload``).

The op exists because one big transfer over a remote-attached device runs
~10x slower than the same bytes in ~256 MB chunks
(``bench_logs/r5d_upload_probe.log``); on CPU both paths are trivially
fast, so these tests pin CORRECTNESS (exact bytes, every placement
strategy, ragged tails, dtypes) and leave the speed claim to the on-chip
probe log.  The reference never uploads anything (pure numpy scoring,
``/root/reference/src/fast_forward/index/memory.py``) — this cost class
is TPU-native-only.
"""

import unittest

import numpy as np

from fastforward_tpu.ops import upload


def _roundtrip(host: np.ndarray, **kw) -> np.ndarray:
    return np.asarray(upload.upload_table(host, **kw))


class TestUploadTable(unittest.TestCase):
    def test_small_table_passthrough(self) -> None:
        host = np.arange(24, dtype=np.float32).reshape(6, 4)
        np.testing.assert_array_equal(_roundtrip(host), host)

    def test_chunked_concat_exact(self) -> None:
        host = np.random.default_rng(0).standard_normal((1000, 16)).astype(
            np.float32
        )
        old = upload.MIN_CHUNKED_BYTES
        upload.MIN_CHUNKED_BYTES = 0
        try:
            # 300-row chunks -> 4 chunks with a ragged 100-row tail
            out = _roundtrip(host, chunk_bytes=300 * 16 * 4)
        finally:
            upload.MIN_CHUNKED_BYTES = old
        np.testing.assert_array_equal(out, host)

    def test_single_chunk_no_concat(self) -> None:
        host = np.random.default_rng(1).standard_normal((64, 8)).astype(
            np.float32
        )
        old = upload.MIN_CHUNKED_BYTES
        upload.MIN_CHUNKED_BYTES = 0
        try:
            out = _roundtrip(host, chunk_bytes=host.nbytes * 2)
        finally:
            upload.MIN_CHUNKED_BYTES = old
        np.testing.assert_array_equal(out, host)

    def test_in_place_placement_exact(self) -> None:
        host = np.random.default_rng(2).standard_normal((777, 12)).astype(
            np.float32
        )
        old_min, old_free = upload.MIN_CHUNKED_BYTES, upload._free_hbm
        upload.MIN_CHUNKED_BYTES = 0
        upload._free_hbm = lambda: 0  # force the donated in-place path
        try:
            out = _roundtrip(host, chunk_bytes=100 * 12 * 4)
        finally:
            upload.MIN_CHUNKED_BYTES = old_min
            upload._free_hbm = old_free
        np.testing.assert_array_equal(out, host)

    def test_3d_int8_codes(self) -> None:
        # int8 scalar-quantized tables upload in their 3D (N, dim//128, 128)
        # MXU layout; chunking splits the leading axis only
        host = np.random.default_rng(3).integers(
            -128, 128, size=(500, 3, 128), dtype=np.int8
        )
        old = upload.MIN_CHUNKED_BYTES
        upload.MIN_CHUNKED_BYTES = 0
        try:
            out = _roundtrip(host, chunk_bytes=128 * 3 * 128)
        finally:
            upload.MIN_CHUNKED_BYTES = old
        self.assertEqual(out.dtype, np.int8)
        np.testing.assert_array_equal(out, host)

    def test_bf16_dtype_preserved(self) -> None:
        import ml_dtypes

        host = (
            np.random.default_rng(4)
            .standard_normal((300, 8))
            .astype(ml_dtypes.bfloat16)
        )
        old = upload.MIN_CHUNKED_BYTES
        upload.MIN_CHUNKED_BYTES = 0
        try:
            dev = upload.upload_table(host, chunk_bytes=100 * 8 * 2)
        finally:
            upload.MIN_CHUNKED_BYTES = old
        self.assertEqual(str(dev.dtype), "bfloat16")
        np.testing.assert_array_equal(
            np.asarray(dev, dtype=np.float32), host.astype(np.float32)
        )


if __name__ == "__main__":
    unittest.main()
