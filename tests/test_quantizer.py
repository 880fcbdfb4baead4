"""Quantizer contract tests, shared across PQ / OPQ / scalar variants."""

import unittest

import numpy as np

from fastforward_tpu.quantizer import OPQ, PQ, ScalarQuantizer
from fastforward_tpu.quantizer.base import Quantizer

RNG = np.random.default_rng(42)


class TestQuantizer(unittest.TestCase):
    __test__ = False

    def test_eq(self):
        self.assertEqual(self.quantizer, self.quantizer)
        self.assertEqual(self.quantizer_trained, self.quantizer_trained)
        self.assertNotEqual(self.quantizer, self.quantizer_trained)

    def test_properties(self):
        self.assertEqual((None, 8), self.quantizer.dims)
        self.assertEqual(np.uint8, self.quantizer.dtype)
        self.assertFalse(self.quantizer._trained)

        self.assertEqual((768, 8), self.quantizer_trained.dims)
        self.assertEqual(np.uint8, self.quantizer_trained.dtype)
        self.assertTrue(self.quantizer_trained._trained)

    def test_encoding_decoding(self):
        inputs = RNG.normal(size=(8, 768)).astype(np.float32)
        encoded = self.quantizer_trained.encode(inputs)
        self.assertEqual((8, 8), encoded.shape)
        self.assertEqual(np.uint8, encoded.dtype)
        decoded = self.quantizer_trained.decode(encoded)
        self.assertEqual(inputs.shape, decoded.shape)

    def test_reconstruction_reduces_error(self):
        """On structured (low-rank) data, the codebooks capture structure."""
        # white noise is incompressible; use vectors from an 8-dim subspace
        basis = RNG.normal(size=(8, 768)).astype(np.float32)
        data = (RNG.normal(size=(2**10, 8)).astype(np.float32) @ basis) / 8
        quantizer = type(self.quantizer)(8, 256)
        quantizer.fit(data)
        decoded = quantizer.decode(quantizer.encode(data))
        err = np.mean((data - decoded) ** 2)
        base = np.mean(data**2)
        self.assertLess(err, 0.5 * base)

    def test_serialization(self):
        inputs = RNG.normal(size=(8, 768)).astype(np.float32)
        loaded = Quantizer.deserialize(*self.quantizer.serialize())
        self.assertEqual(self.quantizer, loaded)

        trained_loaded = Quantizer.deserialize(*self.quantizer_trained.serialize())
        self.assertEqual(self.quantizer_trained, trained_loaded)
        np.testing.assert_array_equal(
            self.quantizer_trained.encode(inputs), trained_loaded.encode(inputs)
        )

    def test_errors(self):
        with self.assertRaises(RuntimeError):
            self.quantizer.encode(RNG.normal(size=(8, 768)).astype(np.float32))
        with self.assertRaises(RuntimeError):
            self.quantizer.set_attached()


class TestPQ(TestQuantizer):
    __test__ = True

    @classmethod
    def setUpClass(cls):
        cls.quantizer = PQ(8, 256)
        cls.quantizer_trained = PQ(8, 256)
        cls.quantizer_trained.fit(RNG.normal(size=(2**10, 768)).astype(np.float32))


class TestOPQ(TestQuantizer):
    __test__ = True

    @classmethod
    def setUpClass(cls):
        cls.quantizer = OPQ(8, 256, opq_iters=2)
        cls.quantizer_trained = OPQ(8, 256, opq_iters=2)
        cls.quantizer_trained.fit(RNG.normal(size=(2**10, 768)).astype(np.float32))

    def test_rotation_orthogonal(self):
        r = self.quantizer_trained.R
        np.testing.assert_allclose(r @ r.T, np.eye(r.shape[0]), atol=1e-4)

    def test_rotated_query_scores_match_decode(self):
        """(q @ R) . codeword == q . decode (the in-kernel scoring identity)."""
        inputs = RNG.normal(size=(4, 768)).astype(np.float32)
        queries = RNG.normal(size=(2, 768)).astype(np.float32)
        codes = self.quantizer_trained.encode(inputs)
        decoded = self.quantizer_trained.decode(codes)

        rotated_q = self.quantizer_trained.rotate(queries)
        # decode without the inverse rotation == raw codeword concat
        raw = PQ._decode(self.quantizer_trained, codes)
        np.testing.assert_allclose(
            queries @ decoded.T, rotated_q @ raw.T, rtol=1e-3, atol=1e-2
        )


class TestScalarQuantizer(unittest.TestCase):
    def setUp(self):
        self.quantizer = ScalarQuantizer()
        self.data = RNG.normal(size=(256, 64)).astype(np.float32)
        self.quantizer.fit(self.data)

    def test_round_trip(self):
        codes = self.quantizer.encode(self.data)
        self.assertEqual(np.int8, codes.dtype)
        decoded = self.quantizer.decode(codes)
        max_err = np.abs(self.data - decoded).max()
        # quantization step is scale = absmax/127; error <= scale/2 per dim
        self.assertLess(max_err, np.max(self.quantizer.scales))

    def test_dims(self):
        self.assertEqual((64, 64), self.quantizer.dims)

    def test_serialization(self):
        loaded = Quantizer.deserialize(*self.quantizer.serialize())
        self.assertEqual(self.quantizer, loaded)

    def test_untrained_errors(self):
        fresh = ScalarQuantizer()
        with self.assertRaises(RuntimeError):
            fresh.encode(self.data)
        with self.assertRaises(RuntimeError):
            fresh.set_attached()


if __name__ == "__main__":
    unittest.main()
