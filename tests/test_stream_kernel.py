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


class TestStreamKernelPairwiseInterpret(unittest.TestCase):
    """Pairwise select kernel (rows AND queries one-hot-selected, rowwise
    fp32 dot) vs numpy ground truth and vs the classic select kernel."""

    def _run(self, exact):
        rng = np.random.default_rng(1)
        n_pad, dim, qb, p = 4096, 256, 16, 5000
        r, cap = stream_kernel.KERNEL_TILE_ROWS, stream_kernel.KERNEL_CAP
        table = rng.normal(size=(n_pad, dim)).astype(np.float32)
        q = rng.normal(size=(qb, dim)).astype(np.float32)
        rows = rng.integers(0, n_pad, size=p).astype(np.int64)
        qno = rng.integers(0, qb, size=p).astype(np.int64)
        cand, tile_idx, slot = scoring.build_streamed_layout(
            rows, qno, n_pad, qb, r=r, cap=cap
        )
        outs = stream_kernel.stream_select_pairwise(
            table,
            q,
            cand.reshape(cand.shape[0], cap // 128, 128),
            tile_idx,
            r=r,
            interpret=True,
            exact=exact,
        )
        got = np.asarray(outs).reshape(-1)[slot]
        expected = np.einsum("pd,pd->p", table[rows], q[qno])
        return got, expected

    def test_exact_matches_fp32_dot(self):
        """3-part bf16 splits reconstruct fp32 exactly: true fp32 dots."""
        got, expected = self._run(exact=True)
        np.testing.assert_allclose(got, expected, atol=1e-4, rtol=1e-5)

    def test_fast_tier_coarse(self):
        got, expected = self._run(exact=False)
        scale = np.abs(expected).mean()
        self.assertLess(np.abs(got - expected).mean(), 0.02 * scale)
        self.assertGreater(np.corrcoef(got, expected)[0, 1], 0.999)

    def test_padding_slots_zero(self):
        """Unused slots pack (local 0, query qb-1); with the zero-padded
        query column their pairwise dot must come out 0."""
        rng = np.random.default_rng(2)
        n_pad, dim, qb = 2048, 256, 8
        r, cap = stream_kernel.KERNEL_TILE_ROWS, stream_kernel.KERNEL_CAP
        table = rng.normal(size=(n_pad, dim)).astype(np.float32)
        q = rng.normal(size=(qb, dim)).astype(np.float32)
        q[qb - 1] = 0.0  # the pack modulus reserves the last column
        rows = np.array([5, 700], dtype=np.int64)
        qno = np.array([0, 3], dtype=np.int64)
        cand, tile_idx, slot = scoring.build_streamed_layout(
            rows, qno, n_pad, qb, r=r, cap=cap
        )
        outs = np.asarray(
            stream_kernel.stream_select_pairwise(
                table,
                q,
                cand.reshape(cand.shape[0], cap // 128, 128),
                tile_idx,
                r=r,
                interpret=True,
                exact=True,
            )
        ).reshape(-1)
        mask = np.ones(outs.shape[0], dtype=bool)
        mask[slot] = False
        np.testing.assert_array_equal(outs[mask], 0.0)


class TestStreamKernelPairwiseInt8(unittest.TestCase):
    """3D int8 code tables through the pairwise body: int8 values are
    exact in bf16, so exact-tier scoring is TRUE fp32 against the
    dequantized table (scales folded into the queries by the caller)."""

    def _run(self, exact):
        rng = np.random.default_rng(4)
        n_pad, dim, qb, p = 4096, 256, 16, 5000
        r, cap = stream_kernel.KERNEL_TILE_ROWS, stream_kernel.KERNEL_CAP
        table = rng.integers(-127, 128, size=(n_pad, dim // 128, 128)).astype(
            np.int8
        )
        q = rng.normal(size=(qb, dim)).astype(np.float32)
        rows = rng.integers(0, n_pad, size=p).astype(np.int64)
        qno = rng.integers(0, qb, size=p).astype(np.int64)
        cand, tile_idx, slot = scoring.build_streamed_layout(
            rows, qno, n_pad, qb, r=r, cap=cap
        )
        outs = stream_kernel.stream_select_pairwise(
            table,
            q,
            cand.reshape(cand.shape[0], cap // 128, 128),
            tile_idx,
            r=r,
            interpret=True,
            exact=exact,
        )
        got = np.asarray(outs).reshape(-1)[slot]
        expected = np.einsum(
            "pd,pd->p",
            table.reshape(n_pad, dim)[rows].astype(np.float32),
            q[qno],
        )
        return got, expected

    def test_exact_matches_fp32_dot(self):
        got, expected = self._run(exact=True)
        np.testing.assert_allclose(got, expected, atol=1e-3, rtol=1e-5)

    def test_fast_tier_coarse(self):
        got, expected = self._run(exact=False)
        scale = np.abs(expected).mean()
        self.assertLess(np.abs(got - expected).mean(), 0.02 * scale)
        self.assertGreater(np.corrcoef(got, expected)[0, 1], 0.999)

    def test_auto_routes_int8_when_cap_fits(self):
        """stream_select_auto sends 3D integer tables to the pairwise body
        (cap <= r) and exact-tier output is true fp32."""
        rng = np.random.default_rng(5)
        n_pad, dim, qb, p = 2048, 256, 8, 1200
        r, cap = stream_kernel.KERNEL_TILE_ROWS, stream_kernel.KERNEL_CAP
        table = rng.integers(-127, 128, size=(n_pad, dim // 128, 128)).astype(
            np.int8
        )
        q = rng.normal(size=(qb, dim)).astype(np.float32)
        rows = rng.integers(0, n_pad, size=p).astype(np.int64)
        qno = rng.integers(0, qb, size=p).astype(np.int64)
        cand, tile_idx, slot = scoring.build_streamed_layout(
            rows, qno, n_pad, qb, r=r, cap=cap
        )
        self.assertLessEqual(cap, r)
        outs = stream_kernel.stream_select_auto(
            table,
            np.ascontiguousarray(q.T),
            cand.reshape(cand.shape[0], cap // 128, 128),
            tile_idx,
            r=r,
            interpret=True,
            precision="exact",
        )
        got = np.asarray(outs).reshape(-1)[slot]
        expected = np.einsum(
            "pd,pd->p",
            table.reshape(n_pad, dim)[rows].astype(np.float32),
            q[qno],
        )
        np.testing.assert_allclose(got, expected, atol=1e-3, rtol=1e-5)


class TestStreamSelectAuto(unittest.TestCase):
    """The auto dispatcher serves exact/high on 2D tables with the
    pairwise body (true fp32 dots) and falls back to the classic kernel
    for the fast tier."""

    def test_high_tier_is_true_fp32(self):
        rng = np.random.default_rng(3)
        n_pad, dim, qb, p = 2048, 256, 16, 1500
        r, cap = stream_kernel.KERNEL_TILE_ROWS, stream_kernel.KERNEL_CAP
        table = rng.normal(size=(n_pad, dim)).astype(np.float32)
        q = rng.normal(size=(qb, dim)).astype(np.float32)
        rows = rng.integers(0, n_pad, size=p).astype(np.int64)
        qno = rng.integers(0, qb, size=p).astype(np.int64)
        cand, tile_idx, slot = scoring.build_streamed_layout(
            rows, qno, n_pad, qb, r=r, cap=cap
        )
        q_t = np.ascontiguousarray(q.T)
        expected = np.einsum("pd,pd->p", table[rows], q[qno])
        for precision, tol in (("high", 1e-4), ("exact", 1e-4), ("fast", None)):
            outs = stream_kernel.stream_select_auto(
                table,
                q_t,
                cand.reshape(cand.shape[0], cap // 128, 128),
                tile_idx,
                r=r,
                interpret=True,
                precision=precision,
            )
            got = np.asarray(outs).reshape(-1)[slot]
            if tol is not None:
                np.testing.assert_allclose(got, expected, atol=tol, rtol=1e-5)
            else:
                self.assertGreater(np.corrcoef(got, expected)[0, 1], 0.999)


class TestStreamKernelPQInterpret(unittest.TestCase):
    """Fused Pallas streamed-ADC kernel vs numpy decode-then-dot."""

    def _run(self, k_reduce=None, precision="exact"):
        import jax.numpy as jnp

        from fastforward_tpu.ops import stream_kernel_pq as skpq

        rng = np.random.default_rng(3)
        n_pad, m, ks, ds, qb, p = 2048, 16, 16, 8, 8, 3000
        r = skpq.KERNEL_PQ_TILE_ROWS
        codes = rng.integers(0, ks, size=(n_pad, m)).astype(np.uint8)
        cb = rng.normal(size=(m, ks, ds)).astype(np.float32)
        q = rng.normal(size=(qb, m * ds)).astype(np.float32)
        rows = rng.integers(0, n_pad, size=p).astype(np.int64)
        qno = rng.integers(0, qb, size=p).astype(np.int64)
        cap = 512
        cand, tile_idx, slot = scoring.build_streamed_layout(
            rows, qno, n_pad, qb, r=r, cap=cap
        )
        codes_p = scoring._pad_pq_codes(jnp.asarray(codes), skpq.M_PAD)
        bd_hi, bd_mid, bd_lo = skpq.build_blockdiag_codebooks(cb)
        outs = skpq.stream_select_pq(
            codes_p,
            jnp.asarray(bd_hi),
            jnp.asarray(bd_mid),
            jnp.asarray(bd_lo),
            np.ascontiguousarray(q.T),
            cand.reshape(cand.shape[0], cap // 128, 128),
            tile_idx,
            m=m,
            r=r,
            interpret=True,
            precision=precision,
        )
        got = np.asarray(outs).reshape(-1)[slot]
        deq = cb[np.arange(m)[None, :], codes[rows]]  # (p, m, ds)
        expected = np.einsum(
            "pmd,pmd->p", deq, q.reshape(qb, m, ds)[qno]
        )
        return got, expected

    def _run_pairwise(self, exact):
        import jax.numpy as jnp

        from fastforward_tpu.ops import stream_kernel_pq as skpq

        rng = np.random.default_rng(3)
        n_pad, m, ks, ds, qb, p = 2048, 16, 16, 8, 8, 3000
        r = skpq.KERNEL_PQ_TILE_ROWS
        codes = rng.integers(0, ks, size=(n_pad, m)).astype(np.uint8)
        cb = rng.normal(size=(m, ks, ds)).astype(np.float32)
        q = rng.normal(size=(qb, m * ds)).astype(np.float32)
        rows = rng.integers(0, n_pad, size=p).astype(np.int64)
        qno = rng.integers(0, qb, size=p).astype(np.int64)
        cap = 512
        cand, tile_idx, slot = scoring.build_streamed_layout(
            rows, qno, n_pad, qb, r=r, cap=cap
        )
        codes_p = scoring._pad_pq_codes(jnp.asarray(codes), skpq.M_PAD)
        bd_hi, bd_mid, bd_lo = skpq.build_blockdiag_codebooks(cb)
        outs = skpq.stream_select_pq_pairwise(
            codes_p,
            jnp.asarray(bd_hi),
            jnp.asarray(bd_mid),
            jnp.asarray(bd_lo),
            q,
            cand.reshape(cand.shape[0], cap // 128, 128),
            tile_idx,
            m=m,
            r=r,
            interpret=True,
            exact=exact,
        )
        got = np.asarray(outs).reshape(-1)[slot]
        deq = cb[np.arange(m)[None, :], codes[rows]]  # (p, m, ds)
        expected = np.einsum(
            "pmd,pmd->p", deq, q.reshape(qb, m, ds)[qno]
        )
        return got, expected

    def test_matches_decode_dot(self):
        """exact tier: hi/mid/lo codebook split reconstructs fp32 — parity
        with the numpy decode-then-dot at fp32 rounding level (a two-part
        split leaves ~1e-5 relative error and needed atol=1e-3 here)."""
        got, expected = self._run()
        np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-6)

    def test_pairwise_exact_matches_decode_dot(self):
        """Pairwise ADC exact tier: select rows' codes, dequantize only
        the candidates, true fp32 dots."""
        got, expected = self._run_pairwise(exact=True)
        np.testing.assert_allclose(got, expected, atol=1e-5, rtol=1e-6)

    def test_auto_dispatch_all_tiers(self):
        """The auto wrapper (transposed-query signature, as the scoring
        finalizers call it) hits fp32 parity on exact AND high (both map
        to pairwise true-fp32 when cap <= r) and tracks on fast."""
        import jax.numpy as jnp

        from fastforward_tpu.ops import stream_kernel_pq as skpq

        rng = np.random.default_rng(3)
        n_pad, m, ks, ds, qb, p = 2048, 16, 16, 8, 8, 3000
        r = skpq.KERNEL_PQ_TILE_ROWS
        codes = rng.integers(0, ks, size=(n_pad, m)).astype(np.uint8)
        cb = rng.normal(size=(m, ks, ds)).astype(np.float32)
        q = rng.normal(size=(qb, m * ds)).astype(np.float32)
        rows = rng.integers(0, n_pad, size=p).astype(np.int64)
        qno = rng.integers(0, qb, size=p).astype(np.int64)
        cap = 512
        cand, tile_idx, slot = scoring.build_streamed_layout(
            rows, qno, n_pad, qb, r=r, cap=cap
        )
        self.assertLessEqual(cap, r)  # routes to the pairwise body
        codes_p = scoring._pad_pq_codes(jnp.asarray(codes), skpq.M_PAD)
        bd_hi, bd_mid, bd_lo = skpq.build_blockdiag_codebooks(cb)
        deq = cb[np.arange(m)[None, :], codes[rows]]
        expected = np.einsum("pmd,pmd->p", deq, q.reshape(qb, m, ds)[qno])
        for precision, tol in (("exact", 1e-5), ("high", 1e-5), ("fast", None)):
            outs = skpq.stream_select_pq_auto(
                codes_p,
                jnp.asarray(bd_hi),
                jnp.asarray(bd_mid),
                jnp.asarray(bd_lo),
                jnp.asarray(np.ascontiguousarray(q.T)),
                cand.reshape(cand.shape[0], cap // 128, 128),
                tile_idx,
                m=m,
                r=r,
                interpret=True,
                precision=precision,
            )
            got = np.asarray(outs).reshape(-1)[slot]
            if tol is not None:
                np.testing.assert_allclose(got, expected, atol=tol, rtol=1e-6)
            else:
                self.assertGreater(np.corrcoef(got, expected)[0, 1], 0.999)

    def test_pairwise_fast_tier_coarse(self):
        got, expected = self._run_pairwise(exact=False)
        scale = np.abs(expected).mean()
        self.assertLess(np.abs(got - expected).mean(), 0.01 * scale)
        self.assertGreater(np.corrcoef(got, expected)[0, 1], 0.999)

    def test_high_tier_single_pass_dequant(self):
        """precision != "exact" keeps only the hi codebook pass: the
        dequantized centroids are bf16-rounded (~0.4% relative) — noise
        next to the PQ quantization error, a third of the dequantize
        FLOPs."""
        got, expected = self._run(precision="high")
        scale = np.abs(expected).mean()
        self.assertLess(np.abs(got - expected).mean(), 0.01 * scale)
        self.assertGreater(np.corrcoef(got, expected)[0, 1], 0.999)

    def test_fused_finalize_with_k_reduce(self):
        """Kernel + slot gather + masked MAXP reduce as one program."""
        import jax.numpy as jnp

        from fastforward_tpu.ops import stream_kernel_pq as skpq

        rng = np.random.default_rng(4)
        n_pad, m, ks, ds, qb = 2048, 16, 16, 8, 8
        pairs, k = 600, 2
        r = skpq.KERNEL_PQ_TILE_ROWS
        codes = rng.integers(0, ks, size=(n_pad, m)).astype(np.uint8)
        cb = rng.normal(size=(m, ks, ds)).astype(np.float32)
        q = rng.normal(size=(qb, m * ds)).astype(np.float32)
        rows = rng.integers(0, n_pad, size=pairs * k).astype(np.int64)
        qno = np.repeat(
            rng.integers(0, qb, size=pairs).astype(np.int64), k
        )
        cap = 512
        cand, tile_idx, slot = scoring.build_streamed_layout(
            rows, qno, n_pad, qb, r=r, cap=cap
        )
        codes_p = scoring._pad_pq_codes(jnp.asarray(codes), skpq.M_PAD)
        bd_hi, bd_mid, bd_lo = skpq.build_blockdiag_codebooks(cb)
        counts = jnp.asarray(np.full(pairs, k, dtype=np.int32))

        # interpret mode must be forced through the inner kernel: call the
        # fused program's stages by hand (jit of pallas interpret is fine)
        outs = skpq.stream_select_pq(
            codes_p, jnp.asarray(bd_hi), jnp.asarray(bd_mid),
            jnp.asarray(bd_lo),
            np.ascontiguousarray(q.T),
            cand.reshape(cand.shape[0], cap // 128, 128),
            tile_idx, m=m, r=r, interpret=True,
        )
        picked = np.asarray(outs).reshape(-1)[slot].reshape(pairs, k)
        got = picked.max(axis=1)
        deq = cb[np.arange(m)[None, :], codes[rows]]
        exp_rows = np.einsum("pmd,pmd->p", deq, q.reshape(qb, m, ds)[qno])
        expected = exp_rows.reshape(pairs, k).max(axis=1)
        np.testing.assert_allclose(got, expected, atol=1e-3, rtol=1e-4)
        del counts


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
