"""u16 score transport: compact device->host score copies.

``score_transport="u16"`` affine-quantizes per-pair scores on device
(``ops.scoring.encode_scores_u16``) and dequantizes them on the host
during the overlapped fetch, halving the dominant warm-call transfer on
remote-attached serving hosts.  The contract: per-query result order
follows the dequantized scores, and the absolute score error is bounded
by ``score_range / 131070`` (+ fp32 dequant noise).
"""

import unittest

import numpy as np
import jax.numpy as jnp

from fastforward_tpu import ops
from fastforward_tpu.encoder import LambdaEncoder
from fastforward_tpu.index import InMemoryIndex, Mode
from fastforward_tpu.ops import scoring
from fastforward_tpu.parallel import MeshConfig
from fastforward_tpu.ranking import Ranking


class TestEncodeScoresU16(unittest.TestCase):
    def test_round_trip_error_bound(self):
        rng = np.random.default_rng(0)
        scores = (rng.standard_normal(5000) * 30).astype(np.float32)
        packed = np.asarray(ops.encode_scores_u16(jnp.asarray(scores)))
        self.assertEqual(packed.dtype, np.uint16)
        self.assertEqual(packed.shape, (5004,))  # 4-lane in-band header
        decoded = ops.decode_scores_u16(packed)
        bound = (scores.max() - scores.min()) / 131070 + 1e-4
        self.assertLess(np.abs(decoded - scores).max(), bound)

    def test_header_floats_survive_the_u16_bit_split(self):
        scores = np.array([-1234.5678, 0.125, 98765.4], np.float32)
        packed = np.asarray(ops.encode_scores_u16(jnp.asarray(scores)))
        mn, scale = ops.decode_u16_header(packed[:4])
        # header floats are exact bit round-trips, not quantized
        self.assertEqual(np.float32(mn), np.float32(-1234.5678))
        self.assertAlmostEqual(
            scale, (98765.4 - -1234.5678) / 65535.0, places=2
        )

    def test_inf_padding_is_masked_from_calibration(self):
        scores = np.array([-np.inf, 1.0, 2.0, 3.0, -np.inf], np.float32)
        packed = np.asarray(ops.encode_scores_u16(jnp.asarray(scores)))
        decoded = ops.decode_scores_u16(packed)
        self.assertTrue(np.isfinite(decoded).all())
        np.testing.assert_allclose(decoded[1:4], [1.0, 2.0, 3.0], atol=1e-3)

    def test_constant_scores(self):
        scores = np.full(100, 7.25, np.float32)
        packed = np.asarray(ops.encode_scores_u16(jnp.asarray(scores)))
        np.testing.assert_allclose(
            ops.decode_scores_u16(packed), scores, atol=1e-5
        )


def _build(mode=Mode.PASSAGE, n=4096, dim=24, num_q=5, depth=48, seed=0, **kw):
    rng = np.random.default_rng(seed)
    qvecs = rng.standard_normal((num_q, dim)).astype(np.float32)
    by_text = {f"query {i}": qvecs[i] for i in range(num_q)}
    enc = LambdaEncoder(lambda t: by_text[t])
    index = InMemoryIndex(enc, mode=mode, **kw)
    if mode is Mode.PASSAGE:
        corpus = rng.standard_normal((n, dim)).astype(np.float32)
        index.add(corpus, psg_ids=[f"p{i}" for i in range(n)])
        ids = [f"p{i}" for i in range(n)]
    else:
        vecs, doc_ids = [], []
        for d in range(n // 4):
            for _ in range(1 + d % 4):
                vecs.append(rng.standard_normal(dim).astype(np.float32))
                doc_ids.append(f"d{d}")
        index.add(np.stack(vecs), doc_ids=doc_ids)
        ids = sorted(set(doc_ids))
    run = {
        f"q{i}": {
            pid: float(depth - r)
            for r, pid in enumerate(
                rng.choice(ids, size=depth, replace=False)
            )
        }
        for i in range(num_q)
    }
    queries = {f"q{i}": f"query {i}" for i in range(num_q)}
    return index, Ranking.from_run(run, queries=queries)


def _assert_close(test, got: Ranking, want: Ranking):
    """Same structure; scores within the u16 transport bound."""
    w = want._df
    rng_span = float(w["score"].max() - w["score"].min())
    tol = rng_span / 131070 * 2 + 1e-3
    g = got._df
    test.assertEqual(len(g), len(w))
    # compare per (q_id, id) — near-tie orders may legitimately differ
    gm = dict(zip(zip(g["q_id"], g["id"]), g["score"]))
    for q, i, s in zip(w["q_id"], w["id"], w["score"]):
        test.assertAlmostEqual(gm[(q, i)], s, delta=tol)
    # per-query result blocks are sorted by the (dequantized) score desc
    scores = g["score"].to_numpy()
    qids = g["q_id"].to_numpy()
    breaks = np.flatnonzero(qids[1:] != qids[:-1]) + 1
    for blk in np.split(scores, breaks):
        test.assertTrue((np.diff(blk) <= 1e-9).all())


class TestU16Transport(unittest.TestCase):
    def test_passage_mode_close_to_f32(self):
        index, ranking = _build(score_transport="u16")
        index_f32, ranking_f32 = _build()
        _assert_close(self, index(ranking), index_f32(ranking_f32))

    def test_warm_call_and_forced_chunking(self):
        index, ranking = _build(score_transport="u16", seed=1)
        index_f32, ranking_f32 = _build(seed=1)
        want = index_f32(ranking_f32)
        index(ranking)  # builds the plan
        old = scoring._FETCH_CHUNK_MIN
        scoring._FETCH_CHUNK_MIN = 1
        try:
            got = index(ranking)  # warm: overlapped u16 dequant + sinks
        finally:
            scoring._FETCH_CHUNK_MIN = old
        _assert_close(self, got, want)

    def test_maxp_with_inf_padding(self):
        # grouped layout with K > 1: padded K-slots reduce to -inf scores
        # for padded pairs; calibration must ignore them
        index, ranking = _build(mode=Mode.MAXP, score_transport="u16", seed=2)
        index_f32, ranking_f32 = _build(mode=Mode.MAXP, seed=2)
        _assert_close(self, index(ranking), index_f32(ranking_f32))

    def test_submit_pipeline(self):
        index, ranking = _build(score_transport="u16", seed=3)
        want = index(ranking)
        fut = index.submit(ranking)
        self.assertTrue(fut.pipelined)
        got = fut.result()
        self.assertEqual(list(got._df["id"]), list(want._df["id"]))
        np.testing.assert_array_equal(
            got._df["score"].to_numpy(), want._df["score"].to_numpy()
        )

    def test_mesh_sharded_table(self):
        index, ranking = _build(
            score_transport="u16", seed=4, dim=128,
            mesh_config=MeshConfig(shard=4),
        )
        index_f32, ranking_f32 = _build(seed=4, dim=128)
        _assert_close(self, index(ranking), index_f32(ranking_f32))

    def test_invalid_transport_rejected(self):
        with self.assertRaises(ValueError):
            InMemoryIndex(score_transport="u8")


if __name__ == "__main__":
    unittest.main()
