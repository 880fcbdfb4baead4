"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import unittest

import numpy as np

from fastforward_tpu.encoder import LambdaEncoder
from fastforward_tpu.index import InMemoryIndex, Mode
from fastforward_tpu.parallel import MeshConfig
from fastforward_tpu.ranking import Ranking

RNG = np.random.default_rng(11)
DIM = 128


def _build(mesh_config, mode):
    qvec = RNG.normal(size=DIM).astype(np.float32)
    enc = LambdaEncoder(lambda _: qvec)
    index = InMemoryIndex(enc, mode=mode, mesh_config=mesh_config)
    n = 200
    vectors = RNG.normal(size=(n, DIM)).astype(np.float32)
    doc_ids = [f"d{i // 4}" for i in range(n)]
    psg_ids = [f"p{i}" for i in range(n)]
    index.add(vectors, doc_ids=doc_ids, psg_ids=psg_ids)
    return index, vectors, qvec


class TestShardedScoring(unittest.TestCase):
    def _compare(self, mesh_config):
        """Sharded scoring must equal single-device scoring for every mode."""
        run = {
            "q1": {f"d{i}": float(i) for i in range(40)},
            "q2": {f"d{i}": float(50 - i) for i in range(10, 50)},
        }
        queries = {"q1": "a", "q2": "b"}
        ranking = Ranking.from_run(run, queries=queries)
        psg_run = {"q1": {f"p{i}": float(i) for i in range(60)}}
        psg_ranking = Ranking.from_run(psg_run, queries={"q1": "a"})

        for mode, r in [
            (Mode.MAXP, ranking),
            (Mode.AVEP, ranking),
            (Mode.FIRSTP, ranking),
            (Mode.PASSAGE, psg_ranking),
        ]:
            sharded_index, vectors, qvec = _build(mesh_config, mode)
            plain_index = InMemoryIndex(
                sharded_index.query_encoder, mode=mode
            )
            plain_index.add(
                vectors,
                doc_ids=[f"d{i // 4}" for i in range(len(vectors))],
                psg_ids=[f"p{i}" for i in range(len(vectors))],
            )
            got = sharded_index(r)
            expected = plain_index(r)
            for q_id in expected.q_ids:
                g, e = got[q_id], expected[q_id]
                self.assertEqual(set(g), set(e))
                for doc in e:
                    self.assertAlmostEqual(e[doc], g[doc], places=3, msg=(mode, doc))

    def test_shard_only(self):
        self._compare(MeshConfig(data=1, shard=8))

    def test_data_and_shard(self):
        self._compare(MeshConfig(data=2, shard=4))

    def test_data_only(self):
        self._compare(MeshConfig(data=8, shard=1))

    def test_mesh_config_validation(self):
        with self.assertRaises(ValueError):
            MeshConfig(data=16, shard=16).build()


class TestShardedQuantized(unittest.TestCase):
    def test_scalar_quantizer_sharded_parity(self):
        """int8 codes shard row-wise; scores match the unsharded index."""
        from fastforward_tpu.quantizer import ScalarQuantizer

        data = RNG.normal(size=(200, DIM)).astype(np.float32)
        qvec = RNG.normal(size=DIM).astype(np.float32)
        enc = LambdaEncoder(lambda _: qvec)
        run = {"q1": {f"p{i}": float(i) for i in range(120)}}
        ranking = Ranking.from_run(run, queries={"q1": "a"})

        results = []
        for mesh_config in (None, MeshConfig(data=2, shard=4)):
            quantizer = ScalarQuantizer()
            quantizer.fit(data)
            index = InMemoryIndex(
                enc,
                quantizer=quantizer,
                mode=Mode.PASSAGE,
                mesh_config=mesh_config,
            )
            index.add(data, psg_ids=[f"p{i}" for i in range(200)])
            results.append(index(ranking)["q1"])
            if mesh_config is not None:
                self.assertIsNotNone(index._device_view().mesh)
        plain, sharded = results
        self.assertEqual(set(plain), set(sharded))
        for pid in plain:
            self.assertAlmostEqual(plain[pid], sharded[pid], places=3, msg=pid)

    def test_disk_hbm_cache_sharded(self):
        """OnDiskIndex(hbm_cache, mesh_config) shards the cached table and
        matches the unsharded on-disk scores (dense and scalar-quantized);
        str paths are accepted."""
        import shutil
        import tempfile

        from fastforward_tpu.index import OnDiskIndex
        from fastforward_tpu.quantizer import ScalarQuantizer

        tmp = tempfile.mkdtemp()
        try:
            data = RNG.normal(size=(150, DIM)).astype(np.float32)
            qvec = RNG.normal(size=DIM).astype(np.float32)
            enc = LambdaEncoder(lambda _: qvec)
            run = {"q1": {f"p{i}": float(i) for i in range(100)}}
            ranking = Ranking.from_run(run, queries={"q1": "a"})

            for tag, quantizer in [("dense", None), ("scalar", ScalarQuantizer())]:
                if quantizer is not None:
                    quantizer.fit(data)
                results = []
                for mesh_config in (None, MeshConfig(data=1, shard=8)):
                    index = OnDiskIndex(
                        f"{tmp}/{tag}_{mesh_config is not None}.h5",
                        enc,
                        quantizer=quantizer,
                        mode=Mode.PASSAGE,
                        hbm_cache=True,
                        mesh_config=mesh_config,
                    )
                    index.add(data, psg_ids=[f"p{i}" for i in range(150)])
                    results.append(index(ranking)["q1"])
                    if mesh_config is not None:
                        self.assertIsNotNone(index._device_view().mesh, tag)
                plain, sharded = results
                for pid in plain:
                    self.assertAlmostEqual(
                        plain[pid], sharded[pid], places=3, msg=(tag, pid)
                    )
        finally:
            shutil.rmtree(tmp)

    def _pq_parity(self, make_quantizer, mode=Mode.PASSAGE, sparse=False):
        """PQ-sharded scores must equal PQ-single-device scores exactly
        (identical codes + codebooks; the ADC math is the same program)."""
        data = RNG.normal(size=(200, DIM)).astype(np.float32)
        qvec = RNG.normal(size=DIM).astype(np.float32)
        enc = LambdaEncoder(lambda _: qvec)
        if mode == Mode.PASSAGE:
            ids = {"psg_ids": [f"p{i}" for i in range(200)]}
            prefix = "p"
            num = 120 if not sparse else 3
        else:
            ids = {"doc_ids": [f"d{i // 4}" for i in range(200)]}
            prefix = "d"
            num = 40 if not sparse else 2
        run = {"q1": {f"{prefix}{i}": float(i) for i in range(num)}}
        ranking = Ranking.from_run(run, queries={"q1": "a"})

        results = []
        for mesh_config in (None, MeshConfig(data=2, shard=4)):
            quantizer = make_quantizer()
            quantizer.fit(data)
            index = InMemoryIndex(
                enc, quantizer=quantizer, mode=mode, mesh_config=mesh_config
            )
            index.add(data, **ids)
            results.append(index(ranking)["q1"])
            if mesh_config is not None:
                view = index._device_view()
                self.assertIsNotNone(view.mesh)
                self.assertEqual("pq", view.kind)
        plain, sharded = results
        self.assertEqual(set(plain), set(sharded))
        for pid in plain:
            self.assertAlmostEqual(plain[pid], sharded[pid], places=3, msg=pid)

    def test_pq_sharded_parity_streamed(self):
        """Dense candidate sets: the per-shard streamed-ADC program."""
        from fastforward_tpu.quantizer import PQ

        self._pq_parity(lambda: PQ(8, 16))

    def test_pq_sharded_parity_gather(self):
        """Sparse candidate sets fall to the gather-ADC + psum program."""
        from fastforward_tpu.quantizer import PQ

        self._pq_parity(lambda: PQ(8, 16), sparse=True)

    def test_pq_sharded_parity_maxp(self):
        """Multi-passage docs: masked K-axis reduction after the psum."""
        from fastforward_tpu.quantizer import PQ

        self._pq_parity(lambda: PQ(8, 16), mode=Mode.MAXP)

    def test_opq_sharded_parity(self):
        """OPQ: the rotation folds into the replicated queries."""
        from fastforward_tpu.quantizer import OPQ

        self._pq_parity(lambda: OPQ(8, 16, opq_iters=2))

    def test_dense_sharded_streamed_device_reduce(self):
        """Large-enough tables route dense candidate sets through the
        per-shard streamed program; the slot gather and (for doc modes)
        the K reduction run on device — only ``P`` floats cross the host
        link.  Parity vs the unsharded index, and the streamed plan keys
        prove which path ran."""
        n = 8192  # n_local = 1024 per shard: tile-aligned for streaming
        vectors = RNG.normal(size=(n, DIM)).astype(np.float32)
        qvec = RNG.normal(size=DIM).astype(np.float32)
        enc = LambdaEncoder(lambda _: qvec)
        doc_ids = [f"d{i // 4}" for i in range(n)]
        psg_ids = [f"p{i}" for i in range(n)]
        doc_run = {
            "q1": {f"d{i}": float(i) for i in range(400)},
            "q2": {f"d{i}": float(i) for i in range(100, 500)},
        }
        psg_run = {"q1": {f"p{i}": float(i) for i in range(1200)}}
        queries = {"q1": "a", "q2": "b"}

        for mode, run in [
            (Mode.MAXP, doc_run),
            (Mode.AVEP, doc_run),
            (Mode.PASSAGE, psg_run),
        ]:
            ranking = Ranking.from_run(
                run, queries={q: queries[q] for q in run}
            )
            sharded = InMemoryIndex(
                enc, mode=mode, mesh_config=MeshConfig(data=1, shard=8)
            )
            sharded.add(vectors, doc_ids=doc_ids, psg_ids=psg_ids)
            plain = InMemoryIndex(enc, mode=mode)
            plain.add(vectors, doc_ids=doc_ids, psg_ids=psg_ids)
            got = sharded(ranking)
            plan = next(iter(sharded._plans.values()))
            self.assertIn("stream_sharded", plan, mode)  # streamed path ran
            self.assertIn("stream_sharded_slot", plan, mode)  # device gather
            expected = plain(ranking)
            for q_id in expected.q_ids:
                g, e = got[q_id], expected[q_id]
                self.assertEqual(set(g), set(e), mode)
                for doc in e:
                    self.assertAlmostEqual(
                        e[doc], g[doc], places=3, msg=(mode, doc)
                    )
            # warm call reuses the cached grids and stays correct
            self.assertEqual(got, sharded(ranking), mode)

    def test_device_store_sharded(self):
        """store='device' composes with mesh_config: the growable buffer is
        allocated row-sharded, donated appends run SPMD, and no host mirror
        ever exists — parity vs the unsharded host-store index (dense and
        int8), including growth across the allocation boundary."""
        from fastforward_tpu.quantizer import ScalarQuantizer

        n = 300
        vectors = RNG.normal(size=(n, DIM)).astype(np.float32)
        qvec = RNG.normal(size=DIM).astype(np.float32)
        enc = LambdaEncoder(lambda _: qvec)
        run = {"q1": {f"p{i}": float(i) for i in range(200)}}
        ranking = Ranking.from_run(run, queries={"q1": "a"})

        for tag, make_q in [("dense", lambda: None), ("int8", ScalarQuantizer)]:
            results = []
            for store, mesh_config in [
                ("host", None),
                ("device", MeshConfig(data=2, shard=4)),
            ]:
                quantizer = make_q()
                if quantizer is not None:
                    quantizer.fit(vectors)
                index = InMemoryIndex(
                    enc,
                    quantizer=quantizer,
                    mode=Mode.PASSAGE,
                    store=store,
                    mesh_config=mesh_config,
                    init_size=128,  # force device-buffer growth mid-add
                    alloc_size=128,
                )
                for i in range(0, n, 100):
                    index.add(
                        vectors[i : i + 100],
                        psg_ids=[f"p{j}" for j in range(i, i + 100)],
                    )
                results.append(index(ranking)["q1"])
                if mesh_config is not None:
                    view = index._device_view()
                    self.assertIsNotNone(view.mesh, tag)
                    self.assertIsNone(index._store, tag)  # no host mirror
            plain, sharded = results
            self.assertEqual(set(plain), set(sharded), tag)
            for pid in plain:
                self.assertAlmostEqual(
                    plain[pid], sharded[pid], places=3, msg=(tag, pid)
                )

    def test_pq_disk_hbm_cache_sharded(self):
        """OnDiskIndex(hbm_cache, mesh_config) with PQ codes."""
        import shutil
        import tempfile

        from fastforward_tpu.index import OnDiskIndex
        from fastforward_tpu.quantizer import PQ

        tmp = tempfile.mkdtemp()
        try:
            data = RNG.normal(size=(150, DIM)).astype(np.float32)
            qvec = RNG.normal(size=DIM).astype(np.float32)
            enc = LambdaEncoder(lambda _: qvec)
            run = {"q1": {f"p{i}": float(i) for i in range(100)}}
            ranking = Ranking.from_run(run, queries={"q1": "a"})
            results = []
            for mesh_config in (None, MeshConfig(data=1, shard=8)):
                quantizer = PQ(8, 16)
                quantizer.fit(data)
                index = OnDiskIndex(
                    f"{tmp}/pq_{mesh_config is not None}.h5",
                    enc,
                    quantizer=quantizer,
                    mode=Mode.PASSAGE,
                    hbm_cache=True,
                    mesh_config=mesh_config,
                )
                index.add(data, psg_ids=[f"p{i}" for i in range(150)])
                results.append(index(ranking)["q1"])
                if mesh_config is not None:
                    self.assertIsNotNone(index._device_view().mesh)
            plain, sharded = results
            for pid in plain:
                self.assertAlmostEqual(plain[pid], sharded[pid], places=3, msg=pid)
        finally:
            shutil.rmtree(tmp)


class TestShardedRagged(unittest.TestCase):
    def test_ragged_documents_over_group_k(self):
        """Documents with more passages than ``_MAX_GROUP_K`` score on the
        mesh via the chunked-K fallback and match the single-device result
        (which uses the flat segment program) — the reference handles any
        raggedness in every configuration."""
        from fastforward_tpu.index.base import Index

        n = 400
        big = Index._MAX_GROUP_K + 36  # 100-passage document
        mid = Index._MAX_GROUP_K + 6
        vectors = RNG.normal(size=(n, DIM)).astype(np.float32)
        qvec = RNG.normal(size=DIM).astype(np.float32)
        enc = LambdaEncoder(lambda _: qvec)
        doc_ids = (
            ["dbig"] * big
            + ["dmid"] * mid
            + [f"d{i // 4}" for i in range(n - big - mid)]
        )
        run = {
            "q1": {"dbig": 9.0, "dmid": 8.0, "d0": 7.0, "d5": 6.0},
            "q2": {"dmid": 5.0, "d1": 4.0, "dbig": 3.0},
        }
        queries = {"q1": "a", "q2": "b"}

        for mode in (Mode.MAXP, Mode.AVEP, Mode.FIRSTP):
            ranking = Ranking.from_run(run, queries=queries)
            sharded = InMemoryIndex(
                enc, mode=mode, mesh_config=MeshConfig(data=2, shard=4)
            )
            sharded.add(vectors, doc_ids=doc_ids)
            plain = InMemoryIndex(enc, mode=mode)
            plain.add(vectors, doc_ids=doc_ids)
            got = sharded(ranking)
            expected = plain(ranking)
            for q_id in expected.q_ids:
                g, e = got[q_id], expected[q_id]
                self.assertEqual(set(g), set(e), mode)
                for doc in e:
                    self.assertAlmostEqual(
                        e[doc], g[doc], places=3, msg=(mode, doc)
                    )


class TestShardedEarlyStopping(unittest.TestCase):
    def test_early_stopping_sharded_parity(self):
        """ES on a mesh-sharded index matches the unsharded ES result."""
        kwargs = dict(
            early_stopping=5,
            early_stopping_alpha=0.3,
            early_stopping_depths=(20, 120),
        )
        run = {
            f"q{j}": {f"p{i}": float(120 - i) for i in range(120)}
            for j in range(3)
        }
        queries = {f"q{j}": "x" for j in range(3)}
        sharded_index, vectors, qvec = _build(
            MeshConfig(data=2, shard=4), Mode.PASSAGE
        )
        plain_index = InMemoryIndex(
            sharded_index.query_encoder, mode=Mode.PASSAGE
        )
        plain_index.add(
            vectors,
            doc_ids=[f"d{i // 4}" for i in range(len(vectors))],
            psg_ids=[f"p{i}" for i in range(len(vectors))],
        )
        results = []
        for index in (plain_index, sharded_index):
            ranking = Ranking.from_run(run, queries=queries)
            out = index(ranking, **kwargs)
            # repeat on the same ranking: the warm path (cached ES state +
            # categorical assembly) must agree with the first call
            again = index(ranking, **kwargs)
            self.assertEqual(out, again)
            results.append(out)
        plain, sharded = results
        self.assertEqual(set(plain.q_ids), set(sharded.q_ids))
        for q_id in plain.q_ids:
            p, s = plain[q_id], sharded[q_id]
            self.assertEqual(set(p), set(s))
            for pid in p:
                self.assertAlmostEqual(p[pid], s[pid], places=3, msg=pid)


class TestShardedHybrid(unittest.TestCase):
    """hbm_budget x mesh_config: the sharded beyond-HBM hybrid tier.

    The resident prefix row-shards over the mesh (capacity = chips x
    per-chip budget) and corpora beyond the WHOLE mesh's budget stream a
    host-RAM tail through the default device.  Parity target: the plain
    single-device index over the same data/quantizer (reference serves
    arbitrary N from disk in every configuration,
    reference: ``index/disk.py:309-336``).
    """

    #: per-shard resident blocks align to 1024 rows; shard=4 needs > 4096
    #: rows resident + a real tail
    N = 12288
    MESH = dict(data=2, shard=4)

    @classmethod
    def setUpClass(cls):
        cls.corpus = RNG.normal(size=(cls.N, DIM)).astype(np.float32)
        cls.qvec = RNG.normal(size=DIM).astype(np.float32)
        cls.enc = LambdaEncoder(lambda _: cls.qvec)

    def _pair(self, quantizer_factory, mode, budget):
        out = []
        for kwargs in (
            {},
            dict(
                mesh_config=MeshConfig(**self.MESH),
                hbm_budget=budget,
                stream_chunk_rows=1024,
            ),
        ):
            quantizer = quantizer_factory() if quantizer_factory else None
            if quantizer is not None:
                quantizer.fit(self.corpus[:2048])
            index = InMemoryIndex(
                self.enc, quantizer=quantizer, mode=mode, **kwargs
            )
            if mode == Mode.PASSAGE:
                index.add(
                    self.corpus, psg_ids=[f"p{i}" for i in range(self.N)]
                )
            else:
                index.add(
                    self.corpus, doc_ids=[f"d{i // 4}" for i in range(self.N)]
                )
            out.append(index)
        return out

    def _assert_sharded_hybrid(self, hybrid):
        view = hybrid._device_view()
        self.assertEqual("hybrid", view.kind)
        self.assertIsNotNone(view.mesh)
        self.assertGreater(view.tail_start, 0)
        self.assertGreater(view.host_tail.shape[0], 0)
        return view

    def _assert_parity(self, plain, hybrid, ranking):
        for _round in ("cold", "warm"):
            a, b = plain(ranking), hybrid(ranking)
            for q in a.q_ids:
                ea, eb = a[q], b[q]
                self.assertEqual(set(ea), set(eb), _round)
                for key in ea:
                    self.assertAlmostEqual(
                        ea[key], eb[key], places=3, msg=(_round, key)
                    )

    def test_dense_sharded_hybrid(self):
        plain, hybrid = self._pair(None, Mode.PASSAGE, 1 << 20)
        self._assert_sharded_hybrid(hybrid)
        run = {
            "q1": {f"p{i}": float(i) for i in range(0, self.N, 3)},
            "q2": {f"p{i}": float(i) for i in range(1, self.N, 7)},
        }
        ranking = Ranking.from_run(run, queries={"q1": "a", "q2": "b"})
        self._assert_parity(plain, hybrid, ranking)

    def test_dense_sharded_hybrid_doc_modes(self):
        plain, hybrid = self._pair(None, Mode.MAXP, 1 << 20)
        self._assert_sharded_hybrid(hybrid)
        run = {"q1": {f"d{i}": float(i) for i in range(0, self.N // 4, 2)}}
        ranking = Ranking.from_run(run, queries={"q1": "a"})
        for mode in (Mode.MAXP, Mode.AVEP):
            plain.mode = hybrid.mode = mode
            self._assert_parity(plain, hybrid, ranking)

    def test_dense_sharded_hybrid_sparse(self):
        """Sparse candidates: the gather path over the sharded prefix."""
        plain, hybrid = self._pair(None, Mode.PASSAGE, 1 << 20)
        run = {"q1": {f"p{i}": float(i) for i in range(0, self.N, 700)}}
        ranking = Ranking.from_run(run, queries={"q1": "a"})
        self._assert_parity(plain, hybrid, ranking)

    def test_scalar_sharded_hybrid(self):
        from fastforward_tpu.quantizer import ScalarQuantizer

        plain, hybrid = self._pair(ScalarQuantizer, Mode.PASSAGE, 250_000)
        view = self._assert_sharded_hybrid(hybrid)
        self.assertEqual("scalar", view.hybrid_kind)
        run = {"q1": {f"p{i}": float(i) for i in range(0, self.N, 5)}}
        ranking = Ranking.from_run(run, queries={"q1": "a"})
        self._assert_parity(plain, hybrid, ranking)

    def test_pq_sharded_hybrid(self):
        from fastforward_tpu.quantizer import PQ

        plain, hybrid = self._pair(lambda: PQ(16, 16), Mode.PASSAGE, 40_000)
        view = self._assert_sharded_hybrid(hybrid)
        self.assertEqual("pq", view.hybrid_kind)
        run = {"q1": {f"p{i}": float(i) for i in range(0, self.N, 5)}}
        ranking = Ranking.from_run(run, queries={"q1": "a"})
        self._assert_parity(plain, hybrid, ranking)

    def test_pq_sharded_hybrid_maxp(self):
        from fastforward_tpu.quantizer import PQ

        plain, hybrid = self._pair(lambda: PQ(16, 16), Mode.MAXP, 40_000)
        self._assert_sharded_hybrid(hybrid)
        run = {"q1": {f"d{i}": float(i) for i in range(0, self.N // 4, 3)}}
        ranking = Ranking.from_run(run, queries={"q1": "a"})
        self._assert_parity(plain, hybrid, ranking)

    def test_tail_chunks_spread_across_devices(self):
        """Multi-device tail streaming: with an explicit mesh the tail
        chunks are assigned to the mesh's devices in contiguous ranges
        (upload bandwidth and kernel FLOPs scale with the chip count),
        and the scores still match the single-device index."""
        plain, hybrid = self._pair(None, Mode.PASSAGE, 1 << 20)
        run = {"q1": {f"p{i}": float(i) for i in range(0, self.N, 2)}}
        ranking = Ranking.from_run(run, queries={"q1": "a"})
        self._assert_parity(plain, hybrid, ranking)
        plan = next(iter(hybrid._plans.values()))
        state = plan["hybrid"]
        self.assertIsNotNone(state["devices"])
        devs_used = {c["dev"] for c in state["chunks"]}
        self.assertGreater(len(devs_used), 1, "tail ran on one device")
        self.assertEqual(len(state["dev_ranges"]), len(devs_used))
        # chunk grids live on their assigned devices
        for chunk in state["chunks"]:
            (dev,) = chunk["cand"].devices()
            self.assertEqual(dev, state["devices"][chunk["dev"]])

    def test_early_stopping_on_sharded_hybrid(self):
        plain, hybrid = self._pair(None, Mode.PASSAGE, 1 << 20)
        run = {"q1": {f"p{i}": float(i) for i in range(0, self.N, 3)}}
        ranking = Ranking.from_run(run, queries={"q1": "a"})
        kwargs = dict(
            early_stopping=10,
            early_stopping_alpha=0.5,
            early_stopping_depths=(64, 512, 2048),
        )
        a = plain(ranking, **kwargs)["q1"]
        b = hybrid(ranking, **kwargs)["q1"]
        self.assertEqual(set(a), set(b))
        for key in a:
            self.assertAlmostEqual(a[key], b[key], places=3, msg=key)

    def test_very_ragged_docs_on_sharded_hybrid(self):
        """A >64-passage document on the sharded hybrid view routes through
        chunked-K grouped scoring over the hybrid engine (reference handles
        any raggedness in every configuration, reference:
        ``index/base.py:306-312``)."""
        doc_ids = ["dBIG"] * 100 + [f"d{i}" for i in range(100, self.N)]
        run = {"q1": {"dBIG": 3.0, "d5000": 2.0, f"d{self.N - 1}": 1.0}}
        ranking = Ranking.from_run(run, queries={"q1": "a"})
        results = []
        for kwargs in (
            {},
            dict(
                mesh_config=MeshConfig(**self.MESH),
                hbm_budget=1 << 20,
                stream_chunk_rows=1024,
            ),
        ):
            index = InMemoryIndex(self.enc, mode=Mode.MAXP, **kwargs)
            index.add(self.corpus, doc_ids=doc_ids)
            results.append(index(ranking)["q1"])
        plain, hybrid = results
        self.assertEqual(set(plain), set(hybrid))
        for doc in plain:
            self.assertAlmostEqual(plain[doc], hybrid[doc], places=3, msg=doc)

    def test_whole_mesh_budget_fits_plain_sharded(self):
        """A corpus within chips x budget builds the PLAIN sharded view —
        the hybrid tier only engages beyond the whole mesh's HBM."""
        index = InMemoryIndex(
            self.enc,
            mode=Mode.PASSAGE,
            mesh_config=MeshConfig(**self.MESH),
            hbm_budget=4 << 20,  # 4 chips x 4 MiB >> the 6.3 MB table
        )
        index.add(self.corpus, psg_ids=[f"p{i}" for i in range(self.N)])
        view = index._device_view()
        self.assertEqual("dense", view.kind)
        self.assertIsNotNone(view.mesh)


if __name__ == "__main__":
    unittest.main()
