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


if __name__ == "__main__":
    unittest.main()
