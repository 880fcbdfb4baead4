"""Beyond-HBM hybrid tier: parity with the plain device table.

A tiny ``hbm_budget`` forces small corpora through the hybrid path
(resident prefix + host-streamed candidate blocks, ``ops.host_stream``),
so every assertion here compares against the normal full-HBM scoring of
the same data (SURVEY.md §7 step 5).
"""

import tempfile
import unittest
from pathlib import Path

import numpy as np

from fastforward_tpu.encoder import LambdaEncoder
from fastforward_tpu.index import InMemoryIndex, Mode, OnDiskIndex
from fastforward_tpu.ranking import Ranking

RNG = np.random.default_rng(123)
N, DIM = 6000, 128
CORPUS = RNG.normal(size=(N, DIM)).astype(np.float32)
QVECS = {
    "a": RNG.normal(size=DIM).astype(np.float32),
    "b": RNG.normal(size=DIM).astype(np.float32),
    "c": RNG.normal(size=DIM).astype(np.float32),
}
ENC = LambdaEncoder(lambda q: QVECS[q])
#: 1 MiB: resident prefix = 1024 rows at dim 128 fp32, ~5 streamed chunks
BUDGET = 1 << 20


def _psg_index(**kwargs):
    index = InMemoryIndex(ENC, mode=Mode.PASSAGE, **kwargs)
    index.add(CORPUS, psg_ids=[f"p{i}" for i in range(N)])
    return index


def _doc_index(**kwargs):
    index = InMemoryIndex(ENC, mode=Mode.MAXP, **kwargs)
    index.add(CORPUS, doc_ids=[f"d{i // 4}" for i in range(N)])
    return index


def _psg_ranking(step_a=3, step_b=7):
    run = {
        "q1": {f"p{i}": float(i) for i in range(0, N, step_a)},
        "q2": {f"p{i}": float(i) for i in range(1, N, step_b)},
    }
    return Ranking.from_run(run, queries={"q1": "a", "q2": "b"})


def _doc_ranking():
    run = {
        "q1": {f"d{i}": float(i) for i in range(0, N // 4, 2)},
        "q2": {f"d{i}": float(i) for i in range(0, N // 4, 5)},
    }
    return Ranking.from_run(run, queries={"q1": "a", "q2": "b"})


class TestHybridTier(unittest.TestCase):
    def test_forced_hybrid_view(self):
        hybrid = _psg_index(hbm_budget=BUDGET, stream_chunk_rows=1024)
        view = hybrid._device_view()
        self.assertEqual(view.kind, "hybrid")
        self.assertGreater(view.tail_start, 0)
        self.assertEqual(
            view.tail_start + view.host_tail.shape[0], N
        )

    def test_passage_parity_cold_and_warm(self):
        ref = _psg_index()
        hybrid = _psg_index(hbm_budget=BUDGET, stream_chunk_rows=1024)
        ranking = _psg_ranking()
        expected = ref(ranking)
        self.assertEqual(expected, hybrid(ranking))  # cold
        self.assertEqual(expected, hybrid(ranking))  # warm plan
        # exact score agreement, not just rank agreement
        a, b = expected["q1"], hybrid(ranking)["q1"]
        self.assertEqual(0.0, max(abs(a[k] - b[k]) for k in a))

    def test_doc_modes_parity(self):
        ref = _doc_index()
        hybrid = _doc_index(hbm_budget=BUDGET, stream_chunk_rows=1024)
        ranking = _doc_ranking()
        for mode in (Mode.MAXP, Mode.AVEP, Mode.FIRSTP):
            ref.mode = mode
            hybrid.mode = mode
            self.assertEqual(ref(ranking), hybrid(ranking), mode)
            self.assertEqual(ref(ranking), hybrid(ranking), mode)  # warm

    def test_zero_resident_prefix(self):
        """A budget too small for even one resident block streams all rows."""
        hybrid = _psg_index(hbm_budget=100_000, stream_chunk_rows=1024)
        view = hybrid._device_view()
        self.assertEqual(view.kind, "hybrid")
        self.assertEqual(view.tail_start, 0)
        self.assertEqual(_psg_index()(_psg_ranking()), hybrid(_psg_ranking()))

    def test_sparse_candidates_parity(self):
        """Few candidates (the early-stopping regime) take the gather path.

        The gather-dot and streaming formulations reduce in different
        orders, so scores agree to fp32 tolerance, not bitwise.
        """
        ref = _psg_index()
        hybrid = _psg_index(hbm_budget=BUDGET, stream_chunk_rows=1024)
        run = {"q1": {f"p{i}": float(i) for i in range(0, N, 500)}}
        ranking = Ranking.from_run(run, queries={"q1": "a"})
        a, b = ref(ranking)["q1"], hybrid(ranking)["q1"]
        self.assertEqual(set(a), set(b))
        for key in a:
            self.assertAlmostEqual(a[key], b[key], places=4, msg=key)

    def test_early_stopping_parity(self):
        ref = _psg_index()
        hybrid = _psg_index(hbm_budget=BUDGET, stream_chunk_rows=1024)
        ranking = _psg_ranking()
        kwargs = dict(
            early_stopping=10,
            early_stopping_alpha=0.5,
            early_stopping_depths=(50, 500, 2000),
        )
        self.assertEqual(ref(ranking, **kwargs), hybrid(ranking, **kwargs))

    def test_batched_queries_parity(self):
        ref = _psg_index()
        hybrid = _psg_index(hbm_budget=BUDGET, stream_chunk_rows=1024)
        ranking = _psg_ranking()
        self.assertEqual(
            ref(ranking), hybrid(ranking, batch_size=1)
        )

    def test_device_block_cache_within_budget(self):
        """Warm plans keep tail blocks device-resident up to the leftover
        budget — results must be identical either way."""
        hybrid = _psg_index(hbm_budget=BUDGET, stream_chunk_rows=1024)
        ranking = _psg_ranking()
        first = hybrid(ranking)
        plan = next(iter(hybrid._plans.values()))
        chunks = plan["hybrid"]["chunks"]
        self.assertTrue(chunks)
        cached = [c for c in chunks if "block_dev" in c]
        self.assertTrue(cached, "no block was cached despite leftover budget")
        view = hybrid._device_view()
        self.assertLessEqual(
            sum(c["block_dev"].nbytes for c in cached),
            view.tail_cache_budget,
        )
        self.assertEqual(first, hybrid(ranking))

    def test_add_invalidates_hybrid_view(self):
        hybrid = _psg_index(hbm_budget=BUDGET, stream_chunk_rows=1024)
        ranking = _psg_ranking()
        hybrid(ranking)
        extra = RNG.normal(size=(8, DIM)).astype(np.float32)
        hybrid.add(extra, psg_ids=[f"x{i}" for i in range(8)])
        run = {"q1": {"x0": 1.0, "p0": 2.0}}
        r = hybrid(Ranking.from_run(run, queries={"q1": "a"}))
        self.assertAlmostEqual(
            r["q1"]["x0"], float(extra[0] @ QVECS["a"]), places=3
        )

    def test_rejects_store_device_and_mesh(self):
        with self.assertRaises(ValueError):
            InMemoryIndex(ENC, store="device", hbm_budget=BUDGET)
        from fastforward_tpu.parallel.mesh import MeshConfig

        with self.assertRaises(ValueError):
            InMemoryIndex(
                ENC, mesh_config=MeshConfig(shard=2), hbm_budget=BUDGET
            )


class TestHybridOnDisk(unittest.TestCase):
    @classmethod
    def setUpClass(cls):
        cls.tmp = tempfile.mkdtemp()
        cls.path = Path(cls.tmp) / "hybrid.h5"
        index = OnDiskIndex(cls.path, ENC, mode=Mode.PASSAGE)
        index.add(CORPUS, psg_ids=[f"p{i}" for i in range(N)])

    @classmethod
    def tearDownClass(cls):
        import shutil

        shutil.rmtree(cls.tmp, ignore_errors=True)

    def test_disk_hybrid_parity(self):
        ref = OnDiskIndex.load(
            self.path, ENC, mode=Mode.PASSAGE, hbm_cache=True
        )
        hybrid = OnDiskIndex.load(
            self.path,
            ENC,
            mode=Mode.PASSAGE,
            hbm_cache=True,
            hbm_budget=BUDGET,
            stream_chunk_rows=1024,
        )
        ranking = _psg_ranking()
        self.assertEqual(hybrid._device_view().kind, "hybrid")
        expected = ref(ranking)
        self.assertEqual(expected, hybrid(ranking))
        self.assertEqual(expected, hybrid(ranking))  # warm


if __name__ == "__main__":
    unittest.main()
