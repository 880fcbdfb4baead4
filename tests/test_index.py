"""Index contract tests, parametrized over backends (SURVEY.md §4).

The abstract ``TestIndex`` runs against any backend; concrete subclasses
instantiate the HBM-resident and HDF5-backed indexes.  Coverage mirrors the
reference's behavioral contract: exact per-mode scores, error cases, early
stopping (incl. depth-order invariance), query batching invariance,
coalescing, iteration round-trips and quantized dimensions.
"""

import itertools
import shutil
import tempfile
import unittest
from collections import defaultdict
from pathlib import Path

import numpy as np
import pandas as pd

from fastforward_tpu.encoder import LambdaEncoder
from fastforward_tpu.index import InMemoryIndex, Mode, OnDiskIndex
from fastforward_tpu.quantizer import NanoPQ
from fastforward_tpu.ranking import Ranking
from fastforward_tpu.utils import create_coalesced_index

DUMMY_QUERIES = {"q1": "query 1", "q2": "query 2"}
DUMMY_DOC_IDS = ["d0", "d0", "d1", "d2", "d3"]
UNIQUE_DUMMY_DOC_IDS = list(set(DUMMY_DOC_IDS))
DUMMY_PSG_IDS = ["p0", "p1", "p2", "p3", "p4"]
DUMMY_VECTORS = np.array(
    [
        [1, 0, 0, 0, 0],
        [1, 1, 0, 0, 0],
        [1, 1, 1, 0, 0],
        [1, 1, 1, 1, 0],
        [1, 1, 1, 1, 1],
    ]
)
DUMMY_NUM, DUMMY_DIM = DUMMY_VECTORS.shape
DUMMY_DOC_RUN = {
    "q1": {"d0": 100, "d1": 2, "d2": 3, "d3": 200},
    "q2": {"d0": 400, "d1": 5, "d2": 6, "d3": 800},
}
DUMMY_DOC_RANKING = Ranking.from_run(DUMMY_DOC_RUN, queries=DUMMY_QUERIES)
DUMMY_PSG_RUN = {
    "q1": {"p0": 100, "p1": 2, "p2": 3, "p3": 4, "p4": 5},
    "q2": {"p0": 500, "p1": 6, "p2": 7, "p3": 8, "p4": 9},
}
DUMMY_PSG_RANKING = Ranking.from_run(DUMMY_PSG_RUN, queries=DUMMY_QUERIES)
DUMMY_ENCODER = LambdaEncoder(lambda _: np.array([1, 1, 1, 1, 1]))

DUMMY_QUANTIZER = NanoPQ(2, 8)
DUMMY_QUANTIZER.fit(
    np.random.default_rng(0).normal(size=(16, 16)).astype(np.float32)
)


class TestIndex(unittest.TestCase):
    __test__ = False

    @classmethod
    def setUpClass(cls):
        cls.doc_psg_index.add(
            vectors=DUMMY_VECTORS, doc_ids=DUMMY_DOC_IDS, psg_ids=DUMMY_PSG_IDS
        )

        # mixed: doc-only, psg-only, and both IDs per vector
        cls.index_partial_ids.add(
            vectors=DUMMY_VECTORS,
            doc_ids=[None, None] + DUMMY_DOC_IDS[2:],
            psg_ids=DUMMY_PSG_IDS[:-2] + [None, None],
        )
        cls.index_partial_ids.add(vectors=DUMMY_VECTORS[:2], doc_ids=DUMMY_DOC_IDS[:2])
        cls.index_partial_ids.add(
            vectors=DUMMY_VECTORS[-2:], psg_ids=DUMMY_PSG_IDS[-2:]
        )

        cls.doc_index.add(vectors=DUMMY_VECTORS, doc_ids=DUMMY_DOC_IDS)
        cls.psg_index.add(vectors=DUMMY_VECTORS, psg_ids=DUMMY_PSG_IDS)

        cls.quantized_index.add(
            vectors=np.random.default_rng(1)
            .normal(size=(5, DUMMY_QUANTIZER.dims[0]))
            .astype(np.float32),
            doc_ids=DUMMY_DOC_IDS,
        )

    def test_properties(self):
        self.assertEqual(set(DUMMY_DOC_IDS), self.doc_psg_index.doc_ids)
        self.assertEqual(set(DUMMY_PSG_IDS), self.doc_psg_index.psg_ids)
        self.assertEqual(DUMMY_NUM, len(self.doc_psg_index))
        self.assertEqual(DUMMY_DIM, self.doc_psg_index.dim)

        self.assertEqual(set(DUMMY_DOC_IDS), self.index_partial_ids.doc_ids)
        self.assertEqual(set(DUMMY_PSG_IDS), self.index_partial_ids.psg_ids)
        self.assertEqual(DUMMY_NUM + 4, len(self.index_partial_ids))
        self.assertEqual(DUMMY_DIM, self.index_partial_ids.dim)

        self.assertEqual(set(DUMMY_DOC_IDS), self.doc_index.doc_ids)
        self.assertEqual(0, len(self.doc_index.psg_ids))
        self.assertEqual(DUMMY_NUM, len(self.doc_index))
        self.assertEqual(DUMMY_DIM, self.doc_index.dim)

        self.assertEqual(set(DUMMY_PSG_IDS), self.psg_index.psg_ids)
        self.assertEqual(0, len(self.psg_index.doc_ids))
        self.assertEqual(DUMMY_NUM, len(self.psg_index))
        self.assertEqual(DUMMY_DIM, self.psg_index.dim)

        self.assertEqual(16, self.quantized_index.dim)

    def test_add_retrieve(self):
        self.assertEqual(0, len(self.index))

        data = np.random.default_rng(2).normal(size=(80, 16))
        doc_ids = [f"doc_{i // 2}" for i in range(data.shape[0])]
        psg_ids = [f"psg_{i}" for i in range(data.shape[0])]

        # incremental adds across growth boundaries
        for lower, upper in [(0, 8), (8, 24), (24, 80)]:
            self.index.add(
                data[lower:upper],
                doc_ids=doc_ids[lower:upper],
                psg_ids=psg_ids[lower:upper],
            )
            self.assertEqual(upper, len(self.index))

            self.index.mode = Mode.PASSAGE
            vecs, ids = self.index._get_vectors(psg_ids[lower:upper])
            _assert_vectors_match(vecs, ids, data[lower:upper], psg_ids[lower:upper])

            self.index.mode = Mode.MAXP
            vecs, ids = self.index._get_vectors(
                [f"doc_{i}" for i in range(lower // 2, upper // 2)]
            )
            _assert_vectors_match(vecs, ids, data[lower:upper], doc_ids[lower:upper])

    def test_queries_attached(self):
        self.doc_psg_index.mode = Mode.MAXP
        self.assertTrue(self.doc_psg_index(DUMMY_DOC_RANKING).has_queries)

    def test_maxp(self):
        self.doc_psg_index.mode = Mode.MAXP
        self.assertEqual(
            self.doc_psg_index(DUMMY_DOC_RANKING),
            Ranking.from_run(
                {
                    "q1": {"d0": 2, "d1": 3, "d2": 4, "d3": 5},
                    "q2": {"d0": 2, "d1": 3, "d2": 4, "d3": 5},
                }
            ),
        )

    def test_firstp(self):
        expected = Ranking.from_run(
            {
                "q1": {"d0": 1, "d1": 3, "d2": 4, "d3": 5},
                "q2": {"d0": 1, "d1": 3, "d2": 4, "d3": 5},
            }
        )
        self.doc_psg_index.mode = Mode.FIRSTP
        self.assertEqual(self.doc_psg_index(DUMMY_DOC_RANKING), expected)
        self.index_partial_ids.mode = Mode.FIRSTP
        self.assertEqual(self.doc_psg_index(DUMMY_DOC_RANKING), expected)

    def test_avep(self):
        expected = Ranking.from_run(
            {
                "q1": {"d0": 1.5, "d1": 3, "d2": 4, "d3": 5},
                "q2": {"d0": 1.5, "d1": 3, "d2": 4, "d3": 5},
            }
        )
        self.doc_psg_index.mode = Mode.AVEP
        self.assertEqual(self.doc_psg_index(DUMMY_DOC_RANKING), expected)
        self.index_partial_ids.mode = Mode.AVEP
        self.assertEqual(self.index_partial_ids(DUMMY_DOC_RANKING), expected)

    def test_passage(self):
        expected = Ranking.from_run(
            {
                "q1": {"p0": 1, "p1": 2, "p2": 3, "p3": 4, "p4": 5},
                "q2": {"p0": 1, "p1": 2, "p2": 3, "p3": 4, "p4": 5},
            }
        )
        self.doc_psg_index.mode = Mode.PASSAGE
        self.assertEqual(self.doc_psg_index(DUMMY_PSG_RANKING), expected)
        self.index_partial_ids.mode = Mode.PASSAGE
        self.assertEqual(self.index_partial_ids(DUMMY_PSG_RANKING), expected)

    def test_errors(self):
        # no IDs at all
        with self.assertRaises(ValueError):
            self.index_no_enc.add(DUMMY_VECTORS, doc_ids=None, psg_ids=None)

        # too few IDs
        with self.assertRaises(ValueError):
            self.index_no_enc.add(
                DUMMY_VECTORS, doc_ids=DUMMY_DOC_IDS[:-2], psg_ids=None
            )
        with self.assertRaises(ValueError):
            self.index_no_enc.add(
                DUMMY_VECTORS, doc_ids=None, psg_ids=DUMMY_PSG_IDS[:-2]
            )

        # a vector with neither ID
        with self.assertRaises(ValueError):
            self.index_no_enc.add(
                DUMMY_VECTORS,
                doc_ids=[None] + DUMMY_DOC_IDS[1:],
                psg_ids=[None] + DUMMY_PSG_IDS[1:],
            )

        # duplicate passage ID
        with self.assertRaises(RuntimeError):
            self.index_no_enc.add(DUMMY_VECTORS[:1], psg_ids=DUMMY_PSG_IDS[:1])
            self.index_no_enc.add(DUMMY_VECTORS[:1], psg_ids=DUMMY_PSG_IDS[:1])

        # encoding without an encoder
        with self.assertRaises(RuntimeError):
            self.index_no_enc.encode_queries(["test"])

        # dimension mismatch
        self.index_wrong_dim.add(np.array([[0, 0], [1, 1]]), doc_ids=["d1", "d2"])
        with self.assertRaises(ValueError):
            self.index_wrong_dim.add(
                np.array([[0, 0, 0], [1, 1, 1]]), doc_ids=["d3", "d4"]
            )

        # ranking without queries
        with self.assertRaises(ValueError):
            self.doc_psg_index(Ranking.from_run(DUMMY_DOC_RUN))

        # early stopping without its parameters
        with self.assertRaises(ValueError):
            self.doc_psg_index(
                DUMMY_DOC_RANKING, early_stopping=10, early_stopping_alpha=None
            )
        with self.assertRaises(ValueError):
            self.doc_psg_index(
                DUMMY_DOC_RANKING, early_stopping=10, early_stopping_depths=None
            )

        # quantizer on a non-empty index
        with self.assertRaises(RuntimeError):
            self.doc_psg_index.quantizer = DUMMY_QUANTIZER

        # ID missing from the index
        ranking_missing = Ranking.from_run(
            {"q1": {"d0": 100, "dx": 2}}, queries=DUMMY_QUERIES
        )
        with self.assertRaises(IndexError):
            self.doc_psg_index(ranking_missing)

    def test_early_stopping(self):
        self.early_stopping_index.add(
            np.stack([[1, 0], [1, 1]] * 10), psg_ids=[f"p{i}" for i in range(20)]
        )
        r = Ranking(
            pd.DataFrame(
                [
                    {"q_id": q, "query": q, "id": f"p{i}", "score": i}
                    for i in range(20)
                    for q in ("q1", "q2")
                ]
            )
        )

        expected = Ranking(
            pd.DataFrame(
                [
                    {"q_id": q, "id": f"p{i}", "score": s}
                    for q in ("q2", "q1")
                    for i, s in [
                        (19, 20.0),
                        (17, 20.0),
                        (15, 20.0),
                        (13, 20.0),
                        (11, 20.0),
                        (18, 10.0),
                        (16, 10.0),
                        (14, 10.0),
                        (12, 10.0),
                        (10, 10.0),
                    ]
                ]
            )
        )

        for depths in ((2, 5, 10, 20), (5, 2, 20, 10)):  # order must not matter
            self.assertEqual(
                self.early_stopping_index(
                    r,
                    early_stopping=5,
                    early_stopping_alpha=0.5,
                    early_stopping_depths=depths,
                ),
                expected,
            )

    def test_batch_size_invariance(self):
        r = Ranking.from_run(
            {
                "q1": {"d0": 2, "d1": 3, "d2": 4, "d3": 10},
                "q2": {"d0": 5, "d1": 4, "d2": 3, "d3": 12},
                "q3": {"d0": 8, "d1": 5, "d2": 2, "d3": 1},
                "q4": {"d0": 11, "d1": 6, "d2": 1, "d3": 2},
                "q5": {"d0": 14, "d1": 7, "d2": 0, "d3": 3},
            },
            queries={f"q{n}": f"query {n}" for n in range(1, 6)},
        )
        expected = self.doc_psg_index(r)
        for batch_size in (2, 5, 10):
            self.assertEqual(expected, self.doc_psg_index(r, batch_size=batch_size))

    def test_coalescing(self):
        # delta = 0.3: d0's two vectors merge into their average
        create_coalesced_index(self.doc_index, self.coalesced_indexes[0], 0.3)
        self.assertEqual(self.doc_index.doc_ids, self.coalesced_indexes[0].doc_ids)
        d0_expected = np.average([DUMMY_VECTORS[0], DUMMY_VECTORS[1]], axis=0)
        d0_vectors, _ = self.coalesced_indexes[0]._get_vectors(["d0"])
        self.assertEqual(1, len(d0_vectors))
        self.assertTrue(np.array_equal(d0_expected, d0_vectors[0]))

        # delta = 0.2: nothing merges
        create_coalesced_index(
            self.doc_index, self.coalesced_indexes[1], 0.2, batch_size=2
        )
        self.assertEqual(self.doc_index.doc_ids, self.coalesced_indexes[1].doc_ids)
        for doc_id in self.doc_index.doc_ids:
            vectors_1, _ = self.doc_index._get_vectors([doc_id])
            vectors_2, _ = self.coalesced_indexes[1]._get_vectors([doc_id])
            self.assertEqual(len(vectors_1), len(vectors_2))
            for v1, v2 in zip(vectors_1, vectors_2):
                self.assertTrue(np.array_equal(v1, v2))

        # non-empty target rejected
        with self.assertRaises(ValueError):
            create_coalesced_index(self.doc_index, self.coalesced_indexes[0], 0.3)

    def test_iter(self):
        for index in self.iter_indexes:
            index.add(DUMMY_VECTORS, doc_ids=DUMMY_DOC_IDS, psg_ids=DUMMY_PSG_IDS)
            for batch_size in (1, 3, 5, 10):
                vectors, doc_ids, psg_ids = zip(*index.batch_iter(batch_size))
                np.testing.assert_equal(DUMMY_VECTORS, np.concatenate(vectors))
                self.assertEqual(
                    DUMMY_DOC_IDS, list(itertools.chain.from_iterable(doc_ids))
                )
                self.assertEqual(
                    DUMMY_PSG_IDS, list(itertools.chain.from_iterable(psg_ids))
                )

    def test_quantization(self):
        self.assertEqual(2, self.quantized_index._get_internal_dim())

        # iteration yields decoded (original-dimension) vectors
        for vec, _, _ in self.quantized_index:
            self.assertEqual(16, vec.shape[0])

        # _get_vectors yields stored codes
        self.quantized_index.mode = Mode.MAXP
        self.assertEqual(
            self.quantized_index._get_vectors(UNIQUE_DUMMY_DOC_IDS)[0].shape, (5, 2)
        )

    def test_quantized_scoring_matches_decode(self):
        """ADC in-kernel scoring == decode-then-dot within fp32 tolerance."""
        self.quantized_index.mode = Mode.MAXP
        self.quantized_index.query_encoder = LambdaEncoder(
            lambda _: np.ones(16, dtype=np.float32)
        )
        ranking = Ranking.from_run(
            {"q1": {d: 1.0 for d in UNIQUE_DUMMY_DOC_IDS}},
            queries={"q1": "query 1"},
        )
        result = self.quantized_index(ranking)

        # manual: decode codes on host, dot with the (constant) query vector
        qvec = np.ones(16, dtype=np.float32)
        codes, ids = self.quantized_index._get_vectors(UNIQUE_DUMMY_DOC_IDS)
        decoded = DUMMY_QUANTIZER.decode(codes)
        expected = defaultdict(lambda: -np.inf)
        for vec, i in zip(decoded, ids):
            expected[i] = max(expected[i], float(np.dot(qvec, vec)))
        got = result["q1"]
        for i in UNIQUE_DUMMY_DOC_IDS:
            self.assertAlmostEqual(expected[i], got[i], places=4)


class TestInMemoryIndex(TestIndex):
    __test__ = True

    @classmethod
    def setUpClass(cls):
        cls.index = InMemoryIndex(init_size=32, alloc_size=32)
        cls.doc_psg_index = InMemoryIndex(DUMMY_ENCODER)
        cls.index_partial_ids = InMemoryIndex(DUMMY_ENCODER)
        cls.doc_index = InMemoryIndex(DUMMY_ENCODER)
        cls.psg_index = InMemoryIndex(DUMMY_ENCODER)
        cls.index_no_enc = InMemoryIndex(query_encoder=None)
        cls.index_wrong_dim = InMemoryIndex(query_encoder=None)
        cls.early_stopping_index = InMemoryIndex(
            LambdaEncoder(lambda q: np.array([10, 10])), mode=Mode.PASSAGE
        )
        cls.coalesced_indexes = [
            InMemoryIndex(mode=Mode.MAXP),
            InMemoryIndex(mode=Mode.MAXP),
        ]
        cls.iter_indexes = [
            InMemoryIndex(init_size=2, alloc_size=2),
            InMemoryIndex(init_size=5),
        ]
        cls.quantized_index = InMemoryIndex(quantizer=DUMMY_QUANTIZER)
        super().setUpClass()

    def test_consolidate(self):
        index = InMemoryIndex(init_size=8, alloc_size=4, mode=Mode.PASSAGE)
        data = np.random.default_rng(3).normal(size=(32, 16))
        psg_ids = [f"psg_{i}" for i in range(32)]

        index.add(data[:14], psg_ids=psg_ids[:14])
        index.consolidate()
        vecs, ids = index._get_vectors(psg_ids[:14])
        _assert_vectors_match(vecs, ids, data[:14], psg_ids[:14])

        index.add(data[14:32], psg_ids=psg_ids[14:32])
        index.consolidate()
        vecs, ids = index._get_vectors(psg_ids)
        _assert_vectors_match(vecs, ids, data, psg_ids)


class TestInMemoryIndexDeviceStore(TestIndex):
    """Same behavioral contract against the device-resident store
    (``store="device"``: adds append straight into the growable HBM buffer,
    host reads fetch rows back from the device)."""

    __test__ = True

    @classmethod
    def setUpClass(cls):
        def dev(*args, **kwargs):
            return InMemoryIndex(*args, store="device", **kwargs)

        cls.index = dev(init_size=32, alloc_size=32)
        cls.doc_psg_index = dev(DUMMY_ENCODER)
        cls.index_partial_ids = dev(DUMMY_ENCODER)
        cls.doc_index = dev(DUMMY_ENCODER)
        cls.psg_index = dev(DUMMY_ENCODER)
        cls.index_no_enc = dev(query_encoder=None)
        cls.index_wrong_dim = dev(query_encoder=None)
        cls.early_stopping_index = dev(
            LambdaEncoder(lambda q: np.array([10, 10])), mode=Mode.PASSAGE
        )
        cls.coalesced_indexes = [dev(mode=Mode.MAXP), dev(mode=Mode.MAXP)]
        cls.iter_indexes = [dev(init_size=2, alloc_size=2), dev(init_size=5)]
        cls.quantized_index = dev(quantizer=DUMMY_QUANTIZER)
        super().setUpClass()

    def test_growth_across_row_pad(self):
        """Appends crossing the device growth boundary stay intact."""
        index = InMemoryIndex(store="device", init_size=8, alloc_size=4, mode=Mode.PASSAGE)
        data = np.random.default_rng(4).normal(size=(48, 16)).astype(np.float32)
        psg_ids = [f"psg_{i}" for i in range(48)]
        index.add(data[:20], psg_ids=psg_ids[:20])
        index.add(data[20:], psg_ids=psg_ids[20:])
        vecs, ids = index._get_vectors(psg_ids)
        _assert_vectors_match(vecs, ids, data, psg_ids)

    def test_device_store_option_validation(self):
        from fastforward_tpu.parallel import MeshConfig

        # store='device' + mesh_config is supported (sharded device append,
        # tests/test_parallel.py::test_device_store_sharded); hbm_budget is
        # not (the hybrid tier streams from the host canonical copy)
        InMemoryIndex(store="device", mesh_config=MeshConfig(shard=8))
        with self.assertRaises(ValueError):
            InMemoryIndex(store="device", hbm_budget=1 << 20)

    def test_bad_store_rejected(self):
        with self.assertRaises(ValueError):
            InMemoryIndex(store="hbm")


class TestOnDiskIndex(TestIndex):
    __test__ = True

    @classmethod
    def setUpClass(cls):
        cls.temp_dir = Path(tempfile.mkdtemp())
        cls.index = OnDiskIndex(cls.temp_dir / "index.h5", init_size=32, chunk_size=32)
        cls.doc_psg_index = OnDiskIndex(cls.temp_dir / "doc_psg_index.h5", DUMMY_ENCODER)
        cls.index_partial_ids = OnDiskIndex(
            cls.temp_dir / "index_partial_ids.h5", DUMMY_ENCODER
        )
        cls.doc_index = OnDiskIndex(cls.temp_dir / "doc_index.h5", DUMMY_ENCODER)
        cls.psg_index = OnDiskIndex(cls.temp_dir / "psg_index.h5", DUMMY_ENCODER)
        cls.index_no_enc = OnDiskIndex(
            cls.temp_dir / "index_no_enc.h5", query_encoder=None
        )
        cls.index_wrong_dim = OnDiskIndex(
            cls.temp_dir / "index_wrong_dim.h5", query_encoder=None
        )
        cls.early_stopping_index = OnDiskIndex(
            cls.temp_dir / "early_stopping_index.h5",
            LambdaEncoder(lambda q: np.array([10, 10])),
            mode=Mode.PASSAGE,
        )
        cls.coalesced_indexes = [
            OnDiskIndex(cls.temp_dir / "coalesced_index_1.h5", mode=Mode.MAXP),
            OnDiskIndex(cls.temp_dir / "coalesced_index_2.h5", mode=Mode.MAXP),
        ]
        cls.iter_indexes = [
            OnDiskIndex(cls.temp_dir / "iter_index_1.h5", init_size=2, chunk_size=2),
            OnDiskIndex(cls.temp_dir / "iter_index_2.h5", init_size=5),
        ]
        cls.quantized_index = OnDiskIndex(
            cls.temp_dir / "quantized_index.h5", quantizer=DUMMY_QUANTIZER
        )
        super().setUpClass()

    def test_load(self):
        # vectors survive a save/load round-trip
        shutil.copy(
            self.temp_dir / "doc_psg_index.h5", self.temp_dir / "doc_psg_index_copy.h5"
        )
        index_copied = OnDiskIndex.load(self.temp_dir / "doc_psg_index_copy.h5")
        self.assertEqual(index_copied.doc_ids, self.doc_psg_index.doc_ids)
        self.assertEqual(index_copied.psg_ids, self.doc_psg_index.psg_ids)
        for mode, ids in [
            (Mode.PASSAGE, DUMMY_PSG_IDS),
            (Mode.MAXP, UNIQUE_DUMMY_DOC_IDS),
        ]:
            self.doc_psg_index.mode = mode
            index_copied.mode = mode
            _assert_get_vectors_equal(index_copied, self.doc_psg_index, ids)

        shutil.copy(self.temp_dir / "doc_index.h5", self.temp_dir / "doc_index_copy.h5")
        index_copied = OnDiskIndex.load(self.temp_dir / "doc_index_copy.h5")
        self.assertEqual(index_copied.doc_ids, self.doc_index.doc_ids)
        self.assertEqual(index_copied.psg_ids, self.doc_index.psg_ids)
        self.doc_index.mode = Mode.MAXP
        index_copied.mode = Mode.MAXP
        _assert_get_vectors_equal(index_copied, self.doc_index, UNIQUE_DUMMY_DOC_IDS)

        shutil.copy(self.temp_dir / "psg_index.h5", self.temp_dir / "psg_index_copy.h5")
        index_copied = OnDiskIndex.load(self.temp_dir / "psg_index_copy.h5")
        self.assertEqual(index_copied.doc_ids, self.psg_index.doc_ids)
        self.assertEqual(index_copied.psg_ids, self.psg_index.psg_ids)
        self.psg_index.mode = Mode.PASSAGE
        index_copied.mode = Mode.PASSAGE
        _assert_get_vectors_equal(index_copied, self.psg_index, DUMMY_PSG_IDS)

        # quantizer state survives the round-trip
        shutil.copy(
            self.temp_dir / "quantized_index.h5",
            self.temp_dir / "quantized_index_copy.h5",
        )
        quantized_copied = OnDiskIndex.load(self.temp_dir / "quantized_index_copy.h5")
        self.assertEqual(quantized_copied.quantizer, self.quantized_index.quantizer)
        self.quantized_index.mode = Mode.PASSAGE
        quantized_copied.mode = Mode.PASSAGE

        # empty index loads
        OnDiskIndex(self.temp_dir / "empty_index.h5")
        empty_loaded = OnDiskIndex.load(self.temp_dir / "empty_index.h5")
        self.assertEqual(0, len(empty_loaded.doc_ids))
        self.assertEqual(0, len(empty_loaded.psg_ids))

    def test_store_quantizer(self):
        index_with_quantizer = OnDiskIndex(self.temp_dir / "index_with_quantizer.h5")
        index_with_quantizer.quantizer = DUMMY_QUANTIZER
        new_quantizer = NanoPQ(2, 8)
        new_quantizer.fit(
            np.random.default_rng(4).normal(size=(16, 16)).astype(np.float32)
        )
        index_with_quantizer.quantizer = new_quantizer

        del index_with_quantizer
        reloaded = OnDiskIndex.load(self.temp_dir / "index_with_quantizer.h5")
        self.assertEqual(new_quantizer, reloaded.quantizer)

    def test_to_memory(self):
        for index, params in [
            (self.doc_index, [(Mode.MAXP, UNIQUE_DUMMY_DOC_IDS)]),
            (self.psg_index, [(Mode.PASSAGE, DUMMY_PSG_IDS)]),
            (
                self.doc_psg_index,
                [(Mode.MAXP, UNIQUE_DUMMY_DOC_IDS), (Mode.PASSAGE, DUMMY_PSG_IDS)],
            ),
        ]:
            mem_index = index.to_memory()
            mem_index_batched = index.to_memory(batch_size=2)
            for mode, ids in params:
                index.mode = mode
                mem_index.mode = mode
                mem_index_batched.mode = mode

                self.assertEqual(mem_index.doc_ids, index.doc_ids)
                self.assertEqual(mem_index.psg_ids, index.psg_ids)
                self.assertEqual(mem_index_batched.doc_ids, index.doc_ids)
                self.assertEqual(mem_index_batched.psg_ids, index.psg_ids)

                _assert_get_vectors_equal(mem_index, index, ids)
                _assert_get_vectors_equal(mem_index_batched, index, ids)

        mem_quantized = self.quantized_index.to_memory()
        self.assertEqual(mem_quantized.quantizer, self.quantized_index.quantizer)

    def test_max_id_length(self):
        index = OnDiskIndex(self.temp_dir / "max_id_length_index.h5", max_id_length=3)
        vectors = np.zeros(shape=(16, 16))
        doc_ids_ok = ["d1"] * 16
        psg_ids_ok = [f"p{i}" for i in range(16)]
        index.add(vectors, doc_ids=doc_ids_ok, psg_ids=psg_ids_ok)

        with self.assertRaises(RuntimeError):
            index.add(vectors, doc_ids=[d + "-long" for d in doc_ids_ok])
        with self.assertRaises(RuntimeError):
            index.add(vectors, psg_ids=[p + "-long" for p in psg_ids_ok])

        # the failed adds left the index unchanged
        self.assertEqual(index.doc_ids, set(doc_ids_ok))
        self.assertEqual(index.psg_ids, set(psg_ids_ok))
        self.assertEqual(16, len(index))

    def test_max_id_length_bytes(self):
        """IDs are bounded by encoded UTF-8 *bytes*, not characters.

        A multi-byte ID that fits in characters but not bytes must be
        rejected up front — numpy would otherwise truncate mid-sequence,
        corrupting the file so it cannot be reloaded at all.
        """
        index = OnDiskIndex(self.temp_dir / "max_id_bytes_index.h5", max_id_length=4)
        vectors = np.zeros(shape=(2, 16))
        # "docé" is 4 characters but 5 UTF-8 bytes
        with self.assertRaises(RuntimeError):
            index.add(vectors, doc_ids=["docé", "d2"])
        with self.assertRaises(RuntimeError):
            index.add(vectors, psg_ids=["pé1é", "p2"])
        self.assertEqual(0, len(index))

        # exactly-fitting multi-byte IDs round-trip
        index.add(vectors, doc_ids=["dé1", "d2"], psg_ids=["p1", "p2"])
        reloaded = OnDiskIndex.load(self.temp_dir / "max_id_bytes_index.h5")
        self.assertEqual({"dé1", "d2"}, reloaded.doc_ids)

    def test_max_indexing_size(self):
        index = OnDiskIndex(
            self.temp_dir / "max_indexing_size_index.h5",
            mode=Mode.PASSAGE,
            max_indexing_size=5,
        )
        psg_reps = np.random.default_rng(5).normal(size=(16, 16))
        psg_ids = [f"p{i}" for i in range(16)]
        index.add(psg_reps, psg_ids=psg_ids)
        vecs, ids = index._get_vectors(psg_ids)
        _assert_vectors_match(vecs, ids, psg_reps, psg_ids)

    def test_memory_mapped(self):
        index = OnDiskIndex(
            self.temp_dir / "mmap_index.h5",
            mode=Mode.PASSAGE,
            init_size=8,
            chunk_size=4,
            memory_mapped=True,
        )
        psg_reps = np.random.default_rng(6).normal(size=(16, 16))
        psg_ids = [f"p{i}" for i in range(16)]
        index.add(psg_reps, psg_ids=psg_ids)
        vecs, ids = index._get_vectors(psg_ids)
        _assert_vectors_match(vecs, ids, psg_reps, psg_ids)

    def test_hbm_cache(self):
        """hbm_cache=True scores via the device table, same results."""
        index = OnDiskIndex(
            self.temp_dir / "hbm_cache_index.h5", DUMMY_ENCODER, hbm_cache=True
        )
        index.add(DUMMY_VECTORS, doc_ids=DUMMY_DOC_IDS, psg_ids=DUMMY_PSG_IDS)
        index.mode = Mode.MAXP
        self.doc_psg_index.mode = Mode.MAXP
        self.assertEqual(
            index(DUMMY_DOC_RANKING), self.doc_psg_index(DUMMY_DOC_RANKING)
        )
        self.assertIsNotNone(index._device_view())

    @classmethod
    def tearDownClass(cls):
        shutil.rmtree(cls.temp_dir)


def _assert_get_vectors_equal(index_1, index_2, ids):
    vecs_1, ids_1 = index_1._get_vectors(ids)
    vecs_2, ids_2 = index_2._get_vectors(ids)
    _assert_vectors_match(vecs_1, ids_1, vecs_2, ids_2)


def _assert_vectors_match(vecs_1, ids_1, vecs_2, ids_2):
    """Order-insensitive comparison of (vectors, ids) pairs."""
    assert vecs_1.shape == vecs_2.shape
    assert len(ids_1) == len(ids_2)

    positions_1 = defaultdict(list)
    for pos, i in enumerate(ids_1):
        positions_1[i].append(pos)
    positions_2 = defaultdict(list)
    for pos, i in enumerate(ids_2):
        positions_2[i].append(pos)

    for i in positions_1:
        for p1, p2 in zip(positions_1[i], positions_2[i]):
            np.testing.assert_almost_equal(vecs_1[p1], vecs_2[p2], decimal=6)


class TestChunkIndexer(unittest.TestCase):
    """Contract of the chunked-vector retrieval utility.

    Mirrors the reference's ``index.util.ChunkIndexer`` semantics
    (reference: ``index/util.py:45-113``): resolve IDs per mode, fetch
    rows out of a list of chunks whose first chunk may be larger, return
    consistently paired (vectors, ids).
    """

    def setUp(self):
        from fastforward_tpu.index.util import ChunkIndexer

        rng = np.random.default_rng(7)
        self.table = rng.normal(size=(11, 4)).astype(np.float32)
        # first chunk larger than the rest (5 + 3 + 3)
        self.chunks = [self.table[:5], self.table[5:8], self.table[8:]]
        self.doc_id_to_idx = {
            "d0": [0, 1, 6],
            "d1": [2],
            "d2": [5, 9, 10],
            "d3": [4],
        }
        self.psg_id_to_idx = {f"p{i}": i for i in range(11)}
        self.indexer = ChunkIndexer(
            self.chunks, self.doc_id_to_idx, self.psg_id_to_idx
        )

    def test_get_chunk_indices(self):
        for global_row in range(11):
            c, w = self.indexer._get_chunk_indices(global_row)
            np.testing.assert_array_equal(
                self.chunks[c][w], self.table[global_row]
            )

    def test_passage_mode(self):
        vecs, ids = self.indexer(["p3", "p8", "p5"], Mode.PASSAGE)
        _assert_vectors_match(
            vecs, ids, self.table[[3, 8, 5]], ["p3", "p8", "p5"]
        )

    def test_doc_modes(self):
        for mode in (Mode.MAXP, Mode.AVEP):
            vecs, ids = self.indexer(["d2", "d0"], mode)
            _assert_vectors_match(
                vecs,
                ids,
                self.table[[5, 9, 10, 0, 1, 6]],
                ["d2", "d2", "d2", "d0", "d0", "d0"],
            )

    def test_firstp_mode(self):
        vecs, ids = self.indexer(["d2", "d0", "d3"], Mode.FIRSTP)
        _assert_vectors_match(
            vecs, ids, self.table[[5, 0, 4]], ["d2", "d0", "d3"]
        )

    def test_single_chunk(self):
        from fastforward_tpu.index.util import ChunkIndexer

        one = ChunkIndexer(
            [self.table], self.doc_id_to_idx, self.psg_id_to_idx
        )
        vecs, ids = one(["p10", "p0"], Mode.PASSAGE)
        _assert_vectors_match(vecs, ids, self.table[[10, 0]], ["p10", "p0"])

    def test_unknown_id_raises(self):
        with self.assertRaises(IndexError):
            self.indexer(["nope"], Mode.PASSAGE)

    def test_pairing_is_consistent(self):
        # every returned vector must equal the table row its ID resolves to
        vecs, ids = self.indexer(["p7", "p1", "p0", "p9"], Mode.PASSAGE)
        for v, i in zip(vecs, ids):
            np.testing.assert_array_equal(v, self.table[int(i[1:])])


if __name__ == "__main__":
    unittest.main()
