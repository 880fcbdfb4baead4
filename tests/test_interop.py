"""HDF5 format interop with the reference implementation.

Loads the *actual* reference package (read-only, from /root/reference/src,
with a stub for its optional nanopq dependency) and round-trips index files
in both directions.  Skipped automatically if the reference tree is absent.
"""

import shutil
import sys
import tempfile
import unittest
from pathlib import Path

import numpy as np

REFERENCE_SRC = Path("/root/reference/src")


def _import_reference():
    import importlib.metadata as importlib_metadata
    import types

    if "nanopq" not in sys.modules:
        stub = types.ModuleType("nanopq")
        stub.PQ = type("PQ", (), {"__init__": lambda self, **kw: None})
        stub.OPQ = type("OPQ", (), {"__init__": lambda self, **kw: None})
        sys.modules["nanopq"] = stub
    orig = importlib_metadata.version
    importlib_metadata.version = lambda name: (
        "0.8.0" if name == "fast-forward-indexes" else orig(name)
    )
    if str(REFERENCE_SRC) not in sys.path:
        sys.path.insert(0, str(REFERENCE_SRC))
    import fast_forward

    return fast_forward


@unittest.skipUnless(REFERENCE_SRC.exists(), "reference tree not available")
class TestFormatInterop(unittest.TestCase):
    @classmethod
    def setUpClass(cls):
        cls.tmp = Path(tempfile.mkdtemp())
        cls.rng = np.random.default_rng(21)
        cls.vectors = cls.rng.normal(size=(20, 16)).astype(np.float32)
        cls.doc_ids = [f"d{i // 2}" for i in range(20)]
        cls.psg_ids = [f"p{i}" for i in range(20)]

    @classmethod
    def tearDownClass(cls):
        shutil.rmtree(cls.tmp)

    def test_reference_file_loads_in_ours(self):
        ff = _import_reference()
        from fast_forward.index.disk import OnDiskIndex as RefOnDiskIndex

        path = self.tmp / "ref_written.h5"
        ref_index = RefOnDiskIndex(path)
        ref_index.add(self.vectors, doc_ids=self.doc_ids, psg_ids=self.psg_ids)

        from fastforward_tpu.index import Mode, OnDiskIndex

        ours = OnDiskIndex.load(path)
        self.assertEqual(set(self.doc_ids), ours.doc_ids)
        self.assertEqual(set(self.psg_ids), ours.psg_ids)
        self.assertEqual(20, len(ours))

        ours.mode = Mode.PASSAGE
        vecs, ids = ours._get_vectors(self.psg_ids)
        for vec, psg_id in zip(vecs, ids):
            np.testing.assert_allclose(
                vec, self.vectors[self.psg_ids.index(psg_id)], rtol=1e-6
            )

    def test_our_file_loads_in_reference(self):
        ff = _import_reference()
        from fastforward_tpu.index import OnDiskIndex

        path = self.tmp / "ours_written.h5"
        ours = OnDiskIndex(path)
        ours.add(self.vectors, doc_ids=self.doc_ids, psg_ids=self.psg_ids)

        from fast_forward.index.base import Mode as RefMode
        from fast_forward.index.disk import OnDiskIndex as RefOnDiskIndex

        ref_index = RefOnDiskIndex.load(path)
        self.assertEqual(set(self.doc_ids), ref_index.doc_ids)
        self.assertEqual(set(self.psg_ids), ref_index.psg_ids)

        ref_index.mode = RefMode.PASSAGE
        vecs, ids = ref_index._get_vectors(self.psg_ids)
        for vec, psg_id in zip(vecs, ids):
            np.testing.assert_allclose(
                vec, self.vectors[self.psg_ids.index(psg_id)], rtol=1e-6
            )

    def test_our_quantized_file_loads_in_reference(self):
        """PQ meta is serialized under the reference's class names, so a
        quantized index written here deserializes in a reference-only env."""
        ff = _import_reference()
        from fastforward_tpu.index import OnDiskIndex
        from fastforward_tpu.quantizer import PQ

        pq = PQ(M=4, Ks=8)
        pq.fit(self.rng.normal(size=(64, 16)).astype(np.float32))
        path = self.tmp / "ours_quantized.h5"
        ours = OnDiskIndex(path, quantizer=pq)
        ours.add(self.vectors, doc_ids=self.doc_ids, psg_ids=self.psg_ids)

        meta, _, _ = pq.serialize()
        self.assertEqual("fast_forward.quantizer.nanopq", meta["__module__"])
        self.assertEqual("NanoPQ", meta["__name__"])

        from fast_forward.index.disk import OnDiskIndex as RefOnDiskIndex
        from fast_forward.quantizer.nanopq import NanoPQ as RefNanoPQ

        ref_index = RefOnDiskIndex.load(path)
        self.assertIsInstance(ref_index.quantizer, RefNanoPQ)
        np.testing.assert_array_equal(
            ref_index.quantizer._pq.codewords, pq.codewords
        )
        # and the file still round-trips back into this implementation
        reloaded = OnDiskIndex.load(path)
        self.assertEqual(reloaded.quantizer, pq)

    def test_scoring_parity_with_reference(self):
        """Identical scores (to fp32 tolerance) on the same workload."""
        ff = _import_reference()
        from fast_forward.encoder import LambdaEncoder as RefLambdaEncoder
        from fast_forward.index.base import Mode as RefMode
        from fast_forward.index.memory import InMemoryIndex as RefInMemoryIndex
        from fast_forward.ranking import Ranking as RefRanking

        from fastforward_tpu.encoder import LambdaEncoder
        from fastforward_tpu.index import InMemoryIndex, Mode
        from fastforward_tpu.ranking import Ranking

        qvec = self.rng.normal(size=16).astype(np.float32)
        run = {
            "q1": {f"d{i}": float(10 - i) for i in range(10)},
            "q2": {f"d{i}": float(i) for i in range(3, 9)},
        }
        queries = {"q1": "one", "q2": "two"}

        ref_index = RefInMemoryIndex(
            RefLambdaEncoder(lambda _: qvec), mode=RefMode.MAXP
        )
        ref_index.add(self.vectors, doc_ids=self.doc_ids, psg_ids=self.psg_ids)
        ref_result = ref_index(RefRanking.from_run(run, queries=queries))

        our_index = InMemoryIndex(LambdaEncoder(lambda _: qvec), mode=Mode.MAXP)
        our_index.add(self.vectors, doc_ids=self.doc_ids, psg_ids=self.psg_ids)
        our_result = our_index(Ranking.from_run(run, queries=queries))

        for q_id in ("q1", "q2"):
            ref_scores = ref_result[q_id]
            our_scores = our_result[q_id]
            self.assertEqual(set(ref_scores), set(our_scores))
            for doc, score in ref_scores.items():
                self.assertAlmostEqual(score, our_scores[doc], places=4)


if __name__ == "__main__":
    unittest.main()
