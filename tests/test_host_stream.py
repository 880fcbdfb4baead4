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

    def test_doc_modes_fetch_pairs_not_rows(self):
        """Doc modes reduce K on device per side: the score fetch is at
        most 2 x pairs floats, not pairs x K (the previous host reduce
        fetched every row score over the host link)."""
        from fastforward_tpu.ops import host_stream

        hybrid = _doc_index(hbm_budget=BUDGET, stream_chunk_rows=1024)
        ranking = _doc_ranking()
        n_pairs = sum(len(ranking[q]) for q in ranking.q_ids)
        for mode in (Mode.MAXP, Mode.AVEP):
            hybrid.mode = mode
            hybrid(ranking)  # cold: plan + program build
            host_stream.reset_stats()
            hybrid(ranking)  # warm
            self.assertLessEqual(
                host_stream.STATS["fetch_floats"], 2 * n_pairs, mode
            )

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
        view = hybrid._device_view()
        cached = view.aux.get("tail_blocks", {})
        self.assertTrue(cached, "no block was cached despite leftover budget")
        self.assertLessEqual(
            sum(nbytes for _, nbytes in cached.values()),
            view.tail_cache_budget,
        )
        self.assertEqual(
            view.aux["tail_bytes"],
            sum(nbytes for _, nbytes in cached.values()),
        )
        self.assertEqual(first, hybrid(ranking))

    def test_sparse_chunks_stage_bucketed_blocks(self):
        """A sparse candidate set must upload (and cache) blocks sized to
        its unique rows, not the full ``chunk_rows`` padding.

        Regression for the round-4 on-chip validation FAIL: with
        ``chunk_rows`` blocks bigger than the leftover device budget,
        caching was all-or-nothing and every warm call re-uploaded a full
        padded block (96 MiB for ~1.6k candidate rows on the chip).
        """
        from fastforward_tpu.ops import host_stream

        plain = _psg_index()
        hybrid = _psg_index(
            hbm_budget=(1 << 20) + (1 << 18), stream_chunk_rows=4096
        )
        # every 64th passage: ~80 unique tail rows against 4096-row chunks
        run = {"q1": {f"p{i}": 1.0 for i in range(0, N, 64)}}
        ranking = Ranking.from_run(run, queries={"q1": "a"})
        want = plain(ranking)
        got = hybrid(ranking)
        self.assertEqual(want, got)
        view = hybrid._device_view()
        plan = next(iter(hybrid._plans.values()))
        for chunk in plan["hybrid"]["chunks"]:
            self.assertLess(chunk["block_rows"], 4096)
        host_stream.reset_stats()
        self.assertEqual(want, hybrid(ranking))
        self.assertEqual(
            host_stream.STATS["upload_bytes"],
            0,
            "warm call re-uploaded table bytes: bucketed blocks must fit "
            f"the leftover budget ({view.tail_cache_budget} B)",
        )

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

    def test_rejects_store_device(self):
        with self.assertRaises(ValueError):
            InMemoryIndex(ENC, store="device", hbm_budget=BUDGET)
        # hbm_budget + mesh_config is the SHARDED hybrid tier since round 4
        # (single-process; see tests/test_parallel.py::TestShardedHybrid) —
        # constructing one must not raise
        from fastforward_tpu.parallel.mesh import MeshConfig

        InMemoryIndex(ENC, mesh_config=MeshConfig(shard=2), hbm_budget=BUDGET)


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


class TestHybridBlockCacheBudget(unittest.TestCase):
    def test_budget_bounds_total_across_plans(self):
        """The device-block cache budget is VIEW-global: serving many
        distinct rankings must not pin plans x budget bytes of HBM
        (regression: per-plan accounting defeated the hbm_budget
        guarantee)."""
        index = _psg_index(hbm_budget=BUDGET, stream_chunk_rows=1024)
        view = index._device_view()
        self.assertEqual("hybrid", view.kind)
        expected_scores = {}
        for start in (0, 1, 2, 3, 4):
            run = {
                "q1": {
                    f"p{i}": float(i) for i in range(start, N, 5)
                }
            }
            ranking = Ranking.from_run(run, queries={"q1": "a"})
            out = index(ranking)["q1"]
            expected_scores.update(
                {pid: out[pid] for pid in list(out)[:3]}
            )
        used = view.aux.get("tail_bytes", 0)
        self.assertLessEqual(used, view.tail_cache_budget)
        # and correctness held for each distinct plan
        for pid, score in expected_scores.items():
            truth = float(CORPUS[int(pid[1:])] @ QVECS["a"])
            self.assertAlmostEqual(truth, score, places=3, msg=pid)


class TestHybridCacheEvictionAndViews(unittest.TestCase):
    def test_lru_eviction_reclaims_stale_blocks(self):
        """The device-block cache is an LRU: blocks cached by an early
        plan (e.g. preload's synthetic warm run) must be evicted for a
        later plan's blocks instead of permanently stranding the budget
        (regression: tail_bytes never decremented, so the first plans'
        blocks froze out every later plan)."""
        index = _psg_index(hbm_budget=BUDGET, stream_chunk_rows=1024)
        view = index._device_view()
        self.assertEqual("hybrid", view.kind)
        # many distinct sparse plans, each with its own block keys
        for start in range(8):
            run = {"q1": {f"p{i}": 1.0 for i in range(start, N, 11)}}
            index(Ranking.from_run(run, queries={"q1": "a"}))
        blocks = view.aux.get("tail_blocks", {})
        used = view.aux.get("tail_bytes", 0)
        self.assertLessEqual(used, view.tail_cache_budget)
        self.assertEqual(used, sum(nb for _, nb in blocks.values()))
        # the LAST plan's blocks are the cached (most recent) ones: a
        # repeat of it must hit without growing the cache
        before = dict.fromkeys(blocks)
        run = {"q1": {f"p{i}": 1.0 for i in range(7, N, 11)}}
        index(Ranking.from_run(run, queries={"q1": "a"}))
        self.assertEqual(set(before), set(view.aux["tail_blocks"]))

    def test_warm_calls_ship_no_table_bytes_within_budget(self):
        """When the device-block budget covers the plan's working set,
        repeat calls must pay ZERO host->device table traffic (the
        documented warm-path guarantee, now observable via STATS)."""
        from fastforward_tpu.ops import host_stream

        # 3.5 MiB: below the 4 MiB padded table (forces the hybrid view)
        # but with enough leftover that every tail block of this sparse
        # plan stays device-resident
        index = _psg_index(
            hbm_budget=(7 << 20) // 2, stream_chunk_rows=256
        )
        view = index._device_view()
        self.assertEqual("hybrid", view.kind)
        run = {"q1": {f"p{i}": 1.0 for i in range(0, N, 7)}}
        ranking = Ranking.from_run(run, queries={"q1": "a"})
        index(ranking)  # cold: builds the plan, uploads + caches blocks
        host_stream.reset_stats()
        index(ranking)  # warm
        self.assertEqual(0, host_stream.STATS["upload_bytes"])
        self.assertGreater(host_stream.STATS["block_cache_hits"], 0)

    def test_dense_contiguous_blocks_are_views_not_cached(self):
        """A dense candidate set's full contiguous chunks are zero-copy
        views of the canonical tail: the plan must not pin a host-side
        copy of the tail (regression: up to a full tail copy per plan,
        x _MAX_PLANS plans)."""
        index = _psg_index(hbm_budget=BUDGET, stream_chunk_rows=1024)
        run = {"q1": {f"p{i}": float(i) for i in range(N)}}  # every row
        ranking = Ranking.from_run(run, queries={"q1": "a"})
        index(ranking)  # plan cache is weakref-keyed: keep the ranking
        plan = next(iter(index._plans.values()))
        state = plan["hybrid"]
        host_cached = sum(
            c["block_host"].nbytes
            for c in state["chunks"]
            if c.get("block_host") is not None
        )
        # at most the final ragged chunk may be a real (padded) copy
        chunk_bytes = state["chunk_rows"] * DIM * 4
        self.assertLessEqual(host_cached, chunk_bytes)

    def test_scan_state_retries_pallas_after_transient_failure(self):
        """One transient kernel failure must not downgrade the plan to
        the XLA scan forever: the rebuilt scan state carries
        retry_pallas and the next call goes back to the kernel path
        while it is enabled (mirrors the dense/PQ per-call contract)."""
        from fastforward_tpu.ops import scoring

        scoring.set_pallas_stream(True)  # CPU: kernel calls always fail
        try:
            index = _psg_index(hbm_budget=BUDGET, stream_chunk_rows=1024)
            ranking = _psg_ranking()
            index(ranking)  # fails once, serves via scan
            plan = next(iter(index._plans.values()))
            state = plan["hybrid"]
            self.assertFalse(state["use_pallas"])
            self.assertTrue(state["retry_pallas"])
            # the first call also burned resident-path failures; reset the
            # strike counter as a real recovery would, keeping the plan
            scoring.set_pallas_stream(True)
            index(ranking)  # retries the kernel (fails again on CPU)
            self.assertGreater(scoring._pallas_failures, 0)
        finally:
            scoring.set_pallas_stream(None)


class TestHybridVeryRaggedDocs(unittest.TestCase):
    def test_flat_segment_fallback_uses_hybrid_engine(self):
        """A document with > _MAX_GROUP_K passages routes scoring through
        the flat segment fallback; with a hybrid view that path must score
        host-tail rows through the hybrid engine, not read out of bounds
        on the resident prefix (regression: tail documents silently
        dropped with NaN scores)."""
        doc_ids = ["dBIG"] * 100 + [
            f"d{i}" for i in range(100, N)
        ]  # one 100-passage doc, the rest single-passage
        run = {"q1": {"dBIG": 3.0, "d5000": 2.0, "d5999": 1.0}}
        ranking = Ranking.from_run(run, queries={"q1": "a"})
        results = []
        for kwargs in ({}, dict(hbm_budget=BUDGET, stream_chunk_rows=1024)):
            index = InMemoryIndex(ENC, mode=Mode.MAXP, **kwargs)
            index.add(CORPUS, doc_ids=doc_ids)
            results.append(index(ranking)["q1"])
        plain, hybrid = results
        self.assertEqual(set(plain), set(hybrid))
        self.assertEqual({"dBIG", "d5000", "d5999"}, set(hybrid))
        for doc in plain:
            self.assertAlmostEqual(plain[doc], hybrid[doc], places=3, msg=doc)

    def test_flat_fallback_modes(self):
        """AVEP / FIRSTP through the same ragged hybrid fallback."""
        doc_ids = ["dBIG"] * 100 + [f"d{i}" for i in range(100, N)]
        run = {"q1": {"dBIG": 3.0, "d4000": 2.0, "d5999": 1.0}}
        for mode in (Mode.AVEP, Mode.FIRSTP):
            results = []
            for kwargs in (
                {},
                dict(hbm_budget=BUDGET, stream_chunk_rows=1024),
            ):
                index = InMemoryIndex(ENC, mode=mode, **kwargs)
                index.add(CORPUS, doc_ids=doc_ids)
                ranking = Ranking.from_run(run, queries={"q1": "b"})
                results.append(index(ranking)["q1"])
            plain, hybrid = results
            self.assertEqual(set(plain), set(hybrid), msg=mode)
            for doc in plain:
                self.assertAlmostEqual(
                    plain[doc], hybrid[doc], places=3, msg=(mode, doc)
                )


class TestHybridQuantized(unittest.TestCase):
    """Beyond-HBM tier over int8 and PQ code tables.

    A corpus whose QUANTIZED table exceeds the budget must stream code
    blocks (int8 at 1/4, PQ at ~1/32 of dense fp32 traffic) and match the
    fully HBM-resident quantized index (same codes, same ADC math;
    reference serves arbitrary N from disk in every configuration,
    reference: ``index/disk.py:309-336``).
    """

    #: forces the hybrid tier for the int8 table (N x 128 int8 ~ 0.77 MB
    #: real, 1 MiB padded) while leaving a resident prefix + block cache
    INT8_BUDGET = 400_000
    #: forces it for the PQ code table (N x 16 codes ~ 94 KiB real)
    PQ_BUDGET = 50_000

    def _pair(self, make_quantizer, mode, budget):
        """(plain quantized index, hybrid quantized index) on CORPUS."""
        out = []
        for kwargs in (
            {},
            dict(hbm_budget=budget, stream_chunk_rows=1024),
        ):
            quantizer = make_quantizer()
            quantizer.fit(CORPUS)
            index = InMemoryIndex(
                ENC, quantizer=quantizer, mode=mode, **kwargs
            )
            if mode == Mode.PASSAGE:
                index.add(CORPUS, psg_ids=[f"p{i}" for i in range(N)])
            else:
                index.add(CORPUS, doc_ids=[f"d{i // 4}" for i in range(N)])
            out.append(index)
        return out

    def _assert_parity(self, plain, hybrid, ranking, kind):
        view = hybrid._device_view()
        self.assertEqual("hybrid", view.kind)
        self.assertEqual(kind, view.hybrid_kind)
        self.assertGreater(view.host_tail.shape[0], 0)
        for _round in ("cold", "warm"):
            a = plain(ranking)
            b = hybrid(ranking)
            for q in a.q_ids:
                ea, eb = a[q], b[q]
                self.assertEqual(set(ea), set(eb), (kind, _round))
                for key in ea:
                    self.assertAlmostEqual(
                        ea[key], eb[key], places=3, msg=(kind, _round, key)
                    )

    def test_scalar_passage_parity(self):
        from fastforward_tpu.quantizer import ScalarQuantizer

        plain, hybrid = self._pair(
            ScalarQuantizer, Mode.PASSAGE, self.INT8_BUDGET
        )
        self._assert_parity(plain, hybrid, _psg_ranking(), "scalar")

    def test_scalar_doc_modes_parity(self):
        from fastforward_tpu.quantizer import ScalarQuantizer

        plain, hybrid = self._pair(
            ScalarQuantizer, Mode.MAXP, self.INT8_BUDGET
        )
        for mode in (Mode.MAXP, Mode.AVEP, Mode.FIRSTP):
            plain.mode = hybrid.mode = mode
            self._assert_parity(plain, hybrid, _doc_ranking(), "scalar")

    def test_pq_passage_parity(self):
        from fastforward_tpu.quantizer import PQ

        plain, hybrid = self._pair(
            lambda: PQ(16, 16), Mode.PASSAGE, self.PQ_BUDGET
        )
        self._assert_parity(plain, hybrid, _psg_ranking(), "pq")

    def test_pq_doc_modes_parity(self):
        from fastforward_tpu.quantizer import PQ

        plain, hybrid = self._pair(
            lambda: PQ(16, 16), Mode.MAXP, self.PQ_BUDGET
        )
        for mode in (Mode.MAXP, Mode.AVEP):
            plain.mode = hybrid.mode = mode
            self._assert_parity(plain, hybrid, _doc_ranking(), "pq")

    def test_opq_hybrid_parity(self):
        """OPQ: the rotation folds into the queries before the hybrid
        engine sees them (codes live in rotated space)."""
        from fastforward_tpu.quantizer import OPQ

        plain, hybrid = self._pair(
            lambda: OPQ(16, 16, opq_iters=2), Mode.PASSAGE, self.PQ_BUDGET
        )
        self._assert_parity(plain, hybrid, _psg_ranking(), "pq")

    def test_pq_sparse_candidates_gather_adc(self):
        """Few resident candidates take the LUT gather-ADC path."""
        from fastforward_tpu.quantizer import PQ

        plain, hybrid = self._pair(
            lambda: PQ(16, 16), Mode.PASSAGE, self.PQ_BUDGET
        )
        run = {"q1": {f"p{i}": float(i) for i in range(0, N, 500)}}
        ranking = Ranking.from_run(run, queries={"q1": "a"})
        self._assert_parity(plain, hybrid, ranking, "pq")

    def test_quantized_doc_modes_fetch_pairs_not_rows(self):
        """The device-side K reduction holds on quantized hybrids too."""
        from fastforward_tpu.ops import host_stream
        from fastforward_tpu.quantizer import PQ, ScalarQuantizer

        ranking = _doc_ranking()
        n_pairs = sum(len(ranking[q]) for q in ranking.q_ids)
        for make, budget in (
            (ScalarQuantizer, self.INT8_BUDGET),
            (lambda: PQ(16, 16), self.PQ_BUDGET),
        ):
            _, hybrid = self._pair(make, Mode.MAXP, budget)
            hybrid(ranking)  # cold: plan + program build
            host_stream.reset_stats()
            hybrid(ranking)  # warm
            self.assertLessEqual(
                host_stream.STATS["fetch_floats"], 2 * n_pairs
            )

    def test_early_stopping_parity_scalar(self):
        from fastforward_tpu.quantizer import ScalarQuantizer

        plain, hybrid = self._pair(
            ScalarQuantizer, Mode.PASSAGE, self.INT8_BUDGET
        )
        ranking = _psg_ranking()
        kwargs = dict(
            early_stopping=10,
            early_stopping_alpha=0.5,
            early_stopping_depths=(50, 500, 2000),
        )
        a, b = plain(ranking, **kwargs), hybrid(ranking, **kwargs)
        for q in a.q_ids:
            ea, eb = a[q], b[q]
            self.assertEqual(set(ea), set(eb))
            for key in ea:
                self.assertAlmostEqual(ea[key], eb[key], places=3, msg=key)

    def test_disk_quantized_hybrid(self):
        """OnDiskIndex(hbm_cache, hbm_budget) over a quantized file."""
        import shutil

        from fastforward_tpu.quantizer import PQ

        tmp = tempfile.mkdtemp()
        try:
            quantizer = PQ(16, 16)
            quantizer.fit(CORPUS)
            path = Path(tmp) / "pq.h5"
            index = OnDiskIndex(
                path, ENC, quantizer=quantizer, mode=Mode.PASSAGE
            )
            index.add(CORPUS, psg_ids=[f"p{i}" for i in range(N)])
            plain = OnDiskIndex.load(
                path, ENC, mode=Mode.PASSAGE, hbm_cache=True
            )
            hybrid = OnDiskIndex.load(
                path,
                ENC,
                mode=Mode.PASSAGE,
                hbm_cache=True,
                hbm_budget=self.PQ_BUDGET,
                stream_chunk_rows=1024,
            )
            self._assert_parity(plain, hybrid, _psg_ranking(), "pq")
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


class TestHybridPallasFallback(unittest.TestCase):
    def test_kernel_failure_falls_back_to_scan(self):
        """A failing Pallas kernel inside the hybrid tail loop must note
        the failure and serve the call through the XLA scan (the TPU
        kernel cannot run on the CPU backend, so force-enabling it here
        exercises the real failure path end-to-end)."""
        from fastforward_tpu.ops import scoring

        scoring.set_pallas_stream(True)
        try:
            index = _psg_index(hbm_budget=BUDGET, stream_chunk_rows=1024)
            ranking = _psg_ranking()
            out = index(ranking)["q1"]
            for pid in list(out)[:5]:
                truth = float(CORPUS[int(pid[1:])] @ QVECS["a"])
                self.assertAlmostEqual(truth, out[pid], places=3, msg=pid)
            self.assertGreaterEqual(scoring._pallas_failures, 0)
            # warm repeat stays on the rebuilt scan plan
            again = index(ranking)["q1"]
            self.assertEqual(out, again)
        finally:
            scoring.set_pallas_stream(None)

    def test_pq_kernel_failure_falls_back_to_scan(self):
        """Same failure contract for the hybrid ADC (PQ) tail loop: the
        lane-padded blocks and block-diagonal codebooks are built for the
        kernel, the kernel fails on CPU, and the call re-serves through
        the XLA ADC scan with compact blocks."""
        from fastforward_tpu.ops import scoring
        from fastforward_tpu.quantizer import PQ

        scoring.set_pallas_stream(True)
        try:
            quantizer = PQ(16, 16)
            quantizer.fit(CORPUS)
            index = InMemoryIndex(
                ENC,
                quantizer=quantizer,
                mode=Mode.PASSAGE,
                hbm_budget=50_000,
                stream_chunk_rows=1024,
            )
            index.add(CORPUS, psg_ids=[f"p{i}" for i in range(N)])
            view = index._device_view()
            self.assertEqual("hybrid", view.kind)
            self.assertEqual("pq", view.hybrid_kind)
            ranking = _psg_ranking()
            out = index(ranking)["q1"]
            decoded = quantizer.decode(quantizer.encode(CORPUS))
            for pid in list(out)[:5]:
                truth = float(decoded[int(pid[1:])] @ QVECS["a"])
                self.assertAlmostEqual(truth, out[pid], places=3, msg=pid)
            self.assertEqual(out, index(ranking)["q1"])  # warm repeat
        finally:
            scoring.set_pallas_stream(None)


if __name__ == "__main__":
    unittest.main()
