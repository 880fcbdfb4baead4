"""The index layer: vector store + TPU scoring engine.

Capability contract mirrors the reference ``Index`` ABC (reference:
``index/base.py:30-513``): ``add`` vectors with document/passage IDs, call the
index on a ``Ranking`` to compute semantic re-ranking scores, iterate in
batches, switch ranking ``Mode``.

The scoring path is redesigned TPU-first (SURVEY.md §7): instead of
string-keyed pandas merges and a numpy dot-product loop, the host resolves
IDs to int32 rows (natively) and builds a dense ``(pairs, K)`` candidate
layout; a single jitted device program gathers candidate vectors from the
HBM table, (de)quantizes, computes dot products and applies the ranking
mode as a masked K-axis reduction (see ``fastforward_tpu.ops.scoring``).
Transfers per call are minimal: one int32 index array down (just the row
array in the common one-vector-per-pair case), the score vector back.
"""

import abc
import logging
import threading
import weakref
from collections import OrderedDict, defaultdict
from collections.abc import Callable, Iterable, Iterator, Sequence
from typing import NamedTuple
import dataclasses
from dataclasses import dataclass, field
from time import perf_counter

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
from tqdm import tqdm

from fastforward_tpu import ops
from fastforward_tpu.encoder.base import Encoder
from fastforward_tpu.index.mode import GROUPED_OP, REDUCE_OP, Mode
from fastforward_tpu.index.util import expand_pairs, expand_pairs_grouped
from fastforward_tpu.quantizer import Quantizer
from fastforward_tpu.quantizer.pq import OPQ
from fastforward_tpu.quantizer.scalar import ScalarQuantizer
from fastforward_tpu.ranking import Ranking

LOGGER = logging.getLogger(__name__)

IDSequence = Sequence[str | None]


@dataclass
class DeviceView:
    """Device-resident scoring arrays for an index backend.

    ``kind`` selects the device program: ``"dense"`` scores against a
    ``(N, dim)`` table, ``"pq"`` against PQ codes + codebooks (ADC),
    ``"scalar"`` against int8 codes with per-dimension scales folded into the
    queries, ``"hybrid"`` against an HBM-resident prefix (``table``) plus a
    host-RAM tail streamed in candidate blocks (``ops.host_stream`` — the
    beyond-HBM tier).  When ``mesh`` is set the table is row-sharded over
    the mesh's ``shard`` axis and scoring runs the SPMD program
    (``fastforward_tpu.parallel.sharded``).
    """

    kind: str
    table: jax.Array
    codebooks: jax.Array | None = None
    scales: np.ndarray | None = None
    mesh: "jax.sharding.Mesh | None" = None
    precision: str = "exact"
    #: hybrid tier: host tail ``(N - tail_start, dim)``, the
    #: global row where it starts, streamed-block size, and the HBM bytes a
    #: plan may spend keeping tail blocks device-resident across calls
    host_tail: np.ndarray | None = None
    tail_start: int = 0
    chunk_rows: int = 0
    tail_cache_budget: int = 0
    #: what the hybrid tier streams: ``"dense"`` fp32/bf16 rows,
    #: ``"scalar"`` int8 code rows (scales fold into the queries), or
    #: ``"pq"`` PQ code rows (ADC-streamed against ``codebooks``)
    hybrid_kind: str = "dense"
    #: view-lifetime cache for table-derived device artifacts (e.g. the
    #: lane-aligned PQ copies the Pallas ADC kernel consumes)
    aux: dict = field(default_factory=dict)


def build_hybrid_view(
    data: np.ndarray,
    num: int,
    dim: int,
    hbm_budget: int,
    precision: str,
    chunk_rows: int | None = None,
    bf16: bool = False,
    kind: str = "dense",
    codebooks: np.ndarray | None = None,
    scales: np.ndarray | None = None,
    mesh: "jax.sharding.Mesh | None" = None,
) -> DeviceView | None:
    """Build a beyond-HBM hybrid view, or ``None`` when the table fits.

    ~70% of ``hbm_budget`` holds an HBM-resident prefix of ``data``; the
    remaining rows stay in host RAM (zero-copy view when ``data`` is
    contiguous in the staged dtype) and are streamed per call as candidate
    blocks, with the leftover budget caching hot blocks device-side across
    calls (``fastforward_tpu.ops.host_stream``).

    Works for every table kind: dense fp32/bf16 rows, int8 scalar codes
    (``kind="scalar"`` — scales fold into the queries), and PQ code rows
    (``kind="pq"`` — ADC-streamed against the replicated ``codebooks``;
    MS MARCO v2-scale int8/PQ tables exceed one chip's HBM too).

    :param data: Host rows, ``(num, width)`` — fp32 vectors, int8 codes,
        or uint8 PQ codes.
    :param num: Number of real rows.
    :param dim: Vector dimensionality (must be a multiple of 128; for
        ``kind="pq"`` this is the ORIGINAL dim — the code width is
        ``data.shape[1]``).
    :param hbm_budget: Scoring-HBM budget in bytes.
    :param precision: Dot precision tier.
    :param chunk_rows: Streamed-block size (default
        ``ops.host_stream.HOST_CHUNK_ROWS``).
    :param bf16: Store the resident prefix (and stream blocks) as bf16
        (``kind="dense"`` only).
    :param codebooks: PQ codebooks ``(M, Ks, Ds)`` fp32 (``kind="pq"``).
    :param scales: Per-dimension scales (``kind="scalar"``; stored on the
        view for query folding).
    :param mesh: When set, ``hbm_budget`` is PER CHIP: the resident prefix
        is row-sharded over the mesh's ``shard`` axis (capacity = chips x
        budget) and scored by the per-shard SPMD programs; only corpora
        beyond the WHOLE MESH's budget stream a host tail.
    """
    from fastforward_tpu.ops import host_stream

    num_shards = int(mesh.shape["shard"]) if mesh is not None else 1
    budget = hbm_budget
    if kind == "pq":
        from fastforward_tpu.ops.scoring import pallas_stream_enabled
        from fastforward_tpu.ops.stream_kernel_pq import M_PAD

        m = data.shape[1]
        # the ADC kernel consumes lane-padded (N, M_PAD) codes; store the
        # resident prefix in that layout when the kernel will run (one HBM
        # copy serves kernel + scan + gather paths, same trade as
        # InMemoryIndex._device_view) and account the budget honestly.
        # Sharded prefixes stay compact (the SPMD ADC programs slice
        # [:, :m]; the tail kernel pads its own blocks at stage time)
        pad_for_kernel = (
            m <= M_PAD and mesh is None and pallas_stream_enabled()
        )
        width = M_PAD if pad_for_kernel else m
        row_bytes = width
        stage_dtype = data.dtype
        # codebooks + the kernel's block-diagonal bf16 splits are HBM too
        # (the TAIL blocks run the kernel even when the resident prefix is
        # sharded, so the splits are charged whenever the kernel is live)
        mm, ks, ds = codebooks.shape
        budget -= mm * ks * ds * 4
        if (
            pallas_stream_enabled()
            and ds <= 128
            and 128 % ds == 0
            and mm % (128 // ds) == 0
        ):
            g = 128 // ds
            budget -= 3 * (mm // g) * g * ks * 128 * 2
        budget = max(0, budget)
    elif kind == "scalar":
        width = dim
        row_bytes = dim
        stage_dtype = np.int8
    else:
        width = dim
        row_bytes = dim * (2 if bf16 else 4)
        stage_dtype = np.float32
    n_pad = -(-num // 4096) * 4096
    if n_pad * row_bytes <= budget * num_shards:
        return None  # fits: plain (possibly sharded) device table
    per_chip = (int(budget * 0.7) // row_bytes) // 1024 * 1024
    resident = per_chip * num_shards
    if resident >= num:
        return None
    if resident == 0:
        mesh = None  # nothing sharded: an all-tail view is single-device
        num_shards = 1
    # 2D (N, width) tables everywhere: dense/scalar lanes are exact
    # 128-multiples, so the device layout has no sublane padding and
    # row_bytes is exact
    def _upload(res2):
        if mesh is None:
            from fastforward_tpu.ops.upload import upload_table

            return upload_table(res2)
        from fastforward_tpu.parallel.multihost import put_row_sharded

        return put_row_sharded(mesh, res2, ndim=2)

    if kind == "pq":
        if resident > 0:
            if width == m and data.dtype == stage_dtype:
                res2 = np.ascontiguousarray(data[:resident])
            else:
                res2 = np.zeros((resident, width), dtype=data.dtype)
                res2[:, :m] = data[:resident]
            res_dev = _upload(res2)
        else:
            res_dev = jnp.zeros((0, width), jnp.dtype(data.dtype))
    elif kind == "scalar":
        if resident > 0:
            res_dev = _upload(
                np.ascontiguousarray(data[:resident], dtype=np.int8)
            )
        else:
            res_dev = jnp.zeros((0, dim), jnp.int8)
    elif resident > 0:
        res2 = np.ascontiguousarray(data[:resident], dtype=np.float32)
        if bf16:
            import ml_dtypes

            res2 = res2.astype(ml_dtypes.bfloat16)
        res_dev = _upload(res2)
    else:
        res_dev = jnp.zeros((0, dim), jnp.bfloat16 if bf16 else jnp.float32)
    tail = data[resident:num]
    if tail.dtype != stage_dtype or not tail.flags["C_CONTIGUOUS"]:
        tail = np.ascontiguousarray(tail, dtype=stage_dtype)
    LOGGER.info(
        "%s table (%d rows x %d B) exceeds the %d-byte HBM budget: serving "
        "from the hybrid tier (%d resident rows, %d host-streamed)",
        kind,
        num,
        row_bytes,
        hbm_budget,
        resident,
        tail.shape[0],
    )
    cb_dev = None
    if kind == "pq":
        cb_np = np.asarray(codebooks, dtype=np.float32)
        if mesh is not None:
            from fastforward_tpu.parallel.multihost import put_replicated

            cb_dev = put_replicated(mesh, cb_np)
        else:
            cb_dev = jnp.asarray(cb_np)
    return DeviceView(
        kind="hybrid",
        table=res_dev,
        codebooks=cb_dev,
        scales=scales,
        mesh=mesh,
        precision=precision,
        host_tail=tail,
        tail_start=resident,
        chunk_rows=chunk_rows or host_stream.HOST_CHUNK_ROWS,
        # leftover budget caches tail blocks device-side (shared across
        # plans via view.aux; the tail streams through ONE chip, so the
        # leftover is per-chip too).  NOTE: the one-deep upload prefetch
        # keeps up to two TRANSIENT chunk slabs in flight on top of this;
        # size hbm_budget with ~2 x chunk_rows x row_bytes of headroom.
        tail_cache_budget=max(0, budget - per_chip * row_bytes),
        hybrid_kind=kind,
    )


class _PackedScores(NamedTuple):
    """u16-transport score buffer: in-band header + codes (one fetch)."""

    packed: "jax.Array"  # (4 + S,) uint16, see ops.encode_scores_u16


def _fetch_scores_np(scores_dev) -> np.ndarray:
    """One-shot score fetch; decodes the u16 transport when present."""
    if isinstance(scores_dev, _PackedScores):
        return ops.decode_scores_u16(ops.fetch_np(scores_dev.packed))
    return ops.fetch_np(scores_dev)


def _cat_from_codes(codes: np.ndarray, like: "pd.Categorical") -> "pd.Categorical":
    """Wrap already-gathered codes in ``like``'s categorical dtype.

    ``validate=False`` skips the O(n) code-range scan — the codes are takes
    of ``like.codes`` so they are valid by construction (older pandas
    without the kwarg falls back to the validating path).
    """
    try:
        return pd.Categorical.from_codes(codes, dtype=like.dtype, validate=False)
    except TypeError:  # pragma: no cover - pandas < 2.1
        return pd.Categorical.from_codes(codes, dtype=like.dtype)


def _overlap_fetch_sort(
    scores_dev,
    segments: tuple,
    n_pairs: int,
    sinks: "tuple[tuple, tuple] | None" = None,
) -> "tuple[np.ndarray, np.ndarray, bool] | None":
    """Chunked device->host score fetch overlapped with result ordering.

    The per-call score copy is the dominant warm-call cost on remote-
    attached devices; fetching it in chunks lets the native per-query rank
    sort run on landed queries while later chunks are still in flight.

    ``sinks = (srcs, dsts)``: aligned tuples of 1-d arrays — ``srcs`` in
    candidate (input) order, ``dsts`` in result order; the fetched score
    buffer itself is an implicit first src whose dst must be passed as
    ``dsts[0]`` with ``srcs[0] is None``.  As soon as a contiguous result
    region's take entries are final, ``dst[region] = src[take[region]]``
    runs under the still-in-flight later chunks, hiding the result
    assembly gathers behind the transfer.

    ``scores_dev`` may also be a u16-transport ``_PackedScores`` buffer
    (see ``ops.encode_scores_u16``): the 4-lane calibration header rides
    in-band at the front (a separate header fetch would pay the link's
    large fixed per-fetch cost a second time), and each landed u16 chunk
    is dequantized into the fp32 buffer before its queries are sorted.

    Returns ``(scores, take, materialized)`` — ``materialized`` reports
    that every sink row was written — or ``None`` when the native
    segmented sort is unavailable (the caller then runs the one-shot
    path).
    """
    raw = None
    if isinstance(scores_dev, _PackedScores):
        packed = scores_dev.packed
        if np.dtype(packed.dtype) != np.uint16:
            return None
        fetch_arr = packed
        raw = np.empty(int(packed.shape[0]), dtype=np.uint16)
        n_scores = int(packed.shape[0]) - 4
    elif np.dtype(scores_dev.dtype) != np.float32:
        return None
    else:
        fetch_arr = scores_dev
        n_scores = int(scores_dev.shape[0])
    from fastforward_tpu.runtime.idmap import segmented_rank_argsort_into

    seg_starts, out_starts = segments
    seg_starts = np.ascontiguousarray(seg_starts, dtype=np.int64)
    out_starts = np.ascontiguousarray(out_starts, dtype=np.int64)
    num_q = out_starts.shape[0]
    seg_ends = seg_starts[1:]
    # the device buffer may carry bucket padding past n_pairs
    buf = np.empty(n_scores, dtype=np.float32)
    take = np.empty(n_pairs, dtype=np.int64)
    pairs = ()
    if sinks is not None:
        srcs, dsts = sinks
        pairs = tuple(
            (buf if src is None else src, dst) for src, dst in zip(srcs, dsts)
        )
    # mat_lo: result rows [mat_lo, n_pairs) are materialized into the sinks.
    # Sorted blocks land in input order; their result positions tile a
    # suffix exactly when the covered length matches (blocks are disjoint
    # and all end <= n_pairs), so the suffix check is also the hole check.
    state = {
        "q": 0,
        "ok": True,
        "covered": 0,
        "lo_min": n_pairs,
        "mat_lo": n_pairs,
        "deq": 0,
    }

    def on_chunk(lo: int, hi: int) -> None:
        if not state["ok"]:
            return
        if raw is not None:  # u16 transport: dequantize the landed prefix
            if hi < 4:
                return  # in-band header not complete yet
            hdr = state.get("hdr")
            if hdr is None:
                hdr = ops.decode_u16_header(raw[:4])
                state["hdr"] = hdr
            a, b = state["deq"], hi - 4  # score coords (raw is offset by 4)
            if b > a:
                t = raw[a + 4 : hi].astype(np.float32)
                t *= hdr[1]
                t += hdr[0]
                buf[a:b] = t
                state["deq"] = b
            hi = b
        q0 = state["q"]
        # queries whose candidate block ends at or before the landed prefix
        q1 = int(np.searchsorted(seg_ends, min(hi, n_pairs), side="right"))
        if q1 <= q0:
            return
        if not segmented_rank_argsort_into(
            buf, seg_starts[q0 : q1 + 1], out_starts[q0:q1], take
        ):
            state["ok"] = False
            return
        state["q"] = q1
        if not pairs:
            return
        state["covered"] += int(seg_starts[q1] - seg_starts[q0])
        state["lo_min"] = min(state["lo_min"], int(out_starts[q0:q1].min()))
        if (
            state["covered"] == n_pairs - state["lo_min"]
            and state["lo_min"] < state["mat_lo"]
        ):
            region = slice(state["lo_min"], state["mat_lo"])
            sl = take[region]
            for src, dst in pairs:
                dst[region] = src[sl]
            state["mat_lo"] = state["lo_min"]

    ops.fetch_np_overlapped(
        fetch_arr, on_chunk=on_chunk, out=buf if raw is None else raw
    )
    if not state["ok"] or state["q"] < num_q:
        return None
    materialized = False
    if pairs:
        if state["mat_lo"] > 0:  # remainder (or non-suffix tiling orders)
            region = slice(0, state["mat_lo"])
            sl = take[region]
            for src, dst in pairs:
                dst[region] = src[sl]
        materialized = True
    return buf[:n_pairs], take, materialized


def _desc_rank_order(qhi: np.ndarray, scores: np.ndarray) -> np.ndarray:
    """Stable result order for (q_id desc, score desc) in ONE pass.

    ``qhi`` holds the per-row query rank pre-shifted into the high 32 bits
    of a uint64; the low 32 bits get the bit-twiddled descending float32
    score (sign-flip trick: negatives map below positives, larger scores
    to smaller keys).  Sorted by the native radix argsort with a stable
    numpy argsort fallback.  Shared by the dense fast path and the ES
    assembly so the key scheme lives in exactly one place.
    """
    from fastforward_tpu.runtime.idmap import radix_argsort

    bits = np.ascontiguousarray(scores, dtype=np.float32).view(np.uint32)
    score_asc = np.where(bits >> 31 != 0, ~bits, bits | np.uint32(0x80000000))
    key = qhi | (np.uint32(0xFFFFFFFF) - score_asc).astype(np.uint64)
    order = radix_argsort(key)
    if order is None:
        order = np.argsort(key, kind="stable")
    return order


def _run_heads(col: pd.Series) -> np.ndarray:
    """Boolean mask of run heads (``col[i] != col[i-1]``; ``[0]`` is True).

    Vectorized per backing storage — categorical codes, pyarrow
    neighbor-compare, or object numpy — so per-request serving prep never
    hashes the column (``pd.factorize``) or materializes it as Python
    strings just to find the query-run boundaries.
    """
    n = len(col)
    first = np.empty(n, dtype=bool)
    if not n:
        return first
    first[0] = True
    if n == 1:
        return first
    if isinstance(col.dtype, pd.CategoricalDtype):
        codes = col.cat.codes.to_numpy()
        np.not_equal(codes[1:], codes[:-1], out=first[1:])
        return first
    pa_arr = getattr(col.array, "_pa_array", None)
    if pa_arr is not None:
        import pyarrow.compute as pc

        comb = pa_arr.combine_chunks()
        ne = pc.fill_null(
            pc.not_equal(comb.slice(1), comb.slice(0, n - 1)), True
        )
        first[1:] = ne.to_numpy(zero_copy_only=False)
        return first
    vals = col.to_numpy(dtype=object)
    np.not_equal(vals[1:], vals[:-1], out=first[1:])
    return first


class ScoreFuture:
    """Handle for an in-flight :meth:`Index.submit` call.

    ``result()`` completes the call — the link-bound score fetch plus the
    result assembly — and returns the scored ranking; it is idempotent.
    When the workload needed a fallback path the ranking was computed
    eagerly at submit time and ``result()`` returns it directly (check
    :attr:`pipelined` to see which happened).
    """

    __slots__ = ("_finish", "_result", "_pipelined")

    def __init__(
        self,
        finish: "Callable[[], Ranking] | None" = None,
        result: "Ranking | None" = None,
    ) -> None:
        self._finish = finish
        self._result = result
        self._pipelined = finish is not None

    @property
    def pipelined(self) -> bool:
        """Whether the call actually deferred its fetch (vs eager)."""
        return self._pipelined

    def result(self) -> Ranking:
        """Fetch scores, assemble and return the ranking (idempotent)."""
        if self._result is None:
            assert self._finish is not None
            self._result = self._finish()
            self._finish = None
        return self._result


class Index(abc.ABC):
    """Abstract base class for TPU-backed Fast-Forward indexes."""

    _query_encoder: Encoder | None = None
    _quantizer: Quantizer | None = None

    #: score transport for the fast serving path: "f32" ships exact fp32
    #: scores; "u16" affine-quantizes them on device and dequantizes on the
    #: host, halving the per-call device->host copy (the dominant warm-call
    #: cost on remote-attached hosts).  Max added error per call is
    #: score_range / 131070 — below the "fast" tier's compute error.
    _score_transport = "f32"

    def __init__(
        self,
        query_encoder: Encoder | None = None,
        quantizer: Quantizer | None = None,
        mode: Mode = Mode.MAXP,
        encoder_batch_size: int = 32,
        score_transport: str = "f32",
    ) -> None:
        """Create an index.

        :param query_encoder: The query encoder to use.
        :param quantizer: The quantizer to use.
        :param mode: The ranking mode.
        :param encoder_batch_size: The query-encoder batch size.
        :param score_transport: ``"f32"`` (exact) or ``"u16"`` (compact
            device->host score copy, ~half the per-call transfer on
            remote-attached serving hosts; adds at most
            ``score_range / 131070`` absolute score error per call).
        """
        if score_transport not in ("f32", "u16"):
            raise ValueError(
                f"score_transport must be 'f32' or 'u16', got "
                f"{score_transport!r}"
            )
        if query_encoder is not None:
            self.query_encoder = query_encoder
        self.mode = mode
        if quantizer is not None:
            self.quantizer = quantizer
        self._encoder_batch_size = encoder_batch_size
        self._score_transport = score_transport
        # host string-ID -> int-row map (native C++ when available); the
        # device only ever sees int32 rows + segment ids
        from fastforward_tpu.runtime import create_idmap

        self._ids = create_idmap()
        # prepared-run plans: per-(ranking frame, mode) caches of everything
        # that depends only on the candidate set and the table — resolved
        # rows, streamed layouts with device-resident grids, sort keys.
        # Re-scoring the same run then pays only encode + kernel + fetch.
        self._plans: OrderedDict[tuple, dict] = OrderedDict()
        # guards the plan-cache MAP (not individual plans: concurrent
        # callers always operate on DISTINCT rankings — BatchingServer
        # prep workers build plans for different merged batches in
        # parallel, each under its own key)
        self._plans_lock = threading.Lock()
        # preload-warm twin view (see _active_view); None outside preload
        self._view_override: DeviceView | None = None
        # background exact-fp32 tail of a progressive preload (see
        # preload(progressive=True) / preload_join)
        self._progressive_thread: "threading.Thread | None" = None

    _MAX_PLANS = 4

    def _get_plan(self, ranking: Ranking) -> dict:
        """Return (creating if needed) the prepared-run plan for a ranking.

        Keyed on the ranking frame's object identity + ranking mode; a
        weakref callback evicts the entry when the frame is garbage
        collected (so a recycled ``id()`` can never alias), and ``add``
        clears all plans (the table changed).  Rankings are treated as
        immutable throughout, so identity implies an identical candidate
        set.
        """
        key = (id(ranking._df), self._mode)
        with self._plans_lock:
            plan = self._plans.get(key)
            if plan is None:
                plans = self._plans

                def _evict(_ref, _key=key, _plans=plans):
                    _plans.pop(_key, None)

                plan = {"_frame_ref": weakref.ref(ranking._df, _evict)}
                plans[key] = plan
                while len(plans) > self._MAX_PLANS:
                    plans.popitem(last=False)
            else:
                self._plans.move_to_end(key)
        return plan

    # -- encoders ------------------------------------------------------------

    def encode_queries(self, queries: Sequence[str]) -> np.ndarray:
        """Encode queries with the query encoder (micro-batched).

        :param queries: The queries to encode.
        :raises RuntimeError: When no query encoder exists.
        :return: The query vectors, shape ``(len(queries), dim)``.
        """
        if self.query_encoder is None:
            raise RuntimeError("Index does not have a query encoder.")
        parts = [
            self.query_encoder(queries[i : i + self._encoder_batch_size])
            for i in range(0, len(queries), self._encoder_batch_size)
        ]
        return np.concatenate(parts)

    @property
    def query_encoder(self) -> Encoder | None:
        """The query encoder (if any)."""
        return self._query_encoder

    @query_encoder.setter
    def query_encoder(self, encoder: Encoder) -> None:
        assert isinstance(encoder, Encoder)
        self._query_encoder = encoder

    # -- quantizer -----------------------------------------------------------

    @property
    def quantizer(self) -> Quantizer | None:
        """The quantizer (if any)."""
        return self._quantizer

    def _on_quantizer_set(self) -> None:
        """Backend hook: a quantizer was attached to this index."""
        pass

    @quantizer.setter
    def quantizer(self, quantizer: Quantizer) -> None:
        assert isinstance(quantizer, Quantizer)
        if len(self) > 0:
            raise RuntimeError("Quantizers can only be attached to empty indexes.")
        self._quantizer = quantizer
        self._on_quantizer_set()
        quantizer.set_attached()

    # -- mode / shape properties ---------------------------------------------

    @property
    def mode(self) -> Mode:
        """The ranking mode."""
        return self._mode

    @mode.setter
    def mode(self, mode: Mode) -> None:
        assert isinstance(mode, Mode)
        self._mode = mode

    @abc.abstractmethod
    def _get_internal_dim(self) -> int | None:
        pass

    @property
    def dim(self) -> int | None:
        """Dimensionality of the (decoded) vectors; ``None`` if empty."""
        if self._quantizer is not None:
            return self._quantizer.dims[0]
        return self._get_internal_dim()

    @property
    def doc_ids(self) -> set[str]:
        """All unique document IDs."""
        return self._ids.doc_id_set()

    @property
    def psg_ids(self) -> set[str]:
        """All unique passage IDs."""
        return self._ids.psg_id_set()

    @abc.abstractmethod
    def _get_num_vectors(self) -> int:
        pass

    def __len__(self) -> int:
        """Number of vectors in the index."""
        return self._get_num_vectors()

    # -- adding vectors ------------------------------------------------------

    @abc.abstractmethod
    def _add(
        self, vectors: np.ndarray, doc_ids: IDSequence, psg_ids: IDSequence
    ) -> None:
        """Store (possibly quantized) vectors and their IDs (backend)."""
        pass

    def add(
        self,
        vectors: np.ndarray,
        doc_ids: IDSequence | None = None,
        psg_ids: IDSequence | None = None,
    ) -> None:
        """Add vectors and their document/passage IDs to the index.

        Only one of ``doc_ids`` / ``psg_ids`` may be ``None``; individual IDs
        may be ``None`` but every vector needs at least one ID.  Document IDs
        may repeat (multi-passage documents); passage IDs must be unique.

        :param vectors: The vectors, shape ``(num_vectors, dim)``.
        :param doc_ids: Corresponding document IDs.
        :param psg_ids: Corresponding passage IDs.
        :raises ValueError: When ID counts don't match the vector count.
        :raises ValueError: When the dimensionality doesn't match the index.
        :raises ValueError: When a vector has neither ID.
        :raises RuntimeError: When the backend rejects the add.
        """
        num_vectors, dim = vectors.shape
        if doc_ids is None:
            doc_ids = [None] * num_vectors
        if psg_ids is None:
            psg_ids = [None] * num_vectors
        if not len(doc_ids) == len(psg_ids) == num_vectors:
            raise ValueError("Number of IDs does not match number of vectors.")
        if self.dim is not None and dim != self.dim:
            raise ValueError(
                f"Input vector dimensionality ({dim}) does not match "
                f"index dimensionality ({self.dim})."
            )
        for doc_id, psg_id in zip(doc_ids, psg_ids):
            if doc_id is None and psg_id is None:
                raise ValueError("Vector has neither document nor passage ID.")

        if self._quantizer is not None:
            vectors = self._quantizer.encode(vectors)
        self._add(vectors, doc_ids, psg_ids)
        # prepared plans hold row indices into the (now stale) table
        self._plans.clear()

    # -- scoring -------------------------------------------------------------

    @abc.abstractmethod
    def _get_vectors(self, ids: Iterable[str]) -> tuple[np.ndarray, list[str]]:
        """Return stored (possibly quantized) vectors for IDs (backend, host).

        The result order is unspecified; each vector is paired with its ID in
        the returned list.  Depends on the current mode.

        :param ids: The document/passage IDs.
        :raises IndexError: When an ID is not found.
        :return: The vectors and the corresponding IDs.
        """
        pass

    def _device_view(self) -> DeviceView | None:
        """Backend hook: device-resident arrays for the fused scoring path.

        ``None`` means the backend stores vectors off-device (e.g. on disk);
        scoring then gathers candidates on the host per call.
        """
        return None

    def _twin_view(self) -> DeviceView | None:
        """Backend hook: zeros-shaped twin of the (unbuilt) device view.

        A twin has the exact shapes/dtypes the real view will have but its
        table is created ON DEVICE (``jnp.zeros`` — no host->device
        transfer).  ``preload`` warms every device program against the twin
        while the real table upload rides in a background thread: programs
        are keyed on avals, so they are cache hits when the real view lands
        (probed on the tunnel: a program first-run against the zeros twin
        re-ran against the real table with zero recompile).  ``None`` means
        the backend can't (or need not) build one — preload then uploads
        first and warms after, sequentially.
        """
        return None

    def _active_view(self) -> DeviceView | None:
        """The scoring view: the preload-warm twin override, if set.

        Scoring paths resolve the device view through this so that
        ``preload``'s warm phase can run against the zeros twin while the
        real upload is still in flight.  Outside preload it is exactly
        ``_device_view()``.
        """
        override = self._view_override
        return override if override is not None else self._device_view()

    @staticmethod
    def _ensure_compile_cache() -> None:
        """Enable JAX's persistent compilation cache when none is configured.

        Remote/TPU compiles of the serving programs cost minutes per
        process; the persistent cache turns every later process's warm
        into a sub-second disk hit (measured on the dev tunnel: 195 s
        first compile -> 0.6 s cached).  Users who configured their own
        ``jax_compilation_cache_dir`` (or set ``FFTPU_NO_COMPILE_CACHE``)
        are left alone.
        """
        import os

        try:
            if (
                jax.config.jax_compilation_cache_dir
                or os.environ.get("FFTPU_NO_COMPILE_CACHE")
            ):
                return
            from pathlib import Path

            path = (
                Path(os.environ.get("XDG_CACHE_HOME", Path.home() / ".cache"))
                / "fastforward_tpu"
                / "xla_cache"
            )
            path.mkdir(parents=True, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", str(path))
            LOGGER.info("persistent XLA compile cache enabled at %s", path)
        except Exception:  # pragma: no cover - cache is best-effort
            LOGGER.debug("could not enable persistent compile cache")

    def _progressive_job(self):
        """Backend hook: split-plane progressive upload job, or ``None``.

        See :class:`fastforward_tpu.index.memory._ProgressiveUpload` for
        the resident-dense implementation; backends without one fall back
        to the standard upload inside :meth:`preload`.
        """
        return None

    def preload_join(self, timeout: "float | None" = None) -> bool:
        """Wait for a progressive preload's exact-fp32 tail to land.

        After ``preload(..., progressive=True)`` returns, serving runs
        against the truncated-fp32 table (bf16-magnitude score error,
        identical to the ``"fast"`` tier's) while the low 16-bit planes
        upload in the background; this blocks until the exact table has
        been swapped in.  No-op (returns ``True``) when no progressive
        tail is pending.

        :param timeout: Seconds to wait (``None`` = forever).
        :return: Whether the exact table is installed.
        """
        thread = self._progressive_thread
        if thread is None:
            return True
        thread.join(timeout)
        if thread.is_alive():
            return False
        self._progressive_thread = None
        return True

    def preload(
        self,
        warm: "tuple[int, int] | None" = None,
        serve: "tuple[float, int] | None" = None,
        progressive: bool = False,
    ) -> bool:
        """Eagerly build/upload the device scoring table.

        Normally the upload happens lazily on the first scoring call; call
        this to move it off the serving path.

        With ``warm=(num_queries, depth)`` the call additionally runs ONE
        synthetic re-ranking of that workload shape through the exact
        production path, so every device program the serving shapes need
        (query upload, streaming kernel, slot gather, result sort) is
        traced, compiled, and cached before the first real request —
        remote-compiled TPU programs can cost minutes on first use.
        Compiled programs are keyed on *bucketed* shapes, so any serving
        call with the same ``bucket(num_queries)`` / ``bucket(pairs)``
        hits the warm cache.  The synthetic plan itself is dropped.

        With ``serve=(alpha, cutoff)`` (requires ``warm``) the synthetic
        workload additionally runs through :meth:`serve`, compiling the
        fused interpolate + top-k program for that cutoff as well; an
        optional third element warms the two-phase path
        (``serve=(alpha, cutoff, refine_margin)``).

        On single-device backends the upload and the warm OVERLAP: the warm
        runs against a zeros-shaped twin of the device view (programs are
        keyed on avals, so every twin-compiled program is a cache hit for
        the real table) while the real upload rides in a background thread
        — and the rerank and serve warms themselves run in parallel threads
        (the compile service handles concurrently dispatched programs in
        parallel; measured two first-executions in threads = 1x wall).
        Per-phase wall times are recorded in ``self._preload_stats``.

        With ``progressive=True`` (large dense fp32 resident tables) the
        upload ships the table's HIGH 16-bit planes only — half the
        bytes, so serving starts in roughly half the upload time —
        expands them on device into a truncated-fp32 table with the
        final table's aval (every warmed program applies unchanged), and
        folds the low planes in on a background thread.  Until
        :meth:`preload_join` reports completion, scores carry
        bf16-magnitude error (the ``"fast"`` tier's — identical top-k in
        practice); afterwards they are exactly the standard path's.
        Unsupported configurations fall back to the standard upload.

        :param warm: Optional ``(num_queries, depth)`` workload shape.
        :param serve: Optional ``(alpha, cutoff)`` to warm :meth:`serve`.
        :param progressive: Split-plane upload — serve at half the
            cold-start upload time, exact fp32 lands in the background.
        :return: Whether a device table exists for this backend.
        """
        if serve is not None and warm is None:
            raise ValueError(
                "preload(serve=...) requires warm=(num_queries, depth): the "
                "fused serve program is warmed by running the synthetic "
                "workload through serve()."
            )
        self._ensure_compile_cache()
        stats: dict = {"overlap": False}
        self._preload_stats = stats

        def _sync_table(v: "DeviceView | None") -> None:
            # jnp.asarray schedules the host->device table transfer
            # ASYNCHRONOUSLY; over a remote-attached device it can land
            # long after the call returns, and the first real dispatch
            # then blocks on it (measured: preload returned at 155.7 s
            # with a 119.7 s first-call transfer tail,
            # bench_logs/r5b_bench_overlap.log).  A one-element fetch
            # orders after the transfer — block_until_ready is not
            # reliable over the tunnel — so upload_s is honest and the
            # first real call is transfer-free.  Sharded tables are
            # skipped (a host fetch of a multi-process global array is
            # not generally addressable); their puts are synchronous.
            if v is None or v.mesh is not None:
                return
            try:
                tab = v.table
                np.asarray(tab[(0,) * (tab.ndim - 1) + (slice(0, 1),)])
            except Exception:  # pragma: no cover - sync is best-effort
                LOGGER.debug("table sync fetch failed", exc_info=True)

        job = self._progressive_job() if progressive else None
        if progressive and job is None:
            LOGGER.warning(
                "progressive preload is not supported for this "
                "configuration (needs a large dense fp32 resident table "
                "on one device); using the standard upload"
            )
        twin = self._twin_view() if warm is not None else None
        upload_thread: "threading.Thread | None" = None

        def _finish_upload() -> None:
            # join the upload, then (progressive only) install the
            # truncated-fp32 serving view and start the exact tail —
            # callers free the zeros-twin first where HBM headroom
            # matters (the expansion holds plane + table transiently)
            nonlocal job
            if upload_thread is not None:
                t0 = perf_counter()
                upload_thread.join()
                stats["upload_tail_s"] = perf_counter() - t0
            if job is not None:
                t0 = perf_counter()
                job.activate()
                stats["activate_s"] = perf_counter() - t0
                stats["progressive"] = True
                job = None

        if twin is not None:
            def _upload() -> None:
                t0 = perf_counter()
                if job is not None:
                    job.upload_hi()
                else:
                    _sync_table(self._device_view())
                stats["upload_s"] = perf_counter() - t0

            upload_thread = threading.Thread(
                target=_upload, name="ff-preload-upload", daemon=True
            )
            upload_thread.start()
            stats["overlap"] = True
            view: DeviceView | None = twin
        elif job is not None:
            t0 = perf_counter()
            job.upload_hi()
            stats["upload_s"] = perf_counter() - t0
            _finish_upload()
            view = self._device_view()
        else:
            t0 = perf_counter()
            view = self._device_view()
            _sync_table(view)
            stats["upload_s"] = perf_counter() - t0
        if view is None:
            return False
        if warm is None:
            return True
        num_q, depth = warm
        n = len(self)
        if n == 0 or num_q <= 0 or depth <= 0:
            twin = view = None
            _finish_upload()
            return True
        # candidates must SPREAD over the whole table like a production
        # run: the streamed kernel's grid is bucketed by the number of
        # candidate-bearing table tiles, so a warm run concentrated in the
        # first rows compiles a smaller grid variant and the first real
        # call recompiles anyway (measured: a 270 s "first serving call"
        # after a front-loaded warm at N=2M)
        doc_ids, psg_ids = self._ids.inverse(n)
        pool = np.asarray(
            psg_ids if self._mode == Mode.PASSAGE else doc_ids, dtype=object
        )
        total = num_q * depth
        pos = (np.arange(total, dtype=np.int64) * n) // total
        cands = pool[pos]
        # columnar run construction: 3 numpy columns -> one frame -> ctor
        # (the previous per-row dict build was ~512k interpreter-loop
        # insertions at the flagship Q=512 x depth-1000 shape, seconds of
        # pure host time on the cold-start path)
        # zero-padded DESCENDING query names + descending scores: the frame
        # is born (q_id desc, score desc)-sorted, so the ctor's 512k-row
        # sort is skipped (is_sorted=True)
        q_names = np.asarray(
            [f"ff-warm-q{i:06d}" for i in range(num_q - 1, -1, -1)],
            dtype=object,
        )
        frame = pd.DataFrame(
            {
                "q_id": np.repeat(q_names, depth),
                "id": cands,
                "score": np.tile(
                    np.arange(depth, 0, -1, dtype=np.float32), num_q
                ),
            }
        )
        # doc modes sample repeated ids; keep one score per (q, id) pair
        frame = frame[
            frame["id"].notna() & ~frame.duplicated(["q_id", "id"])
        ]
        if not len(frame):
            twin = view = None
            _finish_upload()
            return True
        queries = {q: f"ff warm query {q}" for q in q_names}
        ranking = Ranking(frame, queries=queries, copy=False, is_sorted=True)
        serve_ranking: Ranking | None = None
        encoder = self._query_encoder
        try:
            # always bypass the user's encoder for the synthetic queries:
            # it may reject texts outside its corpus (LambdaEncoder over a
            # fixed map), and the warm scores are dropped anyway
            from fastforward_tpu.encoder import LambdaEncoder

            dim = self.dim
            self._query_encoder = LambdaEncoder(
                lambda _t: np.zeros(dim, dtype=np.float32)
            )
            LOGGER.info(
                "warming scoring programs for Q=%d depth=%d",
                len(ranking),
                depth,
            )
            self._view_override = twin
            from fastforward_tpu.ops import scoring as _scoring

            fails_before = _scoring._pallas_failures_total
            serve_thread: "threading.Thread | None" = None
            serve_err: list[BaseException] = []
            if serve is not None:
                # the serve warm gets its OWN ranking (fresh frame object,
                # so a fresh plan key): the rerank and serve warms then
                # never touch the same plan dict from two threads
                serve_ranking = Ranking(
                    frame.copy(), queries=queries, copy=False, is_sorted=True
                )

                def _serve_warm() -> None:
                    t0 = perf_counter()
                    try:
                        self.serve(
                            serve_ranking,
                            serve[0],
                            serve[1],
                            refine=serve[2] if len(serve) > 2 else None,
                        )
                    except BaseException as exc:  # re-raised on join
                        serve_err.append(exc)
                    finally:
                        stats["warm_serve_s"] = perf_counter() - t0

                serve_thread = threading.Thread(
                    target=_serve_warm, name="ff-preload-serve-warm"
                )
                serve_thread.start()
            t0 = perf_counter()
            self(ranking)
            stats["warm_rerank_s"] = perf_counter() - t0
            if serve_thread is not None:
                serve_thread.join()
                if serve_err:
                    raise serve_err[0]
            if (
                _scoring._pallas_failures_total > fails_before
                and _scoring.pallas_stream_enabled()
            ):
                # a transient kernel failure during warm silently falls
                # back to XLA for that call — the kernel would then first
                # compile on the REAL serving path, exactly what warm
                # exists to prevent.  One retry re-attempts it here.
                LOGGER.warning(
                    "pallas kernel failed during warm; retrying once so "
                    "the first real call does not pay its compile"
                )
                t0 = perf_counter()
                self(ranking)
                if serve is not None:
                    self.serve(
                        serve_ranking,
                        serve[0],
                        serve[1],
                        refine=serve[2] if len(serve) > 2 else None,
                    )
                stats["warm_retry_s"] = perf_counter() - t0
        finally:
            self._view_override = None
            self._query_encoder = encoder
            self._plans.pop((id(ranking._df), self._mode), None)
            if serve_ranking is not None:
                self._plans.pop((id(serve_ranking._df), self._mode), None)
            # free the zeros-twin BEFORE the progressive activation: the
            # hi-plane expansion transiently holds plane + table (1.5x),
            # and twin + plane + table would not fit flagship HBM
            twin = view = None
            _finish_upload()
        return True

    def _prepare_queries(self, query_vectors: np.ndarray, view: DeviceView) -> np.ndarray:
        """Fold quantizer-specific transforms into the query vectors."""
        q = np.asarray(query_vectors, dtype=np.float32)
        kind = view.hybrid_kind if view.kind == "hybrid" else view.kind
        if kind == "pq" and isinstance(self._quantizer, OPQ):
            q = self._quantizer.rotate(q)
        elif kind == "scalar":
            assert isinstance(self._quantizer, ScalarQuantizer)
            q = q * self._quantizer.scales
        return q

    def _gather_view(
        self, ids: Sequence[str]
    ) -> tuple[DeviceView, np.ndarray, np.ndarray]:
        """Return (device view, per-ID row indices, per-ID row counts).

        Fast path: the backend's persistent device table + host ID maps.
        Fallback: gather (and decode) candidate vectors on the host and ship
        them to the device for this call only.
        """
        view = self._active_view()
        if view is not None:
            rows, counts = self._ids.resolve(ids, self.mode)
            return view, rows, counts

        vectors, vec_ids = self._get_vectors(ids)
        if self._quantizer is not None:
            vectors = self._quantizer.decode(vectors)
        by_id: dict[str, list[int]] = defaultdict(list)
        for pos, vid in enumerate(vec_ids):
            by_id[vid].append(pos)
        rows = np.asarray(
            [r for i in ids for r in by_id[i]], dtype=np.int32
        )
        counts = np.asarray([len(by_id[i]) for i in ids], dtype=np.int32)
        table = jnp.asarray(np.asarray(vectors, dtype=np.float32))
        return (
            DeviceView(
                "dense", table, precision=getattr(self, "_precision", "exact")
            ),
            rows,
            counts,
        )

    def _pad_queries(self, query_vectors: np.ndarray, view: DeviceView) -> np.ndarray:
        q = self._prepare_queries(query_vectors, view)
        q_bucket = ops.bucket(q.shape[0])
        q_pad = np.zeros((q_bucket, q.shape[1]), dtype=np.float32)
        q_pad[: q.shape[0]] = q
        return q_pad

    def _device_score_grouped(
        self,
        view: DeviceView,
        query_vectors: np.ndarray,
        rows_mat: np.ndarray,
        pair_qno: np.ndarray,
        counts_pp: np.ndarray,
        k: int,
        fetch: bool = True,
        plan: dict | None = None,
    ) -> "np.ndarray | jax.Array":
        """Run the scatter-free grouped scoring program (the default path).

        With ``fetch=False`` the full padded ``(s_bucket,)`` device array is
        returned (for fusing further device work before the host copy).
        ``plan`` optionally caches candidate-dependent device arrays
        (streamed layouts, bounded/grouped index buffers) across calls.
        """
        op = GROUPED_OP[self.mode]
        n_pairs = rows_mat.shape[0]
        s_bucket = ops.bucket(n_pairs)
        q_pad = self._pad_queries(query_vectors, view)
        if q_pad.shape[0] > (1 << 22):
            # qno packing uses 22 bits; fall back to the flat segment path
            valid = np.arange(k)[None, :] < counts_pp[:, None]
            rows, qno, seg = expand_pairs(
                np.arange(n_pairs, dtype=np.int64),
                pair_qno,
                rows_mat[valid].astype(np.int64),
                counts_pp,
            )
            return self._device_score_flat(
                view, query_vectors, rows, qno, seg, n_pairs
            )

        if view.kind == "hybrid":
            # beyond-HBM tier: resident-prefix scoring + candidate-block
            # streaming of the host tail (ops.host_stream).  Doc modes use
            # a RAGGED flat layout (no K-padding duplicates) and reduce on
            # device per side — the fetch is 2 x P floats, not P x K
            if k == 1:
                rows_flat = rows_mat[:, 0].astype(np.int64)
                qno_flat = pair_qno.astype(np.int64)
                reduce_spec = None
            else:
                hyb = plan.get("hybrid_ragged") if plan is not None else None
                if hyb is None:
                    valid = np.arange(k)[None, :] < counts_pp[:, None]
                    seg_flat = np.repeat(
                        np.arange(n_pairs, dtype=np.int64), counts_pp
                    )
                    hyb = (
                        rows_mat[valid].astype(np.int64),
                        pair_qno[seg_flat].astype(np.int64),
                        seg_flat,
                    )
                    if plan is not None:
                        plan["hybrid_ragged"] = hyb
                rows_flat, qno_flat, seg_flat = hyb
                reduce_spec = (op, seg_flat, n_pairs, counts_pp)
            from fastforward_tpu.ops.host_stream import hybrid_scores

            return hybrid_scores(
                view.table,
                view.host_tail,
                view.tail_start,
                view.chunk_rows,
                q_pad,
                rows_flat,
                qno_flat,
                precision=view.precision,
                plan=plan,
                cache_device_blocks_budget=view.tail_cache_budget,
                cache_store=view.aux,
                reduce=reduce_spec,
                kind=view.hybrid_kind,
                codebooks=view.codebooks,
                mesh=view.mesh,
            )

        streamable_dense = (
            view.kind in ("dense", "scalar")
            and (
                view.table.ndim == 3
                or (
                    view.table.ndim == 2
                    and view.table.shape[1] % 128 == 0
                )
            )
            and n_pairs * k * 500 > view.table.shape[0]
        )
        # PQ code tiles are M bytes/row (vs 3072 dense) while the per-row
        # gather overhead is the same, so streaming pays off at lower
        # candidate density
        streamable_pq = (
            view.kind == "pq"
            and view.table.ndim == 2
            and n_pairs * k * 200 > view.table.shape[0]
        )
        if (
            (streamable_dense or streamable_pq)
            and view.table.shape[0] % ops.STREAM_TILE_ROWS == 0
        ):
            # dense candidate sets: stream the table through the MXU instead
            # of gathering rows (XLA row gather is ~4us/row on TPU)
            if k == 1:
                rows_flat = rows_mat[:, 0].astype(np.int64)
                qno_flat = pair_qno
                reduce_spec = None
            else:
                rows_flat = rows_mat.reshape(-1).astype(np.int64)
                qno_flat = np.repeat(pair_qno, k)
                # K-axis ranking reduction on device: fetch (P,) floats
                # over the host link instead of (P, K).  On a mesh the slot
                # gather's cross-shard traffic rides ICI inside the jit —
                # still P*K floats over the interconnect but only P over
                # the (much slower) host link.
                counts_dev = (
                    plan.get("counts_dev") if plan is not None else None
                )
                if counts_dev is None:
                    if jax.process_count() > 1:
                        # multi-host: a process-committed device copy can't
                        # feed a global-mesh jit; replicated numpy can
                        counts_dev = counts_pp.astype(np.int32)
                    else:
                        counts_dev = jnp.asarray(counts_pp.astype(np.int32))
                    if plan is not None:
                        plan["counts_dev"] = counts_dev
                reduce_spec = (op, k, counts_dev)
            if streamable_pq and view.mesh is not None:
                from fastforward_tpu.parallel.sharded import (
                    streamed_scores_sharded_pq,
                )

                row_scores = streamed_scores_sharded_pq(
                    view.mesh,
                    view.table,
                    view.codebooks,
                    q_pad,
                    rows_flat,
                    qno_flat,
                    plan=plan,
                    reduce=reduce_spec,
                )
            elif streamable_pq:
                row_scores = ops.streamed_scores_pq(
                    view.table,
                    view.codebooks,
                    q_pad,
                    rows_flat,
                    qno_flat,
                    plan=plan,
                    reduce=reduce_spec,
                    precision=view.precision,
                    table_cache=view.aux,
                    fetch=fetch,
                )
            elif view.mesh is not None:
                from fastforward_tpu.parallel.sharded import (
                    streamed_scores_sharded,
                )

                row_scores = streamed_scores_sharded(
                    view.mesh,
                    view.table,
                    q_pad,
                    rows_flat,
                    qno_flat,
                    precision=view.precision,
                    plan=plan,
                    reduce=reduce_spec,
                    fetch=fetch,
                )
            else:
                row_scores = ops.streamed_scores(
                    view.table,
                    q_pad,
                    rows_flat,
                    qno_flat,
                    precision=view.precision,
                    plan=plan,
                    reduce=reduce_spec,
                    fetch=fetch,
                )
            if row_scores is not None:
                if k == 1 or row_scores.shape[0] == n_pairs:
                    # k == 1, or the K reduction already ran on device
                    return row_scores
                # ranking-mode reduction over the K axis on the host
                return ops.masked_reduce_host(
                    row_scores.reshape(n_pairs, k), counts_pp, op
                )

        if (
            k == 1
            and view.mesh is None
            and view.kind in ("dense", "scalar")
            and (n_pairs == 0 or (np.diff(pair_qno) >= 0).all())
        ):
            # single row per pair, pairs grouped by query: send only the row
            # array; the device recovers qno from per-query boundaries
            cached = plan.get("bounded") if plan is not None else None
            if cached is None:
                rows_p = np.zeros(s_bucket, dtype=np.int32)
                rows_p[:n_pairs] = rows_mat[:, 0]
                # cumulative end of each query's pair run (padding pairs
                # fall past the last bound, clipping to the padding query)
                bounds = np.searchsorted(
                    pair_qno, np.arange(q_pad.shape[0]), side="right"
                ).astype(np.int32)
                cached = (jnp.asarray(rows_p), jnp.asarray(bounds))
                if plan is not None:
                    plan["bounded"] = cached
            scores = ops.score_pairs_bounded(
                view.table, q_pad, cached[0], cached[1], precision=view.precision
            )
            if not fetch:
                return scores
            return np.asarray(jax.device_get(scores))[:n_pairs]

        # one stacked transfer: K row columns + packed (qno, counts) row
        cached_idx = plan.get("grouped_idx") if plan is not None else None
        if cached_idx is None:
            idx = np.zeros((k + 1, s_bucket), dtype=np.int32)
            idx[:k, :n_pairs] = rows_mat.T
            idx[k, :n_pairs] = (pair_qno.astype(np.int32) << 8) | counts_pp
            if plan is not None:
                # device-resident for the single-device program; the sharded
                # program places its own (data-split) sharding, so keep the
                # host array there and let the jit transfer per call
                cached_idx = idx if view.mesh is not None else jnp.asarray(idx)
                plan["grouped_idx"] = cached_idx
                idx = cached_idx
        else:
            idx = cached_idx

        if view.mesh is not None and view.kind == "pq":
            from fastforward_tpu.parallel.sharded import score_pairs_sharded_pq

            scores = score_pairs_sharded_pq(
                view.mesh, view.table, view.codebooks, q_pad, idx, op
            )
        elif view.mesh is not None:
            from fastforward_tpu.parallel.sharded import score_pairs_sharded

            scores = score_pairs_sharded(
                view.mesh, view.table, q_pad, idx, op, precision=view.precision
            )
        elif view.kind == "pq":
            scores = ops.score_pairs_grouped_pq(
                view.table, view.codebooks, q_pad, idx, op
            )
        else:
            scores = ops.score_pairs_grouped(
                view.table, q_pad, idx, op, precision=view.precision
            )
        if not fetch:
            return scores
        return ops.fetch_np(scores)[:n_pairs]

    def _candidate_arrays(
        self, df: pd.DataFrame
    ) -> "tuple[DeviceView, np.ndarray, np.ndarray, int] | None":
        """Resolve every row of ``df`` to grouped candidate arrays.

        Returns ``(view, rows_mat, counts_pp, k)`` — the dense ``(pairs, K)``
        layout consumed by :meth:`_device_score_grouped` — or ``None`` when
        documents are too ragged for the grouped layout.
        """
        view = self._active_view()
        if view is not None and self.mode in (Mode.PASSAGE, Mode.FIRSTP):
            # exactly one row per pair: resolve the whole id column directly
            # (zero-copy from the arrow buffers), skipping factorize+expand
            rows, _ = self._ids.resolve(df["id"], self.mode)
            return view, rows[:, None], np.ones(len(df), dtype=np.int32), 1
        pair_id_pos, ids_unique = pd.factorize(df["id"], sort=False)
        view, rows_concat, counts = self._gather_view(ids_unique)
        k_max = int(counts.max()) if counts.size else 1
        if k_max > self._MAX_GROUP_K:
            return None
        k = max(1, 1 << (k_max - 1).bit_length())
        rows_mat, counts_pp = expand_pairs_grouped(
            pair_id_pos.astype(np.int64), rows_concat, counts, k
        )
        return view, rows_mat, counts_pp, k

    def _score_and_sort(
        self,
        df: pd.DataFrame | None,
        query_vectors: np.ndarray,
        q_uniques,
        score_dtype,
        plan: dict | None = None,
        defer: bool = False,
    ) -> "Ranking | Callable[[], Ranking] | None":
        """Fused fast path: grouped scoring + device-side result ordering.

        Returns ``None`` when the workload needs a fallback path (very
        ragged documents).  With a *ready* ``plan`` (a previous call on the
        same ranking succeeded), ``df`` may be ``None`` — every candidate-
        derived artifact comes from the plan and only queries are live.

        With ``defer=True`` the device program is dispatched now but the
        zero-arg *finish* callable is returned instead of the ranking: the
        link-bound score fetch + result assembly run when it is called.
        This is the pipelined-serving seam used by :meth:`Index.submit` —
        the next call's encode/dispatch/device execution overlap the
        previous call's fetch.
        """
        if plan is not None and plan.get("ready"):
            n_pairs = plan["n_pairs"]
            pair_qno = plan["pair_qno"]
            rows_mat = plan["rows_mat"]
            counts_pp = plan["counts_pp"]
            k = plan["k"]
            view = self._active_view()
            if view is None:  # pragma: no cover - table vanished mid-life
                return None
        else:
            # plans only make sense against a persistent device table; the
            # host-gather fallback rebuilds its per-call table every time
            if plan is not None and self._active_view() is None:
                plan = None
            if plan is not None and plan.get("cand_ready"):
                # candidate resolution already done (e.g. by a serve() call
                # on the same ranking); only the assembly artifacts are new
                n_pairs = plan["n_pairs"]
                pair_qno = plan["pair_qno"]
                rows_mat = plan["rows_mat"]
                counts_pp = plan["counts_pp"]
                k = plan["k"]
                view = self._active_view()
            else:
                n_pairs = len(df)
                pair_qno = df["q_no"].to_numpy(dtype=np.int64)
                prep = self._candidate_arrays(df)
                if prep is None:
                    return None
                view, rows_mat, counts_pp, k = prep
        scores_dev = self._device_score_grouped(
            view,
            query_vectors,
            rows_mat,
            pair_qno,
            counts_pp,
            k,
            fetch=False,
            plan=plan,
        )
        if (
            self._score_transport == "u16"
            and isinstance(scores_dev, jax.Array)
            and np.dtype(scores_dev.dtype) == np.float32
        ):
            scores_dev = _PackedScores(ops.encode_scores_u16(scores_dev))

        def finish() -> Ranking:
            return self._finish_score_and_sort(
                scores_dev,
                df,
                q_uniques,
                score_dtype,
                plan,
                n_pairs,
                pair_qno,
                rows_mat,
                counts_pp,
                k,
            )

        if defer:
            return finish
        return finish()

    def _finish_score_and_sort(
        self,
        scores_dev,
        df: pd.DataFrame | None,
        q_uniques,
        score_dtype,
        plan: dict | None,
        n_pairs: int,
        pair_qno: np.ndarray,
        rows_mat: np.ndarray,
        counts_pp: np.ndarray,
        k: int,
    ) -> Ranking:
        """Fetch + order + assemble the result of a dispatched fast path."""
        # result order: q_id desc (via per-query rank), then score desc —
        # one numpy argsort over a composite uint64 key (query rank in the
        # high bits, bit-twiddled descending score in the low bits); a
        # device-side sort costs minutes of TPU sort compilation for no
        # runtime win at these sizes
        if plan is not None and plan.get("ready"):
            q_rank = plan["q_rank"]
            qkey = plan["qkey"]
            segments = plan["segments"]
            qid_arr, id_arr, query_arr = plan["out_arrays"]
        else:
            n_q = len(q_uniques)
            q_rank = np.empty(n_q, dtype=np.uint64)
            q_rank[np.argsort(np.asarray(q_uniques, dtype=object))[::-1]] = (
                np.arange(n_q, dtype=np.uint64)
            )
            if plan is not None:
                # categorical columns: reordering 512k rows is then a take
                # on int codes (~1 ms) instead of on string arrays (~50 ms
                # per call); the dictionary build amortizes over the plan
                qid_arr = pd.Categorical(df["q_id"])
                id_arr = pd.Categorical(df["id"])
                query_arr = pd.Categorical(df["query"])
            else:
                qid_arr = df["q_id"].array
                id_arr = df["id"].array
                query_arr = df["query"].array
            # the high 32 key bits depend only on the candidate layout —
            # precompute per plan so each call pays one vectorized OR
            qkey = q_rank[pair_qno] << np.uint64(32)
            # per-query segment bounds: the input frame is (q_id, score)-
            # sorted so each query's rows are contiguous; the output block
            # of query rank r starts where the ranks before it end
            segments = None
            if n_pairs == 0 or (np.diff(pair_qno) >= 0).all():
                seg_starts = np.searchsorted(
                    pair_qno, np.arange(n_q + 1)
                ).astype(np.int64)
                lengths = np.diff(seg_starts)
                by_rank = np.empty(n_q, dtype=np.int64)
                by_rank[q_rank.astype(np.int64)] = np.arange(n_q)
                cum = np.zeros(n_q + 1, dtype=np.int64)
                np.cumsum(lengths[by_rank], out=cum[1:])
                out_starts = np.empty(n_q, dtype=np.int64)
                out_starts[by_rank] = cum[:-1]
                segments = (seg_starts, out_starts)
        scores_np = take = None
        materialized = False
        cats = (qid_arr, id_arr, query_arr)
        dst_cols: tuple = ()
        if (
            segments is not None
            and not isinstance(scores_dev, np.ndarray)
            and getattr(scores_dev, "is_fully_addressable", True)
        ):
            # overlapped fetch: the device->host score copy is the dominant
            # warm-call cost on remote-attached devices; stream it in chunks
            # and rank-sort each query's block while later chunks are still
            # in flight
            sinks = None
            if all(isinstance(a, pd.Categorical) for a in cats):
                # result assembly rides the overlap too: gather the result-
                # ordered score/code columns as each query block's take
                # entries become final, instead of serially afterwards
                dst_cols = (
                    np.empty(n_pairs, dtype=np.float32),
                    *(np.empty(n_pairs, dtype=a.codes.dtype) for a in cats),
                )
                sinks = ((None, *(a.codes for a in cats)), dst_cols)
            fetched = _overlap_fetch_sort(scores_dev, segments, n_pairs, sinks)
            if fetched is not None:
                scores_np, take, materialized = fetched
        if scores_np is None:
            scores_np = _fetch_scores_np(scores_dev)[:n_pairs]
            from fastforward_tpu.runtime.idmap import segmented_rank_argsort

            if segments is not None:
                take = segmented_rank_argsort(scores_np, *segments)
            if take is None:
                take = _desc_rank_order(qkey, scores_np)
        if materialized:
            score_col, qid_col, id_col, query_col = dst_cols
            out = pd.DataFrame(
                {
                    "q_id": _cat_from_codes(qid_col, qid_arr),
                    "id": _cat_from_codes(id_col, id_arr),
                    "score": score_col.astype(score_dtype, copy=False),
                    "query": _cat_from_codes(query_col, query_arr),
                }
            )
        else:
            # ExtensionArray.take keeps arrow-backed string columns arrow-
            # native (no object round trip when assembling the result frame)
            out = pd.DataFrame(
                {
                    "q_id": qid_arr.take(take),
                    "id": id_arr.take(take),
                    # the fancy-index already copies; skip the astype copy
                    # when the ranking's score dtype is fp32 (2 MB at Q=512)
                    "score": scores_np[take].astype(score_dtype, copy=False),
                    "query": query_arr.take(take),
                }
            )
        if plan is not None and not plan.get("ready"):
            plan.update(
                n_pairs=n_pairs,
                pair_qno=pair_qno,
                rows_mat=rows_mat,
                counts_pp=counts_pp,
                k=k,
                q_rank=q_rank,
                qkey=qkey,
                segments=segments,
                out_arrays=(qid_arr, id_arr, query_arr),
                cand_ready=True,
                ready=True,
            )
        q_ids = None
        if plan is not None:
            q_ids = plan.get("q_ids_set")
            if q_ids is None:
                q_ids = set(np.asarray(q_uniques, dtype=object))
                plan["q_ids_set"] = q_ids
            q_ids = q_ids.copy()  # rankings must not share the mutable set
        return Ranking._from_trusted_frame(out, "fast-forward", q_ids=q_ids)

    def _device_score_flat(
        self,
        view: DeviceView,
        query_vectors: np.ndarray,
        rows: np.ndarray,
        qno: np.ndarray,
        seg: np.ndarray,
        n_pairs: int,
    ) -> np.ndarray:
        """Segment-reduction fallback for extremely ragged documents."""
        op = REDUCE_OP[self.mode]
        if view.kind == "hybrid":
            # beyond-HBM tier: view.table is only the HBM-resident PREFIX —
            # rows in the host tail would read out of bounds (NaN/clamped)
            # through the plain dense program.  Score per row through the
            # hybrid engine, then segment-reduce on the host (this is the
            # rare very-ragged-documents path; ufunc.at is fine here).
            from fastforward_tpu.ops.host_stream import hybrid_scores

            q_pad = self._pad_queries(query_vectors, view)
            row_scores = np.asarray(
                hybrid_scores(
                    view.table,
                    view.host_tail,
                    view.tail_start,
                    view.chunk_rows,
                    q_pad,
                    rows.astype(np.int64),
                    qno.astype(np.int64),
                    precision=view.precision,
                    cache_device_blocks_budget=view.tail_cache_budget,
                    cache_store=view.aux,
                    kind=view.hybrid_kind,
                    codebooks=view.codebooks,
                    mesh=view.mesh,
                ),
                dtype=np.float32,
            )
            seg = np.asarray(seg, dtype=np.int64)
            if op == "max":
                out = np.full(n_pairs, -np.inf, dtype=np.float32)
                np.maximum.at(out, seg, row_scores)
                return out
            if op == "mean":
                out = np.zeros(n_pairs, dtype=np.float64)
                np.add.at(out, seg, row_scores)
                cnt = np.bincount(seg, minlength=n_pairs)
                return (out / np.maximum(cnt, 1)).astype(np.float32)
            # "first": rows are emitted pair-by-pair, so the first row of
            # each segment is its first occurrence
            uniq, first_idx = np.unique(seg, return_index=True)
            out = np.zeros(n_pairs, dtype=np.float32)
            out[uniq] = row_scores[first_idx]
            return out
        p_bucket = ops.bucket(rows.shape[0])
        s_bucket = ops.bucket(n_pairs)
        idx = np.zeros((3, p_bucket), dtype=np.int32)
        idx[0, : rows.shape[0]] = rows
        idx[1, : qno.shape[0]] = qno
        idx[2] = s_bucket  # segment sentinel for padding
        idx[2, : seg.shape[0]] = seg
        q_pad = self._pad_queries(query_vectors, view)

        if view.kind == "pq":
            scores = ops.score_pairs_pq(
                view.table, view.codebooks, q_pad, idx, s_bucket, op
            )
        else:
            scores = ops.score_pairs_dense(
                view.table, q_pad, idx, s_bucket, op, precision=view.precision
            )
        return np.asarray(jax.device_get(scores))[:n_pairs]

    def _device_score_chunked(
        self,
        view: DeviceView,
        query_vectors: np.ndarray,
        pair_id_pos: np.ndarray,
        pair_qno: np.ndarray,
        rows_concat: np.ndarray,
        counts: np.ndarray,
    ) -> np.ndarray:
        """Grouped scoring for arbitrarily ragged documents (any K).

        Each (query, doc) pair's row list is split into sub-pairs of at
        most ``_MAX_GROUP_K`` rows, scored through the standard grouped
        program (which is mesh-aware — the flat segment program is not),
        and the per-sub-pair partials are combined on the host: max of
        maxes for MAXP, count-weighted mean of means for AVEP.  FIRSTP and
        PASSAGE resolve one row per pair and never reach this path.
        """
        op = GROUPED_OP[self.mode]
        kc = self._MAX_GROUP_K
        n_pairs = pair_id_pos.shape[0]
        counts_pp = counts[pair_id_pos].astype(np.int64)
        n_chunks_pp = -(-counts_pp // kc)
        n_sub = int(n_chunks_pp.sum())
        sub_pair = np.repeat(np.arange(n_pairs, dtype=np.int64), n_chunks_pp)
        chunk_ends = np.cumsum(n_chunks_pp)
        within = np.arange(n_sub, dtype=np.int64) - np.repeat(
            chunk_ends - n_chunks_pp, n_chunks_pp
        )
        sub_counts = np.minimum(
            counts_pp[sub_pair] - within * kc, kc
        ).astype(np.int32)
        offsets = np.zeros(counts.shape[0] + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        sub_start = offsets[pair_id_pos][sub_pair] + within * kc
        col = np.arange(kc, dtype=np.int64)[None, :]
        clamped = np.minimum(col, (sub_counts[:, None] - 1).astype(np.int64))
        rows_mat = rows_concat[sub_start[:, None] + clamped].astype(np.int32)
        sub_qno = pair_qno[sub_pair]

        sub_scores = np.asarray(
            self._device_score_grouped(
                view, query_vectors, rows_mat, sub_qno, sub_counts, kc
            ),
            dtype=np.float32,
        )
        if op == "max":
            out = np.full(n_pairs, -np.inf, dtype=np.float32)
            np.maximum.at(out, sub_pair, sub_scores)
            return out
        if op == "mean":
            # sub-pair means carry their row counts; the pair mean is the
            # count-weighted mean (recovers the sum to ~1 ulp)
            acc = np.zeros(n_pairs, dtype=np.float64)
            np.add.at(acc, sub_pair, sub_scores.astype(np.float64) * sub_counts)
            return (acc / counts_pp).astype(np.float32)
        # "first": the first sub-pair of each pair carries the first row
        first_sub = chunk_ends - n_chunks_pp
        return sub_scores[first_sub]

    # documents with more passages than this use the flat segment path
    # (grouped K-padding would waste too much gather bandwidth)
    _MAX_GROUP_K = 64

    def _compute_scores(
        self, data: pd.DataFrame, query_vectors: np.ndarray
    ) -> np.ndarray:
        """Compute semantic scores for (query, ID) pairs.

        ``data`` needs ``id`` and ``q_no`` columns; ``query_vectors`` is
        indexed by ``q_no``.  Returns one score per row of ``data``, in row
        order.  The host work is fully vectorized: ``factorize`` maps IDs to
        dense codes, the (native) ID map resolves unique IDs to table rows,
        and the expansion helpers build the device index arrays.
        """
        if len(data) == 0:
            return np.zeros((0,), dtype=np.float32)

        pair_id_pos, ids_unique = pd.factorize(data["id"], sort=False)
        view, rows_concat, counts = self._gather_view(ids_unique)
        pair_qno = data["q_no"].to_numpy(dtype=np.int64)

        k_max = int(counts.max()) if counts.size else 1
        if k_max <= self._MAX_GROUP_K and view.mesh is None:
            k = max(1, 1 << (k_max - 1).bit_length())
            rows_mat, counts_pp = expand_pairs_grouped(
                pair_id_pos.astype(np.int64), rows_concat, counts, k
            )
            return self._device_score_grouped(
                view, query_vectors, rows_mat, pair_qno, counts_pp, k
            )
        if view.mesh is not None:
            if k_max > self._MAX_GROUP_K:
                # arbitrarily ragged documents on the mesh: chunked-K
                # grouped scoring (the flat segment program is single-
                # device only) — matches the reference, which handles any
                # raggedness in every configuration (reference:
                # ``index/base.py:306-312``)
                return self._device_score_chunked(
                    view,
                    query_vectors,
                    pair_id_pos.astype(np.int64),
                    pair_qno,
                    rows_concat,
                    counts,
                )
            k = max(1, 1 << (k_max - 1).bit_length())
            rows_mat, counts_pp = expand_pairs_grouped(
                pair_id_pos.astype(np.int64), rows_concat, counts, k
            )
            return self._device_score_grouped(
                view, query_vectors, rows_mat, pair_qno, counts_pp, k
            )
        rows, qno, seg = expand_pairs(
            pair_id_pos.astype(np.int64), pair_qno, rows_concat, counts
        )
        return self._device_score_flat(
            view, query_vectors, rows, qno, seg, len(data)
        )

    def _early_stopping(
        self,
        df: pd.DataFrame,
        query_vectors: np.ndarray,
        cutoff: int,
        alpha: float,
        depths: Iterable[int],
        plan: dict | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Score progressively deeper chunks, dropping queries that stopped.

        Returns ``(take, ff)``: positional indices of the scored rows of
        ``df`` (in depth-round order) and their semantic scores — callers
        assemble the result frame (the whole-frame path via the trusted
        fast ctor, the batched path via ``iloc``/``assign``).

        Semantics match the reference (reference: ``index/base.py:316-387``):
        only scored rows are returned; a query stops once its ``cutoff``-th
        best interpolated score can no longer be beaten by unscored docs
        (lexical bound = last scored lexical score, semantic bound = best
        semantic score seen).

        The frame is (q_id, score)-sorted, so each query's rows form one
        contiguous run: depth chunks are integer ranges over precomputed run
        offsets, candidates are resolved to table rows ONCE for the whole
        frame, and the stop criterion is evaluated from accumulated numpy
        arrays — no per-round ``groupby.nth`` / ``pd.concat`` (the pandas
        version was ~6x slower than dense scoring at the same depth).
        """
        n = len(df)
        if n == 0:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)

        # cross-call ES state: candidate resolution, run offsets, and the
        # alpha-INDEPENDENT semantic scores (an alpha sweep over the same
        # ranking re-scores the same rows — the deepest alpha's scores
        # serve every later alpha from the cache).  Validated against the
        # query-vector CONTENT: an encoder swap, a recycled id() after GC,
        # or a same-object encoder whose output changed all invalidate the
        # cached semantic scores (cf. the plan's content-checked q upload).
        state = plan.get("es_state") if plan is not None else None
        if state is not None and (
            state["n"] != n
            or state["qv"].shape != query_vectors.shape
            or not np.array_equal(state["qv"], query_vectors)
        ):
            state = None
        if plan is not None:
            # tells _assemble_es this plan is hot (a repeat call): only
            # then is building cached categorical ID columns worth it
            plan["es_hot"] = state is not None
        if state is None:
            q_no = df["q_no"].to_numpy(dtype=np.int64)
            lex = df["score"].to_numpy(dtype=np.float32)
            # contiguous run per query
            change = np.flatnonzero(np.diff(q_no)) + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [n]))
            # one-row-per-pair modes resolve IDs lazily, per depth round:
            # queries that stop early never pay resolution for their deep
            # candidates (this also matches the reference, which only
            # touches the rows of scored chunks)
            view = self._active_view()
            lazy = view is not None and self.mode in (
                Mode.PASSAGE,
                Mode.FIRSTP,
            )
            state = {
                "n": n,
                "qv": np.array(query_vectors, copy=True),
                "q_no": q_no,
                "lex": lex,
                "starts": starts,
                "ends": ends,
                "prep": None if lazy else self._candidate_arrays(df),
                "view": view if lazy else None,
                "lazy_rows": np.full(n, -1, dtype=np.int64) if lazy else None,
                "ff": np.empty(n, dtype=np.float32),
                "have": np.zeros(n, dtype=bool),
            }
            if plan is not None:
                plan["es_state"] = state
        q_no = state["q_no"]
        lex = state["lex"]
        starts = state["starts"]
        ends = state["ends"]
        nq = starts.shape[0]
        prep = state["prep"]
        ff_cache = state["ff"]
        have = state["have"]

        # per-query state: top-`cutoff` interpolated scores (desc, -inf
        # padded), number of rows scored, best semantic score, active flag
        topk = np.full((nq, cutoff), -np.inf, dtype=np.float64)
        scored_n = np.zeros(nq, dtype=np.int64)
        best_sem = np.full(nq, -np.inf, dtype=np.float64)

        sels: list[np.ndarray] = []
        ffs: list[np.ndarray] = []
        a = 0
        for b in sorted(depths):
            if b < cutoff:
                continue

            if a == 0:
                act_idx = np.arange(nq)
            else:
                kth = topk[
                    np.arange(nq), np.minimum(scored_n, cutoff) - 1
                ]
                last_lex = lex[
                    np.minimum(starts + np.maximum(scored_n, 1), ends) - 1
                ]
                bound = alpha * last_lex + (1 - alpha) * best_sem
                act_idx = np.flatnonzero((kth < bound) & (scored_n > 0))
            LOGGER.info("depth %s: %s queries left", b, len(act_idx))

            # chunk = rows a..b of each active query's run, clamped
            lo = starts[act_idx] + a
            hi = np.minimum(starts[act_idx] + b, ends[act_idx])
            lens = np.maximum(hi - lo, 0)
            nonempty = lens > 0
            lo, lens, act_rows = lo[nonempty], lens[nonempty], act_idx[nonempty]
            total = int(lens.sum())
            if total == 0:
                break
            bounds_cum = np.cumsum(lens)
            offsets = np.concatenate(([0], bounds_cum[:-1]))
            within = np.arange(total, dtype=np.int64) - np.repeat(
                offsets, lens
            )
            sel = within + np.repeat(lo, lens)

            need = sel[~have[sel]]
            if need.size:
                if state["lazy_rows"] is not None:
                    lazy_rows = state["lazy_rows"]
                    missing = need[lazy_rows[need] < 0]
                    if missing.size:
                        resolved, _ = self._ids.resolve(
                            df["id"].iloc[missing], self.mode
                        )
                        lazy_rows[missing] = resolved
                    scored = np.asarray(
                        self._device_score_grouped(
                            state["view"],
                            query_vectors,
                            lazy_rows[need][:, None],
                            q_no[need],
                            np.ones(need.size, dtype=np.int32),
                            1,
                        ),
                        dtype=np.float32,
                    )
                elif prep is not None:
                    view, rows_mat, counts_pp, k = prep
                    scored = np.asarray(
                        self._device_score_grouped(
                            view,
                            query_vectors,
                            rows_mat[need],
                            q_no[need],
                            counts_pp[need],
                            k,
                        ),
                        dtype=np.float32,
                    )
                else:  # very ragged documents: per-round pandas fallback
                    scored = self._compute_scores(
                        df.iloc[need], query_vectors
                    ).astype(np.float32)
                ff_cache[need] = scored
                have[need] = True
            ff = ff_cache[sel]
            # interpolate on HOST: inputs are host numpy and the result
            # feeds the host criterion — a device round trip here costs
            # 2 tunnel RTTs per depth round (measured ~44 ms each at
            # Q=512) for a memory-bound axpy numpy does in <1 ms
            int_score = (alpha * lex[sel] + (1.0 - alpha) * ff).astype(
                np.float32
            )

            # per-query state updates (reduceat over contiguous segments)
            seg_starts = offsets
            best_sem[act_rows] = np.maximum(
                best_sem[act_rows], np.maximum.reduceat(ff, seg_starts)
            )
            scored_n[act_rows] += lens
            # top-k maintenance, vectorized over active queries: pad each
            # query's (old top-k ++ new chunk) into one -inf-filled row,
            # partition the best `cutoff` into the tail columns, sort only
            # those (the criterion reads topk desc-sorted).  Replaces a
            # per-query python concatenate+sort loop that dominated at
            # large Q (thousands of interpreter iterations per call).
            n_act = act_rows.shape[0]
            width = cutoff + int(lens.max())
            mat = np.full((n_act, width), -np.inf)
            mat[:, :cutoff] = topk[act_rows]
            mat[
                np.repeat(np.arange(n_act), lens), cutoff + within
            ] = int_score
            best = np.partition(mat, width - cutoff, axis=1)[
                :, width - cutoff:
            ]
            topk[act_rows] = -np.sort(-best, axis=1)

            sels.append(sel)
            ffs.append(ff)
            a = b

        if not sels:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.float32)
        return np.concatenate(sels), np.concatenate(ffs)

    def _assemble_es(
        self,
        df: pd.DataFrame,
        take: np.ndarray,
        ff: np.ndarray,
        q_uniques,
        score_dtype,
        plan: dict | None,
        cut: "int | None" = None,
    ) -> Ranking:
        """Assemble the ES result ranking from scored-row indices.

        Mirrors ``_score_and_sort``'s assembly: categorical ID columns
        (plan-cached — reordering is then a take on int codes), a host
        lexsort for (q_id desc, score desc), and the trusted-frame fast
        ctor.  The previous frame-based path (``iloc`` + ``assign`` + the
        full validating ctor with its duplicate scan) cost ~100 ms per
        warm alpha-sweep call at 512k rows.
        """
        n_q = len(q_uniques)
        arrs = plan.get("es_arrays") if plan is not None else None
        if arrs is None:
            q_rank = np.empty(n_q, dtype=np.uint64)
            q_rank[np.argsort(np.asarray(q_uniques, dtype=object))[::-1]] = (
                np.arange(n_q, dtype=np.uint64)
            )
            # per-row high key bits (query rank) — candidate-layout only,
            # so they amortize over the plan like the dense path's qkey
            qhi = q_rank[df["q_no"].to_numpy()] << np.uint64(32)
            if plan is not None and plan.get("es_hot"):
                # repeat call on this plan: the categorical dictionaries
                # (~200 ms to build at 512k rows) amortize — reordering
                # becomes a take on int codes.  One-shot rankings (cold
                # serving) stay on the plain arrow arrays.
                qid_arr = pd.Categorical(df["q_id"])
                id_arr = pd.Categorical(df["id"])
                query_arr = pd.Categorical(df["query"])
                plan["es_arrays"] = (qhi, qid_arr, id_arr, query_arr)
            else:
                qid_arr = df["q_id"].array
                id_arr = df["id"].array
                query_arr = df["query"].array
        else:
            qhi, qid_arr, id_arr, query_arr = arrs
        # (q_id desc, score desc) via the shared composite-key radix
        # argsort (a np.lexsort here measured ~60 ms per call at 512k rows)
        qhi_take = qhi[take]
        order = _desc_rank_order(qhi_take, ff)
        if cut is not None and order.size:
            # ES-serve tail: keep the top `cut` rows per query directly in
            # the sorted order — queries are contiguous runs of equal qhi
            keys = qhi_take[order]
            run_start = np.empty(keys.size, dtype=bool)
            run_start[0] = True
            np.not_equal(keys[1:], keys[:-1], out=run_start[1:])
            starts = np.flatnonzero(run_start)
            lens = np.diff(np.concatenate((starts, [keys.size])))
            pos = np.arange(keys.size, dtype=np.int64) - np.repeat(
                starts, lens
            )
            order = order[pos < cut]
        final = take[order]
        out = pd.DataFrame(
            {
                "q_id": qid_arr.take(final),
                "id": id_arr.take(final),
                "score": ff[order].astype(score_dtype),
                "query": query_arr.take(final),
            }
        )
        return Ranking._from_trusted_frame(out, "fast-forward")

    def __call__(
        self,
        ranking: Ranking,
        early_stopping: int | None = None,
        early_stopping_alpha: float | None = None,
        early_stopping_depths: Iterable[int] | None = None,
        batch_size: int | None = None,
    ) -> Ranking:
        """Compute semantic scores for a ranking.

        :param ranking: The ranking (queries must be attached).
        :param early_stopping: Early-stopping cut-off depth.
        :param early_stopping_alpha: Early-stopping interpolation parameter.
        :param early_stopping_depths: Early-stopping depth schedule.
        :param batch_size: Queries per device batch (``None``: all at once).
        :raises ValueError: When the ranking has no queries attached.
        :raises ValueError: When early-stopping arguments are missing.
        :raises IndexError: When an ID is missing from the index.
        :return: A ranking with the computed scores.
        """
        if not ranking.has_queries:
            raise ValueError("Input ranking has no queries attached.")
        if early_stopping is not None and (
            early_stopping_alpha is None or early_stopping_depths is None
        ):
            raise ValueError("Early stopping requires alpha and depths.")
        from fastforward_tpu.utils.tracing import maybe_trace

        with maybe_trace():
            return self._call(
                ranking,
                early_stopping,
                early_stopping_alpha,
                early_stopping_depths,
                batch_size,
            )

    def submit(self, ranking: Ranking) -> ScoreFuture:
        """Dispatch scoring for a ranking and return a future (pipelined
        serving).

        The query encode and the device program dispatch happen now; the
        link-bound score fetch and the result assembly run inside
        ``future.result()``.  Back-to-back submits therefore overlap call
        *i+1*'s encode/dispatch/device execution with call *i*'s fetch —
        on remote-attached serving hosts the fetch dominates the warm
        call, so a depth-2 pipeline hides nearly all other per-call work::

            pending = None
            for r in rankings:
                fut = index.submit(r)
                if pending is not None:
                    results.append(pending.result())
                pending = fut
            results.append(pending.result())

        Workloads outside the deferred fast path (early stopping, very
        ragged documents, host-gather stores) are computed eagerly here —
        the future then just hands back the finished ranking
        (``future.pipelined`` is ``False``).

        :param ranking: The ranking (queries must be attached).
        :raises ValueError: When the ranking has no queries attached.
        :raises IndexError: When an ID is missing from the index.
        :return: A :class:`ScoreFuture` whose ``result()`` is the scored
            ranking (identical to ``self(ranking)``).
        """
        if not ranking.has_queries:
            raise ValueError("Input ranking has no queries attached.")
        score_dtype = ranking._df.dtypes["score"]
        plan = self._get_plan(ranking)
        if plan.get("ready"):
            queries = plan["queries"]
            query_vectors = self.encode_queries(queries)
            deferred = self._score_and_sort(
                None,
                query_vectors,
                plan["q_uniques"],
                score_dtype,
                plan=plan,
                defer=True,
            )
        else:
            df = ranking._df.copy()
            q_codes, q_uniques = pd.factorize(df["q_id"], sort=False)
            df["q_no"] = q_codes
            queries = df.loc[~df["q_id"].duplicated(), "query"].tolist()
            plan["queries"] = queries
            plan["q_uniques"] = q_uniques
            query_vectors = self.encode_queries(queries)
            deferred = self._score_and_sort(
                df, query_vectors, q_uniques, score_dtype, plan=plan, defer=True
            )
        if deferred is None:  # fallback paths have no deferred-fetch seam
            return ScoreFuture(result=self(ranking))
        return ScoreFuture(finish=deferred)

    def serve(
        self,
        ranking: Ranking,
        alpha: float,
        cutoff: int,
        early_stopping_depths: "Iterable[int] | None" = None,
        refine: "int | None" = None,
    ) -> Ranking:
        """One fused production re-rank call: semantic scoring + score
        interpolation + per-query top-``cutoff`` cut.

        Equivalent to the unfused serving flow
        ``ranking.interpolate(self(ranking), alpha).cut(cutoff)``
        (reference: interpolation ``ranking.py:293-326``, cut
        ``ranking.py:279-291``, adapter ``util/pyterrier.py:75-83``), but
        the interpolation and the top-k selection run ON DEVICE in one
        fused program, so only ``num_queries x cutoff`` packed
        (score, index) pairs cross the device->host link instead of the
        full ``num_queries x depth`` score matrix — on remote-attached
        serving hosts the score fetch dominates the warm call.

        ``alpha`` is traced, not compiled in: alpha sweeps on a prepared
        run reuse both the plan and the compiled program.  Ties at the
        cutoff boundary may resolve differently from the host flow (both
        orders are valid top-k sets).  Workloads outside the device fast
        path (host-gather stores, very ragged documents, multi-host
        meshes) fall back to the unfused flow transparently.

        With ``early_stopping_depths`` the semantic scores come from the
        early-stopping schedule (reference ``index/base.py:316-387``) and
        the interpolation is restricted to the scored subset — the final
        step the reference leaves to the user, where a naive
        ``Ranking.interpolate`` (outer merge, missing semantic scores
        treated as 0) would surface never-scored candidates on their
        lexical score alone.

        With ``refine=margin`` (dense single-passage tables on one device)
        the call runs two-phase: a single-pass bf16 ``"fast"`` scan
        preselects the top ``cutoff + margin`` candidates per query, whose
        dots are then recomputed in full fp32 on device before the final
        cut — a third of the MXU streaming work with *exact* final scores;
        the approximation is confined to the preselection (a true
        top-``cutoff`` candidate is lost only if the ~0.4 % bf16 relative
        error pushes it below ``margin`` others; ``margin >= 2 x cutoff``
        is a comfortable default in practice).  Configurations outside the
        two-phase fast path (quantized/hybrid/sharded tables, doc modes)
        ignore ``refine`` and serve through the standard fused program.

        :param ranking: The ranking (queries must be attached).
        :param alpha: Interpolation parameter (lexical weight).
        :param cutoff: Top-k depth per query to return.
        :param early_stopping_depths: Optional early-stopping depth
            schedule (the ES cutoff/alpha are ``cutoff``/``alpha``).
        :param refine: Optional two-phase margin (see above).
        :raises ValueError: When the ranking has no queries attached.
        :raises ValueError: When the cutoff is not positive.
        :raises ValueError: When ``refine`` is negative.
        :raises IndexError: When an ID is missing from the index.
        :return: The interpolated, cut ranking.
        """
        out = self._serve(
            ranking,
            alpha,
            cutoff,
            defer=False,
            early_stopping_depths=early_stopping_depths,
            refine=refine,
        )
        assert isinstance(out, Ranking)
        return out

    def submit_serve(
        self,
        ranking: Ranking,
        alpha: float,
        cutoff: int,
        early_stopping_depths: "Iterable[int] | None" = None,
        refine: "int | None" = None,
    ) -> ScoreFuture:
        """Pipelined :meth:`serve`: dispatch now, fetch in ``result()``.

        Same overlap contract as :meth:`submit` — back-to-back
        ``submit_serve`` calls overlap the next call's encode/dispatch
        with the previous call's (already tiny) result fetch.

        :param ranking: The ranking (queries must be attached).
        :param alpha: Interpolation parameter (lexical weight).
        :param cutoff: Top-k depth per query to return.
        :param early_stopping_depths: Optional early-stopping depth
            schedule (computed eagerly; ``pipelined`` is then ``False``).
        :return: A :class:`ScoreFuture` whose ``result()`` equals
            ``self.serve(ranking, alpha, cutoff)``.
        """
        out = self._serve(
            ranking,
            alpha,
            cutoff,
            defer=True,
            early_stopping_depths=early_stopping_depths,
            refine=refine,
        )
        if isinstance(out, Ranking):  # eager fallback path
            return ScoreFuture(result=out)
        return ScoreFuture(finish=out)

    def _serve(
        self,
        ranking: Ranking,
        alpha: float,
        cutoff: int,
        defer: bool,
        early_stopping_depths: "Iterable[int] | None" = None,
        refine: "int | None" = None,
    ) -> "Ranking | Callable[[], Ranking]":
        if not ranking.has_queries:
            raise ValueError("Input ranking has no queries attached.")
        if cutoff < 1:
            raise ValueError("cutoff must be positive.")
        if refine is not None and refine < 0:
            raise ValueError("refine margin must be non-negative.")
        if early_stopping_depths is not None:
            return self._serve_early_stopping(
                ranking, alpha, cutoff, early_stopping_depths
            )
        t0 = perf_counter()
        plan = self._get_plan(ranking)
        if plan.get("cand_ready") and plan.get("queries") is not None:
            queries = plan["queries"]
            q_uniques = plan["q_uniques"]
            q_codes = None
        else:
            q_codes, q_uniques = pd.factorize(ranking._df["q_id"], sort=False)
            first = ~ranking._df["q_id"].duplicated()
            queries = ranking._df.loc[first, "query"].tolist()
            plan["queries"] = queries
            plan["q_uniques"] = q_uniques
        query_vectors = self.encode_queries(queries)
        fused = self._serve_fused(
            ranking, query_vectors, q_uniques, q_codes, plan, alpha, cutoff,
            defer, refine=refine,
        )
        if fused is not None:
            if not defer:
                LOGGER.info(
                    "served interpolated top-%d in %s seconds",
                    cutoff,
                    perf_counter() - t0,
                )
            return fused
        # unfused fallback (host-gather store, very ragged documents, ...)
        ff = self(ranking)
        out = ranking.interpolate(ff, alpha).cut(cutoff)
        out.name = "fast-forward"
        return out

    def _serve_early_stopping(
        self,
        ranking: Ranking,
        alpha: float,
        cutoff: int,
        depths: Iterable[int],
    ) -> Ranking:
        """Early-stopping serve: schedule-scored subset -> interpolate -> cut.

        The interpolation covers ONLY the scored subset — an outer-merge
        ``interpolate`` would give never-scored candidates a semantic score
        of 0 and surface them on ``alpha * lexical`` alone (reference
        semantics leave this step to the user; ES subset per
        ``index/base.py:316-387``).

        Fused tail: the interpolation is a host axpy over the ES loop's own
        ``(take, ff)`` arrays and the cut happens inside the shared
        composite-key sort (``_assemble_es(cut=...)``), so the result frame
        is built at ``Q x cutoff`` rows.  The previous tail assembled the
        full scored frame, re-extracted it with ``_plain_ids``, ran an
        O(pairs) hash join against the lexical frame, and sorted twice —
        ~10x the host work for the same ranking.
        """
        plan = self._get_plan(ranking)
        es_prep = plan.get("es_prep")
        if es_prep is not None:
            df, queries, q_uniques = es_prep
        else:
            df = ranking._df.copy()
            q_codes, q_uniques = pd.factorize(df["q_id"], sort=False)
            df["q_no"] = q_codes
            queries = df.loc[~df["q_id"].duplicated(), "query"].tolist()
            plan["es_prep"] = (df, queries, q_uniques)
        query_vectors = self.encode_queries(queries)
        take, ff = self._early_stopping(
            df, query_vectors, cutoff, alpha, depths, plan=plan
        )
        state = plan.get("es_state")
        lex = (
            state["lex"]
            if state is not None
            else df["score"].to_numpy(dtype=np.float32)
        )
        interp = (alpha * lex[take] + (1.0 - alpha) * ff).astype(np.float32)
        return self._assemble_es(
            df,
            take,
            interp,
            q_uniques,
            ranking._df.dtypes["score"],
            plan,
            cut=cutoff,
        )

    def _serve_fused(
        self,
        ranking: Ranking,
        query_vectors: np.ndarray,
        q_uniques,
        q_codes: "np.ndarray | None",
        plan: dict,
        alpha: float,
        cutoff: int,
        defer: bool,
        refine: "int | None" = None,
    ) -> "Ranking | Callable[[], Ranking] | None":
        """Dispatch the fused serve program; ``None`` -> caller falls back.

        Static artifacts (candidate arrays, the per-query slot layout, the
        lexical score upload, output id arrays) are plan-cached: warm calls
        pay only encode + device program + the ``(2, Q, cutoff)`` fetch.
        """
        multiprocess = jax.process_count() > 1
        view = self._active_view()
        if view is None:
            return None
        score_dtype = ranking._df.dtypes["score"]
        if plan.get("cand_ready"):
            n_pairs = plan["n_pairs"]
            pair_qno = plan["pair_qno"]
            rows_mat = plan["rows_mat"]
            counts_pp = plan["counts_pp"]
            k = plan["k"]
        else:
            n_pairs = len(ranking._df)
            pair_qno = q_codes.astype(np.int64)
            prep = self._candidate_arrays(ranking._df)
            if prep is None:
                return None
            view, rows_mat, counts_pp, k = prep
            plan.update(
                n_pairs=n_pairs,
                pair_qno=pair_qno,
                rows_mat=rows_mat,
                counts_pp=counts_pp,
                k=k,
                cand_ready=True,
            )
        # two-phase refine: single-pass bf16 preselect + exact rescore of
        # the top (cutoff + margin) per query — dense single-passage
        # single-device tables only; other configurations serve normally
        refine_live = (
            refine is not None
            and not multiprocess
            and view.kind == "dense"
            and view.mesh is None
            and view.table.ndim == 2
            and k == 1
            # fast-tier indexes already run single-pass; refining them
            # still upgrades the final top-k scores to exact fp32
        )
        scoring_view = (
            dataclasses.replace(view, precision="fast")
            if refine_live
            else view
        )
        # per-call token: query-upload caches validated during THIS call's
        # scoring stamp themselves with it, so the refine branch below can
        # reuse them without a second content compare
        plan["_call_tok"] = plan.get("_call_tok", 0) + 1
        scores_dev = self._device_score_grouped(
            scoring_view,
            query_vectors,
            rows_mat,
            pair_qno,
            counts_pp,
            k,
            fetch=False,
            plan=plan,
        )
        sv = plan.get("serve")
        if sv is None or not sv.get("ready"):
            n_q = len(q_uniques)
            d_max = (
                int(np.bincount(pair_qno, minlength=n_q).max())
                if n_pairs
                else 1
            )
            # pad the depth axis to a power of two: the fused program is
            # keyed on the slot shape, so runs with nearby depths reuse
            # the compiled program (padding slots are -1 -> -inf, never
            # selected ahead of real candidates)
            d_max = 1 << max(3, (d_max - 1).bit_length())
            slot = np.full((n_q, d_max), -1, dtype=np.int32)
            if n_pairs:
                if (np.diff(pair_qno) >= 0).all():
                    spq, order = pair_qno, None
                else:
                    order = np.argsort(pair_qno, kind="stable")
                    spq = pair_qno[order]
                seg_starts = np.searchsorted(spq, np.arange(n_q))
                pos = np.arange(n_pairs, dtype=np.int64) - seg_starts[spq]
                slot[spq, pos] = (
                    np.arange(n_pairs, dtype=np.int32)
                    if order is None
                    else order.astype(np.int32)
                )
            # output query order: q_id descending (the ranking sort
            # convention) — bake it into the slot rows so the device
            # result is already in final row order
            by_rank = np.argsort(np.asarray(q_uniques, dtype=object))[
                ::-1
            ].astype(np.int64)
            slot = slot[by_rank]
            lex = np.zeros(ops.bucket(n_pairs), dtype=np.float32)
            lex[:n_pairs] = ranking._df["score"].to_numpy(dtype=np.float32)
            sv = {
                "slot": slot,
                # multi-process: a process-committed device copy can't feed
                # a global-mesh jit, but replicated numpy can (every process
                # holds identical arrays)
                "slot_dev": slot if multiprocess else jnp.asarray(slot),
                "lex": lex,
                "lex_dev": lex if multiprocess else jnp.asarray(lex),
                "qid_arr": ranking._df["q_id"].array,
                "id_arr": ranking._df["id"].array,
                # keep the query column on the fused path so serve() output
                # has the same schema as the host fallback (which goes
                # through interpolate and retains it)
                "query_arr": (
                    ranking._df["query"].array
                    if "query" in ranking._df.columns
                    else None
                ),
                "by_rank": by_rank,
                "ready": True,
            }
            plan["serve"] = sv
        kc = min(cutoff, sv["slot"].shape[1])
        # the serve tail needs a device score array; under multi-process it
        # runs as a global-mesh jit over the (non-addressable, replicated
        # post-psum) sharded scores and the tiny packed result is fetched
        # through the allgather seam
        device_path = isinstance(scores_dev, jax.Array) and (
            multiprocess
            or getattr(scores_dev, "is_fully_addressable", True)
        )
        if device_path and refine_live:
            from fastforward_tpu.ops.scoring import _cached_q_upload

            rows_dev = sv.get("rows_dev")
            if rows_dev is None:
                rows_pad = np.zeros(ops.bucket(n_pairs), dtype=np.int32)
                rows_pad[:n_pairs] = rows_mat[:, 0]
                rows_dev = jnp.asarray(rows_pad)
                sv["rows_dev"] = rows_dev
                # slot-row -> query-index permutation (slot rows are in
                # output order, queries in first-appearance order)
                sv["q_perm_dev"] = jnp.asarray(
                    sv["by_rank"].astype(np.int32)
                )
            # reuse the streamed path's transposed query upload only when
            # it is provably current: either its stamp says the scoring
            # phase of THIS call content-validated it (hot path, free), or
            # a full compare against this call's query vectors passes —
            # the cache may be stale when scoring took a path that doesn't
            # refresh it (Pallas fallback, grouped/bounded) after an
            # encoder swap
            cached_qt = plan.get("q_t_dev")
            if cached_qt is not None and plan.get("q_t_dev_tok") == plan.get(
                "_call_tok"
            ):
                q_dev, q_transposed = cached_qt[1], True
            else:
                q_pad = self._pad_queries(query_vectors, view)
                if cached_qt is not None and np.array_equal(
                    cached_qt[0], q_pad.T.reshape(-1, q_pad.shape[0])
                ):
                    q_dev, q_transposed = cached_qt[1], True
                else:
                    q_dev, q_transposed = (
                        _cached_q_upload(q_pad, plan, "q_dev"),
                        False,
                    )
            packed = ops.serve_topk_refine(
                scores_dev,
                sv["lex_dev"],
                sv["slot_dev"],
                np.float32(alpha),
                kc,
                int(refine),
                view.table,
                rows_dev,
                q_dev,
                sv["q_perm_dev"],
                q_transposed=q_transposed,
            )
        elif device_path:
            packed = ops.serve_topk(
                scores_dev, sv["lex_dev"], sv["slot_dev"], np.float32(alpha), kc
            )
        else:
            packed = None
        if packed is not None and defer:
            # start the (tiny) result copy the moment the device finishes
            # — result() then only waits, it doesn't initiate
            try:
                packed.copy_to_host_async()
            except Exception:  # pragma: no cover - backend-specific
                pass

        def finish() -> Ranking:
            if packed is not None:
                packed_np = ops.fetch_np(packed)
                vals, pair_idx = ops.decode_serve_topk(packed_np)
            else:
                scores_np = _fetch_scores_np(scores_dev)[:n_pairs]
                vals, pair_idx = ops.serve_topk_host(
                    scores_np, sv["lex"], sv["slot"], alpha, kc
                )
            flat_idx = pair_idx.reshape(-1)
            mask = flat_idx >= 0
            take = flat_idx[mask]
            scores = vals.reshape(-1)[mask]
            cols = {
                "q_id": sv["qid_arr"].take(take),
                "id": sv["id_arr"].take(take),
                "score": scores.astype(score_dtype, copy=False),
            }
            if sv.get("query_arr") is not None:
                cols["query"] = sv["query_arr"].take(take)
            out = pd.DataFrame(cols)
            q_ids = plan.get("q_ids_set")
            if q_ids is None:
                q_ids = set(np.asarray(q_uniques, dtype=object))
                plan["q_ids_set"] = q_ids
            return Ranking._from_trusted_frame(
                out, "fast-forward", q_ids=q_ids.copy()
            )

        if defer:
            return finish
        return finish()

    # -- array-path serving (BatchingServer) ---------------------------------

    def _serve_prep(self, ranking: Ranking) -> "dict | None":
        """Resolve ONE request into merge-ready arrays (array-path serving).

        :class:`~fastforward_tpu.utils.serving.BatchingServer` calls this
        from its resolver pool the moment a request is submitted:
        per-request candidate resolution (a few thousand rows) overlaps
        the batching wait, so the merged batch needs no frame concat, no
        q_id namespacing, and no re-resolution of the 10^5-row merged
        frame —
        the dominant cold-batch costs (``scripts/profile_server.py``:
        ~110 ms merge + ~50 ms resolve per 64x8-query batch).  Returns
        ``None`` when this request cannot take the array path (no device
        view, multi-process, too-ragged documents, empty ranking) — the
        caller serves it through :meth:`serve` instead.
        """
        if jax.process_count() > 1:
            return None
        df = ranking._df
        if not len(df) or self._active_view() is None:
            return None
        prep = self._candidate_arrays(df)
        if prep is None:
            return None
        _view, rows_mat, counts_pp, k = prep
        # query codes via run boundaries: the Ranking ctor sorts frames by
        # (q_id desc, score desc), so each query's pairs are one contiguous
        # run and a vectorized neighbor-compare recovers the codes — ~10x
        # cheaper per request than a hash factorize, and the full-column
        # query materialization shrinks to a take of the run heads (the
        # two dominated the measured per-request prep CPU on a 1-core
        # serving host).  A duplicated run head means the frame is NOT
        # run-contiguous (foreign trusted frame): fall back to factorize.
        first = _run_heads(df["q_id"])
        uniq_idx = np.flatnonzero(first)
        uniq = df["q_id"].iloc[uniq_idx].to_numpy(dtype=object)
        sorted_codes = True
        if len(uniq) != len(set(uniq)):  # pragma: no cover - foreign frame
            q_codes, q_uniques = pd.factorize(df["q_id"], sort=False)
            pair_qno = q_codes.astype(np.int64)
            uniq = np.asarray(q_uniques, dtype=object)
            sorted_codes = bool((np.diff(pair_qno) >= 0).all())
            first = np.empty(len(pair_qno), dtype=bool)
            if len(pair_qno):
                first[0] = True
                np.not_equal(pair_qno[1:], pair_qno[:-1], out=first[1:])
            uniq_idx = np.flatnonzero(first)
        else:
            pair_qno = np.cumsum(first, dtype=np.int64) - 1
        q_counts = np.bincount(pair_qno, minlength=len(uniq)).astype(
            np.int64
        )
        queries = (
            df["query"].iloc[uniq_idx].tolist()
            if sorted_codes
            else df.loc[~df["q_id"].duplicated(), "query"].tolist()
        )
        return {
            "rows_mat": rows_mat,
            "counts_pp": counts_pp,
            "k": k,
            "pair_qno": pair_qno,
            "sorted": sorted_codes,
            "q_counts": q_counts,
            "lex": df["score"].to_numpy(dtype=np.float32),
            "queries": queries,
            "q_uniques": uniq,
            # per-request output row order: q_id descending (the Ranking
            # sort invariant) — baked into the merged slot layout so the
            # packed result needs no post-hoc sort
            "by_rank": np.argsort(uniq)[::-1].astype(np.int64),
            "id_arr": df["id"].array,
            "n_pairs": len(df),
            "score_dtype": df.dtypes["score"],
        }

    def _serve_arrays(
        self,
        preps: "list[dict]",
        alpha: float,
        cutoff: int,
        refine: "int | None" = None,
    ) -> "Callable[[], tuple[np.ndarray, np.ndarray]] | None":
        """Merged array-path serve over per-request :meth:`_serve_prep` dicts.

        Merges the resolved arrays (numpy concats only), dispatches ONE
        fused serve program, and returns a zero-arg
        ``finish() -> (vals, pair_idx)``: row ``q_offset[r] + i`` holds
        request ``r``'s ``i``-th output query (its queries in ``by_rank``
        = q_id-descending order), ``pair_idx`` indexes the merged flat
        pair space (request ``r``'s pairs start at ``pair_offset[r]``,
        ``-1`` marks below-depth padding), and ``vals`` are the
        interpolated top-``cutoff`` scores, descending per row.  Returns
        ``None`` when the merged workload cannot run fused (caller falls
        back to per-request :meth:`serve`).
        """
        view = self._active_view()
        if view is None or jax.process_count() > 1:
            return None
        k = max(p["k"] for p in preps)
        n_pairs = sum(p["n_pairs"] for p in preps)
        rows_parts = [
            p["rows_mat"]
            if p["k"] == k
            else np.pad(p["rows_mat"], ((0, 0), (0, k - p["k"])))
            for p in preps
        ]
        rows_mat = (
            rows_parts[0] if len(rows_parts) == 1
            else np.concatenate(rows_parts)
        )
        counts_pp = np.concatenate([p["counts_pp"] for p in preps])
        lex = np.concatenate([p["lex"] for p in preps])
        q_offs = np.zeros(len(preps) + 1, dtype=np.int64)
        q_offs[1:] = np.cumsum([len(p["q_uniques"]) for p in preps])
        n_q = int(q_offs[-1])
        pair_qno = np.concatenate(
            [p["pair_qno"] + off for p, off in zip(preps, q_offs)]
        )
        queries = [q for p in preps for q in p["queries"]]
        query_vectors = self.encode_queries(queries)

        refine_live = (
            refine is not None
            and view.kind == "dense"
            and view.mesh is None
            and view.table.ndim == 2
            and k == 1
        )
        scoring_view = (
            dataclasses.replace(view, precision="fast")
            if refine_live
            else view
        )
        plan: dict = {"_call_tok": 1}
        scores_dev = self._device_score_grouped(
            scoring_view, query_vectors, rows_mat, pair_qno, counts_pp, k,
            fetch=False, plan=plan,
        )
        if not (
            isinstance(scores_dev, jax.Array)
            and getattr(scores_dev, "is_fully_addressable", True)
        ):
            return None

        # slot rows padded to a power of two too: the fused program's
        # shape stays stable across batches with varying request mixes
        n_rows = 1 << max(3, (n_q - 1).bit_length())
        perm = np.concatenate(
            [p["by_rank"] + off for p, off in zip(preps, q_offs)]
        )
        seg_live = all(p.get("sorted") for p in preps)
        if seg_live:
            # contiguous per-query pair ranges (the common case: every
            # request frame is Ranking-sorted): ship two (n_rows,) int32
            # vectors and let the device rebuild the slot matrix —
            # kilobytes across the link instead of the multi-MB matrix
            counts_q = np.concatenate([p["q_counts"] for p in preps])
            d_max = int(counts_q.max()) if n_q else 1
            d_max = 1 << max(3, (d_max - 1).bit_length())
            starts_q = np.zeros(n_q, dtype=np.int64)
            np.cumsum(counts_q[:-1], out=starts_q[1:])
            starts_perm = np.zeros(n_rows, dtype=np.int32)
            starts_perm[:n_q] = starts_q[perm]
            counts_perm = np.zeros(n_rows, dtype=np.int32)
            counts_perm[:n_q] = counts_q[perm]
            starts_dev = jnp.asarray(starts_perm)
            counts_dev = jnp.asarray(counts_perm)
            slot_dev = None
        else:  # pragma: no cover - defensive (unsorted request frame)
            d_max = int(np.bincount(pair_qno, minlength=n_q).max())
            d_max = 1 << max(3, (d_max - 1).bit_length())
            slot = np.full((n_rows, d_max), -1, dtype=np.int32)
            order = np.argsort(pair_qno, kind="stable")
            spq = pair_qno[order]
            seg_starts = np.searchsorted(spq, np.arange(n_q))
            pos = np.arange(n_pairs, dtype=np.int64) - seg_starts[spq]
            slot[spq, pos] = order.astype(np.int32)
            slot[:n_q] = slot[perm]
            slot_dev = jnp.asarray(slot)

        kc = min(cutoff, d_max)
        lex_pad = np.zeros(ops.bucket(n_pairs), dtype=np.float32)
        lex_pad[:n_pairs] = lex
        lex_dev = jnp.asarray(lex_pad)
        if refine_live:
            from fastforward_tpu.ops.scoring import _cached_q_upload

            rows_pad = np.zeros(ops.bucket(n_pairs), dtype=np.int32)
            rows_pad[:n_pairs] = rows_mat[:, 0]
            q_perm = np.zeros(n_rows, dtype=np.int32)
            q_perm[:n_q] = perm.astype(np.int32)
            cached_qt = plan.get("q_t_dev")
            if cached_qt is not None and plan.get(
                "q_t_dev_tok"
            ) == plan.get("_call_tok"):
                q_dev, q_transposed = cached_qt[1], True
            else:  # pragma: no cover - non-streamed scoring path
                q_pad = self._pad_queries(query_vectors, view)
                q_dev, q_transposed = (
                    _cached_q_upload(q_pad, plan, "q_dev"),
                    False,
                )
            if slot_dev is None:
                packed = ops.serve_topk_refine_seg(
                    scores_dev,
                    lex_dev,
                    starts_dev,
                    counts_dev,
                    np.float32(alpha),
                    kc,
                    int(refine),
                    d_max,
                    view.table,
                    jnp.asarray(rows_pad),
                    q_dev,
                    jnp.asarray(q_perm),
                    q_transposed=q_transposed,
                )
            else:  # pragma: no cover - defensive (unsorted request frame)
                packed = ops.serve_topk_refine(
                    scores_dev,
                    lex_dev,
                    slot_dev,
                    np.float32(alpha),
                    kc,
                    int(refine),
                    view.table,
                    jnp.asarray(rows_pad),
                    q_dev,
                    jnp.asarray(q_perm),
                    q_transposed=q_transposed,
                )
        elif slot_dev is None:
            packed = ops.serve_topk_seg(
                scores_dev, lex_dev, starts_dev, counts_dev,
                np.float32(alpha), kc, d_max,
            )
        else:  # pragma: no cover - defensive (unsorted request frame)
            packed = ops.serve_topk(
                scores_dev, lex_dev, slot_dev, np.float32(alpha), kc
            )
        try:
            packed.copy_to_host_async()
        except Exception:  # pragma: no cover - backend-specific
            pass

        def finish() -> "tuple[np.ndarray, np.ndarray]":
            return ops.decode_serve_topk(ops.fetch_np(packed))

        return finish

    def _call(
        self,
        ranking: Ranking,
        early_stopping: int | None,
        early_stopping_alpha: float | None,
        early_stopping_depths: Iterable[int] | None,
        batch_size: int | None,
    ) -> Ranking:
        t0 = perf_counter()

        # prepared-run fast path: the same ranking was scored before against
        # the current table — skip all frame work and candidate resolution
        plan = self._get_plan(ranking)
        if plan is not None and early_stopping is None and plan.get("ready"):
            queries = plan["queries"]
            if batch_size is None or batch_size >= len(queries):
                query_vectors = self.encode_queries(queries)
                fast = self._score_and_sort(
                    None,
                    query_vectors,
                    plan["q_uniques"],
                    ranking._df.dtypes["score"],
                    plan=plan,
                )
                if fast is not None:
                    LOGGER.info(
                        "computed scores in %s seconds (prepared)",
                        perf_counter() - t0,
                    )
                    return fast

        # unique queries -> dense query numbers (device batch indices),
        # vectorized: factorize numbers queries by first appearance, and the
        # first-occurrence rows carry the matching query strings
        es_prep = plan.get("es_prep") if plan is not None else None
        if es_prep is not None:
            df, queries, q_uniques = es_prep
        else:
            df = ranking._df.copy()
            q_codes, q_uniques = pd.factorize(df["q_id"], sort=False)
            df["q_no"] = q_codes
            queries = df.loc[~df["q_id"].duplicated(), "query"].tolist()
            if plan is not None and early_stopping is not None:
                # warm ES calls (alpha sweeps, re-evaluation) reuse the
                # prepared frame: the plan is keyed on the ranking's frame
                # object, which is treated as immutable
                plan["es_prep"] = (df, queries, q_uniques)

        query_vectors = self.encode_queries(queries)

        num_queries = len(queries)
        if early_stopping is None and (
            batch_size is None or batch_size >= num_queries
        ):
            if plan is not None:
                plan["queries"] = queries
                plan["q_uniques"] = q_uniques
            fast = self._score_and_sort(
                df,
                query_vectors,
                q_uniques,
                ranking._df.dtypes["score"],
                plan=plan,
            )
            if fast is not None:
                LOGGER.info(
                    "computed scores in %s seconds", perf_counter() - t0
                )
                return fast

        if early_stopping is not None and (
            batch_size is None or batch_size >= num_queries
        ):
            assert early_stopping_alpha is not None
            assert early_stopping_depths is not None
            take, ff = self._early_stopping(
                df,
                query_vectors,
                early_stopping,
                early_stopping_alpha,
                early_stopping_depths,
                plan=plan,
            )
            result = self._assemble_es(
                df, take, ff, q_uniques, ranking._df.dtypes["score"], plan
            )
            LOGGER.info(
                "computed scores in %s seconds", perf_counter() - t0
            )
            return result

        def _get_result(frame: pd.DataFrame) -> pd.DataFrame:
            if early_stopping is None:
                return frame.assign(
                    ff_score=self._compute_scores(frame, query_vectors)
                )
            assert early_stopping_alpha is not None
            assert early_stopping_depths is not None
            # ES state (resolution, run offsets, semantic-score cache) is
            # frame-aligned: never plan-cache for per-batch subframes
            take, ff = self._early_stopping(
                frame,
                query_vectors,
                early_stopping,
                early_stopping_alpha,
                early_stopping_depths,
                plan=None,
            )
            return frame.iloc[take].assign(ff_score=ff)

        num_queries = len(queries)
        if batch_size is None or batch_size >= num_queries:
            result = _get_result(df)
        else:
            parts = []
            for start in tqdm(range(0, num_queries, batch_size)):
                mask = (df["q_no"] >= start) & (df["q_no"] < start + batch_size)
                parts.append(_get_result(df[mask]))
            result = pd.concat(parts)

        result["score"] = result["ff_score"]

        # order rows by (q_id desc, score desc) with an integer lexsort over
        # query codes instead of a pandas string sort
        q_rank = np.empty(len(q_uniques), dtype=np.int64)
        q_rank[np.argsort(np.asarray(q_uniques, dtype=object))[::-1]] = np.arange(
            len(q_uniques)
        )
        order = np.lexsort(
            (
                -result["score"].to_numpy(dtype=np.float64),
                q_rank[result["q_no"].to_numpy()],
            )
        )
        result = result.iloc[order]

        LOGGER.info("computed scores in %s seconds", perf_counter() - t0)
        return Ranking(
            result,
            name="fast-forward",
            dtype=ranking._df.dtypes["score"],
            copy=False,
            is_sorted=True,
        )

    # -- iteration -----------------------------------------------------------

    @abc.abstractmethod
    def _batch_iter(
        self, batch_size: int
    ) -> Iterator[tuple[np.ndarray, IDSequence, IDSequence]]:
        """Yield (stored vectors, doc IDs, psg IDs) batches (backend)."""
        pass

    def batch_iter(
        self, batch_size: int
    ) -> Iterator[tuple[np.ndarray, IDSequence, IDSequence]]:
        """Iterate over all vectors and IDs in batches (decoded if quantized).

        :param batch_size: The batch size.
        :return: Iterator of (vectors, doc IDs, psg IDs) tuples.
        """
        if self._quantizer is None:
            yield from self._batch_iter(batch_size)
        else:
            for vectors, doc_ids, psg_ids in self._batch_iter(batch_size):
                yield self._quantizer.decode(vectors), doc_ids, psg_ids

    def __iter__(self) -> Iterator[tuple[np.ndarray, str | None, str | None]]:
        """Iterate over all (vector, doc ID, psg ID) triples."""
        for vectors, doc_ids, psg_ids in self.batch_iter(2**9):
            yield from zip(vectors, doc_ids, psg_ids)
