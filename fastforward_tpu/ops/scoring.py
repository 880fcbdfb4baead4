"""Device scoring programs: gather -> (dequantize) -> dot -> segment-reduce.

This replaces the reference's pandas-merge + numpy hot loop
(reference: ``index/base.py:279-314``) with a single jitted device program
over integer row/segment ids:

- the embedding table lives in HBM (fp32/bf16 dense, PQ codes, or int8);
- ``rows`` selects the candidate vectors (flattened over all (query, doc)
  pairs, one entry per stored passage vector of the doc);
- ``qno`` selects the query vector for each row;
- ``seg`` maps each row to its output (query, doc) pair, and the ranking
  ``Mode`` becomes a segment reduction (max / mean / sum-of-one).

All shapes are padded to power-of-two buckets by the host so XLA compiles a
small, stable set of programs.  Dense candidate sets bypass gathering
entirely via the streaming matmul-select formulation (``streamed_scores`` /
``fastforward_tpu.ops.stream_kernel``); the gather programs below serve
sparse candidate sets and quantized codes.
"""

import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from fastforward_tpu.parallel.multihost import fetch_np

_BUCKET_MIN = 256

#: Number of chunks the per-call score fetch is split into so the device->
#: host copy overlaps with per-chunk host work (result ordering, frame
#: assembly).  On remote-attached devices the copy is the dominant warm-call
#: cost; chunking hides the host post-processing under it.  ``0``/``1``
#: disables chunking.
FETCH_CHUNKS = int(os.environ.get("FFTPU_FETCH_CHUNKS", "8"))

#: Below this many elements a single blocking fetch is cheaper than the
#: extra dispatch + per-chunk synchronization.
_FETCH_CHUNK_MIN = 1 << 17


@partial(jax.jit, static_argnames=("bounds",))
def _split_even(x, bounds):
    """Slice a 1-d array into contiguous chunks (one dispatch, many results).

    Separate result buffers let the host start one async copy per chunk —
    ``x[a:b]`` slices outside jit would each pay their own dispatch.
    """
    return tuple(
        jax.lax.slice_in_dim(x, bounds[i], bounds[i + 1])
        for i in range(len(bounds) - 1)
    )


def fetch_np_overlapped(
    arr, on_chunk=None, chunks: int | None = None, out: np.ndarray | None = None
) -> np.ndarray:
    """Fetch a 1-d single-device array, overlapping copy with host work.

    All chunk copies are started asynchronously up front (the host link
    stays busy end-to-end); ``on_chunk(lo, hi)`` runs after rows
    ``[lo, hi)`` have landed in ``out`` (allocated here unless passed in),
    while later chunks are still in flight.  Falls back to one blocking
    fetch whenever chunking is disabled, unsupported by the backend, or not
    worth the extra dispatch.
    """
    if chunks is None:
        chunks = FETCH_CHUNKS
    n = int(arr.shape[0])
    if out is None:
        out = np.empty(n, dtype=np.dtype(arr.dtype))
    parts = None
    if (
        chunks > 1
        and n >= _FETCH_CHUNK_MIN
        and getattr(arr, "ndim", 0) == 1
        and not isinstance(arr, np.ndarray)
    ):
        try:
            step = -(-n // chunks)
            bounds = tuple(min(i * step, n) for i in range(chunks + 1))
            parts = _split_even(arr, bounds)
            for p in parts:
                p.copy_to_host_async()
        except Exception:  # pragma: no cover - backend-specific
            parts = None
    if parts is not None:
        for i, p in enumerate(parts):
            lo, hi = bounds[i], bounds[i + 1]
            if hi > lo:
                out[lo:hi] = np.asarray(p)
                if on_chunk is not None:
                    on_chunk(lo, hi)
        return out
    out[:n] = np.asarray(jax.device_get(arr))
    if on_chunk is not None and n:
        on_chunk(0, n)
    return out

@jax.jit
def encode_scores_u16(scores: jnp.ndarray) -> jnp.ndarray:
    """Affine-quantize fp32 scores to uint16 for compact host transport.

    The warm serving call is bound by the device->host score copy on
    remote-attached hosts, where every fetch also pays a large FIXED cost
    (~29 ms measured over the dev tunnel, plus ~19 ms/MB): shipping u16
    codes halves the marginal bytes, and the ``[min, scale]`` calibration
    header rides IN-BAND as the first 4 elements (each fp32 bit-split into
    two u16 halves via u32 arithmetic — endian-unambiguous) so no second
    fetch is needed.  Calibration is per call over the finite entries
    (padded pairs in ``max`` mode are ``-inf``; they encode as 0 and are
    never read back).  Max dequantization error is ``(max - min) / 131070``
    — at typical dot-product score ranges far below the ``"fast"`` tier's
    bf16 compute error.  Decode with :func:`decode_scores_u16` (or
    incrementally, see ``index.base._overlap_fetch_sort``).

    :param scores: Per-pair scores, ``(S,)`` fp32 (may contain ``-inf``
        padding).
    :return: Packed ``(4 + S,)`` uint16: header then codes;
        ``score ~= min + scale * code``.
    """
    finite = jnp.isfinite(scores)
    big = jnp.float32(3.4e38)
    mn = jnp.min(jnp.where(finite, scores, big))
    mx = jnp.max(jnp.where(finite, scores, -big))
    scale = jnp.maximum(mx - mn, jnp.float32(1e-30)) / jnp.float32(65535.0)
    q = jnp.round((scores - mn) / scale)
    codes = jnp.clip(jnp.where(finite, q, 0.0), 0.0, 65535.0).astype(jnp.uint16)
    bits = jax.lax.bitcast_convert_type(jnp.stack([mn, scale]), jnp.uint32)
    header = jnp.stack(
        [
            bits[0] & 0xFFFF,
            bits[0] >> 16,
            bits[1] & 0xFFFF,
            bits[1] >> 16,
        ]
    ).astype(jnp.uint16)
    return jnp.concatenate([header, codes])


def decode_u16_header(raw4: np.ndarray) -> tuple[float, float]:
    """Reassemble the ``[min, scale]`` floats from the 4 u16 header lanes."""
    u = raw4.astype(np.uint32)
    mn = np.array([u[0] | (u[1] << 16)], dtype=np.uint32).view(np.float32)[0]
    scale = np.array([u[2] | (u[3] << 16)], dtype=np.uint32).view(np.float32)[0]
    return float(mn), float(scale)


def decode_scores_u16(packed: np.ndarray) -> np.ndarray:
    """One-shot host decode of :func:`encode_scores_u16` output."""
    mn, scale = decode_u16_header(packed[:4])
    out = packed[4:].astype(np.float32)
    out *= scale
    out += mn
    return out


#: str precision tier -> lax dot precision.  TPU matmuls DEFAULT to bf16
#: inputs; every scoring dot takes a tier so ``"exact"`` is actually fp32
#: (``Precision.HIGHEST``) on TPU, not silently truncated.  ``"high"`` is
#: XLA's native 3-pass bf16 algorithm (do NOT hand-roll the hi/lo split in
#: plain XLA — the simplifier merges the dots and drops the lo term).
LAX_PRECISION = {
    "exact": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "fast": jax.lax.Precision.DEFAULT,
}


def bucket(n: int) -> int:
    """Round up to the next power of two (>= 256) to stabilize jit shapes."""
    return max(_BUCKET_MIN, 1 << max(0, int(n - 1)).bit_length())


def pad_i32(arr: np.ndarray, size: int, fill: int) -> np.ndarray:
    """Pad a 1-d int array to ``size`` with ``fill``."""
    out = np.full((size,), fill, dtype=np.int32)
    out[: arr.shape[0]] = arr
    return out


def _segment_reduce(
    row_scores: jnp.ndarray, seg: jnp.ndarray, num_out: int, op: str
) -> jnp.ndarray:
    """Reduce per-row scores into per-pair scores.

    Padding rows carry ``seg == num_out`` (a sentinel slot that is dropped).
    """
    n = num_out + 1
    if op == "max":
        out = jax.ops.segment_max(row_scores, seg, num_segments=n)
    elif op == "mean":
        sums = jax.ops.segment_sum(row_scores, seg, num_segments=n)
        counts = jax.ops.segment_sum(
            jnp.ones_like(row_scores), seg, num_segments=n
        )
        out = sums / jnp.maximum(counts, 1.0)
    else:  # "sum": modes with exactly one row per pair (PASSAGE / FIRSTP)
        out = jax.ops.segment_sum(row_scores, seg, num_segments=n)
    return out[:num_out]


@partial(jax.jit, static_argnames=("k", "op"))
def _reduce_k_device(flat, slot, counts, k, op):
    """Gather streamed per-slot scores into ``(P, K)`` and reduce along K.

    Runs ON DEVICE so MAXP/AVEP streamed scoring fetches ``P`` floats over
    the host link instead of ``P * K`` (the dominant per-call cost is the
    fetch, not the reduction).
    """
    picked = jnp.take(flat.reshape(-1), slot, axis=0).reshape(-1, k)
    return _masked_reduce(picked, counts, op)


@jax.jit
def _gather_slots(flat, slot):
    return jnp.take(flat.reshape(-1), slot, axis=0)


@partial(jax.jit, static_argnames=("n_out", "op"))
def _gather_seg_reduce(flat, slot, seg, n_out, op):
    """Slot gather + segment reduction on device (ragged grouped layout).

    Unlike :func:`_reduce_k_device`, the per-pair row lists are RAGGED —
    ``seg[i]`` is the pair of slot ``i`` (sentinel ``n_out`` for padding).
    Used by the hybrid tier so doc-mode partials cross the host link as
    ``(n_out,)`` per side instead of per-row.
    """
    picked = jnp.take(flat.reshape(-1), slot, axis=0)
    return _segment_reduce(picked, seg, n_out, op)


@partial(jax.jit, static_argnames=("r", "precision", "k", "op"))
def _stream_select_finalized(
    table, q_t, cand, tile_idx, slot, counts, r, precision, k, op
):
    """Pallas streaming kernel + slot gather (+ optional K reduction) as ONE
    jitted program — a single dispatch over the host link instead of two.

    ``counts is None`` (k == 1): returns the gathered ``(P,)`` scores.
    Otherwise: masked K-axis ranking reduction on device first.
    """
    from fastforward_tpu.ops import stream_kernel

    outs = stream_kernel.stream_select_auto(
        table, q_t, cand, tile_idx, r=r, precision=precision
    )
    if counts is None:
        return jnp.take(outs.reshape(-1), slot, axis=0)
    picked = jnp.take(outs.reshape(-1), slot, axis=0).reshape(-1, k)
    return _masked_reduce(picked, counts, op)


@partial(jax.jit, static_argnames=("r", "precision", "n_out", "op"))
def _stream_select_seg_finalized(
    table, q_t, cand, tile_idx, slot, seg, r, precision, n_out, op
):
    """Pallas streaming kernel + slot gather + SEGMENT reduction, fused.

    The ragged-grouped twin of :func:`_stream_select_finalized` (hybrid
    tier doc modes): only ``(n_out,)`` floats cross the host link.
    """
    from fastforward_tpu.ops import stream_kernel

    outs = stream_kernel.stream_select_auto(
        table, q_t, cand, tile_idx, r=r, precision=precision
    )
    picked = jnp.take(outs.reshape(-1), slot, axis=0)
    return _segment_reduce(picked, seg, n_out, op)


def _slot_dev_cached(slot_of_pair, plan, slot_key):
    """Device copy of the pair->slot map, cached in the run plan."""
    slot_dev = plan.get(slot_key) if plan is not None else None
    if slot_dev is None and int(slot_of_pair.max(initial=0)) < 2**31:
        slot_dev = jnp.asarray(slot_of_pair.astype(np.int32))
        if plan is not None:
            plan[slot_key] = slot_dev
    return slot_dev


def _slot_np_cached(slot_of_pair, plan, slot_key):
    """Numpy-int32 twin of :func:`_slot_dev_cached` for multi-host jits
    (process-committed device copies can't feed a global-mesh program;
    replicated numpy can).  Caches the cast, or ``None`` when the slot
    space exceeds int32."""
    key = slot_key + "_np"
    slot_np = plan.get(key) if plan is not None else None
    if slot_np is None and int(slot_of_pair.max(initial=0)) < 2**31:
        slot_np = slot_of_pair.astype(np.int32)
        if plan is not None:
            plan[key] = slot_np
    return slot_np


def _cached_q_upload(q_host: np.ndarray, plan: dict | None, key: str):
    """Device copy of the query block, reused across calls when unchanged.

    Repeated re-ranking re-encodes the same queries to bitwise-identical
    vectors; a ~0.2 ms host compare then saves the per-call device upload
    (~1.5 MB over the host link at Q=512).
    """
    cached = plan.get(key) if plan is not None else None
    if cached is not None and np.array_equal(cached[0], q_host):
        if plan is not None:
            # stamp: this upload was content-validated against THIS
            # call's queries (the serve refine path reuses it without a
            # second compare when the stamp matches its call token)
            plan[key + "_tok"] = plan.get("_call_tok")
        return cached[1]
    q_dev = jnp.asarray(q_host)
    if plan is not None:
        plan[key] = (q_host, q_dev)
        plan[key + "_tok"] = plan.get("_call_tok")
    return q_dev


def _seg_dev_cached(seg: np.ndarray, plan, key):
    """Device copy of a per-row segment map, cached in the run plan."""
    seg_dev = plan.get(key) if plan is not None else None
    if seg_dev is None:
        seg_dev = jnp.asarray(seg.astype(np.int32))
        if plan is not None:
            plan[key] = seg_dev
    return seg_dev


def host_segment_reduce(
    scores: np.ndarray, seg: np.ndarray, n_out: int, op: str
) -> np.ndarray:
    """Numpy segment reduction (``max``/``sum``) — host fallback twin of
    the device ``_segment_reduce`` for ragged grouped layouts."""
    if op == "max":
        out = np.full(n_out, -np.inf, dtype=np.float32)
        np.maximum.at(out, seg, scores)
        return out
    out = np.zeros(n_out, dtype=np.float64)
    np.add.at(out, seg, scores)
    return out.astype(np.float32)


def _finalize_streamed(
    outs, slot_of_pair, reduce, plan, slot_key, seg_reduce=None, fetch=True
):
    """Fetch streamed scores, gathering/reducing on device when possible.

    With ``fetch=False`` the single-device branches return the DEVICE
    result (callers overlap the host copy with post-processing); branches
    that must finish on the host still return numpy.

    - ``reduce=(op, k, counts_dev)``: slot gather + masked K reduction run
      on device; only the ``(P,)`` result crosses the host link.
    - ``seg_reduce=(op, seg, n_out)``: slot gather + ragged SEGMENT
      reduction on device (hybrid-tier doc modes); only ``(n_out,)``
      floats cross the host link.
    - ``reduce=None`` with a run plan: the slot gather alone runs on device
      (fetch ``(P,)`` floats instead of the full ``(Tv*CAP,)`` slot grid —
      the fetch is the dominant per-call cost on remote-attached devices).
    - fallback: fetch all slots, index on host.

    The device copy of ``slot_of_pair`` is cached in ``plan[slot_key]``.
    Multi-host (``outs`` not fully addressable): the jit receives
    replicated numpy slot/count arrays instead of process-committed device
    copies, and the result is assembled with ``fetch_np``.
    """
    multi = not getattr(outs, "is_fully_addressable", True)
    if seg_reduce is not None:
        op, seg, n_out = seg_reduce
        if multi:
            slot_np = _slot_np_cached(slot_of_pair, plan, slot_key)
            if slot_np is not None:
                seg_key = slot_key + "_seg_np"
                seg_np = plan.get(seg_key) if plan is not None else None
                if seg_np is None:
                    seg_np = seg.astype(np.int32)
                    if plan is not None:
                        plan[seg_key] = seg_np
                red = _gather_seg_reduce(outs, slot_np, seg_np, n_out, op)
                if not fetch:
                    return red
                return fetch_np(red)
        else:
            slot_dev = _slot_dev_cached(slot_of_pair, plan, slot_key)
            if slot_dev is not None:
                seg_dev = _seg_dev_cached(seg, plan, slot_key + "_seg")
                red = _gather_seg_reduce(outs, slot_dev, seg_dev, n_out, op)
                if not fetch:
                    return red
                return np.asarray(jax.device_get(red))
        picked = fetch_np(outs).reshape(-1)[slot_of_pair]
        return host_segment_reduce(picked, seg, n_out, op)
    if reduce is not None:
        op, k, counts_dev = reduce
        if multi:
            slot_np = _slot_np_cached(slot_of_pair, plan, slot_key)
            if slot_np is not None:
                red = _reduce_k_device(
                    outs, slot_np, np.asarray(counts_dev), k, op
                )
                if not fetch:
                    return red
                return fetch_np(red)
        else:
            slot_dev = _slot_dev_cached(slot_of_pair, plan, slot_key)
            if slot_dev is not None:
                red = _reduce_k_device(outs, slot_dev, counts_dev, k, op)
                if not fetch:
                    return red
                return np.asarray(jax.device_get(red))
    elif plan is not None or multi:
        if multi:
            slot_np = _slot_np_cached(slot_of_pair, plan, slot_key)
            if slot_np is not None:
                picked = _gather_slots(outs, slot_np)
                if not fetch:
                    return picked
                return fetch_np(picked)
        else:
            slot_dev = _slot_dev_cached(slot_of_pair, plan, slot_key)
            if slot_dev is not None:
                picked = _gather_slots(outs, slot_dev)
                if not fetch:
                    return picked
                return np.asarray(jax.device_get(picked))
    return fetch_np(outs).reshape(-1)[slot_of_pair]


@partial(jax.jit, static_argnames=("num_out", "op", "precision"))
def score_pairs_dense(
    table: jnp.ndarray,
    qvecs: jnp.ndarray,
    idx: jnp.ndarray,
    num_out: int,
    op: str,
    precision: str = "exact",
) -> jnp.ndarray:
    """Score (query, doc) pairs against a dense embedding table.

    :param table: Embedding table, ``(N, dim)`` or ``(N, dim//128, 128)``.
    :param qvecs: Query vectors, shape ``(Q, dim)`` fp32.
    :param idx: Stacked int32 index arrays ``(3, P)``: table row, query row,
        and output pair id per candidate vector (padding rows use
        ``num_out`` as segment sentinel).  One array = one host->device
        transfer per call.
    :param num_out: Number of output pairs (static).
    :param op: Aggregation: ``"max"`` | ``"mean"`` | ``"sum"`` (static).
    :param precision: Dot precision tier (static, see ``LAX_PRECISION``).
    :return: Per-pair scores, shape ``(num_out,)`` fp32.
    """
    prec = LAX_PRECISION[precision]
    rows, qno, seg = idx[0], idx[1], idx[2]
    if table.ndim == 3:
        q3 = qvecs.reshape(qvecs.shape[0], table.shape[1], table.shape[2])
        d = jnp.take(table, rows, axis=0).astype(jnp.float32)
        q = jnp.take(q3, qno, axis=0)
        row_scores = jnp.einsum(
            "pkl,pkl->p",
            q,
            d,
            preferred_element_type=jnp.float32,
            precision=prec,
        )
    else:
        d = jnp.take(table, rows, axis=0).astype(jnp.float32)
        q = jnp.take(qvecs, qno, axis=0)
        row_scores = jnp.einsum(
            "pd,pd->p",
            q,
            d,
            preferred_element_type=jnp.float32,
            precision=prec,
        )
    return _segment_reduce(row_scores, seg, num_out, op)


@partial(jax.jit, static_argnames=("num_out", "op"))
def score_pairs_pq(
    codes: jnp.ndarray,
    codebooks: jnp.ndarray,
    qvecs: jnp.ndarray,
    idx: jnp.ndarray,
    num_out: int,
    op: str,
) -> jnp.ndarray:
    """Score pairs against PQ codes via asymmetric distance computation.

    Instead of decoding codes to fp32 vectors (reference:
    ``index/base.py:292-293``), per-query lookup tables
    ``lut[q, m, k] = q_sub[q, m] . codeword[m, k]`` are built with one MXU
    contraction, and each candidate's score is the sum of ``M`` table lookups
    — an O(M) gather instead of an O(dim) read per row.

    :param codes: PQ codes, shape ``(N, M)`` (uint8/uint16/uint32).
    :param codebooks: Codebooks, shape ``(M, Ks, Ds)`` fp32.
    :param qvecs: Query vectors (already OPQ-rotated if applicable),
        shape ``(Q, M * Ds)`` fp32.
    :param idx: Stacked ``(3, P)`` int32 arrays (rows, qno, seg).
    :param num_out: Number of output pairs (static).
    :param op: Aggregation (static).
    :return: Per-pair scores, shape ``(num_out,)`` fp32.
    """
    rows, qno, seg = idx[0], idx[1], idx[2]
    num_q = qvecs.shape[0]
    m, ks, ds = codebooks.shape
    qsub = qvecs.reshape(num_q, m, ds)
    # HIGHEST: the LUT is tiny (Q x M x K) but feeds every ADC score; the
    # TPU default would truncate the subvectors to bf16 (~0.03 abs error)
    lut = jnp.einsum(
        "qmd,mkd->qmk",
        qsub,
        codebooks,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    # [:, :m] drops lane padding when the view stores codes 128-wide (one
    # HBM copy serves both the Pallas ADC kernel and these gather paths)
    c = jnp.take(codes, rows, axis=0)[:, :m].astype(jnp.int32)  # (P, M)
    subspace = jnp.arange(m, dtype=jnp.int32)[None, :]
    row_scores = jnp.sum(lut[qno[:, None], subspace, c], axis=-1)
    return _segment_reduce(row_scores, seg, num_out, op)


@partial(jax.jit, static_argnames=("op", "precision"))
def score_pairs_grouped(
    table: jnp.ndarray,
    qvecs: jnp.ndarray,
    idx: jnp.ndarray,
    op: str,
    precision: str = "exact",
) -> jnp.ndarray:
    """Scatter-free scoring over the dense ``(pairs, K)`` candidate layout.

    Each (query, doc) pair scores up to ``K`` passage rows; the ranking
    ``Mode`` becomes a masked reduction along the K axis (max / mean /
    first), entirely dense — no scatter/segment ops, which keeps both the
    XLA compile and the runtime schedule simple.

    :param table: Embedding table, ``(N, dim)`` or ``(N, dim//128, 128)``.
    :param qvecs: Query vectors, ``(Q, dim)`` fp32.
    :param idx: Stacked int32 ``(K + 1, S)``: the row matrix (first ``K``
        rows, transposed) and a packed last row ``qno * 256 + counts``
        (counts <= 255; 0 for padding pairs).  Packing keeps the per-call
        host->device transfer to one array of ``K + 1`` rows.
    :param op: ``"max"`` | ``"mean"`` | ``"first"`` (static).
    :param precision: Dot precision tier (static, see ``LAX_PRECISION``).
    :return: Per-pair scores, ``(S,)`` fp32.
    """
    prec = LAX_PRECISION[precision]
    k = idx.shape[0] - 1
    s = idx.shape[1]
    rows_flat = idx[:k].T.reshape(-1)  # (S*K,) row-major per pair
    qno = idx[k] >> 8
    counts = idx[k] & 0xFF

    # flat elementwise dot (simple XLA program: gather + mul + row reduce),
    # then a (S, K) reshape for the masked mode reduction
    d = jnp.take(table, rows_flat, axis=0).astype(jnp.float32)
    qno_flat = jnp.repeat(qno, k) if k > 1 else qno
    if table.ndim == 3:
        q = jnp.take(
            qvecs.reshape(qvecs.shape[0], table.shape[1], table.shape[2]),
            qno_flat,
            axis=0,
        )
        row_scores = jnp.einsum(
            "pab,pab->p",
            d,
            q,
            preferred_element_type=jnp.float32,
            precision=prec,
        )
    else:
        q = jnp.take(qvecs, qno_flat, axis=0)
        row_scores = jnp.einsum(
            "pd,pd->p",
            d,
            q,
            preferred_element_type=jnp.float32,
            precision=prec,
        )
    return _masked_reduce(row_scores.reshape(s, k), counts, op)


@partial(jax.jit, static_argnames=("precision",))
def score_pairs_bounded(
    table: jnp.ndarray,
    qvecs: jnp.ndarray,
    rows: jnp.ndarray,
    bounds: jnp.ndarray,
    precision: str = "exact",
) -> jnp.ndarray:
    """Single-row-per-pair scoring with boundary-encoded query assignment.

    The dominant re-ranking case (PASSAGE/FIRSTP, or one stored vector per
    document) sends only the row array: pairs arrive grouped by query, so
    the query number is recovered on device from the cumulative per-query
    pair counts (``qno[i] = searchsorted(bounds, i, 'right')``) — halving
    the per-call host->device transfer.

    :param table: Embedding table, ``(N, dim)`` or ``(N, dim//128, 128)``.
    :param qvecs: Query vectors, ``(Q, dim)`` fp32.
    :param rows: Table row per pair, ``(S,)`` int32.
    :param bounds: Cumulative pair counts per query (padded with ``S``),
        ``(Q,)`` int32.
    :param precision: Dot precision tier (static, see ``LAX_PRECISION``).
    :return: Per-pair scores, ``(S,)`` fp32.
    """
    prec = LAX_PRECISION[precision]
    s = rows.shape[0]
    iota = jnp.arange(s, dtype=jnp.int32)
    qno = jnp.clip(
        jnp.searchsorted(bounds, iota, side="right"), 0, qvecs.shape[0] - 1
    ).astype(jnp.int32)
    d = jnp.take(table, rows, axis=0).astype(jnp.float32)
    if table.ndim == 3:
        q = jnp.take(
            qvecs.reshape(qvecs.shape[0], table.shape[1], table.shape[2]),
            qno,
            axis=0,
        )
        return jnp.einsum(
            "pab,pab->p",
            d,
            q,
            preferred_element_type=jnp.float32,
            precision=prec,
        )
    q = jnp.take(qvecs, qno, axis=0)
    return jnp.einsum(
        "pd,pd->p", d, q, preferred_element_type=jnp.float32, precision=prec
    )


@partial(jax.jit, static_argnames=("r", "precision"))
def score_pairs_streamed(
    table: jnp.ndarray,
    qvecs: jnp.ndarray,
    cand: jnp.ndarray,
    tile_idx: jnp.ndarray,
    r: int,
    precision: str = "exact",
) -> jnp.ndarray:
    """Streaming matmul-select scoring: no gathers at all.

    XLA's row gather on TPU is per-row-overhead bound (~4us/row measured on
    v5e — 15 GB/s effective, 2% of HBM bandwidth).  For candidate sets that
    are dense relative to the corpus, it is *much* faster to stream the
    table through the MXU instead: ``lax.scan`` over ``r``-row table tiles
    computes each tile's scores against **all** queries as one matmul, and
    the per-tile candidates (host-bucketed into ``(T_virtual, CAP)`` slots)
    are selected with two dense one-hot contractions — every op is a matmul
    or elementwise, nothing gathers, the compile is seconds not minutes.

    :param table: Embedding table, ``(N_pad, dim//128, 128)``,
        ``N_pad % r == 0``.
    :param qvecs: Query vectors, ``(Qb, dim)`` fp32.
    :param cand: Packed candidates, ``(T_virtual, CAP)`` int32 with value
        ``local_row * Qb + qno`` (padding slots point at the zero padding
        query, their output is discarded).
    :param tile_idx: Base table tile per virtual tile, ``(T_virtual,)``.
    :param r: Rows per table tile (static).
    :param precision: Tile-matmul precision tier (static); candidate
        selection always runs HIGHEST (one-hot picks must copy exactly).
    :return: Scores per candidate slot, ``(T_virtual * CAP,)`` fp32.
    """
    return stream_scan(table, qvecs, cand, tile_idx, r, precision)


def stream_scan(
    table: jnp.ndarray,
    qvecs: jnp.ndarray,
    cand: jnp.ndarray,
    tile_idx: jnp.ndarray,
    r: int,
    precision: str = "exact",
) -> jnp.ndarray:
    """Traceable scan body of :func:`score_pairs_streamed` (also used inside
    the sharded SPMD program).  Tables may be 2D ``(N_pad, dim)`` (no
    sublane padding — preferred for dense fp32/bf16) or 3D
    ``(N_pad, dim//128, 128)`` (int8 code tables)."""
    qb = qvecs.shape[0]
    is3d = table.ndim == 3
    if is3d:
        k, lanes = table.shape[1], table.shape[2]
        q3 = qvecs.reshape(qb, k, lanes)
    prec = LAX_PRECISION[precision]

    def step(_, inp):
        t_idx, cand_t = inp
        # all-queries scores for this tile: one MXU matmul.  "exact" is full
        # fp32 — the TPU default truncates matmul inputs to bf16, which
        # breaks exact-score parity with the reference.
        if is3d:
            tile = jax.lax.dynamic_slice(
                table, (t_idx * r, 0, 0), (r, k, lanes)
            ).astype(jnp.float32)
            tile_scores = jnp.einsum(
                "rkl,qkl->rq",
                tile,
                q3,
                preferred_element_type=jnp.float32,
                precision=prec,
            )  # (r, Qb)
        else:
            tile = jax.lax.dynamic_slice(
                table, (t_idx * r, 0), (r, table.shape[1])
            ).astype(jnp.float32)
            tile_scores = jnp.einsum(
                "rd,qd->rq",
                tile,
                qvecs,
                preferred_element_type=jnp.float32,
                precision=prec,
            )  # (r, Qb)
        local = cand_t // qb
        qsel = cand_t % qb
        # row selection: one-hot (CAP, r) @ (r, Qb) on the MXU
        row_onehot = (
            local[:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)
        ).astype(jnp.float32)
        picked = jnp.dot(
            row_onehot,
            tile_scores,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (CAP, Qb)
        # query selection: masked row reduction on the VPU
        q_onehot = (
            qsel[:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (1, qb), 1)
        ).astype(jnp.float32)
        return None, jnp.sum(picked * q_onehot, axis=1)

    _, outs = jax.lax.scan(step, None, (tile_idx, cand))
    return outs.reshape(-1)


@partial(jax.jit, static_argnames=("r", "precision"))
def score_pairs_streamed_pq(
    codes: jnp.ndarray,
    codebooks: jnp.ndarray,
    qvecs: jnp.ndarray,
    cand: jnp.ndarray,
    tile_idx: jnp.ndarray,
    r: int,
    precision: str = "exact",
) -> jnp.ndarray:
    """Streaming ADC scoring: dequantize PQ code tiles on the MXU, no gathers.

    The grouped ADC path (:func:`score_pairs_grouped_pq`) gathers one code
    row per candidate — per-row-overhead bound on TPU exactly like dense
    gathers.  For dense candidate sets this streams the code table instead:
    each ``r``-row tile of codes is dequantized with one fp32-exact one-hot
    contraction against the codebooks on the MXU, scored against all
    queries as one matmul, and candidates are selected exactly as in
    :func:`stream_scan`.  HBM traffic is ``N * M`` bytes — 32x less than
    streaming the fp32 table at M=96, dim=768.

    :param codes: PQ codes, ``(N_pad, M)`` uint8/int8, ``N_pad % r == 0``.
    :param codebooks: PQ codebooks, ``(M, K, ds)`` fp32 (rotated space for
        OPQ; queries must be pre-rotated by the caller).
    :param qvecs: Query vectors, ``(Qb, M * ds)`` fp32.
    :param cand: Packed candidates ``local_row * Qb + qno``,
        ``(T_virtual, CAP)`` int32.
    :param tile_idx: Base table tile per virtual tile, ``(T_virtual,)``.
    :param r: Rows per code tile (static).
    :param precision: Precision tier for the tile-scores matmul
        (``"exact"`` → HIGHEST, ``"high"`` → 3-pass bf16, ``"fast"`` →
        bf16 inputs).  The one-hot dequantize itself is ALWAYS fp32-exact:
        a bf16 one-hot variant measured consistently *slower* on v5e
        (868 vs 1245 QPS at N=2M — XLA fuses the iota-compare into the
        dot, so there is no one-hot HBM traffic to save, and the bf16
        conversions only add passes).
    :return: Scores per candidate slot, ``(T_virtual * CAP,)`` fp32.
    """
    return stream_scan_pq(codes, codebooks, qvecs, cand, tile_idx, r, precision)


def stream_scan_pq(
    codes: jnp.ndarray,
    codebooks: jnp.ndarray,
    qvecs: jnp.ndarray,
    cand: jnp.ndarray,
    tile_idx: jnp.ndarray,
    r: int,
    precision: str = "exact",
) -> jnp.ndarray:
    """Traceable scan body of :func:`score_pairs_streamed_pq` (also used
    inside the sharded SPMD program)."""
    qb = qvecs.shape[0]
    m, ks, _ = codebooks.shape
    cb = codebooks.astype(jnp.float32)
    q = qvecs.astype(jnp.float32)

    def step(_, inp):
        t_idx, cand_t = inp
        code_tile = jax.lax.dynamic_slice(
            codes, (t_idx * r, 0), (r, m)
        ).astype(jnp.int32)
        onehot = (
            code_tile[:, :, None]
            == jax.lax.broadcasted_iota(jnp.int32, (1, 1, ks), 2)
        ).astype(jnp.float32)
        # HIGHEST: fp32-exact codeword selection (verified 0.0 error on
        # v5e).  A manual bf16 hi/lo split is NOT salvageable here — XLA
        # rewrites dot(a,hi)+dot(a,lo) into dot(a,hi+lo) with the sum
        # recombined in bf16, silently dropping the lo part, and the
        # rewrite survives optimization_barrier on either the inputs or
        # the first dot's result.  A bf16 one-hot tier measured SLOWER
        # than this (see :func:`score_pairs_streamed_pq`) — do not revisit
        # without re-measuring.
        deq = jnp.einsum(
            "rmk,mkd->rmd",
            onehot,
            cb,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        tile_scores = jnp.einsum(
            "rd,qd->rq",
            deq.reshape(r, -1),
            q,
            preferred_element_type=jnp.float32,
            precision=LAX_PRECISION[precision],
        )  # (r, Qb)
        local = cand_t // qb
        qsel = cand_t % qb
        row_onehot = (
            local[:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (1, r), 1)
        ).astype(jnp.float32)
        picked = jnp.dot(
            row_onehot,
            tile_scores,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (CAP, Qb)
        q_onehot = (
            qsel[:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (1, qb), 1)
        ).astype(jnp.float32)
        return None, jnp.sum(picked * q_onehot, axis=1)

    _, outs = jax.lax.scan(step, None, (tile_idx, cand))
    return outs.reshape(-1)


#: streaming tile geometry (rows per tile, candidate slots per virtual tile)
STREAM_TILE_ROWS = 1024
STREAM_CAP = 1024


def _adaptive_cap(p: int, num_tiles: int) -> int:
    """Slot capacity matched to the mean candidates per tile.

    Small caps waste less padding (fetch bytes + one-hot FLOPs) on sparse
    tiles; skewed tiles spill into extra virtual tiles either way.  Bucketed
    to powers of two so at most four program variants compile.
    """
    mean = max(1, p // max(1, num_tiles))
    return min(1024, max(128, 1 << (mean - 1).bit_length()))


_pallas_stream: bool | None = None
_pallas_failures: int = 0
#: monotonic failure count (never reset by successes) — consumers that need
#: "did ANY kernel failure happen in this window?" (preload's warm retry)
#: must use this: ``_pallas_failures`` is a *consecutive* counter that any
#: later success resets, so a failure in one thread can be masked by a
#: success in another before the window closes
_pallas_failures_total: int = 0
#: consecutive kernel failures before the Pallas path is disabled for the
#: process; below this, each failure falls back to XLA *for that call only*
#: (a transient tunnel/compile hiccup must not degrade every later call)
_PALLAS_MAX_FAILURES = 3


def pallas_stream_enabled() -> bool:
    """Whether the fused Pallas streaming kernel is used (TPU, default on)."""
    global _pallas_stream
    if _pallas_stream is None:
        import os

        _pallas_stream = (
            os.environ.get("FFTPU_PALLAS_STREAM", "1") == "1"
            and jax.default_backend() == "tpu"
        )
    return _pallas_stream


def set_pallas_stream(value: bool | None) -> None:
    """Force (or reset, with ``None``) the Pallas streaming kernel."""
    global _pallas_stream, _pallas_failures
    _pallas_stream = value
    _pallas_failures = 0


def _pallas_success() -> None:
    """A kernel call completed: reset the consecutive-failure counter."""
    global _pallas_failures
    _pallas_failures = 0


def _note_pallas_failure(exc: Exception) -> None:
    """Record a kernel failure; disable the kernel only when persistent."""
    global _pallas_failures, _pallas_failures_total, _pallas_stream
    import logging

    _pallas_failures += 1
    _pallas_failures_total += 1
    if _pallas_failures >= _PALLAS_MAX_FAILURES:
        logging.getLogger(__name__).error(
            "pallas stream kernel failed %d times (%s); disabling it for "
            "this process — set_pallas_stream(None) to re-enable",
            _pallas_failures,
            exc,
        )
        _pallas_stream = False
    else:
        logging.getLogger(__name__).warning(
            "pallas stream kernel failed (%s); using the XLA path for this "
            "call (failure %d/%d before disabling)",
            exc,
            _pallas_failures,
            _PALLAS_MAX_FAILURES,
        )


def streamed_scores(
    table: jnp.ndarray,
    q_pad: np.ndarray,
    rows: np.ndarray,
    qno: np.ndarray,
    precision: str = "exact",
    plan: dict | None = None,
    reduce: "tuple[str, int, jnp.ndarray] | None" = None,
    seg_reduce: "tuple[str, np.ndarray, int] | None" = None,
    fetch: bool = True,
) -> "np.ndarray | jax.Array | None":
    """Score ``table[rows[i]] . q_pad[qno[i]]`` via table streaming.

    With ``reduce=(op, k, counts_dev)`` the rows are treated as a flattened
    ``(P, K)`` grouped layout and the K-axis ranking reduction happens on
    device before the fetch (see :func:`_finalize_streamed`).  With
    ``seg_reduce=(op, seg, n_out)`` the rows form a RAGGED grouped layout
    (``seg[i]`` = output pair of row ``i``) and the segment reduction
    happens on device instead (mutually exclusive with ``reduce``).

    Dispatches to the fused Pallas kernel on TPU (falling back to the XLA
    scan formulation on any kernel failure), builds the candidate layout
    natively, and returns per-row scores in input order (numpy), or ``None``
    when no layout applies.

    ``plan`` is an optional per-workload cache dict: the candidate layout
    (including its *device-resident* grid arrays) is stored there on first
    use and reused on later calls with the same (rows, qno) — the repeated
    re-ranking pattern then pays neither the layout build nor the candidate
    upload, only the query transfer and the kernel.
    """
    n_pad = table.shape[0]
    qb = q_pad.shape[0]

    if pallas_stream_enabled():
        from fastforward_tpu.ops import stream_kernel

        r = stream_kernel.KERNEL_TILE_ROWS
        cached = plan.get("stream_pallas") if plan is not None else None
        if cached is None:
            cap = _adaptive_cap(rows.shape[0], n_pad // r)
            layout = build_streamed_layout(rows, qno, n_pad, qb, r=r, cap=cap)
            # scalar-prefetch tile indices live in SMEM; bound the grid size
            if layout is not None and layout[1].shape[0] > 8192:
                layout = None
            if layout is not None:
                cand, tile_idx, slot_of_pair = layout
                cached = (
                    jnp.asarray(cand.reshape(cand.shape[0], cap // 128, 128)),
                    jnp.asarray(tile_idx),
                    slot_of_pair,
                )
                if plan is not None:
                    plan["stream_pallas"] = cached
        if cached is not None:
            cand_dev, tile_dev, slot_of_pair = cached
            try:
                q_t = np.ascontiguousarray(
                    q_pad.T.reshape(-1, qb).astype(np.float32)
                )
                q_dev = _cached_q_upload(q_t, plan, "q_t_dev")
                slot_dev = _slot_dev_cached(
                    slot_of_pair, plan, "stream_pallas_slot"
                )
                if slot_dev is not None and seg_reduce is not None:
                    # kernel + slot gather + segment reduce as one dispatch
                    op, seg, n_out = seg_reduce
                    seg_dev = _seg_dev_cached(
                        seg, plan, "stream_pallas_slot_seg"
                    )
                    out = _stream_select_seg_finalized(
                        table, q_dev, cand_dev, tile_dev, slot_dev,
                        seg_dev, r, precision, n_out, op,
                    )
                    result = (
                        out if not fetch
                        else np.asarray(jax.device_get(out))
                    )
                elif slot_dev is not None:
                    # kernel + slot gather (+ K reduce) as one dispatch
                    if reduce is not None:
                        op, k, counts_dev = reduce
                    else:
                        op, k, counts_dev = "first", 1, None
                    out = _stream_select_finalized(
                        table, q_dev, cand_dev, tile_dev, slot_dev,
                        counts_dev, r, precision, k, op,
                    )
                    result = (
                        out if not fetch
                        else np.asarray(jax.device_get(out))
                    )
                else:  # slot map too large for int32: fetch-all fallback
                    outs = stream_kernel.stream_select_auto(
                        table, q_dev, cand_dev, tile_dev,
                        r=r, precision=precision,
                    )
                    result = _finalize_streamed(
                        outs, slot_of_pair, reduce, plan,
                        "stream_pallas_slot", seg_reduce=seg_reduce,
                        fetch=fetch,
                    )
                _pallas_success()
                return result
            except Exception as e:  # pragma: no cover - device-specific
                _note_pallas_failure(e)
                if plan is not None:
                    plan.pop("stream_pallas", None)

    cached = plan.get("stream_xla") if plan is not None else None
    if cached is None:
        cap = _adaptive_cap(rows.shape[0], max(1, n_pad // STREAM_TILE_ROWS))
        layout = build_streamed_layout(
            rows, qno, n_pad, qb, r=STREAM_TILE_ROWS, cap=cap
        )
        if layout is None:
            return None
        cand, tile_idx, slot_of_pair = layout
        cached = (jnp.asarray(cand), jnp.asarray(tile_idx), slot_of_pair)
        if plan is not None:
            plan["stream_xla"] = cached
    cand_dev, tile_dev, slot_of_pair = cached
    outs = score_pairs_streamed(
        table,
        _cached_q_upload(np.asarray(q_pad, dtype=np.float32), plan, "q_dev"),
        cand_dev,
        tile_dev,
        STREAM_TILE_ROWS,
        precision,
    )
    return _finalize_streamed(
        outs, slot_of_pair, reduce, plan, "stream_xla_slot",
        seg_reduce=seg_reduce, fetch=fetch,
    )


@partial(jax.jit, static_argnames=("m_pad",))
def _pad_pq_codes(codes, m_pad):
    """Lane-align the code table for the Pallas ADC kernel (device, once):
    ``(N, M) -> (N, M_PAD)``.  Spare columns are never read (the kernel
    slices the real ``m``)."""
    return jnp.pad(codes, ((0, 0), (0, m_pad - codes.shape[1])))


@partial(jax.jit, static_argnames=("m", "r", "precision", "k", "op"))
def _stream_select_pq_finalized(
    codes_p, bd_hi, bd_mid, bd_lo, q_t, cand, tile_idx, slot, counts,
    m, r, precision, k, op,
):
    """Pallas ADC kernel + slot gather (+ K reduction) as ONE dispatch."""
    from fastforward_tpu.ops import stream_kernel_pq

    outs = stream_kernel_pq.stream_select_pq_auto(
        codes_p, bd_hi, bd_mid, bd_lo, q_t, cand, tile_idx,
        m=m, r=r, precision=precision,
    )
    if counts is None:
        return jnp.take(outs.reshape(-1), slot, axis=0)
    picked = jnp.take(outs.reshape(-1), slot, axis=0).reshape(-1, k)
    return _masked_reduce(picked, counts, op)


@partial(jax.jit, static_argnames=("m", "r", "precision", "n_out", "op"))
def _stream_select_pq_seg_finalized(
    codes_p, bd_hi, bd_mid, bd_lo, q_t, cand, tile_idx, slot, seg,
    m, r, precision, n_out, op,
):
    """Pallas ADC kernel + slot gather + SEGMENT reduction, fused.

    The ragged-grouped twin of :func:`_stream_select_pq_finalized`
    (hybrid-tier doc modes over PQ tables): only ``(n_out,)`` floats cross
    the host link.
    """
    from fastforward_tpu.ops import stream_kernel_pq

    outs = stream_kernel_pq.stream_select_pq_auto(
        codes_p, bd_hi, bd_mid, bd_lo, q_t, cand, tile_idx,
        m=m, r=r, precision=precision,
    )
    picked = jnp.take(outs.reshape(-1), slot, axis=0)
    return _segment_reduce(picked, seg, n_out, op)


def _streamed_pq_pallas(
    codes, codebooks, q_pad, rows, qno, plan, reduce, precision, table_cache,
    seg_reduce=None, fetch=True,
):
    """Fused Pallas streamed-ADC path, or ``None`` to use the XLA scan."""
    from fastforward_tpu.ops import stream_kernel_pq

    m = codebooks.shape[0]
    m_pad = stream_kernel_pq.M_PAD
    r = stream_kernel_pq.KERNEL_PQ_TILE_ROWS
    n_pad = codes.shape[0]
    qb = q_pad.shape[0]
    if m > m_pad or table_cache is None or n_pad % r:
        return None
    padded = table_cache.get("pq_padded")
    if padded is None:
        # index views store codes lane-padded to M_PAD already (one HBM
        # copy serves the kernel AND the gather/scan paths); only foreign
        # (N, m) tables pay a padded copy here — released when the kernel
        # is disabled (see streamed_scores_pq)
        bd = stream_kernel_pq.build_blockdiag_codebooks(
            np.asarray(jax.device_get(codebooks), dtype=np.float32)
        )
        if bd is None:  # geometry the kernel can't tile
            table_cache["pq_padded"] = False
            return None
        padded = (
            codes
            if codes.shape[1] == m_pad
            else _pad_pq_codes(codes, m_pad),
            jnp.asarray(bd[0]),
            jnp.asarray(bd[1]),
            jnp.asarray(bd[2]),
        )
        table_cache["pq_padded"] = padded
    if padded is False:
        return None
    cached = plan.get("stream_pq_pallas") if plan is not None else None
    if cached is None:
        cap = _adaptive_cap(rows.shape[0], n_pad // r)
        layout = build_streamed_layout(rows, qno, n_pad, qb, r=r, cap=cap)
        # scalar-prefetch tile indices live in SMEM; bound the grid size
        if layout is not None and layout[1].shape[0] > 32768:
            layout = None
        if layout is None:
            return None
        cand, tile_idx, slot_of_pair = layout
        cached = (
            jnp.asarray(cand.reshape(cand.shape[0], cap // 128, 128)),
            jnp.asarray(tile_idx),
            slot_of_pair,
        )
        if plan is not None:
            plan["stream_pq_pallas"] = cached
    cand_dev, tile_dev, slot_of_pair = cached
    try:
        codes_p, bd_hi, bd_mid, bd_lo = padded
        q_t = np.ascontiguousarray(q_pad.T.astype(np.float32))
        q_dev = _cached_q_upload(q_t, plan, "q_t_pq_dev")
        slot_dev = _slot_dev_cached(slot_of_pair, plan, "stream_pq_pallas_slot")
        if slot_dev is None:
            return None
        if seg_reduce is not None:
            op, seg, n_out = seg_reduce
            seg_dev = _seg_dev_cached(seg, plan, "stream_pq_pallas_slot_seg")
            out = _stream_select_pq_seg_finalized(
                codes_p, bd_hi, bd_mid, bd_lo, q_dev, cand_dev, tile_dev,
                slot_dev, seg_dev, m, r, precision, n_out, op,
            )
        else:
            if reduce is not None:
                op, k, counts_dev = reduce
            else:
                op, k, counts_dev = "first", 1, None
            out = _stream_select_pq_finalized(
                codes_p, bd_hi, bd_mid, bd_lo, q_dev, cand_dev, tile_dev,
                slot_dev, counts_dev, m, r, precision, k, op,
            )
        # fetch=False hands the device array back for an overlapped copy;
        # compile failures still raise here (inside the try), only async
        # runtime failures would then surface at the caller's fetch
        result = out if not fetch else np.asarray(jax.device_get(out))
        _pallas_success()
        return result
    except Exception as e:  # pragma: no cover - device-specific
        _note_pallas_failure(e)
        if plan is not None:
            plan.pop("stream_pq_pallas", None)
        return None


def streamed_scores_pq(
    codes: jnp.ndarray,
    codebooks: jnp.ndarray,
    q_pad: np.ndarray,
    rows: np.ndarray,
    qno: np.ndarray,
    plan: dict | None = None,
    reduce: "tuple[str, int, jnp.ndarray] | None" = None,
    precision: str = "exact",
    table_cache: dict | None = None,
    seg_reduce: "tuple[str, np.ndarray, int] | None" = None,
    fetch: bool = True,
) -> "np.ndarray | jax.Array | None":
    """ADC-score ``codes[rows[i]] . q_pad[qno[i]]`` via code-table streaming.

    Same candidate bucketing (and optional layout ``plan`` cache) as
    :func:`streamed_scores`; scores are exact decode-then-dot (see
    :func:`score_pairs_streamed_pq`).  On TPU the fused Pallas ADC kernel
    runs first (``stream_kernel_pq`` — VMEM-resident dequantize, no HBM
    round trips; ``table_cache`` holds the lane-aligned code/codebook
    copies), falling back to the XLA scan on any failure.  With
    ``seg_reduce=(op, seg, n_out)`` the rows form a RAGGED grouped layout
    and the segment reduction runs on device before the fetch (mutually
    exclusive with ``reduce`` — hybrid-tier doc modes).  Returns per-row
    scores in input order, or ``None`` when the layout doesn't apply.
    """
    n_pad = codes.shape[0]
    qb = q_pad.shape[0]

    if pallas_stream_enabled():
        result = _streamed_pq_pallas(
            codes, codebooks, q_pad, rows, qno, plan, reduce, precision,
            table_cache, seg_reduce=seg_reduce, fetch=fetch,
        )
        if result is not None:
            return result
    elif table_cache is not None and table_cache.get("pq_padded"):
        # kernel disabled (3-strike or forced off): the lane-aligned code
        # copy (up to 128/m x the code-table bytes) and codebook splits
        # are dead weight in HBM — release them; rebuilt if re-enabled
        table_cache.pop("pq_padded", None)
    cached = plan.get("stream_pq") if plan is not None else None
    if cached is None:
        cap = _adaptive_cap(rows.shape[0], max(1, n_pad // STREAM_TILE_ROWS))
        layout = build_streamed_layout(
            rows, qno, n_pad, qb, r=STREAM_TILE_ROWS, cap=cap
        )
        if layout is None:
            return None
        cand, tile_idx, slot_of_pair = layout
        cached = (jnp.asarray(cand), jnp.asarray(tile_idx), slot_of_pair)
        if plan is not None:
            plan["stream_pq"] = cached
    cand_dev, tile_dev, slot_of_pair = cached
    outs = score_pairs_streamed_pq(
        codes,
        codebooks,
        _cached_q_upload(np.asarray(q_pad, dtype=np.float32), plan, "q_dev"),
        cand_dev,
        tile_dev,
        STREAM_TILE_ROWS,
        precision,
    )
    return _finalize_streamed(
        outs, slot_of_pair, reduce, plan, "stream_pq_slot",
        seg_reduce=seg_reduce, fetch=fetch,
    )


def build_streamed_layout(
    rows: np.ndarray,
    qno: np.ndarray,
    n_pad: int,
    qb: int,
    r: int = STREAM_TILE_ROWS,
    cap: int = STREAM_CAP,
) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    """Bucket candidates into the streamed kernel's (virtual tile, slot) grid.

    Pure numpy, O(P).  Returns ``(cand, tile_idx, slot_of_pair)`` where
    ``slot_of_pair`` maps each input pair to its flat output position, or
    ``None`` when the layout doesn't apply (too many queries to pack).

    :param rows: Table row per pair, ``(P,)``.
    :param qno: Query per pair, ``(P,)``.
    :param n_pad: Padded table rows (multiple of ``r``).
    :param qb: Padded query count (pack modulus).
    :param r: Rows per table tile.
    :param cap: Candidate slots per virtual tile.
    """
    if qb * r > 2**31 - 1 or n_pad % r != 0:
        return None
    num_tiles = n_pad // r
    p = rows.shape[0]
    if p == 0:
        return None

    # single-pass native builder (no sorting); numpy fallback below
    from fastforward_tpu.runtime.idmap import native_stream_layout

    native = native_stream_layout(rows, qno, n_pad, qb, r, cap, qb - 1)
    if native is not None:
        return native

    tile_of = rows // r
    order = np.argsort(tile_of, kind="stable")
    counts = np.bincount(tile_of[order], minlength=num_tiles)
    starts = np.zeros(num_tiles + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])

    vt_per_tile = -(-counts // cap)  # ceil; 0 for empty tiles
    vt_base = np.zeros(num_tiles + 1, dtype=np.int64)
    np.cumsum(vt_per_tile, out=vt_base[1:])
    t_virtual = int(vt_base[-1])
    if t_virtual == 0:
        return None
    t_bucket = max(8, 1 << (t_virtual - 1).bit_length())

    within = np.arange(p, dtype=np.int64) - starts[tile_of[order]]
    vtile = vt_base[tile_of[order]] + within // cap
    slot = within % cap

    pad_value = qb - 1  # local row 0, zero-padding query
    cand = np.full((t_bucket, cap), pad_value, dtype=np.int32)
    local = (rows[order] - tile_of[order] * r).astype(np.int64)
    cand[vtile, slot] = (local * qb + qno[order]).astype(np.int32)

    tile_idx = np.zeros(t_bucket, dtype=np.int32)
    tile_idx[:t_virtual] = np.repeat(
        np.arange(num_tiles, dtype=np.int32), vt_per_tile
    )

    slot_of_pair = np.empty(p, dtype=np.int64)
    slot_of_pair[order] = vtile * cap + slot
    return cand, tile_idx, slot_of_pair


def masked_reduce_host(
    mat: np.ndarray, counts: np.ndarray, op: str
) -> np.ndarray:
    """Numpy twin of :func:`_masked_reduce` for host-side K reductions."""
    k = mat.shape[1]
    if op == "first" or k == 1:
        return mat[:, 0]
    valid = np.arange(k)[None, :] < counts[:, None]
    if op == "max":
        return np.where(valid, mat, np.float32(-np.inf)).max(axis=1)
    sums = np.where(valid, mat, np.float32(0.0)).sum(axis=1)
    return (sums / np.maximum(counts, 1)).astype(np.float32)


def _masked_reduce(scores: jnp.ndarray, counts: jnp.ndarray, op: str):
    """Reduce ``(S, K)`` scores along K, honoring per-pair counts."""
    k = scores.shape[1]
    if op == "first" or k == 1:
        return scores[:, 0]
    valid = (
        jnp.arange(k, dtype=jnp.int32)[None, :] < counts[:, None]
    )
    if op == "max":
        return jnp.where(valid, scores, -jnp.inf).max(axis=1)
    # mean
    total = jnp.where(valid, scores, 0.0).sum(axis=1)
    return total / jnp.maximum(counts, 1).astype(jnp.float32)


@partial(jax.jit, static_argnames=("op",))
def score_pairs_grouped_pq(
    codes: jnp.ndarray,
    codebooks: jnp.ndarray,
    qvecs: jnp.ndarray,
    idx: jnp.ndarray,
    op: str,
) -> jnp.ndarray:
    """Grouped-layout ADC scoring against PQ codes (see ``score_pairs_pq``).

    :param codes: PQ codes, ``(N, M)``.
    :param codebooks: Codebooks, ``(M, Ks, Ds)`` fp32.
    :param qvecs: (OPQ-rotated) query vectors, ``(Q, M * Ds)``.
    :param idx: Stacked int32 ``(K + 1, S)`` (row matrix + packed
        ``qno * 256 + counts`` row).
    :param op: ``"max"`` | ``"mean"`` | ``"first"`` (static).
    :return: Per-pair scores, ``(S,)`` fp32.
    """
    k = idx.shape[0] - 1
    s = idx.shape[1]
    rows_mat = idx[:k].T
    qno = idx[k] >> 8
    counts = idx[k] & 0xFF

    num_q = qvecs.shape[0]
    m, ks, ds = codebooks.shape
    lut = jnp.einsum(
        "qmd,mkd->qmk",
        qvecs.reshape(num_q, m, ds),
        codebooks,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    c = jnp.take(codes, rows_mat.reshape(-1), axis=0)[:, :m].astype(
        jnp.int32
    )
    subspace = jnp.arange(m, dtype=jnp.int32)[None, :]
    qno_flat = jnp.repeat(qno, k)
    row_scores = jnp.sum(lut[qno_flat[:, None], subspace, c], axis=-1)
    return _masked_reduce(row_scores.reshape(s, k), counts, op)


def interpolate_scores(
    lexical: jnp.ndarray, semantic: jnp.ndarray, alpha: float
) -> jnp.ndarray:
    """On-device score interpolation ``alpha * lexical + (1-alpha) * semantic``.

    (Reference host equivalent: ``ranking.py:293-326``.)
    """
    return _interpolate(lexical, semantic, alpha)


@jax.jit
def _interpolate(lexical, semantic, alpha):
    return alpha * lexical + (1.0 - alpha) * semantic


def _slot_from_segments(
    starts: jnp.ndarray, counts: jnp.ndarray, d_max: int
) -> jnp.ndarray:
    """Rebuild the ``(Q, D)`` slot matrix on device from per-row segments.

    When pair query numbers are non-decreasing (the Ranking sort invariant
    guarantees it for every frame the serve paths see), query ``q``'s flat
    pair positions are the contiguous range ``starts[q] .. starts[q] +
    counts[q]``, so the full slot matrix is derivable from two ``(Q,)``
    int32 vectors — the host uploads kilobytes instead of the multi-MB
    materialized matrix (the dominant per-batch upload on the
    BatchingServer array path).
    """
    d = jnp.arange(d_max, dtype=jnp.int32)[None, :]
    return jnp.where(
        d < counts[:, None], starts[:, None] + d, jnp.int32(-1)
    )


def _serve_topk_body(scores_pad, lex_pad, slot_mat, alpha, cutoff):
    valid = slot_mat >= 0
    safe = jnp.where(valid, slot_mat, 0)
    # gather BOTH sides per slot (rather than interpolating the flat arrays
    # elementwise) so score arrays of any padded length >= n_pairs work
    interp = alpha * lex_pad[safe] + (1.0 - alpha) * scores_pad[safe]
    gathered = jnp.where(valid, interp, -jnp.inf)
    vals, pos = jax.lax.top_k(gathered, cutoff)
    pair_idx = jnp.take_along_axis(slot_mat, pos, axis=1)
    return jnp.stack(
        [
            jax.lax.bitcast_convert_type(
                vals.astype(jnp.float32), jnp.int32
            ),
            pair_idx.astype(jnp.int32),
        ],
        axis=0,
    )


@partial(jax.jit, static_argnames=("cutoff",))
def serve_topk(
    scores_pad: jnp.ndarray,
    lex_pad: jnp.ndarray,
    slot_mat: jnp.ndarray,
    alpha,
    cutoff: int,
) -> jnp.ndarray:
    """Fused serving tail: interpolate + per-query top-k, on device.

    Computes ``alpha * lexical + (1 - alpha) * semantic`` per pair
    (reference host equivalent: ``ranking.py:293-326``), scatters the
    interpolated scores into the per-query candidate layout and selects the
    top ``cutoff`` pairs per query (reference ``ranking.py:279-291``), all
    inside one jit — so only ``(2, Q, cutoff)`` int32 cross the
    device->host link instead of the full per-pair score array (the
    dominant warm-call cost on remote-attached serving hosts).

    ``alpha`` is a traced scalar: alpha sweeps reuse the compiled program.
    Row order of ``slot_mat`` is the caller's output query order; invalid
    slots are ``-1`` (selected only when a query has fewer than ``cutoff``
    candidates; they surface as ``-inf`` scores / ``-1`` indices for the
    host to drop).

    :param scores_pad: Per-pair semantic scores, ``(S,)`` fp32 (padded).
    :param lex_pad: Per-pair lexical (first-stage) scores, ``(S,)`` fp32.
    :param slot_mat: ``(Q, D)`` int32 flat pair positions, ``-1`` padding.
    :param alpha: Interpolation parameter (traced fp32 scalar).
    :param cutoff: Top-k per query (static).
    :return: ``(2, Q, cutoff)`` int32 — ``[0]`` the selected interpolated
        scores (fp32 bit pattern), ``[1]`` the selected flat pair indices.
    """
    return _serve_topk_body(scores_pad, lex_pad, slot_mat, alpha, cutoff)


@partial(jax.jit, static_argnames=("cutoff", "d_max"))
def serve_topk_seg(
    scores_pad: jnp.ndarray,
    lex_pad: jnp.ndarray,
    starts: jnp.ndarray,
    counts: jnp.ndarray,
    alpha,
    cutoff: int,
    d_max: int,
) -> jnp.ndarray:
    """:func:`serve_topk` with the slot matrix built on device.

    ``starts``/``counts`` are ``(Q,)`` int32 in output-row order (rows past
    the live queries carry ``counts == 0``); the candidate layout must be
    contiguous per query in the flat pair space (non-decreasing pair query
    numbers).  Identical packed result, ~1000x less host->device transfer
    than shipping the materialized ``(Q, D)`` matrix.
    """
    slot_mat = _slot_from_segments(starts, counts, d_max)
    return _serve_topk_body(scores_pad, lex_pad, slot_mat, alpha, cutoff)


@partial(jax.jit, static_argnames=("cutoff", "margin", "q_transposed"))
def serve_topk_refine(
    scores_fast: jnp.ndarray,
    lex_pad: jnp.ndarray,
    slot_mat: jnp.ndarray,
    alpha,
    cutoff: int,
    margin: int,
    table: jnp.ndarray,
    rows_pad: jnp.ndarray,
    q_dev: jnp.ndarray,
    q_perm: jnp.ndarray,
    q_transposed: bool = False,
) -> jnp.ndarray:
    """Two-phase fused serving tail: fast preselect, exact rescore, cut.

    Phase 1 interpolates the single-pass bf16 (``"fast"``) semantic scores
    and keeps the top ``cutoff + margin`` candidates per query; phase 2
    gathers just those candidates' table rows (a few-MB gather — tiny
    next to streaming the full table), recomputes their dots in full fp32
    (``Precision.HIGHEST``), re-interpolates, and cuts to ``cutoff``.

    Compared to :func:`serve_topk` over ``"high"`` (bf16x3) scores this
    does a third of the MXU streaming work and returns scores that are
    MORE precise (exact fp32) — the approximation is confined to the
    *preselection*: a true top-``cutoff`` candidate is lost only if the
    one-pass bf16 error (~0.4 % relative) pushes it below ``margin``
    other candidates.  Same packed ``(2, Q, cutoff)`` transport as
    :func:`serve_topk`.

    :param scores_fast: Per-pair ``"fast"``-tier scores, ``(S,)`` fp32.
    :param lex_pad: Per-pair lexical scores, ``(S,)`` fp32.
    :param slot_mat: ``(Q, D)`` int32 flat pair positions, ``-1`` padding.
    :param alpha: Interpolation parameter (traced fp32 scalar).
    :param cutoff: Top-k per query (static).
    :param margin: Extra fast-pass candidates to rescore (static).
    :param table: Dense embedding table, ``(N_pad, dim)``.
    :param rows_pad: Table row per flat pair, ``(S,)`` int32.
    :param q_dev: Query block — ``(Q, dim)`` or transposed ``(dim, Q)``.
    :param q_perm: Slot-row -> query-index permutation, ``(Q,)`` int32.
    :param q_transposed: Whether ``q_dev`` is ``(dim, Q)``.
    :return: ``(2, Q, cutoff)`` int32, packed like :func:`serve_topk`.
    """
    return _serve_topk_refine_body(
        scores_fast, lex_pad, slot_mat, alpha, cutoff, margin, table,
        rows_pad, q_dev, q_perm, q_transposed,
    )


@partial(
    jax.jit, static_argnames=("cutoff", "margin", "d_max", "q_transposed")
)
def serve_topk_refine_seg(
    scores_fast: jnp.ndarray,
    lex_pad: jnp.ndarray,
    starts: jnp.ndarray,
    counts: jnp.ndarray,
    alpha,
    cutoff: int,
    margin: int,
    d_max: int,
    table: jnp.ndarray,
    rows_pad: jnp.ndarray,
    q_dev: jnp.ndarray,
    q_perm: jnp.ndarray,
    q_transposed: bool = False,
) -> jnp.ndarray:
    """:func:`serve_topk_refine` with the slot matrix built on device.

    Same segment contract as :func:`serve_topk_seg` (contiguous per-query
    pair ranges, ``(Q,)`` int32 ``starts``/``counts`` in output-row order).
    """
    slot_mat = _slot_from_segments(starts, counts, d_max)
    return _serve_topk_refine_body(
        scores_fast, lex_pad, slot_mat, alpha, cutoff, margin, table,
        rows_pad, q_dev, q_perm, q_transposed,
    )


def _serve_topk_refine_body(
    scores_fast, lex_pad, slot_mat, alpha, cutoff, margin, table, rows_pad,
    q_dev, q_perm, q_transposed,
):
    valid = slot_mat >= 0
    safe = jnp.where(valid, slot_mat, 0)
    interp = alpha * lex_pad[safe] + (1.0 - alpha) * scores_fast[safe]
    gathered = jnp.where(valid, interp, -jnp.inf)
    kc2 = min(cutoff + margin, slot_mat.shape[1])
    _, pos = jax.lax.top_k(gathered, kc2)
    pair_idx = jnp.take_along_axis(slot_mat, pos, axis=1)  # (Q, kc2)
    pvalid = pair_idx >= 0
    psafe = jnp.where(pvalid, pair_idx, 0)
    vecs = table[rows_pad[psafe]].astype(jnp.float32)  # (Q, kc2, dim)
    q_sel = (q_dev.T if q_transposed else q_dev)[q_perm]  # (Q, dim) fp32
    exact = jnp.einsum(
        "qkd,qd->qk",
        vecs,
        q_sel.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    interp2 = alpha * lex_pad[psafe] + (1.0 - alpha) * exact
    interp2 = jnp.where(pvalid, interp2, -jnp.inf)
    vals, pos2 = jax.lax.top_k(interp2, cutoff)
    out_idx = jnp.take_along_axis(pair_idx, pos2, axis=1)
    return jnp.stack(
        [
            jax.lax.bitcast_convert_type(
                vals.astype(jnp.float32), jnp.int32
            ),
            out_idx.astype(jnp.int32),
        ],
        axis=0,
    )


def serve_topk_host(
    scores: np.ndarray,
    lex: np.ndarray,
    slot_mat: np.ndarray,
    alpha: float,
    cutoff: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Host fallback of :func:`serve_topk` for already-fetched scores.

    Same selection semantics (ties resolved toward the lower slot
    position, matching ``lax.top_k``).

    :return: ``(vals, pair_idx)`` float32/int32 arrays of ``(Q, cutoff)``.
    """
    valid = slot_mat >= 0
    taken = slot_mat[valid]
    interp = (
        np.float32(alpha) * lex[taken].astype(np.float32, copy=False)
        + np.float32(1.0 - alpha) * scores[taken].astype(np.float32, copy=False)
    )
    gathered = np.full(slot_mat.shape, -np.inf, dtype=np.float32)
    gathered[valid] = interp
    pos = np.argsort(-gathered, axis=1, kind="stable")[:, :cutoff]
    vals = np.take_along_axis(gathered, pos, axis=1)
    pair_idx = np.take_along_axis(slot_mat, pos, axis=1)
    return vals, pair_idx.astype(np.int32, copy=False)


def decode_serve_topk(packed: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Split a fetched :func:`serve_topk` result into scores + indices."""
    vals = np.ascontiguousarray(packed[0]).view(np.float32)
    return vals, packed[1]
