"""Beyond-HBM tier: host-RAM tables streamed through the scoring kernel.

Corpora whose tables exceed one chip's HBM (MS MARCO v1 at 8.8M x 768 is
~27 GB fp32 against 16 GB on a v5e; MS MARCO v2-scale int8/PQ tables
overflow too) are served from a **hybrid** view — dense fp32/bf16 rows,
int8 code rows (scales folded into the queries), or PQ code rows
(ADC-streamed against replicated codebooks, ~1/32 the dense traffic)
(SURVEY.md §7 step 5; the reference serves arbitrary N from disk,
reference: ``index/disk.py:309-336``):

- an HBM-**resident prefix** of the table, scored exactly like a normal
  device table (streamed matmul-select, or a device gather-dot for sparse
  candidate sets);
- a host-RAM **tail**, scored by *candidate-block streaming*: the tail
  candidates are compacted to unique rows, host-gathered into
  ``chunk_rows``-row blocks, shipped to HBM slabs with a one-deep upload
  prefetch (chunk ``c+1`` transfers while ``c``'s kernel runs), and each
  block is scored by the same streaming-select kernel
  (``ops.stream_kernel`` on TPU, the XLA scan on CPU) with the chunk's
  scores accumulated into one device buffer — a single ``(P,)`` fetch per
  call regardless of chunk count.

Unique-row compaction makes one code path serve every density: a sparse
candidate set (an early-stopping round) gathers and ships only the rows it
touches, while a dense set degrades to streaming the whole tail.  Warm
plans additionally cache the gathered blocks — host-side always, and
**on device** when they fit the configured budget, in which case repeat
calls pay no host->device table traffic at all.
"""

import functools
import logging

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

from fastforward_tpu.ops import scoring as _sc

LOGGER = logging.getLogger(__name__)

#: default unique rows per streamed tail chunk (x dim x 4B = slab bytes).
#: Finer chunks cache with finer granularity: the device-block budget keeps
#: whole chunks, so a chunk must be small relative to the leftover budget
#: (32k rows x 768 x 4B = 96 MB) or caching becomes all-or-nothing.
HOST_CHUNK_ROWS = 1 << 15

#: per-plan cap on host RAM spent keeping gathered (non-view) tail blocks
#: across calls.  Dense candidate sets gather contiguous chunks, which are
#: served as zero-copy views of the canonical tail and never cached; this
#: bounds the scattered-gather case, where ``_MAX_PLANS`` concurrent plans
#: could otherwise each pin up to a full tail copy.
HOST_BLOCK_CACHE_BUDGET = 2 << 30

#: cumulative host->device transfer counters for the hybrid tier
#: (diagnostics: warm plans whose blocks fit the device budget should show
#: ``upload_bytes`` flat across calls; ``fetch_floats`` counts score floats
#: crossing device->host — doc modes fetch 2 x pairs, not pairs x K).
#: Reset with :func:`reset_stats`.
STATS = {
    "uploads": 0,
    "upload_bytes": 0,
    "block_cache_hits": 0,
    "fetch_floats": 0,
}


def reset_stats() -> None:
    """Zero the hybrid-tier transfer counters."""
    STATS.update(
        uploads=0, upload_bytes=0, block_cache_hits=0, fetch_floats=0
    )


def _chunk_accum_impl(
    table, q, cand, tile_idx, out, slot, start, cb_a, cb_b, cb_c,
    *, r, precision, use_pallas, kind, m,
):
    """Score one tail block and accumulate its candidate scores into ``out``.

    ``kind`` picks the block program: ``"dense"``/``"scalar"`` run the
    streaming matmul-select (int8 blocks upcast in-kernel; scales are
    folded into the queries by the caller), ``"pq"`` runs the streamed-ADC
    program (``cb_a..cb_c`` = block-diagonal codebook splits for the Pallas
    kernel, or ``cb_a`` = the raw ``(M, Ks, Ds)`` codebooks for the scan).

    ``slot`` is padded to a power-of-two bucket; padded entries write
    garbage at positions >= this chunk's real count, which the NEXT chunk's
    block (starting exactly there) overwrites — chunks must be processed in
    increasing ``start`` order, and ``out`` is sized so even the last
    chunk's padded write stays in bounds (``dynamic_update_slice`` clamps
    out-of-bounds starts, which would corrupt earlier scores otherwise).
    """
    if kind == "pq":
        if use_pallas:
            from fastforward_tpu.ops import stream_kernel_pq

            outs = stream_kernel_pq.stream_select_pq_auto(
                table, cb_a, cb_b, cb_c, q, cand, tile_idx,
                m=m, r=r, precision=precision,
            )
        else:
            outs = _sc.stream_scan_pq(
                table, cb_a, q, cand, tile_idx, r, precision
            )
    elif use_pallas:
        from fastforward_tpu.ops import stream_kernel

        outs = stream_kernel.stream_select_auto(
            table, q, cand, tile_idx, r=r, precision=precision
        )
    else:
        outs = _sc.stream_scan(table, q, cand, tile_idx, r, precision)
    picked = jnp.take(outs.reshape(-1), slot, axis=0)
    return jax.lax.dynamic_update_slice(out, picked, (start,))


@functools.partial(jax.jit, static_argnames=("n", "n_out", "op"))
def _acc_seg_reduce(acc, seg, n, n_out, op):
    """Segment-reduce the tail accumulator's first ``n`` (real) entries on
    device; only ``(n_out,)`` floats are fetched (hybrid doc modes)."""
    return _sc._segment_reduce(acc[:n], seg, n_out, op)


_chunk_accum = None


def _get_chunk_accum():
    """Jitted chunk accumulator (donating ``out`` on real devices only)."""
    global _chunk_accum
    if _chunk_accum is None:
        donate = (4,) if jax.default_backend() == "tpu" else ()
        _chunk_accum = jax.jit(
            _chunk_accum_impl,
            static_argnames=("r", "precision", "use_pallas", "kind", "m"),
            donate_argnums=donate,
        )
    return _chunk_accum


def _pq_kernel_parts(codebooks, cache_store):
    """HOST block-diagonal hi/mid/lo codebook splits for the Pallas ADC
    kernel, cached for the view's lifetime (``None`` when the geometry
    doesn't fit the kernel — the caller then streams through the XLA ADC
    scan).  Device copies are committed per tail device by
    :func:`_pq_codebooks_on` (the view's codebooks may be mesh-replicated,
    which cannot feed the single-device chunk programs)."""
    if cache_store is None:
        return None
    parts = cache_store.get("pq_bd")
    if parts is None:
        from fastforward_tpu.ops import stream_kernel_pq

        bd = stream_kernel_pq.build_blockdiag_codebooks(
            np.asarray(jax.device_get(codebooks), dtype=np.float32)
        )
        parts = False if bd is None else bd
        cache_store["pq_bd"] = parts
    return None if parts is False else parts


def _pq_codebooks_on(codebooks, cache_store, dev, d, use_pallas):
    """Per-device codebook arrays for the tail chunk programs.

    Returns ``(cb_a, cb_b, cb_c)`` committed to ``dev`` — the bf16
    block-diagonal splits for the Pallas kernel, or the raw ``(M, Ks,
    Ds)`` codebooks (as ``cb_a``) for the XLA ADC scan — cached per
    device on the view.
    """
    store = cache_store if cache_store is not None else {}
    key = f"pq_cb{'_bd' if use_pallas else ''}@{d}"
    ent = store.get(key)
    if ent is None:
        if use_pallas:
            ent = tuple(
                jax.device_put(p, dev)
                for p in _pq_kernel_parts(codebooks, store)
            )
        else:
            cb_host = store.get("cb_host")
            if cb_host is None:
                cb_host = np.asarray(
                    jax.device_get(codebooks), dtype=np.float32
                )
                store["cb_host"] = cb_host
            ent = (jax.device_put(cb_host, dev), None, None)
        store[key] = ent
    return ent if use_pallas else (ent[0], None, None)


@functools.partial(jax.jit, static_argnames=("precision",))
def _gather_dot(table, q_pad, rows, qno, precision):
    """Device gather-dot for sparse candidate sets against a device table."""
    d = jnp.take(table, rows, axis=0).astype(jnp.float32)
    d = d.reshape(d.shape[0], -1)
    q = jnp.take(q_pad.reshape(q_pad.shape[0], -1), qno, axis=0)
    return jnp.einsum(
        "pd,pd->p",
        d,
        q,
        precision=_sc.LAX_PRECISION[precision],
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("precision", "n_out", "op"))
def _gather_dot_seg(table, q_pad, rows, qno, seg, n_out, precision, op):
    """Gather-dot + segment reduction fused on device (hybrid doc modes).

    Padded entries carry ``seg == n_out`` (dropped by the reduction); the
    fetch is ``(n_out,)`` floats instead of per-row.
    """
    scores = _gather_dot(table, q_pad, rows, qno, precision)
    return _sc._segment_reduce(scores, seg, n_out, op)


def _q_upload_dev(q_host: np.ndarray, plan: dict | None, key: str, device):
    """Per-device twin of ``scoring._cached_q_upload`` (multi-device tail
    streaming keeps one committed query copy per chip)."""
    cached = plan.get(key) if plan is not None else None
    if cached is not None and np.array_equal(cached[0], q_host):
        return cached[1]
    q_dev = jax.device_put(q_host, device)
    if plan is not None:
        plan[key] = (q_host, q_dev)
    return q_dev


def _pad_pow2(arr: np.ndarray, fill) -> np.ndarray:
    size = _sc.bucket(arr.shape[0])
    if size == arr.shape[0]:
        return arr
    out = np.full((size,), fill, dtype=arr.dtype)
    out[: arr.shape[0]] = arr
    return out


def _score_resident(
    table, q_pad, rows, qno, precision, plan, seg_reduce=None, mesh=None
) -> np.ndarray:
    """Score resident-prefix candidates (streamed when dense, gather-dot
    when sparse — XLA's row gather is per-row-overhead bound, see
    ``ops.scoring``).

    With ``seg_reduce=(op, seg, n_out)`` the per-row scores are segment-
    reduced ON DEVICE and only ``(n_out,)`` floats are fetched.  With
    ``mesh`` the prefix is row-sharded over the mesh's ``shard`` axis and
    the per-shard streaming program runs (sharded hybrid tier); the sparse
    fallback feeds the global-array jit with host (replicated) index
    arrays.
    """
    p = rows.shape[0]
    n = table.shape[0]
    if p * 500 > n:
        if mesh is not None:
            from fastforward_tpu.parallel.sharded import (
                streamed_scores_sharded,
            )

            out = streamed_scores_sharded(
                mesh,
                table,
                q_pad,
                rows.astype(np.int64),
                qno.astype(np.int64),
                precision=precision,
                plan=plan,
                seg_reduce=seg_reduce,
            )
        else:
            out = _sc.streamed_scores(
                table,
                q_pad,
                rows.astype(np.int64),
                qno.astype(np.int64),
                precision=precision,
                plan=plan,
                seg_reduce=seg_reduce,
            )
        if out is not None:
            return out if seg_reduce is not None else out[:p]
    rows_d = _pad_pow2(rows.astype(np.int32), 0)
    qno_d = _pad_pow2(qno.astype(np.int32), 0)
    if mesh is not None:
        # host arrays feed the global-mesh jit (a device copy committed to
        # one chip can't — same contract as the sharded score paths)
        q_dev = np.asarray(q_pad, dtype=np.float32)
        rows_arg, qno_arg = rows_d, qno_d
    else:
        q_dev = _sc._cached_q_upload(
            np.asarray(q_pad, dtype=np.float32), plan, "q_dev"
        )
        rows_arg, qno_arg = jnp.asarray(rows_d), jnp.asarray(qno_d)
    if seg_reduce is not None:
        op, seg, n_out = seg_reduce
        seg_d = plan.get("seg_dev") if plan is not None else None
        if seg_d is None:
            seg_d = _pad_pow2(seg.astype(np.int32), n_out)
            if mesh is None:
                seg_d = jnp.asarray(seg_d)
            if plan is not None:
                plan["seg_dev"] = seg_d
        red = _gather_dot_seg(
            table, q_dev, rows_arg, qno_arg, seg_d,
            n_out, precision, op,
        )
        return np.asarray(jax.device_get(red))
    scores = _gather_dot(table, q_dev, rows_arg, qno_arg, precision)
    return np.asarray(jax.device_get(scores))[:p]


@functools.partial(jax.jit, static_argnames=("precision",))
def _gather_adc(codes, codebooks, q_pad, rows, qno, precision):
    """Sparse ADC against a device code table: per-query LUTs + one gather.

    ``lut[q, m, k] = q[m-th subspace] . codebooks[m, k]`` is one small
    einsum (``Qb x M x Ks`` fp32); each pair's score is the sum over
    subspaces of its code's LUT entry — a ``(P, M)`` gather, never the
    ``(P, M, Ks)`` blow-up.
    """
    m, ks, ds = codebooks.shape
    c = jnp.take(codes, rows, axis=0).astype(jnp.int32)[:, :m]  # (P, M)
    q3 = q_pad.reshape(q_pad.shape[0], m, ds)
    lut = jnp.einsum(
        "qmd,mkd->qmk",
        q3,
        codebooks.astype(jnp.float32),
        precision=_sc.LAX_PRECISION[precision],
        preferred_element_type=jnp.float32,
    )
    return jnp.sum(
        lut[qno[:, None], jnp.arange(m)[None, :], c], axis=1
    )


@functools.partial(jax.jit, static_argnames=("precision", "n_out", "op"))
def _gather_adc_seg(codes, codebooks, q_pad, rows, qno, seg, n_out, precision, op):
    """:func:`_gather_adc` + segment reduction fused on device (hybrid PQ
    doc modes — only ``(n_out,)`` floats are fetched)."""
    scores = _gather_adc(codes, codebooks, q_pad, rows, qno, precision)
    return _sc._segment_reduce(scores, seg, n_out, op)


def _score_resident_pq(
    codes, codebooks, q_pad, rows, qno, precision, plan, table_cache,
    seg_reduce=None, mesh=None,
) -> np.ndarray:
    """Score resident-prefix candidates against a device PQ code table
    (streamed ADC when dense, LUT gather-ADC when sparse).

    With ``seg_reduce=(op, seg, n_out)`` the per-row scores are segment-
    reduced ON DEVICE and only ``(n_out,)`` floats are fetched.  With
    ``mesh`` the code prefix is row-sharded and the per-shard streamed-ADC
    program runs (sharded hybrid tier).
    """
    p = rows.shape[0]
    n = codes.shape[0]
    if p * 200 > n and n % _sc.STREAM_TILE_ROWS == 0:
        if mesh is not None:
            from fastforward_tpu.parallel.sharded import (
                streamed_scores_sharded_pq,
            )

            out = streamed_scores_sharded_pq(
                mesh,
                codes,
                codebooks,
                q_pad,
                rows.astype(np.int64),
                qno.astype(np.int64),
                plan=plan,
                seg_reduce=seg_reduce,
            )
        else:
            out = _sc.streamed_scores_pq(
                codes,
                codebooks,
                q_pad,
                rows.astype(np.int64),
                qno.astype(np.int64),
                plan=plan,
                precision=precision,
                table_cache=table_cache,
                seg_reduce=seg_reduce,
            )
        if out is not None:
            return out if seg_reduce is not None else out[:p]
    rows_d = _pad_pow2(rows.astype(np.int32), 0)
    qno_d = _pad_pow2(qno.astype(np.int32), 0)
    if mesh is not None:
        q_dev = np.asarray(q_pad, dtype=np.float32)
        rows_arg, qno_arg = rows_d, qno_d
    else:
        q_dev = _sc._cached_q_upload(
            np.asarray(q_pad, dtype=np.float32), plan, "q_dev"
        )
        rows_arg, qno_arg = jnp.asarray(rows_d), jnp.asarray(qno_d)
    if seg_reduce is not None:
        op, seg, n_out = seg_reduce
        seg_d = plan.get("seg_dev") if plan is not None else None
        if seg_d is None:
            seg_d = _pad_pow2(seg.astype(np.int32), n_out)
            if mesh is None:
                seg_d = jnp.asarray(seg_d)
            if plan is not None:
                plan["seg_dev"] = seg_d
        red = _gather_adc_seg(
            codes, codebooks, q_dev, rows_arg, qno_arg, seg_d, n_out,
            precision, op,
        )
        return np.asarray(jax.device_get(red))
    scores = _gather_adc(
        codes, codebooks, q_dev, rows_arg, qno_arg, precision
    )
    return np.asarray(jax.device_get(scores))[:p]


#: SMEM scalar-prefetch grid bound for the Pallas kernel (the dense path
#: uses the same cap, ``ops.scoring``); chunk layouts beyond it fall back
#: to the XLA scan, which has no prefetch grid
_PALLAS_GRID_MAX = 8192
#: the ADC kernel's grid bound (``ops.scoring._streamed_pq_pallas`` allows
#: the same: code tiles are M bytes/row, so grids run much longer)
_PALLAS_PQ_GRID_MAX = 32768


def _build_tail_chunks(
    u_rows: np.ndarray,
    u_of_pair: np.ndarray,
    qno: np.ndarray,
    qb: int,
    chunk_rows: int,
    r: int,
    use_pallas: bool,
    grid_max: int = _PALLAS_GRID_MAX,
    devices: "list | None" = None,
) -> "tuple[list[dict], np.ndarray] | None":
    """Chunk unique tail rows and build each chunk's candidate layout.

    Returns ``(chunks, order)`` where ``order`` permutes the tail pairs
    into chunk-major order (each chunk's scores land contiguously in the
    accumulator at ``chunk["start"]``), or ``None`` when ``use_pallas``
    and a chunk's virtual-tile grid exceeds the SMEM prefetch bound (the
    caller rebuilds for the XLA scan).  Raises when the streamed layout
    cannot represent the geometry (query counts beyond 2^31 / tile rows —
    not reachable with real workloads).

    With ``devices`` (> 1 and > 1 chunk) the chunks are assigned to the
    devices in contiguous near-equal ranges (``chunk["dev"]``) and each
    chunk's grid arrays are committed to its device — tail streaming then
    runs on every chip concurrently (upload bandwidth and kernel FLOPs
    scale with the device count).
    """
    chunk_of = u_of_pair // chunk_rows
    order = np.argsort(chunk_of, kind="stable")
    n_chunks = -(-u_rows.shape[0] // chunk_rows)
    counts = np.bincount(chunk_of, minlength=n_chunks)
    starts = np.zeros(n_chunks + 1, dtype=np.int64)
    np.cumsum(counts, out=starts[1:])
    if devices is not None and (len(devices) <= 1 or n_chunks <= 1):
        devices = None
    dev_of = (
        (np.arange(n_chunks) * len(devices)) // n_chunks
        if devices is not None
        else None
    )

    chunks: list[dict] = []
    for c in range(n_chunks):
        lo, hi = int(starts[c]), int(starts[c + 1])
        sel = order[lo:hi]
        local = (u_of_pair[sel] - c * chunk_rows).astype(np.int64)
        # the block only needs to cover this chunk's UNIQUE rows: bucket to
        # a power-of-two multiple of the tile size so sparse chunks (e.g.
        # early-stopping rounds, partial last chunks) upload and cache at
        # their real size instead of the full chunk_rows padding — the
        # candidate grid never addresses tiles past the unique-row count,
        # and the bucketing bounds the compile variants to log2 sizes
        u_count = int(min(chunk_rows, u_rows.shape[0] - c * chunk_rows))
        block_rows = min(
            chunk_rows,
            -(-max(r, 1 << (u_count - 1).bit_length()) // r) * r,
        )
        layout = _sc.build_streamed_layout(
            local,
            qno[sel].astype(np.int64),
            chunk_rows,
            qb,
            r=r,
            cap=_sc._adaptive_cap(max(1, hi - lo), chunk_rows // r),
        )
        if layout is None:  # pragma: no cover - 2^31 packing guard
            raise RuntimeError(
                "host-streamed layout cannot pack "
                f"{qb} queries x {r} tile rows"
            )
        cand, tile_idx, slot_of_pair = layout
        if use_pallas:
            if tile_idx.shape[0] > grid_max:
                return None
            cand = cand.reshape(cand.shape[0], -1, 128)
        dev = devices[int(dev_of[c])] if dev_of is not None else None
        put = (
            (lambda a: jax.device_put(a, dev))
            if dev is not None
            else jnp.asarray
        )
        chunks.append(
            {
                "rows": u_rows[c * chunk_rows : (c + 1) * chunk_rows],
                "block_rows": block_rows,
                "cand": put(cand),
                "tile": put(tile_idx),
                "slot": put(_pad_pow2(slot_of_pair.astype(np.int32), 0)),
                "start": np.int32(lo),
                "n": hi - lo,
                "dev": int(dev_of[c]) if dev_of is not None else 0,
            }
        )
    return chunks, order


def _chunk_block(
    chunk: dict,
    host_tail: np.ndarray,
    chunk_rows: int,
    stage_dtype,
    stage_width: int | None = None,
) -> "tuple[np.ndarray, bool]":
    """Host-gather one chunk's unique rows into an upload-ready block.

    Returns ``(block, is_view)``; ``is_view`` blocks are zero-copy slices
    of the canonical tail (the dense-candidate case, where ``rows`` is a
    full contiguous run) — free to recompute, never worth caching.
    ``stage_width`` pads the block's columns beyond the tail's (the
    lane-aligned layout the Pallas ADC kernel needs; spare columns are
    never read).
    """
    rows = chunk["rows"]
    n_rows = rows.shape[0]
    block_rows = int(chunk.get("block_rows", chunk_rows))
    width = host_tail.shape[1] if stage_width is None else stage_width
    if (
        n_rows
        and host_tail.dtype == stage_dtype
        and width == host_tail.shape[1]
    ):
        # rows come sorted-unique from np.unique: contiguous iff the span
        # equals the count
        lo = int(rows[0])
        if (
            int(rows[-1]) - lo == n_rows - 1
            and lo + block_rows <= host_tail.shape[0]
        ):
            # contiguous candidate span: zero-copy view (rows past n_rows
            # are real-but-unaddressed tail rows — the candidate grid only
            # gathers slots of candidate rows, exactly as in the full-chunk
            # view case)
            return host_tail[lo : lo + block_rows], True
        if n_rows == block_rows:
            return host_tail[rows], False
    block = np.zeros((block_rows, width), dtype=stage_dtype)
    block[:n_rows, : host_tail.shape[1]] = host_tail[rows]
    return block, False


def _block_cache_key(chunk: dict, stage_dtype, stage_width) -> tuple:
    """Content key for a chunk's gathered block (plan-independent: two
    plans whose candidate sets share a chunk's unique-row list share the
    cached device block)."""
    key = chunk.get("cache_key")
    if key is None:
        rows = chunk["rows"]
        key = (
            np.dtype(stage_dtype).char,
            stage_width,
            rows.shape[0],
            # block size is part of the identity: the Pallas and scan tile
            # sizes can bucket the same row set to different block shapes
            chunk.get("block_rows"),
            hash(rows.tobytes()),
        )
        chunk["cache_key"] = key
    return key


def _upload_block(
    chunk: dict,
    host_tail: np.ndarray,
    chunk_rows: int,
    stage_dtype,
    store: dict | None,
    budget: int,
    host_acct: dict | None = None,
    stage_width: int | None = None,
    device=None,
) -> jax.Array:
    """Return the chunk's device block, caching per the HBM budget.

    Host-side the gathered block stays on the chunk dict when it is a real
    copy (the random host gather is paid once per plan), bounded per plan
    by ``HOST_BLOCK_CACHE_BUDGET`` via ``host_acct``; zero-copy view
    blocks (dense contiguous chunks) are recomputed for free and never
    cached.  Device copies live in ``store`` — a VIEW-lifetime dict shared
    by every plan — as an LRU bounded by ``budget``: the budget caps the
    total HBM spent on cached blocks for the whole index, not per plan
    (with per-plan accounting, ``_MAX_PLANS`` concurrent rankings could
    pin plans x budget bytes and OOM the chip the budget was sized for),
    and least-recently-used blocks are evicted so early one-off plans
    (e.g. ``preload``'s synthetic warm run) can't permanently strand the
    budget on blocks no later plan hits.
    """
    blocks = None
    if store is not None:
        blocks = store.setdefault("tail_blocks", {})
        key = _block_cache_key(chunk, stage_dtype, stage_width)
        ent = blocks.get(key)
        if ent is not None:
            del blocks[key]  # LRU touch: re-insert at the back
            blocks[key] = ent
            STATS["block_cache_hits"] += 1
            return ent[0]
    host = chunk.get("block_host")
    if host is None:
        host, is_view = _chunk_block(
            chunk, host_tail, chunk_rows, stage_dtype, stage_width
        )
        if not is_view and host_acct is not None:
            cached = host_acct.get("host_cached_bytes", 0)
            if cached + host.nbytes <= HOST_BLOCK_CACHE_BUDGET:
                chunk["block_host"] = host
                host_acct["host_cached_bytes"] = cached + host.nbytes
    dev = jax.device_put(host, device)
    STATS["uploads"] += 1
    STATS["upload_bytes"] += host.nbytes
    if blocks is not None and host.nbytes <= budget:
        used = store.get("tail_bytes", 0)
        while used + host.nbytes > budget and blocks:
            old_key = next(iter(blocks))
            used -= blocks.pop(old_key)[1]
        blocks[key] = (dev, host.nbytes)
        store["tail_bytes"] = used + host.nbytes
        if chunk.pop("block_host", None) is not None and host_acct:
            host_acct["host_cached_bytes"] = max(
                0, host_acct.get("host_cached_bytes", 0) - host.nbytes
            )
    return dev


def hybrid_scores(
    resident: jax.Array,
    host_tail: np.ndarray,
    tail_start: int,
    chunk_rows: int,
    q_pad: np.ndarray,
    rows: np.ndarray,
    qno: np.ndarray,
    precision: str = "exact",
    plan: dict | None = None,
    cache_device_blocks_budget: int = 0,
    cache_store: dict | None = None,
    reduce: "tuple[str, np.ndarray, int, np.ndarray] | None" = None,
    kind: str = "dense",
    codebooks: "jax.Array | None" = None,
    mesh: "jax.sharding.Mesh | None" = None,
    _force_scan: bool = False,
) -> np.ndarray:
    """Score ``table[rows[i]] . q_pad[qno[i]]`` against a hybrid table.

    :param resident: HBM-resident table prefix, ``(R, dim)``
        (``R`` may be 0); rows ``< tail_start`` score here.  fp32 or bf16
        for ``kind="dense"``, int8 codes for ``"scalar"`` (scales already
        folded into ``q_pad``), uint8 PQ codes (optionally lane-padded to
        ``M_PAD``) for ``"pq"``.
    :param host_tail: Host-RAM tail, ``(N - tail_start, width)`` — fp32
        vectors, int8 codes, or compact ``(.., M)`` PQ codes (a zero-copy
        view of the canonical store).
    :param tail_start: First global row held by ``host_tail``.
    :param chunk_rows: Unique tail rows per streamed block.
    :param q_pad: Padded query vectors, ``(Qb, dim)`` fp32.
    :param rows: Global table row per flattened pair, ``(P,)``.
    :param qno: Query per flattened pair, ``(P,)``.
    :param precision: Dot precision tier.
    :param plan: Optional prepared-run cache; holds the chunk layouts, the
        gathered host blocks, and (within budget) device-resident blocks.
    :param cache_device_blocks_budget: Bytes of HBM that may be spent
        keeping gathered tail blocks device-resident across calls (0:
        host-cache only — every call re-ships the blocks).
    :param cache_store: View-lifetime dict holding the cached device
        blocks; the budget bounds the TOTAL across every plan served
        from this view.  ``None``: no device-block caching.
    :param reduce: ``(op, seg, n_pairs, counts)`` — doc-mode ranking
        reduction.  ``seg[i]`` is the output pair of row ``i`` (a RAGGED
        grouped layout, no padding rows); each side (resident / streamed
        tail) segment-reduces its partials ON DEVICE (max, or sum for
        mean) and the host combines them — ``2 x n_pairs`` floats cross
        the host link instead of per-row ``(P,)``.
    :param kind: What the tier streams: ``"dense"`` fp32/bf16 rows,
        ``"scalar"`` int8 code rows (scales already folded into
        ``q_pad``), or ``"pq"`` PQ code rows (ADC-streamed against
        ``codebooks``).
    :param codebooks: Device PQ codebooks ``(M, Ks, Ds)`` fp32
        (``kind="pq"`` only; rotated space for OPQ — queries arrive
        pre-rotated).
    :param mesh: When set, ``resident`` is row-sharded over the mesh's
        ``shard`` axis and the prefix scores through the per-shard SPMD
        programs (sharded hybrid tier: resident capacity = whole-mesh
        HBM); the host tail streams through the default device as usual.
    :param _force_scan: Internal — rebuild on the XLA scan path after a
        Pallas failure or an SMEM-grid overflow.
    :return: Per-pair scores in input order ``(P,)``, or per-PAIR reduced
        scores ``(n_pairs,)`` when ``reduce`` is given (fp32 numpy).
    """
    p = rows.shape[0]
    qb = q_pad.shape[0]
    state = plan.get("hybrid") if plan is not None else None
    if state is not None and state["use_pallas"] and (
        _force_scan or not _sc.pallas_stream_enabled()
    ):
        # the kernel was disabled (3-strike) after this plan warmed, or
        # this call is a post-failure retry: rebuild for the scan path
        state = None
    elif (
        state is not None
        and not state["use_pallas"]
        and state.get("retry_pallas")
        and not _force_scan
        and _sc.pallas_stream_enabled()
    ):
        # the scan state exists only because of a TRANSIENT kernel failure
        # (same per-call contract as the dense/PQ call sites): retry the
        # kernel path instead of serving the slower scan forever
        state = None
    if state is None:
        res_mask = rows < tail_start
        res_pos = np.flatnonzero(res_mask)
        tail_pos = np.flatnonzero(~res_mask)
        u_rows, u_of_pair = np.unique(
            rows[tail_pos] - tail_start, return_inverse=True
        )
        use_pallas = not _force_scan and _sc.pallas_stream_enabled()
        pq_unfit = False
        if kind == "pq" and use_pallas and (
            _pq_kernel_parts(codebooks, cache_store) is None
        ):
            # geometry the ADC kernel can't tile: stream via the XLA scan
            # (permanently — don't rebuild the state to retry the kernel)
            use_pallas = False
            pq_unfit = True
        if use_pallas and kind == "pq":
            from fastforward_tpu.ops import stream_kernel_pq

            r = stream_kernel_pq.KERNEL_PQ_TILE_ROWS
        elif use_pallas:
            from fastforward_tpu.ops import stream_kernel

            r = stream_kernel.KERNEL_TILE_ROWS
        else:
            r = _sc.STREAM_TILE_ROWS
        grid_max = (
            _PALLAS_PQ_GRID_MAX if kind == "pq" else _PALLAS_GRID_MAX
        )
        # multi-device tail: with an explicit mesh (the user opted into
        # those chips) the chunks round-robin over its devices in
        # contiguous ranges, so tail upload bandwidth and kernel FLOPs
        # scale with the chip count (single-process only — under
        # multi-controller the tail streams through this process's
        # default device)
        devices = None
        if mesh is not None and jax.process_count() == 1:
            devs = list(mesh.devices.flatten())
            if len(devs) > 1:
                devices = devs
        chunk_rows_eff = max(r, (chunk_rows // r) * r)
        built = _build_tail_chunks(
            u_rows.astype(np.int64),
            u_of_pair.astype(np.int64),
            qno[tail_pos],
            qb,
            chunk_rows_eff,
            r,
            use_pallas,
            grid_max=grid_max,
            devices=devices,
        )
        overflow = False
        if built is None:
            # virtual-tile grid too large for the kernel's SMEM prefetch:
            # this geometry runs on the XLA scan
            overflow = True
            use_pallas = False
            r = _sc.STREAM_TILE_ROWS
            chunk_rows_eff = max(r, (chunk_rows // r) * r)
            built = _build_tail_chunks(
                u_rows.astype(np.int64),
                u_of_pair.astype(np.int64),
                qno[tail_pos],
                qb,
                chunk_rows_eff,
                r,
                False,
                devices=devices,
            )
        chunks, order = built
        if len(chunks) <= 1:
            devices = None  # _build_tail_chunks kept everything default
        p_tail = tail_pos.shape[0]
        # per-device contiguous chunk ranges: (c_lo, c_hi, base_slot,
        # real_count, acc_size) — or ONE range on the default device.
        # Each accumulator is sized for the padded write of every chunk
        # it receives (_chunk_accum_impl: dynamic_update_slice must never
        # clamp)
        dev_ranges = []
        if chunks:
            bounds = [0]
            for c in range(1, len(chunks)):
                if chunks[c]["dev"] != chunks[c - 1]["dev"]:
                    bounds.append(c)
            bounds.append(len(chunks))
            for lo, hi in zip(bounds[:-1], bounds[1:]):
                base = int(chunks[lo]["start"])
                end = (
                    int(chunks[hi]["start"]) if hi < len(chunks) else p_tail
                )
                acc_size = _sc.bucket(
                    max(
                        [end - base]
                        + [
                            int(c["start"]) - base + c["slot"].shape[0]
                            for c in chunks[lo:hi]
                        ]
                    )
                )
                dev_ranges.append((lo, hi, base, end - base, acc_size))
        state = {
            "res_pos": res_pos,
            "res_rows": rows[res_pos].astype(np.int32),
            "res_qno": qno[res_pos].astype(np.int32),
            "res_plan": {},
            "tail_pos_ordered": tail_pos[order],
            "p_tail": p_tail,
            "chunks": chunks,
            "dev_ranges": dev_ranges,
            "devices": devices,
            "r": r,
            "chunk_rows": chunk_rows_eff,
            "use_pallas": use_pallas,
            # scan states built by the post-failure retry path (or while
            # the kernel was disabled) go back to the kernel once it is
            # enabled again; grid-overflow (and kernel-untileable PQ) scan
            # states don't — their geometry can never fit the kernel
            "retry_pallas": not use_pallas and not overflow and not pq_unfit,
        }
        if plan is not None:
            plan["hybrid"] = state

    seg_reduce_res = None
    if reduce is not None:
        red_op, seg, n_out, red_counts = reduce
        op2 = "max" if red_op == "max" else "sum"
        if "seg_res" not in state:
            state["seg_res"] = seg[state["res_pos"]].astype(np.int32)
            state["seg_tail_np"] = seg[state["tail_pos_ordered"]].astype(
                np.int32
            )
        seg_reduce_res = (op2, state["seg_res"], n_out)

    out = None if reduce is not None else np.empty(p, dtype=np.float32)
    res_part = tail_part = None

    # resident prefix
    if state["res_pos"].shape[0]:
        if kind == "pq":
            res_scores = _score_resident_pq(
                resident,
                codebooks,
                q_pad,
                state["res_rows"],
                state["res_qno"],
                precision,
                state["res_plan"],
                cache_store,
                seg_reduce=seg_reduce_res,
                mesh=mesh,
            )
        else:
            res_scores = _score_resident(
                resident,
                q_pad,
                state["res_rows"],
                state["res_qno"],
                precision,
                state["res_plan"],
                seg_reduce=seg_reduce_res,
                mesh=mesh,
            )
        STATS["fetch_floats"] += int(res_scores.shape[0])
        if reduce is not None:
            res_part = res_scores
        else:
            out[state["res_pos"]] = res_scores

    # streamed tail blocks
    chunks = state["chunks"]
    if chunks:
        use_pallas = state["use_pallas"]
        r = state["r"]
        chunk_rows_eff = state["chunk_rows"]
        m = 0
        cb_a = cb_b = cb_c = None
        stage_width = None
        if kind == "pq":
            from fastforward_tpu.ops import stream_kernel_pq

            m = int(codebooks.shape[0])
            stage_dtype = host_tail.dtype
            if use_pallas:
                # blocks stage lane-padded to M_PAD for the ADC kernel
                stage_width = stream_kernel_pq.M_PAD
        elif kind == "scalar":
            stage_dtype = np.int8
        else:
            stage_dtype = (
                ml_dtypes.bfloat16
                if resident.dtype == jnp.bfloat16
                else np.float32
            )
        devices = state["devices"]
        q_host = (
            np.ascontiguousarray(q_pad.T.astype(np.float32))
            if use_pallas
            else np.asarray(q_pad, dtype=np.float32)
        )
        q_key = "q_t_dev" if use_pallas else "q_dev"
        accum = _get_chunk_accum()

        def _range_store(d):
            """Per-device block-cache namespace (budget bounds EACH
            device's cached blocks — per-chip semantics under a mesh)."""
            if cache_store is None or devices is None:
                return cache_store
            return cache_store.setdefault(f"dev{d}", {})

        def _acc_zeros(size, dev):
            if dev is None:
                return jnp.zeros((size,), jnp.float32)
            from jax.sharding import SingleDeviceSharding

            return jax.jit(
                lambda: jnp.zeros((size,), jnp.float32),
                out_shardings=SingleDeviceSharding(dev),
            )()

        try:
            accs = []
            for lo, hi, base, p_rng, acc_size in state["dev_ranges"]:
                d = chunks[lo]["dev"]
                dev = devices[d] if devices is not None else None
                if dev is None:
                    q_dev = _sc._cached_q_upload(q_host, plan, q_key)
                else:
                    q_dev = _q_upload_dev(q_host, plan, f"{q_key}@{d}", dev)
                if kind == "pq":
                    cb_a, cb_b, cb_c = _pq_codebooks_on(
                        codebooks, cache_store, dev, d, use_pallas
                    )
                store_d = _range_store(d)
                acc = _acc_zeros(acc_size, dev)
                # one-deep block prefetch: ship chunk c+1 while c's
                # kernel runs (device_put is async; transfers overlap
                # the kernel dispatches).  Ranges dispatch back-to-back,
                # so each device's uploads/kernels run concurrently.
                pending = _upload_block(
                    chunks[lo], host_tail, chunk_rows_eff, stage_dtype,
                    store_d, cache_device_blocks_budget, state,
                    stage_width=stage_width, device=dev,
                )
                for c in range(lo, hi):
                    chunk = chunks[c]
                    block_dev = pending
                    if c + 1 < hi:
                        pending = _upload_block(
                            chunks[c + 1], host_tail, chunk_rows_eff,
                            stage_dtype, store_d,
                            cache_device_blocks_budget, state,
                            stage_width=stage_width, device=dev,
                        )
                    acc = accum(
                        block_dev,
                        q_dev,
                        chunk["cand"],
                        chunk["tile"],
                        acc,
                        chunk["slot"],
                        np.int32(int(chunk["start"]) - base),
                        cb_a,
                        cb_b,
                        cb_c,
                        r=r,
                        precision=precision,
                        use_pallas=use_pallas,
                        kind=kind,
                        m=m,
                    )
                accs.append(acc)
            if reduce is not None:
                if "seg_tail_devs" not in state:
                    seg_ordered = state["seg_tail_np"]
                    state["seg_tail_devs"] = [
                        jax.device_put(
                            seg_ordered[base : base + p_rng],
                            devices[chunks[lo]["dev"]]
                            if devices is not None
                            else None,
                        )
                        for lo, hi, base, p_rng, _ in state["dev_ranges"]
                    ]
                parts = []
                for acc, seg_d, (lo, hi, base, p_rng, _) in zip(
                    accs, state["seg_tail_devs"], state["dev_ranges"]
                ):
                    red = _acc_seg_reduce(acc, seg_d, p_rng, n_out, op2)
                    parts.append(np.asarray(jax.device_get(red)))
                    STATS["fetch_floats"] += n_out
                if parts:
                    if op2 == "max":
                        tail_part = np.maximum.reduce(parts)
                    else:
                        tail_part = np.sum(parts, axis=0, dtype=np.float64)
            else:
                pieces = [
                    np.asarray(jax.device_get(acc))[:p_rng]
                    for acc, (lo, hi, base, p_rng, _) in zip(
                        accs, state["dev_ranges"]
                    )
                ]
                tail_scores = (
                    np.concatenate(pieces) if len(pieces) > 1 else pieces[0]
                )
                STATS["fetch_floats"] += int(tail_scores.shape[0])
        except Exception as e:  # pragma: no cover - device-specific
            if not use_pallas:
                raise
            # same contract as every other Pallas call site: note the
            # failure (3 strikes disable the kernel process-wide) and
            # serve THIS call through the XLA scan
            _sc._note_pallas_failure(e)
            if plan is not None:
                plan.pop("hybrid", None)
            return hybrid_scores(
                resident, host_tail, tail_start, chunk_rows, q_pad, rows,
                qno, precision=precision, plan=plan,
                cache_device_blocks_budget=cache_device_blocks_budget,
                cache_store=cache_store, reduce=reduce, kind=kind,
                codebooks=codebooks, mesh=mesh, _force_scan=True,
            )
        if use_pallas:
            _sc._pallas_success()
        if reduce is None:
            out[state["tail_pos_ordered"]] = tail_scores

    if reduce is None:
        return out
    # combine the per-side partials on the host: max of maxes, or summed
    # sums divided by the (host-known) pair counts
    if red_op == "max":
        if res_part is None:
            return tail_part.astype(np.float32)
        if tail_part is None:
            return res_part.astype(np.float32)
        return np.maximum(res_part, tail_part).astype(np.float32)
    total = np.zeros(n_out, dtype=np.float64)
    if res_part is not None:
        total += res_part
    if tail_part is not None:
        total += tail_part
    return (total / np.maximum(red_counts, 1)).astype(np.float32)
