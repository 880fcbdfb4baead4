"""SPMD sharded scoring: corpus table split over chips, combined over ICI.

The reference has no distributed code at all (SURVEY.md §2/§5); this is the
new-design component required by the north star: MS MARCO v2-scale tables
that exceed one chip's HBM are sharded row-wise over the ``shard`` mesh axis,
query pair-arrays are data-parallel over the ``data`` axis, and the program
is one ``shard_map`` over the dense (pairs, K) candidate layout:

1. every chip gathers the candidate rows it *owns* (ownership = row-range
   test, out-of-range gathers masked to zero),
2. a ``psum`` over ``shard`` (ICI all-reduce of the per-candidate score
   matrix — each element is owned by exactly one chip, so the sum *is* the
   score) assembles full scores,
3. each data-shard reduces its own pairs' K axis locally (masked max / mean
   / first per the ranking mode) — pairs are never split across chips, so
   no second collective is needed.

Only scores ever cross ICI; candidate *vectors* stay chip-local.
"""

from functools import lru_cache

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from fastforward_tpu.ops.scoring import LAX_PRECISION, _masked_reduce


def table_sharding(mesh: Mesh, ndim: int = 3) -> NamedSharding:
    """Row-sharded placement for the embedding table."""
    return NamedSharding(mesh, P("shard", *([None] * (ndim - 1))))


def _sharded_score_fn(mesh: Mesh, op: str, precision: str, ndim: int = 3):
    """Build the shard_map scoring program for one aggregation op."""
    prec = LAX_PRECISION[precision]

    def body(table_local, qvecs, idx):
        k = idx.shape[0] - 1
        s = idx.shape[1]
        rows_flat = idx[:k].T.reshape(-1)  # (S_local * K,)
        qno = idx[k] >> 8
        counts = idx[k] & 0xFF

        # chip-local gather: mask rows this shard does not own
        shard = jax.lax.axis_index("shard")
        n_local = table_local.shape[0]
        local = rows_flat - shard * n_local
        owned = (local >= 0) & (local < n_local)
        safe = jnp.where(owned, local, 0)

        d = jnp.take(table_local, safe, axis=0).astype(jnp.float32)
        qno_flat = jnp.repeat(qno, k) if k > 1 else qno
        if table_local.ndim == 3:
            a, b = table_local.shape[1], table_local.shape[2]
            q = jnp.take(qvecs.reshape(qvecs.shape[0], a, b), qno_flat, axis=0)
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
        scores = (row_scores * owned.astype(jnp.float32)).reshape(s, k)

        # each element owned by exactly one shard: psum assembles the scores
        scores = jax.lax.psum(scores, "shard")
        return _masked_reduce(scores, counts, op)

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P("shard", *([None] * (ndim - 1))),  # table (rows sharded)
            P(),  # qvecs replicated
            P(None, "data"),  # stacked (K+2, S) pair arrays split over data
        ),
        out_specs=P("data"),  # each data shard owns its pairs' results
        check_vma=False,
    )
    return jax.jit(mapped)


@lru_cache(maxsize=16)
def _cached_scorer(mesh: Mesh, op: str, precision: str = "exact", ndim: int = 3):
    return _sharded_score_fn(mesh, op, precision, ndim)


def _sharded_stream_fn(mesh: Mesh, r: int, precision: str, ndim: int = 3):
    """Per-shard streaming program: each chip streams only its own table
    shard through the MXU (see ``ops.scoring.stream_scan``); candidates are
    pre-partitioned by owning shard on the host, so no collective is needed
    at all — outputs concatenate along the ``shard`` axis."""
    from fastforward_tpu.ops.scoring import stream_scan

    def body(table_local, qvecs, cand, tile_idx):
        return stream_scan(table_local, qvecs, cand[0], tile_idx[0], r, precision)

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P("shard", *([None] * (ndim - 1))),  # table rows sharded
            P(),  # qvecs replicated
            P("shard", None, None),  # per-shard candidate grids
            P("shard", None),  # per-shard tile indices
        ),
        out_specs=P("shard"),
        check_vma=False,
    )
    return jax.jit(mapped, static_argnames=())


@lru_cache(maxsize=16)
def _cached_stream_scorer(
    mesh: Mesh, r: int, precision: str = "exact", ndim: int = 3
):
    return _sharded_stream_fn(mesh, r, precision, ndim)


def streamed_scores_sharded(
    mesh: Mesh,
    table: jax.Array,
    q_pad: "np.ndarray",
    rows: "np.ndarray",
    qno: "np.ndarray",
    precision: str = "exact",
    plan: dict | None = None,
    reduce: "tuple | None" = None,
    seg_reduce: "tuple | None" = None,
    fetch: bool = True,
) -> "np.ndarray | jax.Array | None":
    """Sharded equivalent of ``ops.streamed_scores``.

    Partitions candidates by their owning shard on the host, builds one
    streamed layout per shard (padded to a common virtual-tile count), and
    runs the per-shard streaming program.  Returns per-row scores in input
    order (or per-pair scores with ``reduce=(op, k, counts_dev)`` — the
    slot gather and the ranking-mode K reduction then run on device, so
    only ``P`` floats cross the host link; the cross-shard slot traffic
    rides ICI inside the jit).  With ``seg_reduce=(op, seg, n_out)`` the
    rows form a RAGGED grouped layout and the segment reduction runs on
    device instead (sharded-hybrid doc modes).  ``None`` when the layout
    doesn't apply.  ``plan`` optionally caches the per-shard grids.
    """
    import numpy as np

    from fastforward_tpu.ops import scoring

    cached = plan.get("stream_sharded") if plan is not None else None
    if cached is None:
        num_shards = mesh.shape["shard"]
        n_pad = table.shape[0]
        if n_pad % num_shards:
            return None
        n_local = n_pad // num_shards
        r = scoring.STREAM_TILE_ROWS
        if n_local % r or rows.shape[0] == 0:
            return None
        qb = q_pad.shape[0]
        cap = scoring._adaptive_cap(
            max(1, rows.shape[0] // num_shards), max(1, n_local // r)
        )

        shard_of = rows // n_local
        layouts = []
        masks = []
        t_virtual = 1
        for shard in range(num_shards):
            mask = shard_of == shard
            masks.append(mask)
            local = (rows[mask] - shard * n_local).astype(np.int64)
            layout = scoring.build_streamed_layout(
                local, qno[mask], n_local, qb, r=r, cap=cap
            )
            layouts.append(layout)
            if layout is not None:
                t_virtual = max(t_virtual, layout[1].shape[0])

        pad_value = qb - 1
        cand_all = np.full(
            (num_shards, t_virtual, cap), pad_value, dtype=np.int32
        )
        tile_idx_all = np.zeros((num_shards, t_virtual), dtype=np.int32)
        slot_of_pair = np.empty(rows.shape[0], dtype=np.int64)
        for shard, (layout, mask) in enumerate(zip(layouts, masks)):
            if layout is None:
                continue
            cand, tile_idx, slots = layout
            cand_all[shard, : cand.shape[0]] = cand
            tile_idx_all[shard, : tile_idx.shape[0]] = tile_idx
            slot_of_pair[mask] = shard * (t_virtual * cap) + slots
        cached = (cand_all, tile_idx_all, slot_of_pair, r)
        if plan is not None:
            plan["stream_sharded"] = cached

    cand_all, tile_idx_all, slot_of_pair, r = cached
    outs = _cached_stream_scorer(mesh, r, precision, table.ndim)(
        table, q_pad.astype(np.float32), cand_all, tile_idx_all
    )
    from fastforward_tpu.ops.scoring import _finalize_streamed

    return _finalize_streamed(
        outs, slot_of_pair, reduce, plan, "stream_sharded_slot",
        seg_reduce=seg_reduce, fetch=fetch,
    )


def _sharded_pq_score_fn(mesh: Mesh, op: str):
    """Gather-ADC scoring over row-sharded PQ codes, combined with a psum.

    Mirrors ``_sharded_score_fn``: each chip owns a contiguous row range of
    the code table; the per-query lookup tables (``lut[q, m, k] = q_sub .
    codeword``) are built from the *replicated* codebooks on every chip (the
    LUT is tiny, Q x M x Ks), each chip ADC-scores the code rows it owns,
    non-owned rows are masked to zero, and one ``psum`` over ICI assembles
    the full scores — only scores cross the interconnect, never codes.
    """

    def body(codes_local, codebooks, qvecs, idx):
        k = idx.shape[0] - 1
        s = idx.shape[1]
        rows_flat = idx[:k].T.reshape(-1)
        qno = idx[k] >> 8
        counts = idx[k] & 0xFF

        shard = jax.lax.axis_index("shard")
        n_local = codes_local.shape[0]
        local = rows_flat - shard * n_local
        owned = (local >= 0) & (local < n_local)
        safe = jnp.where(owned, local, 0)

        num_q = qvecs.shape[0]
        m, ks, ds = codebooks.shape
        # HIGHEST: the LUT feeds every ADC score (TPU default would
        # truncate the subvectors to bf16, ~0.03 abs error)
        lut = jnp.einsum(
            "qmd,mkd->qmk",
            qvecs.reshape(num_q, m, ds),
            codebooks,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        # [:, :m]: views may store codes lane-padded to 128 (shared with
        # the Pallas ADC kernel); padding columns are never read
        c = jnp.take(codes_local, safe, axis=0)[:, :m].astype(
            jnp.int32
        )  # (S*K, M)
        qno_flat = jnp.repeat(qno, k) if k > 1 else qno
        subspace = jnp.arange(m, dtype=jnp.int32)[None, :]
        row_scores = jnp.sum(lut[qno_flat[:, None], subspace, c], axis=-1)
        scores = (row_scores * owned.astype(jnp.float32)).reshape(s, k)
        scores = jax.lax.psum(scores, "shard")
        return _masked_reduce(scores, counts, op)

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P("shard", None),  # codes (rows sharded)
            P(),  # codebooks replicated
            P(),  # qvecs replicated
            P(None, "data"),  # pair arrays split over data
        ),
        out_specs=P("data"),
        check_vma=False,
    )
    return jax.jit(mapped)


@lru_cache(maxsize=16)
def _cached_pq_scorer(mesh: Mesh, op: str):
    return _sharded_pq_score_fn(mesh, op)


def score_pairs_sharded_pq(
    mesh: Mesh,
    codes: jax.Array,
    codebooks: jax.Array,
    qvecs: jax.Array,
    idx: jax.Array,
    op: str,
) -> jax.Array:
    """Sharded equivalent of ``ops.score_pairs_grouped_pq``.

    :param mesh: Mesh with ``data`` and ``shard`` axes.
    :param codes: Row-sharded PQ codes ``(N_pad, M)`` (``N_pad`` divisible
        by the ``shard`` axis size).
    :param codebooks: Replicated codebooks ``(M, Ks, Ds)`` fp32.
    :param qvecs: Replicated (OPQ-rotated) query vectors ``(Qb, M * Ds)``.
    :param idx: Stacked int32 ``(K + 1, Sb)`` pair arrays.
    :param op: ``"max"`` | ``"mean"`` | ``"first"``.
    :return: Per-pair scores, ``(Sb,)``.
    """
    return _cached_pq_scorer(mesh, op)(codes, codebooks, qvecs, idx)


def _sharded_pq_stream_fn(mesh: Mesh, r: int):
    """Per-shard streamed ADC: each chip streams only its own code-table
    shard through the MXU (one-hot dequantize + matmul, see
    ``ops.scoring.stream_scan_pq``); candidates are pre-partitioned by
    owning shard on the host, so no collective is needed."""
    from fastforward_tpu.ops.scoring import stream_scan_pq

    def body(codes_local, codebooks, qvecs, cand, tile_idx):
        return stream_scan_pq(
            codes_local, codebooks, qvecs, cand[0], tile_idx[0], r
        )

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P("shard", None),  # code rows sharded
            P(),  # codebooks replicated
            P(),  # qvecs replicated
            P("shard", None, None),  # per-shard candidate grids
            P("shard", None),  # per-shard tile indices
        ),
        out_specs=P("shard"),
        check_vma=False,
    )
    return jax.jit(mapped)


@lru_cache(maxsize=16)
def _cached_pq_stream_scorer(mesh: Mesh, r: int):
    return _sharded_pq_stream_fn(mesh, r)


def streamed_scores_sharded_pq(
    mesh: Mesh,
    codes: jax.Array,
    codebooks: jax.Array,
    q_pad: "np.ndarray",
    rows: "np.ndarray",
    qno: "np.ndarray",
    plan: dict | None = None,
    reduce: "tuple | None" = None,
    seg_reduce: "tuple | None" = None,
) -> "np.ndarray | None":
    """Sharded equivalent of ``ops.streamed_scores_pq``.

    Same host-side candidate partitioning as ``streamed_scores_sharded``;
    each chip dequantize-streams its own code rows.  Returns per-row scores
    in input order (or per-pair scores with ``reduce`` — gather + K
    reduction on device; ragged ``seg_reduce`` as in
    ``streamed_scores_sharded``), or ``None`` when the layout doesn't
    apply.
    """
    import numpy as np

    from fastforward_tpu.ops import scoring

    cached = plan.get("stream_sharded_pq") if plan is not None else None
    if cached is None:
        num_shards = mesh.shape["shard"]
        n_pad = codes.shape[0]
        if n_pad % num_shards:
            return None
        n_local = n_pad // num_shards
        r = scoring.STREAM_TILE_ROWS
        if n_local % r or rows.shape[0] == 0:
            return None
        qb = q_pad.shape[0]
        cap = scoring._adaptive_cap(
            max(1, rows.shape[0] // num_shards), max(1, n_local // r)
        )
        shard_of = rows // n_local
        layouts, masks = [], []
        t_virtual = 1
        for shard in range(num_shards):
            mask = shard_of == shard
            masks.append(mask)
            local = (rows[mask] - shard * n_local).astype(np.int64)
            layout = scoring.build_streamed_layout(
                local, qno[mask], n_local, qb, r=r, cap=cap
            )
            layouts.append(layout)
            if layout is not None:
                t_virtual = max(t_virtual, layout[1].shape[0])
        pad_value = qb - 1
        cand_all = np.full(
            (num_shards, t_virtual, cap), pad_value, dtype=np.int32
        )
        tile_idx_all = np.zeros((num_shards, t_virtual), dtype=np.int32)
        slot_of_pair = np.empty(rows.shape[0], dtype=np.int64)
        for shard, (layout, mask) in enumerate(zip(layouts, masks)):
            if layout is None:
                continue
            cand, tile_idx, slots = layout
            cand_all[shard, : cand.shape[0]] = cand
            tile_idx_all[shard, : tile_idx.shape[0]] = tile_idx
            slot_of_pair[mask] = shard * (t_virtual * cap) + slots
        cached = (cand_all, tile_idx_all, slot_of_pair, r)
        if plan is not None:
            plan["stream_sharded_pq"] = cached

    cand_all, tile_idx_all, slot_of_pair, r = cached
    outs = _cached_pq_stream_scorer(mesh, r)(
        codes, codebooks, q_pad.astype(np.float32), cand_all, tile_idx_all
    )
    from fastforward_tpu.ops.scoring import _finalize_streamed

    return _finalize_streamed(
        outs, slot_of_pair, reduce, plan, "stream_sharded_pq_slot",
        seg_reduce=seg_reduce,
    )


def score_pairs_sharded(
    mesh: Mesh,
    table: jax.Array,
    qvecs: jax.Array,
    idx: jax.Array,
    op: str,
    precision: str = "exact",
) -> jax.Array:
    """Sharded equivalent of ``ops.score_pairs_grouped``.

    :param mesh: Mesh with ``data`` and ``shard`` axes.
    :param table: Row-sharded 3D table ``(N_pad, dim//128, 128)``
        (``N_pad`` divisible by the ``shard`` axis size).
    :param qvecs: Replicated query vectors ``(Qb, dim)``.
    :param idx: Stacked int32 ``(K + 1, Sb)`` (row matrix + packed
        ``qno * 256 + counts`` row); ``Sb`` divisible by ``data``.
    :param op: ``"max"`` | ``"mean"`` | ``"first"``.
    :param precision: Dot precision tier (see ``ops.scoring.LAX_PRECISION``).
    :return: Per-pair scores, ``(Sb,)``.
    """
    return _cached_scorer(mesh, op, precision, table.ndim)(table, qvecs, idx)
