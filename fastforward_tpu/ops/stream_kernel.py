"""Pallas streaming-select kernel: the scoring hot loop, fused in VMEM.

Same algorithm as ``ops.scoring.score_pairs_streamed`` (stream table tiles,
score against all queries on the MXU, select candidates with one-hot
contractions) but fused into one Pallas program: the tile DMA is
double-buffered by the Pallas pipeline, the one-hot and all intermediates
live in VMEM (the XLA scan version round-trips them through HBM every step),
and the virtual-tile indirection uses scalar prefetch — the table block
fetched at step ``t`` is chosen by ``tile_idx[t]`` at runtime.

Layout constraints honored (probed on v5e, see repo verify skill):
- blocks keep their last two dims either (8,128)-divisible or exactly the
  full array dims;
- the table is 4-D ``(T, R, dim//128, 128)`` so each block is a legal
  leading-dim slice;
- candidates/outputs are ``(Tv, CAP//128, 128)`` for the same reason.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: rows per table tile (VMEM: R * dim * 4B double-buffered)
KERNEL_TILE_ROWS = 512
#: candidate slots per virtual tile
KERNEL_CAP = 512


def _split_bf16(x):
    """Split fp32 into (hi, lo) bf16 parts with x ~= hi + lo."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _split_bf16x3(x):
    """Split fp32 into (hi, mid, lo) bf16 parts with x == hi + mid + lo.

    Three 8-bit-mantissa chunks cover the 24-bit fp32 significand, so the
    fp32 sum of the parts reconstructs ``x`` exactly (a two-part split
    leaves ~2^-17 relative error — NOT exact)."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _dot_bf16x3(a, b):
    """~fp32-accurate matmul from three native-bf16 MXU passes.

    Mosaic only lowers DEFAULT/HIGHEST dot precision; this implements the
    missing HIGH (bf16x3) tier manually: a@b ~= ah@bh + ah@bl + al@bh
    (the lo*lo term is below fp32 rounding).  2x cheaper than HIGHEST's
    six passes.
    """
    ah, al = _split_bf16(a)
    bh, bl = _split_bf16(b)

    def dot(x, y):
        return jax.lax.dot(x, y, preferred_element_type=jnp.float32)

    return dot(ah, bh) + dot(ah, bl) + dot(al, bh)


def _select_kernel(tile_idx_ref, table_ref, qt_ref, cand_ref, out_ref, *, precision):
    qb = qt_ref.shape[1]

    if table_ref.ndim == 4:  # legacy 3D tables: (1, R, dim//128, 128) block
        r = table_ref.shape[1]
        k, lanes = table_ref.shape[2], table_ref.shape[3]
        tile = table_ref[0].reshape(r, k * lanes)  # (R, dim)
    else:  # 2D tables: (R, dim) block — no sublane padding, no reshape
        r = table_ref.shape[0]
        tile = table_ref[...]
    # tile scores against all queries: (R, dim) @ (dim, Qb) on the MXU
    if precision == "high":
        tile_scores = _dot_bf16x3(tile.astype(jnp.float32), qt_ref[...])
    else:
        tile_scores = jax.lax.dot(
            tile.astype(jnp.float32),
            qt_ref[...],
            precision=precision,
            preferred_element_type=jnp.float32,
        )  # (R, Qb)

    cand = cand_ref[0]  # (CAP//128, 128) int32, packed local * Qb + qno
    local = cand // qb
    qsel = cand % qb

    # row selection: one-hot over R, contracted on the MXU
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, r), 2)

    def select(scores, onehot_dtype, dot_precision):
        onehot = (local[:, :, None] == row_iota).astype(onehot_dtype)
        return jax.lax.dot_general(
            onehot,
            scores,
            dimension_numbers=(((2,), (0,)), ((), ())),
            precision=dot_precision,
            preferred_element_type=jnp.float32,
        )  # (CAP//128, 128, Qb)

    if precision == "high":
        # selection copies single values: split the scores into bf16 parts
        # and select each with native-bf16 passes (exact one-hot products)
        s_hi, s_lo = _split_bf16(tile_scores)
        picked = select(
            s_hi, jnp.bfloat16, jax.lax.Precision.DEFAULT
        ) + select(s_lo, jnp.bfloat16, jax.lax.Precision.DEFAULT)
    else:
        picked = select(tile_scores, jnp.float32, precision)

    # query selection: masked reduction on the VPU
    q_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, qb), 2)
    q_onehot = (qsel[:, :, None] == q_iota).astype(jnp.float32)
    out_ref[0] = jnp.sum(picked * q_onehot, axis=-1)


@functools.partial(
    jax.jit, static_argnames=("r", "interpret", "precision")
)
def stream_select(
    table: jax.Array,
    qvecs_t: jax.Array,
    cand3: jax.Array,
    tile_idx: jax.Array,
    r: int = KERNEL_TILE_ROWS,
    interpret: bool = False,
    precision: str = "exact",
) -> jax.Array:
    """Fused streaming matmul-select scoring.

    :param table: Embedding table, ``(N_pad, dim)`` (preferred: lanes are
        exact multiples of 128, so the device layout has NO sublane
        padding) or legacy ``(N_pad, dim//128, 128)`` (padded 33% at
        dim=768 — T(8,128) tiling rounds the middle dim up to 8, and the
        in-program 4D reshape materializes a second padded copy);
        ``N_pad % r == 0``.
    :param qvecs_t: Transposed query vectors, ``(dim, Qb)`` fp32.
    :param cand3: Packed candidates ``local * Qb + qno``,
        ``(Tv, CAP//128, 128)`` int32.
    :param tile_idx: Base tile per virtual tile, ``(Tv,)`` int32.
    :param interpret: Pallas interpreter mode (CPU tests).
    :param precision: ``"exact"`` (full fp32 matmuls, reference parity),
        ``"high"`` (3-pass bf16, ~1e-6 relative error, ~2x faster), or
        ``"fast"`` (bf16 MXU inputs, ~6x matmul throughput, ~0.5% score
        error).
    :return: Scores per candidate slot, ``(Tv, CAP//128, 128)`` fp32.
    """
    t_virtual = cand3.shape[0]
    capr = cand3.shape[1]
    if table.ndim == 3:
        n_pad, k, lanes = table.shape
        table_in = table.reshape(n_pad // r, r, k, lanes)
        table_spec = pl.BlockSpec(
            (1, r, k, lanes),
            lambda t, tidx: (tidx[t], 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        dim = k * lanes
    else:
        n_pad, dim = table.shape
        table_in = table
        table_spec = pl.BlockSpec(
            (r, dim),
            lambda t, tidx: (tidx[t], 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_virtual,),
        in_specs=[
            table_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # q^T, full
            pl.BlockSpec(
                (1, capr, 128),
                lambda t, tidx: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, capr, 128), lambda t, tidx: (t, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    lax_precision = {
        "exact": jax.lax.Precision.HIGHEST,  # fp32 (6-pass bf16)
        "high": "high",  # manual bf16x3 (see _dot_bf16x3)
        "fast": jax.lax.Precision.DEFAULT,  # bf16 inputs
    }[precision]
    import functools as _ft

    return pl.pallas_call(
        _ft.partial(_select_kernel, precision=lax_precision),
        out_shape=jax.ShapeDtypeStruct((t_virtual, capr, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * t_virtual * (r * dim * qvecs_t.shape[1]),
            bytes_accessed=t_virtual * r * dim * 4,
            transcendentals=0,
        ),
    )(tile_idx, table_in, qvecs_t, cand3)


def stream_select_auto(
    table: jax.Array,
    qvecs_t: jax.Array,
    cand3: jax.Array,
    tile_idx: jax.Array,
    r: int = KERNEL_TILE_ROWS,
    interpret: bool = False,
    precision: str = "exact",
) -> jax.Array:
    """Dispatch to the cheapest kernel body for the requested tier.

    For 2D tables the pairwise kernel serves EVERY tier — device-time
    A/B at the flagship shape (N=2M, Q=512, 512k pairs, cap 256;
    ``bench_logs/r4n_pairwise_cap.log``, RTT amortized over chained
    dispatches): pairwise/exact 29.1 ms vs classic/exact ~80 / high ~42;
    pairwise/fast 11.9 ms vs classic/fast 14.2 (HBM streaming floor is
    ~7.5 ms).  "exact" and "high" both map to true-fp32 pairwise dots
    (strictly better than "high"'s ~1e-6 bf16x3 approximation); "fast"
    maps to the single-pass bf16 pairwise body.  3D INTEGER tables
    (int8 codes) also route pairwise when the slot capacity fits the
    tile rows — int8 values are exact in bf16, so exact/high int8
    scoring is true fp32 at 4 MXU passes.  On-chip A/B at the flagship
    int8 shape (N=2M, dim=768, Q=512, 512k pairs, cap 256;
    ``bench_logs/r4s_int8_pairwise_onchip.log``): pairwise/exact
    31.6 ms vs classic/exact 79.2 / classic/high 45.5 — faster than
    BOTH approximate classic tiers while being true fp32 (max err
    2.1e-3 vs high's 3.8e-2); pairwise/fast 23.0 vs classic/fast 25.3.
    Other 3D tables keep the classic matmul-select kernel.
    """
    if table.ndim == 2 or (
        jnp.issubdtype(table.dtype, jnp.integer)
        and cand3.shape[1] * 128 <= r
    ):
        return stream_select_pairwise(
            table, qvecs_t.T, cand3, tile_idx, r=r, interpret=interpret,
            exact=precision != "fast",
        )
    return stream_select(
        table, qvecs_t, cand3, tile_idx, r=r, interpret=interpret,
        precision=precision,
    )


def _pairwise_kernel(tile_idx_ref, table_ref, q_ref, cand_ref, out_ref, *, exact):
    """Candidate-pair scoring: select rows AND query vectors, then dot.

    The classic ``_select_kernel`` scores every tile row against every
    query (``R x dim x Qb`` MACs per tile regardless of how many
    candidates the tile holds) and then one-hot-selects the candidate
    entries.  This body instead one-hot-selects the ``CAP`` candidate
    rows (``CAP x R x dim``) and each candidate's query vector
    (``CAP x Qb x dim``), then takes rowwise dots on the VPU — cost
    scales with the candidate count, not ``R x Qb``.  At the flagship
    shape (R=1024, Qb=512, cap=256, dim=768) that is 0.6 vs 1.07 GFLOP
    per tile for the fast tier and 1.8 vs 5.4 for the exact tier; and
    the exact tier's final reduction is a TRUE fp32 dot (the 3-part
    bf16 split copies fp32 values exactly — see ``_split_bf16x3``),
    not a 6-pass matmul approximation.
    """
    qb = q_ref.shape[0]
    if table_ref.ndim == 4:  # int8 3D tables: (1, R, dim//128, 128) block
        r = table_ref.shape[1]
        tile = table_ref[0].reshape(r, table_ref.shape[2] * table_ref.shape[3])
    else:  # 2D tables: (R, dim) block
        tile = table_ref[...]
        r = tile.shape[0]
    # integer tables (int8 codes; scales folded into the queries by the
    # caller) are EXACT in bf16 (|v| <= 127 has an exact bf16 encoding),
    # so one bf16 row pass already copies them exactly — the 3-part split
    # is only needed for fp32 tables
    int_rows = jnp.issubdtype(table_ref.dtype, jnp.integer)
    cand = cand_ref[0]  # (CAP//128, 128) int32, packed local * Qb + qno
    local = cand // qb
    qsel = cand % qb

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, r), 2)
    q_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, qb), 2)
    # bf16 one-hots: 0.0/1.0 are exact in bf16, and the MXU accumulates
    # in fp32, so a one-hot pass copies each bf16 operand value exactly
    r_onehot = (local[:, :, None] == row_iota).astype(jnp.bfloat16)
    q_onehot = (qsel[:, :, None] == q_iota).astype(jnp.bfloat16)

    def pick(onehot, mat):  # (capr,128,K) x (K,dim) -> (capr,128,dim)
        return jax.lax.dot_general(
            onehot,
            mat,
            dimension_numbers=(((2,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    # Mosaic has no direct int8->bf16 cast; route through f32 (f32 of an
    # int8 value is exact, and f32->bf16 of |v|<=127 is exact too)
    tile_bf = tile.astype(jnp.float32).astype(jnp.bfloat16)
    if exact:
        # 3-part bf16 split sums back to fp32 EXACTLY, so the selected
        # rows/queries are bit-exact fp32 and the VPU dot is a true
        # fp32 dot product
        if int_rows:
            rows = pick(r_onehot, tile_bf)  # already exact in one pass
        else:
            th, tm, tl = _split_bf16x3(tile)
            rows = (
                pick(r_onehot, th) + pick(r_onehot, tm) + pick(r_onehot, tl)
            )
        qh, qm, ql = _split_bf16x3(q_ref[...])
        qrows = pick(q_onehot, qh) + pick(q_onehot, qm) + pick(q_onehot, ql)
    else:
        # fast tier: one bf16 pass per side (same rounding as a
        # DEFAULT-precision MXU matmul over bf16-truncated inputs)
        rows = pick(r_onehot, tile_bf)
        qrows = pick(q_onehot, q_ref[...].astype(jnp.bfloat16))
    out_ref[0] = jnp.sum(rows * qrows, axis=-1)


@functools.partial(jax.jit, static_argnames=("r", "interpret", "exact"))
def stream_select_pairwise(
    table: jax.Array,
    qvecs: jax.Array,
    cand3: jax.Array,
    tile_idx: jax.Array,
    r: int = KERNEL_TILE_ROWS,
    interpret: bool = False,
    exact: bool = True,
) -> jax.Array:
    """Fused streaming pair-select scoring (see ``_pairwise_kernel``).

    Same contract as :func:`stream_select` except queries are passed
    UN-transposed (``(Qb, dim)`` fp32, the one-hot contraction wants the
    query axis leading) and precision is binary: ``exact=True`` yields
    true fp32 dots (covers the classic kernel's "exact" AND "high"
    tiers at 1/3 the FLOPs), ``exact=False`` the bf16 fast tier.
    Tables may be 2D ``(N_pad, dim)`` (dense fp32/bf16) or 3D integer
    ``(N_pad, dim//128, 128)`` (int8 codes; scales folded into the
    queries by the caller) — int8 values are exact in bf16, so BOTH
    tiers copy the rows in one bf16 pass and ``exact`` int8 scoring is
    true fp32 at 4 total MXU passes (vs the classic high tier's 6-ish).

    :param table: Embedding table, ``(N_pad, dim)`` or integer
        ``(N_pad, dim//128, 128)``, ``N_pad % r == 0``.
    :param qvecs: Query vectors, ``(Qb, dim)`` fp32.
    :param cand3: Packed candidates ``local * Qb + qno``,
        ``(Tv, CAP//128, 128)`` int32.
    :param tile_idx: Base table tile per virtual tile, ``(Tv,)`` int32.
    :param interpret: Pallas interpreter mode (CPU tests).
    :param exact: True fp32 dots vs single-pass bf16.
    :return: Scores per candidate slot, ``(Tv, CAP//128, 128)`` fp32.
    """
    t_virtual = cand3.shape[0]
    capr = cand3.shape[1]
    if table.ndim == 3:  # int8 code tables
        n_pad, k, lanes = table.shape
        dim = k * lanes
        table_in = table.reshape(n_pad // r, r, k, lanes)
        table_spec = pl.BlockSpec(
            (1, r, k, lanes),
            lambda t, tidx: (tidx[t], 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        n_pad, dim = table.shape
        table_in = table
        table_spec = pl.BlockSpec(
            (r, dim),
            lambda t, tidx: (tidx[t], 0),
            memory_space=pltpu.VMEM,
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_virtual,),
        in_specs=[
            table_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # queries, full
            pl.BlockSpec(
                (1, capr, 128),
                lambda t, tidx: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, capr, 128), lambda t, tidx: (t, 0, 0), memory_space=pltpu.VMEM
        ),
    )
    passes = 3 if exact else 1
    return pl.pallas_call(
        functools.partial(_pairwise_kernel, exact=exact),
        out_shape=jax.ShapeDtypeStruct((t_virtual, capr, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            # row-select (cap x R x dim) + q-select (cap x Qb x dim)
            # contractions per pass
            flops=2
            * t_virtual
            * passes
            * (capr * 128)
            * (r + qvecs.shape[0])
            * dim,
            bytes_accessed=t_virtual * r * dim * table.dtype.itemsize,
            transcendentals=0,
        ),
    )(tile_idx, table_in, qvecs, cand3)
