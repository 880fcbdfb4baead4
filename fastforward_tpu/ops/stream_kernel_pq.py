"""Pallas streamed-ADC kernel: PQ scoring fused in VMEM.

The XLA scan formulation (``ops.scoring.stream_scan_pq``) materializes the
dequantized tile (``r x dim`` fp32) to HBM every step and runs the
dequantize as per-subspace ``(R, Ks) @ (Ks, 8)`` dots that waste ~16x of
the MXU's lanes.  This kernel keeps everything in VMEM and restructures
the ADC math for the systolic array:

- subspaces are grouped so one group spans exactly 128 output lanes
  (``g = 128 // Ds``); each group's codebooks form a **block-diagonal**
  ``(g*Ks, 128)`` matrix, so one full-width matmul dequantizes ``g``
  subspaces at once;
- under ``precision="exact"`` the dequantize runs as THREE native-bf16
  passes over a hi/mid/lo split of the codebooks (8 mantissa bits per
  part = the full 24-bit fp32 significand; a two-part split leaves
  ~1e-5 relative error — measured — which breaks the exact tier's fp32
  parity).  For a one-hot LHS the passes select single addends, so each
  output element is ``hi + mid + lo`` accumulated in fp32 — fp32-exact
  up to the final two-add rounding (<= 1 ulp).  (The same split is
  unsound in plain XLA — the simplifier merges the dots and
  re-truncates — but safe inside Pallas.)  ``"high"``/``"fast"`` run a
  single pass against the bf16-rounded codebooks — centroid rounding
  (~0.4% relative) is noise next to the PQ quantization error, at a
  third of the dequantize FLOPs;
- the grid is one step per virtual tile (``(Tv,)``) with the group loop
  STATICALLY UNROLLED in the kernel body, ending in one lane
  concatenation of the per-group ``(R, 128)`` dequantized slices.  (A
  ``(Tv, G)`` grid with per-group VMEM scratch accumulation was probed as
  an alternative when early unrolled variants hit 450-1000 s Mosaic
  compiles; the compile blowup traced to *per-group lane concatenations
  inside the loop* — one trailing f32 concat after the unrolled dots
  compiles fine, so the simpler unrolled body shipped.)
- codes are stored row-major ``(N_pad, M_PAD)``; each grid step fetches
  its tile's ``(r, M_PAD)`` block through the index map and takes static
  lane slices per group — no dynamic lane slicing in the kernel.

Mosaic layout constraints honored (probed on v5e): NO trailing reshapes
at all in the kernel body — the one-hot is built by ``pltpu.repeat`` lane
tiling plus an iota compare, with the block-diagonal codebook rows
permuted to the matching ``k*g + j`` order (the earlier
``(R, g, Ks) -> (R, g*Ks)`` reshape lowered only when ``Ks`` was
lane-multiple; Ks=16 failed infer-vector-layout on chip) — leading-batch
matmuls only, no dynamic gathers.
"""

import functools

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastforward_tpu.ops.stream_kernel import (
    _dot_bf16x3,
    _split_bf16,
    _split_bf16x3,
)

#: rows per code tile
KERNEL_PQ_TILE_ROWS = 512
#: padded code columns (lane dimension; spare columns never read)
M_PAD = 128


def build_blockdiag_codebooks(
    codebooks: np.ndarray,
) -> "tuple[np.ndarray, np.ndarray, np.ndarray] | None":
    """Block-diagonal hi/mid/lo codebook matrices for the ADC kernel.

    Returns ``(bd_hi, bd_mid, bd_lo)`` of shape ``(G, g*Ks, 128)`` bf16
    with ``hi + mid + lo`` the fp32 codeword values to full fp32
    precision (three 8-bit mantissa chunks cover the 24-bit significand),
    or ``None`` when the geometry doesn't fit the kernel (``Ds`` must
    divide 128 and the group size must divide ``M``).

    Row layout is PERMUTED to match the kernel's ``pltpu.repeat``-built
    one-hot: row ``k*g + j`` holds codeword ``k`` of in-group subspace
    ``j`` (lane block ``j*Ds``).  The kernel tiles the ``(R, g)`` code
    slice ``Ks`` times along lanes — column ``c`` of the tiled matrix is
    code ``c % g`` — so the matching one-hot column order is
    ``(k, j) -> k*g + j``.  (The straight ``j*Ks + k`` order needs a
    ``(R, g, Ks) -> (R, g*Ks)`` trailing reshape, which Mosaic rejects
    on v5e whenever ``Ks`` isn't lane-multiple — hit with Ks=16.)
    """
    m, ks, ds = codebooks.shape
    if ds > 128 or 128 % ds:
        return None
    g = 128 // ds
    if m % g:
        return None
    num_groups = m // g
    bd = np.zeros((num_groups, g * ks, 128), dtype=np.float32)
    for grp in range(num_groups):
        for j in range(g):
            bd[grp, j::g, j * ds : (j + 1) * ds] = codebooks[grp * g + j]
    hi = bd.astype(ml_dtypes.bfloat16)
    r1 = bd - hi.astype(np.float32)
    mid = r1.astype(ml_dtypes.bfloat16)
    lo = (r1 - mid.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, mid, lo


def _adc_kernel(
    tile_idx_ref, codes_ref, bdhi_ref, bdmid_ref, bdlo_ref, qt_ref,
    cand_ref, out_ref, *, num_groups, g, ks, precision
):
    r = codes_ref.shape[1]
    qb = qt_ref.shape[1]

    codes = codes_ref[0].astype(jnp.int32)  # (R, M_pad)
    # codeword index per one-hot lane under the permuted (k*g + j) column
    # order: column c compares code j = c % g against codeword k = c // g
    k_of_lane = jax.lax.broadcasted_iota(jnp.int32, (r, g * ks), 1) // g

    def dot(a, b):
        return jax.lax.dot(a, b, preferred_element_type=jnp.float32)

    # per group (static unroll): one lane slice + pltpu.repeat lane tiling
    # + iota compare builds the (R, g*Ks) one-hot with NO reshape and no
    # transposes (Mosaic rejects the (R, g, Ks)->(R, g*Ks) trailing
    # reshape whenever Ks isn't lane-multiple, and sublane relayouts were
    # the dominant per-tile cost in the transpose-based variant); the
    # dequantize is 1-3 native-bf16 passes over the resident
    # block-diagonal codebooks (permuted row order to match — see
    # build_blockdiag_codebooks), exact for one-hot LHS.
    deq_groups = []
    for grp in range(num_groups):
        cg = codes[:, grp * g : (grp + 1) * g]  # (R, g) static lane slice
        tiled = pltpu.repeat(cg, ks, axis=1)  # (R, g*Ks): col c -> cg[c%g]
        oh = (tiled == k_of_lane).astype(jnp.bfloat16)
        # "exact" arrives as Precision.HIGHEST (see the lax_precision map)
        if precision == jax.lax.Precision.HIGHEST:
            # hi/mid/lo triple pass reconstructs the fp32 codebook to full
            # 24-bit precision (one-hot LHS selects single addends; a
            # two-part split leaves ~1e-5 relative error and is NOT exact)
            deq_groups.append(
                dot(oh, bdhi_ref[grp])
                + dot(oh, bdmid_ref[grp])
                + dot(oh, bdlo_ref[grp])
            )
        else:
            # "high"/"fast": single pass against the bf16-rounded codebook.
            # Centroid rounding (~0.4% relative) is noise next to the PQ
            # quantization error itself and cuts the dominant dequantize
            # FLOPs (measured 1366 -> 2000+ QPS at N=2M Q=512).
            deq_groups.append(dot(oh, bdhi_ref[grp]))
    deq = jnp.concatenate(deq_groups, axis=1)  # (R, dim) fp32

    if precision == "high":
        tile_scores = _dot_bf16x3(deq, qt_ref[...])
    else:
        tile_scores = jax.lax.dot(
            deq,
            qt_ref[...],
            precision=precision,
            preferred_element_type=jnp.float32,
        )  # (R, Qb)

    cand = cand_ref[0]  # (CAP//128, 128) int32 packed local * Qb + qno
    local = cand // qb
    qsel = cand % qb
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, r), 2)

    def select(scores, dot_precision):
        onehot = (local[:, :, None] == row_iota).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            onehot,
            scores,
            dimension_numbers=(((2,), (0,)), ((), ())),
            precision=dot_precision,
            preferred_element_type=jnp.float32,
        )  # (CAP//128, 128, Qb)

    # selection copies single values via bf16 part passes (exact one-hot
    # products): three parts reconstruct the full fp32 score for "exact";
    # the lossy tiers keep two (~16-bit scores, below their own noise)
    if precision == jax.lax.Precision.HIGHEST:
        parts = _split_bf16x3(tile_scores)
    else:
        parts = _split_bf16(tile_scores)
    picked = select(parts[0], jax.lax.Precision.DEFAULT)
    for part in parts[1:]:
        picked = picked + select(part, jax.lax.Precision.DEFAULT)
    q_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, qb), 2)
    q_onehot = (qsel[:, :, None] == q_iota).astype(jnp.float32)
    out_ref[0] = jnp.sum(picked * q_onehot, axis=-1)


def _adc_pairwise_kernel(
    tile_idx_ref, codes_ref, bdhi_ref, bdmid_ref, bdlo_ref, q_ref,
    cand_ref, out_ref, *, num_groups, g, ks, exact
):
    """Candidate-pair ADC: dequantize ONLY the selected slots.

    The classic ``_adc_kernel`` dequantizes every tile row (cost
    ``R x M x Ks x Ds`` MACs per tile regardless of how many candidates
    the tile holds) and scores against all queries.  This body one-hot
    selects the ``CAP`` candidate rows' CODES (integers <= 255 are exact
    in bf16, so an MXU one-hot pass copies them exactly), dequantizes
    just those rows through the same permuted block-diagonal codebooks,
    selects each candidate's query vector, and reduces rowwise — cost
    scales with the slot capacity (cap=256 vs R=512 at the flagship PQ
    shape), and under ``exact`` the result is a TRUE fp32 ADC dot
    (hi/mid/lo codebooks + 3-part query split).

    Reshapes are leading-collapses ``(capr, 128, X) <-> (capr*128, X)``
    only — layout no-ops under the (8, 128) tiling (the last two dims'
    tiling is unchanged); there are NO trailing reshapes, matching the
    Mosaic constraints probed for the classic body.
    """
    qb = q_ref.shape[0]
    codes = codes_ref[0]  # (R, M_PAD) int8/uint8
    r = codes.shape[0]
    cand = cand_ref[0]  # (capr, 128) int32, packed local * Qb + qno
    capr = cand.shape[0]
    cap = capr * 128
    local = cand // qb
    qsel = cand % qb

    row_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, r), 2)
    q_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, qb), 2)
    r_onehot = (local[:, :, None] == row_iota).astype(jnp.bfloat16)
    q_onehot = (qsel[:, :, None] == q_iota).astype(jnp.bfloat16)

    def pick(onehot, mat):  # (capr,128,K) x (K,X) -> (capr,128,X)
        return jax.lax.dot_general(
            onehot,
            mat,
            dimension_numbers=(((2,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    # select the candidate rows' codes — in f32 (Mosaic has no
    # uint8->bf16 cast; DEFAULT-precision truncation to bf16 is exact
    # for one-hots and code values <= 255)
    codes_f = codes.astype(jnp.int32).astype(jnp.float32)
    crow3 = jax.lax.dot_general(
        r_onehot.astype(jnp.float32),
        codes_f,
        dimension_numbers=(((2,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32,
    )  # (capr, 128, M_PAD)
    crow = crow3.reshape(cap, crow3.shape[2]).astype(jnp.int32)

    def dot(a, b):
        return jax.lax.dot(a, b, preferred_element_type=jnp.float32)

    # dequantize the CAP selected rows (2D, same group structure and
    # permuted one-hot construction as the classic body)
    k_of_lane = jax.lax.broadcasted_iota(jnp.int32, (cap, g * ks), 1) // g
    deq_groups = []
    for grp in range(num_groups):
        cg = crow[:, grp * g : (grp + 1) * g]  # (cap, g) static lane slice
        tiled = pltpu.repeat(cg, ks, axis=1)  # (cap, g*Ks)
        oh = (tiled == k_of_lane).astype(jnp.bfloat16)
        if exact:
            deq_groups.append(
                dot(oh, bdhi_ref[grp])
                + dot(oh, bdmid_ref[grp])
                + dot(oh, bdlo_ref[grp])
            )
        else:
            deq_groups.append(dot(oh, bdhi_ref[grp]))
    deq = jnp.concatenate(deq_groups, axis=1)  # (cap, dim) fp32

    # select each candidate's query vector (exact via 3-part split)
    if exact:
        qh, qm, ql = _split_bf16x3(q_ref[...])
        qrows3 = pick(q_onehot, qh) + pick(q_onehot, qm) + pick(q_onehot, ql)
    else:
        qrows3 = pick(q_onehot, q_ref[...].astype(jnp.bfloat16))
    deq3 = deq.reshape(capr, 128, deq.shape[1])
    out_ref[0] = jnp.sum(deq3 * qrows3, axis=-1)


@functools.partial(jax.jit, static_argnames=("m", "r", "interpret", "exact"))
def stream_select_pq_pairwise(
    codes_t: jax.Array,
    bd_hi: jax.Array,
    bd_mid: jax.Array,
    bd_lo: jax.Array,
    qvecs: jax.Array,
    cand3: jax.Array,
    tile_idx: jax.Array,
    m: int,
    r: int = KERNEL_PQ_TILE_ROWS,
    interpret: bool = False,
    exact: bool = True,
) -> jax.Array:
    """Fused pairwise streamed-ADC scoring (see ``_adc_pairwise_kernel``).

    Same contract as :func:`stream_select_pq` except queries arrive
    UN-transposed (``(Qb, dim)`` fp32) and precision is binary:
    ``exact=True`` yields true fp32 ADC dots (covers the classic
    "exact" AND "high" tiers), ``exact=False`` a single bf16 pass per
    stage (the "fast" tier).

    :param codes_t: PQ codes, ``(N_pad, M_PAD)``, ``N_pad % r == 0``.
    :param bd_hi: Block-diagonal codebook hi parts ``(G, g*Ks, 128)``.
    :param bd_mid: Matching mid parts, same shape.
    :param bd_lo: Matching lo parts, same shape.
    :param qvecs: Query vectors ``(Qb, dim)`` fp32 (OPQ-rotated where
        applicable).
    :param cand3: Packed candidates ``(Tv, CAP//128, 128)`` int32.
    :param tile_idx: Base code tile per virtual tile, ``(Tv,)`` int32.
    :param m: Real subspace count (static).
    :param r: Rows per code tile (static).
    :param interpret: Pallas interpreter mode (CPU tests).
    :param exact: True fp32 ADC dots vs single-pass bf16.
    :return: Scores per candidate slot, ``(Tv, CAP//128, 128)`` fp32.
    """
    t_virtual = cand3.shape[0]
    capr = cand3.shape[1]
    num_groups, gks, _ = bd_hi.shape
    g = m // num_groups
    ks = gks // g
    n_pad, m_pad = codes_t.shape
    codes3 = codes_t.reshape(n_pad // r, r, m_pad)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_virtual,),
        in_specs=[
            pl.BlockSpec(
                (1, r, m_pad),
                lambda t, tidx: (tidx[t], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bd_hi
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bd_mid
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bd_lo
            pl.BlockSpec(memory_space=pltpu.VMEM),  # queries, full
            pl.BlockSpec(
                (1, capr, 128),
                lambda t, tidx: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, capr, 128),
            lambda t, tidx: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    cap = capr * 128
    passes = 3 if exact else 1
    return pl.pallas_call(
        functools.partial(
            _adc_pairwise_kernel,
            num_groups=num_groups,
            g=g,
            ks=ks,
            exact=exact,
        ),
        out_shape=jax.ShapeDtypeStruct((t_virtual, capr, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            # code row-select + per-group one-hot dequantize passes +
            # query select passes, all scaling with cap (not R)
            flops=2 * t_virtual * cap * (
                r * m_pad
                + passes * num_groups * gks * 128
                + passes * qvecs.shape[0] * qvecs.shape[1]
            ),
            bytes_accessed=t_virtual * r * m_pad,
            transcendentals=0,
        ),
    )(tile_idx, codes3, bd_hi, bd_mid, bd_lo, qvecs, cand3)


@functools.partial(
    jax.jit, static_argnames=("m", "r", "interpret", "precision")
)
def stream_select_pq(
    codes_t: jax.Array,
    bd_hi: jax.Array,
    bd_mid: jax.Array,
    bd_lo: jax.Array,
    qvecs_t: jax.Array,
    cand3: jax.Array,
    tile_idx: jax.Array,
    m: int,
    r: int = KERNEL_PQ_TILE_ROWS,
    interpret: bool = False,
    precision: str = "exact",
) -> jax.Array:
    """Fused streamed-ADC scoring over PQ codes.

    :param codes_t: PQ codes, ``(N_pad, M_PAD)`` uint8/int8 with
        ``N_pad % r == 0`` (columns beyond ``m`` are never read).
    :param bd_hi: Block-diagonal codebook hi parts, ``(G, g*Ks, 128)``
        bf16 (see :func:`build_blockdiag_codebooks`).
    :param bd_mid: Matching mid parts, same shape.
    :param bd_lo: Matching lo parts, same shape.
    :param qvecs_t: Transposed query vectors ``(dim, Qb)`` fp32 (already
        OPQ-rotated by the caller where applicable).
    :param cand3: Packed candidates ``local * Qb + qno``,
        ``(Tv, CAP//128, 128)`` int32.
    :param tile_idx: Base code tile per virtual tile, ``(Tv,)`` int32.
    :param m: Real subspace count (static).
    :param r: Rows per code tile (static).
    :param interpret: Pallas interpreter mode (CPU tests).
    :param precision: Tier for the scores matmul; the dequantize itself is
        always exact.
    :return: Scores per candidate slot, ``(Tv, CAP//128, 128)`` fp32.
    """
    t_virtual = cand3.shape[0]
    capr = cand3.shape[1]
    num_groups, gks, _ = bd_hi.shape
    g = m // num_groups
    ks = gks // g
    qb = qvecs_t.shape[1]
    n_pad, m_pad = codes_t.shape
    codes3 = codes_t.reshape(n_pad // r, r, m_pad)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_virtual,),
        in_specs=[
            pl.BlockSpec(
                (1, r, m_pad),
                lambda t, tidx: (tidx[t], 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bd_hi, fully resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bd_mid, fully resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bd_lo, fully resident
            pl.BlockSpec(memory_space=pltpu.VMEM),  # q^T, fully resident
            pl.BlockSpec(
                (1, capr, 128),
                lambda t, tidx: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, capr, 128),
            lambda t, tidx: (t, 0, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    lax_precision = {
        "exact": jax.lax.Precision.HIGHEST,
        "high": "high",  # manual bf16x3 (see stream_kernel._dot_bf16x3)
        "fast": jax.lax.Precision.DEFAULT,
    }[precision]
    return pl.pallas_call(
        functools.partial(
            _adc_kernel,
            num_groups=num_groups,
            g=g,
            ks=ks,
            precision=lax_precision,
        ),
        out_shape=jax.ShapeDtypeStruct((t_virtual, capr, 128), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * t_virtual * r * (
                (3 if precision == "exact" else 1) * num_groups * gks * 128
                + m * (128 // g) * qb
            ),
            bytes_accessed=t_virtual * r * m + t_virtual * capr * 128 * 8,
            transcendentals=0,
        ),
    )(tile_idx, codes3, bd_hi, bd_mid, bd_lo, qvecs_t, cand3)


def stream_select_pq_auto(
    codes_t: jax.Array,
    bd_hi: jax.Array,
    bd_mid: jax.Array,
    bd_lo: jax.Array,
    qvecs_t: jax.Array,
    cand3: jax.Array,
    tile_idx: jax.Array,
    m: int,
    r: int = KERNEL_PQ_TILE_ROWS,
    interpret: bool = False,
    precision: str = "exact",
) -> jax.Array:
    """Dispatch to the cheapest ADC kernel body for the requested tier.

    When the slot capacity is at most the tile row count the pairwise
    body wins every tier — its cost scales with ``CAP`` where the
    classic body pays ``R x Ks x Ds`` dequant MACs plus an ``R x Qb``
    scores matmul per tile regardless of occupancy.  On-chip A/B at the
    flagship PQ shape (N=2M, Q=512, 512k pairs, cap 256, R 512;
    ``bench_logs/r4r_pq_pairwise_onchip.log``): pairwise/exact
    120.7 ms vs classic/exact 304.2; pairwise/fast 44.6 vs classic/fast
    88.5 — with identical max error per tier.  "exact" and "high" both
    map to TRUE fp32 ADC dots (strictly better than "high"'s bf16x3
    approximation); "fast" maps to the single-pass bf16 body.  Sparse
    layouts where ``cap > r`` keep the classic matmul-select kernel.
    """
    cap = cand3.shape[1] * 128
    if cap <= r:
        return stream_select_pq_pairwise(
            codes_t, bd_hi, bd_mid, bd_lo, qvecs_t.T, cand3, tile_idx,
            m=m, r=r, interpret=interpret, exact=precision != "fast",
        )
    return stream_select_pq(
        codes_t, bd_hi, bd_mid, bd_lo, qvecs_t, cand3, tile_idx,
        m=m, r=r, interpret=interpret, precision=precision,
    )
