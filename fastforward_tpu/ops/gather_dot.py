"""Fused Pallas gather-dot kernel: the dense re-ranking hot loop.

Computes ``out[p] = table[rows[p]] . qvecs[qno[p]]`` without materializing the
gathered ``(P, dim)`` matrix in HBM (which the XLA take+einsum formulation
does, costing an extra HBM round-trip of the full candidate set).

Layout: Mosaic tiles the last two dims of an HBM array as (8, 128) for fp32,
so single rows of a 2D ``(N, dim)`` table cannot be DMA'd (sublane-misaligned
slice).  The table is therefore stored three-dimensional —
``(N, dim // 128, 128)`` — where the leading dim is untiled and ``.at[row]``
is a legal (dim//128, 128) block copy (verified on v5e; the 1D-flat variant
does not compile).  Rows are streamed HBM -> VMEM with per-row async DMAs,
double-buffered across grid tiles so tile ``t+1``'s transfers overlap tile
``t``'s compute; the dot product itself is a VPU multiply + reduction (the op
runs at ~dim MACs per row read, HBM-bandwidth bound, so the MXU is not the
bottleneck).

Replaces the reference hot loop ``np.sum(q_reps * d_reps, axis=1)``
(reference: ``index/base.py:301-303``).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: rows per grid tile; VMEM use = 2 slots * 2 operands * TILE * dim_padded * 4B
TILE = 256


def _gather_dot_kernel(
    rows_ref,  # (P_pad,) int32, scalar-prefetch (SMEM)
    qno_ref,  # (P_pad,) int32, scalar-prefetch (SMEM)
    table_ref,  # (N, k, 128) in HBM
    qvecs_ref,  # (Q, k, 128) in HBM
    out_ref,  # (1, TILE) VMEM block
    d_scratch,  # (2, TILE, k, 128) VMEM
    q_scratch,  # (2, TILE, k, 128) VMEM
    d_sem,  # (2,) DMA semaphores
    q_sem,  # (2,) DMA semaphores
):
    tile = pl.program_id(0)
    num_tiles = pl.num_programs(0)

    def d_copy(t, i, slot):
        return pltpu.make_async_copy(
            table_ref.at[rows_ref[t * TILE + i]],
            d_scratch.at[slot, i],
            d_sem.at[slot],
        )

    def q_copy(t, i, slot):
        return pltpu.make_async_copy(
            qvecs_ref.at[qno_ref[t * TILE + i]],
            q_scratch.at[slot, i],
            q_sem.at[slot],
        )

    def issue_tile(t, slot):
        def issue(i, _):
            d_copy(t, i, slot).start()
            q_copy(t, i, slot).start()
            return 0

        jax.lax.fori_loop(0, TILE, issue, 0)

    # warm-up: the first invocation issues its own transfers
    @pl.when(tile == 0)
    def _():
        issue_tile(0, 0)

    # pipeline: kick off the next tile's transfers before waiting
    @pl.when(tile + 1 < num_tiles)
    def _():
        issue_tile(tile + 1, (tile + 1) % 2)

    slot = tile % 2

    def wait(i, _):
        d_copy(tile, i, slot).wait()
        q_copy(tile, i, slot).wait()
        return 0

    jax.lax.fori_loop(0, TILE, wait, 0)

    products = q_scratch[slot].astype(jnp.float32) * d_scratch[slot].astype(
        jnp.float32
    )
    out_ref[0, :] = jnp.sum(products, axis=(1, 2))


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_dot(
    table: jax.Array,
    qvecs: jax.Array,
    rows: jax.Array,
    qno: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Fused gather + dot product.

    :param table: Embedding table, shape ``(N, dim // 128, 128)``.
    :param qvecs: Query vectors, shape ``(Q, dim // 128, 128)`` fp32.
    :param rows: Table row per output, shape ``(P,)`` int32, ``P % TILE == 0``.
    :param qno: Query row per output, shape ``(P,)`` int32.
    :param interpret: Run in Pallas interpreter mode (for CPU tests).
    :return: Scores ``table[rows[p]] . qvecs[qno[p]]``, shape ``(P,)`` fp32.
    """
    p = rows.shape[0]
    assert p % TILE == 0, p
    assert table.ndim == 3 and table.shape[2] == 128, table.shape
    num_tiles = p // TILE
    _, k, _ = table.shape
    dim = k * 128

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # table stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # qvecs stay in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, TILE), lambda t, *_: (t, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, TILE, k, 128), table.dtype),
            pltpu.VMEM((2, TILE, k, 128), qvecs.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out = pl.pallas_call(
        _gather_dot_kernel,
        out_shape=jax.ShapeDtypeStruct((num_tiles, TILE), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * p * dim,
            bytes_accessed=2 * p * dim * 4 + p * 4,
            transcendentals=0,
        ),
    )(rows, qno, table, qvecs)
    return out.reshape(p)


def supports(table: jax.Array, rows: jax.Array) -> bool:
    """Whether the fused kernel can handle these operands."""
    return (
        table.ndim == 3
        and table.shape[2] == 128
        and table.dtype == jnp.float32
        and rows.shape[0] % TILE == 0
    )
