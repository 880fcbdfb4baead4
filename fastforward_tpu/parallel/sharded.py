"""SPMD sharded scoring: corpus table split over chips, combined over ICI.

The reference has no distributed code at all (SURVEY.md §2/§5); this is the
new-design component required by the north star: MS MARCO v2-scale tables
that exceed one chip's HBM are sharded row-wise over the ``shard`` mesh axis,
query pair-arrays are data-parallel over the ``data`` axis, and the program
is one ``shard_map``:

1. every chip gathers the candidate rows it *owns* (ownership = row-range
   test, out-of-range gathers masked to zero),
2. a ``psum`` over ``shard`` (ICI all-reduce of the per-row score vector —
   a few hundred KB, not the vectors themselves) assembles full row scores,
3. each data-shard segment-reduces its slice of pairs locally, and a final
   ``pmax``/``psum`` over ``data`` combines the per-pair partials.

Only scores ever cross ICI; candidate *vectors* stay chip-local.
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

_NEG_INF = jnp.float32(-jnp.inf)


def table_sharding(mesh: Mesh, ndim: int = 3) -> NamedSharding:
    """Row-sharded placement for the embedding table."""
    return NamedSharding(mesh, P("shard", *([None] * (ndim - 1))))


def _local_row_scores(table_local, qvecs, rows, qno):
    """Scores for rows owned by this shard (zeros elsewhere)."""
    shard = jax.lax.axis_index("shard")
    n_local = table_local.shape[0]
    local = rows - shard * n_local
    owned = (local >= 0) & (local < n_local)
    safe = jnp.where(owned, local, 0)
    d = jnp.take(table_local, safe, axis=0).astype(jnp.float32)
    if table_local.ndim == 3:
        q = jnp.take(
            qvecs.reshape(qvecs.shape[0], table_local.shape[1], 128), qno, axis=0
        )
        scores = jnp.einsum("pkl,pkl->p", q, d, preferred_element_type=jnp.float32)
    else:
        q = jnp.take(qvecs, qno, axis=0)
        scores = jnp.einsum("pd,pd->p", q, d, preferred_element_type=jnp.float32)
    return scores * owned.astype(jnp.float32)


def _sharded_score_fn(mesh: Mesh, num_out: int, op: str):
    """Build the shard_map scoring program for one (num_out, op) bucket."""

    def body(table_local, qvecs, rows, qno, seg):
        # (1) chip-local gather + dot, (2) assemble over ICI
        scores = jax.lax.psum(
            _local_row_scores(table_local, qvecs, rows, qno), "shard"
        )

        # (3) per-pair partials over this data-shard's slice of pairs
        n = num_out + 1  # sentinel slot for padding rows
        if op == "max":
            partial_out = jax.ops.segment_max(scores, seg, num_segments=n)
            out = jax.lax.pmax(partial_out, "data")
        elif op == "mean":
            sums = jax.lax.psum(
                jax.ops.segment_sum(scores, seg, num_segments=n), "data"
            )
            counts = jax.lax.psum(
                jax.ops.segment_sum(jnp.ones_like(scores), seg, num_segments=n),
                "data",
            )
            out = sums / jnp.maximum(counts, 1.0)
        else:  # "sum"
            out = jax.lax.psum(
                jax.ops.segment_sum(scores, seg, num_segments=n), "data"
            )
        return out[:num_out]

    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            P("shard", *([None] * 2)),  # table (rows sharded)
            P(),  # qvecs replicated
            P("data"),  # pair arrays split over data
            P("data"),
            P("data"),
        ),
        out_specs=P(),  # full result on every chip
        check_vma=False,
    )
    return jax.jit(mapped)


@lru_cache(maxsize=64)
def _cached_scorer(mesh: Mesh, num_out: int, op: str):
    return _sharded_score_fn(mesh, num_out, op)


def score_pairs_sharded(
    mesh: Mesh,
    table: jax.Array,
    qvecs: jax.Array,
    rows: jax.Array,
    qno: jax.Array,
    seg: jax.Array,
    num_out: int,
    op: str,
) -> jax.Array:
    """Sharded equivalent of ``ops.score_pairs_dense``.

    :param mesh: Mesh with ``data`` and ``shard`` axes.
    :param table: Row-sharded 3D table ``(N_pad, dim//128, 128)``
        (``N_pad`` divisible by the ``shard`` axis size).
    :param qvecs: Replicated query vectors ``(Qb, dim)``.
    :param rows: Table row per candidate, ``(Pb,)`` (divisible by ``data``).
    :param qno: Query row per candidate, ``(Pb,)``.
    :param seg: Output pair per candidate (sentinel = ``num_out``), ``(Pb,)``.
    :param num_out: Number of output pairs (static).
    :param op: ``"max"`` | ``"mean"`` | ``"sum"``.
    :return: Per-pair scores, ``(num_out,)``.
    """
    return _cached_scorer(mesh, num_out, op)(table, qvecs, rows, qno, seg)
