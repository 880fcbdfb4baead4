"""Multi-host (pod-scale) serving: one index spanning several processes.

The reference is strictly single-process (SURVEY.md §5); TPU pods above a
single host expose their chips through one JAX process *per host*
(multi-controller SPMD).  This module makes the existing sharded scoring
programs (``parallel.sharded``) work unchanged in that world:

- every process runs the same host code over the same ranking (the usual
  JAX multi-controller contract — dispatches must line up);
- the corpus table is laid out with the same ``(data, shard)`` mesh over
  the **global** device set, and ``MeshConfig`` lays the shard axis
  ACROSS processes, so each host's chips own only their slice of the
  rows; each process uploads only those rows (``put_row_sharded`` hands
  XLA per-shard callbacks instead of a full ``device_put``).  Host RAM:
  ``InMemoryIndex`` still holds the full canonical store per host (every
  process ``add``s the same vectors), but ``OnDiskIndex`` dense tables go
  through ``put_row_sharded_lazy`` — per-shard HDF5 reads, so the full
  table never exists in any one host's RAM;
- numpy per-call inputs (query vectors, candidate grids) auto-replicate
  into the jit exactly as on one host;
- partitioned outputs are fetched with ``fetch_np``, which falls back to
  ``multihost_utils.process_allgather`` when the local process cannot
  address every output shard.

Single-process behavior is unchanged: every helper degrades to the plain
``device_put`` / ``device_get`` path (and ``fetch_np`` is the fetch seam
used by the scoring engine everywhere, so the same code serves both).
"""

import logging

import jax
import numpy as np

LOGGER = logging.getLogger(__name__)


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    **kwargs,
) -> None:
    """Join the multi-process JAX runtime (call before any jax op).

    Thin wrapper over :func:`jax.distributed.initialize` so applications
    depend only on this package.  On TPU pods every argument is normally
    inferred from the environment — call it with no arguments there; for
    CPU/GPU fleets pass them explicitly.

    :param coordinator_address: ``host:port`` of process 0.
    :param num_processes: Total number of processes in the job.
    :param process_id: This process's rank in ``[0, num_processes)``.
    :param kwargs: Forwarded to ``jax.distributed.initialize``.
    """
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    LOGGER.info(
        "joined distributed runtime: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        len(jax.local_devices()),
        len(jax.devices()),
    )


def is_multiprocess() -> bool:
    """Whether this JAX runtime spans more than one process."""
    return jax.process_count() > 1


def put_row_sharded(mesh, host_array: np.ndarray, ndim: int | None = None):
    """Place a host array row-sharded over the mesh's ``shard`` axis.

    Single-process: a plain ``device_put`` (identical to the historical
    upload path).  Multi-process: ``jax.make_array_from_callback`` — XLA
    asks each process only for the row slices its local devices own, so no
    process SHIPS rows outside its shards over its host link.  (The caller
    still holds the full ``host_array`` in RAM on every process; only the
    device upload is narrowed.)
    """
    from fastforward_tpu.parallel.sharded import table_sharding

    sharding = table_sharding(mesh, ndim or host_array.ndim)
    if jax.process_count() > 1:
        return jax.make_array_from_callback(
            host_array.shape, sharding, lambda idx: host_array[idx]
        )
    return jax.device_put(host_array, sharding)


def put_row_sharded_lazy(
    mesh,
    shape: tuple,
    dtype,
    read_rows,
    ndim: int | None = None,
):
    """Row-sharded placement fed by a lazy row reader — no full host copy.

    Like :func:`put_row_sharded`, but the table never exists as one host
    array: XLA requests each addressable shard's row range through
    ``read_rows(start, stop) -> (stop-start, ...) numpy``, so a process
    only ever touches (and RAMs) the rows its local devices own.  Pair
    with a ``MeshConfig`` built under multi-process JAX (the ``shard``
    axis then crosses processes) to serve corpora larger than any single
    host's memory from disk.  Repeated requests for the same range (the
    ``data``-replicated devices) are served from a one-slot memo.
    """
    from fastforward_tpu.parallel.sharded import table_sharding

    sharding = table_sharding(mesh, ndim or len(shape))
    memo: dict = {}

    def callback(idx):
        rows = idx[0]
        start = rows.start or 0
        stop = rows.stop if rows.stop is not None else shape[0]
        key = (start, stop)
        block = memo.get(key)
        if block is None:
            memo.clear()  # one-slot: ranges arrive grouped per shard
            block = np.ascontiguousarray(read_rows(start, stop))
            memo[key] = block
        rest = tuple(idx[1:])
        return block[(slice(None),) + rest] if rest else block

    return jax.make_array_from_callback(
        tuple(shape), sharding, callback
    )


def put_replicated(mesh, host_array: np.ndarray):
    """Place a host array replicated onto every device of the mesh."""
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    sharding = NamedSharding(mesh, P())
    if jax.process_count() > 1:
        return jax.make_array_from_callback(
            host_array.shape, sharding, lambda idx: host_array[idx]
        )
    return jax.device_put(host_array, sharding)


def fetch_np(arr) -> np.ndarray:
    """Fetch a device array to host numpy, multi-host safe.

    Fully-addressable arrays (everything single-process, and replicated /
    process-local outputs) fetch directly; outputs partitioned across
    processes are assembled with an ``process_allgather`` over the
    interconnect first (every process receives the full array).
    """
    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(jax.device_get(arr))
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))
