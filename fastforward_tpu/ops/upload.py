"""Chunked host->device table upload.

One big ``jnp.asarray``/``device_put`` of a multi-GB table is
pathologically slow over a remote-attached device: measured **6 MB/s** for
a single 2.15 GB transfer vs **60 MB/s** for the same bytes as 8 serial
~270 MB ``device_put`` calls (``bench_logs/r5d_upload_probe.log``; the
tunnel's flow control degrades with message size).  The reference never
uploads anything (pure numpy scoring, ``/root/reference/src/fast_forward/
index/memory.py``) — this cost class is ours alone, so it gets its own op.

Two placement strategies, picked by free-HBM headroom (in-place whenever
headroom is unknown or tight):

- **concat**: serial chunked ``device_put`` + one device-side
  ``jnp.concatenate``.  Fastest, but transiently holds 2x the table
  (chunks + output).
- **donated in-place**: chunks land in a preallocated buffer via a
  donated ``dynamic_update_slice`` — peak HBM is table + one chunk.  Used
  when 2x does not fit (e.g. while preload's zeros-twin is still alive).
  Probed at the same ~59-60 MB/s as concat (``bench_logs/
  r5d_upload_probe2.log``), so choosing it never costs bandwidth.

Both return an UNSYNCED device array (transfers may still be in flight);
callers that must observe completion fetch one element (``preload`` does —
``block_until_ready`` is unreliable over the tunnel).
"""

import logging
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

LOGGER = logging.getLogger(__name__)


@partial(jax.jit, donate_argnums=(0,))
def _place(buf, chunk, start):
    """Donated in-place chunk placement (module-level: one program per
    (buf, chunk) shape pair for the whole process, not per upload)."""
    idx = (start,) + (jnp.int32(0),) * (buf.ndim - 1)
    return jax.lax.dynamic_update_slice(buf, chunk, idx)

#: per-chunk transfer size; the probed sweet spot on the dev tunnel
#: (64/128/256/512 MB -> 27/61/57/57 MB/s, ``bench_logs/
#: r5d_upload_probe2.log``) and small enough that the in-place path's
#: transient overhead (one chunk) is negligible next to the table itself
CHUNK_BYTES = 128 << 20

#: tables at or below this go through one plain device_put (the slow-path
#: pathology only shows at multi-GB sizes; small tables gain nothing)
MIN_CHUNKED_BYTES = 512 << 20


def _free_hbm() -> "int | None":
    try:
        stats = jax.local_devices()[0].memory_stats()
        return int(stats["bytes_limit"]) - int(stats["bytes_in_use"])
    except Exception:  # pragma: no cover - backend-specific
        return None


def upload_plane(
    host_f32: np.ndarray,
    which: str,
    *,
    total_rows: int | None = None,
    chunk_bytes: int = CHUNK_BYTES,
):
    """Ship one 16-bit plane of an fp32 table as a ``uint16`` device array.

    ``which="hi"`` ships bits 31..16 of every element — exactly the
    element's bf16-truncated value — and ``which="lo"`` ships bits 15..0.
    Together the planes are a lossless split of the fp32 table at half
    the per-plane transfer cost; the progressive preload uploads ``hi``
    first (serving starts against :func:`expand_hi`'s truncated-fp32
    table, same aval as the final table so every warmed program applies)
    and folds ``lo`` in later via :func:`combine_lo`.

    Each plane chunk is derived on the host per transfer chunk (a few
    hundred MB of transient, never a full-table uint32 temp) and lands in
    a preallocated device buffer via the donated in-place placement —
    peak HBM is the plane plus one chunk.

    :param host_f32: The fp32 table, C-contiguous ``(rows, ...)``.
    :param which: ``"hi"`` or ``"lo"``.
    :param total_rows: Device-buffer row count (``>= rows``; the extra
        rows stay zero — i.e. fp32 ``0.0`` after recombination).  Lets a
        padded device table be built without a padded HOST copy.
    :param chunk_bytes: Target bytes per transfer chunk (of the PLANE).
    :return: ``uint16`` device array, ``(total_rows, ...)`` (transfers
        may be in flight — fetch an element to observe completion).
    """
    if host_f32.dtype != np.float32:
        raise ValueError(f"plane upload needs float32, got {host_f32.dtype}")
    if which not in ("hi", "lo"):
        raise ValueError(f"which must be 'hi' or 'lo', got {which!r}")
    n = host_f32.shape[0]
    rows = n if total_rows is None else total_rows
    if rows < n:
        raise ValueError(f"total_rows ({rows}) < host rows ({n})")
    row_bytes = max(1, (host_f32.nbytes // 2) // n)
    cs = max(1, chunk_bytes // row_bytes)
    buf = jnp.zeros((rows, *host_f32.shape[1:]), jnp.uint16)
    for b in range(0, n, cs):
        block = host_f32[b : b + cs].view(np.uint32)
        plane = (
            (block >> 16) if which == "hi" else (block & 0xFFFF)
        ).astype(np.uint16)
        buf = _place(buf, jax.device_put(plane), np.int32(b))
    return buf


@jax.jit
def expand_hi(hi):
    """Expand a hi plane (``uint16``) to its truncated-fp32 table.

    The result has the FINAL table's aval (fp32, same shape): programs
    compiled against it serve the exact table after :func:`combine_lo`
    with zero recompiles.  Values equal the fp32 originals with the low
    16 mantissa bits zeroed (bf16-magnitude error, ~0.4% relative)."""
    return jax.lax.bitcast_convert_type(
        hi.astype(jnp.uint32) << 16, jnp.float32
    )


@jax.jit
def combine_lo(trunc, lo):
    """OR the lo plane into a truncated-fp32 table — exact fp32 out.

    ``trunc`` is deliberately NOT donated: during a progressive preload
    it is the LIVE serving table, and in-flight scoring calls hold
    references to it — donation would invalidate those mid-call.  The
    cost is a transient second table in HBM (old + lo + new); callers
    that cannot afford it fall back to a fresh
    :func:`upload_table` of the exact table instead (see
    ``InMemoryIndex._progressive_job``)."""
    u = jax.lax.bitcast_convert_type(trunc, jnp.uint32) | lo.astype(
        jnp.uint32
    )
    return jax.lax.bitcast_convert_type(u, jnp.float32)


def upload_table(host: np.ndarray, *, chunk_bytes: int = CHUNK_BYTES):
    """Ship ``host`` (row-major, any leading-axis-splittable shape) to the
    default device in leading-axis chunks.

    :param host: The host table (numpy, C-contiguous).
    :param chunk_bytes: Target bytes per transfer chunk.
    :return: The device array (transfers possibly still in flight).
    """
    nbytes = host.nbytes
    if nbytes <= MIN_CHUNKED_BYTES:
        return jnp.asarray(host)
    row_bytes = max(1, nbytes // host.shape[0])
    cs = max(1, chunk_bytes // row_bytes)
    n = host.shape[0]
    free = _free_hbm()
    # unknown free HBM (the axon tunnel returns no memory_stats) must pick
    # the SAFE strategy: concat transiently holds 2x the table, which OOMs
    # when the preload zeros-twin is alive (seen as a first-call
    # RESOURCE_EXHAUSTED at N=2M: table + chunks + twin ~= 3x).  In-place
    # costs no bandwidth (59 vs 57 MB/s, bench_logs/r5d_upload_probe2.log)
    in_place = free is None or free < 2 * nbytes + (1 << 30)
    LOGGER.info(
        "chunked table upload: %.2f GB in %d x %d-row chunks (%s placement)",
        nbytes / 1e9,
        -(-n // cs),
        cs,
        "in-place" if in_place else "concat",
    )
    if not in_place:
        chunks = [
            jax.device_put(host[b : b + cs]) for b in range(0, n, cs)
        ]
        return chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks)

    # donated in-place: peak HBM = table + one chunk.  The tail chunk has
    # its own (smaller) static shape — one extra tiny program.
    buf = jnp.zeros(host.shape, host.dtype)
    for b in range(0, n, cs):
        buf = _place(buf, jax.device_put(host[b : b + cs]), np.int32(b))
    return buf
