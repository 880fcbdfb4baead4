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
