"""HBM-resident index: host-canonical store + device scoring table.

The TPU-native counterpart of the reference's chunked in-memory index
(reference: ``index/memory.py:20-180``).  The canonical copy is one growable
host array (amortized growth, input dtype preserved — deliberately avoiding
the reference's float64 overflow-chunk bug, ``memory.py:106``); the scoring
copy is a padded device table uploaded lazily and invalidated on ``add``.
Quantized indexes keep raw codes on device and decode inside the scoring
program.
"""

import logging
import threading
from collections.abc import Iterable, Iterator
from functools import partial
from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp
import numpy as np

if TYPE_CHECKING:
    from fastforward_tpu.parallel.mesh import MeshConfig

from fastforward_tpu.encoder.base import Encoder
from fastforward_tpu.index.base import DeviceView, IDSequence, Index
from fastforward_tpu.index.mode import Mode
from fastforward_tpu.ops.upload import upload_table
from fastforward_tpu.quantizer import Quantizer
from fastforward_tpu.quantizer.pq import PQ
from fastforward_tpu.quantizer.scalar import ScalarQuantizer

LOGGER = logging.getLogger(__name__)

# device tables are padded to a multiple of this many rows so the scoring
# program recompiles only on growth, not on every add
_ROW_PAD = 4096

# tables at or below this skip the progressive (split-plane) preload: the
# split only pays when the upload dominates the cold start
_MIN_PROGRESSIVE_BYTES = 512 << 20


class _ProgressiveUpload:
    """One split-plane progressive upload of a dense fp32 host-store table.

    Driven by :meth:`fastforward_tpu.index.base.Index.preload` with
    ``progressive=True``: :meth:`upload_hi` runs in preload's upload
    thread (it ships the table's high 16-bit planes — half the bytes of
    the full table); :meth:`activate` runs once the warm twin is dropped
    — it expands the hi plane on device into a truncated-fp32 table with
    the FINAL table's aval (every warmed program is a cache hit) and
    installs it as the serving view, then folds the low planes in on a
    background daemon thread for exact fp32.

    Swap safety: the serving table is never donated — in-flight scoring
    calls hold references to the old array, which stays valid until they
    finish; each swap is one GIL-atomic attribute assignment, and a
    generation check skips the swap when :meth:`InMemoryIndex.add` raced
    the upload (the lazy path then rebuilds from scratch).
    """

    def __init__(self, index: "InMemoryIndex") -> None:
        self._index = index
        self._gen = index._table_gen
        self._host = index._store[: index._num]  # no padded host copy
        self._n_pad = -(-index._num // _ROW_PAD) * _ROW_PAD
        self._hi = None
        self._trunc = None

    def upload_hi(self) -> None:
        """Ship the hi planes (half the table's bytes) and sync."""
        from fastforward_tpu.ops.upload import upload_plane

        hi = upload_plane(self._host, "hi", total_rows=self._n_pad)
        np.asarray(hi[0, :1])  # observe transfer completion
        self._hi = hi

    def activate(self) -> None:
        """Install the truncated-fp32 serving view; start the exact tail.

        Must run after the warm's zeros-twin is dropped: the expansion
        transiently holds plane + table (1.5x the table) in HBM.
        """
        from fastforward_tpu.ops.upload import expand_hi

        index = self._index
        if self._hi is None:  # upload_hi failed; lazy path will rebuild
            return
        trunc = expand_hi(self._hi)
        np.asarray(trunc[0, :1])
        self._hi = None  # free the plane (trunc contains it)
        self._trunc = trunc
        if index._table_gen != self._gen:
            LOGGER.warning(
                "progressive preload overlapped an add(); discarding"
            )
            return
        index._dev_view = DeviceView(
            kind="dense", table=trunc, precision=index._precision
        )
        thread = threading.Thread(
            target=self._exact_tail, name="ff-progressive-lo", daemon=True
        )
        index._progressive_thread = thread
        thread.start()

    def _exact_tail(self) -> None:
        """Fold the lo planes in; swap the exact table into the view.

        Primary path: lo-plane upload (half the table's bytes) + a
        non-donating device combine — transiently old table + plane +
        new table in HBM.  On RESOURCE_EXHAUSTED it falls back to a
        fresh chunked upload of the exact fp32 table (old + new tables
        only, the same peak the standard preload already proved out).
        """
        from fastforward_tpu.ops.upload import (
            combine_lo,
            upload_plane,
            upload_table,
        )

        index = self._index
        trunc, self._trunc = self._trunc, None
        try:
            lo = None
            try:
                lo = upload_plane(self._host, "lo", total_rows=self._n_pad)
                full = combine_lo(trunc, lo)
                np.asarray(full[0, :1])
            except Exception:
                lo = None  # free the plane before the fallback upload
                LOGGER.warning(
                    "split-plane exact tail failed (likely HBM headroom "
                    "for the transient second table); re-uploading the "
                    "exact fp32 table instead",
                    exc_info=True,
                )
                # the serving view still holds the interim table: the
                # fallback peak is old + new table (the same budget the
                # standard twin-overlap preload already fits)
                del trunc
                table = np.zeros(
                    (self._n_pad, self._host.shape[1]), np.float32
                )
                table[: self._host.shape[0]] = self._host
                full = upload_table(table)
                np.asarray(full[0, :1])
            if index._table_gen != self._gen:
                LOGGER.warning(
                    "progressive exact tail overlapped an add(); discarding"
                )
                return
            index._dev_view = DeviceView(
                kind="dense", table=full, precision=index._precision
            )
            stats = getattr(index, "_preload_stats", None)
            if stats is not None:
                stats["progressive_exact"] = True
            LOGGER.info("progressive preload: exact fp32 table installed")
        finally:
            self._host = None


def _dev_place(dst, src, start):
    """Write ``src`` into ``dst`` at row ``start`` IN PLACE (dst donated).

    The donated in-place update is what makes the device-resident store
    O(batch) in host memory: each ``add`` ships only its own rows to HBM and
    the buffer is never mirrored on the host.
    """
    import jax

    idx = (start,) + (np.int32(0),) * (dst.ndim - 1)
    return _dev_place_jit(dst, src, *idx)


@partial(jax.jit, donate_argnums=(0,))
def _dev_place_jit(dst, src, *idx):
    return jax.lax.dynamic_update_slice(dst, src, idx)


class InMemoryIndex(Index):
    """Fast-Forward index held in memory (host canonical, HBM for scoring)."""

    def __init__(
        self,
        query_encoder: Encoder | None = None,
        quantizer: Quantizer | None = None,
        mode: Mode = Mode.MAXP,
        encoder_batch_size: int = 32,
        init_size: int = 2**16,
        alloc_size: int = 2**16,
        device_dtype: str = "float32",
        mesh_config: "MeshConfig | None" = None,
        precision: str = "exact",
        store: str = "host",
        hbm_budget: int | None = None,
        stream_chunk_rows: int | None = None,
        score_transport: str = "f32",
    ) -> None:
        """Create an in-memory index.

        :param query_encoder: The query encoder to use.
        :param quantizer: The quantizer to use.
        :param mode: The ranking mode.
        :param encoder_batch_size: Batch size for the query encoder.
        :param init_size: Initially allocated capacity (number of vectors).
        :param alloc_size: Capacity growth granularity (number of vectors).
        :param device_dtype: Dtype of the device scoring table
            (``"float32"`` or ``"bfloat16"``; ignored for quantized indexes).
        :param mesh_config: When set, shard the table row-wise across a
            device mesh and score with the SPMD program (dense,
            scalar-quantized, or PQ/OPQ code tables; PQ codebooks are
            replicated onto every chip).
        :param precision: Scoring matmul precision: ``"exact"`` (fp32,
            reference score parity), ``"high"`` (3-pass bf16, ~1e-6
            relative error, ~2x faster), or ``"fast"`` (bf16 MXU inputs,
            ~6x matmul throughput, ~0.5% score error).
        :param store: ``"host"`` keeps the canonical copy in host RAM and
            mirrors it into HBM for scoring (2x total footprint — the
            reference keeps host only).  ``"device"`` appends each ``add``
            batch straight into a growable HBM buffer (donated in-place
            updates), so host memory stays at O(batch): index memory parity
            with the reference, in HBM instead of RAM.  Host-side reads
            (``_get_vectors``, iteration) fetch rows back from the device.
            Pre-size with ``init_size`` to avoid regrowth copies.

            .. warning:: With ``store="device"`` the HBM buffer *is* the
               canonical copy, so ``device_dtype="bfloat16"`` makes the
               stored vectors themselves lossy: ``_get_vectors``,
               ``batch_iter``, re-indexing, and quantizer fits all see
               bf16-rounded values (a warning is logged).  Under
               ``store="host"`` the fp32 canonical is preserved and only
               the HBM scoring mirror is bf16.
        :param hbm_budget: Scoring-HBM budget in bytes for host-store
            tables — dense fp32/bf16, int8-quantized, or PQ code tables.
            When the table exceeds it, the index serves from the
            **beyond-HBM hybrid tier**: ~70% of the budget holds an
            HBM-resident table prefix and the rest caches streamed
            candidate blocks of the host-RAM tail (``ops.host_stream``;
            int8 blocks stream at 1/4 and PQ codes at ~1/32 of the dense
            fp32 traffic).  ``None`` (default): upload the full table
            (must fit HBM).
        :param stream_chunk_rows: Rows per streamed tail block for the
            hybrid tier (default ``ops.host_stream.HOST_CHUNK_ROWS``).
        :param score_transport: ``"f32"`` (exact scores) or ``"u16"``
            (compact device->host score copy — halves the dominant
            warm-call transfer on remote-attached serving hosts; adds at
            most ``score_range / 131070`` absolute score error per call).
        """
        if store not in ("host", "device"):
            raise ValueError(f"store must be 'host' or 'device', got {store!r}")
        if store == "device" and mesh_config is not None:
            # device-append composes with sharding: the growable buffer is
            # allocated row-sharded and every donated update runs SPMD, so
            # a mesh-sharded corpus builds without a host mirror
            if jax.process_count() > 1:
                raise ValueError(
                    "store='device' is not supported under multi-process "
                    "(multi-host) JAX: the growable donated-append buffer "
                    "is process-local.  Use store='host' — the table is "
                    "laid out per host at view build."
                )
            mesh_config.build()  # validate the topology early
        if store == "device" and device_dtype == "bfloat16":
            LOGGER.warning(
                "store='device' with device_dtype='bfloat16' stores the "
                "CANONICAL vectors in bf16: reads, iteration, re-indexing, "
                "and quantizer fits see permanently rounded values (use "
                "store='host' to keep an fp32 canonical copy)"
            )
        if hbm_budget is not None and store == "device":
            raise ValueError(
                "hbm_budget requires store='host' (the hybrid tier streams "
                "from the host canonical copy)"
            )
        if (
            hbm_budget is not None
            and mesh_config is not None
            and jax.process_count() > 1
        ):
            raise ValueError(
                "hbm_budget + mesh_config (the sharded hybrid tier) is "
                "single-process BY DESIGN: the beyond-HBM tail streams "
                "host->device per scoring call, and under multi-controller "
                "SPMD every process would have to stream the identical "
                "tail rows in lockstep — multiplying host-link traffic by "
                "the process count for zero extra throughput (the tail is "
                "the bottleneck already).  Pods have two supported "
                "layouts that both scale N with the number of hosts: "
                "(1) quantize (int8 cuts HBM 4x, PQ ~48x) so the table is "
                "resident across the pod's chips — then narrow_to_shard() "
                "frees per-host RAM; (2) OnDiskIndex with mesh_config "
                "(per-shard lazy HDF5 reads; arbitrary N, reference-"
                "equivalent, index/disk.py)."
            )
        self._hbm_budget = hbm_budget
        self._stream_chunk_rows = stream_chunk_rows
        self._store_mode = store
        self._dev_table = None  # growable device buffer (store='device')
        self._dev_width = None
        self._store: np.ndarray | None = None
        self._num = 0
        self._init_size = init_size
        self._alloc_size = alloc_size
        self._device_dtype = device_dtype
        self._precision = precision
        self._mesh_config = mesh_config
        self._mesh = None
        self._dev_view: DeviceView | None = None
        # canonical row band retained after narrow_to_shard (None = full)
        self._narrow: "tuple[int, int] | None" = None
        # bumped on every add(): in-flight progressive uploads check it
        # before swapping their table into the serving view
        self._table_gen = 0
        super().__init__(
            query_encoder=query_encoder,
            quantizer=quantizer,
            mode=mode,
            encoder_batch_size=encoder_batch_size,
            score_transport=score_transport,
        )

    # -- storage -------------------------------------------------------------

    def _get_num_vectors(self) -> int:
        return self._num

    def _get_internal_dim(self) -> int | None:
        if self._store_mode == "device":
            return self._dev_width if self._dev_table is not None else None
        if self._store is None:
            return None
        return self._store.shape[1]

    def _grow_to(self, capacity: int, dim: int, dtype: np.dtype) -> None:
        """Ensure the host store has room for ``capacity`` vectors."""
        if self._store is None:
            cap = max(self._init_size, capacity)
            self._store = np.zeros((cap, dim), dtype=dtype)
            return
        cur = self._store.shape[0]
        if capacity <= cur:
            return
        extra = -(-(capacity - cur) // self._alloc_size) * self._alloc_size
        LOGGER.debug("growing host store from %s to %s rows", cur, cur + extra)
        grown = np.zeros((cur + extra, self._store.shape[1]), self._store.dtype)
        grown[: self._num] = self._store[: self._num]
        self._store = grown

    def _add(
        self, vectors: np.ndarray, doc_ids: IDSequence, psg_ids: IDSequence
    ) -> None:
        num_new = vectors.shape[0]
        start = self._num
        if self._narrow is not None:
            raise RuntimeError(
                "cannot add to a narrowed index: shard row boundaries "
                "move with N (narrow_to_shard is a post-build step)"
            )
        self._ids.add(doc_ids, psg_ids, start)
        if self._store_mode == "device":
            self._append_device(vectors, start)
        else:
            self._grow_to(start + num_new, vectors.shape[1], vectors.dtype)
            self._store[start : start + num_new] = vectors
        self._num += num_new
        self._dev_view = None  # device table is stale
        self._table_gen += 1  # and so is any in-flight progressive upload

    def consolidate(self) -> None:
        """Trim the host store to exactly the used capacity.

        No-op for ``store="device"`` (the HBM buffer stays padded to the
        scoring row granularity) and after :meth:`narrow_to_shard` (the
        store is already the shard-local band).
        """
        if self._store is not None and self._narrow is None:
            self._store = self._store[: self._num].copy()

    def narrow_to_shard(self) -> tuple[int, int]:
        """Free canonical rows outside this process's device shards.

        Under multi-process meshes every process ``add``s the full corpus
        (the SPMD contract), so each host transiently holds the whole
        canonical table even though its chips score only their row slice.
        Once the sharded device view is built (``preload()``), call this to
        drop the out-of-shard rows: per-host RSS falls to roughly
        ``1 / shard_groups`` of the table, matching what ``OnDiskIndex``
        achieves with lazy per-shard HDF5 reads (the reference serves
        arbitrary N from disk in every configuration,
        ``/root/reference/src/fast_forward/index/disk.py:309-336``; the
        resident path gets there by narrowing after upload instead).

        Afterwards host-side row reads (:meth:`_get_vectors`, iteration)
        serve only shard-local rows and raise for others; device scoring —
        the production path — is unaffected.  ``add`` raises after
        narrowing (shard boundaries would move with N).

        :raises ValueError: Without a mesh-sharded resident device view,
            or on the hybrid tier (it streams from the full canonical
            copy).
        :return: The retained canonical row range ``(start, stop)``.
        """
        if self._store_mode != "host" or self._store is None:
            raise ValueError(
                "narrow_to_shard requires store='host' with vectors added"
            )
        view = self._device_view()
        if view is None or view.mesh is None or view.kind == "hybrid":
            raise ValueError(
                "narrow_to_shard requires a mesh-sharded resident device "
                "view (configure mesh_config and call preload() first); "
                "the hybrid beyond-HBM tier streams from the full "
                "canonical copy and cannot narrow"
            )
        if self._narrow is not None:
            return self._narrow
        n_pad = view.table.shape[0]
        spans = sorted(
            (
                s.index[0].start or 0,
                n_pad if s.index[0].stop is None else s.index[0].stop,
            )
            for s in view.table.addressable_shards
        )
        cover = spans[0]
        for s0, s1 in spans[1:]:
            if s0 > cover[1]:  # pragma: no cover - defensive (exotic mesh)
                raise ValueError(
                    "this process's shards are not one contiguous row "
                    "band; cannot narrow"
                )
            cover = (cover[0], max(cover[1], s1))
        start, stop = min(cover[0], self._num), min(cover[1], self._num)
        before = self._store.nbytes
        self._store = np.ascontiguousarray(self._store[start:stop])
        self._narrow = (start, stop)
        LOGGER.info(
            "narrowed canonical store to rows [%d, %d): %.1f -> %.1f MiB",
            start,
            stop,
            before / 2**20,
            self._store.nbytes / 2**20,
        )
        return self._narrow

    # -- device-resident store (store="device") --------------------------------

    def _device_layout(self, width: int) -> tuple[tuple[int, ...], "jnp.dtype"]:
        """Per-row device shape and dtype for the growable HBM buffer."""
        if isinstance(self._quantizer, PQ):
            return (width,), jnp.uint8
        if isinstance(self._quantizer, ScalarQuantizer):
            dtype = jnp.int8
        elif self._quantizer is not None:
            raise ValueError(
                "store='device' supports dense, PQ, and scalar-quantized "
                "tables (unknown quantizers decode on the host)"
            )
        else:
            # dense buffers stay 2D (N, dim): no sublane padding (the 3D
            # form wastes 33% HBM at dim=768, see _device_view)
            return (width,), (
                jnp.bfloat16
                if self._device_dtype == "bfloat16"
                else jnp.float32
            )
        if width % 128 == 0:
            return (width // 128, 128), dtype
        return (width,), dtype

    def _append_device(self, data: np.ndarray, start: int) -> None:
        """Append rows straight into the growable HBM buffer.

        Host memory stays O(batch): the chunk is shipped once and written
        with a donated in-place ``dynamic_update_slice``; nothing is
        mirrored on the host.  Growth reallocates on device (transiently
        2x HBM) — pre-size with ``init_size`` to avoid it.
        """
        n_new, width = data.shape
        rowshape, dtype = self._device_layout(width)
        if (
            self._mesh_config is not None
            and width % 128 != 0
            and not isinstance(self._quantizer, PQ)
        ):
            raise ValueError(
                "Sharded device stores require dim % 128 == 0 "
                f"(got {width}); pad the embeddings."
            )
        self._dev_width = width

        cap_needed = start + n_new
        if self._dev_table is None:
            cap = max(self._init_size, cap_needed)
            cap = -(-cap // _ROW_PAD) * _ROW_PAD
            self._dev_table = self._alloc_device(cap, rowshape, dtype)
        elif cap_needed > self._dev_table.shape[0]:
            cur = self._dev_table.shape[0]
            extra = -(-(cap_needed - cur) // self._alloc_size) * self._alloc_size
            cap = -(-(cur + extra) // _ROW_PAD) * _ROW_PAD
            LOGGER.debug("growing device store from %s to %s rows", cur, cap)
            self._dev_table = _dev_place(
                self._alloc_device(cap, rowshape, dtype),
                self._dev_table,
                np.int32(0),
            )

        chunk = jnp.asarray(data.reshape(n_new, *rowshape)).astype(dtype)
        self._dev_table = _dev_place(self._dev_table, chunk, np.int32(start))

    def _alloc_device(self, cap: int, rowshape: tuple, dtype) -> "jnp.ndarray":
        """Allocate the growable device buffer — row-sharded over the mesh
        when one is configured (the donated updates then run SPMD and the
        sharded corpus builds without a host mirror)."""
        if self._mesh_config is None:
            return jnp.zeros((cap, *rowshape), dtype)
        from fastforward_tpu.parallel.sharded import table_sharding

        if self._mesh is None:
            self._mesh = self._mesh_config.build()
        sharding = table_sharding(self._mesh, ndim=1 + len(rowshape))
        return jax.jit(
            lambda: jnp.zeros((cap, *rowshape), dtype),
            out_shardings=sharding,
        )()

    def _fetch_device_rows(self, rows: np.ndarray) -> np.ndarray:
        """Gather rows of the device store back to the host, ``(n, width)``."""
        import jax

        sub = jnp.take(
            self._dev_table, jnp.asarray(rows.astype(np.int32)), axis=0
        )
        if sub.dtype == jnp.bfloat16:
            sub = sub.astype(jnp.float32)
        return np.asarray(jax.device_get(sub)).reshape(rows.shape[0], -1)

    # -- host retrieval ------------------------------------------------------

    def _get_vectors(self, ids: Iterable[str]) -> tuple[np.ndarray, list[str]]:
        ids = list(ids)
        rows, counts = self._ids.resolve(ids, self.mode)
        if rows.shape[0] == 0:
            return np.array([]), []
        out_ids = [i for i, c in zip(ids, counts) for _ in range(c)]
        if self._store_mode == "device":
            return self._fetch_device_rows(rows), out_ids
        if self._narrow is not None:
            start, stop = self._narrow
            if rows.size and (rows.min() < start or rows.max() >= stop):
                raise IndexError(
                    "host row read outside this process's shard band "
                    f"[{start}, {stop}) — the canonical store was narrowed "
                    "by narrow_to_shard(); only device scoring covers the "
                    "full corpus"
                )
            return self._store[rows - start], out_ids
        return self._store[rows], out_ids

    def _batch_iter(
        self, batch_size: int
    ) -> Iterator[tuple[np.ndarray, IDSequence, IDSequence]]:
        if self._narrow is not None:
            raise RuntimeError(
                "cannot iterate a narrowed index: the canonical store "
                "holds only this process's shard band (narrow_to_shard)"
            )
        doc_list, psg_list = self._ids.inverse(self._num)
        for i in range(0, self._num, batch_size):
            j = min(i + batch_size, self._num)
            if self._store_mode == "device":
                batch = self._fetch_device_rows(np.arange(i, j))
            else:
                batch = self._store[i:j]
            yield (batch, doc_list[i:j], psg_list[i:j])

    # -- device table --------------------------------------------------------

    def _hybrid_view(
        self,
        data: np.ndarray,
        dim: int,
        kind: str = "dense",
        codebooks: np.ndarray | None = None,
        scales: np.ndarray | None = None,
    ) -> DeviceView | None:
        """Beyond-HBM tier view, or ``None`` when the table fits the budget
        (see :func:`fastforward_tpu.index.base.build_hybrid_view`).  With a
        mesh configured the budget is per chip and the resident prefix is
        row-sharded (sharded hybrid tier)."""
        from fastforward_tpu.index.base import build_hybrid_view

        if self._mesh_config is not None and self._mesh is None:
            self._mesh = self._mesh_config.build()
        return build_hybrid_view(
            data,
            self._num,
            dim,
            self._hbm_budget,
            self._precision,
            chunk_rows=self._stream_chunk_rows,
            bf16=kind == "dense" and self._device_dtype == "bfloat16",
            kind=kind,
            codebooks=codebooks,
            scales=scales,
            mesh=self._mesh,
        )

    def _progressive_job(self) -> "_ProgressiveUpload | None":
        """Split-plane progressive upload job, when the configuration
        supports one (see :class:`_ProgressiveUpload`).

        Eligible: dense fp32 host-store tables on a single device, big
        enough (> ``_MIN_PROGRESSIVE_BYTES``) that the upload dominates
        the cold start.  Everything else returns ``None`` and
        ``preload(progressive=True)`` falls back to the standard upload.
        """
        if (
            self._num == 0
            or self._dev_view is not None
            or self._store_mode != "host"
            or self._mesh_config is not None
            or self._hbm_budget is not None
            or self._quantizer is not None
            or self._device_dtype != "float32"
            or self._store.dtype != np.float32
            or self._store[: self._num].nbytes <= _MIN_PROGRESSIVE_BYTES
        ):
            return None
        return _ProgressiveUpload(self)

    def _twin_view(self) -> DeviceView | None:
        """Zeros-shaped twin of the pending device view (no upload).

        Mirrors ``_device_view``'s shape/dtype decisions for the
        single-device resident kinds (dense fp32/bf16, int8 codes, PQ
        codes); ``tests/test_preload_overlap.py`` asserts twin and real
        views agree on kind/shape/dtype for every covered configuration.
        Mesh, hybrid (``hbm_budget``), device-store, and unknown-quantizer
        configurations return ``None`` (preload falls back to sequential
        upload-then-warm).
        """
        if (
            self._num == 0
            or self._dev_view is not None
            or self._store_mode == "device"
            or self._mesh_config is not None
            or self._hbm_budget is not None
        ):
            return None
        n_pad = -(-self._num // _ROW_PAD) * _ROW_PAD
        if isinstance(self._quantizer, PQ):
            from fastforward_tpu.ops.scoring import pallas_stream_enabled

            m = self._store.shape[1]
            width = 128 if m <= 128 and pallas_stream_enabled() else m
            return DeviceView(
                kind="pq",
                table=jnp.zeros((n_pad, width), self._store.dtype),
                codebooks=jnp.asarray(
                    np.asarray(self._quantizer.codewords, dtype=np.float32)
                ),
                precision=self._precision,
            )
        if isinstance(self._quantizer, ScalarQuantizer):
            dim = self._store.shape[1]
            shape = (
                (n_pad, dim // 128, 128) if dim % 128 == 0 else (n_pad, dim)
            )
            return DeviceView(
                kind="scalar",
                table=jnp.zeros(shape, jnp.int8),
                scales=self._quantizer.scales,
                precision=self._precision,
            )
        if self._quantizer is not None:
            return None
        dim = self._store.shape[1]
        dtype = (
            jnp.bfloat16 if self._device_dtype == "bfloat16" else jnp.float32
        )
        return DeviceView(
            kind="dense",
            table=jnp.zeros((n_pad, dim), dtype),
            precision=self._precision,
        )

    def _device_view(self) -> DeviceView | None:
        if self._num == 0:
            return None
        if self._dev_view is not None:
            return self._dev_view

        if self._store_mode == "device":
            # the growable HBM buffer IS the scoring table (zero-padded);
            # with a mesh it was allocated row-sharded (see _alloc_device)
            if isinstance(self._quantizer, PQ):
                codebooks = np.asarray(
                    self._quantizer.codewords, dtype=np.float32
                )
                if self._mesh is not None:
                    from fastforward_tpu.parallel.multihost import (
                        put_replicated,
                    )

                    cb_dev = put_replicated(self._mesh, codebooks)
                else:
                    cb_dev = jnp.asarray(codebooks)
                self._dev_view = DeviceView(
                    kind="pq",
                    table=self._dev_table,
                    codebooks=cb_dev,
                    mesh=self._mesh,
                    precision=self._precision,
                )
            elif isinstance(self._quantizer, ScalarQuantizer):
                self._dev_view = DeviceView(
                    kind="scalar",
                    table=self._dev_table,
                    scales=self._quantizer.scales,
                    mesh=self._mesh,
                    precision=self._precision,
                )
            else:
                self._dev_view = DeviceView(
                    kind="dense",
                    table=self._dev_table,
                    mesh=self._mesh,
                    precision=self._precision,
                )
            return self._dev_view

        n_pad = -(-self._num // _ROW_PAD) * _ROW_PAD
        data = self._store[: self._num]

        if isinstance(self._quantizer, PQ):
            from fastforward_tpu.ops.scoring import pallas_stream_enabled

            if self._hbm_budget is not None:
                # beyond-HBM tier for PQ code tables (MS MARCO v2-scale
                # corpora exceed one chip's HBM even quantized); with a
                # mesh the code prefix row-shards and only corpora beyond
                # the whole mesh's budget stream a host tail
                hybrid = self._hybrid_view(
                    data,
                    data.shape[1],
                    kind="pq",
                    codebooks=np.asarray(
                        self._quantizer.codewords, dtype=np.float32
                    ),
                )
                if hybrid is not None:
                    self._dev_view = hybrid
                    return self._dev_view

            # lane-pad the code columns to 128 when the Pallas ADC kernel
            # will consume this table (single device, kernel enabled): the
            # SAME HBM array then serves the kernel (which needs the
            # 128-lane layout) and the gather/scan paths (which slice
            # [:, :m]) — without this the kernel kept a second, equally
            # lane-padded copy, doubling the code-table HBM.  Mesh/CPU
            # paths never run the kernel, so they keep the compact (N, m)
            # layout (padding would inflate their HBM 128/m x for nothing)
            m = data.shape[1]
            pad_for_kernel = (
                m <= 128
                and self._mesh_config is None
                and pallas_stream_enabled()
            )
            width = 128 if pad_for_kernel else m
            codes = np.zeros((n_pad, width), dtype=data.dtype)
            codes[: self._num, :m] = data
            codebooks = np.asarray(self._quantizer.codewords, dtype=np.float32)
            if self._mesh_config is not None:
                # codes shard row-wise exactly like dense tables; the
                # codebooks (M x Ks x Ds — tiny) replicate onto every chip,
                # and OPQ's rotation is already folded into the queries
                from fastforward_tpu.parallel.multihost import (
                    put_replicated,
                    put_row_sharded,
                )

                if self._mesh is None:
                    self._mesh = self._mesh_config.build()
                self._dev_view = DeviceView(
                    kind="pq",
                    table=put_row_sharded(self._mesh, codes, ndim=2),
                    codebooks=put_replicated(self._mesh, codebooks),
                    mesh=self._mesh,
                    precision=self._precision,
                )
            else:
                self._dev_view = DeviceView(
                    kind="pq",
                    table=upload_table(codes),
                    codebooks=jnp.asarray(codebooks),
                    precision=self._precision,
                )
        elif isinstance(self._quantizer, ScalarQuantizer):
            dim = data.shape[1]
            if self._hbm_budget is not None:
                if dim % 128 == 0:
                    # beyond-HBM tier for int8 code tables (scales fold
                    # into the queries exactly like the resident program)
                    hybrid = self._hybrid_view(
                        data, dim, kind="scalar",
                        scales=self._quantizer.scales,
                    )
                    if hybrid is not None:
                        self._dev_view = hybrid
                        return self._dev_view
                else:
                    LOGGER.warning(
                        "hbm_budget is ignored: the hybrid beyond-HBM tier "
                        "requires dim %% 128 == 0 (got %d)",
                        dim,
                    )
            codes = np.zeros((n_pad, dim), dtype=np.int8)
            codes[: self._num] = data
            if dim % 128 == 0:
                # 3D layout: int8 tables stream through the MXU at 4x less
                # bandwidth than fp32 (scales are folded into the queries)
                codes = codes.reshape(n_pad, dim // 128, 128)
            if self._mesh_config is not None:
                # int8 codes shard row-wise like dense tables; the scales
                # are folded into the (replicated) query vectors
                from fastforward_tpu.parallel.multihost import put_row_sharded

                if dim % 128 != 0:
                    raise ValueError(
                        "Sharded tables require dim % 128 == 0 "
                        f"(got {dim}); pad the embeddings."
                    )
                if self._mesh is None:
                    self._mesh = self._mesh_config.build()
                codes_dev = put_row_sharded(self._mesh, codes)
                self._dev_view = DeviceView(
                    kind="scalar",
                    table=codes_dev,
                    scales=self._quantizer.scales,
                    mesh=self._mesh,
                    precision=self._precision,
                )
            else:
                # 'high' is lossless for the int8 table side (int8 values
                # are exactly representable in bf16); only the query hi/lo
                # split matters
                self._dev_view = DeviceView(
                    kind="scalar",
                    table=upload_table(codes),
                    scales=self._quantizer.scales,
                    precision=self._precision,
                )
        elif self._quantizer is not None:
            # unknown quantizer: decode on host, score dense
            table = np.zeros(
                (n_pad, self._quantizer.dims[0]), dtype=np.float32
            )
            table[: self._num] = self._quantizer.decode(data)
            self._dev_view = DeviceView(
                kind="dense",
                table=upload_table(table),
                precision=self._precision,
            )
        elif self._mesh_config is not None:
            # multi-chip: row-sharded table over the mesh's shard axis
            from fastforward_tpu.parallel.multihost import put_row_sharded

            dim = data.shape[1]
            if dim % 128 != 0:
                raise ValueError(
                    "Sharded tables require dim % 128 == 0 "
                    f"(got {dim}); pad the embeddings."
                )
            if self._hbm_budget is not None:
                # sharded hybrid tier: per-chip resident shards + one
                # host-streamed tail for corpora beyond the mesh's budget
                hybrid = self._hybrid_view(data, dim)
                if hybrid is not None:
                    self._dev_view = hybrid
                    return self._dev_view
            if self._mesh is None:
                self._mesh = self._mesh_config.build()
            table = np.zeros((n_pad, dim), dtype=np.float32)
            table[: self._num] = data
            dev = put_row_sharded(self._mesh, table, ndim=2)
            self._dev_view = DeviceView(
                kind="dense", table=dev, mesh=self._mesh, precision=self._precision
            )
        else:
            dim = data.shape[1]
            if self._hbm_budget is not None:
                if dim % 128 == 0:
                    hybrid = self._hybrid_view(data, dim)
                    if hybrid is not None:
                        self._dev_view = hybrid
                        return self._dev_view
                else:
                    LOGGER.warning(
                        "hbm_budget is ignored: the hybrid beyond-HBM tier "
                        "requires dim %% 128 == 0 (got %d); the full table "
                        "will be uploaded to HBM — pad the embeddings or "
                        "quantize to stay within budget",
                        dim,
                    )
            # dense tables stay 2D (N, dim): lanes are exact 128-multiples
            # so the device layout has NO sublane padding — the 3D
            # (N, dim//128, 128) form wastes 33% HBM at dim=768 (T(8,128)
            # tiling pads the middle dim 6 -> 8; caught as an OOM at N=8M)
            table = np.zeros((n_pad, dim), dtype=np.float32)
            table[: self._num] = data
            if self._device_dtype == "bfloat16":
                # halves HBM footprint and gather bandwidth — and, converted
                # on HOST, halves the bytes crossing the host->device link
                # (the dominant cold-start cost over a remote-attached
                # device); dots still accumulate in fp32
                import ml_dtypes

                table = table.astype(ml_dtypes.bfloat16)
            dev = upload_table(table)
            self._dev_view = DeviceView(
                kind="dense", table=dev, precision=self._precision
            )

        return self._dev_view
