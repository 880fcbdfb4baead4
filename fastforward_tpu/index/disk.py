"""On-disk index tier: HDF5 store, format-compatible with the reference.

The file layout matches the reference exactly (reference:
``index/disk.py:138-165``: datasets ``vectors``/``doc_ids``/``psg_ids``,
attrs ``num_vectors``/``ff_version``, quantizer state under
``quantizer/{meta,attributes,data}``), so indexes built by either
implementation load in the other.

Scoring with this tier gathers candidate rows on the host per call (sorted
fancy-indexing, or per-chunk memory maps) and ships them to the device; for
repeated re-ranking, ``to_memory()`` promotes the whole table to the
HBM-resident ``InMemoryIndex``, or pass ``hbm_cache=True`` to upload the
table to device memory once while keeping the HDF5 file canonical.
"""

import logging
from collections.abc import Iterable, Iterator
from pathlib import Path

import h5py
import jax.numpy as jnp
import numpy as np

import fastforward_tpu
from fastforward_tpu.encoder.base import Encoder
from fastforward_tpu.index.base import DeviceView, IDSequence, Index
from fastforward_tpu.index.memory import InMemoryIndex
from fastforward_tpu.index.mode import Mode
from fastforward_tpu.ops.upload import upload_table
from fastforward_tpu.quantizer import Quantizer
from fastforward_tpu.quantizer.pq import PQ
from fastforward_tpu.quantizer.scalar import ScalarQuantizer

LOGGER = logging.getLogger(__name__)


class OnDiskIndex(Index):
    """Fast-Forward index backed by an HDF5 file on disk."""

    def __init__(
        self,
        index_file: Path,
        query_encoder: Encoder | None = None,
        quantizer: Quantizer | None = None,
        mode: Mode = Mode.MAXP,
        encoder_batch_size: int = 32,
        init_size: int = 2**16,
        chunk_size: int = 2**16,
        max_id_length: int = 8,
        overwrite: bool = False,
        memory_mapped: bool = False,
        max_indexing_size: int = 2**10,
        hbm_cache: bool = False,
        precision: str = "exact",
        mesh_config=None,
        hbm_budget: int | None = None,
        stream_chunk_rows: int | None = None,
        score_transport: str = "f32",
    ) -> None:
        """Create an index on disk.

        :param index_file: The index file to create (or overwrite).
        :param query_encoder: The query encoder.
        :param quantizer: The quantizer to use.
        :param mode: The ranking mode.
        :param encoder_batch_size: Batch size for the query encoder.
        :param init_size: Initial allocation (number of vectors).
        :param chunk_size: HDF5 chunk size (number of vectors).
        :param max_id_length: Maximum ID length in characters.
        :param overwrite: Overwrite an existing file.
        :param memory_mapped: Read vectors through per-chunk memory maps.
        :param max_indexing_size: Maximum rows per HDF5 fancy-indexing read.
        :param hbm_cache: Upload the full table to device memory on first
            scoring call (invalidated by ``add``).
        :param precision: Scoring matmul precision (see ``InMemoryIndex``).
        :param mesh_config: With ``hbm_cache``, shard the cached table
            row-wise across a device mesh (see ``InMemoryIndex``).
        :param hbm_budget: With ``hbm_cache``, the scoring-HBM budget in
            bytes (dense, int8-quantized, or PQ code tables); tables
            exceeding it serve from the beyond-HBM hybrid tier (resident
            prefix + host-RAM tail streamed in candidate blocks, see
            ``InMemoryIndex``).
        :param stream_chunk_rows: Rows per streamed tail block for the
            hybrid tier.
        :param score_transport: ``"f32"`` (exact scores) or ``"u16"``
            (compact device->host score copy, see ``InMemoryIndex``).
        :raises ValueError: When the file exists and ``overwrite=False``.
        """
        index_file = Path(index_file)
        if index_file.exists() and not overwrite:
            raise ValueError(f"File {index_file} exists.")

        self._index_file = index_file.absolute()
        self._init_size = init_size
        self._chunk_size = chunk_size
        self._max_id_length = max_id_length
        self._memory_mapped = memory_mapped
        self._max_indexing_size = max_indexing_size
        self._hbm_cache = hbm_cache
        self._precision = precision
        self._mesh_config = mesh_config
        if hbm_budget is not None and mesh_config is not None:
            import jax

            if jax.process_count() > 1:
                raise ValueError(
                    "hbm_budget + mesh_config (the sharded hybrid tier) is "
                    "single-process only: the host tail streams through "
                    "this controller's devices.  Multi-host pods shard the "
                    "full table across hosts instead (per-shard rows are "
                    "read lazily from HDF5)."
                )
        self._hbm_budget = hbm_budget
        self._stream_chunk_rows = stream_chunk_rows
        self._mesh = None
        self._dev_view: DeviceView | None = None
        self._mmap_chunks: list[np.memmap] | None = None

        LOGGER.debug("creating file %s", self._index_file)
        with h5py.File(self._index_file, "w") as fp:
            fp.attrs["num_vectors"] = 0
            fp.attrs["ff_version"] = fastforward_tpu.__version__

        super().__init__(
            query_encoder=query_encoder,
            quantizer=quantizer,
            mode=mode,
            encoder_batch_size=encoder_batch_size,
            score_transport=score_transport,
        )

    # -- file layout ---------------------------------------------------------

    def _create_datasets(self, fp: h5py.File, dim: int, dtype: np.dtype) -> None:
        fp.create_dataset(
            "vectors",
            (self._init_size, dim),
            dtype,
            maxshape=(None, dim),
            chunks=(self._chunk_size, dim),
        )
        for name in ("doc_ids", "psg_ids"):
            fp.create_dataset(
                name,
                (self._init_size,),
                f"S{self._max_id_length}",
                maxshape=(None,),
                chunks=True,
            )

    def _on_quantizer_set(self) -> None:
        assert self.quantizer is not None
        with h5py.File(self._index_file, "a") as fp:
            if "quantizer" in fp:
                del fp["quantizer"]
            meta, attributes, data = self.quantizer.serialize()
            fp.create_group("quantizer/meta").attrs.update(meta)
            fp.create_group("quantizer/attributes").attrs.update(
                {k: v for k, v in attributes.items() if v is not None}
            )
            group = fp.create_group("quantizer/data")
            for key, value in data.items():
                group.create_dataset(key, data=value)

    def _get_num_vectors(self) -> int:
        with h5py.File(self._index_file, "r") as fp:
            return int(fp.attrs["num_vectors"])

    def _get_internal_dim(self) -> int | None:
        with h5py.File(self._index_file, "r") as fp:
            if "vectors" in fp:
                return fp["vectors"].shape[1]
        return None

    # -- adding --------------------------------------------------------------

    def _validate_new_ids(self, doc_ids: IDSequence, psg_ids: IDSequence) -> None:
        """Check lengths and uniqueness of all IDs before mutating anything.

        A failed add leaves the index unchanged (reference contract:
        ``disk.py:254-260``).  Lengths are checked in encoded *bytes* — the
        file stores fixed-width ``S{max_id_length}`` byte strings, and numpy
        would otherwise silently truncate a multi-byte UTF-8 ID mid-sequence,
        corrupting the file (it then fails to decode on reload).
        """
        for doc_id in doc_ids:
            if doc_id is not None and len(doc_id.encode()) > self._max_id_length:
                raise RuntimeError(
                    f"Document ID {doc_id} is longer than the maximum "
                    f"({self._max_id_length} bytes encoded)."
                )
        for psg_id in psg_ids:
            if psg_id is None:
                continue
            if len(psg_id.encode()) > self._max_id_length:
                raise RuntimeError(
                    f"Passage ID {psg_id} is longer than the maximum "
                    f"({self._max_id_length} bytes encoded)."
                )
        self._ids.check_new_psgs(psg_ids)

    def _add(
        self, vectors: np.ndarray, doc_ids: IDSequence, psg_ids: IDSequence
    ) -> None:
        with h5py.File(self._index_file, "a") as fp:
            if "vectors" not in fp:
                self._create_datasets(fp, vectors.shape[-1], vectors.dtype)
            # id lengths are bounded by the stored string width
            self._max_id_length = fp["doc_ids"].dtype.itemsize
            self._validate_new_ids(doc_ids, psg_ids)

            start = int(fp.attrs["num_vectors"])
            num_new = vectors.shape[0]
            capacity = fp["vectors"].shape[0]
            if start + num_new > capacity:
                # grow by whole chunks
                new_size = -(-(start + num_new) // self._chunk_size) * self._chunk_size
                LOGGER.debug("resizing index from %s to %s", capacity, new_size)
                for name in ("vectors", "doc_ids", "psg_ids"):
                    fp[name].resize(new_size, axis=0)
                self._mmap_chunks = None

            self._ids.add(doc_ids, psg_ids, start)
            width = self._max_id_length
            fp["doc_ids"][start : start + num_new] = np.array(
                [(d or "").encode() for d in doc_ids], dtype=f"S{width}"
            )
            fp["psg_ids"][start : start + num_new] = np.array(
                [(p or "").encode() for p in psg_ids], dtype=f"S{width}"
            )

            fp["vectors"][start : start + num_new] = vectors
            fp.attrs["num_vectors"] = start + num_new
        self._dev_view = None

    # -- host retrieval ------------------------------------------------------

    def _read_rows_h5(self, rows: np.ndarray) -> np.ndarray:
        """Read rows via (sorted) HDF5 fancy indexing, in bounded batches."""
        order = np.argsort(rows, kind="stable")
        sorted_rows = rows[order]
        with h5py.File(self._index_file, "r") as fp:
            ds = fp["vectors"]
            parts = [
                ds[sorted_rows[i : i + self._max_indexing_size].tolist()]
                for i in range(0, len(sorted_rows), self._max_indexing_size)
            ]
        data = np.concatenate(parts)
        # undo the sort
        out = np.empty_like(data)
        out[order] = data
        return out

    def _get_mmap_chunks(self) -> list[np.memmap]:
        """Per-HDF5-chunk memory maps over the raw vector bytes.

        :raises RuntimeError: When the dataset chunking doesn't cover whole
            rows (chunk width must equal the vector dimension).
        """
        if self._mmap_chunks is None:
            with h5py.File(self._index_file, "r") as fp:
                ds = fp["vectors"]
                if ds.chunks is None or ds.chunks[1] != ds.shape[1]:
                    raise RuntimeError("This index does not support memory maps.")
                self._mmap_chunks = [
                    np.memmap(
                        self._index_file,
                        mode="r",
                        shape=ds.chunks,
                        offset=ds.id.get_chunk_info(i).byte_offset,
                        dtype=ds.dtype,
                    )
                    for i in range(ds.id.get_num_chunks())
                ]
            LOGGER.debug("created %s chunk memory maps", len(self._mmap_chunks))
        return self._mmap_chunks

    def _read_rows_mmap(self, rows: np.ndarray) -> np.ndarray:
        chunks = self._get_mmap_chunks()
        chunk_rows = chunks[0].shape[0]
        out = np.empty((len(rows), chunks[0].shape[1]), dtype=chunks[0].dtype)
        for pos, row in enumerate(rows):
            out[pos] = chunks[row // chunk_rows][row % chunk_rows]
        return out

    def _get_vectors(self, ids: Iterable[str]) -> tuple[np.ndarray, list[str]]:
        ids = list(ids)
        rows, counts = self._ids.resolve(ids, self.mode)
        if rows.shape[0] == 0:
            return np.array([]), []
        out_ids = [i for i, c in zip(ids, counts) for _ in range(c)]
        if self._memory_mapped:
            return self._read_rows_mmap(rows), out_ids
        return self._read_rows_h5(rows), out_ids

    def _batch_iter(
        self, batch_size: int
    ) -> Iterator[tuple[np.ndarray, IDSequence, IDSequence]]:
        with h5py.File(self._index_file, "r") as fp:
            num_vectors = int(fp.attrs["num_vectors"])
            for i in range(0, num_vectors, batch_size):
                j = min(i + batch_size, num_vectors)
                doc_ids = fp["doc_ids"].asstr()[i:j]
                psg_ids = fp["psg_ids"].asstr()[i:j]
                yield (
                    fp["vectors"][i:j],
                    [d if d else None for d in doc_ids],
                    [p if p else None for p in psg_ids],
                )

    # -- device cache --------------------------------------------------------

    def _upload(self, table: np.ndarray, require_lanes: bool = False):
        """Place a padded table on device: replicated, or row-sharded when a
        mesh is configured."""
        if self._mesh_config is None:
            return upload_table(table), None
        if require_lanes and table.ndim == 2 and table.shape[1] % 128:
            raise ValueError(
                "Sharded tables require dim % 128 == 0 "
                f"(table shape {table.shape}); pad the embeddings."
            )
        from fastforward_tpu.parallel.multihost import put_row_sharded

        if self._mesh is None:
            self._mesh = self._mesh_config.build()
        return (
            put_row_sharded(self._mesh, table, ndim=table.ndim),
            self._mesh,
        )

    def _hybrid_view(
        self,
        data: np.ndarray,
        num: int,
        dim: int,
        kind: str = "dense",
        codebooks: np.ndarray | None = None,
        scales: np.ndarray | None = None,
    ):
        """Beyond-HBM tier view, or ``None`` when the table fits the budget
        (with a mesh configured the budget is per chip and the resident
        prefix row-shards — the sharded hybrid tier)."""
        from fastforward_tpu.index.base import build_hybrid_view

        if self._mesh_config is not None and self._mesh is None:
            self._mesh = self._mesh_config.build()
        return build_hybrid_view(
            data,
            num,
            dim,
            self._hbm_budget,
            self._precision,
            chunk_rows=self._stream_chunk_rows,
            kind=kind,
            codebooks=codebooks,
            scales=scales,
            mesh=self._mesh,
        )

    def _lazy_sharded_dense_view(self, num: int, n_pad: int):
        """Multi-process tables upload straight from HDF5, per shard.

        Each process reads ONLY the row ranges its local devices own
        (``put_row_sharded_lazy``) — the full table never exists in any
        single host's RAM, so a pod can serve corpora larger than one
        host's memory from disk.  Dense fp32 tables, int8 scalar codes,
        and PQ code tables (codebooks replicate; they are tiny) all
        narrow this way.  Returns ``None`` when not applicable (single
        process, unknown quantizer, hybrid-budgeted, or non-128 dims).
        """
        import jax

        if (
            self._mesh_config is None
            or jax.process_count() <= 1
            or self._hbm_budget is not None
        ):
            return None
        is_pq = isinstance(self._quantizer, PQ)
        is_scalar = isinstance(self._quantizer, ScalarQuantizer)
        if self._quantizer is not None and not (is_pq or is_scalar):
            return None
        with h5py.File(self._index_file, "r") as fp:
            width = fp["vectors"].shape[1]
            stored_dtype = fp["vectors"].dtype
        if not is_pq and width % 128:
            return None
        from fastforward_tpu.parallel.multihost import (
            put_replicated,
            put_row_sharded_lazy,
        )

        if self._mesh is None:
            self._mesh = self._mesh_config.build()
        path = self._index_file
        if is_pq:
            shape: tuple = (n_pad, width)
            dtype = stored_dtype
        elif is_scalar:
            # 3D int8 layout: code rows stream through the MXU at 4x less
            # bandwidth than fp32 (scales fold into the queries)
            shape = (n_pad, width // 128, 128)
            dtype = np.int8
        else:
            shape = (n_pad, width)
            dtype = np.float32

        def read_rows(start: int, stop: int) -> np.ndarray:
            out = np.zeros((stop - start, width), dtype=dtype)
            hi = min(stop, num)
            if hi > start:
                with h5py.File(path, "r") as fp:
                    out[: hi - start] = fp["vectors"][start:hi]
            return out.reshape(stop - start, *shape[1:])

        table = put_row_sharded_lazy(
            self._mesh, shape, dtype, read_rows, ndim=len(shape)
        )
        if is_pq:
            return DeviceView(
                kind="pq",
                table=table,
                codebooks=put_replicated(
                    self._mesh,
                    np.asarray(self._quantizer.codewords, dtype=np.float32),
                ),
                precision=self._precision,
                mesh=self._mesh,
            )
        if is_scalar:
            return DeviceView(
                kind="scalar",
                table=table,
                scales=self._quantizer.scales,
                precision=self._precision,
                mesh=self._mesh,
            )
        return DeviceView(
            kind="dense",
            table=table,
            precision=self._precision,
            mesh=self._mesh,
        )

    def _device_view(self) -> DeviceView | None:
        if not self._hbm_cache:
            return None
        num = len(self)
        if num == 0:
            return None
        if self._dev_view is None:
            n_pad = -(-num // 4096) * 4096
            lazy = self._lazy_sharded_dense_view(num, n_pad)
            if lazy is not None:
                self._dev_view = lazy
                return self._dev_view
            with h5py.File(self._index_file, "r") as fp:
                raw = fp["vectors"][:num]
            if isinstance(self._quantizer, PQ):
                from fastforward_tpu.ops.scoring import (
                    pallas_stream_enabled,
                )

                if self._hbm_budget is not None:
                    hybrid = self._hybrid_view(
                        raw,
                        num,
                        raw.shape[1],
                        kind="pq",
                        codebooks=np.asarray(
                            self._quantizer.codewords, dtype=np.float32
                        ),
                    )
                    if hybrid is not None:
                        self._dev_view = hybrid
                        return self._dev_view

                # lane-pad code columns to 128 when the Pallas ADC kernel
                # will consume this table, so ONE HBM array serves the
                # kernel and the gather/scan paths (see
                # InMemoryIndex._device_view); mesh/CPU keep (N, m)
                m = raw.shape[1]
                pad_for_kernel = (
                    m <= 128
                    and self._mesh_config is None
                    and pallas_stream_enabled()
                )
                width = 128 if pad_for_kernel else m
                codes = np.zeros((n_pad, width), dtype=raw.dtype)
                codes[:num, :m] = raw
                codebooks = np.asarray(
                    self._quantizer.codewords, dtype=np.float32
                )
                if self._mesh_config is not None:
                    # code rows shard like dense tables; codebooks replicate
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
                if (
                    self._hbm_budget is not None
                    and raw.shape[1] % 128 == 0
                ):
                    hybrid = self._hybrid_view(
                        np.ascontiguousarray(raw, dtype=np.int8),
                        num,
                        raw.shape[1],
                        kind="scalar",
                        scales=self._quantizer.scales,
                    )
                    if hybrid is not None:
                        self._dev_view = hybrid
                        return self._dev_view
                codes = np.zeros((n_pad, raw.shape[1]), dtype=np.int8)
                codes[:num] = raw
                if codes.shape[1] % 128 == 0:
                    codes = codes.reshape(n_pad, -1, 128)
                dev, mesh = self._upload(codes)
                self._dev_view = DeviceView(
                    kind="scalar",
                    table=dev,
                    scales=self._quantizer.scales,
                    mesh=mesh,
                    precision=self._precision,
                )
            else:
                if self._quantizer is not None:
                    raw = self._quantizer.decode(raw)
                if self._hbm_budget is not None:
                    if raw.shape[1] % 128 == 0:
                        hybrid = self._hybrid_view(
                            np.ascontiguousarray(raw, dtype=np.float32),
                            num,
                            raw.shape[1],
                        )
                        if hybrid is not None:
                            self._dev_view = hybrid
                            return self._dev_view
                    else:
                        LOGGER.warning(
                            "hbm_budget is ignored: the hybrid beyond-HBM "
                            "tier requires dim %% 128 == 0 (got %d); the "
                            "full table will be uploaded to HBM — pad the "
                            "embeddings or quantize to stay within budget",
                            raw.shape[1],
                        )
                # dense tables stay 2D (N, dim): no sublane padding (the
                # 3D form wastes 33% HBM at dim=768, see InMemoryIndex)
                data = np.zeros((n_pad, raw.shape[1]), dtype=np.float32)
                data[:num] = raw
                dev, mesh = self._upload(data, require_lanes=True)
                self._dev_view = DeviceView(
                    kind="dense",
                    table=dev,
                    precision=self._precision,
                    mesh=mesh,
                )
        return self._dev_view

    # -- conversion / loading ------------------------------------------------

    def to_memory(self, batch_size: int | None = None) -> InMemoryIndex:
        """Load the index into an HBM-resident ``InMemoryIndex``.

        :param batch_size: Copy in batches instead of all at once.
        :return: The in-memory index.
        """
        index = InMemoryIndex(
            query_encoder=self._query_encoder,
            quantizer=self._quantizer,
            mode=self.mode,
            encoder_batch_size=self._encoder_batch_size,
            init_size=max(len(self), 1),
            precision=self._precision,
            mesh_config=self._mesh_config,
        )
        with h5py.File(self._index_file, "r") as fp:
            num_vectors = int(fp.attrs["num_vectors"])
            step = batch_size or max(num_vectors, 1)
            for i in range(0, num_vectors, step):
                j = min(i + step, num_vectors)
                doc_ids = fp["doc_ids"].asstr()[i:j]
                psg_ids = fp["psg_ids"].asstr()[i:j]
                index._add(
                    fp["vectors"][i:j],
                    doc_ids=[d if d else None for d in doc_ids],
                    psg_ids=[p if p else None for p in psg_ids],
                )
        return index

    @classmethod
    def load(
        cls,
        index_file: Path,
        query_encoder: Encoder | None = None,
        mode: Mode = Mode.MAXP,
        encoder_batch_size: int = 32,
        memory_mapped: bool = False,
        max_indexing_size: int = 2**10,
        hbm_cache: bool = False,
        precision: str = "exact",
        mesh_config=None,
        hbm_budget: int | None = None,
        stream_chunk_rows: int | None = None,
        score_transport: str = "f32",
    ) -> "OnDiskIndex":
        """Open an existing index file (reference- or TPU-built).

        :param index_file: The index file.
        :param query_encoder: The query encoder.
        :param mode: The ranking mode.
        :param encoder_batch_size: Batch size for the query encoder.
        :param memory_mapped: Read vectors through per-chunk memory maps.
        :param max_indexing_size: Maximum rows per HDF5 fancy-indexing read.
        :param hbm_cache: Upload the table to device memory for scoring.
        :param precision: Scoring matmul precision (see ``InMemoryIndex``).
        :param mesh_config: With ``hbm_cache``, shard the cached table
            row-wise across a device mesh (see ``InMemoryIndex``).
        :param hbm_budget: With ``hbm_cache``, serve dense tables larger
            than this byte budget from the beyond-HBM hybrid tier (see
            ``InMemoryIndex``).
        :param stream_chunk_rows: Rows per streamed tail block.
        :param score_transport: ``"f32"`` (exact scores) or ``"u16"``
            (compact device->host score copy, see ``InMemoryIndex``).
        :return: The index.
        """
        index_file = Path(index_file)
        LOGGER.debug("reading file %s", index_file)
        index = cls.__new__(cls)
        super(OnDiskIndex, index).__init__(
            query_encoder=query_encoder,
            quantizer=None,
            mode=mode,
            encoder_batch_size=encoder_batch_size,
            score_transport=score_transport,
        )
        index._index_file = index_file.absolute()
        index._memory_mapped = memory_mapped
        index._max_indexing_size = max_indexing_size
        index._hbm_cache = hbm_cache
        index._precision = precision
        index._mesh_config = mesh_config
        if hbm_budget is not None and mesh_config is not None:
            import jax

            if jax.process_count() > 1:
                raise ValueError(
                    "hbm_budget + mesh_config (the sharded hybrid tier) is "
                    "single-process only: the host tail streams through "
                    "this controller's devices.  Multi-host pods shard the "
                    "full table across hosts instead (per-shard rows are "
                    "read lazily from HDF5)."
                )
        index._hbm_budget = hbm_budget
        index._stream_chunk_rows = stream_chunk_rows
        index._mesh = None
        index._dev_view = None
        index._mmap_chunks = None

        with h5py.File(index_file, "r") as fp:
            if "quantizer" in fp:
                index._quantizer = Quantizer.deserialize(
                    dict(fp["quantizer/meta"].attrs),
                    dict(fp["quantizer/attributes"].attrs),
                    {k: v[:] for k, v in fp["quantizer/data"].items()},
                )
            index._max_id_length = (
                fp["doc_ids"].dtype.itemsize if "doc_ids" in fp else 8
            )
            index._chunk_size = (
                fp["vectors"].chunks[0]
                if "vectors" in fp and fp["vectors"].chunks
                else 2**16
            )
            index._init_size = fp["vectors"].shape[0] if "vectors" in fp else 2**16

            num_vectors = int(fp.attrs["num_vectors"])
            if num_vectors == 0:
                return index

            # rebuild the row maps natively from the raw fixed-width arrays
            # (the reference scans these in a python loop, disk.py:410-417)
            index._ids.bulk_load(
                fp["doc_ids"][:num_vectors], fp["psg_ids"][:num_vectors]
            )
        return index
