"""Mesh/sharding configuration for multi-chip indexes.

The corpus table is sharded along its row axis over the ``shard`` mesh axis
(the store's "model parallelism"); query batches are data-parallel over the
``data`` axis.  Candidate gathers stay chip-local; partial scores are
combined with a ``psum`` over ICI (SURVEY.md §5, BASELINE.json north star).
"""

from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh


@dataclass(frozen=True)
class MeshConfig:
    """Topology of a multi-chip index.

    :param data: Number of devices along the query (data-parallel) axis.
    :param shard: Number of devices the corpus table is sharded across.
    """

    data: int = 1
    shard: int = 1

    @property
    def num_devices(self) -> int:
        """Total devices required."""
        return self.data * self.shard

    def build(self, devices: list | None = None) -> Mesh:
        """Create the ``jax.sharding.Mesh`` with axes ``(data, shard)``.

        Single-process: consecutive devices fill the ``shard`` axis (the
        historical layout — the score ``psum`` over ``shard`` stays on the
        densest ICI links).  Multi-process: consecutive devices fill the
        ``data`` axis instead, so the ``shard`` axis CROSSES processes and
        each host's devices own only ``local/num`` of the table rows —
        that is what makes per-host uploads (and the lazy HDF5 readers)
        per-shard.  The per-candidate score ``psum`` then rides DCN, but
        it moves only ``(pairs,)`` floats — the table rows never cross.

        :param devices: Devices to use (default: ``jax.devices()``).
        :return: The mesh.
        """
        devices = devices if devices is not None else jax.devices()
        if len(devices) < self.num_devices:
            raise ValueError(
                f"Mesh needs {self.num_devices} devices, found {len(devices)}."
            )
        arr = np.asarray(devices[: self.num_devices])
        if jax.process_count() > 1:
            grid = arr.reshape(self.shard, self.data).T
        else:
            grid = arr.reshape(self.data, self.shard)
        return Mesh(grid, axis_names=("data", "shard"))
