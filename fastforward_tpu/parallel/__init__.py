"""Multi-chip sharding: mesh configuration and the sharded scoring step."""

from fastforward_tpu.parallel.mesh import MeshConfig

__all__ = ["MeshConfig"]
