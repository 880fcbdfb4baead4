"""Multi-chip sharding: mesh configuration and the sharded scoring step.

``parallel.multihost`` extends the same programs to multi-process
(pod-scale) serving: one JAX process per host, the mesh over the global
device set.
"""

from fastforward_tpu.parallel.mesh import MeshConfig

__all__ = ["MeshConfig"]
