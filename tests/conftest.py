"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip sharding is validated on virtual CPU devices
(``--xla_force_host_platform_device_count=8``); the real-TPU benchmark path is
exercised separately by ``bench.py``.  The environment may pin
``JAX_PLATFORMS`` (e.g. to a TPU tunnel), so the platform is forced through
``jax.config`` before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
