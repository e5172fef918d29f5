"""Test-time JAX config: force CPU with 8 virtual devices so the sharded
code paths (mesh / shard_map) are exercised without TPU hardware
(SURVEY.md §4: distributed tests without a cluster).

NOTE: this image preloads jax via sitecustomize with JAX_PLATFORMS=axon
(remote TPU).  jax reads JAX_PLATFORMS at import time, so mutating
os.environ here is too late — use jax.config.update instead, before any
backend is initialized.  XLA_FLAGS is read at backend init, so setting it
here still works.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
