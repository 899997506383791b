"""Test configuration: run the suite on a faked 8-device CPU mesh so every
sharding / collective path is exercised without TPU hardware (SURVEY.md §4,
'Distributed tests without a cluster')."""
import os

# Must be set before jax is imported anywhere.
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment may register an external TPU plugin via sitecustomize and
# force JAX_PLATFORMS to it; tests must run on the faked 8-device CPU mesh
# (and must NOT contend for the single real TPU), so override post-import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
