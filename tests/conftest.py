"""Test configuration: run the suite on a faked 8-device CPU mesh so every
sharding / collective path is exercised without TPU hardware (SURVEY.md §4,
'Distributed tests without a cluster')."""
import os
import subprocess

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
# PMT_TPU_TESTS=1 opts out for the compiled-kernel parity file
# (tests/test_tpu_compiled.py), which needs the real chip.
if os.environ.get("PMT_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "native")


def pytest_configure(config):
    """Build the native decode layer if absent, so its tests never silently
    skip (the reference's decode is load-bearing: main.cpp:14-15)."""
    so = os.path.join(_NATIVE_DIR, "libpmt_native.so")
    if not os.path.exists(so):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=False,
                       capture_output=True, timeout=300)
