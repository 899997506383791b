"""points_matching_tpu — a TPU-native SLAM/SfM engine in JAX/XLA/Pallas.

A brand-new framework covering (and extending) the capabilities of the
``wenxiaoshuai/Points-Matching`` reference demo (see /root/reference,
``Points Matching/main.cpp``): keypoint detection, descriptor extraction,
nearest-neighbor matching, fundamental-matrix estimation, epipolar residual
auditing and epipolar-line visualization — plus batched RANSAC, pose
recovery, triangulation, Schur-complement bundle adjustment, pose-graph
optimization, incremental SfM and distributed SLAM over TPU device meshes.

Design principles (TPU-first):
  * static shapes + validity masks everywhere (jit-ability),
  * matching as MXU GEMMs + fused top-k,
  * batched linear algebra under ``vmap``,
  * parallelism via ``jax.sharding`` / ``shard_map`` over a ``Mesh``,
  * Pallas kernels for the hot ops that XLA cannot fuse on its own.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Persistent compilation cache: the detection/matching graphs take minutes to
# compile on TPU (Mosaic/XLA), but milliseconds to run. Opt-IN via
# PMT_COMPILE_CACHE=1: the experimental 'axon' TPU plugin hangs at runtime
# when the cache is active (observed: compile completes and is written, then
# execution never starts), so it must not be on by default there.
if _os.environ.get("PMT_COMPILE_CACHE"):
    _cache_dir = _os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "points_matching_tpu", "xla"),
    )
    try:
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from points_matching_tpu.core import types, config  # noqa: F401
