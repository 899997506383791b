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

from points_matching_tpu.core import types, config  # noqa: F401
