"""Pallas TPU kernels for the hot ops XLA cannot fuse on its own
(SURVEY.md §7 stage 4).  Every kernel has a pure-jnp reference
implementation in ``ops/`` and is tested against it (interpret mode on CPU,
compiled on TPU)."""
from points_matching_tpu.ops.pallas.matching_kernel import (  # noqa: F401
    fused_l2_top2,
)
