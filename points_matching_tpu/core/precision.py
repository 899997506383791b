"""Float32-exact matmul precision for the geometry/solver paths.

On TPU, JAX's DEFAULT matmul precision computes f32×f32 contractions with
bf16-truncated operands (one MXU pass).  For neural-net workloads that is
the right default; for epipolar geometry it is catastrophic and was
measured as such on the bench chip (r4, reference images
``Points Matching/img01.JPG``/``img02.JPG``):

  * pixel coordinates ~600 truncate to a ~2 px bf16 grid inside the
    one-hot sampling GEMM — every minimal sample perturbed;
  * the Sampson residual r = p2ᵀFp1 is a near-cancellation of O(1) terms,
    so bf16 products flip the d < τ² inlier gate en masse;
  * the refit AᵀA loses the conditioning Hartley normalization bought.

  Same matches, same chip: default precision → 69/340 inliers; float32
  precision → 326/340 (the CPU value).  The cure is cheap because every
  affected contraction is tiny (K ≤ 9 minimal-sample algebra, 3×3
  matvecs); the deep GEMMs that earn bf16 (descriptor matching distance
  matrices) opt into it explicitly via ``compute_dtype`` and are not
  routed through this helper.

Usage: decorate geometry/BA entry points with ``@f32_matmuls``, or pass
``precision=F32_EXACT`` at individual call sites (kernels).
"""
from __future__ import annotations

import functools

import jax

# Exact f32 contraction (6-pass bf16 emulation on the MXU).
F32_EXACT = jax.lax.Precision.HIGHEST


def f32_matmuls(fn):
    """Trace ``fn`` under float32-exact default matmul precision.

    The context is a trace-time config: jit caches key on it, and inner
    ``pallas_call`` kernel traces inherit it, so decorating the public
    entry point covers the whole call tree."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapper
