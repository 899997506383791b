"""SO(3)/SE(3) exponential and logarithm maps — batched, f32-safe.

The optimization layers (bundle adjustment, pose-graph) parameterize pose
updates in the tangent space and retract with these maps; small-angle cases
use Taylor expansions so gradients stay finite under ``jax.grad``.
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import Array

from points_matching_tpu.geometry.homogeneous import skew

_EPS = 1e-8


def _sinc(x: Array) -> Array:
    """sin(x)/x with Taylor fallback."""
    small = jnp.abs(x) < 1e-4
    x_safe = jnp.where(small, jnp.ones_like(x), x)
    return jnp.where(small, 1.0 - x * x / 6.0, jnp.sin(x_safe) / x_safe)


def _cosc(x: Array) -> Array:
    """(1 - cos(x)) / x² with Taylor fallback."""
    small = jnp.abs(x) < 1e-4
    x_safe = jnp.where(small, jnp.ones_like(x), x)
    return jnp.where(small, 0.5 - x * x / 24.0, (1.0 - jnp.cos(x_safe)) / (x_safe * x_safe))


def so3_exp(w: Array) -> Array:
    """Rodrigues: [..., 3] axis-angle → [..., 3, 3] rotation."""
    theta = jnp.linalg.norm(w, axis=-1)
    W = skew(w)
    W2 = W @ W
    A = _sinc(theta)[..., None, None]
    B = _cosc(theta)[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A * W + B * W2


def so3_log(R: Array) -> Array:
    """[..., 3, 3] rotation → [..., 3] axis-angle (|w| < pi)."""
    trace = jnp.trace(R, axis1=-2, axis2=-1)
    cos_theta = jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    # vee(R - Rᵀ) / 2 = sin(theta) * axis
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    ) * 0.5
    scale = jnp.where(
        theta < 1e-4,
        1.0 + theta * theta / 6.0,          # θ/sin(θ) Taylor
        theta / jnp.maximum(jnp.sin(theta), _EPS),
    )
    # Near θ = π the vee part vanishes; recover the axis from the diagonal.
    near_pi = theta > jnp.pi - 1e-3
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], axis=-1)
    axis_sq = jnp.clip((diag - cos_theta[..., None]) / jnp.maximum(1.0 - cos_theta[..., None], _EPS), 0.0, 1.0)
    axis = jnp.sqrt(axis_sq)
    # Fix signs using off-diagonal sums (axis_i * axis_j terms).
    sign_y = jnp.where(R[..., 0, 1] + R[..., 1, 0] < 0, -1.0, 1.0)
    sign_z = jnp.where(R[..., 0, 2] + R[..., 2, 0] < 0, -1.0, 1.0)
    axis = axis * jnp.stack([jnp.ones_like(sign_y), sign_y, sign_z], axis=-1)
    w_pi = axis * theta[..., None]
    return jnp.where(near_pi[..., None], w_pi, v * scale[..., None])


def _left_jacobian(w: Array) -> Array:
    """SO(3) left Jacobian V(w): se3_exp translation factor."""
    theta = jnp.linalg.norm(w, axis=-1)
    W = skew(w)
    W2 = W @ W
    B = _cosc(theta)[..., None, None]
    small = jnp.abs(theta) < 1e-4
    theta_safe = jnp.where(small, jnp.ones_like(theta), theta)
    C = jnp.where(
        small,
        1.0 / 6.0 - theta * theta / 120.0,
        (1.0 - _sinc(theta)) / (theta_safe * theta_safe),
    )[..., None, None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + B * W + C * W2


def se3_exp(xi: Array) -> Tuple[Array, Array]:
    """[..., 6] twist (v, w) → (R [..., 3, 3], t [..., 3])."""
    v, w = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    V = _left_jacobian(w)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return R, t


def se3_log(R: Array, t: Array) -> Array:
    """(R, t) → [..., 6] twist (v, w)."""
    w = so3_log(R)
    V = _left_jacobian(w)
    v = jnp.linalg.solve(V, t[..., :, None])[..., 0]
    return jnp.concatenate([v, w], axis=-1)
