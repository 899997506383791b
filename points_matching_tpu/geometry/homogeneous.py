"""Homogeneous-coordinate helpers (replaces ad-hoc ``cv::Mat`` assembly in
the reference's residual audit, ``Points Matching/main.cpp:108-117``)."""
from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def to_homogeneous(x: Array) -> Array:
    """[..., D] → [..., D+1] by appending 1."""
    return jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)


def from_homogeneous(x: Array, eps: float = 1e-12) -> Array:
    """[..., D+1] → [..., D] by perspective division."""
    w = x[..., -1:]
    w = jnp.where(jnp.abs(w) < eps, jnp.where(w < 0, -eps, eps), w)
    return x[..., :-1] / w


def skew(v: Array) -> Array:
    """[..., 3] → [..., 3, 3] cross-product (hat) matrix."""
    z = jnp.zeros_like(v[..., 0])
    rows = [
        jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)
