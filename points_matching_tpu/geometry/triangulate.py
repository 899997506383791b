"""Batched DLT triangulation (extension beyond the reference demo, required
by BASELINE configs 2-4)."""
from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
from jax import Array


def triangulate_dlt(
    P1: Array, P2: Array, p1: Array, p2: Array
) -> Tuple[Array, Array]:
    """Linear (DLT) two-view triangulation.

    Args:
      P1, P2: [..., 3, 4] projection matrices (K [R|t]).
      p1, p2: [..., N, 2] pixel coordinates.

    Returns:
      (X [..., N, 3] world points, depth_ok [..., N] — positive depth in
      BOTH cameras, the cheirality mask).
    """
    # Rows of A: x*P[2] - P[0], y*P[2] - P[1] for each view → [..., N, 4, 4]
    def rows(P, p):
        P0 = P[..., None, 0, :]
        P1_ = P[..., None, 1, :]
        P2_ = P[..., None, 2, :]
        x = p[..., 0:1]
        y = p[..., 1:2]
        return jnp.stack([x * P2_ - P0, y * P2_ - P1_], axis=-2)

    A = jnp.concatenate([rows(P1, p1), rows(P2, p2)], axis=-2)  # [..., N, 4, 4]
    ATA = jnp.einsum("...ki,...kj->...ij", A, A)
    _, vecs = jnp.linalg.eigh(ATA)
    Xh = vecs[..., :, 0]
    w = Xh[..., 3:4]
    w_safe = jnp.where(jnp.abs(w) < 1e-12, 1e-12, w)
    X = Xh[..., :3] / w_safe

    Xh1 = jnp.concatenate([X, jnp.ones_like(X[..., :1])], axis=-1)
    z1 = jnp.einsum("...j,...j->...", Xh1, jnp.broadcast_to(P1[..., None, 2, :], Xh1.shape))
    z2 = jnp.einsum("...j,...j->...", Xh1, jnp.broadcast_to(P2[..., None, 2, :], Xh1.shape))
    depth_ok = jnp.logical_and(z1 > 0, z2 > 0)
    return X, depth_ok
