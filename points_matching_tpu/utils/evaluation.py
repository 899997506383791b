"""Trajectory evaluation: ATE/RPE (BASELINE metric "ATE on TUM fr1 /
KITTI 00"; the reference computes no trajectory, SURVEY.md §6)."""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
from jax import Array


class ATEResult(NamedTuple):
    rmse: Array
    mean: Array
    median_like: Array  # mid-quantile approximation (static-shape friendly)
    scale: Array
    aligned: Array      # [N, 3] aligned estimated positions


def umeyama_alignment(
    src: Array, dst: Array, mask: Optional[Array] = None, with_scale: bool = True
) -> Tuple[Array, Array, Array]:
    """Similarity transform (s, R, t) minimizing ‖dst − (s·R·src + t)‖².

    src/dst: [N, 3]; mask: [N] optional validity.
    """
    if mask is None:
        mask = jnp.ones(src.shape[:-1], bool)
    w = mask.astype(src.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mu_s = jnp.sum(src * w[:, None], axis=0) / n
    mu_d = jnp.sum(dst * w[:, None], axis=0) / n
    xs = (src - mu_s) * w[:, None]
    xd = (dst - mu_d) * w[:, None]
    cov = xd.T @ xs / n
    U, d, Vt = jnp.linalg.svd(cov)
    S = jnp.eye(3, dtype=src.dtype)
    detsign = jnp.sign(jnp.linalg.det(U) * jnp.linalg.det(Vt))
    S = S.at[2, 2].set(detsign)
    R = U @ S @ Vt
    var_s = jnp.sum(xs * xs) / n
    s = jnp.where(
        with_scale, jnp.trace(jnp.diag(d) @ S) / jnp.maximum(var_s, 1e-12), 1.0
    )
    t = mu_d - s * R @ mu_s
    return s, R, t


def absolute_trajectory_error(
    est_positions: Array,
    gt_positions: Array,
    mask: Optional[Array] = None,
    align_scale: bool = True,
) -> ATEResult:
    """ATE after Umeyama (Sim(3) or SE(3)) alignment — the TUM benchmark
    statistic.  est/gt: [N, 3] camera centers."""
    if mask is None:
        mask = jnp.ones(est_positions.shape[:-1], bool)
    s, R, t = umeyama_alignment(est_positions, gt_positions, mask, align_scale)
    aligned = s * est_positions @ R.T + t
    err = jnp.linalg.norm(aligned - gt_positions, axis=-1)
    w = mask.astype(err.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    rmse = jnp.sqrt(jnp.sum(w * err**2) / n)
    mean = jnp.sum(w * err) / n
    # static-shape median substitute: value at the mean of the two central
    # order statistics of the masked errors (sorted with +inf padding)
    err_sorted = jnp.sort(jnp.where(mask, err, jnp.inf))
    k = (jnp.sum(mask.astype(jnp.int32)) - 1) // 2
    med = err_sorted[k]
    return ATEResult(rmse=rmse, mean=mean, median_like=med, scale=s, aligned=aligned)


def relative_pose_error(
    est_positions: Array, gt_positions: Array, delta: int = 1
) -> Array:
    """RPE-translation RMSE over frame pairs ``delta`` apart."""
    de = est_positions[delta:] - est_positions[:-delta]
    dg = gt_positions[delta:] - gt_positions[:-delta]
    err = jnp.linalg.norm(de - dg, axis=-1)
    return jnp.sqrt(jnp.mean(err**2))
