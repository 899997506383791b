"""Loop detection + pose-graph closure for the SfM/SLAM pipelines
(BASELINE config 3 "pose-graph loop closure"; SURVEY.md §7 stage 7).

Loop detection is the all-pairs covisibility GEMM from the distributed
layer (``parallel/all_pairs.py`` — sharded over a mesh when one is given):
frame-descriptor sets score against each other, candidates are
high-scoring non-adjacent pairs.  Each candidate is geometrically verified
by two-view RANSAC; verified loops become pose-graph edges whose relative
pose comes from essential-matrix decomposition, with the translation scale
borrowed from the current trajectory (monocular scale is unobservable from
one pair).  The chain + loop edges are optimized by ``ba/pose_graph`` and
the corrected poses written back into the SfM state.
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from points_matching_tpu.ba.pose_graph import PoseGraph, optimize_pose_graph
from points_matching_tpu.core.config import SfMConfig
from points_matching_tpu.core.types import CameraIntrinsics, Descriptors, Pose
from points_matching_tpu.geometry.fundamental import essential_from_fundamental
from points_matching_tpu.geometry.pose import recover_pose
from points_matching_tpu.geometry.ransac import ransac_fundamental
from points_matching_tpu.ops.matching import match_descriptors
from points_matching_tpu.parallel.all_pairs import all_pairs_scores


@dataclasses.dataclass
class LoopCandidate:
    i: int
    j: int                      # j < i - min_gap
    score: int                  # covisibility match count
    verified: bool = False
    num_inliers: int = 0


def detect_loop_candidates(
    desc: Array,                 # [N, K, D] per-frame descriptors
    mask: Array,                 # [N, K]
    min_gap: int = 5,
    min_score: int = 30,
    max_candidates: int = 5,
    mesh=None,
    ratio: float = 0.8,
) -> List[LoopCandidate]:
    """Covisibility-based loop candidates: high match-count pairs at least
    ``min_gap`` frames apart (per query frame, best partner only)."""
    scores = np.array(all_pairs_scores(desc, mask, mesh=mesh, ratio=ratio))
    n = scores.shape[0]
    cands: List[LoopCandidate] = []
    for i in range(n):
        js = np.arange(n)
        far = js <= i - min_gap
        if not far.any():
            continue
        row = np.where(far, scores[i], -1)
        j = int(row.argmax())
        if row[j] >= min_score:
            cands.append(LoopCandidate(i=i, j=j, score=int(row[j])))
    cands.sort(key=lambda c: -c.score)
    return cands[:max_candidates]


def verify_loop(
    kps_i: Array, desc_i: Array, mask_i: Array,
    kps_j: Array, desc_j: Array, mask_j: Array,
    K: CameraIntrinsics,
    config: SfMConfig,
    key: Array,
    min_inliers: int = 30,
) -> Tuple[bool, Optional[Pose], int]:
    """Geometric verification: two-view RANSAC F → E → (R, t̂) between the
    two frames.  Returns (ok, pose_i←j with UNIT translation, inliers)."""
    m = match_descriptors(
        Descriptors(data=desc_j, mask=mask_j),
        Descriptors(data=desc_i, mask=mask_i),
        config.two_view.matcher,
    )
    n = kps_j.shape[0]
    pj = jnp.take(kps_j, jnp.clip(m.query_idx, 0, n - 1), axis=0)
    pi = jnp.take(kps_i, jnp.clip(m.train_idx, 0, n - 1), axis=0)
    est = ransac_fundamental(key, pj, pi, m.mask, config.two_view.ransac)
    ninl = int(est.num_inliers)
    if ninl < min_inliers:
        return False, None, ninl
    E = essential_from_fundamental(est.F, K.matrix(), K.matrix())
    w = jnp.logical_and(m.mask, est.inlier_mask)
    pjn = K.normalize_points(pj)
    pin = K.normalize_points(pi)
    pose, _, cheir = recover_pose(E, pjn, pin, w)

    # Parallax gate: for a true revisit (near-zero baseline) the essential
    # translation direction is numerically meaningless — the inlier rays
    # barely move.  Median angular ray motion below ~0.6° ⇒ constrain the
    # loop edge to t = 0 instead of a garbage direction.
    rays_j = jnp.concatenate([pjn, jnp.ones_like(pjn[..., :1])], -1)
    rays_i = jnp.concatenate([pin, jnp.ones_like(pin[..., :1])], -1)
    rj = rays_j / jnp.linalg.norm(rays_j, axis=-1, keepdims=True)
    ri_rot = jnp.einsum("ij,nj->ni", pose.R, rj)  # frame-j rays in frame i
    ri = rays_i / jnp.linalg.norm(rays_i, axis=-1, keepdims=True)
    cosang = jnp.clip(jnp.sum(ri * ri_rot, axis=-1), -1.0, 1.0)
    ang = jnp.where(w, jnp.arccos(cosang), jnp.inf)
    k = jnp.maximum(jnp.sum(w.astype(jnp.int32)) // 2, 0)
    parallax = jnp.sort(ang)[k]
    if float(parallax) < 0.01:
        pose = Pose(R=pose.R, t=jnp.zeros_like(pose.t))

    if int(jnp.sum(cheir.astype(jnp.int32))) < min_inliers // 2 and float(parallax) >= 0.01:
        return False, None, ninl
    return True, pose, ninl


def close_loops(
    poses: Pose,                 # [C] current world→camera estimates
    num_cams: int,
    frames: Sequence[Tuple[Array, Array, Array]],  # (kps_xy, desc, mask)
    K: CameraIntrinsics,
    config: SfMConfig,
    seed: int = 0,
    min_gap: int = 5,
    min_score: int = 30,
    loop_weight: float = 10.0,
    mesh=None,
) -> Tuple[Pose, List[LoopCandidate]]:
    """Detect, verify and close loops over a registered trajectory.

    Returns (corrected poses, the candidate list with verification flags).
    Odometry edges come from the current estimates (weight 1); verified
    loop edges get ``loop_weight``.  Monocular translation scale for each
    loop edge is set to the current-estimate baseline of that pair.
    """
    C = num_cams
    desc = jnp.stack([f[1] for f in frames[:C]])
    mask = jnp.stack([f[2] for f in frames[:C]])
    cands = detect_loop_candidates(
        desc, mask, min_gap=min_gap, min_score=min_score, mesh=mesh,
        ratio=config.two_view.matcher.ratio,
    )
    key = jax.random.PRNGKey(seed)
    verified: List[LoopCandidate] = []
    for c in cands:
        key, k = jax.random.split(key)
        ok, rel, ninl = verify_loop(
            frames[c.i][0], frames[c.i][1], frames[c.i][2],
            frames[c.j][0], frames[c.j][1], frames[c.j][2],
            K, config, k,
        )
        c.verified = ok
        c.num_inliers = ninl
        if ok:
            verified.append((c, rel))

    if not verified:
        return poses, cands

    # Odometry chain from current estimates.
    idx = jnp.arange(C - 1)
    Ti = jax.tree.map(lambda a: a[idx], poses)
    Tj = jax.tree.map(lambda a: a[idx + 1], poses)
    Z_odom = Ti.compose(Tj.inverse())
    ei = [int(v) for v in range(C - 1)]
    ej = [int(v) + 1 for v in range(C - 1)]
    w = [1.0] * (C - 1)

    ZR = [np.asarray(Z_odom.R)]
    Zt = [np.asarray(Z_odom.t)]
    for c, rel in verified:
        # rel: cam_j → cam_i with |t| = 1 (or exactly 0 for a low-parallax
        # revisit); borrow the translation scale from the current estimate
        Pi = jax.tree.map(lambda a: a[c.i], poses)
        Pj = jax.tree.map(lambda a: a[c.j], poses)
        est_rel = Pi.compose(Pj.inverse())
        t_dir = np.asarray(rel.t)
        scale = float(jnp.linalg.norm(est_rel.t)) if np.linalg.norm(t_dir) > 0.5 else 0.0
        ZR.append(np.asarray(rel.R)[None])
        Zt.append((t_dir * scale)[None])
        ei.append(c.i)
        ej.append(c.j)
        w.append(loop_weight)

    Z = Pose(
        R=jnp.asarray(np.concatenate(ZR, axis=0), jnp.float32),
        t=jnp.asarray(np.concatenate(Zt, axis=0), jnp.float32),
    )
    E = len(ei)
    g = PoseGraph(
        poses=jax.tree.map(lambda a: a[:C], poses),
        edges_i=jnp.asarray(ei, jnp.int32),
        edges_j=jnp.asarray(ej, jnp.int32),
        Z=Z,
        weight=jnp.asarray(w, jnp.float32),
        mask=jnp.ones((E,), bool),
        fixed=jnp.arange(C) == 0,
    )
    g_opt, _ = optimize_pose_graph(g)

    # write corrected poses back into the fixed-capacity pose array
    full_R = poses.R.at[:C].set(g_opt.poses.R)
    full_t = poses.t.at[:C].set(g_opt.poses.t)
    return Pose(R=full_R, t=full_t), cands
