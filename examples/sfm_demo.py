#!/usr/bin/env python
"""Incremental SfM demo (BASELINE config 3 shape): runs the full
register→triangulate→local-BA loop on a synthetic trajectory (or a directory
of images once frame IO lands) and reports ATE vs ground truth.

Usage:
  python examples/sfm_demo.py [--frames N] [--landmarks L] [--platform cpu|tpu]
"""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import sys


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames", type=int, default=20)
    p.add_argument("--landmarks", type=int, default=400)
    p.add_argument("--features", type=int, default=256)
    p.add_argument("--noise", type=float, default=0.3, help="pixel noise sigma")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--loop-closure", action="store_true",
                   help="out-and-back trajectory + detect/verify/close loops")
    args = p.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import jax.numpy as jnp

    from points_matching_tpu.core.config import (
        MatcherConfig, RansacConfig, SfMConfig, TwoViewConfig,
    )
    from points_matching_tpu.core.types import CameraIntrinsics
    from points_matching_tpu.geometry.se3 import so3_exp
    from points_matching_tpu.pipelines.sfm import run_incremental_sfm
    from points_matching_tpu.utils.evaluation import absolute_trajectory_error

    rng = np.random.RandomState(args.seed)
    w, h, fx = 640, 480, 500.0
    K = CameraIntrinsics(fx=jnp.float32(fx), fy=jnp.float32(fx),
                         cx=jnp.float32(w / 2), cy=jnp.float32(h / 2))
    X = rng.uniform([-4, -3, 6], [4, 3, 14], (args.landmarks, 3)).astype(np.float32)
    desc_gt = rng.randn(args.landmarks, 32).astype(np.float32)
    desc_gt /= np.linalg.norm(desc_gt, axis=-1, keepdims=True)

    if args.loop_closure:
        half = args.frames // 2
        offs = list(range(half)) + list(range(half - 2, -2, -1))
        offs = (offs + [0] * args.frames)[: args.frames]
    else:
        offs = list(range(args.frames))

    frames, gt_centers = [], []
    for i, o in enumerate(offs):
        R = np.asarray(so3_exp(jnp.asarray([0.0, 0.015 * o, 0.0])), np.float32)
        t = np.asarray([-0.25 * o, 0.0, 0.0], np.float32)
        gt_centers.append(-(R.T @ t))
        Xc = X @ R.T + t
        uv = Xc[:, :2] / Xc[:, 2:3] * fx + np.asarray([w / 2, h / 2])
        vis = (Xc[:, 2] > 0.5) & (uv[:, 0] >= 0) & (uv[:, 0] < w) & \
              (uv[:, 1] >= 0) & (uv[:, 1] < h)
        idx = np.nonzero(vis)[0]
        rng.shuffle(idx)
        idx = idx[: args.features]
        k = len(idx)
        xy = np.zeros((args.features, 2), np.float32)
        dd = np.zeros((args.features, 32), np.float32)
        mm = np.zeros((args.features,), bool)
        xy[:k] = uv[idx] + args.noise * rng.randn(k, 2)
        d = desc_gt[idx] + 0.05 * rng.randn(k, 32).astype(np.float32)
        dd[:k] = d / np.linalg.norm(d, axis=-1, keepdims=True)
        mm[:k] = True
        frames.append((jnp.asarray(xy), jnp.asarray(dd), jnp.asarray(mm)))

    cfg = SfMConfig(
        two_view=TwoViewConfig(
            matcher=MatcherConfig(metric="l2", filter="ratio", ratio=0.8),
            ransac=RansacConfig(num_hypotheses=256, inlier_threshold=2.0),
        ),
        max_cameras=max(32, args.frames + 2),
        max_landmarks=4 * args.landmarks,
        max_observations=16 * args.landmarks,
    )

    import time
    t0 = time.time()
    res = run_incremental_sfm(frames, K, cfg, seed=args.seed)
    dt = time.time() - t0

    st = res.state
    n_reg = sum(res.registered)
    print(f"frames registered: {n_reg}/{args.frames}")
    print(f"landmarks: {int(st.num_lms)}  observations: {int(st.num_obs)}")
    print(f"wall time: {dt:.2f}s ({args.frames/dt:.2f} frames/s incl. compile)")

    est = np.asarray(res.trajectory)[: args.frames]
    ate = absolute_trajectory_error(jnp.asarray(est), jnp.asarray(np.stack(gt_centers)))
    print(f"ATE rmse: {float(ate.rmse):.4f}  mean: {float(ate.mean):.4f}  "
          f"(scale {float(ate.scale):.3f})")

    if args.loop_closure:
        from points_matching_tpu.pipelines.loop_closure import close_loops
        from points_matching_tpu.pipelines.sfm import (
            camera_centers,
            local_bundle_adjust,
        )

        corrected, cands = close_loops(
            res.state.poses, int(res.state.num_cams), frames, K, cfg,
            seed=args.seed,
        )
        n_ver = sum(c.verified for c in cands)
        print(f"loop candidates: {len(cands)}  verified: {n_ver}")
        traj2 = np.asarray(camera_centers(corrected, res.state.cam_mask))[: args.frames]
        ate2 = absolute_trajectory_error(
            jnp.asarray(traj2), jnp.asarray(np.stack(gt_centers))
        )
        print(f"ATE after loop closure: {float(ate2.rmse):.4f}")

        # standard SLAM backend order: pose-graph closure, then a global BA
        # re-polish (the pose graph alone discards landmark information)
        st2, _ = local_bundle_adjust(
            res.state.replace(poses=corrected), K, cfg,
            window=int(res.state.num_cams),
        )
        traj3 = np.asarray(camera_centers(st2.poses, st2.cam_mask))[: args.frames]
        ate3 = absolute_trajectory_error(
            jnp.asarray(traj3), jnp.asarray(np.stack(gt_centers))
        )
        print(f"ATE after closure + global BA: {float(ate3.rmse):.4f}")
    return 0 if n_reg == args.frames else 1


if __name__ == "__main__":
    sys.exit(main())
