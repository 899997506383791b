"""Distributed submap SLAM: Sim(3) alignment unit tests + end-to-end runs
on the single-device path and on the faked 8-device mesh (SURVEY.md §4
"Distributed tests without a cluster")."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from points_matching_tpu.core.config import (
    BAConfig,
    MatcherConfig,
    RansacConfig,
    SfMConfig,
    TwoViewConfig,
)
from points_matching_tpu.core.types import CameraIntrinsics
from points_matching_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS, make_mesh
from points_matching_tpu.pipelines.distributed_slam import (
    run_distributed_slam,
    segment_frames,
    sim3_from_shared_frames,
    _apply_sim3_to_poses,
)
from points_matching_tpu.utils.evaluation import absolute_trajectory_error


def _random_rotations(rng, n):
    A = rng.randn(n, 3, 3)
    q, _ = np.linalg.qr(A)
    det = np.linalg.det(q)
    q[:, :, 0] *= det[:, None]
    return q


def test_sim3_alignment_roundtrip():
    rng = np.random.RandomState(0)
    J = 5
    R_l = _random_rotations(rng, J)
    t_l = rng.randn(J, 3)
    c, R_a, t_a = 1.7, _random_rotations(rng, 1)[0], np.asarray([0.3, -1.0, 2.0])
    R_g, t_g = _apply_sim3_to_poses(R_l, t_l, c, R_a, t_a)

    c2, R2, t2 = sim3_from_shared_frames(R_l, t_l, R_g, t_g, np.ones(J, bool))
    assert abs(c2 - c) < 1e-6
    np.testing.assert_allclose(R2, R_a, atol=1e-6)
    np.testing.assert_allclose(t2, t_a, atol=1e-5)


def test_sim3_alignment_collinear_centers():
    """Straight-line motion (KITTI-like): center-only alignment is rank
    deficient, orientation votes must still pin the roll axis."""
    rng = np.random.RandomState(1)
    J = 4
    R_l = _random_rotations(rng, 1).repeat(J, axis=0)
    centers = np.outer(np.arange(J), [1.0, 0.0, 0.0])  # collinear
    t_l = -np.einsum("jik,jk->ji", R_l, centers)
    c, R_a, t_a = 0.8, _random_rotations(rng, 1)[0], np.asarray([1.0, 2.0, 3.0])
    R_g, t_g = _apply_sim3_to_poses(R_l, t_l, c, R_a, t_a)
    c2, R2, t2 = sim3_from_shared_frames(R_l, t_l, R_g, t_g, np.ones(J, bool))
    assert abs(c2 - c) < 1e-6
    np.testing.assert_allclose(R2, R_a, atol=1e-6)
    np.testing.assert_allclose(t2, t_a, atol=1e-5)


def _make_stacked_sequence(num_frames=16, num_landmarks=400, n_feat=256,
                           seed=0, px_noise=0.3, desc_dim=32,
                           corridor=False):
    """Synthetic trajectory as stacked [F, N, ...] arrays + GT centers.

    ``corridor=True`` spreads the landmark cloud along the whole trajectory
    (KITTI-like forward corridor) so long sequences keep fresh structure in
    view — the fixed cloud leaves the frustum after ~30 frames."""
    from points_matching_tpu.geometry.se3 import so3_exp

    rng = np.random.RandomState(seed)
    w, h = 640, 480
    fx = fy = 500.0
    K = CameraIntrinsics(fx=jnp.float32(fx), fy=jnp.float32(fy),
                         cx=jnp.float32(w / 2), cy=jnp.float32(h / 2))
    if corridor:
        x_hi = 0.3 * num_frames + 6.0
        X = np.stack([
            rng.uniform(-6.0, x_hi, num_landmarks),
            rng.uniform(-3.0, 3.0, num_landmarks),
            rng.uniform(6.0, 14.0, num_landmarks),
        ], axis=-1).astype(np.float32)
    else:
        X = rng.uniform([-5, -3, 6], [5, 3, 14], (num_landmarks, 3)).astype(np.float32)
    desc_gt = rng.randn(num_landmarks, desc_dim).astype(np.float32)
    desc_gt /= np.linalg.norm(desc_gt, axis=-1, keepdims=True)

    kps = np.zeros((num_frames, n_feat, 2), np.float32)
    dsc = np.zeros((num_frames, n_feat, desc_dim), np.float32)
    msk = np.zeros((num_frames, n_feat), bool)
    centers = []
    for i in range(num_frames):
        # the linear yaw accumulates to a full turn on long sequences and
        # the frustum leaves the corridor; bounded oscillation instead
        ang = 0.05 * np.sin(0.05 * i) if corridor else 0.015 * i
        R = np.asarray(so3_exp(jnp.asarray([0.0, ang, 0.0])), np.float32)
        t = np.asarray([-0.3 * i, 0.0, 0.0], np.float32)
        centers.append(-(R.T @ t))
        Xc = X @ R.T + t
        uv = Xc[:, :2] / Xc[:, 2:3] * np.asarray([fx, fy]) + np.asarray([w / 2, h / 2])
        vis = (Xc[:, 2] > 0.5) & (uv[:, 0] >= 0) & (uv[:, 0] < w) & \
              (uv[:, 1] >= 0) & (uv[:, 1] < h)
        idx = np.nonzero(vis)[0]
        rng.shuffle(idx)
        idx = idx[:n_feat]
        k = len(idx)
        kps[i, :k] = uv[idx] + px_noise * rng.randn(k, 2)
        d = desc_gt[idx] + 0.05 * rng.randn(k, desc_dim).astype(np.float32)
        dsc[i, :k] = d / np.linalg.norm(d, axis=-1, keepdims=True)
        msk[i, :k] = True
    return (jnp.asarray(kps), jnp.asarray(dsc), jnp.asarray(msk), K,
            np.stack(centers))


def _small_config(T):
    return SfMConfig(
        two_view=TwoViewConfig(
            matcher=MatcherConfig(metric="l2", filter="ratio", ratio=0.8),
            ransac=RansacConfig(num_hypotheses=128, inlier_threshold=2.0),
        ),
        ba=BAConfig(max_iterations=6),
        max_cameras=T,
        max_landmarks=1024,
        max_observations=4096,
        local_ba_window=T,
    )


def test_segment_frames_shapes():
    kps, dsc, msk, K, _ = _make_stacked_sequence(num_frames=16, n_feat=64,
                                                 num_landmarks=100)
    sk, sd, sm, used = segment_frames(kps, dsc, msk, segment_len=10, overlap=4)
    assert sk.shape == (2, 10, 64, 2)
    assert used == 16
    # overlap frames shared between consecutive segments
    np.testing.assert_array_equal(np.asarray(sk[0, 6:]), np.asarray(sk[1, :4]))


def test_distributed_slam_single_device():
    kps, dsc, msk, K, gt = _make_stacked_sequence(num_frames=16)
    res = run_distributed_slam(
        kps, dsc, msk, K, config=_small_config(10),
        mesh=None, segment_len=10, overlap=4, global_ba=True,
    )
    assert res.registered_per_segment.all(), res.registered_per_segment
    assert res.cam_valid.all()
    ate = absolute_trajectory_error(
        jnp.asarray(res.trajectory), jnp.asarray(gt[: len(res.trajectory)]),
        jnp.asarray(res.cam_valid),
    )
    assert float(ate.rmse) < 0.05, float(ate.rmse)
    assert res.ba_stats is not None
    assert float(res.ba_stats.final_cost) <= float(res.ba_stats.initial_cost)


def test_distributed_slam_mesh():
    kps, dsc, msk, K, gt = _make_stacked_sequence(num_frames=16, seed=3)
    mesh = make_mesh((2, 4), (DATA_AXIS, MODEL_AXIS))
    res = run_distributed_slam(
        kps, dsc, msk, K, config=_small_config(10),
        mesh=mesh, segment_len=10, overlap=4, global_ba=True,
    )
    assert res.cam_valid.all()
    ate = absolute_trajectory_error(
        jnp.asarray(res.trajectory), jnp.asarray(gt[: len(res.trajectory)]),
        jnp.asarray(res.cam_valid),
    )
    assert float(ate.rmse) < 0.05, float(ate.rmse)


@pytest.mark.slow
def test_distributed_slam_config4_scale():
    """BASELINE config-4-scale stand-in (VERDICT r3 item 6): 260 frames /
    16 segments on the faked 8-device mesh — the first run of the chained
    Sim(3) merge at real sequence length.  Asserts every segment
    registers, the merged trajectory's ATE stays within 10% of the
    trajectory extent, and global BA improves the merged cost."""
    F = 272  # segment_len 20, overlap 4 → 16 segments cover 260 frames
    kps, dsc, msk, K, gt = _make_stacked_sequence(
        num_frames=F, num_landmarks=3000, n_feat=256, seed=5,
        corridor=True,
    )
    cfg = dataclasses.replace(
        _small_config(20),
        max_landmarks=2048,
        max_observations=8192,
    )
    mesh = make_mesh((2, 4), (DATA_AXIS, MODEL_AXIS))
    res = run_distributed_slam(
        kps, dsc, msk, K, config=cfg,
        mesh=mesh, segment_len=20, overlap=4, global_ba=True,
    )
    assert res.registered_per_segment.shape[0] == 16
    assert res.registered_per_segment.all(), res.registered_per_segment
    n_frames = len(res.trajectory)
    assert n_frames >= 256
    valid = np.asarray(res.cam_valid)
    assert valid.mean() > 0.95, valid.mean()
    gt_used = gt[:n_frames]
    extent = float(np.linalg.norm(gt_used.max(0) - gt_used.min(0)))
    ate = absolute_trajectory_error(
        jnp.asarray(res.trajectory), jnp.asarray(gt_used),
        jnp.asarray(res.cam_valid),
    )
    assert float(ate.rmse) < 0.10 * extent, (float(ate.rmse), extent)
    assert res.ba_stats is not None
    assert float(res.ba_stats.final_cost) <= float(res.ba_stats.initial_cost)
    print(f"config4: frames={n_frames} extent={extent:.1f} "
          f"ate={float(ate.rmse):.3f} ({float(ate.rmse)/extent:.2%})")
