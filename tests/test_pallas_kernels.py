"""Pallas kernels vs their pure-jnp references (SURVEY.md §4 "Kernel
tests": interpret mode on CPU, compiled on TPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from points_matching_tpu.core.types import Descriptors
from points_matching_tpu.ops.matching import knn_match
from points_matching_tpu.ops.pallas.matching_kernel import fused_l2_top2


def _ref_top2(q, t, t_mask):
    d1 = Descriptors(data=q, mask=jnp.ones((q.shape[0],), bool))
    d2 = Descriptors(data=t, mask=t_mask)
    dist, idx = knn_match(d1, d2, k=2)
    return dist, idx


@pytest.mark.parametrize("n1,n2", [(512, 512), (300, 450), (64, 700)])
def test_fused_l2_top2_matches_reference(n1, n2):
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    q = jax.random.normal(k1, (n1, 64))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    t = jax.random.normal(k2, (n2, 64))
    t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
    t_mask = jnp.arange(n2) < (n2 - 17)  # some invalid train rows

    ref_dist, ref_idx = _ref_top2(q, t, t_mask)
    out_dist, out_idx = fused_l2_top2(q, t, t_mask, interpret=True)

    np.testing.assert_array_equal(np.asarray(out_idx[:, 0]), np.asarray(ref_idx[:, 0]))
    np.testing.assert_allclose(np.asarray(out_dist[:, 0]),
                               np.asarray(ref_dist[:, 0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_dist[:, 1]),
                               np.asarray(ref_dist[:, 1]), atol=1e-5)
    # runner-up index: must differ from the 1-NN and attain the runner-up
    # distance (tie-robust — any argmin among ties is acceptable)
    from points_matching_tpu.ops.matching import distance_matrix

    d1 = Descriptors(data=q, mask=jnp.ones((n1,), bool))
    d2 = Descriptors(data=t, mask=t_mask)
    dmat = np.asarray(distance_matrix(d1, d2))
    i2 = np.asarray(out_idx[:, 1])
    assert np.all(i2 != np.asarray(out_idx[:, 0]))
    np.testing.assert_allclose(dmat[np.arange(n1), i2],
                               np.asarray(ref_dist[:, 1]), atol=1e-5)


def test_fused_l2_top2_duplicate_descriptors():
    # exact duplicates: second-best distance must equal best (both ~0)
    q = jnp.eye(8, 64, dtype=jnp.float32)
    t = jnp.concatenate([q, q], axis=0)  # every query appears twice
    t_mask = jnp.ones((16,), bool)
    dist, idx = fused_l2_top2(q, t, t_mask, tile_q=8, tile_t=8, interpret=True)
    np.testing.assert_allclose(np.asarray(dist[:, 0]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dist[:, 1]), 0.0, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx[:, 0]), np.arange(8))


def test_match_descriptors_pallas_backend_agrees():
    from jax.experimental.pallas import tpu as pltpu

    from points_matching_tpu.core.config import MatcherConfig
    from points_matching_tpu.ops.matching import match_descriptors

    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    q = jax.random.normal(k1, (200, 64))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    t = q[jnp.arange(200)[::-1]] + 0.03 * jax.random.normal(k2, (200, 64))
    t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
    d1 = Descriptors(data=q, mask=jnp.arange(200) < 190)
    d2 = Descriptors(data=t, mask=jnp.ones((200,), bool))

    ref = match_descriptors(d1, d2, MatcherConfig(backend="xla"))
    with pltpu.force_tpu_interpret_mode():
        out = match_descriptors(d1, d2, MatcherConfig(backend="pallas"))

    np.testing.assert_array_equal(np.asarray(ref.mask), np.asarray(out.mask))
    m = np.asarray(ref.mask)
    np.testing.assert_array_equal(np.asarray(ref.train_idx)[m],
                                  np.asarray(out.train_idx)[m])
    np.testing.assert_allclose(np.asarray(ref.distance)[m],
                               np.asarray(out.distance)[m], atol=1e-5)


@pytest.mark.parametrize("n1,n2", [(256, 512), (100, 300)])
def test_fused_hamming_top2_matches_reference(n1, n2):
    from points_matching_tpu.ops.pallas.hamming import fused_hamming_top2

    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    q = jax.random.randint(k1, (n1, 8), 0, 2**31 - 1).astype(jnp.uint32)
    t = jax.random.randint(k2, (n2, 8), 0, 2**31 - 1).astype(jnp.uint32)
    # plant exact duplicates so the 1-NN is unambiguous for some rows
    t = t.at[:50].set(q[:50])
    t_mask = jnp.arange(n2) < (n2 - 13)

    d1 = Descriptors(data=q, mask=jnp.ones((n1,), bool), binary=True)
    d2 = Descriptors(data=t, mask=t_mask, binary=True)
    ref_dist, ref_idx = knn_match(d1, d2, k=2, metric="hamming")

    out_dist, out_idx = fused_hamming_top2(q, t, t_mask, interpret=True)
    # distances must agree exactly (integer counts)
    np.testing.assert_array_equal(np.asarray(out_dist[:, 0]),
                                  np.asarray(ref_dist[:, 0], np.float32))
    np.testing.assert_array_equal(np.asarray(out_dist[:, 1]),
                                  np.asarray(ref_dist[:, 1], np.float32))
    # runner-up index attains the runner-up distance and differs from 1-NN
    from points_matching_tpu.ops.matching import distance_matrix

    dmat = np.asarray(distance_matrix(d1, d2, metric="hamming"))
    i2 = np.asarray(out_idx[:, 1])
    assert np.all(i2 != np.asarray(out_idx[:, 0]))
    np.testing.assert_array_equal(dmat[np.arange(n1), i2],
                                  np.asarray(ref_dist[:, 1], np.float32))
    # best index must agree wherever the minimum is unique
    unique = np.asarray(ref_dist[:, 0]) != np.asarray(ref_dist[:, 1])
    np.testing.assert_array_equal(np.asarray(out_idx[:, 0])[unique],
                                  np.asarray(ref_idx[:, 0])[unique])
    # planted duplicates: distance 0 at the planted index
    np.testing.assert_array_equal(np.asarray(out_dist[:50, 0]), 0.0)


def test_match_descriptors_pallas_hamming_backend_agrees():
    from jax.experimental.pallas import tpu as pltpu

    from points_matching_tpu.core.config import MatcherConfig
    from points_matching_tpu.ops.matching import match_descriptors

    k1, k2 = jax.random.split(jax.random.PRNGKey(11))
    q = jax.random.randint(k1, (128, 8), 0, 2**31 - 1).astype(jnp.uint32)
    # train = query with a few bit flips → realistic near-duplicates
    flips = (jax.random.uniform(k2, (128, 8)) < 0.02).astype(jnp.uint32)
    t = jnp.bitwise_xor(q, flips)
    d1 = Descriptors(data=q, mask=jnp.arange(128) < 120, binary=True)
    d2 = Descriptors(data=t, mask=jnp.ones((128,), bool), binary=True)

    cfg_ref = MatcherConfig(metric="hamming", filter="ratio", ratio=0.8,
                            backend="xla")
    cfg_pl = MatcherConfig(metric="hamming", filter="ratio", ratio=0.8,
                           backend="pallas")
    ref = match_descriptors(d1, d2, cfg_ref)
    with pltpu.force_tpu_interpret_mode():
        out = match_descriptors(d1, d2, cfg_pl)

    np.testing.assert_array_equal(np.asarray(ref.mask), np.asarray(out.mask))
    m = np.asarray(ref.mask)
    np.testing.assert_array_equal(np.asarray(ref.train_idx)[m],
                                  np.asarray(out.train_idx)[m])
    np.testing.assert_allclose(np.asarray(ref.distance)[m],
                               np.asarray(out.distance)[m], atol=1e-5)


@pytest.mark.parametrize("h,n", [(512, 512), (100, 300)])
def test_ransac_score_hypotheses_matches_reference(h, n):
    from points_matching_tpu.geometry.fundamental import sampson_distance
    from points_matching_tpu.ops.pallas.ransac_kernel import (
        ransac_score_hypotheses,
    )

    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    F_h = jax.random.normal(ks[0], (h, 3, 3))
    p1 = jax.random.uniform(ks[1], (n, 2), minval=0, maxval=640)
    p2 = p1 + 2.0 * jax.random.normal(ks[2], (n, 2))
    mask = jnp.arange(n) < n - 7
    thr = 1.5

    ref = jnp.sum(
        jnp.logical_and(
            sampson_distance(F_h, p1[None], p2[None]) < thr**2, mask[None]
        ).astype(jnp.int32),
        axis=-1,
    )
    out = ransac_score_hypotheses(F_h, p1, p2, mask, thr, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_ransac_score_hypotheses_vmap():
    from points_matching_tpu.geometry.fundamental import sampson_distance
    from points_matching_tpu.ops.pallas.ransac_kernel import (
        ransac_score_hypotheses,
    )

    ks = jax.random.split(jax.random.PRNGKey(6), 3)
    B, H, N = 3, 64, 128
    F_b = jax.random.normal(ks[0], (B, H, 3, 3))
    p1 = jax.random.uniform(ks[1], (B, N, 2), minval=0, maxval=640)
    p2 = p1 + 2.0 * jax.random.normal(ks[2], (B, N, 2))
    mask = jnp.ones((B, N), bool)
    thr = 1.5

    out = jax.vmap(
        lambda f, a, b, m: ransac_score_hypotheses(f, a, b, m, thr,
                                                   interpret=True)
    )(F_b, p1, p2, mask)
    ref = jax.vmap(
        lambda f, a, b, m: jnp.sum(
            jnp.logical_and(
                sampson_distance(f, a[None], b[None]) < thr**2, m[None]
            ).astype(jnp.int32),
            axis=-1,
        )
    )(F_b, p1, p2, mask)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_ransac_fundamental_pallas_backend_agrees():
    """End-to-end RANSAC through the fused scoring kernel must pick an
    equivalent model (same inlier set) as the XLA scoring path."""
    from jax.experimental.pallas import tpu as pltpu

    from points_matching_tpu.core.config import RansacConfig
    from points_matching_tpu.geometry.ransac import ransac_fundamental

    # synthetic two-view scene with a known F and 30% outliers
    rng = np.random.RandomState(0)
    N = 256
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    X = np.concatenate(
        [rng.uniform(-2, 2, (N, 2)), rng.uniform(4, 8, (N, 1))], axis=1
    ).astype(np.float32)
    p1 = (X / X[:, 2:3]) @ K.T
    X2 = X + np.array([0.3, 0.05, 0.0], np.float32)
    p2 = (X2 / X2[:, 2:3]) @ K.T
    p1, p2 = p1[:, :2], p2[:, :2]
    p2[: N // 3] = rng.uniform(0, 640, (N // 3, 2))  # outliers

    key = jax.random.PRNGKey(0)
    mask = jnp.ones((N,), bool)
    ref = ransac_fundamental(
        key, jnp.asarray(p1), jnp.asarray(p2), mask,
        RansacConfig(num_hypotheses=128, backend="xla"),
    )
    with pltpu.force_tpu_interpret_mode():
        out = ransac_fundamental(
            key, jnp.asarray(p1), jnp.asarray(p2), mask,
            RansacConfig(num_hypotheses=128, backend="pallas"),
        )
    # backend='pallas' routes BOTH the minimal solve and the scoring through
    # the fused kernels; per-hypothesis F's agree with the XLA chain only to
    # the inverse-iteration noise floor (see eightpoint_kernel docstring), so
    # the two paths are equivalent-quality, not bit-equal: both must recover
    # the true consensus and agree on (nearly) the same inlier set.
    rm = np.asarray(ref.inlier_mask)
    om = np.asarray(out.inlier_mask)
    overlap = (rm & om).sum() / max(1, (rm | om).sum())
    assert overlap >= 0.9, f"inlier-set IoU {overlap:.2f}"
    assert int(out.num_inliers) >= int(0.6 * N)  # found the true consensus
    assert int(ref.num_inliers) >= int(0.6 * N)


def test_match_descriptors_pallas_cross_check_agrees():
    """Mutual cross-check through the Pallas backend (reverse pass rides the
    fused kernel — no [N2, N1] matrix) must agree with the XLA path."""
    from jax.experimental.pallas import tpu as pltpu

    from points_matching_tpu.core.config import MatcherConfig
    from points_matching_tpu.ops.matching import match_descriptors

    k1, k2 = jax.random.split(jax.random.PRNGKey(21))
    q = jax.random.normal(k1, (160, 64))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    t = q[jnp.arange(160)[::-1]] + 0.05 * jax.random.normal(k2, (160, 64))
    t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
    d1 = Descriptors(data=q, mask=jnp.arange(160) < 150)
    d2 = Descriptors(data=t, mask=jnp.arange(160) >= 6)

    cfg = dict(filter="ratio", ratio=0.9, cross_check=True)
    ref = match_descriptors(d1, d2, MatcherConfig(backend="xla", **cfg))
    with pltpu.force_tpu_interpret_mode():
        out = match_descriptors(d1, d2, MatcherConfig(backend="pallas", **cfg))

    np.testing.assert_array_equal(np.asarray(ref.mask), np.asarray(out.mask))
    m = np.asarray(ref.mask)
    np.testing.assert_array_equal(np.asarray(ref.train_idx)[m],
                                  np.asarray(out.train_idx)[m])


def test_minimal_eight_point_matches_reference_noise_free():
    """Fused 8-point kernel vs geometry.eight_point on NOISE-FREE minimal
    samples: λ_min(AᵀA) = 0 exactly, both fixed-iteration chains converge
    hard, entries must agree to f32 tolerance.  (On noisy samples both
    paths sit at the same algorithmic noise floor and only quality-level
    agreement holds — covered by the RANSAC end-to-end test above.)"""
    from points_matching_tpu.data.synthetic import make_two_view_scene
    from points_matching_tpu.geometry.fundamental import eight_point
    from points_matching_tpu.ops.pallas.eightpoint_kernel import (
        minimal_eight_point,
    )

    scene = make_two_view_scene(jax.random.PRNGKey(3), num_points=64,
                                noise=0.0)
    rng = np.random.RandomState(0)
    H = 32
    idx = np.stack([rng.choice(64, 8, replace=False) for _ in range(H)])
    sp1 = jnp.asarray(np.asarray(scene.p1)[idx])
    sp2 = jnp.asarray(np.asarray(scene.p2)[idx])

    F_ref = eight_point(sp1, sp2)
    F_pal = minimal_eight_point(sp1, sp2, interpret=True)
    err = np.max(np.abs(np.asarray(F_ref) - np.asarray(F_pal)), axis=(1, 2))
    # unit-Frobenius matrices; a handful of ill-conditioned samples (near-
    # collinear draws) may sit higher — median must be at rounding level
    assert np.median(err) < 2e-4, np.median(err)
    assert np.mean(err < 1e-2) >= 0.9, err

    # degenerate sample (all points identical): finite garbage, no NaN
    spd = jnp.ones((1, 8, 2), jnp.float32) * 5.0
    Fd = minimal_eight_point(spd, spd, interpret=True)
    assert bool(jnp.all(jnp.isfinite(Fd)))


def test_fused_l2_top2_all_train_masked_out_but_some():
    q = jax.random.normal(jax.random.PRNGKey(1), (32, 64))
    t = jax.random.normal(jax.random.PRNGKey(2), (128, 64))
    t_mask = jnp.zeros((128,), bool).at[5].set(True)
    dist, idx = fused_l2_top2(q, t, t_mask, interpret=True)
    np.testing.assert_array_equal(np.asarray(idx[:, 0]), np.full(32, 5))
    assert np.all(np.asarray(dist[:, 1]) > 1e20)  # runner-up is the +inf pad


def test_fused_l2_top2_points_matches_gather():
    """The fused matched-point output (r5 — replaces the caller-side
    p2[train_idx] scalar-path gather) must equal the explicit gather of
    the returned 1-NN indices, to f32 rounding (3-term bf16-split dot)."""
    from points_matching_tpu.ops.pallas.matching_kernel import (
        fused_l2_top2, fused_l2_top2_points,
    )

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(3), 3)
    n1, n2 = 300, 450
    q = jax.random.normal(k1, (n1, 64))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    t = jax.random.normal(k2, (n2, 64))
    t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
    t_mask = jnp.arange(n2) < (n2 - 17)
    t_pts = jax.random.uniform(k3, (n2, 2), minval=0.0, maxval=993.0)

    d0, i0 = fused_l2_top2(q, t, t_mask, interpret=True)
    d1, i1, pts = fused_l2_top2_points(q, t, t_mask, t_pts, interpret=True)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-6)
    ref = np.asarray(t_pts)[np.asarray(i1[:, 0])]
    np.testing.assert_allclose(np.asarray(pts), ref, atol=1e-4)


def test_match_descriptors_points_fallback_agrees():
    """The ops-level wrapper's XLA fallback must produce the same matches
    and gathered points as match_descriptors + take."""
    from points_matching_tpu.core.config import MatcherConfig
    from points_matching_tpu.ops.matching import (
        match_descriptors, match_descriptors_points,
    )

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(5), 3)
    n = 200
    q = jax.random.normal(k1, (n, 64))
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    t = q + 0.1 * jax.random.normal(k2, (n, 64))
    t = t / jnp.linalg.norm(t, axis=-1, keepdims=True)
    pts = jax.random.uniform(k3, (n, 2), maxval=640.0)
    mask = jnp.ones((n,), bool)
    cfg = MatcherConfig(metric="l2", filter="ratio", ratio=0.85,
                        compact=False, backend="xla")
    m_ref = match_descriptors(Descriptors(data=q, mask=mask),
                              Descriptors(data=t, mask=mask), cfg)
    m, got = match_descriptors_points(
        Descriptors(data=q, mask=mask), Descriptors(data=t, mask=mask),
        pts, cfg)
    np.testing.assert_array_equal(np.asarray(m.mask), np.asarray(m_ref.mask))
    np.testing.assert_array_equal(np.asarray(m.train_idx),
                                  np.asarray(m_ref.train_idx))
    ref = np.asarray(pts)[np.clip(np.asarray(m_ref.train_idx), 0, n - 1)]
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)
