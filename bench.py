#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json `metric`): two-view match+RANSAC throughput in
pairs/sec/chip.  Workload per pair: 512×64 descriptor 1-NN ratio-test
matching (distance-matrix GEMM + top-k) + 512-hypothesis batched 8-point
RANSAC with Sampson inlier scoring + 2 refit rounds — the reference
pipeline's hot path (`Points Matching/main.cpp:44-98`) at production sizes.

Baseline: the same per-pair workload through OpenCV on the host CPU
(BFMatcher knnMatch + ratio filter + findFundamentalMat(FM_RANSAC)) — the
reference's own implementation stack (OpenCV), since the reference repo
publishes no numbers (BASELINE.md).  `vs_baseline` = ours / OpenCV.
"""
import json
import os
import sys
import time

os.environ.setdefault("PMT_NO_COMPILE_CACHE", "1")

import numpy as np


BATCH = 64          # pairs per device step
NKP = 512           # keypoints per image (SURF@8000 on the bundled images)
DIM = 64            # SURF-class descriptor dim
HYP = 512           # RANSAC hypotheses
OUTLIER_FRAC = 0.3
RATIO = 0.85


def _make_workload(batch, seed=0):
    """Synthetic matched-pair workload with known geometry + outliers."""
    rng = np.random.RandomState(seed)
    d1 = rng.randn(batch, NKP, DIM).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    # train set = permuted noisy copies → realistic 1-NN structure
    perm = np.stack([rng.permutation(NKP) for _ in range(batch)])
    d2 = np.take_along_axis(d1, perm[..., None], axis=1)
    d2 += 0.1 * rng.randn(*d2.shape).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)

    # geometry: random two-view scenes, p2 from a true F, with outliers
    p1 = rng.uniform(0, 640, (batch, NKP, 2)).astype(np.float32)
    depth = rng.uniform(4, 12, (batch, NKP, 1)).astype(np.float32)
    K = np.array([[512.0, 0, 320], [0, 512.0, 240], [0, 0, 1]], np.float32)
    Kinv = np.linalg.inv(K)
    uv1 = np.concatenate([p1, np.ones((batch, NKP, 1), np.float32)], -1) @ Kinv.T
    X = uv1 * depth
    t = np.array([0.5, 0.05, 0.02], np.float32)
    X2 = X + t  # pure translation keeps it simple and well-conditioned
    uv2 = X2 / X2[..., 2:3]
    p2_aligned = (uv2 @ K.T)[..., :2] + 0.5 * rng.randn(batch, NKP, 2).astype(np.float32)
    # train row j holds the descriptor of query perm[j], so its keypoint
    # must be the projection of query perm[j]'s 3-D point
    p2 = np.take_along_axis(p2_aligned, perm[..., None], axis=1)
    n_out = int(OUTLIER_FRAC * NKP)
    p2[:, :n_out] = rng.uniform(0, 640, (batch, n_out, 2)).astype(np.float32)
    return d1, d2, p1, p2


def bench_tpu(iters=30, inner=10):
    """Sustained device throughput: ``inner`` steps are scanned on-device
    inside one jit (a 64-pair step is ~20 µs of compute — per-call Python
    dispatch is ~10× that, so an un-scanned loop measures the host, not the
    chip; production feeds batches back-to-back exactly like the scan)."""
    import jax
    import jax.numpy as jnp

    from points_matching_tpu.core.config import MatcherConfig, RansacConfig
    from points_matching_tpu.core.types import Descriptors
    from points_matching_tpu.geometry.ransac import ransac_fundamental
    from points_matching_tpu.ops.matching import match_descriptors

    d1, d2, p1, p2 = _make_workload(BATCH)
    mcfg = MatcherConfig(metric="l2", filter="ratio", ratio=RATIO)
    rcfg = RansacConfig(num_hypotheses=HYP)

    def per_pair(a, b, pa, pb, k):
        m = jnp.ones((NKP,), bool)
        matches = match_descriptors(
            Descriptors(data=a, mask=m), Descriptors(data=b, mask=m), mcfg
        )
        q1 = jnp.take(pa, jnp.clip(matches.query_idx, 0, NKP - 1), axis=0)
        q2 = jnp.take(pb, jnp.clip(matches.train_idx, 0, NKP - 1), axis=0)
        est = ransac_fundamental(k, q1, q2, matches.mask, rcfg)
        return est.num_inliers

    @jax.jit
    def run(d1, d2, p1, p2, keys):  # keys: [inner, BATCH, 2]
        # accumulate across steps so every inner step is live — returning
        # only nis[-1] lets XLA dead-code-eliminate the other steps and
        # report fictional throughput
        def body(carry, ks):
            ni = jax.vmap(per_pair)(d1, d2, p1, p2, ks)
            return carry + ni, ni

        total, nis = jax.lax.scan(body, jnp.zeros((BATCH,), jnp.int32), keys)
        return total, nis[-1]

    d1, d2, p1, p2 = map(jnp.asarray, (d1, d2, p1, p2))
    # pre-generate per-iteration keys: host-side split inside the timing
    # loop would serialize dispatch and dominate the measurement
    all_keys = jax.random.split(jax.random.PRNGKey(0), (iters + 1) * inner * BATCH)
    all_keys = all_keys.reshape(iters + 1, inner, BATCH, 2)
    # materialize each iteration's key slice as its own device array BEFORE
    # the timed region: an `all_keys[i]` slice issued inside the loop is a
    # host-driven gather dispatch (~0.2 ms over the device tunnel) that
    # dominates and under-reports chip throughput ~8×
    key_slices = [jnp.array(all_keys[i]) for i in range(iters + 1)]
    jax.block_until_ready(key_slices)

    # warmup / compile
    out = run(d1, d2, p1, p2, key_slices[0])
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for i in range(iters):
        out = run(d1, d2, p1, p2, key_slices[i + 1])
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    pairs_per_sec = BATCH * inner * iters / dt
    mean_inliers = float(jnp.mean(out[1]))
    return pairs_per_sec, mean_inliers


def bench_opencv(n_pairs=8):
    """The reference's stack (OpenCV BFMatcher + RANSAC F) on host CPU."""
    try:
        import cv2
    except ImportError:
        return None
    d1, d2, p1, p2 = _make_workload(n_pairs, seed=1)
    bf = cv2.BFMatcher(cv2.NORM_L2)
    t0 = time.perf_counter()
    for i in range(n_pairs):
        knn = bf.knnMatch(d1[i], d2[i], k=2)
        good = [m for m, n in knn if m.distance < RATIO * n.distance]
        if len(good) >= 8:
            q1 = np.float32([p1[i][m.queryIdx] for m in good])
            q2 = np.float32([p2[i][m.trainIdx] for m in good])
            cv2.findFundamentalMat(q1, q2, cv2.FM_RANSAC, 1.5, 0.999, HYP)
    dt = time.perf_counter() - t0
    return n_pairs / dt


def main():
    pairs_per_sec, mean_inliers = bench_tpu()
    baseline = bench_opencv()
    vs = (pairs_per_sec / baseline) if baseline else None
    result = {
        "metric": "two_view_match_ransac_throughput",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "detail": {
            "batch": BATCH,
            "keypoints": NKP,
            "descriptor_dim": DIM,
            "ransac_hypotheses": HYP,
            "mean_inliers": round(mean_inliers, 1),
            "opencv_cpu_pairs_per_sec": round(baseline, 2) if baseline else None,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
