#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json `metric`): two-view match+RANSAC throughput in
pairs/sec/chip.  Workload per pair: 512×64 descriptor 1-NN ratio-test
matching (distance-matrix GEMM + top-k) + 512-hypothesis batched 8-point
RANSAC with Sampson inlier scoring + 2 refit rounds — the reference
pipeline's hot path (`Points Matching/main.cpp:44-98`) at production sizes.

Methodology (bench_version 2 — numbers are NOT comparable to v1):
  * Every inner scan step consumes its own descriptor/point slice from a
    device-resident [inner, B, ...] batch, exactly like a production feed.
    v1 scanned loop-invariant descriptors, which XLA hoisted out of the
    scan (LICM), inflating throughput ~1.6×.
  * The headline is cross-checked against the chip roofline: XLA's
    compiled cost analysis gives flops/bytes for the whole step, so
    `fraction_of_roofline` > 1 would expose any residual hoisting/DCE.
  * Also reported: matching-only MFU (the BASELINE "MXU-bound descriptor
    GEMM + top-k" roofline target), BA LM iterations/sec on a dense
    two-view-scale problem, and the scaling-efficiency lines from
    `benchmarks/scaling.py` on a faked multi-device CPU mesh (validates
    the sharded paths + bounds comm overhead; real ICI scaling needs a
    multi-chip slice this environment does not have).

Baseline: the same per-pair workload through OpenCV on the host CPU
(BFMatcher knnMatch + ratio filter + findFundamentalMat(FM_RANSAC)) — the
reference's own implementation stack (OpenCV), since the reference repo
publishes no numbers (BASELINE.md).  `vs_baseline` = ours / OpenCV.
"""
import json
import os
import subprocess
import sys
import time

os.environ.setdefault("PMT_NO_COMPILE_CACHE", "1")

import numpy as np


BENCH_VERSION = 2
BATCH = 64          # pairs per device step
NKP = 512           # keypoints per image (SURF@8000 on the bundled images)
DIM = 64            # SURF-class descriptor dim
HYP = 512           # RANSAC hypotheses
OUTLIER_FRAC = 0.3
RATIO = 0.85
INNER = 32          # scanned steps per jit call (fresh data each step);
                    # one step is ~10 µs of device work vs ~100 µs dispatch
                    # latency over the device tunnel, so the scan must be
                    # deep enough to measure the chip, not the host
MATCH_DTYPE = "bf16"  # MXU-native matching GEMM (production default on TPU)


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


def _chip_peak_tflops():
    from points_matching_tpu.utils.profiling import chip_peaks

    return chip_peaks()["flops"] / 1e12


_MEASURED_PEAK = None


def _measured_peak_tflops():
    """Calibrate the roofline denominator with a dense bf16 GEMM chain.

    The tunneled chip reports device_kind 'TPU v5 lite' (197 TFLOP/s bf16
    spec) but sustains ~840 TFLOP/s on a 4096³ bf16 matmul — a Trillium-
    class part behind a misreporting tunnel.  Using the spec-sheet number
    would overstate every roofline fraction ~4×, so the denominator is
    max(spec, measured dense GEMM).
    """
    global _MEASURED_PEAK
    if _MEASURED_PEAK is not None:
        return _MEASURED_PEAK
    import jax
    import jax.numpy as jnp

    a = jnp.full((4096, 4096), 1e-3, jnp.bfloat16)

    @jax.jit
    def chain(a):
        def body(c, _):
            return a @ c, None

        out, _ = jax.lax.scan(body, a, None, length=8)
        return out

    out = chain(a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = chain(a)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 5
    _MEASURED_PEAK = 2 * 4096**3 * 8 / dt / 1e12
    return _MEASURED_PEAK


def _cost_flops(compiled):
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def bench_tpu(iters=20):
    """Sustained device throughput with per-step-varying data.

    ``INNER`` steps are scanned on-device inside one jit (a 64-pair step is
    tens of µs of compute — per-call Python dispatch over the device tunnel
    is comparable, so an un-scanned loop measures the host, not the chip).
    Each scan step consumes its own [B, N, D] descriptor slice and its own
    keys, so nothing is loop-invariant and nothing hoists.
    """
    import jax
    import jax.numpy as jnp

    from points_matching_tpu.core.config import MatcherConfig, RansacConfig
    from points_matching_tpu.core.types import Descriptors
    from points_matching_tpu.geometry.ransac import ransac_fundamental
    from points_matching_tpu.ops.matching import match_descriptors

    mcfg = MatcherConfig(metric="l2", filter="ratio", ratio=RATIO,
                         compute_dtype=MATCH_DTYPE)
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
    def run(d1s, d2s, p1s, p2s, keys):
        # xs carry per-step data: [INNER, BATCH, ...] — every step's GEMM
        # consumes a distinct slice, so LICM cannot lift any of the work
        def body(carry, xs):
            a, b, pa, pb, ks = xs
            ni = jax.vmap(per_pair)(a, b, pa, pb, ks)
            return carry + ni, ni

        total, nis = jax.lax.scan(
            body, jnp.zeros((BATCH,), jnp.int32), (d1s, d2s, p1s, p2s, keys)
        )
        return total, nis[-1]

    d1, d2, p1, p2 = _make_workload(INNER * BATCH)
    shape5 = lambda x: jnp.asarray(x.reshape(INNER, BATCH, *x.shape[1:]))
    d1s, d2s, p1s, p2s = map(shape5, (d1, d2, p1, p2))

    # pre-generate per-iteration keys: host-side split inside the timing
    # loop would serialize dispatch and dominate the measurement; each
    # iteration gets its own device-resident [INNER, BATCH, 2] slice.
    # DEVICE-side slicing only: a device→host round-trip of the key array
    # flips this tunnel's client into a degraded dispatch mode (measured
    # 0.07 ms → 2.5 ms per call, and one 16 KB fetch took 8 minutes), so
    # nothing leaves the device until every timing section is done.
    all_keys = jax.random.split(jax.random.PRNGKey(0), (iters + 1) * INNER * BATCH)
    all_keys = all_keys.reshape(iters + 1, INNER, BATCH, 2)
    key_slices = [jnp.copy(all_keys[i]) for i in range(iters + 1)]
    jax.block_until_ready(key_slices)

    out = run(d1s, d2s, p1s, p2s, key_slices[0])  # compile + warmup
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for i in range(iters):
        out = run(d1s, d2s, p1s, p2s, key_slices[i + 1])
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    per_call = dt / iters

    # Cost analysis strictly AFTER the jit warmup/timing: on the tunneled
    # 'axon' backend, an AOT lower().compile() issued BEFORE the first jit
    # execution leaves the jit cache holding an executable that runs ~10⁵×
    # slower (measured 20.7 s vs 0.07 ms per identical call); issued after,
    # it is a cache hit and returns the same fast executable's counters.
    flops_per_call = _cost_flops(run.lower(d1s, d2s, p1s, p2s,
                                           key_slices[0]).compile())

    pairs_per_sec = BATCH * INNER * iters / dt
    peak = max(_chip_peak_tflops(), _measured_peak_tflops())
    achieved = flops_per_call / per_call / 1e12 if flops_per_call else None
    frac = (achieved / peak) if achieved else None
    return dict(
        pairs_per_sec=pairs_per_sec,
        # device array — fetched by main() after ALL timing sections (a D2H
        # fetch degrades this process's subsequent dispatch; see above)
        mean_inliers=jnp.mean(out[1].astype(jnp.float32)),
        step_us=per_call / INNER * 1e6,
        flops_per_call=flops_per_call,
        achieved_tflops=achieved,
        peak_tflops=peak,
        fraction_of_roofline=frac,
    )


def bench_matching_only(iters=20):
    """Matching alone (distance GEMM + top-2 + ratio gate) — the op BASELINE
    designates as MXU-bound; its roofline fraction is the '≥70%' target."""
    import jax
    import jax.numpy as jnp

    from points_matching_tpu.core.config import MatcherConfig
    from points_matching_tpu.core.types import Descriptors
    from points_matching_tpu.ops.matching import match_descriptors

    mcfg = MatcherConfig(metric="l2", filter="ratio", ratio=RATIO,
                         compute_dtype=MATCH_DTYPE)

    def step(d1s, d2s):
        def one(a, b):
            m = jnp.ones((NKP,), bool)
            out = match_descriptors(
                Descriptors(data=a, mask=m), Descriptors(data=b, mask=m), mcfg
            )
            return jnp.sum(out.mask.astype(jnp.int32))

        def body(carry, xs):
            a, b = xs
            return carry + jnp.sum(jax.vmap(one)(a, b)), None

        tot, _ = jax.lax.scan(body, jnp.int32(0), (d1s, d2s))
        return tot

    d1, d2, _, _ = _make_workload(INNER * BATCH, seed=3)
    d1s = jnp.asarray(d1.reshape(INNER, BATCH, NKP, DIM))
    d2s = jnp.asarray(d2.reshape(INNER, BATCH, NKP, DIM))

    run = jax.jit(step)
    out = run(d1s, d2s)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run(d1s, d2s)
    jax.block_until_ready(out)
    per_call = (time.perf_counter() - t0) / iters
    # AOT cost analysis only after jit ran (see bench_tpu for why)
    flops = _cost_flops(run.lower(d1s, d2s).compile())

    peak = max(_chip_peak_tflops(), _measured_peak_tflops())
    achieved = flops / per_call / 1e12 if flops else None
    return dict(
        pairs_per_sec=BATCH * INNER / per_call,
        achieved_tflops=achieved,
        fraction_of_roofline=(achieved / peak) if achieved else None,
    )


def bench_ba(iters=5, cameras=32, landmarks=2048, lm_iters=20):
    """BA LM iterations/sec on a dense grid problem (BASELINE metric 2)."""
    import jax

    from points_matching_tpu.ba.lm import bundle_adjust, make_ba_state
    from points_matching_tpu.core.config import BAConfig
    from points_matching_tpu.core.types import CameraIntrinsics
    from points_matching_tpu.data.synthetic import make_ba_problem

    prob = make_ba_problem(
        jax.random.PRNGKey(1), num_cameras=cameras, num_landmarks=landmarks
    )
    K = CameraIntrinsics.from_matrix(prob["K"])
    state = make_ba_state(prob["poses"], prob["X"], prob["uv"], prob["mask"])
    cfg = BAConfig(max_iterations=lm_iters, rtol=0.0)

    fn = jax.jit(lambda s: bundle_adjust(s, K, cfg)[1].final_cost)
    out = fn(state)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(state)
    jax.block_until_ready(out)
    per_call = (time.perf_counter() - t0) / iters
    return dict(
        ba_iters_per_sec=lm_iters / per_call,
        cameras=cameras,
        landmarks=landmarks,
    )


def bench_scaling():
    """Capture benchmarks/scaling.py efficiency lines on a faked 8-device
    CPU mesh (subprocess so XLA_FLAGS apply cleanly).  Validates the
    sharded paths and bounds communication overhead; it is NOT hardware
    scaling (single host, shared cores)."""
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "benchmarks", "scaling.py")
    try:
        proc = subprocess.run(
            [sys.executable, script, "--fake-devices", "8",
             "--devices", "1,2,4,8", "--iters", "3"],
            capture_output=True, text=True, timeout=900,
        )
        lines = []
        for ln in proc.stdout.splitlines():
            try:
                rec = json.loads(ln)
            except json.JSONDecodeError:
                continue
            lines.append({k: rec[k] for k in
                          ("metric", "n_devices", "value", "unit",
                           "efficiency_vs_1dev")})
        return lines or None
    except Exception:
        return None


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
    head = bench_tpu()
    match_only = bench_matching_only()
    ba = bench_ba()
    # every TPU timing section is done — device fetches are safe now
    head["mean_inliers"] = float(head["mean_inliers"])
    scaling = bench_scaling()
    baseline = bench_opencv()
    vs = (head["pairs_per_sec"] / baseline) if baseline else None
    rnd = lambda v, p=2: None if v is None else round(v, p)
    result = {
        "metric": "two_view_match_ransac_throughput",
        "value": rnd(head["pairs_per_sec"]),
        "unit": "pairs/sec/chip",
        "vs_baseline": rnd(vs),
        "bench_version": BENCH_VERSION,
        "detail": {
            "batch": BATCH,
            "keypoints": NKP,
            "descriptor_dim": DIM,
            "ransac_hypotheses": HYP,
            "inner_steps": INNER,
            "matcher_dtype": MATCH_DTYPE,
            "mean_inliers": rnd(head["mean_inliers"], 1),
            "step_us": rnd(head["step_us"], 1),
            "achieved_tflops": rnd(head["achieved_tflops"], 3),
            "peak_tflops": rnd(head["peak_tflops"], 1),
            "fraction_of_roofline": rnd(head["fraction_of_roofline"], 4),
            "matching_only": {
                "pairs_per_sec": rnd(match_only["pairs_per_sec"]),
                "achieved_tflops": rnd(match_only["achieved_tflops"], 3),
                "fraction_of_roofline": rnd(match_only["fraction_of_roofline"], 4),
            },
            "ba_iters_per_sec": rnd(ba["ba_iters_per_sec"], 1),
            "ba_problem": f"{ba['cameras']}cam x {ba['landmarks']}lm dense",
            "scaling_fake_cpu_mesh": scaling,
            "opencv_cpu_pairs_per_sec": rnd(baseline),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
