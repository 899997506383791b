#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json `metric`): two-view match+RANSAC throughput in
pairs/sec/chip.  Workload per pair: 512×64 descriptor 1-NN ratio-test
matching (distance-matrix GEMM + top-k) + 512-hypothesis batched 8-point
RANSAC with Sampson inlier scoring + 2 refit rounds — the reference
pipeline's hot path (`Points Matching/main.cpp:44-98`) at production sizes.

Methodology (bench_version 3 — NOT comparable to v1/v2):
  * **True synchronization.** On this tunneled TPU backend,
    `jax.block_until_ready()` and `Array.is_ready()` are NO-OPS: a jitted
    chain of 64 dependent 4096³ bf16 matmuls "completes" in the same wall
    time as a chain of 8 (~0.1 ms — dispatch only), and `is_ready()`
    returns True immediately after dispatch.  Every wall-clock number
    measured through `block_until_ready` on this backend (bench v1 AND v2)
    was therefore dispatch-bound, not device-bound.  The only true sync is
    a device→host fetch of a scalar that data-depends on the whole
    computation, so v3 times [one dispatch of an N-step on-device scan +
    one dependent scalar fetch].
  * **Intercept subtraction.** The fetch has a ~1.3 s latency intercept
    with occasional ~11 s outliers (min-of-3 filters those).  Throughput
    comes from the DIFFERENCE between a long and a short scan of the same
    program — the intercept cancels:
        pairs/s = Δsteps × batch / (t(long) − t(short)).
    Scan lengths self-calibrate so the long–short gap is seconds of real
    device time.
  * **Per-step-varying data.** Every scan step consumes its own slice from
    a rotating 16-slice descriptor/point pool (dynamic index = step mod 16)
    plus its own PRNG key, so no GEMM input is loop-invariant and LICM
    cannot hoist work out of the loop (the v1 flaw).
  * **Roofline denominator.** The chip's sustained dense-GEMM rate is
    measured with the same fetch-synced slope method on 4096³ bf16 matmul
    chains (~244 TFLOP/s here — the device reports "TPU v5 lite" but
    exceeds that part's 197 TFLOP/s spec).  `fraction_of_roofline` uses
    max(spec, measured).
  * Also reported: matching-only throughput + MFU (the BASELINE "MXU-bound
    descriptor GEMM + top-k" roofline target), BA LM iterations/sec, and
    the scaling-efficiency lines from `benchmarks/scaling.py` on a faked
    multi-device CPU mesh (validates the sharded paths; real ICI scaling
    needs a multi-chip slice this environment does not have).

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


BENCH_VERSION = 3
BATCH = 64          # pairs per device step
NKP = 512           # keypoints per image (SURF@8000 on the bundled images)
DIM = 64            # SURF-class descriptor dim
HYP = 512           # RANSAC hypotheses
OUTLIER_FRAC = 0.3
RATIO = 0.85
POOL = 16           # rotating per-step data slices (defeats LICM hoisting)
MATCH_DTYPE = "bf16"  # MXU-native matching GEMM (production default on TPU)

# Scan-length calibration: short anchor, first long guess, and the target
# device-seconds for the final long run (escalated if the guess is too fast).
INNER_SHORT = 64
INNER_GUESS = 1024
TARGET_GAP_S = 4.0
INNER_MAX = 65536
TIMING_REPS = 3


def _fetch_timed(dispatch_and_fetch, reps=TIMING_REPS):
    """min-of-reps wall time of [dispatch + dependent scalar fetch].

    The fetch is the only true sync on this backend (see module docstring);
    min-of-reps rejects the sporadic ~11 s fetch-latency outliers, which
    are strictly additive.
    """
    best = float("inf")
    val = None
    for _ in range(reps):
        t0 = time.perf_counter()
        val = dispatch_and_fetch()
        dt = time.perf_counter() - t0
        best = min(best, dt)
    return best, val


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
    """Sustained dense-GEMM rate by fetch-synced slope.

    Times a jitted chain of N dependent 4096³ bf16 matmuls ending in a
    dependent scalar fetch, for a short and a long N; the per-matmul time
    is the slope (fetch intercept cancels).  Measured here: ~0.56 ms per
    4096³ bf16 matmul ≈ 244 TFLOP/s — above the reported part's spec
    (197 TFLOP/s "v5 lite"), so the denominator is max(spec, measured).
    """
    global _MEASURED_PEAK
    if _MEASURED_PEAK is not None:
        return _MEASURED_PEAK
    import jax
    import jax.numpy as jnp
    from functools import partial

    M = 4096
    a = (0.015 * jax.random.normal(jax.random.PRNGKey(7), (M, M))).astype(
        jnp.bfloat16
    )

    @partial(jax.jit, static_argnames=("n",))
    def chain(a, n):
        # The per-step Frobenius renormalization (a) keeps values finite and
        # data-dependent, and (b) makes the chain algebraically irreducible —
        # a pure a@c chain is a matrix power, which a sufficiently clever
        # compiler could shortcut (observed: the XLA CPU backend times a pure
        # chain ~16× faster than its FLOPs allow; the renormalized chain
        # times true).  On the TPU the two time identically (~0.56 ms per
        # 4096³ bf16 matmul), so the renorm's bandwidth cost is in the noise.
        def body(c, _):
            c = a @ c
            c = c * jax.lax.rsqrt(
                jnp.mean(jnp.square(c.astype(jnp.float32)))
            ).astype(jnp.bfloat16)
            return c, None

        out, _ = jax.lax.scan(body, a, None, length=n)
        return jnp.sum(out[:1, :8].astype(jnp.float32))

    n_short, n_long = 64, 4096
    for n in (n_short, n_long):  # compile + first-exec warmup
        float(chain(a, n))
    t_s, _ = _fetch_timed(lambda: float(chain(a, n_short)))
    t_l, _ = _fetch_timed(lambda: float(chain(a, n_long)))
    per_mm = max((t_l - t_s) / (n_long - n_short), 1e-9)
    _MEASURED_PEAK = 2 * M**3 / per_mm / 1e12
    return _MEASURED_PEAK


def _cost_flops(compiled):
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def _pool_scan_bench(per_step_mean):
    """Shared fetch-synced scan harness.

    ``per_step_mean(d1, d2, p1, p2, keys) -> scalar f32`` consumes one
    [B, ...] pool slice + [B] keys and returns a per-step statistic.
    Returns (steps_per_sec, per_step_flops_or_None, mean_stat,
    (inner_short, inner_long)).
    """
    import jax
    import jax.numpy as jnp
    from functools import partial

    d1, d2, p1, p2 = _make_workload(POOL * BATCH, seed=0)
    shape5 = lambda x: jnp.asarray(x.reshape(POOL, BATCH, *x.shape[1:]))
    pd1, pd2, pp1, pp2 = map(shape5, (d1, d2, p1, p2))

    @partial(jax.jit, static_argnames=("inner",))
    def run(pd1, pd2, pp1, pp2, inner):
        # Every step consumes its own pool slice (index = step mod POOL,
        # a traced value — nothing is loop-invariant, nothing hoists) and
        # its own key; the returned mean depends on EVERY step, so the
        # host fetch of it is a true barrier for the whole scan.
        def body(carry, ks):
            i, acc = carry
            sl = i % POOL
            take = lambda pool: jax.lax.dynamic_index_in_dim(
                pool, sl, 0, keepdims=False
            )
            stat = per_step_mean(take(pd1), take(pd2), take(pp1), take(pp2), ks)
            return (i + 1, acc + stat), None

        keys = jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(0), inner),
            (inner, BATCH),
        )
        (_, acc), _ = jax.lax.scan(
            body, (jnp.int32(0), jnp.float32(0.0)), keys
        )
        return acc / inner

    def timed(inner):
        return _fetch_timed(lambda: float(run(pd1, pd2, pp1, pp2, inner)))

    # warm compiles (first dispatch compiles; fetch completes first exec)
    float(run(pd1, pd2, pp1, pp2, INNER_SHORT))
    float(run(pd1, pd2, pp1, pp2, INNER_GUESS))

    t_short, _ = timed(INNER_SHORT)
    t_long, stat = timed(INNER_GUESS)
    inner_long = INNER_GUESS
    gap = t_long - t_short
    per_step = max(gap / (INNER_GUESS - INNER_SHORT), 1e-9)
    if gap < TARGET_GAP_S / 2 and inner_long < INNER_MAX:
        # too fast to resolve against fetch noise — escalate the long run
        inner_long = min(
            INNER_SHORT + int(TARGET_GAP_S / per_step), INNER_MAX
        )
        float(run(pd1, pd2, pp1, pp2, inner_long))  # compile
        t_long, stat = timed(inner_long)
        per_step = max(
            (t_long - t_short) / (inner_long - INNER_SHORT), 1e-9
        )

    # Cost analysis strictly AFTER the jit warmup/timing: on this backend,
    # an AOT lower().compile() issued BEFORE the first jit execution leaves
    # the jit cache holding an executable that runs ~10⁵× slower (measured
    # 20.7 s vs 0.07 ms per identical call); issued after, it is a cache
    # hit returning the same fast executable's counters.
    fl_s = _cost_flops(
        run.lower(pd1, pd2, pp1, pp2, inner=INNER_SHORT).compile()
    )
    fl_l = _cost_flops(
        run.lower(pd1, pd2, pp1, pp2, inner=inner_long).compile()
    )
    step_flops = (
        (fl_l - fl_s) / (inner_long - INNER_SHORT) if fl_s and fl_l else None
    )
    return dict(
        steps_per_sec=1.0 / per_step,
        step_flops=step_flops,
        stat=stat,
        scan_lengths=(INNER_SHORT, inner_long),
        gap_s=t_long - t_short,  # measured device-seconds between the two
        # scans — the timing resolution backing steps_per_sec (fetch noise
        # is ~±40 ms, so gap_s ≫ 0.04 means the number is solid)
    )


def bench_tpu():
    """Sustained device throughput for match+RANSAC, fetch-synced."""
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

    def step_mean(a, b, pa, pb, ks):
        ni = jax.vmap(per_pair)(a, b, pa, pb, ks)
        return jnp.mean(ni.astype(jnp.float32))

    r = _pool_scan_bench(step_mean)
    peak = max(_chip_peak_tflops(), _measured_peak_tflops())
    achieved = (
        r["step_flops"] * r["steps_per_sec"] / 1e12 if r["step_flops"] else None
    )
    return dict(
        pairs_per_sec=r["steps_per_sec"] * BATCH,
        mean_inliers=r["stat"],
        step_us=1e6 / r["steps_per_sec"],
        scan_lengths=list(r["scan_lengths"]),
        gap_s=r["gap_s"],
        achieved_tflops=achieved,
        peak_tflops=peak,
        fraction_of_roofline=(achieved / peak) if achieved else None,
    )


def bench_matching_only():
    """Matching alone (distance GEMM + top-2 + ratio gate) — the op BASELINE
    designates as MXU-bound; its roofline fraction is the '≥70%' target."""
    import jax
    import jax.numpy as jnp

    from points_matching_tpu.core.config import MatcherConfig
    from points_matching_tpu.core.types import Descriptors
    from points_matching_tpu.ops.matching import match_descriptors

    mcfg = MatcherConfig(metric="l2", filter="ratio", ratio=RATIO,
                         compute_dtype=MATCH_DTYPE)

    def step_mean(a, b, pa, pb, ks):
        def one(da, db):
            m = jnp.ones((NKP,), bool)
            out = match_descriptors(
                Descriptors(data=da, mask=m), Descriptors(data=db, mask=m), mcfg
            )
            return jnp.sum(out.mask.astype(jnp.float32))

        return jnp.mean(jax.vmap(one)(a, b))

    r = _pool_scan_bench(step_mean)
    peak = max(_chip_peak_tflops(), _measured_peak_tflops())
    achieved = (
        r["step_flops"] * r["steps_per_sec"] / 1e12 if r["step_flops"] else None
    )
    return dict(
        pairs_per_sec=r["steps_per_sec"] * BATCH,
        mean_matches=r["stat"],
        gap_s=r["gap_s"],
        achieved_tflops=achieved,
        fraction_of_roofline=(achieved / peak) if achieved else None,
    )


def bench_ba(cameras=32, landmarks=2048):
    """BA LM iterations/sec (BASELINE metric 2), fetch-synced.

    Two compiles of the same LM loop at different max_iterations (rtol=0
    disables early-exit, so iteration count is exact); iters/s from the
    wall-time difference — fetch intercept and per-call overhead cancel.
    """
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

    _fns = {}

    def run(iters):
        if iters not in _fns:  # one jit per iteration count, reused across reps
            cfg = BAConfig(max_iterations=iters, rtol=0.0)
            _fns[iters] = jax.jit(
                lambda s: bundle_adjust(s, K, cfg)[1].final_cost
            )
        return float(_fns[iters](state))

    short, long_ = 5, 105
    for it in (short, long_):
        run(it)  # compile + first-exec warmup
    t_s, _ = _fetch_timed(lambda: run(short))
    t_l, _ = _fetch_timed(lambda: run(long_))
    if (t_l - t_s) < 1.0:
        long_ = 1005
        run(long_)
        t_l, _ = _fetch_timed(lambda: run(long_))
    per_iter = max((t_l - t_s) / (long_ - short), 1e-9)
    return dict(
        ba_iters_per_sec=1.0 / per_iter,
        cameras=cameras,
        landmarks=landmarks,
    )


def bench_scaling():
    """Capture benchmarks/scaling.py efficiency lines on a faked 8-device
    CPU mesh (subprocess so XLA_FLAGS apply cleanly).  Validates the
    sharded paths and bounds communication overhead; it is NOT hardware
    scaling (single host, shared cores).  CPU jax synchronizes correctly,
    so these timings need no fetch tricks."""
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
            "data_pool_slices": POOL,
            "scan_lengths": head["scan_lengths"],
            "matcher_dtype": MATCH_DTYPE,
            "sync": "dependent-scalar-fetch (block_until_ready is a no-op "
                    "on this backend; see module docstring)",
            "mean_inliers": rnd(head["mean_inliers"], 1),
            "step_us": rnd(head["step_us"], 1),
            "timing_gap_s": rnd(head["gap_s"], 3),
            "achieved_tflops": rnd(head["achieved_tflops"], 3),
            "peak_tflops": rnd(head["peak_tflops"], 1),
            "fraction_of_roofline": rnd(head["fraction_of_roofline"], 4),
            "matching_only": {
                "pairs_per_sec": rnd(match_only["pairs_per_sec"]),
                "timing_gap_s": rnd(match_only["gap_s"], 3),
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
