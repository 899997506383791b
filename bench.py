#!/usr/bin/env python
"""Benchmark harness — prints ONE JSON line with the headline metric.

Headline (BASELINE.json `metric`): two-view match+RANSAC throughput in
pairs/sec/chip.  Workload per pair: 512×64 descriptor 1-NN ratio-test
matching (distance-matrix GEMM + top-k) + 512-hypothesis batched 8-point
RANSAC with Sampson inlier scoring + 2 refit rounds — the reference
pipeline's hot path (`Points Matching/main.cpp:44-98`) at production sizes.

Methodology (bench_version 4 — chunked dispatches; v3's numbers were never
produced because its long single scans kill this backend's worker):
  * **True synchronization.** On this tunneled TPU backend,
    `jax.block_until_ready()` and `Array.is_ready()` are NO-OPS (bench v1/v2
    numbers were dispatch-bound artifacts).  The only true sync is a
    device→host fetch of a scalar that data-depends on the computation, so
    everything here times [N dispatches + one dependent scalar fetch].
  * **Chunked dispatches, never one long scan.**  Bisection on this chip
    (round 3; `benchmarks/probe/scan_probe.py`): a 64-step on-device scan of
    the match+RANSAC step completes; a 128-step scan *deterministically
    kills the TPU worker* ("TPU worker process crashed or restarted").  The
    boundary is program-content dependent — matching-only and
    match+sampling scans survive 128 steps; adding the batched
    eigh/SVD-based 8-point solve + scoring crosses it — and long matmul
    chains also die or hang (8192-step 2048³ chain runs; 16384 hangs).  So
    no single dispatch here ever exceeds a proven-safe scan length; long
    totals are K chained dispatches of a SAFE_CHUNK-step scan, each chunk's
    accumulator feeding the next so the final fetch is a true barrier for
    the whole chain.  Throughput comes from the (K_long − K_short) slope —
    the fetch intercept (~1.3 s, ~±40 ms jitter, rare ~11 s outliers
    filtered by min-of-reps) cancels.
  * **Noise floor.** A slope gap below NOISE_FLOOR_S (0.5 s) is REPORTED AS
    AN ERROR for that section, never clamped into a garbage rate (ADVICE
    r2: the old 1e-9 clamp could report ~6.4e10 pairs/s of pure noise).
  * **Per-step-varying data.** Every scan step consumes its own slice from
    a rotating 16-slice descriptor/point pool (dynamic index = step mod 16)
    plus its own PRNG key, and every chunk folds its chunk id into the
    keys, so nothing is loop-invariant and LICM cannot hoist work.
  * **Per-section SUBPROCESS isolation with hard timeouts.**  Each section
    runs as `python bench.py --section NAME` under a wall-clock timeout;
    one failure — including a HANG, which try/except cannot catch (observed
    on this backend: a fetch that never returns, main thread parked on a
    futex with zero CPU progress for 30+ min) — writes `errors[section]`
    and the JSON line still prints (VERDICT r2: a crash in the headline
    section must not discard the other sections' numbers).  Subprocesses
    also mean a TPU-worker crash in one section cannot poison the device
    client of the next.  Each subprocess pays the backend's first-contact
    cost (~75-160 s measured) — timeouts budget for it.
  * **Roofline denominator.** The chip's sustained dense-GEMM rate is
    measured with the same chunked slope method on 4096³ bf16 matmul
    chains (chunks of 1024 matmuls ≈ 0.6 device-seconds each — far below
    the unsafe regime).  `fraction_of_roofline` uses max(spec, measured).

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
import traceback

os.environ.setdefault("PMT_NO_COMPILE_CACHE", "1")

import numpy as np


BENCH_VERSION = 5
BATCH = 64          # pairs per scan step
NKP = 512           # keypoints per image (SURF@8000 on the bundled images)
DIM = 64            # SURF-class descriptor dim
HYP = 512           # RANSAC hypotheses
OUTLIER_FRAC = 0.3
RATIO = 0.85
POOL = 16           # rotating per-step data slices (defeats LICM hoisting)
MATCH_DTYPE = "bf16"  # MXU-native matching GEMM (production default on TPU)

SAFE_CHUNK = 64     # per-dispatch scan length — 64 proven safe for the
                    # match+RANSAC program on this chip; 128 kills the worker
TARGET_GAP_S = 4.0  # device-seconds the long-short slope should span
NOISE_FLOOR_S = 0.5 # below this gap the slope is fetch noise → error out
K_MAX = 4096        # hard cap on chunks per timing (runaway guard)
TIMING_REPS = 3

# Wall-clock budget per section subprocess (includes ~75-160 s backend
# first-contact + remote compiles, which on this tunneled backend can take
# minutes with zero local CPU activity).
SECTION_TIMEOUT_S = {
    "head": 1800,
    "matching_only": 1200,
    "ba": 1200,
    "ba_sparse": 1500,
    "e2e": 1500,
    "all_pairs": 1200,
    "sfm": 1500,
    "scaling": 1500,
    "opencv": 600,
    "opencv_sfm": 900,
}

_T0 = time.time()


def _log(msg):
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def _fetch_timed(dispatch_and_fetch, reps=TIMING_REPS):
    """min-of-reps wall time of [dispatch(es) + dependent scalar fetch].

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
    """Sustained dense-GEMM rate by chunked fetch-synced slope.

    Chains of 4096³ bf16 matmuls in chunks of MM_CHUNK (the carry matrix
    feeds the next chunk, so the final fetch syncs everything); per-matmul
    time from the (K_long − K_short) slope.  Measured on this chip:
    ~0.56 ms per 4096³ bf16 matmul ≈ 244 TFLOP/s — above the reported
    part's spec (197 TFLOP/s "v5 lite"), so the denominator is
    max(spec, measured).
    """
    global _MEASURED_PEAK
    if _MEASURED_PEAK is not None:
        return _MEASURED_PEAK
    # cross-subprocess cache (head + matching_only both need the number;
    # re-measuring costs ~1 min of chip time per section)
    cache = "/tmp/pmt_bench_peak_tflops.json"
    try:
        if time.time() - os.path.getmtime(cache) < 6 * 3600:
            with open(cache) as f:
                _MEASURED_PEAK = float(json.load(f)["tflops"])
            return _MEASURED_PEAK
    except Exception:
        pass
    import jax
    import jax.numpy as jnp
    from functools import partial

    M = 4096
    MM_CHUNK = 1024  # ~0.6 device-seconds per dispatch — far below unsafe
    a = (0.015 * jax.random.normal(jax.random.PRNGKey(7), (M, M))).astype(
        jnp.bfloat16
    )

    @jax.jit
    def chunk(a, c):
        # The per-step Frobenius renormalization (a) keeps values finite and
        # data-dependent, and (b) makes the chain algebraically irreducible —
        # a pure a@c chain is a matrix power, which a sufficiently clever
        # compiler could shortcut (observed: the XLA CPU backend times a pure
        # chain ~16× faster than its FLOPs allow; the renormalized chain
        # times true).
        def body(c, _):
            c = a @ c
            c = c * jax.lax.rsqrt(
                jnp.mean(jnp.square(c.astype(jnp.float32)))
            ).astype(jnp.bfloat16)
            return c, None

        out, _ = jax.lax.scan(body, c, None, length=MM_CHUNK)
        return out

    def run_chunks(k):
        c = a
        for _ in range(k):
            c = chunk(a, c)
        return float(jnp.sum(c[:1, :8].astype(jnp.float32)))

    _log("matmul peak: compiling...")
    run_chunks(1)  # compile + first exec
    t_s, _ = _fetch_timed(lambda: run_chunks(1))
    t_l, _ = _fetch_timed(lambda: run_chunks(5))
    gap = t_l - t_s
    _log(f"matmul peak: t_s={t_s:.2f}s t_l={t_l:.2f}s")
    if gap < NOISE_FLOOR_S:
        raise RuntimeError(
            f"matmul-peak slope gap {gap:.3f}s below noise floor"
        )
    per_mm = gap / (4 * MM_CHUNK)
    _MEASURED_PEAK = 2 * M**3 / per_mm / 1e12
    try:
        with open(cache, "w") as f:
            json.dump({"tflops": _MEASURED_PEAK}, f)
    except Exception:
        pass
    return _MEASURED_PEAK


def _cost_flops(compiled):
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return float(ca.get("flops", 0.0)) or None
    except Exception:
        return None


def _pool_scan_bench(per_step_mean, chunk_len=SAFE_CHUNK):
    """Shared chunked fetch-synced scan harness.

    ``per_step_mean(d1, d2, p1, p2, keys) -> scalar f32`` consumes one
    [B, ...] pool slice + [B] keys and returns a per-step statistic.

    Dispatches K chained chunks, each a ``chunk_len``-step scan whose
    accumulator carries into the next chunk (final fetch = barrier for the
    whole chain).  K_long self-calibrates so the K_long−K_short slope spans
    ≥ TARGET_GAP_S of device time; a final gap below NOISE_FLOOR_S raises
    (never clamped — ADVICE r2).

    Returns a dict: steps_per_sec, step_flops (from XLA cost analysis of
    one chunk / chunk_len, or None), stat (mean per-step statistic),
    chunks (k_short, k_long), chunk_len, gap_s.
    """
    import jax
    import jax.numpy as jnp

    d1, d2, p1, p2 = _make_workload(POOL * BATCH, seed=0)
    shape5 = lambda x: jnp.asarray(x.reshape(POOL, BATCH, *x.shape[1:]))
    pd1, pd2, pp1, pp2 = map(shape5, (d1, d2, p1, p2))

    @jax.jit
    def run_chunk(pd1, pd2, pp1, pp2, acc0, chunk_id):
        # Every step consumes its own pool slice (index = step mod POOL,
        # a traced value — nothing is loop-invariant, nothing hoists) and
        # its own key (chunk id folded in); the accumulator chains chunks,
        # so the final host fetch is a true barrier for the whole chain.
        def body(carry, ks):
            i, acc = carry
            sl = i % POOL
            take = lambda pool: jax.lax.dynamic_index_in_dim(
                pool, sl, 0, keepdims=False
            )
            stat = per_step_mean(take(pd1), take(pd2), take(pp1), take(pp2), ks)
            return (i + 1, acc + stat), None

        keys = jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(0), chunk_id),
            (chunk_len, BATCH),
        )
        (_, acc), _ = jax.lax.scan(body, (jnp.int32(0), acc0), keys)
        return acc

    def run_chunks(k):
        acc = jnp.float32(0.0)
        for i in range(k):
            acc = run_chunk(pd1, pd2, pp1, pp2, acc, jnp.int32(i))
        return float(acc) / (k * chunk_len)

    _log("scan bench: compiling + first exec (1 chunk)...")
    run_chunks(1)  # compile + first exec
    _log("scan bench: compile done, timing k_short")

    k_short = 1
    t_short, _ = _fetch_timed(lambda: run_chunks(k_short))
    _log(f"scan bench: t_short={t_short:.2f}s, probing 4 chunks")
    # probe: estimate per-chunk time from a 4-chunk run, then pick k_long
    t_probe, _ = _fetch_timed(lambda: run_chunks(4), reps=1)
    per_chunk_est = max((t_probe - t_short) / 3.0, 1e-3)
    k_long = min(k_short + max(4, int(TARGET_GAP_S / per_chunk_est)), K_MAX)
    _log(f"scan bench: per_chunk≈{per_chunk_est:.3f}s → k_long={k_long}")
    t_long, stat = _fetch_timed(lambda: run_chunks(k_long))
    gap = t_long - t_short
    if gap < TARGET_GAP_S / 2 and k_long < K_MAX:
        # slope resolution too small — escalate once with the better estimate
        per_chunk = max(gap / (k_long - k_short), 1e-4)
        k_long = min(k_short + int(TARGET_GAP_S / per_chunk), K_MAX)
        _log(f"scan bench: gap {gap:.2f}s too small, escalating k_long={k_long}")
        t_long, stat = _fetch_timed(lambda: run_chunks(k_long))
        gap = t_long - t_short
    _log(f"scan bench: t_long={t_long:.2f}s gap={gap:.2f}s")
    if gap < NOISE_FLOOR_S:
        raise RuntimeError(
            f"slope gap {gap:.3f}s (k={k_short}->{k_long}) is below the "
            f"{NOISE_FLOOR_S}s noise floor — refusing to report a rate"
        )
    per_step = gap / ((k_long - k_short) * chunk_len)

    _log("scan bench: cost analysis")
    # Per-step FLOPs from an AOT compile of the step alone (scan-free):
    # XLA's cost_analysis counts a While/scan body ONCE, not ×trip_count
    # (measured here: the 64-step chunk reports ~1/64 of the true flops),
    # so lowering run_chunk and dividing by chunk_len undercounts ~64×.
    # The scan-free program has no loop to undercount.  (Iterative
    # sub-algorithms XLA itself expands to while loops — e.g. eigh sweeps —
    # are still counted once; the number is therefore a conservative floor
    # wherever those appear.)  Compiled strictly AFTER the jit
    # warmup/timing: on this backend, an AOT lower().compile() issued
    # BEFORE the first jit execution leaves the jit cache holding an
    # executable that runs ~10⁵× slower (measured 20.7 s vs 0.07 ms per
    # identical call); this AOT executable is never run.
    step_keys = jax.random.split(jax.random.PRNGKey(0), (BATCH,))
    step_flops = _cost_flops(
        jax.jit(per_step_mean).lower(
            pd1[0], pd2[0], pp1[0], pp2[0], step_keys
        ).compile()
    )
    return dict(
        steps_per_sec=1.0 / per_step,
        step_flops=step_flops,
        stat=stat,
        chunks=(k_short, k_long),
        chunk_len=chunk_len,
        gap_s=gap,  # measured device-seconds between the two chains — the
        # timing resolution backing steps_per_sec (fetch noise is ~±40 ms,
        # so gap_s ≫ 0.04 means the number is solid)
    )


def bench_tpu():
    """Sustained device throughput for match+RANSAC, chunk-fetch-synced."""
    import jax
    import jax.numpy as jnp

    from points_matching_tpu.core.config import MatcherConfig, RansacConfig
    from points_matching_tpu.core.types import Descriptors
    from points_matching_tpu.geometry.ransac import ransac_fundamental
    from points_matching_tpu.ops.matching import match_descriptors_points

    # compact=False: RANSAC is mask-aware, so the dense-prefix compaction
    # (a scalar-unit scatter, ~6 µs/pair) is skipped — the production
    # two-view configuration on TPU.
    mcfg = MatcherConfig(metric="l2", filter="ratio", ratio=RATIO,
                         compute_dtype=MATCH_DTYPE, compact=False)
    rcfg = RansacConfig(num_hypotheses=HYP)

    def per_pair(a, b, pa, pb, k):
        m = jnp.ones((NKP,), bool)
        # query side needs no gather (query-order matches); the train-side
        # point rides out of the fused matching kernel (r5 — the explicit
        # pb[train_idx] gather was ~3.3 µs/pair on the scalar path).
        matches, q2 = match_descriptors_points(
            Descriptors(data=a, mask=m), Descriptors(data=b, mask=m),
            pb, mcfg,
        )
        est = ransac_fundamental(k, pa, q2, matches.mask, rcfg)
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
        chunks=list(r["chunks"]),
        chunk_len=r["chunk_len"],
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
        chunks=list(r["chunks"]),
        gap_s=r["gap_s"],
        achieved_tflops=achieved,
        fraction_of_roofline=(achieved / peak) if achieved else None,
    )


def bench_ba(cameras=32, landmarks=2048):
    """BA LM iterations/sec (BASELINE metric 2), chunk-fetch-synced.

    Chunks of BA_CHUNK LM iterations per dispatch (rtol=0 disables
    early-exit so the count is exact); each chunk's output state feeds the
    next, so the final cost fetch syncs the whole chain.  Iters/s from the
    K_long−K_short slope — fetch intercept and per-dispatch overhead cancel
    (the old 1005-iteration single while_loop was the same crash class as
    the long scans; VERDICT r2 weak #6).
    """
    import jax

    from points_matching_tpu.ba.lm import bundle_adjust, make_ba_state
    from points_matching_tpu.core.config import BAConfig
    from points_matching_tpu.core.types import CameraIntrinsics
    from points_matching_tpu.data.synthetic import make_ba_problem

    BA_CHUNK = 25
    prob = make_ba_problem(
        jax.random.PRNGKey(1), num_cameras=cameras, num_landmarks=landmarks
    )
    K = CameraIntrinsics.from_matrix(prob["K"])
    state0 = make_ba_state(prob["poses"], prob["X"], prob["uv"], prob["mask"])
    cfg = BAConfig(max_iterations=BA_CHUNK, rtol=0.0)

    step = jax.jit(lambda s: bundle_adjust(s, K, cfg))

    # Per-LM-iteration FLOPs for the roofline fraction (VERDICT r3 item 4):
    # AOT cost analysis of a max_iterations=1 program — XLA counts the
    # while-body once, so this is ~one iteration (+ prologue; a
    # conservative ceiling on per-iter flops, hence a conservative floor
    # when dividing into the measured rate).  Compiled AFTER the jit warmup
    # (see _pool_scan_bench for the AOT-before-jit backend hazard) — the
    # executable is never run.
    cfg1 = BAConfig(max_iterations=1, rtol=0.0)

    def run_chunks(k):
        s = state0
        cost = None
        for _ in range(k):
            s, stats = step(s)
            cost = stats.final_cost
        return float(cost)

    _log("ba: compiling...")
    run_chunks(1)  # compile + first exec
    _log("ba: compile done")
    t_s, _ = _fetch_timed(lambda: run_chunks(1))
    t_probe, _ = _fetch_timed(lambda: run_chunks(3), reps=1)
    per_chunk = max((t_probe - t_s) / 2.0, 1e-3)
    k_long = min(1 + max(3, int(TARGET_GAP_S / per_chunk)), 400)
    _log(f"ba: t_s={t_s:.2f}s per_chunk≈{per_chunk:.3f}s k_long={k_long}")
    t_l, _ = _fetch_timed(lambda: run_chunks(k_long))
    gap = t_l - t_s
    if gap < NOISE_FLOOR_S:
        raise RuntimeError(
            f"BA slope gap {gap:.3f}s below the {NOISE_FLOOR_S}s noise floor"
        )
    per_iter = gap / ((k_long - 1) * BA_CHUNK)
    iter_flops = _cost_flops(
        jax.jit(lambda s: bundle_adjust(s, K, cfg1)).lower(state0).compile()
    )
    peak = max(_chip_peak_tflops(), _measured_peak_tflops())
    achieved = iter_flops / per_iter / 1e12 if iter_flops else None
    return dict(
        ba_iters_per_sec=1.0 / per_iter,
        cameras=cameras,
        landmarks=landmarks,
        chunk_iters=BA_CHUNK,
        chunks=[1, k_long],
        gap_s=gap,
        iter_flops=iter_flops,
        achieved_tflops=achieved,
        fraction_of_roofline=(achieved / peak) if achieved else None,
    )


def bench_ba_sparse(cameras=64, landmarks=16384, obs_per_landmark=8):
    """Sparse-engine BA iterations/sec at the WORKING size — the headline
    BA number (VERDICT r4 item 4: the dense 32cam×2048lm toy measures
    dispatch latency, not BA; the flagship problem class is the
    observation-list engine at 64 cam × 16k lm × 131k obs, sorted
    layout on TPU).  Chunked like bench_ba: BA_CHUNK LM iterations per
    bundle_adjust_sparse dispatch (rtol=0 — exact count; each call re-sorts
    once, which is the engine's real per-call cost), state chained so the
    final cost fetch syncs the chain; iters/s from the long−short slope.
    """
    import jax

    from points_matching_tpu.ba.sparse import (
        bundle_adjust_sparse, make_sparse_ba_state,
    )
    from points_matching_tpu.core.config import BAConfig
    from points_matching_tpu.core.types import CameraIntrinsics
    from points_matching_tpu.data.synthetic import make_sparse_ba_problem

    BA_CHUNK = 10
    prob = make_sparse_ba_problem(
        seed=1, num_cameras=cameras, num_landmarks=landmarks,
        obs_per_landmark=obs_per_landmark,
    )
    K = CameraIntrinsics.from_matrix(prob["K"])
    state0 = make_sparse_ba_state(
        prob["poses"], prob["X"], prob["cam_idx"], prob["lm_idx"],
        prob["uv"], prob["obs_mask"],
    )
    num_obs = int(state0.num_observations)
    cfg = BAConfig(max_iterations=BA_CHUNK, rtol=0.0, pcg_iterations=25)
    step = jax.jit(lambda s: bundle_adjust_sparse(s, K, cfg))

    def run_chunks(k):
        s = state0
        cost = None
        for _ in range(k):
            s, stats = step(s)
            cost = stats.final_cost
        return float(cost)

    _log("ba_sparse: compiling...")
    run_chunks(1)
    _log("ba_sparse: compile done")
    t_s, _ = _fetch_timed(lambda: run_chunks(1))
    t_probe, _ = _fetch_timed(lambda: run_chunks(3), reps=1)
    per_chunk = max((t_probe - t_s) / 2.0, 1e-3)
    k_long = min(1 + max(3, int(TARGET_GAP_S / per_chunk)), 400)
    _log(f"ba_sparse: t_s={t_s:.2f}s per_chunk≈{per_chunk:.3f}s "
         f"k_long={k_long}")
    t_l, _ = _fetch_timed(lambda: run_chunks(k_long))
    gap = t_l - t_s
    if gap < NOISE_FLOOR_S:
        raise RuntimeError(
            f"sparse-BA slope gap {gap:.3f}s below the {NOISE_FLOOR_S}s "
            "noise floor"
        )
    per_iter = gap / ((k_long - 1) * BA_CHUNK)
    cfg1 = BAConfig(max_iterations=1, rtol=0.0, pcg_iterations=25)
    iter_flops = _cost_flops(
        jax.jit(lambda s: bundle_adjust_sparse(s, K, cfg1))
        .lower(state0).compile()
    )
    peak = max(_chip_peak_tflops(), _measured_peak_tflops())
    achieved = iter_flops / per_iter / 1e12 if iter_flops else None
    return dict(
        ba_iters_per_sec=1.0 / per_iter,
        cameras=cameras,
        landmarks=landmarks,
        observations=num_obs,
        chunk_iters=BA_CHUNK,
        chunks=[1, k_long],
        gap_s=gap,
        iter_flops=iter_flops,
        achieved_tflops=achieved,
        fraction_of_roofline=(achieved / peak) if achieved else None,
    )


def bench_e2e_pipeline(height=660, width=993, n_imgs=8):
    """Full IMAGE→F two-view pipeline — the reference's actual program
    (decode aside): Hessian detect (512 kp) → SURF-class describe → ratio
    match → batched RANSAC F, on reference-sized images (993×660).

    New in r5: the frontend was never benched (the head section consumes
    precomputed descriptors) and hid a 237 ms/image detector; after the
    shift-FMA conv + block-top-k + lattice-shared-Haar + packed-corner
    rewrites the chain measured ~27 ms/pair, and ~15 ms/pair after the
    strided-reduce_window/per-winner-gather/per-scale-top-k restructure
    (DETECT_SLICES_r05_after).  Methodology: a scanned
    chain of dependent pipeline calls per dispatch, slope-timed like the
    other sections.
    """
    import dataclasses

    import jax
    import jax.numpy as jnp
    from jax import lax

    from points_matching_tpu.core.config import (
        MatcherConfig, RansacConfig, surf_parity_config,
    )
    from points_matching_tpu.pipelines.two_view import two_view_pipeline

    base = surf_parity_config()
    cfg = dataclasses.replace(
        base,
        matcher=MatcherConfig(metric="l2", filter="ratio", ratio=0.85),
        ransac=RansacConfig(),
        use_ransac=True,
    )
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(
        128.0 + 40.0 * rng.randn(n_imgs, height, width).astype(np.float32)
    )
    CH = 8

    @jax.jit
    def run_chunk(imgs, acc0, cid):
        def body(carry, i):
            acc = carry
            a = imgs[i % n_imgs] + acc * 1e-12
            b = imgs[(i + 1) % n_imgs]
            k = jax.random.fold_in(jax.random.PRNGKey(0), cid * CH + i)
            r = two_view_pipeline(a, b, k, cfg)
            return acc + r.estimate.num_inliers.astype(jnp.float32) * 1e-6, None

        acc, _ = lax.scan(body, acc0, jnp.arange(CH), length=CH)
        return acc

    def run(k):
        acc = jnp.float32(0.0)
        for i in range(k):
            acc = run_chunk(imgs, acc, jnp.int32(i))
        return float(acc)

    _log("e2e: compiling...")
    run(1)
    _log("e2e: compile done")
    t_s, _ = _fetch_timed(lambda: run(1))
    t_probe, _ = _fetch_timed(lambda: run(3), reps=1)
    per_chunk = max((t_probe - t_s) / 2.0, 1e-3)
    k_long = min(1 + max(3, int(TARGET_GAP_S / per_chunk)), 400)
    t_l, _ = _fetch_timed(lambda: run(k_long))
    gap = t_l - t_s
    if gap < NOISE_FLOOR_S:
        raise RuntimeError(f"e2e slope gap {gap:.3f}s below the noise floor")
    pairs_per_sec = (k_long - 1) * CH / gap
    return dict(
        pairs_per_sec=pairs_per_sec,
        ms_per_pair=1e3 / pairs_per_sec,
        image=f"{width}x{height}",
        keypoints=512,
        chunks=[1, k_long],
        gap_s=gap,
    )


def bench_all_pairs(n_img=1024, nkp=256, dim=64):
    """BASELINE config 1 scale: all-pairs matching over a 1k-image set.

    Tiled: each dispatch scores a [TILE, n_img] block of the pair matrix
    (GEMM + top-2 + ratio per pair), accumulator-chained.  Reports
    pairs/sec over the full n_img² sweep (the ring-sharded multi-chip
    version of this sweep is validated on the faked mesh by
    tests/test_parallel.py; one chip executes the same tiles serially).
    """
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(3)
    base = rng.randn(n_img, nkp, dim).astype(np.float32)
    base /= np.linalg.norm(base, axis=-1, keepdims=True)
    desc = jnp.asarray(base)

    TILE = 8  # query images per dispatch → TILE*n_img pairs per dispatch

    @jax.jit
    def tile_block(desc, q0, acc0):
        dq = jax.lax.dynamic_slice_in_dim(desc, q0, TILE, axis=0)
        dqb = dq.astype(jnp.bfloat16)
        db = desc.astype(jnp.bfloat16)

        def one_query(dquery):
            # [n_img, nkp_q, nkp_t] distances via one batched GEMM
            sim = jnp.einsum("qd,ntd->nqt", dquery, db,
                             preferred_element_type=jnp.float32)
            d2 = jnp.maximum(2.0 - 2.0 * sim, 0.0)
            # argmin-based top-2 (lax.top_k = bitonic sort on TPU; this is
            # three O(N) passes — same as parallel/all_pairs.py)
            best = jnp.min(d2, axis=-1)
            i1 = jnp.argmin(d2, axis=-1)
            masked = jnp.where(
                jnp.arange(d2.shape[-1]) == i1[..., None], 1e30, d2
            )
            second = jnp.min(masked, axis=-1)
            good = best < (RATIO**2) * second
            return jnp.sum(good.astype(jnp.float32), axis=-1)  # [n]

        scores = jax.vmap(one_query)(dqb)  # [TILE, n_img]
        return acc0 + jnp.sum(scores) * 1e-6

    def run_tiles(k):
        acc = jnp.float32(0.0)
        for i in range(k):
            q0 = (i * TILE) % (n_img - TILE + 1)
            acc = tile_block(desc, jnp.int32(q0), acc)
        return float(acc)

    _log("all_pairs: compiling...")
    run_tiles(1)
    t_s, _ = _fetch_timed(lambda: run_tiles(1))
    t_probe, _ = _fetch_timed(lambda: run_tiles(4), reps=1)
    per_tile = max((t_probe - t_s) / 3.0, 1e-4)
    k_long = min(1 + max(4, int(TARGET_GAP_S / per_tile)), K_MAX)
    _log(f"all_pairs: t_s={t_s:.2f}s per_tile≈{per_tile:.4f}s k_long={k_long}")
    t_l, _ = _fetch_timed(lambda: run_tiles(k_long))
    gap = t_l - t_s
    if gap < NOISE_FLOOR_S:
        raise RuntimeError(
            f"all-pairs slope gap {gap:.3f}s below the noise floor"
        )
    pairs_per_sec = (k_long - 1) * TILE * n_img / gap
    full_sweep_s = (n_img * n_img) / pairs_per_sec
    return dict(
        n_images=n_img,
        keypoints=nkp,
        pairs_per_sec=pairs_per_sec,
        full_sweep_seconds=full_sweep_s,
        chunks=[1, k_long],
        gap_s=gap,
    )


def _make_sfm_sequence(num_frames, n_feat=256, d_dim=32):
    """Shared synthetic tracked sequence for the SfM sections (ours and the
    OpenCV host-CPU baseline time the SAME workload).  Returns
    (frames [(xy, desc, valid_mask, gt_landmark_idx)], fx, (w, h))."""
    from points_matching_tpu.geometry.se3 import so3_exp
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    w, h, fx = 640, 480, 500.0
    num_landmarks = 600
    X = rng.uniform([-6, -3, 6], [10, 3, 14], (num_landmarks, 3)).astype(np.float32)
    desc_gt = rng.randn(num_landmarks, d_dim).astype(np.float32)
    desc_gt /= np.linalg.norm(desc_gt, axis=-1, keepdims=True)
    frames = []
    for i in range(num_frames):
        R = np.asarray(so3_exp(jnp.asarray([0.0, 0.01 * i, 0.0])), np.float32)
        t = np.asarray([-0.12 * i, 0.0, 0.0], np.float32)
        Xc = X @ R.T + t
        uv = Xc[:, :2] / Xc[:, 2:3] * fx + np.asarray([w / 2, h / 2])
        vis = (Xc[:, 2] > 0.5) & (uv[:, 0] >= 0) & (uv[:, 0] < w) & \
              (uv[:, 1] >= 0) & (uv[:, 1] < h)
        idx = np.nonzero(vis)[0]
        rng.shuffle(idx)
        idx = idx[:n_feat]
        k = len(idx)
        xy = np.zeros((n_feat, 2), np.float32)
        dd = np.zeros((n_feat, d_dim), np.float32)
        mm = np.zeros((n_feat,), bool)
        gi = np.full((n_feat,), -1, np.int64)
        xy[:k] = uv[idx] + 0.3 * rng.randn(k, 2)
        d = desc_gt[idx] + 0.05 * rng.randn(k, d_dim).astype(np.float32)
        dd[:k] = d / np.linalg.norm(d, axis=-1, keepdims=True)
        mm[:k] = True
        gi[:k] = idx
        frames.append((xy, dd, mm, gi))
    return frames, fx, (w, h)


def bench_sfm_frames(num_frames=64, chunk_size=16):
    """Incremental-SfM frames/sec through the chunked device loop
    (pipelines/sfm.py register_frames_chunk — VERDICT r2 item 5 asked for
    this measured).  Synthetic tracked sequence; the rate is the marginal
    per-chunk slope so compile and bootstrap costs cancel."""
    import jax
    import jax.numpy as jnp

    from points_matching_tpu.core.config import (
        MatcherConfig, RansacConfig, SfMConfig, TwoViewConfig,
    )
    from points_matching_tpu.core.types import CameraIntrinsics

    n_feat, d_dim = 256, 32
    np_frames, fx, (w, h) = _make_sfm_sequence(num_frames, n_feat, d_dim)
    K = CameraIntrinsics(fx=jnp.float32(fx), fy=jnp.float32(fx),
                         cx=jnp.float32(w / 2), cy=jnp.float32(h / 2))
    frames = [
        (jnp.asarray(xy), jnp.asarray(dd), jnp.asarray(mm))
        for xy, dd, mm, _ in np_frames
    ]

    from points_matching_tpu.pipelines.sfm import (
        bootstrap_two_view, init_sfm_state, register_frames_chunk,
    )

    cfg = SfMConfig(
        two_view=TwoViewConfig(
            matcher=MatcherConfig(metric="l2", filter="ratio", ratio=0.8),
            ransac=RansacConfig(num_hypotheses=256, inlier_threshold=2.0),
        ),
        max_cameras=128, max_landmarks=4096, max_observations=32768,
        pnp_min_inliers=12,
    )

    key = jax.random.PRNGKey(0)
    key, k0 = jax.random.split(key)
    state0, _ = bootstrap_two_view(
        init_sfm_state(cfg, n_feat, d_dim),
        frames[0][0], frames[0][1], frames[0][2],
        frames[1][0], frames[1][1], frames[1][2], K, k0, cfg,
    )
    rest = frames[2:]
    xy = jnp.stack([f[0] for f in rest])
    dd = jnp.stack([f[1] for f in rest])
    mm = jnp.stack([f[2] for f in rest])

    def run_chunks(k):
        st = state0
        reg = None
        kk = jax.random.PRNGKey(1)
        for i in range(k):
            c0 = (i * chunk_size) % (len(rest) - chunk_size + 1)
            idx = jnp.arange(c0 + 2, c0 + 2 + chunk_size, dtype=jnp.int32)
            kk, kc = jax.random.split(kk)
            st, sts = register_frames_chunk(
                st, xy[c0:c0 + chunk_size], dd[c0:c0 + chunk_size],
                mm[c0:c0 + chunk_size], idx, K, kc, cfg, 4,
                cfg.local_ba_window,
            )
            reg = sts.num_pnp_inliers
        return float(jnp.sum(reg))

    _log("sfm: compiling...")
    run_chunks(1)
    _log("sfm: compile done")
    t_s, _ = _fetch_timed(lambda: run_chunks(1))
    t_probe, _ = _fetch_timed(lambda: run_chunks(2), reps=1)
    per_chunk = max(t_probe - t_s, 1e-3)
    k_long = min(1 + max(2, int(TARGET_GAP_S / per_chunk)), 200)
    _log(f"sfm: t_s={t_s:.2f}s per_chunk≈{per_chunk:.3f}s k_long={k_long}")
    t_l, _ = _fetch_timed(lambda: run_chunks(k_long))
    gap = t_l - t_s
    if gap < NOISE_FLOOR_S:
        raise RuntimeError(
            f"SfM slope gap {gap:.3f}s below the noise floor"
        )
    frames_per_sec = (k_long - 1) * chunk_size / gap
    return dict(
        frames_per_sec=frames_per_sec,
        chunk_size=chunk_size,
        chunks=[1, k_long],
        gap_s=gap,
    )


def bench_scaling():
    """Capture benchmarks/scaling.py efficiency lines on a faked 8-device
    CPU mesh (subprocess so XLA_FLAGS apply cleanly).  Validates the
    sharded paths and bounds communication overhead; it is NOT hardware
    scaling (single host, shared cores).  CPU jax synchronizes correctly,
    so these timings need no fetch tricks."""
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "benchmarks", "scaling.py")
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
                       "efficiency_vs_1dev", "reps",
                       "step_ms_min_med_max", "efficiency_min_med_max",
                       "host_physical_cores", "physical_efficiency_cap")
                      if k in rec})
    if not lines:
        raise RuntimeError(
            f"scaling.py produced no JSON (rc={proc.returncode}): "
            + proc.stderr[-300:]
        )
    return lines


def bench_opencv_sfm(num_frames=64):
    """OpenCV host-CPU incremental SfM on the SAME synthetic tracked
    sequence bench_sfm_frames times (VERDICT r3 item 7: 4.31 f/s had no
    baseline).  Per frame: BFMatcher knnMatch against the landmark bank +
    ratio gate, solvePnPRansac, match vs previous frame +
    triangulatePoints for new landmarks.  NOTE the scope asymmetry favors
    OpenCV: our pipeline additionally runs windowed local BA every frame
    chunk; this loop runs none."""
    import cv2

    frames, fx, (w, h) = _make_sfm_sequence(num_frames)
    Km = np.array([[fx, 0, w / 2], [0, fx, h / 2], [0, 0, 1]], np.float32)
    bf = cv2.BFMatcher(cv2.NORM_L2)
    RATIO_SFM = 0.8

    def ratio_matches(d_query, d_train):
        knn = bf.knnMatch(d_query, d_train, k=2)
        return [m for m, n in knn
                if m.distance < RATIO_SFM * max(n.distance, 1e-12)]

    BOOT = 4  # bootstrap baseline frames[0]→frames[4]: at the sequence's
    # 0.12/frame step the 1-frame baseline gives recoverPose ~4 cheirality
    # inliers (0.7° triangulation angles vs 0.3 px noise); 4 frames is the
    # classic keyframe-gap workaround

    def run_once():
        # bootstrap: E + recoverPose + triangulate over the BOOT baseline
        xy0, dd0, mm0, _ = frames[0]
        xy1, dd1, mm1, _ = frames[BOOT]
        good = ratio_matches(dd0[mm0], dd1[mm1])
        q0 = np.float32([xy0[mm0][m.queryIdx] for m in good])
        q1 = np.float32([xy1[mm1][m.trainIdx] for m in good])
        E, inl = cv2.findEssentialMat(q0, q1, Km, cv2.RANSAC, 0.999, 1.5)
        _, R, t, pose_inl = cv2.recoverPose(E, q0, q1, Km)
        P0 = Km @ np.hstack([np.eye(3), np.zeros((3, 1))]).astype(np.float32)
        P1 = Km @ np.hstack([R, t]).astype(np.float32)
        X4 = cv2.triangulatePoints(P0, P1, q0.T, q1.T)
        X = (X4[:3] / np.maximum(np.abs(X4[3:4]), 1e-12) *
             np.sign(X4[3:4])).T.astype(np.float32)
        keep = np.asarray(pose_inl)[:, 0] > 0
        bank_X = X[keep]
        bank_d = np.float32([dd1[mm1][m.trainIdx] for m in good])[keep]
        # lagged keyframe ring: triangulating vs the immediately previous
        # frame reuses the degenerate 1-frame baseline and poisons the bank
        recent = [(xy1[mm1], dd1[mm1], P1)]

        n_reg = 0
        t0 = time.perf_counter()
        for xy, dd, mm, _ in frames[BOOT + 1:]:
            fxy, fdd = xy[mm], dd[mm]
            # 2D-3D: match frame descriptors against the landmark bank
            good = ratio_matches(fdd, bank_d)
            if len(good) >= 6:
                obj = np.float32([bank_X[m.trainIdx] for m in good])
                img = np.float32([fxy[m.queryIdx] for m in good])
                ok, rvec, tvec, inl = cv2.solvePnPRansac(
                    obj, img, Km, None, iterationsCount=256,
                    reprojectionError=2.0, flags=cv2.SOLVEPNP_EPNP)
                if ok:
                    n_reg += 1
                    R, _ = cv2.Rodrigues(rvec)
                    P = Km @ np.hstack([R, tvec]).astype(np.float32)
                    # grow the map: triangulate vs the OLDEST recent
                    # keyframe (≈BOOT-frame baseline)
                    pxy, pdd, Pprev = recent[0]
                    g2 = ratio_matches(fdd, pdd)
                    if len(g2) >= 8:
                        a = np.float32([pxy[m.trainIdx] for m in g2])
                        b = np.float32([fxy[m.queryIdx] for m in g2])
                        X4 = cv2.triangulatePoints(Pprev, P, a.T, b.T)
                        Xn = (X4[:3] / np.maximum(np.abs(X4[3:4]), 1e-12) *
                              np.sign(X4[3:4])).T.astype(np.float32)
                        dn = np.float32([fdd[m.queryIdx] for m in g2])
                        # cheirality + reprojection gate before banking
                        Xh = np.hstack([Xn, np.ones((len(Xn), 1), np.float32)])
                        ok_pt = np.ones(len(Xn), bool)
                        for Pv, uv in ((Pprev, a), (P, b)):
                            pc = Xh @ Pv.T
                            z = pc[:, 2]
                            pr = pc[:, :2] / np.maximum(z[:, None], 1e-9)
                            err = np.linalg.norm(pr - uv, axis=-1)
                            ok_pt &= (z > 0.1) & (err < 2.0)
                        bank_X = np.vstack([bank_X, Xn[ok_pt]])[-4096:]
                        bank_d = np.vstack([bank_d, dn[ok_pt]])[-4096:]
                    recent.append((fxy, fdd, P))
                    recent = recent[-BOOT:]
        dt = time.perf_counter() - t0
        return (num_frames - BOOT - 1) / dt, n_reg

    # median-of-5 (VERDICT r4 item 7: single draws wobbled ±15-30% between
    # runs, making sfm_vs_opencv noisy); first run is warmup-included, so
    # one extra run precedes the 5 scored ones.
    run_once()
    runs = []
    n_reg = 0
    for _ in range(5):
        fps, n_reg = run_once()
        runs.append(round(fps, 2))
    return dict(
        frames_per_sec=float(np.median(runs)),
        runs_min_med_max=[min(runs), float(np.median(runs)), max(runs)],
        frames_registered=n_reg,
        num_frames=num_frames - BOOT - 1,
        note="no local BA (ours runs windowed BA per chunk)",
    )


def bench_opencv(n_pairs=8):
    """The reference's stack (OpenCV BFMatcher + RANSAC F) on host CPU.
    Median-of-5 (VERDICT r4 item 7: the single-draw baseline wobbled
    143-192 pairs/s across runs, putting ±15% noise on vs_baseline)."""
    import cv2

    d1, d2, p1, p2 = _make_workload(n_pairs, seed=1)
    bf = cv2.BFMatcher(cv2.NORM_L2)

    def run_once():
        t0 = time.perf_counter()
        for i in range(n_pairs):
            knn = bf.knnMatch(d1[i], d2[i], k=2)
            good = [m for m, n in knn if m.distance < RATIO * n.distance]
            if len(good) >= 8:
                q1 = np.float32([p1[i][m.queryIdx] for m in good])
                q2 = np.float32([p2[i][m.trainIdx] for m in good])
                cv2.findFundamentalMat(q1, q2, cv2.FM_RANSAC, 1.5, 0.999, HYP)
        return n_pairs / (time.perf_counter() - t0)

    run_once()  # warmup (allocators, cv2 thread pools)
    runs = [round(run_once(), 1) for _ in range(5)]
    return dict(
        pairs_per_sec=float(np.median(runs)),
        runs_min_med_max=[min(runs), float(np.median(runs)), max(runs)],
    )


_SECTIONS = {
    "head": lambda: bench_tpu(),
    "matching_only": lambda: bench_matching_only(),
    "ba": lambda: bench_ba(),
    "ba_sparse": lambda: bench_ba_sparse(),
    "e2e": lambda: bench_e2e_pipeline(),
    "all_pairs": lambda: bench_all_pairs(),
    "sfm": lambda: bench_sfm_frames(),
    "scaling": lambda: bench_scaling(),
    "opencv": lambda: bench_opencv(),
    "opencv_sfm": lambda: bench_opencv_sfm(),
}


def run_one_section(name):
    """Child-process entry: run one section, print its JSON as the LAST
    stdout line (progress goes to stderr)."""
    _log(f"section {name}: start")
    out = _SECTIONS[name]()
    _log(f"section {name}: done")
    print(json.dumps({"section": name, "result": out}), flush=True)


def main():
    """Orchestrator: each section in its own subprocess under a hard
    timeout (see module docstring — hangs and worker crashes must not
    nullify the other sections)."""
    sections = {}
    errors = {}
    me = os.path.abspath(__file__)

    for name in _SECTIONS:
        budget = SECTION_TIMEOUT_S[name]
        _log(f"=== section {name} (timeout {budget}s) ===")
        try:
            proc = subprocess.run(
                [sys.executable, me, "--section", name],
                capture_output=True, text=True, timeout=budget,
            )
            for ln in proc.stderr.splitlines()[-12:]:
                print(f"  | {ln}", file=sys.stderr, flush=True)
            rec = None
            for ln in proc.stdout.splitlines():
                try:
                    cand = json.loads(ln)
                except json.JSONDecodeError:
                    continue
                if isinstance(cand, dict) and cand.get("section") == name:
                    rec = cand
            if rec is None:
                tail = (proc.stderr or "")[-300:].replace("\n", " | ")
                errors[name] = f"rc={proc.returncode}: {tail}"
                sections[name] = None
            else:
                sections[name] = rec["result"]
        except subprocess.TimeoutExpired:
            errors[name] = f"hang: section exceeded {budget}s wall clock"
            sections[name] = None
        except Exception as e:
            errors[name] = f"{type(e).__name__}: {e}"[:300]
            traceback.print_exc(file=sys.stderr)
            sections[name] = None

    head = sections.get("head") or {}
    match_only = sections.get("matching_only") or {}
    ba = sections.get("ba") or {}
    ba_sp = sections.get("ba_sparse") or {}
    baseline = (sections.get("opencv") or {}).get("pairs_per_sec")
    vs = (
        head.get("pairs_per_sec", 0) / baseline
        if (baseline and head.get("pairs_per_sec")) else None
    )
    rnd = lambda v, p=2: None if v is None else round(v, p)
    result = {
        "metric": "two_view_match_ransac_throughput",
        "value": rnd(head.get("pairs_per_sec")),
        "unit": "pairs/sec/chip",
        "vs_baseline": rnd(vs),
        "bench_version": BENCH_VERSION,
        "errors": errors or None,
        "detail": {
            "batch": BATCH,
            "keypoints": NKP,
            "descriptor_dim": DIM,
            "ransac_hypotheses": HYP,
            "data_pool_slices": POOL,
            "safe_chunk_steps": SAFE_CHUNK,
            "chunks": head.get("chunks"),
            "matcher_dtype": MATCH_DTYPE,
            "sync": "chained-chunk dispatches + dependent-scalar fetch "
                    "(block_until_ready is a no-op on this backend; single "
                    "scans >64 steps of this program kill the worker — see "
                    "module docstring)",
            "mean_inliers": rnd(head.get("mean_inliers"), 1),
            "step_us": rnd(head.get("step_us"), 1),
            "timing_gap_s": rnd(head.get("gap_s"), 3),
            "achieved_tflops": rnd(head.get("achieved_tflops"), 3),
            "peak_tflops": rnd(head.get("peak_tflops"), 1),
            "fraction_of_roofline": rnd(head.get("fraction_of_roofline"), 4),
            "matching_only": {
                "pairs_per_sec": rnd(match_only.get("pairs_per_sec")),
                "timing_gap_s": rnd(match_only.get("gap_s"), 3),
                "achieved_tflops": rnd(match_only.get("achieved_tflops"), 3),
                "fraction_of_roofline": rnd(
                    match_only.get("fraction_of_roofline"), 4
                ),
            } if match_only else None,
            # PRIMARY BA line (VERDICT r4 item 4): the sparse engine at the
            # working size, on-chip.  The dense toy is the secondary line.
            "ba_iters_per_sec": rnd(ba_sp.get("ba_iters_per_sec"), 1),
            "ba_problem": (
                f"{ba_sp['cameras']}cam x {ba_sp['landmarks']}lm x "
                f"{ba_sp['observations']}obs sparse(sorted)"
                if ba_sp else None
            ),
            "ba_gap_s": rnd(ba_sp.get("gap_s"), 3),
            "ba_iter_flops": ba_sp.get("iter_flops"),
            "ba_achieved_tflops": rnd(ba_sp.get("achieved_tflops"), 3),
            "ba_fraction_of_roofline": rnd(
                ba_sp.get("fraction_of_roofline"), 5
            ),
            "ba_dense_toy": {
                "ba_iters_per_sec": rnd(ba.get("ba_iters_per_sec"), 1),
                "problem": (
                    f"{ba['cameras']}cam x {ba['landmarks']}lm dense"
                    if ba else None
                ),
                "gap_s": rnd(ba.get("gap_s"), 3),
                "iter_flops": ba.get("iter_flops"),
                "fraction_of_roofline": rnd(
                    ba.get("fraction_of_roofline"), 5
                ),
            } if ba else None,
            "e2e_image_to_F": sections.get("e2e") and {
                k: rnd(v, 2) if isinstance(v, float) else v
                for k, v in sections["e2e"].items()
            },
            "all_pairs_1k": sections.get("all_pairs") and {
                k: rnd(v, 3) if isinstance(v, float) else v
                for k, v in sections["all_pairs"].items()
            },
            "sfm_frames_per_sec": rnd(
                (sections.get("sfm") or {}).get("frames_per_sec"), 2
            ),
            "sfm_gap_s": rnd((sections.get("sfm") or {}).get("gap_s"), 3),
            "opencv_sfm": sections.get("opencv_sfm") and {
                k: rnd(v, 2) if isinstance(v, float) else v
                for k, v in sections["opencv_sfm"].items()
            },
            "sfm_vs_opencv": rnd(
                (sections.get("sfm") or {}).get("frames_per_sec", 0)
                / sections["opencv_sfm"]["frames_per_sec"]
                if (sections.get("opencv_sfm") or {}).get("frames_per_sec")
                and (sections.get("sfm") or {}).get("frames_per_sec")
                else None, 2
            ),
            "scaling_fake_cpu_mesh": sections.get("scaling"),
            "opencv_cpu_pairs_per_sec": rnd(baseline),
            "opencv_cpu_runs_min_med_max": (
                (sections.get("opencv") or {}).get("runs_min_med_max")
            ),
        },
    }
    # The full record goes to a side file; stdout gets ONE SHORT line.
    # (VERDICT r3 weak #5 / item 8: the r3 driver captured only the tail of
    # the long JSON line, so the headline never parsed.  The final line
    # must be short and self-contained.)
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    try:
        with open(detail_path, "w") as f:
            json.dump(result, f, indent=1)
    except Exception as e:  # unwritable repo dir must not kill the line
        result["errors"] = dict(result["errors"] or {}, detail_file=str(e))
    short = {k: result[k] for k in
             ("metric", "value", "unit", "vs_baseline", "bench_version")}
    short["errors"] = (
        sorted(result["errors"]) if result["errors"] else None
    )
    short["detail_file"] = "BENCH_DETAIL.json"
    short["fraction_of_roofline"] = result["detail"]["fraction_of_roofline"]
    print(json.dumps(short))


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--section":
        run_one_section(sys.argv[2])
    else:
        main()
