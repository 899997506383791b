#!/usr/bin/env python
"""Cumulative-slice probe of the match+RANSAC step at bench shapes —
chunked fetch-synced slope timing per slice (bench.py methodology).

Slices (cumulative):
  match     - match_descriptors only (NOTE: the compaction scatter inside
              match_descriptors is dead code in this slice — only the mask
              is consumed — so 'match' under-reports the production
              matcher; 'gather' is the first slice that pays it)
  gather    - + matched-point gathers (makes query/train_idx live)
  sample    - + sample_index_sets + minimal-set gathers
  solve     - + batched 8-point over hypotheses (production backend gate)
  score     - + Sampson scoring + argmax
  refit     - + 2 refit rounds (= production ransac_fundamental)

Usage: python ransac_slices.py [slice ...]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

BATCH, NKP, DIM, HYP, POOL, RATIO = 64, 512, 64, 512, 16, 0.85
CHUNK = 64
TARGET_GAP_S = 3.0


def main():
    slices = sys.argv[1:] or [
        "match", "gather", "sample", "solve", "fscore", "score", "refit"]

    import jax
    import jax.numpy as jnp

    from points_matching_tpu.core.config import MatcherConfig, RansacConfig
    from points_matching_tpu.core.types import Descriptors
    from points_matching_tpu.geometry.fundamental import (
        eight_point, sampson_distance)
    from points_matching_tpu.geometry.ransac import (
        _use_pallas_solve, ransac_fundamental, sample_minimal_points)
    from points_matching_tpu.ops.matching import match_descriptors
    from points_matching_tpu.ops.pallas.eightpoint_kernel import (
        minimal_eight_point)

    # the solve slice times whatever the production config would run
    # (PMT_PROBE_SOLVER=xla|pallas overrides)
    solver_kind = os.environ.get("PMT_PROBE_SOLVER", "")
    if not solver_kind:
        solver_kind = (
            "pallas" if _use_pallas_solve(RansacConfig(), 8) else "xla"
        )
    solve_fn = minimal_eight_point if solver_kind == "pallas" else eight_point
    print(f"# solve slice uses {solver_kind}", file=sys.stderr, flush=True)

    rng = np.random.RandomState(0)
    d1 = rng.randn(POOL * BATCH, NKP, DIM).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    d2 = d1 + 0.1 * rng.randn(*d1.shape).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    p1 = rng.uniform(0, 640, (POOL * BATCH, NKP, 2)).astype(np.float32)
    p2 = p1 + rng.randn(POOL * BATCH, NKP, 2).astype(np.float32)
    sh = lambda x: jnp.asarray(x.reshape(POOL, BATCH, *x.shape[1:]))
    pd1, pd2, pp1, pp2 = sh(d1), sh(d2), sh(p1), sh(p2)

    mcfg = MatcherConfig(metric="l2", filter="ratio", ratio=RATIO,
                         compute_dtype="bf16", compact=False)
    rcfg = RansacConfig(
        num_hypotheses=HYP,
        backend=os.environ.get("PMT_PROBE_BACKEND", "auto"),
    )
    mask1 = jnp.ones((NKP,), bool)

    def do_match(a, b):
        return match_descriptors(
            Descriptors(data=a, mask=mask1), Descriptors(data=b, mask=mask1),
            mcfg)

    from points_matching_tpu.ops.matching import match_descriptors_points
    from points_matching_tpu.core.types import Descriptors as _D

    def upto(stage):
        def per_pair(a, b, pa, pb, k):
            if stage == "match":
                m = do_match(a, b)
                return jnp.sum(m.mask.astype(jnp.float32))
            # query side is gather-free (query-order matches); train-side
            # point rides out of the fused matching kernel
            # (match_descriptors_points, r5 — the explicit pb[train_idx]
            # gather was ~3.3 µs/pair on the scalar path).
            m, q2 = match_descriptors_points(
                _D(data=a, mask=mask1), _D(data=b, mask=mask1), pb, mcfg)
            q1 = pa
            if stage == "gather":
                return jnp.sum(q1) * 1e-6 + jnp.sum(q2) * 1e-6
            sp1, sp2 = sample_minimal_points(k, m.mask, HYP, 8, (q1, q2))
            if stage == "sample":
                return jnp.sum(sp1) * 1e-6
            F_h = solve_fn(sp1, sp2)
            if stage == "solve":
                return jnp.sum(F_h) * 1e-3
            if stage == "fscore":
                # PRODUCTION scoring path (r5, VERDICT item 8): the fused
                # Pallas counts kernel + best-F Sampson mask, no refit.
                from points_matching_tpu.ops.pallas.ransac_kernel import (
                    ransac_score_hypotheses)
                counts = ransac_score_hypotheses(
                    F_h, q1, q2, m.mask, rcfg.inlier_threshold,
                    exact=(rcfg.score_mode == "exact"))
                best = jnp.argmax(counts)
                d_best = sampson_distance(F_h[best], q1, q2)
                inl = jnp.logical_and(
                    d_best < rcfg.inlier_threshold**2, m.mask)
                return jnp.sum(inl.astype(jnp.float32))
            d = sampson_distance(F_h, q1[None], q2[None])
            inl = jnp.logical_and(d < rcfg.inlier_threshold**2, m.mask[None])
            counts = jnp.sum(inl.astype(jnp.int32), axis=-1)
            if stage == "score":
                return jnp.max(counts).astype(jnp.float32)
            est = ransac_fundamental(k, q1, q2, m.mask, rcfg)
            return est.num_inliers.astype(jnp.float32)

        def step(a, b, pa, pb, ks):
            return jnp.sum(jax.vmap(per_pair)(a, b, pa, pb, ks))

        return step

    for name in slices:
        per_step = upto(name)

        @jax.jit
        def run_chunk(pd1, pd2, pp1, pp2, acc0, cid):
            # pools are ARGUMENTS, not closure captures: captured arrays are
            # baked into the HLO as literals, and this backend ships the
            # program to a remote compile service that rejects large bodies
            # (HTTP 413).
            def body(carry, ks):
                i, acc = carry
                sl = i % POOL
                take = lambda p: jax.lax.dynamic_index_in_dim(
                    p, sl, 0, keepdims=False)
                s = per_step(take(pd1), take(pd2), take(pp1), take(pp2), ks)
                return (i + 1, acc + s * 1e-6), None

            keys = jax.random.split(
                jax.random.fold_in(jax.random.PRNGKey(0), cid), (CHUNK, BATCH))
            (_, acc), _ = jax.lax.scan(body, (jnp.int32(0), acc0), keys)
            return acc

        def run(k):
            acc = jnp.float32(0.0)
            for i in range(k):
                acc = run_chunk(pd1, pd2, pp1, pp2, acc, jnp.int32(i))
            return float(acc)

        try:
            t0 = time.time(); run(1); compile_s = time.time() - t0
        except Exception as e:
            print(json.dumps(dict(slice=name,
                                  error=f"{type(e).__name__}: {e}"[:200])),
                  flush=True)
            continue
        best_s = float("inf")
        for _ in range(3):
            t0 = time.time(); run(1); best_s = min(best_s, time.time() - t0)
        t0 = time.time(); run(3)
        per_chunk = max((time.time() - t0 - best_s) / 2.0, 1e-3)
        k_long = 1 + max(3, int(TARGET_GAP_S / per_chunk))
        best_l = float("inf")
        for _ in range(2):
            t0 = time.time(); run(k_long); best_l = min(best_l, time.time() - t0)
        gap = best_l - best_s
        pps = (k_long - 1) * CHUNK * BATCH / gap
        print(json.dumps(dict(
            slice=name, pairs_per_sec=round(pps),
            us_per_pair=round(1e6 / pps, 1), gap_s=round(gap, 3),
            compile_s=round(compile_s, 1))), flush=True)


if __name__ == "__main__":
    main()
