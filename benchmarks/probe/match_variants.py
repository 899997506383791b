#!/usr/bin/env python
"""Matching micro-variant probe: where do the per-pair microseconds go?

Times cumulative slices of the production matcher (the N3 replacement,
`ops/matching.py`) at bench shapes with the chunked fetch-synced slope
method (bench.py methodology — block_until_ready is a no-op here):

  gemm        - bf16 distance GEMM only ([B,512,64]x[B,512,64]->[B,512,512])
  topk        - GEMM + lax.top_k(k=2)            (old path: bitonic sort)
  argmin2     - GEMM + double-argmin top-2       (new path: two VPU passes)
  full        - match_descriptors (ratio filter + cumsum-scatter compaction)
  pallas      - fused Pallas distance+top-2 kernel (backend='pallas')

Usage: python match_variants.py [variant ...]   (default: all)
Prints one JSON line per variant: {variant, pairs_per_sec, us_per_pair, gap_s}.
"""
import json
import os
import sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
import sys
import time

import numpy as np

BATCH, NKP, DIM, POOL, RATIO = 64, 512, 64, 16, 0.85
CHUNK = 64
TARGET_GAP_S = 3.0


def main():
    variants = sys.argv[1:] or ["gemm", "topk", "argmin2", "full", "pallas"]

    import jax
    import jax.numpy as jnp

    from points_matching_tpu.core.config import MatcherConfig
    from points_matching_tpu.core.types import Descriptors
    from points_matching_tpu.ops.matching import (
        _argmin_top2, l2_distance_matrix, match_descriptors,
    )

    rng = np.random.RandomState(0)
    d1 = rng.randn(POOL * BATCH, NKP, DIM).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    d2 = d1 + 0.1 * rng.randn(*d1.shape).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    sh = lambda x: jnp.asarray(x.reshape(POOL, BATCH, *x.shape[1:]))
    pd1, pd2 = sh(d1), sh(d2)

    mask = jnp.ones((NKP,), bool)

    def step_gemm(a, b):
        d = l2_distance_matrix(a, b, "bf16")
        return jnp.sum(jnp.min(d, axis=-1))

    def step_topk(a, b):
        d = l2_distance_matrix(a, b, "bf16")
        v, i = jax.lax.top_k(-d, 2)
        return jnp.sum(-v[..., 0]) + jnp.sum(i[..., 1] % 7).astype(jnp.float32)

    def step_argmin2(a, b):
        d = l2_distance_matrix(a, b, "bf16")
        v, i = _argmin_top2(d)
        return jnp.sum(v[..., 0]) + jnp.sum(i[..., 1] % 7).astype(jnp.float32)

    def make_step_match(backend):
        cfg = MatcherConfig(metric="l2", filter="ratio", ratio=RATIO,
                            compute_dtype="bf16", backend=backend)

        def step(a, b):
            def one(da, db):
                m = match_descriptors(
                    Descriptors(data=da, mask=mask),
                    Descriptors(data=db, mask=mask), cfg)
                return jnp.sum(m.mask.astype(jnp.float32))

            return jnp.sum(jax.vmap(one)(a, b))

        return step

    steps = {
        "gemm": lambda a, b: jax.vmap(step_gemm)(a, b).sum(),
        "topk": lambda a, b: jax.vmap(step_topk)(a, b).sum(),
        "argmin2": lambda a, b: jax.vmap(step_argmin2)(a, b).sum(),
        "full": make_step_match("xla"),
        "pallas": make_step_match("pallas"),
    }

    for name in variants:
        per_step = steps[name]

        @jax.jit
        def run_chunk(pd1, pd2, acc0):
            def body(carry, _):
                i, acc = carry
                sl = i % POOL
                a = jax.lax.dynamic_index_in_dim(pd1, sl, 0, keepdims=False)
                b = jax.lax.dynamic_index_in_dim(pd2, sl, 0, keepdims=False)
                return (i + 1, acc + per_step(a, b) * 1e-6), None

            (_, acc), _ = jax.lax.scan(
                body, (jnp.int32(0), acc0), None, length=CHUNK)
            return acc

        def run(k):
            acc = jnp.float32(0.0)
            for _ in range(k):
                acc = run_chunk(pd1, pd2, acc)
            return float(acc)

        try:
            t0 = time.time()
            run(1)
            compile_s = time.time() - t0
            best_s = float("inf")
            for _ in range(3):
                t0 = time.time()
                run(1)
                best_s = min(best_s, time.time() - t0)
            t0 = time.time(); run(4)
            per_chunk = max((time.time() - t0 - best_s) / 3.0, 1e-3)
            k_long = 1 + max(4, int(TARGET_GAP_S / per_chunk))
            best_l = float("inf")
            for _ in range(2):
                t0 = time.time()
                run(k_long)
                best_l = min(best_l, time.time() - t0)
            gap = best_l - best_s
            pps = (k_long - 1) * CHUNK * BATCH / gap
            print(json.dumps(dict(
                variant=name, pairs_per_sec=round(pps),
                us_per_pair=round(1e6 / pps, 2), gap_s=round(gap, 3),
                compile_s=round(compile_s, 1))), flush=True)
        except Exception as e:  # keep probing the rest
            print(json.dumps(dict(variant=name,
                                  error=f"{type(e).__name__}: {e}"[:200])),
                  flush=True)


if __name__ == "__main__":
    main()
