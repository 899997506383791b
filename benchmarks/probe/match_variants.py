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
  pallas_raw  - fused_l2_top2 alone (no ratio filter / compaction) —
                isolates the kernel from the matcher's epilogue
  pallas_gemm - Pallas kernel with the SAME tiling/streaming but only the
                GEMM + a row min (no top-2 bookkeeping) — the GEMM/top-2
                split VERDICT r3 item 2 asks for
  sweep       - tile_q x tile_t sweep of fused_l2_top2

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

    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from points_matching_tpu.ops.pallas.matching_kernel import fused_l2_top2

    def _gemm_only_kernel(q_ref, t_ref, o_ref, acc):
        j = pl.program_id(1)
        d = jax.lax.dot_general(
            q_ref[:].astype(jnp.bfloat16), t_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = jnp.min(d, axis=1, keepdims=True)

        @pl.when(j == 0)
        def _():
            acc[:] = m

        @pl.when(j > 0)
        def _():
            acc[:] = jnp.minimum(acc[:], m)

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            o_ref[:] = acc[:]

    @functools.partial(jax.jit, static_argnames=("tq", "tt"))
    def gemm_only(q, t, tq=256, tt=512):
        n1, dd = q.shape
        n2 = t.shape[0]
        return pl.pallas_call(
            _gemm_only_kernel,
            grid=(n1 // tq, n2 // tt),
            in_specs=[
                pl.BlockSpec((tq, dd), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tt, dd), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tq, 1), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n1, 1), jnp.float32),
            scratch_shapes=[pltpu.VMEM((tq, 1), jnp.float32)],
            cost_estimate=pl.CostEstimate(
                flops=2 * n1 * n2 * dd,
                bytes_accessed=4 * (n1 * dd + (n1 // tq) * n2 * dd + n1),
                transcendentals=0,
            ),
        )(q, t)

    def step_pallas_gemm(a, b):
        return jnp.sum(gemm_only(a, b))

    # --- packed-key top-2 (VERDICT r4 item 6): distance and column index
    # share one int32 key (monotone sign-flip bitcast, low bits = column),
    # so the argmin, the runner-up masking, and the cross-tile carries all
    # run on a single array — 2 min-reductions, no masked re-read of d.
    # Cost: the reported distance loses its idx_bits low mantissa bits
    # (~6e-5 abs at unit-norm scale for 9 bits).
    def _packed_kernel(q_ref, t_ref, t2_ref, d_out, i_out, b1s, b2s,
                       *, idx_bits):
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        low = (1 << idx_bits) - 1
        q = q_ref[:]
        d = t2_ref[:] - 2.0 * jax.lax.dot_general(
            q.astype(jnp.bfloat16), t_ref[:].astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        tt = d.shape[1]
        u = jax.lax.bitcast_convert_type(d, jnp.int32)
        key = u ^ ((u >> 31) & jnp.int32(0x7FFFFFFF))   # monotone in d
        col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1) + j * tt
        kq = (key & jnp.int32(~low)) | col
        k1 = jnp.min(kq, axis=1, keepdims=True)
        masked = jnp.where(kq == k1, jnp.int32(0x7FFFFFFF), kq)
        k2 = jnp.min(masked, axis=1, keepdims=True)

        @pl.when(j == 0)
        def _():
            b1s[:] = k1
            b2s[:] = k2

        @pl.when(j > 0)
        def _():
            b1 = b1s[:]
            b2 = b2s[:]
            b1s[:] = jnp.minimum(b1, k1)
            b2s[:] = jnp.minimum(jnp.maximum(b1, k1), jnp.minimum(b2, k2))

        @pl.when(j == nj - 1)
        def _():
            q2 = jnp.sum(q * q, axis=1, keepdims=True)
            for c, ks in ((0, b1s), (1, b2s)):
                k = ks[:]
                kv = k & jnp.int32(~low)
                v = jax.lax.bitcast_convert_type(
                    kv ^ ((kv >> 31) & jnp.int32(0x7FFFFFFF)), jnp.float32)
                d_out[:, c:c + 1] = jnp.maximum(v + q2, 0.0)
                i_out[:, c:c + 1] = k & jnp.int32(low)

    @functools.partial(jax.jit, static_argnames=("tq", "tt"))
    def packed_top2(q, t, t2, tq=512, tt=512):
        n1, dd = q.shape
        n2 = t.shape[0]
        idx_bits = max((n2 - 1).bit_length(), 1)
        return pl.pallas_call(
            functools.partial(_packed_kernel, idx_bits=idx_bits),
            grid=(n1 // tq, n2 // tt),
            in_specs=[
                pl.BlockSpec((tq, dd), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tt, dd), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tt), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tq, 2), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tq, 2), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n1, 2), jnp.float32),
                jax.ShapeDtypeStruct((n1, 2), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((tq, 1), jnp.int32),
                pltpu.VMEM((tq, 1), jnp.int32),
            ],
            cost_estimate=pl.CostEstimate(
                flops=2 * n1 * n2 * dd,
                bytes_accessed=4 * (n1 * dd + (n1 // tq) * n2 * dd + n1 * 4),
                transcendentals=0,
            ),
        )(q, t, t2)

    def step_pallas_packed(a, b):
        t2 = jnp.sum(b * b, axis=-1)[None, :]
        dist, idx = packed_top2(a, b, t2)
        return jnp.sum(dist[:, 0]) + jnp.sum(idx[:, 1] % 7).astype(jnp.float32)

    def step_pallas_raw(a, b):
        dist, idx = fused_l2_top2(a, b, mask, compute_dtype="bf16")
        return jnp.sum(dist[:, 0]) + jnp.sum(idx[:, 1] % 7).astype(jnp.float32)

    def make_step_tiles(tq, tt):
        def step(a, b):
            dist, idx = fused_l2_top2(a, b, mask, tile_q=tq, tile_t=tt,
                                      compute_dtype="bf16")
            return jnp.sum(dist[:, 0]) + jnp.sum(idx[:, 1] % 7).astype(
                jnp.float32)
        return step

    steps = {
        "gemm": lambda a, b: jax.vmap(step_gemm)(a, b).sum(),
        "topk": lambda a, b: jax.vmap(step_topk)(a, b).sum(),
        "argmin2": lambda a, b: jax.vmap(step_argmin2)(a, b).sum(),
        "full": make_step_match("xla"),
        "pallas": make_step_match("pallas"),
        "pallas_raw": lambda a, b: jax.vmap(step_pallas_raw)(a, b).sum(),
        "pallas_gemm": lambda a, b: jax.vmap(step_pallas_gemm)(a, b).sum(),
        "pallas_packed": lambda a, b: jax.vmap(step_pallas_packed)(a, b).sum(),
    }
    for tq in (128, 256, 512, 1024):
        for tt in (256, 512, 1024):
            steps[f"tiles_{tq}x{tt}"] = (
                lambda a, b, s=make_step_tiles(tq, tt): jax.vmap(s)(a, b).sum()
            )
    if "sweep" in variants:
        variants = [v for v in variants if v != "sweep"] + [
            k for k in steps if k.startswith("tiles_")]

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
