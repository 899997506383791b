#!/usr/bin/env python
"""On-chip variants of the fused RANSAC scoring kernel (r5: the fscore
slice measures 12 µs/pair — half the two-view step).  Isolates GEMM
precision passes, the per-cell divide, and GEMM count.

Variants:
  prod        - current production kernel
  nodiv       - multiply-compare gate (r^2 < tau2*denom), no divide
  def_prec    - GEMMs at DEFAULT precision (numerically wrong at pixel
                scale - timing only, isolates the 6-pass HIGHEST cost)
  oneop       - GEMMs at (HIGHEST, DEFAULT)/(DEFAULT, HIGHEST) 3-pass
  stacked     - 2 stacked GEMMs ([3H,3]xP1, [2H,3]xP2) + nodiv
"""
import functools
import json
import sys
import time

import numpy as np

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

BATCH, NKP, HYP = 64, 512, 512
POOL, CHUNK = 16, 64
TAU2 = 1.5 ** 2


def make_kernel(variant):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _BIG = 1e30

    if variant == "def_prec":
        prec = jax.lax.Precision.DEFAULT
    else:
        prec = jax.lax.Precision.HIGHEST

    def split3_dot(A, B):
        """Manual 3-pass bf16 split product: A@B with error ~2^-32 rel
        (drops only the lo*lo term).  Mosaic rejects per-operand dot
        precision; this is the same arithmetic, spelled out."""
        ah = A.astype(jnp.bfloat16)
        al = (A - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = B.astype(jnp.bfloat16)
        bl = (B - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        d = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return d(ah, bh) + d(ah, bl) + d(al, bh)

    def kernel(f_row_ref, f_col_ref, p1_ref, p2_ref, valid_ref,
               counts_out, acc, *, tau2, eps):
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        F9 = f_row_ref[:]
        Fc9 = f_col_ref[:]
        P1 = p1_ref[:]
        P2 = p2_ref[:]
        dot = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec,
        )
        if variant in ("stacked", "stack3"):
            TH = F9.shape[0]
            GA = jnp.concatenate([F9[:, 0:3], F9[:, 3:6], F9[:, 6:9]], axis=0)
            GB = jnp.concatenate([Fc9[:, 0:3], Fc9[:, 3:6]], axis=0)
            dd = split3_dot if variant == "stack3" else dot
            A = dd(GA, P1)             # [3TH, TN]
            Bm = dd(GB, P2)            # [2TH, TN]
            a1, a2, a3 = A[0:TH], A[TH:2 * TH], A[2 * TH:3 * TH]
            b1, b2 = Bm[0:TH], Bm[TH:2 * TH]
        elif variant == "split3":
            a1 = split3_dot(F9[:, 0:3], P1)
            a2 = split3_dot(F9[:, 3:6], P1)
            a3 = split3_dot(F9[:, 6:9], P1)
            b1 = split3_dot(Fc9[:, 0:3], P2)
            b2 = split3_dot(Fc9[:, 3:6], P2)
        else:
            a1 = dot(F9[:, 0:3], P1)
            a2 = dot(F9[:, 3:6], P1)
            a3 = dot(F9[:, 6:9], P1)
            b1 = dot(Fc9[:, 0:3], P2)
            b2 = dot(Fc9[:, 3:6], P2)
        r = a1 * P2[0:1, :] + a2 * P2[1:2, :] + a3
        denom = a1 * a1 + a2 * a2 + b1 * b1 + b2 * b2
        if variant in ("nodiv", "stacked", "stack3", "split3"):
            ok = jnp.logical_and(
                r * r < tau2 * jnp.maximum(denom, eps), valid_ref[:] > 0)
            cnt = jnp.sum(ok.astype(jnp.int32), axis=1, keepdims=True)
        else:
            bias = jnp.where(valid_ref[:] > 0, 0.0, _BIG)
            d = (r * r) / jnp.maximum(denom, eps) + bias
            cnt = jnp.sum((d < tau2).astype(jnp.int32), axis=1, keepdims=True)

        @pl.when(j == 0)
        def _():
            acc[:] = cnt

        @pl.when(j > 0)
        def _():
            acc[:] = acc[:] + cnt

        @pl.when(j == nj - 1)
        def _():
            counts_out[:] = acc[:]

    return kernel


def make_kernel_stacked(split):
    """GA [3TH, 3] / GB [2TH, 3] pre-stacked OUTSIDE the kernel (Mosaic
    cannot concat lane-offset slices in-kernel): 2 dots instead of 5
    (x3 passes when split)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    def dot_plain(A, B):
        return jax.lax.dot_general(
            A, B, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def dot_split(A, B):
        ah = A.astype(jnp.bfloat16)
        al = (A - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bh = B.astype(jnp.bfloat16)
        bl = (B - bh.astype(jnp.float32)).astype(jnp.bfloat16)
        return (dot_plain(ah, bh) + dot_plain(ah, bl) + dot_plain(al, bh))

    dd = dot_split if split else dot_plain

    def kernel(ga_ref, gb_ref, p1_ref, p2_ref, valid_ref,
               counts_out, acc, *, tau2, eps):
        j = pl.program_id(1)
        nj = pl.num_programs(1)
        GA = ga_ref[:]             # [3TH, 3]
        GB = gb_ref[:]             # [2TH, 3]
        P1 = p1_ref[:]
        P2 = p2_ref[:]
        TH = GA.shape[0] // 3
        A = dd(GA, P1)
        Bm = dd(GB, P2)
        a1, a2, a3 = A[0:TH], A[TH:2 * TH], A[2 * TH:3 * TH]
        b1, b2 = Bm[0:TH], Bm[TH:2 * TH]
        r = a1 * P2[0:1, :] + a2 * P2[1:2, :] + a3
        denom = a1 * a1 + a2 * a2 + b1 * b1 + b2 * b2
        ok = jnp.logical_and(
            r * r < tau2 * jnp.maximum(denom, eps), valid_ref[:] > 0)
        cnt = jnp.sum(ok.astype(jnp.int32), axis=1, keepdims=True)

        @pl.when(j == 0)
        def _():
            acc[:] = cnt

        @pl.when(j > 0)
        def _():
            acc[:] = acc[:] + cnt

        @pl.when(j == nj - 1)
        def _():
            counts_out[:] = acc[:]

    return kernel


def build_fn_stacked(split, tile_h=128, tile_n=512):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel = make_kernel_stacked(split)

    def score(F_h, p1, p2, mask):
        h, n = F_h.shape[0], p1.shape[0]
        nT = h // tile_h
        # per-tile row-stacked operands: tile i rows = [F rows0; rows1; rows2]
        GA = F_h.reshape(nT, tile_h, 3, 3).transpose(0, 2, 1, 3) \
            .reshape(nT * 3 * tile_h, 3)
        Fc = jnp.swapaxes(F_h, -1, -2)
        GB = Fc[..., 0:2, :].reshape(nT, tile_h, 2, 3) \
            .transpose(0, 2, 1, 3).reshape(nT * 2 * tile_h, 3)
        ones = jnp.ones((n, 1), p1.dtype)
        P1t = jnp.concatenate([p1, ones], axis=-1).T
        P2t = jnp.concatenate([p2, ones], axis=-1).T
        valid = mask.astype(jnp.float32)[None, :]
        grid = (nT, n // tile_n)
        counts = pl.pallas_call(
            functools.partial(kernel, tau2=TAU2, eps=1e-12),
            grid=grid,
            in_specs=[
                pl.BlockSpec((3 * tile_h, 3), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * tile_h, 3), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, tile_n), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, tile_n), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_n), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_h, 1), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((h, 1), jnp.int32),
            scratch_shapes=[pltpu.VMEM((tile_h, 1), jnp.int32)],
        )(GA, GB, P1t, P2t, valid)
        return counts[:, 0]

    return score


def build_fn_prod(tile_h, tile_n=512):
    """Production kernel (ransac_kernel.ransac_score_hypotheses) at a
    given tile size, fast mode — for the r5 tile sweep."""
    from points_matching_tpu.ops.pallas.ransac_kernel import (
        ransac_score_hypotheses,
    )

    def score(F_h, p1, p2, mask):
        return ransac_score_hypotheses(
            F_h, p1, p2, mask, 1.5, tile_h=tile_h, tile_n=tile_n,
            exact=False)

    return score


def build_fn(variant, tile_h=128, tile_n=512):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if variant.startswith("prod_th"):
        return build_fn_prod(int(variant.split("prod_th")[1]))
    if variant in ("ostack", "ostack3"):
        return build_fn_stacked(variant == "ostack3", tile_h, tile_n)
    kernel = make_kernel(variant)

    def score(F_h, p1, p2, mask):
        h, n = F_h.shape[0], p1.shape[0]
        F_row = F_h.reshape(h, 9)
        F_col = jnp.swapaxes(F_h, -1, -2).reshape(h, 9)
        ones = jnp.ones((n, 1), p1.dtype)
        P1t = jnp.concatenate([p1, ones], axis=-1).T
        P2t = jnp.concatenate([p2, ones], axis=-1).T
        valid = mask.astype(jnp.float32)[None, :]
        grid = (h // tile_h, n // tile_n)
        counts = pl.pallas_call(
            functools.partial(kernel, tau2=TAU2, eps=1e-12),
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_h, 9), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_h, 9), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, tile_n), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((3, tile_n), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_n), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tile_h, 1), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((h, 1), jnp.int32),
            scratch_shapes=[pltpu.VMEM((tile_h, 1), jnp.int32)],
        )(F_row, F_col, P1t, P2t, valid)
        return counts[:, 0]

    return score


def main():
    variants = sys.argv[1:] or ["prod", "nodiv", "def_prec", "stacked",
                                "stack3", "split3"]
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    F = rng.randn(POOL, BATCH, HYP, 3, 3).astype(np.float32)
    F /= np.linalg.norm(F, axis=(-2, -1), keepdims=True)
    p1 = rng.uniform(0, 640, (POOL, BATCH, NKP, 2)).astype(np.float32)
    p2 = p1 + rng.randn(POOL, BATCH, NKP, 2).astype(np.float32)
    pF, pp1, pp2 = jnp.asarray(F), jnp.asarray(p1), jnp.asarray(p2)
    mask = jnp.ones((NKP,), bool)

    # correctness reference once (XLA sampson counts on slice 0)
    from points_matching_tpu.geometry.fundamental import sampson_distance
    d = sampson_distance(pF[0, 0], pp1[0, 0][None], pp2[0, 0][None])
    ref_counts = np.asarray(jnp.sum(d < TAU2, axis=-1))

    for name in variants:
        score = build_fn(name)

        def step(Fb, pa, pb):
            return jnp.sum(jax.vmap(
                lambda f, x, y: jnp.max(score(f, x, y, mask)))(Fb, pa, pb))

        @jax.jit
        def run_chunk(pF, pp1, pp2, acc0):
            def body(carry, _):
                i, acc = carry
                sl = i % POOL
                take = lambda p: jax.lax.dynamic_index_in_dim(
                    p, sl, 0, keepdims=False)
                s = step(take(pF), take(pp1), take(pp2))
                return (i + 1, acc + s.astype(jnp.float32) * 1e-6), None

            (_, acc), _ = jax.lax.scan(
                body, (jnp.int32(0), acc0), None, length=CHUNK)
            return acc

        def run(k):
            acc = jnp.float32(0.0)
            for _ in range(k):
                acc = run_chunk(pF, pp1, pp2, acc)
            return float(acc)

        # correctness spot-check
        got = np.asarray(jax.vmap(
            lambda f, x, y: score(f, x, y, mask))(pF[0], pp1[0], pp2[0]))[0]
        max_dev = int(np.abs(got - ref_counts).max())

        t0 = time.time(); run(1); compile_s = time.time() - t0
        best_s = float("inf")
        for _ in range(3):
            t0 = time.time(); run(1); best_s = min(best_s, time.time() - t0)
        t0 = time.time(); run(3)
        per_chunk = max((time.time() - t0 - best_s) / 2.0, 1e-3)
        k_long = 1 + max(3, int(3.0 / per_chunk))
        best_l = float("inf")
        for _ in range(2):
            t0 = time.time(); run(k_long); best_l = min(best_l, time.time() - t0)
        gap = best_l - best_s
        pps = (k_long - 1) * CHUNK * BATCH / gap
        print(json.dumps(dict(
            variant=name, pairs_per_sec=round(pps),
            us_per_pair=round(1e6 / pps, 2), max_count_dev=max_dev,
            compile_s=round(compile_s, 1))), flush=True)


if __name__ == "__main__":
    main()
