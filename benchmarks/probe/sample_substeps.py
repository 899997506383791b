#!/usr/bin/env python
"""Sub-step decomposition of the minimal-set sampling slice (r5 task:
VERDICT item 3 — sampling measured at 11.8 µs/pair, 6.5× the solve it
feeds).  Times cumulative variants of sample_minimal_points' internals at
bench shapes (64 pairs × 512 kp × 512 hyp × S=8), vmapped like production.

  rng        - _stratified_positions' RNG only (permutation + uniforms)
  positions  - full _stratified_positions (adds cdf + compare-reduce j)
  tableprep  - + bucketed table build (concat + [m] row gather + reshape)
  onehot     - + [H, S, b] one-hot materialization
  einsum     - + the (DEFAULT, HIGHEST) one-hot GEMM  (= production)
  einsum_dflt- einsum at DEFAULT precision on both operands (cost of the
               f32 split, isolated)
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

BATCH, NKP, HYP, S = 64, 512, 512, 8
CHUNK = 64
POOL = 16


def main():
    variants = sys.argv[1:] or [
        "rng", "positions", "tableprep", "onehot", "einsum", "einsum_dflt"]

    import jax
    import jax.numpy as jnp

    from points_matching_tpu.geometry.ransac import _stratified_positions

    rng = np.random.RandomState(0)
    p1 = rng.uniform(0, 640, (POOL, BATCH, NKP, 2)).astype(np.float32)
    p2 = p1 + rng.randn(POOL, BATCH, NKP, 2).astype(np.float32)
    pp1, pp2 = jnp.asarray(p1), jnp.asarray(p2)
    mask = jnp.ones((NKP,), bool)

    n = NKP
    bucket = -(-n // S)
    m = bucket * S

    def per_pair(pa, pb, k, variant):
        if variant == "rng":
            k_perm, k_u = jax.random.split(k)
            perm = jax.random.permutation(k_perm, m).astype(jnp.int32)
            u = jax.random.uniform(k_u, (HYP, S))
            return jnp.sum(perm).astype(jnp.float32) * 1e-6 + jnp.sum(u) * 1e-6
        j, slot_idx, _ = _stratified_positions(k, mask, HYP, S)
        if variant == "positions":
            return jnp.sum(j).astype(jnp.float32) * 1e-6
        table = jnp.concatenate((pa, pb), axis=-1).astype(jnp.float32)
        tab_b = table[slot_idx].reshape(S, bucket, -1)
        if variant == "tableprep":
            return jnp.sum(tab_b) * 1e-6 + jnp.sum(j).astype(jnp.float32) * 1e-6
        onehot = (
            j[..., None] == jnp.arange(bucket, dtype=j.dtype)
        ).astype(jnp.float32)
        if variant == "onehot":
            return jnp.sum(onehot) * 1e-6 + jnp.sum(tab_b) * 1e-6
        prec = (
            jax.lax.Precision.DEFAULT,
            jax.lax.Precision.DEFAULT if variant == "einsum_dflt"
            else jax.lax.Precision.HIGHEST,
        )
        sp = jnp.einsum("hsb,sbc->hsc", onehot, tab_b,
                        preferred_element_type=jnp.float32, precision=prec)
        return jnp.sum(sp) * 1e-6

    for name in variants:
        def step(pa, pb, ks, _name=name):
            return jnp.sum(jax.vmap(
                lambda a, b, k: per_pair(a, b, k, _name))(pa, pb, ks))

        @jax.jit
        def run_chunk(pp1, pp2, acc0, cid):
            def body(carry, ks):
                i, acc = carry
                sl = i % POOL
                take = lambda p: jax.lax.dynamic_index_in_dim(
                    p, sl, 0, keepdims=False)
                s = step(take(pp1), take(pp2), ks)
                return (i + 1, acc + s * 1e-6), None

            keys = jax.random.split(
                jax.random.fold_in(jax.random.PRNGKey(0), cid), (CHUNK, BATCH))
            (_, acc), _ = jax.lax.scan(body, (jnp.int32(0), acc0), keys)
            return acc

        def run(k):
            acc = jnp.float32(0.0)
            for i in range(k):
                acc = run_chunk(pp1, pp2, acc, jnp.int32(i))
            return float(acc)

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
            substep=name, pairs_per_sec=round(pps),
            us_per_pair=round(1e6 / pps, 2), compile_s=round(compile_s, 1))),
            flush=True)


if __name__ == "__main__":
    main()
