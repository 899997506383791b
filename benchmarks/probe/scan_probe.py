#!/usr/bin/env python
"""Fault-bisect probe: run ONE scan of a selectable per-step program at a
given length, print JSON {ok, seconds, val} and exit.  Run under subprocess
so a TPU-worker crash cannot poison subsequent probes.

Usage: python scan_probe.py <variant> <inner> [batch]
Variants (cumulative slices of the bench's match+RANSAC step):
  matmul      - plain bf16 GEMM chain step (control)
  match       - descriptor matching only (GEMM + top-2 + ratio)
  sample      - match + RANSAC Gumbel minimal-set sampling
  eigh        - match + sample + batched 8-pt solve (eigh of AtA)
  score       - match + sample + solve + Sampson scoring + argmax
  full        - the production ransac_fundamental (adds refit rounds)
"""
import json
import sys
import time

import numpy as np


def main():
    variant = sys.argv[1]
    inner = int(sys.argv[2])
    batch = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    import jax
    import jax.numpy as jnp
    from functools import partial

    NKP, DIM, HYP, POOL, RATIO = 512, 64, 512, 16, 0.85

    rng = np.random.RandomState(0)
    d1 = rng.randn(POOL * batch, NKP, DIM).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    d2 = d1 + 0.1 * rng.randn(*d1.shape).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    p1 = rng.uniform(0, 640, (POOL * batch, NKP, 2)).astype(np.float32)
    p2 = p1 + rng.randn(POOL * batch, NKP, 2).astype(np.float32)

    sh = lambda x: jnp.asarray(x.reshape(POOL, batch, *x.shape[1:]))
    pd1, pd2, pp1, pp2 = map(sh, (d1, d2, p1, p2))

    from points_matching_tpu.core.config import MatcherConfig, RansacConfig
    from points_matching_tpu.core.types import Descriptors
    from points_matching_tpu.ops.matching import match_descriptors
    from points_matching_tpu.geometry.ransac import (
        ransac_fundamental, _sample_minimal_sets)
    from points_matching_tpu.geometry.fundamental import (
        eight_point, sampson_distance)

    mcfg = MatcherConfig(metric="l2", filter="ratio", ratio=RATIO,
                         compute_dtype="bf16")
    rcfg = RansacConfig(num_hypotheses=HYP)

    def do_match(a, b):
        m = jnp.ones((NKP,), bool)
        return match_descriptors(
            Descriptors(data=a, mask=m), Descriptors(data=b, mask=m), mcfg)

    def per_pair(a, b, pa, pb, k):
        matches = do_match(a, b)
        if variant == "match":
            return jnp.sum(matches.mask.astype(jnp.float32))
        q1 = jnp.take(pa, jnp.clip(matches.query_idx, 0, NKP - 1), axis=0)
        q2 = jnp.take(pb, jnp.clip(matches.train_idx, 0, NKP - 1), axis=0)
        if variant == "full":
            est = ransac_fundamental(k, q1, q2, matches.mask, rcfg)
            return est.num_inliers.astype(jnp.float32)
        idx = _sample_minimal_sets(k, matches.mask, HYP, 8)
        s1 = jnp.take(q1, idx, axis=0)  # [HYP, 8, 2]
        s2 = jnp.take(q2, idx, axis=0)
        if variant == "sample":
            return jnp.sum(s1) * 1e-6
        F = eight_point(s1, s2)  # [HYP, 3, 3]
        if variant == "eigh":
            return jnp.sum(F) * 1e-3
        err = sampson_distance(F, q1[None], q2[None])  # [HYP, M]
        inl = jnp.sum((err < 1.5**2) & matches.mask[None, :], axis=-1)
        best = jnp.argmax(inl)
        return inl[best].astype(jnp.float32)

    if variant == "matmul":
        M = 2048
        a = (0.02 * jax.random.normal(jax.random.PRNGKey(7), (M, M))
             ).astype(jnp.bfloat16)

        @partial(jax.jit, static_argnames=("n",))
        def run_mm(a, n):
            def body(c, _):
                c = a @ c
                c = c * jax.lax.rsqrt(
                    jnp.mean(jnp.square(c.astype(jnp.float32)))
                ).astype(jnp.bfloat16)
                return c, None
            out, _ = jax.lax.scan(body, a, None, length=n)
            return jnp.sum(out[:1, :8].astype(jnp.float32))

        t0 = time.perf_counter()
        v = float(run_mm(a, inner))
        dt = time.perf_counter() - t0
        print(json.dumps({"ok": True, "seconds": dt, "val": v}))
        return

    @partial(jax.jit, static_argnames=("inner",))
    def run(pd1, pd2, pp1, pp2, inner):
        def body(carry, ks):
            i, acc = carry
            sl = i % POOL
            take = lambda pool: jax.lax.dynamic_index_in_dim(
                pool, sl, 0, keepdims=False)
            stat = jnp.mean(jax.vmap(per_pair)(
                take(pd1), take(pd2), take(pp1), take(pp2), ks))
            return (i + 1, acc + stat), None

        keys = jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(0), inner), (inner, batch))
        (_, acc), _ = jax.lax.scan(body, (jnp.int32(0), jnp.float32(0.0)), keys)
        return acc / inner

    t0 = time.perf_counter()
    v = float(run(pd1, pd2, pp1, pp2, inner))
    dt = time.perf_counter() - t0
    print(json.dumps({"ok": True, "seconds": dt, "val": v}))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"[:500]}))
        sys.exit(1)
