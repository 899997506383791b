#!/usr/bin/env python
"""Chunked-dispatch probe: K sequential dispatches of a SAFE-length scan
(64 steps, proven on this backend), chained through an accumulator so the
final fetch is a true barrier for all K chunks.  Prints timing for K_short
and K_long → per-chunk slope (fetch intercept cancels).

Usage: python chunk_probe.py <variant: full|match> <k_short> <k_long>
"""
import json
import sys
import time

import numpy as np


CHUNK = 64  # per-dispatch scan length — max proven safe for this program


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "full"
    k_short = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    k_long = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    batch = 64

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
    from points_matching_tpu.geometry.ransac import ransac_fundamental

    mcfg = MatcherConfig(metric="l2", filter="ratio", ratio=RATIO,
                         compute_dtype="bf16")
    rcfg = RansacConfig(num_hypotheses=HYP)

    def per_pair(a, b, pa, pb, k):
        m = jnp.ones((NKP,), bool)
        matches = match_descriptors(
            Descriptors(data=a, mask=m), Descriptors(data=b, mask=m), mcfg)
        if variant == "match":
            return jnp.sum(matches.mask.astype(jnp.float32))
        q1 = jnp.take(pa, jnp.clip(matches.query_idx, 0, NKP - 1), axis=0)
        q2 = jnp.take(pb, jnp.clip(matches.train_idx, 0, NKP - 1), axis=0)
        est = ransac_fundamental(k, q1, q2, matches.mask, rcfg)
        return est.num_inliers.astype(jnp.float32)

    @jax.jit
    def run_chunk(pd1, pd2, pp1, pp2, acc0, chunk_id):
        def body(carry, ks):
            i, acc = carry
            sl = i % POOL
            take = lambda pool: jax.lax.dynamic_index_in_dim(
                pool, sl, 0, keepdims=False)
            stat = jnp.mean(jax.vmap(per_pair)(
                take(pd1), take(pd2), take(pp1), take(pp2), ks))
            return (i + 1, acc + stat), None

        keys = jax.random.split(
            jax.random.fold_in(jax.random.PRNGKey(0), chunk_id),
            (CHUNK, batch))
        (_, acc), _ = jax.lax.scan(body, (jnp.int32(0), acc0), keys)
        return acc

    def run_chunks(k):
        acc = jnp.float32(0.0)
        for i in range(k):
            acc = run_chunk(pd1, pd2, pp1, pp2, acc, jnp.int32(i))
        return float(acc)  # fetch = barrier for the whole chain

    log = lambda *a: print(*a, file=sys.stderr, flush=True)
    t0 = time.perf_counter()
    v = run_chunks(1)  # compile + first exec
    t_compile = time.perf_counter() - t0
    log(f"compile+first: {t_compile:.1f}s")

    def timed(k, reps=3):
        best = float("inf")
        for r in range(reps):
            t0 = time.perf_counter()
            run_chunks(k)
            dt = time.perf_counter() - t0
            log(f"k={k} rep={r}: {dt:.2f}s")
            best = min(best, dt)
        return best

    t_s = timed(k_short)
    t_l = timed(k_long)
    per_chunk = (t_l - t_s) / (k_long - k_short)
    print(json.dumps({
        "ok": True, "t_compile_s": round(t_compile, 2),
        "t_short_s": round(t_s, 3), "t_long_s": round(t_l, 3),
        "per_chunk_s": round(per_chunk, 4),
        "pairs_per_sec": round(CHUNK * 64 / per_chunk) if per_chunk > 0 else None,
        "val": v,
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:
        print(json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"[:500]}))
        sys.exit(1)
