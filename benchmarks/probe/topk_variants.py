#!/usr/bin/env python
"""Sub-slice the detector's dominant cost (DETECT_SLICES_r05: the
nms→topk delta is 7.55 of the 9.1 ms/image detection).

Variants (each = resp + nms + the listed extra work, 8-chain slope):
  blockmax_t   - 2x2 block max/argmax via pad+reshape+transpose (production)
  blockmax_s   - same via four stride-2 slices + elementwise max (no transpose)
  topk_t       - blockmax_t + lax.top_k(1.31M→512) + index decode
  topk_s       - blockmax_s + lax.top_k + decode
  subpix_vol   - topk_s + FULL-VOLUME subpixel maps + 512-row gathers (production)
  subpix_gath  - topk_s + per-winner 4-neighbor scalar gathers (512×4) + parab

Usage: python topk_variants.py [out.txt]
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from points_matching_tpu.core.config import surf_parity_config
    from points_matching_tpu.ops import detect as D

    cfg = surf_parity_config().detector
    H, W = 660, 993
    sigmas = D.detector_sigmas(cfg)
    rng = np.random.RandomState(0)
    img0 = jnp.asarray(128.0 + 40.0 * rng.randn(H, W).astype(np.float32))
    k = cfg.max_keypoints

    def masked_scores(img):
        r = jnp.stack([D.hessian_response(img, s) for s in sigmas], axis=0)
        pk = jnp.logical_and(D._spatial_nms(r, cfg.nms_radius), D._scale_nms(r))
        yy = jnp.arange(H)[None, :, None]
        xx = jnp.arange(W)[None, None, :]
        b = cfg.border
        ok = (yy >= b) & (yy < H - b) & (xx >= b) & (xx < W - b)
        v = pk & ok & (r > cfg.threshold * 1e-4)
        return r, jnp.where(v, r, -jnp.inf)

    S = len(sigmas)
    H2, W2 = -(-H // 2), -(-W // 2)

    def block_t(score_m):
        p = jnp.pad(score_m, ((0, 0), (0, 2 * H2 - H), (0, 2 * W2 - W)),
                    constant_values=-jnp.inf)
        blk = p.reshape(S, H2, 2, W2, 2).transpose(0, 1, 3, 2, 4)
        blk = blk.reshape(S, H2, W2, 4)
        return jnp.max(blk, axis=-1), jnp.argmax(blk, axis=-1).astype(jnp.int32)

    def block_s(score_m):
        p = jnp.pad(score_m, ((0, 0), (0, 2 * H2 - H), (0, 2 * W2 - W)),
                    constant_values=-jnp.inf)
        c00 = p[:, 0::2, 0::2]
        c01 = p[:, 0::2, 1::2]
        c10 = p[:, 1::2, 0::2]
        c11 = p[:, 1::2, 1::2]
        m0 = jnp.maximum(c00, c01)
        a0 = jnp.where(c01 > c00, 1, 0)
        m1 = jnp.maximum(c10, c11)
        a1 = jnp.where(c11 > c10, 3, 2)
        bmax = jnp.maximum(m0, m1)
        barg = jnp.where(m1 > m0, a1, a0).astype(jnp.int32)
        return bmax, barg

    def decode(bmax, barg):
        top_scores, bix = lax.top_k(bmax.reshape(-1), k)
        s_idx = bix // (H2 * W2)
        rem = bix % (H2 * W2)
        la = barg.reshape(-1)[bix]
        y_idx = (rem // W2) * 2 + (la >> 1)
        x_idx = (rem % W2) * 2 + (la & 1)
        return top_scores, s_idx, y_idx, x_idx

    def v_blockmax_t(img):
        _, sm = masked_scores(img)
        bmax, barg = block_t(sm)
        return (jnp.sum(bmax * 0.0) + jnp.sum(barg) * 0.0) * 1e-12

    def v_blockmax_s(img):
        _, sm = masked_scores(img)
        bmax, barg = block_s(sm)
        return (jnp.sum(bmax * 0.0) + jnp.sum(barg) * 0.0) * 1e-12

    def v_topk_t(img):
        _, sm = masked_scores(img)
        ts, s_idx, y_idx, x_idx = decode(*block_t(sm))
        return jnp.sum(y_idx + x_idx + s_idx).astype(jnp.float32) * 1e-12

    def v_topk_s(img):
        _, sm = masked_scores(img)
        ts, s_idx, y_idx, x_idx = decode(*block_s(sm))
        return jnp.sum(y_idx + x_idx + s_idx).astype(jnp.float32) * 1e-12

    def v_subpix_vol(img):
        r, sm = masked_scores(img)
        ts, s_idx, y_idx, x_idx = decode(*block_s(sm))
        dx, dy = D._subpixel_offsets(r)
        top_idx = s_idx * (H * W) + y_idx * W + x_idx
        dxv = dx.reshape(-1)[top_idx]
        dyv = dy.reshape(-1)[top_idx]
        return jnp.sum(dxv + dyv) * 1e-12

    def v_subpix_gath(img):
        r, sm = masked_scores(img)
        ts, s_idx, y_idx, x_idx = decode(*block_s(sm))
        rf = r.reshape(-1)
        base = s_idx * (H * W) + y_idx * W + x_idx
        xc = jnp.clip(x_idx, 1, W - 2)
        yc = jnp.clip(y_idx, 1, H - 2)
        basec = s_idx * (H * W) + yc * W + xc
        cur = rf[basec]
        rl = rf[basec - 1]
        rr = rf[basec + 1]
        ru = rf[basec - W]
        rd = rf[basec + W]

        def parab(prev, c, nxt):
            den = prev - 2.0 * c + nxt
            off = 0.5 * (prev - nxt) / jnp.where(jnp.abs(den) < 1e-12, 1e-12, den)
            return jnp.clip(off, -0.5, 0.5)

        return jnp.sum(parab(rl, cur, rr) + parab(ru, cur, rd)) * 1e-12

    variants = [
        ("blockmax_t", v_blockmax_t),
        ("blockmax_s", v_blockmax_s),
        ("topk_t", v_topk_t),
        ("topk_s", v_topk_s),
        ("subpix_vol", v_subpix_vol),
        ("subpix_gath", v_subpix_gath),
    ]

    lines = []
    for name, fn in variants:
        @functools.partial(jax.jit, static_argnums=(1,))
        def chain(img, n, fn=fn):
            def body(carry, _):
                return carry + fn(img + carry), None
            acc, _ = lax.scan(body, jnp.float32(0.0), None, length=n)
            return acc

        float(chain(img0, 1))
        t0 = time.perf_counter(); float(chain(img0, 1)); t1 = time.perf_counter()
        chain(img0, 9).block_until_ready()
        t2 = time.perf_counter(); float(chain(img0, 9)); t3 = time.perf_counter()
        per = ((t3 - t2) - (t1 - t0)) / 8.0 * 1e3
        lines.append(f"{name:12s} {per:7.2f} ms/image")
        print(lines[-1], flush=True)

    out = sys.argv[1] if len(sys.argv) > 1 else None
    if out:
        with open(out, "w") as f:
            f.write("Top-k / subpixel variant costs (993x660, 8 scales, 512 kp)\n")
            f.write("(each = conv+nms base [~1.5 ms] + listed extra work)\n")
            f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
