"""Bilinear image sampling — the gather primitive under descriptor
extraction and subpixel refinement (implicit components N1/N2)."""
from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def bilinear_sample(image: Array, xy: Array, fill: float = 0.0) -> Array:
    """Sample ``image`` ([H, W] or [H, W, C]) at continuous (x, y) locations.

    Args:
      image: [H, W] or [H, W, C].
      xy:    [..., 2] (x = column, y = row) sample coordinates.
      fill:  value for out-of-bounds samples.

    Returns: [...] or [..., C] sampled values.
    """
    H, W = image.shape[0], image.shape[1]
    has_c = image.ndim == 3
    x = xy[..., 0]
    y = xy[..., 1]

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    if not has_c:
        # Packed-corner gather: TPU gathers run element-at-a-time on the
        # scalar path, so 4 separate corner taps cost 4 scalar gathers per
        # sample.  Packing the 2×2 neighborhood into an [H, W, 4] tensor
        # (three shifted views — cheap VPU work) turns each sample into
        # ONE contiguous [1, 1, 4]-slice gather (r5: descriptor extraction
        # measured 14.3 → 8 ms-class at 512 kp × 484 samples).
        # Pad on BOTH sides so a base index of -1 (sample in [-1, 0)) has
        # its own corner row/column: clipping -1 to 0 would read the
        # (0, 1) neighborhood and return pixel (·, 1) for the in-bounds
        # +1 tap instead of pixel (·, 0) — a full-magnitude wrong value
        # on the top/left one-pixel fringe (caught in review; the
        # out-of-bounds taps themselves are overwritten with ``fill``
        # below either way).
        pad = jnp.pad(image, ((1, 1), (1, 1)))
        corners = jnp.stack(
            [pad[:-1, :-1], pad[:-1, 1:], pad[1:, :-1], pad[1:, 1:]],
            axis=-1,
        )  # [H+1, W+1, 4] = (v00, v01, v10, v11) at base (y-1, x-1)
        yc = jnp.clip(y0i + 1, 0, H)
        xc = jnp.clip(x0i + 1, 0, W)
        # flat 1-D index instead of 2-D advanced indexing: XLA lowers the
        # two-index-vector gather with per-dimension bounds handling; the
        # precomputed flat offset is one gather dimension and measured
        # 1.75 → 1.14 ms/image on the 512 kp × 484-sample descriptor
        # chain (r5 /tmp/desc_micro.py, bit-exact)
        v = corners.reshape(-1, 4)[yc * (W + 1) + xc]  # [..., 4]

        def inb(yi, xi):
            return (yi >= 0) & (yi <= H - 1) & (xi >= 0) & (xi <= W - 1)

        v00 = jnp.where(inb(y0i, x0i), v[..., 0], fill)
        v01 = jnp.where(inb(y0i, x0i + 1), v[..., 1], fill)
        v10 = jnp.where(inb(y0i + 1, x0i), v[..., 2], fill)
        v11 = jnp.where(inb(y0i + 1, x0i + 1), v[..., 3], fill)
        top = v00 * (1 - wx) + v01 * wx
        bot = v10 * (1 - wx) + v11 * wx
        return top * (1 - wy) + bot * wy

    def tap(yi, xi):
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        v = image[yc, xc]
        inb = (yi >= 0) & (yi <= H - 1) & (xi >= 0) & (xi <= W - 1)
        inb = inb[..., None]
        return jnp.where(inb, v, fill)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy
