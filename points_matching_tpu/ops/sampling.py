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

    def tap(yi, xi):
        yc = jnp.clip(yi, 0, H - 1)
        xc = jnp.clip(xi, 0, W - 1)
        v = image[yc, xc]
        inb = (yi >= 0) & (yi <= H - 1) & (xi >= 0) & (xi <= W - 1)
        if has_c:
            inb = inb[..., None]
        return jnp.where(inb, v, fill)

    v00 = tap(y0i, x0i)
    v01 = tap(y0i, x0i + 1)
    v10 = tap(y0i + 1, x0i)
    v11 = tap(y0i + 1, x0i + 1)

    if has_c:
        wx = wx[..., None]
        wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy
