"""Bilinear interpolation with exact torch `align_corners=False` semantics.

The reference's mask postprocessing uses `F.interpolate(..., mode='bilinear',
align_corners=False)` with NO antialiasing (sam.py:133-162).  `jax.image.resize`
antialiases when downscaling, which breaks thresholded-mask parity, so this
module implements the plain half-pixel-center gather+lerp directly.  It is
jit-friendly (static shapes) and fuses well: two gathers + a lerp per axis.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def _axis_weights(in_size: int, out_size: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """lo/hi gather indices + hi-weight for one axis (half-pixel centers)."""
    scale = in_size / out_size
    src = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    src = jnp.clip(src, 0.0, in_size - 1)
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, in_size - 1)
    w = src - lo.astype(jnp.float32)
    return lo, hi, w


def resize_bilinear(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize over the last two axes of (..., H, W).

    Matches torch `F.interpolate(mode='bilinear', align_corners=False,
    antialias=False)` exactly (same half-pixel sampling, no filtering).
    """
    H, W = x.shape[-2], x.shape[-1]
    out_h, out_w = out_hw
    if (H, W) == (out_h, out_w):
        return x
    dtype = x.dtype
    x = x.astype(jnp.float32)
    lo_h, hi_h, wh = _axis_weights(H, out_h)
    lo_w, hi_w, ww = _axis_weights(W, out_w)
    # rows
    top = jnp.take(x, lo_h, axis=-2)
    bot = jnp.take(x, hi_h, axis=-2)
    x = top + (bot - top) * wh[:, None]
    # cols
    left = jnp.take(x, lo_w, axis=-1)
    right = jnp.take(x, hi_w, axis=-1)
    x = left + (right - left) * ww
    return x.astype(dtype)


def resize_bilinear_nhwc(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Same, for NHWC tensors (resizes axes 1, 2)."""
    x = jnp.moveaxis(x, -1, 1)  # N C H W
    x = resize_bilinear(x, out_hw)
    return jnp.moveaxis(x, 1, -1)
