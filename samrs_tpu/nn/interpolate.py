"""Bilinear interpolation with exact torch `align_corners=False` semantics.

The reference's mask postprocessing uses `F.interpolate(..., mode='bilinear',
align_corners=False)` with NO antialiasing (sam.py:133-162).  `jax.image.resize`
antialiases when downscaling, which breaks thresholded-mask parity, so this
module implements the plain half-pixel-center resample directly.

TPU-first formulation: per-axis resampling is a matmul with a banded weight
matrix (each output row holds the two bilinear hat weights), so the whole
resize runs on the MXU instead of as gathers+lerps on the VPU — the same
hat-weight-matmul idea as kernels/bilinear_gather.py, here expressible in
plain XLA because the coordinates are static.  Matmuls run at
Precision.HIGHEST: each output is the sum of exactly two weighted inputs
(plus exact zeros), keeping thresholded-mask parity on the fp32 decode path
(TPU fp32 matmuls otherwise default to bf16 passes).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _axis_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) fp32 bilinear resample matrix, half-pixel centers,
    edge-clipped (torch align_corners=False, antialias=False)."""
    scale = in_size / out_size
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    src = np.clip(src, 0.0, in_size - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    w = (src - lo).astype(np.float32)
    m = np.zeros((out_size, in_size), np.float32)
    np.add.at(m, (np.arange(out_size), lo), 1.0 - w)
    np.add.at(m, (np.arange(out_size), hi), w)
    return m


@lru_cache(maxsize=None)
def _axis_matrix_cubic(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) fp32 BICUBIC resample matrix with torch's kernel
    (cubic convolution, a = -0.75), half-pixel centers, edge-replicated taps
    (torch F.interpolate(mode='bicubic', align_corners=False))."""
    a = -0.75

    def k(t):
        t = np.abs(t)
        return np.where(
            t <= 1.0, ((a + 2.0) * t - (a + 3.0)) * t * t + 1.0,
            np.where(t < 2.0, (((t - 5.0) * t + 8.0) * t - 4.0) * a, 0.0),
        )

    scale = in_size / out_size
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    base = np.floor(src).astype(np.int64)
    frac = src - base
    m = np.zeros((out_size, in_size), np.float64)
    rows = np.arange(out_size)
    for tap in (-1, 0, 1, 2):
        idx = np.clip(base + tap, 0, in_size - 1)
        np.add.at(m, (rows, idx), k(tap - frac))
    return m.astype(np.float32)


def resize_bicubic_torch(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bicubic resize over the last two axes of (..., H, W) matching torch
    `F.interpolate(mode='bicubic', align_corners=False)` — used for the
    checkpoint pos-embed surgery (ED/main_finetune.py:290-332 oracle)."""
    H, W = x.shape[-2], x.shape[-1]
    out_h, out_w = out_hw
    if (H, W) == (out_h, out_w):
        return x
    dtype = x.dtype
    x = x.astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    if H != out_h:
        mh = jnp.asarray(_axis_matrix_cubic(H, out_h))
        x = jnp.einsum("oh,...hw->...ow", mh, x, precision=hi)
    if W != out_w:
        mw = jnp.asarray(_axis_matrix_cubic(W, out_w))
        x = jnp.einsum("...hw,ow->...ho", x, mw, precision=hi)
    return x.astype(dtype)


def resize_bilinear(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize over the last two axes of (..., H, W).

    Matches torch `F.interpolate(mode='bilinear', align_corners=False,
    antialias=False)` (same half-pixel sampling, no filtering); fp32 math.
    """
    H, W = x.shape[-2], x.shape[-1]
    out_h, out_w = out_hw
    if (H, W) == (out_h, out_w):
        return x
    dtype = x.dtype
    x = x.astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    if H != out_h:
        mh = jnp.asarray(_axis_matrix(H, out_h))
        x = jnp.einsum("oh,...hw->...ow", mh, x, precision=hi)
    if W != out_w:
        mw = jnp.asarray(_axis_matrix(W, out_w))
        x = jnp.einsum("...hw,ow->...ho", x, mw, precision=hi)
    return x.astype(dtype)


def resize_bilinear_nhwc(x: jnp.ndarray, out_hw: Tuple[int, int]) -> jnp.ndarray:
    """Same, for NHWC tensors (resizes axes 1, 2)."""
    H, W = x.shape[1], x.shape[2]
    out_h, out_w = out_hw
    if (H, W) == (out_h, out_w):
        return x
    dtype = x.dtype
    x = x.astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    if H != out_h:
        mh = jnp.asarray(_axis_matrix(H, out_h))
        x = jnp.einsum("oh,bhwc->bowc", mh, x, precision=hi)
    if W != out_w:
        mw = jnp.asarray(_axis_matrix(W, out_w))
        x = jnp.einsum("bhwc,ow->bhoc", x, mw, precision=hi)
    return x.astype(dtype)
