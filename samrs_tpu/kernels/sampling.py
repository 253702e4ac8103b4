"""Bilinear sampling primitives: the shared core of RVSA grid-sample,
MSDeformAttn and DCNv3.

The reference implements these as CUDA im2col kernels
(ED/backbone/ops/src/cuda/ms_deform_im2col_cuda.cuh,
ops_dcnv3/src/cuda/dcnv3_im2col_cuda.cuh) with pure-PyTorch oracles
(`ms_deform_attn_core_pytorch`, `dcnv3_core_pytorch`).  On TPU the same
pattern is gather + weighted-sum: XLA lowers the four corner gathers to
vectorized dynamic-gathers that pipeline well, so the pure-JAX forms below are
both the correctness oracles AND the production path until the Pallas
bilinear-gather kernel lands.  Gradients come for free via autodiff (the
CUDA backward's atomicAdd scatter is exactly the VJP of a gather).

Conventions match torch.nn.functional.grid_sample(align_corners=False,
padding_mode='zeros'): normalized coords in [-1, 1], half-pixel centers,
out-of-range contributions zero.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def grid_sample(img: jnp.ndarray, grid: jnp.ndarray, align_corners: bool = False) -> jnp.ndarray:
    """torch-compatible bilinear grid sample, NHWC.

    img:  (B, H, W, C)
    grid: (B, Ho, Wo, 2) with (x, y) in [-1, 1]
    returns (B, Ho, Wo, C); zero padding outside.
    """
    B, H, W, C = img.shape
    x = grid[..., 0]
    y = grid[..., 1]
    if align_corners:
        fx = (x + 1.0) * 0.5 * (W - 1)
        fy = (y + 1.0) * 0.5 * (H - 1)
    else:
        fx = ((x + 1.0) * W - 1.0) * 0.5
        fy = ((y + 1.0) * H - 1.0) * 0.5

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        xc = jnp.clip(xi, 0, W - 1)
        yc = jnp.clip(yi, 0, H - 1)
        flat = img.reshape(B, H * W, C)
        idx = yc * W + xc  # (B, Ho, Wo)
        vals = jnp.take_along_axis(
            flat, idx.reshape(B, -1, 1), axis=1
        ).reshape(*idx.shape, C)
        return vals * valid[..., None]

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def ms_deform_attn(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Multi-scale deformable attention (oracle parity with
    ms_deform_attn_core_pytorch, ED/backbone/ops/functions/ms_deform_attn_func.py:49-71).

    value:              (B, S, nH, D)  flattened multi-level feature maps
    spatial_shapes:     [(H_l, W_l)] static level shapes, sum(H*W) == S
    sampling_locations: (B, Q, nH, L, P, 2) normalized [0, 1]
    attention_weights:  (B, Q, nH, L, P)
    returns (B, Q, nH*D)
    """
    B, S, nH, D = value.shape
    _, Q, _, L, P, _ = sampling_locations.shape
    splits = [h * w for h, w in spatial_shapes]
    split_pts = list(np.cumsum(splits)[:-1])  # static (host) — jit-safe
    values = jnp.split(value, split_pts, axis=1)
    out = jnp.zeros((B, Q, nH, D), value.dtype)
    for lvl, (h, w) in enumerate(spatial_shapes):
        # (B, h*w, nH, D) -> (B*nH, h, w, D)
        v = values[lvl].reshape(B, h, w, nH, D).transpose(0, 3, 1, 2, 4)
        v = v.reshape(B * nH, h, w, D)
        # [0,1] -> [-1,1]
        loc = sampling_locations[:, :, :, lvl] * 2.0 - 1.0  # (B, Q, nH, P, 2)
        loc = loc.transpose(0, 2, 1, 3, 4).reshape(B * nH, Q, P, 2)
        sampled = grid_sample(v, loc)  # (B*nH, Q, P, D)
        wts = attention_weights[:, :, :, lvl].transpose(0, 2, 1, 3)  # (B, nH, Q, P)
        wts = wts.reshape(B * nH, Q, P, 1)
        out = out + (sampled * wts).sum(axis=2).reshape(B, nH, Q, D).transpose(0, 2, 1, 3)
    return out.reshape(B, Q, nH * D)


def dcnv3(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    mask: jnp.ndarray,
    kernel_h: int,
    kernel_w: int,
    stride_h: int = 1,
    stride_w: int = 1,
    pad_h: int = 1,
    pad_w: int = 1,
    dilation_h: int = 1,
    dilation_w: int = 1,
    groups: int = 1,
    group_channels: int = 16,
    offset_scale: float = 1.0,
) -> jnp.ndarray:
    """Deformable convolution v3 core (oracle parity with dcnv3_core_pytorch,
    ED/backbone/ops_dcnv3/functions/dcnv3_func.py:109+).

    x:      (B, H, W, G*Gc)  input features (NHWC)
    offset: (B, Ho, Wo, G*K*2)   per-group per-tap xy offsets
    mask:   (B, Ho, Wo, G*K)     softmax-normalized modulation
    returns (B, Ho, Wo, G*Gc)
    """
    B, H, W, _ = x.shape
    _, Ho, Wo, _ = offset.shape
    G, Gc, K = groups, group_channels, kernel_h * kernel_w

    # reference kernel-grid: dilation-spread taps centered on each output pixel
    ref_y = jnp.arange(Ho) * stride_h - pad_h + (dilation_h * (kernel_h - 1)) // 2 + 0.5
    ref_x = jnp.arange(Wo) * stride_w - pad_w + (dilation_w * (kernel_w - 1)) // 2 + 0.5
    ky = jnp.arange(kernel_h) * dilation_h - (dilation_h * (kernel_h - 1)) // 2
    kx = jnp.arange(kernel_w) * dilation_w - (dilation_w * (kernel_w - 1)) // 2
    # tap order k = iw*kh + ih — the reference's _generate_dilation_grids uses
    # torch.meshgrid(x_lin, y_lin) with default 'ij' indexing, i.e. the w-index
    # varies SLOWEST (dcnv3_func.py:142-160); the learned offset/mask channels
    # are laid out in that order, so ported weights require it
    tap_y = jnp.broadcast_to(ky[None, :], (kernel_w, kernel_h)).reshape(1, 1, K, 1)
    tap_x = jnp.broadcast_to(kx[:, None], (kernel_w, kernel_h)).reshape(1, 1, K, 1)
    base_y = ref_y[:, None, None, None] + tap_y
    base_x = ref_x[None, :, None, None] + tap_x
    base = jnp.concatenate(
        [jnp.broadcast_to(base_x, (Ho, Wo, K, 1)), jnp.broadcast_to(base_y, (Ho, Wo, K, 1))],
        axis=-1,
    )  # (Ho, Wo, K, 2) in pixel coords (x, y)

    off = offset.reshape(B, Ho, Wo, G, K, 2)
    pts = base[None, :, :, None] + off * offset_scale  # (B, Ho, Wo, G, K, 2)
    # normalize to [-1, 1] over the input extent (align_corners=False convention)
    nx = pts[..., 0] * (2.0 / W) - 1.0
    ny = pts[..., 1] * (2.0 / H) - 1.0
    grid = jnp.stack([nx, ny], axis=-1)

    xg = x.reshape(B, H, W, G, Gc).transpose(0, 3, 1, 2, 4).reshape(B * G, H, W, Gc)
    grid_g = grid.transpose(0, 3, 1, 2, 4, 5).reshape(B * G, Ho, Wo * K, 2)
    sampled = grid_sample(xg, grid_g)  # (B*G, Ho, Wo*K, Gc)
    sampled = sampled.reshape(B * G, Ho, Wo, K, Gc)
    m = mask.reshape(B, Ho, Wo, G, K).transpose(0, 3, 1, 2, 4).reshape(B * G, Ho, Wo, K, 1)
    out = (sampled * m).sum(axis=3)  # (B*G, Ho, Wo, Gc)
    out = out.reshape(B, G, Ho, Wo, Gc).transpose(0, 2, 3, 1, 4).reshape(B, Ho, Wo, G * Gc)
    return out
