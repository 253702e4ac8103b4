"""Fused AMG mask postprocess: upscale + stability counts + boxes + bit-pack.

Reference behavior: GD/segment_anything/automatic_mask_generator.py:266-322 —
each decoded low-res mask is bilinearly upscaled to the original image size
(sam.py:133-162 postprocess), thresholded, stability-scored, boxed and kept
as bits.  The XLA composition materializes the (M, H, W) fp32 logit masks in
HBM and re-reads them for every stat: ~0.8 GB written + ~3 GB re-read per
64-prompt multimask chunk at 1024² — the AMG grid sweep is HBM-bound there,
not compute-bound (measured 125 s/img at 32² points on vit_b).

TPU-first design: ONE Pallas kernel computes, per 128-row output tile,

    out = (Wy_tile @ L) @ Wx          two fp32 HIGHEST hat matmuls (MXU)

where Wy/Wx are the COMPOSED bilinear resample matrices of the whole
postprocess chain (256 -> img_size crop -> original, nn/interpolate
`_axis_matrix` semantics), then derives IN VMEM:

  * hi/lo stability counts  (#pixels > mt±offset)
  * tight bbox partials     (min/max row/col indices over threshold)
  * bit-packed mask rows    (0/1 matmul against a 2^k weight matrix — the
    np.packbits byte order — so packing is MXU work, not lane reshapes)

Full-resolution fp32 logits never touch HBM; per chunk only the low-res
input (~50 MB) and packed bits (~25 MB at 1024²) move.  Tile/lane padding is
neutralized with a -1e30 sentinel before thresholding, so pad pixels can
never count or set bbox/bits.  No backward (generation-only path).

Oracle: `postprocess_masks` + the stats block of `SamPredictor._amg_chunk`
(tests/test_amg_post.py).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from samrs_tpu.nn.interpolate import _axis_matrix


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=None)
def _composed_axis(g: int, img_size: int, inp: int, out: int) -> np.ndarray:
    """(out, g) fp32: resize g->img_size, crop [:inp], resize inp->out —
    the postprocess chain collapsed to one banded matrix (all stages are
    linear).  For the common square full-tile case (inp == out == img_size)
    the second stage is the identity and the matrix equals the single-stage
    `_axis_matrix`, keeping the kernel bit-compatible with the XLA path."""
    a = _axis_matrix(g, img_size)[:inp]
    if inp == out and img_size == inp:
        return np.ascontiguousarray(a)
    b = _axis_matrix(inp, out)
    return (b.astype(np.float64) @ a.astype(np.float64)).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _pack_matrix(Wo: int, Wo_pad: int, Wp_pad: int) -> np.ndarray:
    """(Wo_pad, Wp_pad) 0/1-weight matrix: bits @ P packs np.packbits-order
    bytes (bit b of output byte j reads input column 8j+b, weight 2^(7-b))."""
    p = np.zeros((Wo_pad, Wp_pad), np.float32)
    cols = np.arange(Wo)
    p[cols, cols // 8] = (128 >> (cols % 8)).astype(np.float32)
    return p


def _amg_post_kernel(wy_ref, l_ref, wx_ref, p_ref, stats_ref, packed_ref,
                     *, mt, off, Ho, Wo, Rt):
    r = pl.program_id(1)
    hi_prec = jax.lax.Precision.HIGHEST
    tmp = jax.lax.dot(wy_ref[...], l_ref[0], precision=hi_prec,
                      preferred_element_type=jnp.float32)      # (Rt, g)
    out = jax.lax.dot(tmp, wx_ref[...], precision=hi_prec,
                      preferred_element_type=jnp.float32)      # (Rt, Wo_pad)
    lane = jax.lax.broadcasted_iota(jnp.int32, out.shape, 1)
    row = jax.lax.broadcasted_iota(jnp.int32, out.shape, 0) + r * Rt
    out = jnp.where((lane < Wo) & (row < Ho), out, -1e30)
    mb = out > mt
    mbf = mb.astype(jnp.float32)
    hi_c = jnp.sum((out > mt + off).astype(jnp.float32))
    lo_c = jnp.sum((out > mt - off).astype(jnp.float32))
    big = jnp.float32(1e9)
    lane_f = lane.astype(jnp.float32)
    row_f = row.astype(jnp.float32)
    left = jnp.min(jnp.where(mb, lane_f, big))
    right = jnp.max(jnp.where(mb, lane_f, -big))
    top = jnp.min(jnp.where(mb, row_f, big))
    bot = jnp.max(jnp.where(mb, row_f, -big))
    packed_ref[0] = jax.lax.dot(mbf, p_ref[...], precision=hi_prec,
                                preferred_element_type=jnp.float32)
    vals = (hi_c, lo_c, left, top, right, bot, hi_c, hi_c)  # 8 sublane rows
    stats_ref[0, 0] = jnp.concatenate(
        [jnp.broadcast_to(jnp.reshape(v, (1, 1)), (1, 128)) for v in vals],
        axis=0,
    )


def amg_postprocess(
    lowres: jnp.ndarray,
    input_size: Tuple[int, int],
    original_size: Tuple[int, int],
    img_size: int,
    mask_threshold: float,
    offset: float,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """lowres (M, g, g) fp32 logits -> (hi (M,), lo (M,), boxes (M, 4) int32,
    packed (M, Ho, ceil(Wo/8)) fp32 bytes in [0, 255]).

    hi/lo are the stability numerator/denominator pixel counts; boxes are
    inclusive xyxy (zeros when empty — batched_mask_to_box convention);
    packed rows follow np.packbits bit order (cast to uint8 outside — Mosaic
    fp32 stores keep the kernel portable, the values are exact <= 255)."""
    M, g, g2 = lowres.shape
    assert g == g2, lowres.shape
    Ho, Wo = int(original_size[0]), int(original_size[1])
    Rt = 128
    Ho_pad = _round_up(Ho, Rt)
    Wo_pad = _round_up(Wo, 128)
    Wp = -(-Wo // 8)
    Wp_pad = _round_up(Wp, 128)
    ntiles = Ho_pad // Rt

    wy = _composed_axis(g, img_size, int(input_size[0]), Ho)
    wx = _composed_axis(g, img_size, int(input_size[1]), Wo)
    wy_p = np.zeros((Ho_pad, g), np.float32)
    wy_p[:Ho] = wy
    wx_p = np.zeros((g, Wo_pad), np.float32)
    wx_p[:, :Wo] = wx.T
    pmat = _pack_matrix(Wo, Wo_pad, Wp_pad)

    stats, packed = pl.pallas_call(
        functools.partial(_amg_post_kernel, mt=float(mask_threshold),
                          off=float(offset), Ho=Ho, Wo=Wo, Rt=Rt),
        grid=(M, ntiles),
        in_specs=[
            pl.BlockSpec((Rt, g), lambda m, t: (t, 0)),          # wy tile
            pl.BlockSpec((1, g, g), lambda m, t: (m, 0, 0)),     # lowres
            pl.BlockSpec((g, Wo_pad), lambda m, t: (0, 0)),      # wx
            pl.BlockSpec((Wo_pad, Wp_pad), lambda m, t: (0, 0)),  # pack
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 8, 128), lambda m, t: (m, t, 0, 0)),
            pl.BlockSpec((1, Rt, Wp_pad), lambda m, t: (m, t, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, ntiles, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((M, Ho_pad, Wp_pad), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64_000_000),
        interpret=interpret,
    )(jnp.asarray(wy_p), lowres.astype(jnp.float32), jnp.asarray(wx_p),
      jnp.asarray(pmat))

    s = stats[..., 0]                       # (M, ntiles, 8)
    hi = jnp.sum(s[..., 0], axis=1)
    lo = jnp.sum(s[..., 1], axis=1)
    left = jnp.min(s[..., 2], axis=1)
    top = jnp.min(s[..., 3], axis=1)
    right = jnp.max(s[..., 4], axis=1)
    bot = jnp.max(s[..., 5], axis=1)
    any_px = bot > -1e8
    boxes = jnp.stack([left, top, right, bot], axis=-1)
    boxes = jnp.where(any_px[:, None], boxes, 0.0).astype(jnp.int32)
    return hi, lo, boxes, packed[:, :Ho, :Wp]
