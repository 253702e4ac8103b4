"""Fused SAM mask-upscale + hypernetwork kernel.

The mask decoder's tail — two 2x2-stride-2 deconvs (as tap matmuls), a
channel LayerNorm, two exact gelus, and the per-token hypernetwork dot —
accounts for ~13 of the ~21 ms a 64-box decode costs on one chip.  Under XLA
every stage materialises a wide fp32 intermediate to HBM, the conv2 output is
laid out with a 32-lane minor dim (4x-padded tiles), and the hypernetwork
einsum computes all 4 mask tokens even though `multimask_output=False` keeps
exactly one (mask_decoder.py:102-107 in the reference slices AFTER computing).

This kernel streams the whole chain through VMEM per row tile:

    h1 = src_tile @ W1 + b1        (conv1 taps: lanes = 4 tap slots x C1)
    per tap slot s (STATIC lane slices — Mosaic rejects lane reshapes):
        LayerNorm over the C1 lanes of slot s  (exact fp32, eps 1e-6)
        g1_s = gelu(ln_s)                      (erf via Abramowitz-Stegun)
        h2_s = g1_s @ W2 + b2                  (conv2 taps: 4 slots x C2)
        g2_s = gelu(h2_s)
        acc += g2_s @ Wh_s                     (hypernetwork, only the
                                                REQUESTED mask tokens)
    out_tile = acc                             (lanes = M*16 subpixels)

HBM traffic: src once in, (B, h*w, M*16) out — no intermediate ever leaves
the chip.  The (i,j,k,l) subpixel interleave is deferred to one small XLA
transpose on the final (B, M, h, w, 2,2,2,2) tensor, exactly like the
deferred-interleave deconv path it replaces.

Forward-only; backward falls back to the XLA composition via custom_vjp
(nothing in SAMRS trains through the SAM decoder).

Reference path being replaced: GD/segment_anything/modeling/
mask_decoder.py:53-59 (output_upscaling) and :156-167 (hypernetwork dot).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from samrs_tpu.kernels.fused_mlp import _erf

_LN_EPS = 1e-6


def _gelu_exact(x):
    return 0.5 * x * (1.0 + _erf(x * 0.7071067811865476))


def upscale_hyper_xla(src, k1, b1, ln_scale, ln_bias, k2, b2, hyper, dtype):
    """Oracle: the exact ConvTranspose2x(interleave=False) -> LayerNorm2d ->
    gelu -> ConvTranspose2x -> gelu -> hypernetwork-einsum composition from
    MaskDecoder.predict_masks, with the deferred tap interleave resolved the
    same way.  Returns (B, M, 4h, 4w) fp32 mask logits."""
    B, h, w, _ = src.shape
    M = hyper.shape[1]
    kc1 = k1[::-1, ::-1].astype(dtype)
    up = jnp.einsum(
        "...c,ijcd->...ijd", src.astype(dtype), kc1, preferred_element_type=jnp.float32
    )
    up = (up + b1.astype(dtype)).astype(dtype)
    # LayerNorm2d over the channel axis, fp32
    upf = up.astype(jnp.float32)
    mean = jnp.mean(upf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(upf - mean), axis=-1, keepdims=True)
    upf = (upf - mean) * jax.lax.rsqrt(var + _LN_EPS)
    up = (upf * ln_scale + ln_bias).astype(dtype)
    up = jax.nn.gelu(up, approximate=False)
    kc2 = k2[::-1, ::-1].astype(dtype)
    up = jnp.einsum(
        "...c,klcd->...kld", up.astype(dtype), kc2, preferred_element_type=jnp.float32
    )
    up = (up + b2.astype(dtype)).astype(dtype)
    up = jax.nn.gelu(up, approximate=False)  # (B, h, w, 2,2, 2,2, C2)
    masks = jnp.einsum(
        "bmc,bhwijklc->bmhwijkl", hyper.astype(dtype), up,
        preferred_element_type=jnp.float32,
    )
    return masks.transpose(0, 1, 2, 4, 6, 3, 5, 7).reshape(B, M, 4 * h, 4 * w)


def _kernel(x_ref, w1_ref, b1_ref, lns_ref, lnb_ref, w2_ref, b2_ref, wh_ref,
            o_ref, *, C1, C2, M):
    x = x_ref[0]  # (bt, C) in matmul dtype
    h1 = jax.lax.dot_general(
        x, w1_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)  # (bt, 4*C1)
    acc = jnp.zeros((x.shape[0], M * 16), jnp.float32)
    for s in range(4):  # conv1 tap slot (i, j) — static lane slices
        seg = h1[:, s * C1:(s + 1) * C1]
        mu = jnp.mean(seg, axis=-1, keepdims=True)
        d = seg - mu
        var = jnp.mean(d * d, axis=-1, keepdims=True)
        y = d * jax.lax.rsqrt(var + _LN_EPS)
        y = y * lns_ref[...].astype(jnp.float32) + lnb_ref[...].astype(jnp.float32)
        g1 = _gelu_exact(y)
        h2 = jax.lax.dot_general(
            g1.astype(x.dtype), w2_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2_ref[...].astype(jnp.float32)  # (bt, 4*C2)
        g2 = _gelu_exact(h2)
        acc = acc + jax.lax.dot_general(
            g2.astype(x.dtype), wh_ref[0, s],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (bt, M*16) — only this slot's subpixel columns are nonzero
    o_ref[0] = acc


def _pick_bt(R: int) -> int:
    for bt in range(1024, 63, -8):
        if R % bt == 0:
            return bt
    return 0


def _fused_pallas(src, k1, b1, ln_scale, ln_bias, k2, b2, hyper, dtype,
                  interpret=False):
    B, h, w, C = src.shape
    C1 = k1.shape[-1]
    C2 = k2.shape[-1]
    M = hyper.shape[1]
    R = h * w
    md = dtype  # matmul input dtype (bf16 on TPU = XLA's DEFAULT f32 passes)

    # conv taps as matmuls: flip (ConvTranspose correlates the mirrored
    # kernel), then lanes = tap-slot-major [s=(2i+j) | channel]
    w1 = k1[::-1, ::-1].transpose(2, 0, 1, 3).reshape(C, 4 * C1)
    b1t = jnp.tile(b1, 4).reshape(1, 4 * C1)
    w2 = k2[::-1, ::-1].transpose(2, 0, 1, 3).reshape(C1, 4 * C2)
    b2t = jnp.tile(b2, 4).reshape(1, 4 * C2)
    # per-slot hypernetwork matrices:
    #   Wh[b, s, t*C2+c, m*16 + s'*4 + t'] = hyper[b, m, c] iff s'==s, t'==t
    # (s = conv1 tap slot (2i+j), t = conv2 tap slot (2k+l); output lane
    #  order = (m, i, j, k, l), matching the final interleave transpose)
    eye4 = jnp.eye(4, dtype=hyper.dtype)
    wh_full = jnp.einsum("bmc,sp,tq->bstcmpq", hyper, eye4, eye4)
    wh_full = wh_full.reshape(B, 4, 4 * C2, M * 16)

    bt = _pick_bt(R)
    pad = 0
    srcf = src.reshape(B, R, C)
    if bt == 0:
        bt = min(512, 8 * ((R + 7) // 8))
        pad = (-R) % bt
        srcf = jnp.pad(srcf, ((0, 0), (0, pad), (0, 0)))
    kernel = functools.partial(_kernel, C1=C1, C2=C2, M=M)
    out = pl.pallas_call(
        kernel,
        grid=(B, (R + pad) // bt),
        in_specs=[
            pl.BlockSpec((1, bt, C), lambda b, r: (b, r, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 4 * C1), lambda b, r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * C1), lambda b, r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C1), lambda b, r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C1), lambda b, r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C1, 4 * C2), lambda b, r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4 * C2), lambda b, r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, 4 * C2, M * 16), lambda b, r: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bt, M * 16), lambda b, r: (b, r, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R + pad, M * 16), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * R * (C * 4 * C1 + 4 * C1 * 4 * C2 + 4 * 4 * C2 * M * 16),
            bytes_accessed=B * R * C * 2 + B * R * M * 16 * 4,
            transcendentals=B * R * 4 * (C1 + 4 * C2),
        ),
        interpret=interpret,
    )(srcf.astype(md), w1.astype(md), b1t.astype(md),
      ln_scale.reshape(1, C1), ln_bias.reshape(1, C1),
      w2.astype(md), b2t.astype(md), wh_full.astype(md))
    if pad:
        out = out[:, :R]
    out = out.reshape(B, h, w, M, 2, 2, 2, 2)
    # (b, h, w, m, i, j, k, l) -> (b, m, 4h+2i+k, 4w+2j+l)
    return out.transpose(0, 3, 1, 4, 6, 2, 5, 7).reshape(B, M, 4 * h, 4 * w)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def _fused(src, k1, b1, ln_scale, ln_bias, k2, b2, hyper, dtype, use_pallas,
           interpret):
    if use_pallas:
        return _fused_pallas(src, k1, b1, ln_scale, ln_bias, k2, b2, hyper,
                             dtype, interpret)
    return upscale_hyper_xla(src, k1, b1, ln_scale, ln_bias, k2, b2, hyper, dtype)


def _fwd(src, k1, b1, ln_scale, ln_bias, k2, b2, hyper, dtype, use_pallas,
         interpret):
    out = _fused(src, k1, b1, ln_scale, ln_bias, k2, b2, hyper, dtype,
                 use_pallas, interpret)
    return out, (src, k1, b1, ln_scale, ln_bias, k2, b2, hyper)


def _bwd(dtype, use_pallas, interpret, res, g):
    _, vjp = jax.vjp(lambda *a: upscale_hyper_xla(*a, dtype), *res)
    return vjp(g.astype(jnp.float32))


_fused.defvjp(_fwd, _bwd)


def fused_upscale_hyper(
    src: jnp.ndarray,       # (B, h, w, C) transformer-updated image embedding
    k1: jnp.ndarray,        # (2, 2, C, C1) ConvTranspose kernel (upscale_conv1)
    b1: jnp.ndarray,        # (C1,)
    ln_scale: jnp.ndarray,  # (C1,) LayerNorm2d scale
    ln_bias: jnp.ndarray,   # (C1,)
    k2: jnp.ndarray,        # (2, 2, C1, C2) ConvTranspose kernel (upscale_conv2)
    b2: jnp.ndarray,        # (C2,)
    hyper: jnp.ndarray,     # (B, M, C2) hypernetwork outputs, REQUESTED tokens
    dtype=jnp.float32,      # matmul input dtype; bf16 on TPU matches XLA DEFAULT
    force_xla: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (B, M, 4h, 4w) fp32 mask logits."""
    use_pallas = (not force_xla and jax.default_backend() == "tpu") or (
        interpret and not force_xla
    )
    if use_pallas and jax.default_backend() == "tpu" and dtype == jnp.float32:
        dtype = jnp.bfloat16  # XLA's DEFAULT f32 matmul precision on TPU
    return _fused(src, k1, b1, ln_scale, ln_bias, k2, b2, hyper, dtype,
                  use_pallas, interpret)
