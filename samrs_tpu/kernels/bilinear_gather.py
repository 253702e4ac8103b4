"""Pallas DCNv3 bilinear-gather kernel: deformable sampling as MXU matmuls.

The reference computes DCNv3 with CUDA im2col gathers and an atomicAdd
scatter backward (ED/backbone/ops_dcnv3/src/cuda/dcnv3_im2col_cuda.cuh).
XLA's lowering of the equivalent gather/scatter (kernels/sampling.py::dcnv3)
is the round-1 production path, but it dominates InternImage's step time
(~16x slower than swin per bench_train.py).

TPU-native re-design — the "hat-weight matmul" formulation.  Bilinear
interpolation with zero padding is exactly

    sample(fy, fx) = sum_y sum_x hat(fy - y) * hat(fx - x) * X[y, x]
    hat(t) = max(0, 1 - |t|)

so sampling K taps for a block of output pixels becomes dense matmuls with
tiny hat-banded matrices — MXU work instead of random access:

  * ``Wy = hat(fy[:, None] - iota_H)``            (P_blk, H)
  * ``T  = Wy @ Xg``                              (P_blk, W*Gc)   [MXU]
  * ``Wx`` built directly on the (P_blk, W*Gc) lane layout via
    ``lane // Gc`` (no reshape — Mosaic rejects lane-dim reshapes)
  * accumulate ``mask_k * Wx * T`` over taps, then one 0/1-expansion
    matmul ``@ E2`` reduces over x:               (P_blk, Gc)     [MXU]

The backward is transposed hat matmuls (``dXg += WyT @ dT``) — the CUDA
scatter-add disappears entirely.  Offset gradients flow through the hat
derivative (piecewise +-1), matching grid_sample's coordinate gradients a.e.

Numerics: hat weights are computed in fp32; the two matmuls run in the
input dtype (bf16 on the training path, fp32 in parity tests) with fp32
accumulation.  Semantics match kernels/sampling.py::dcnv3 exactly (same
column-major tap order, align_corners=False half-pixel convention); the
pure-JAX ``dcnv3`` is the oracle in tests/test_bilinear_gather.py.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _base_grid(
    Ho: int, Wo: int, kernel_h: int, kernel_w: int,
    stride_h: int, stride_w: int, pad_h: int, pad_w: int,
    dilation_h: int, dilation_w: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """(P, K) fp32 base sampling coords (x, y) in source-pixel space with the
    half-pixel align_corners=False shift already applied (fx = px - 0.5).
    Tap order k = iw*kh + ih (column-major, dcnv3_func.py:142-160)."""
    ref_y = np.arange(Ho) * stride_h - pad_h + (dilation_h * (kernel_h - 1)) // 2 + 0.5
    ref_x = np.arange(Wo) * stride_w - pad_w + (dilation_w * (kernel_w - 1)) // 2 + 0.5
    ky = np.arange(kernel_h) * dilation_h - (dilation_h * (kernel_h - 1)) // 2
    kx = np.arange(kernel_w) * dilation_w - (dilation_w * (kernel_w - 1)) // 2
    tap_y = np.broadcast_to(ky[None, :], (kernel_w, kernel_h)).reshape(-1)  # (K,)
    tap_x = np.broadcast_to(kx[:, None], (kernel_w, kernel_h)).reshape(-1)
    by = (ref_y[:, None, None] + tap_y[None, None, :])  # (Ho, 1, K)
    bx = (ref_x[None, :, None] + tap_x[None, None, :])  # (1, Wo, K)
    base_y = np.broadcast_to(by, (Ho, Wo, len(tap_y))).reshape(Ho * Wo, -1)
    base_x = np.broadcast_to(bx, (Ho, Wo, len(tap_x))).reshape(Ho * Wo, -1)
    return (base_x - 0.5).astype(np.float32), (base_y - 0.5).astype(np.float32)


def _hat(t: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _dhat(t: jnp.ndarray) -> jnp.ndarray:
    """d hat(t) / d t  (a.e.): -sign(t) on |t| < 1."""
    return jnp.where(jnp.abs(t) < 1.0, -jnp.sign(t), 0.0)


def _fwd_kernel(bx_ref, by_ref, offx_ref, offy_ref, mask_ref, xg_ref, e2_ref,
                out_ref, *, K, Gc, offset_scale, mm_dtype):
    H = xg_ref.shape[1]
    P = offx_ref.shape[1]
    WGc = xg_ref.shape[2]
    fx = bx_ref[...] + offx_ref[0] * offset_scale  # (P, K) fp32
    fy = by_ref[...] + offy_ref[0] * offset_scale
    lane_x = (jax.lax.broadcasted_iota(jnp.int32, (P, WGc), 1) // Gc).astype(jnp.float32)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (P, H), 1).astype(jnp.float32)
    xg = xg_ref[0].astype(mm_dtype)
    acc = jnp.zeros((P, WGc), jnp.float32)
    for k in range(K):
        wy = _hat(fy[:, k : k + 1] - iota_h)  # (P, H)
        t = jax.lax.dot(wy.astype(mm_dtype), xg,
                        preferred_element_type=jnp.float32)  # (P, WGc)
        wx = _hat(fx[:, k : k + 1] - lane_x)  # (P, WGc)
        acc = acc + mask_ref[0, :, k : k + 1] * wx * t
    out = jax.lax.dot(acc.astype(mm_dtype), e2_ref[...].astype(mm_dtype),
                      preferred_element_type=jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def _bwd_kernel(bx_ref, by_ref, byT_ref, offx_ref, offy_ref, offyT_ref,
                mask_ref, xg_ref, xgT_ref, e2T_ref, dout_ref,
                dxg_ref, doffx_ref, doffy_ref, dmask_ref,
                *, K, Gc, offset_scale, mm_dtype):
    H = xg_ref.shape[1]
    P = offx_ref.shape[1]
    WGc = xg_ref.shape[2]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dxg_ref[0] = jnp.zeros_like(dxg_ref[0])

    fx = bx_ref[...] + offx_ref[0] * offset_scale  # (P, K)
    fy = by_ref[...] + offy_ref[0] * offset_scale
    fyT = byT_ref[...] + offyT_ref[0] * offset_scale  # (K, P)
    lane_x = (jax.lax.broadcasted_iota(jnp.int32, (P, WGc), 1) // Gc).astype(jnp.float32)
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (P, H), 1).astype(jnp.float32)
    iota_hT = jax.lax.broadcasted_iota(jnp.int32, (H, P), 0).astype(jnp.float32)
    xg = xg_ref[0].astype(mm_dtype)
    xgT = xgT_ref[0].astype(mm_dtype)
    # dL/d(acc) — the pre-expansion accumulator — via the transposed 0/1 map
    R = jax.lax.dot(dout_ref[0].astype(mm_dtype), e2T_ref[...].astype(mm_dtype),
                    preferred_element_type=jnp.float32)  # (P, WGc)

    dxg_acc = jnp.zeros((H, WGc), jnp.float32)
    dfx_cols = []
    dfy_cols = []
    dmask_cols = []
    for k in range(K):
        ty = fy[:, k : k + 1] - iota_h
        wy = _hat(ty)  # (P, H)
        t = jax.lax.dot(wy.astype(mm_dtype), xg,
                        preferred_element_type=jnp.float32)  # (P, WGc)
        tx = fx[:, k : k + 1] - lane_x
        wx = _hat(tx)  # (P, WGc)
        m_k = mask_ref[0, :, k : k + 1]  # (P, 1)
        dmask_cols.append(jnp.sum(wx * R * t, axis=1, keepdims=True))
        g_k = m_k * R
        dT = g_k * wx  # (P, WGc)
        wyT = _hat(fyT[k : k + 1, :] - iota_hT)  # (H, P)
        dxg_acc = dxg_acc + jax.lax.dot(
            wyT.astype(mm_dtype), dT.astype(mm_dtype),
            preferred_element_type=jnp.float32)
        dfx_cols.append(jnp.sum(g_k * t * _dhat(tx), axis=1, keepdims=True))
        dwy = jax.lax.dot(dT.astype(mm_dtype), xgT,
                          preferred_element_type=jnp.float32)  # (P, H)
        dfy_cols.append(jnp.sum(dwy * _dhat(ty), axis=1, keepdims=True))
    dxg_ref[0] += dxg_acc.astype(dxg_ref.dtype)
    doffx_ref[0] = (jnp.concatenate(dfx_cols, axis=1) * offset_scale).astype(doffx_ref.dtype)
    doffy_ref[0] = (jnp.concatenate(dfy_cols, axis=1) * offset_scale).astype(doffy_ref.dtype)
    dmask_ref[0] = jnp.concatenate(dmask_cols, axis=1).astype(dmask_ref.dtype)


def _prep(x, offset, mask, G, Gc, K):
    """Layout prep (XLA, fused): group-major features + per-group tap arrays."""
    B, H, W, _ = x.shape
    _, Ho, Wo, _ = offset.shape
    P = Ho * Wo
    xg = x.reshape(B, H, W, G, Gc).transpose(0, 3, 1, 2, 4).reshape(B * G, H, W * Gc)
    off = offset.reshape(B, P, G, K, 2).transpose(0, 2, 1, 3, 4).reshape(B * G, P, K, 2)
    offx, offy = off[..., 0], off[..., 1]
    m = mask.reshape(B, P, G, K).transpose(0, 2, 1, 3).reshape(B * G, P, K)
    return xg, offx, offy, m


def _block_size(P: int) -> int:
    return 128 if P >= 128 else _round_up(P, 8)


def _pad_p(a: jnp.ndarray, Pp: int):
    P = a.shape[1]
    if P == Pp:
        return a
    return jnp.pad(a, ((0, 0), (0, Pp - P), (0, 0)))


@functools.partial(
    jax.custom_vjp,
    nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14),
)
def dcnv3_pallas(
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
    interpret: bool = False,
) -> jnp.ndarray:
    """DCNv3 core, same semantics as kernels/sampling.py::dcnv3 (NHWC).

    x (B,H,W,G*Gc) any float dtype; offset (B,Ho,Wo,G*K*2) and mask
    (B,Ho,Wo,G*K) fp32.  Returns (B,Ho,Wo,G*Gc) fp32.  Matmuls run in
    x.dtype (bf16 stays bf16 on the MXU) with fp32 accumulation.
    """
    out, _ = _dcnv3_fwd(
        x, offset, mask, kernel_h, kernel_w, stride_h, stride_w, pad_h, pad_w,
        dilation_h, dilation_w, groups, group_channels, offset_scale, interpret,
    )
    return out


def _dcnv3_fwd(x, offset, mask, kernel_h, kernel_w, stride_h, stride_w,
               pad_h, pad_w, dilation_h, dilation_w, groups, group_channels,
               offset_scale, interpret):
    B, H, W, _ = x.shape
    _, Ho, Wo, _ = offset.shape
    G, Gc, K = groups, group_channels, kernel_h * kernel_w
    P = Ho * Wo
    P_blk = _block_size(P)
    Pp = _round_up(P, P_blk)
    mm_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32

    xg, offx, offy, m = _prep(x, offset, mask, G, Gc, K)
    bx, by = _base_grid(Ho, Wo, kernel_h, kernel_w, stride_h, stride_w,
                        pad_h, pad_w, dilation_h, dilation_w)
    bx = jnp.asarray(np.pad(bx, ((0, Pp - P), (0, 0))))
    by = jnp.asarray(np.pad(by, ((0, Pp - P), (0, 0))))
    offx, offy, m = _pad_p(offx, Pp), _pad_p(offy, Pp), _pad_p(m, Pp)
    e2 = jnp.asarray(
        np.eye(Gc, dtype=np.float32)[np.tile(np.arange(Gc), W)]
    )  # (W*Gc, Gc) 0/1 expansion: reduces lanes over x, keeps d

    nblk = Pp // P_blk
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, K=K, Gc=Gc, offset_scale=offset_scale,
                          mm_dtype=mm_dtype),
        grid=(B * G, nblk),
        in_specs=[
            pl.BlockSpec((P_blk, K), lambda bg, p: (p, 0)),       # base x
            pl.BlockSpec((P_blk, K), lambda bg, p: (p, 0)),       # base y
            pl.BlockSpec((1, P_blk, K), lambda bg, p: (bg, p, 0)),  # off x
            pl.BlockSpec((1, P_blk, K), lambda bg, p: (bg, p, 0)),  # off y
            pl.BlockSpec((1, P_blk, K), lambda bg, p: (bg, p, 0)),  # mask
            pl.BlockSpec((1, H, W * Gc), lambda bg, p: (bg, 0, 0)),  # xg
            pl.BlockSpec((W * Gc, Gc), lambda bg, p: (0, 0)),     # e2
        ],
        out_specs=pl.BlockSpec((1, P_blk, Gc), lambda bg, p: (bg, p, 0)),
        out_shape=jax.ShapeDtypeStruct((B * G, Pp, Gc), jnp.float32),
        interpret=interpret,
    )(bx, by, offx, offy, m, xg, e2)

    out = out[:, :P].reshape(B, G, Ho, Wo, Gc).transpose(0, 2, 3, 1, 4)
    out = out.reshape(B, Ho, Wo, G * Gc)
    return out, (x, offset, mask)


def _dcnv3_bwd(kernel_h, kernel_w, stride_h, stride_w, pad_h, pad_w,
               dilation_h, dilation_w, groups, group_channels, offset_scale,
               interpret, res, dout):
    x, offset, mask = res
    B, H, W, _ = x.shape
    _, Ho, Wo, _ = offset.shape
    G, Gc, K = groups, group_channels, kernel_h * kernel_w
    P = Ho * Wo
    P_blk = _block_size(P)
    Pp = _round_up(P, P_blk)
    mm_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32

    xg, offx, offy, m = _prep(x, offset, mask, G, Gc, K)
    xgT = xg.transpose(0, 2, 1)  # (BG, W*Gc, H)
    bx, by = _base_grid(Ho, Wo, kernel_h, kernel_w, stride_h, stride_w,
                        pad_h, pad_w, dilation_h, dilation_w)
    bx = jnp.asarray(np.pad(bx, ((0, Pp - P), (0, 0))))
    by = jnp.asarray(np.pad(by, ((0, Pp - P), (0, 0))))
    byT = by.T  # (K, Pp)
    offx, offy, m = _pad_p(offx, Pp), _pad_p(offy, Pp), _pad_p(m, Pp)
    offyT = offy.transpose(0, 2, 1)  # (BG, K, Pp)
    e2T = jnp.asarray(
        np.eye(Gc, dtype=np.float32)[np.tile(np.arange(Gc), W)].T
    )  # (Gc, W*Gc)

    dout_g = dout.reshape(B, Ho * Wo, G, Gc).transpose(0, 2, 1, 3)
    dout_g = _pad_p(dout_g.reshape(B * G, P, Gc), Pp).astype(jnp.float32)

    nblk = Pp // P_blk
    dxg, doffx, doffy, dm = pl.pallas_call(
        functools.partial(_bwd_kernel, K=K, Gc=Gc, offset_scale=offset_scale,
                          mm_dtype=mm_dtype),
        grid=(B * G, nblk),
        in_specs=[
            pl.BlockSpec((P_blk, K), lambda bg, p: (p, 0)),        # base x
            pl.BlockSpec((P_blk, K), lambda bg, p: (p, 0)),        # base y
            pl.BlockSpec((K, P_blk), lambda bg, p: (0, p)),        # base yT
            pl.BlockSpec((1, P_blk, K), lambda bg, p: (bg, p, 0)),  # off x
            pl.BlockSpec((1, P_blk, K), lambda bg, p: (bg, p, 0)),  # off y
            pl.BlockSpec((1, K, P_blk), lambda bg, p: (bg, 0, p)),  # off yT
            pl.BlockSpec((1, P_blk, K), lambda bg, p: (bg, p, 0)),  # mask
            pl.BlockSpec((1, H, W * Gc), lambda bg, p: (bg, 0, 0)),  # xg
            pl.BlockSpec((1, W * Gc, H), lambda bg, p: (bg, 0, 0)),  # xgT
            pl.BlockSpec((Gc, W * Gc), lambda bg, p: (0, 0)),      # e2T
            pl.BlockSpec((1, P_blk, Gc), lambda bg, p: (bg, p, 0)),  # dout
        ],
        out_specs=[
            pl.BlockSpec((1, H, W * Gc), lambda bg, p: (bg, 0, 0)),
            pl.BlockSpec((1, P_blk, K), lambda bg, p: (bg, p, 0)),
            pl.BlockSpec((1, P_blk, K), lambda bg, p: (bg, p, 0)),
            pl.BlockSpec((1, P_blk, K), lambda bg, p: (bg, p, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * G, H, W * Gc), jnp.float32),
            jax.ShapeDtypeStruct((B * G, Pp, K), jnp.float32),
            jax.ShapeDtypeStruct((B * G, Pp, K), jnp.float32),
            jax.ShapeDtypeStruct((B * G, Pp, K), jnp.float32),
        ],
        interpret=interpret,
    )(bx, by, jnp.asarray(byT), offx, offy, offyT, m, xg, xgT, e2T, dout_g)

    # un-prep layouts
    dx = dxg.reshape(B, G, H, W, Gc).transpose(0, 2, 3, 1, 4)
    dx = dx.reshape(B, H, W, G * Gc).astype(x.dtype)
    doff = jnp.stack([doffx[:, :P], doffy[:, :P]], axis=-1)  # (BG, P, K, 2)
    doff = doff.reshape(B, G, Ho, Wo, K, 2).transpose(0, 2, 3, 1, 4, 5)
    doff = doff.reshape(B, Ho, Wo, G * K * 2).astype(offset.dtype)
    dmask = dm[:, :P].reshape(B, G, Ho, Wo, K).transpose(0, 2, 3, 1, 4)
    dmask = dmask.reshape(B, Ho, Wo, G * K).astype(mask.dtype)
    return dx, doff, dmask


dcnv3_pallas.defvjp(_dcnv3_fwd, _dcnv3_bwd)
