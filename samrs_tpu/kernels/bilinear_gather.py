"""Pallas bilinear-gather kernels: deformable sampling as MXU matmuls.

The reference computes DCNv3 / MSDeformAttn / grid_sample with CUDA im2col
gathers and atomicAdd scatter backwards
(ED/backbone/ops_dcnv3/src/cuda/dcnv3_im2col_cuda.cuh,
ED/backbone/ops/src/cuda/ms_deform_im2col_cuda.cuh).  XLA's lowering of the
equivalent gather/scatter (kernels/sampling.py) is correct but slow on TPU:
measured with a LICM-proof harness, the DCNv3 gathers alone cost 1349 ms
fwd+bwd per internimage_t step (B=12 @224) and one MSDeformAttn call costs
67 ms.

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
scatter-add disappears entirely.  Coordinate gradients flow through the hat
derivative (piecewise +-1), matching grid_sample's a.e.

Architecture: one ``custom_vjp`` core over ABSOLUTE pixel coordinates
(`_sample_ws`), and three thin differentiable wrappers — ``dcnv3_pallas``
(base-grid + offsets, kernels/sampling.py::dcnv3 semantics),
``grid_sample_pallas`` (K=1, normalized grids, both align_corners modes) and
``ms_deform_attn_pallas`` (per-level taps weighted by attention weights).
Layout prep / coordinate algebra in the wrappers is plain JAX, so autodiff
chains through them into the core's hand-written VJP.

Numerics: hat weights are fp32; the two matmuls run in the feature dtype
(bf16 on the training path, fp32 in parity tests) with fp32 accumulation.
The pure-JAX forms in kernels/sampling.py are the oracles
(tests/test_bilinear_gather.py).

A/B (v5e, LICM-proof harness, internimage_t stage shapes, B=12, all 30
blocks): fwd 75.8 ms vs 446.7 XLA; fwd+bwd 171.8 ms vs 1348.5 XLA (7.8x).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# per-corner transient budget for the gather-forward path (tests shrink it
# to exercise multi-chunk concatenation; env-overridable in MB for A/Bs —
# 32 MB left the m2f 1024^2 B=1 step 17.8 MB past HBM)
_GATHER_CHUNK_BYTES = int(
    __import__("os").environ.get("SAMRS_GATHER_CHUNK_MB", "8")) << 20


def _hat(t: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


def _dhat(t: jnp.ndarray) -> jnp.ndarray:
    """d hat(t) / d t, half-open convention matching the floor-based oracle.

    autodiff of ``x0 = floor(fx); wx = fx - x0`` yields the one-sided RIGHT
    derivative, defined at integer coords: the tap at ``t in [0, 1)`` is x0
    (weight 1-t, slope -1) and the tap at ``t in [-1, 0)`` is x0+1 (weight
    1+t, slope +1); the tap at exactly ``t = 1`` is outside the floor pair
    (slope 0).  ``-sign(t) on |t| < 1`` disagrees on the measure-zero
    integer-coordinate set (all-zero gradient there) — which real point
    grids at power-of-two sizes do hit."""
    return jnp.where((t >= 0.0) & (t < 1.0), -1.0,
                     jnp.where((t >= -1.0) & (t < 0.0), 1.0, 0.0))


def _fwd_kernel(fx_ref, fy_ref, mask_ref, xg_ref, e2_ref, out_ref,
                *, K, Gc, mm_dtype):
    H = xg_ref.shape[1]
    P = fx_ref.shape[1]
    WGc = xg_ref.shape[2]
    fx = fx_ref[0]  # (P, K) fp32 absolute pixel coords
    fy = fy_ref[0]
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


def _bwd_kernel(fx_ref, fy_ref, fyT_ref, mask_ref, xg_ref, xgT_ref, e2T_ref,
                dout_ref, dxg_ref, dfx_ref, dfy_ref, dmask_ref,
                *, K, Gc, mm_dtype):
    H = xg_ref.shape[1]
    P = fx_ref.shape[1]
    WGc = xg_ref.shape[2]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dxg_ref[0] = jnp.zeros_like(dxg_ref[0])

    fx = fx_ref[0]  # (P, K)
    fy = fy_ref[0]
    fyT = fyT_ref[0]  # (K, P)
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
    dfx_ref[0] = jnp.concatenate(dfx_cols, axis=1).astype(dfx_ref.dtype)
    dfy_ref[0] = jnp.concatenate(dfy_cols, axis=1).astype(dfy_ref.dtype)
    dmask_ref[0] = jnp.concatenate(dmask_cols, axis=1).astype(dmask_ref.dtype)


def _fwd_kernel_slab(fx_ref, fy_ref, mask_ref, xg_ref, e2_ref, out_ref,
                     t_ref, acc_ref, *, K, Gc, Hs, mm_dtype):
    """Row-slab-skipping forward: the hat matmul runs per Hs-row slab of the
    map, predicated on whether ANY tap row of this query block lands in the
    slab.  Query blocks are raster-contiguous for every wrapper (DCNv3 output
    pixels, MSDeformAttn multi-scale tokens), so their sampling rows span a
    narrow band when offsets are local (deformable-DETR init is a <=P_t-pixel
    ring) and most slab dots are branched over at runtime.  Exact: slabs
    partition the hat support, and a skipped slab has all-zero hat weights
    AND all-zero dhat rows (the predicate covers the half-open dhat support
    at fy+1), so fwd and every VJP term are untouched."""
    H = xg_ref.shape[1]
    P = fx_ref.shape[1]
    WGc = xg_ref.shape[2]
    fx = fx_ref[0]  # (P, K) fp32 absolute pixel coords
    fy = fy_ref[0]
    lane_x = (jax.lax.broadcasted_iota(jnp.int32, (P, WGc), 1) // Gc).astype(jnp.float32)
    acc_ref[...] = jnp.zeros_like(acc_ref)
    for k in range(K):
        fyk = fy[:, k : k + 1]
        lo = jnp.min(fyk)
        hi = jnp.max(fyk)
        t_ref[...] = jnp.zeros_like(t_ref)
        for s in range(H // Hs):
            # slab rows [s*Hs, s*Hs+Hs-1] vs tap support [lo-1, hi+1]
            @pl.when((s * Hs <= hi + 1.0) & (s * Hs + Hs - 1.0 >= lo - 1.0))
            def _(s=s, fyk=fyk):
                iota = (jax.lax.broadcasted_iota(jnp.int32, (P, Hs), 1)
                        + s * Hs).astype(jnp.float32)
                wy = _hat(fyk - iota)  # (P, Hs)
                xs = xg_ref[0, s * Hs : (s + 1) * Hs, :].astype(mm_dtype)
                t_ref[...] += jax.lax.dot(
                    wy.astype(mm_dtype), xs, preferred_element_type=jnp.float32)
        wx = _hat(fx[:, k : k + 1] - lane_x)  # (P, WGc)
        acc_ref[...] += mask_ref[0, :, k : k + 1] * wx * t_ref[...]
    out = jax.lax.dot(acc_ref[...].astype(mm_dtype), e2_ref[...].astype(mm_dtype),
                      preferred_element_type=jnp.float32)
    out_ref[0] = out.astype(out_ref.dtype)


def _bwd_kernel_slab(fx_ref, fy_ref, mask_ref, xg_ref, xgT_ref, e2T_ref,
                     dout_ref, dxg_ref, dfx_ref, dfy_ref, dmask_ref,
                     t_ref, dfy_sc, *, K, Gc, Hs, mm_dtype):
    """Transposed counterpart of `_fwd_kernel_slab`: all three per-tap hat
    matmuls (t recompute, dxg scatter rows, dwy columns) run only on active
    slabs.  dxg slab rows accumulate in place; dfy accumulates in a (P, K)
    scratch because contributions live inside the predicated regions."""
    H = xg_ref.shape[1]
    P = fx_ref.shape[1]
    WGc = xg_ref.shape[2]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dxg_ref[0] = jnp.zeros_like(dxg_ref[0])

    fx = fx_ref[0]  # (P, K)
    fy = fy_ref[0]
    lane_x = (jax.lax.broadcasted_iota(jnp.int32, (P, WGc), 1) // Gc).astype(jnp.float32)
    R = jax.lax.dot(dout_ref[0].astype(mm_dtype), e2T_ref[...].astype(mm_dtype),
                    preferred_element_type=jnp.float32)  # (P, WGc)
    dfy_sc[...] = jnp.zeros_like(dfy_sc)
    dfx_cols = []
    dmask_cols = []
    for k in range(K):
        fyk = fy[:, k : k + 1]
        lo = jnp.min(fyk)
        hi = jnp.max(fyk)
        t_ref[...] = jnp.zeros_like(t_ref)
        for s in range(H // Hs):
            @pl.when((s * Hs <= hi + 1.0) & (s * Hs + Hs - 1.0 >= lo - 1.0))
            def _t(s=s, fyk=fyk):
                iota = (jax.lax.broadcasted_iota(jnp.int32, (P, Hs), 1)
                        + s * Hs).astype(jnp.float32)
                wy = _hat(fyk - iota)
                xs = xg_ref[0, s * Hs : (s + 1) * Hs, :].astype(mm_dtype)
                t_ref[...] += jax.lax.dot(
                    wy.astype(mm_dtype), xs, preferred_element_type=jnp.float32)
        t = t_ref[...]
        tx = fx[:, k : k + 1] - lane_x
        wx = _hat(tx)
        m_k = mask_ref[0, :, k : k + 1]
        dmask_cols.append(jnp.sum(wx * R * t, axis=1, keepdims=True))
        g_k = m_k * R
        dT = (g_k * wx).astype(mm_dtype)  # (P, WGc)
        dfx_cols.append(jnp.sum(g_k * t * _dhat(tx), axis=1, keepdims=True))
        for s in range(H // Hs):
            @pl.when((s * Hs <= hi + 1.0) & (s * Hs + Hs - 1.0 >= lo - 1.0))
            def _sc(s=s, fyk=fyk, k=k, dT=dT):
                iota = (jax.lax.broadcasted_iota(jnp.int32, (P, Hs), 1)
                        + s * Hs).astype(jnp.float32)
                ty = fyk - iota  # (P, Hs)
                wyT = _hat(ty).astype(mm_dtype)
                # dxg[slab] += wy^T @ dT  (contract over queries)
                dxg_ref[0, s * Hs : (s + 1) * Hs, :] += jax.lax.dot_general(
                    wyT, dT, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32).astype(dxg_ref.dtype)
                # dwy[:, slab] = dT @ xgT[:, slab]
                dws = jax.lax.dot(
                    dT, xgT_ref[0, :, s * Hs : (s + 1) * Hs].astype(mm_dtype),
                    preferred_element_type=jnp.float32)  # (P, Hs)
                dfy_sc[:, k : k + 1] += jnp.sum(dws * _dhat(ty), axis=1,
                                                keepdims=True)
    dfx_ref[0] = jnp.concatenate(dfx_cols, axis=1).astype(dfx_ref.dtype)
    dfy_ref[0] = dfy_sc[...].astype(dfy_ref.dtype)
    dmask_ref[0] = jnp.concatenate(dmask_cols, axis=1).astype(dmask_ref.dtype)


def _block_size(P: int) -> int:
    return 128 if P >= 128 else _round_up(P, 8)


def _vmem_limit(P_blk: int, H: int, WGc: int) -> Optional[int]:
    """Scoped-VMEM limit override for large maps, else None (16 MB default).

    The unrolled kernels keep ~8 live (P_blk, W*Gc) fp32 temporaries plus
    ~2 (H, W*Gc) planes (dxg accumulator, xg copy); at large maps (e.g. the
    Mask2Former pixel decoder's 128x128 level at 1024^2 tiles, W*Gc = 4096)
    a 128-query block needs ~21 MB of stack and Mosaic's default 16 MB limit
    refuses to compile.  v5e has 128 MB of VMEM; raise the limit with
    headroom instead of shrinking blocks (the (1, K, P_blk) transposed-coord
    blocks must keep a %128 lane dim).
    """
    est = (8 * P_blk + 2 * H) * WGc * 4
    if est <= 15_000_000:
        return None
    return int(min(100_000_000, 2 * est))


def _pad_p(a: jnp.ndarray, Pp: int, edge: bool = False):
    P = a.shape[1]
    if P == Pp:
        return a
    if edge:
        # slab mode: replicate the last real query's coords so the final
        # block's in-kernel row bounds stay tight (zero pads would pull the
        # band to row 0); padded outputs are cropped, so values don't matter
        return jnp.pad(a, ((0, 0), (0, Pp - P), (0, 0)), mode="edge")
    return jnp.pad(a, ((0, 0), (0, Pp - P), (0, 0)))


def _e2(W: int, Gc: int) -> np.ndarray:
    """(W*Gc, Gc) 0/1 expansion: reduces lanes over x, keeps the channel."""
    return np.eye(Gc, dtype=np.float32)[np.tile(np.arange(Gc), W)]


# ---------------------------------------------------------------------------
# Core: weighted bilinear gather over ABSOLUTE pixel coordinates.
# custom_vjp closes over the static (Gc, interpret) pair — one specialized
# sampler per pair, cached.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _make_sampler(Gc: int, interpret: bool, slab: int = 0,
                  fwd_gather: bool = False):
    def _gather_chunk(img, fx, fy, mask, H, W):
        BG, P, K = fx.shape
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        wx = (fx - x0)[..., None]
        wy = (fy - y0)[..., None]
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)

        def g(yi, xi):
            valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
            vals = jnp.take_along_axis(img, idx.reshape(BG, P * K, 1), axis=1)
            return vals.reshape(BG, P, K, Gc) * valid[..., None]

        top = g(y0i, x0i) * (1 - wx) + g(y0i, x0i + 1) * wx
        bot = g(y0i + 1, x0i) * (1 - wx) + g(y0i + 1, x0i + 1) * wx
        samp = top * (1 - wy) + bot * wy  # (BG, P, K, Gc)
        return jnp.sum(samp.astype(jnp.float32) * mask[..., None], axis=2)

    def fwd_gather_call(xg, fx, fy, mask):
        """XLA-gather forward, O(1) work per sample: at large maps the hat
        matmuls' O(H) row reduction stops paying (Mask2Former's 128x128
        stride-8 level at 1024^2), while row gathers ride HBM bandwidth.
        Paired with the transposed-hat Pallas backward (bwd_call below) so
        the VJP never hits XLA's serialized scatter-add lowering.

        Chunked over queries: each corner gather materializes a
        (BG, Pc, K, Gc) fp32 intermediate, and the unchunked m2f 1024^2
        level-0 call (BG=8, P=21504, K=4, Gc=32 -> 88 MB/corner/layer)
        pushed the B=1 training step ~200 MB past HBM; ~32 MB chunks bound
        the transient peak with static shapes (plain python loop — no
        lax.map, which is a remote-compile trap per CLAUDE.md)."""
        BG, H, WGc = xg.shape
        _, P, K = fx.shape
        W = WGc // Gc
        img = xg.reshape(BG, H * W, Gc)
        bytes_per_q = BG * K * Gc * 4
        Pc = max(1, min(P, _GATHER_CHUNK_BYTES // max(1, bytes_per_q)))
        outs = [
            _gather_chunk(img, fx[:, s:s + Pc], fy[:, s:s + Pc],
                          mask[:, s:s + Pc], H, W)
            for s in range(0, P, Pc)
        ]
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)

    def fwd_call(xg, fx, fy, mask):
        if fwd_gather:
            return fwd_gather_call(xg, fx, fy, mask)
        BG, H, WGc = xg.shape
        _, P, K = fx.shape
        W = WGc // Gc
        P_blk = _block_size(P)
        Pp = _round_up(P, P_blk)
        mm_dtype = xg.dtype if xg.dtype == jnp.bfloat16 else jnp.float32
        fxp = _pad_p(fx, Pp, edge=slab > 0)
        fyp = _pad_p(fy, Pp, edge=slab > 0)
        mp = _pad_p(mask, Pp)
        e2 = jnp.asarray(_e2(W, Gc))
        nblk = Pp // P_blk
        if slab > 0:
            kern = functools.partial(_fwd_kernel_slab, K=K, Gc=Gc, Hs=slab,
                                     mm_dtype=mm_dtype)
            scratch = [pltpu.VMEM((P_blk, WGc), jnp.float32)] * 2
        else:
            kern = functools.partial(_fwd_kernel, K=K, Gc=Gc, mm_dtype=mm_dtype)
            scratch = []
        out = pl.pallas_call(
            kern,
            grid=(BG, nblk),
            in_specs=[
                pl.BlockSpec((1, P_blk, K), lambda bg, p: (bg, p, 0)),   # fx
                pl.BlockSpec((1, P_blk, K), lambda bg, p: (bg, p, 0)),   # fy
                pl.BlockSpec((1, P_blk, K), lambda bg, p: (bg, p, 0)),   # mask
                pl.BlockSpec((1, H, WGc), lambda bg, p: (bg, 0, 0)),     # xg
                pl.BlockSpec((WGc, Gc), lambda bg, p: (0, 0)),           # e2
            ],
            out_specs=pl.BlockSpec((1, P_blk, Gc), lambda bg, p: (bg, p, 0)),
            out_shape=jax.ShapeDtypeStruct((BG, Pp, Gc), jnp.float32),
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_vmem_limit(P_blk, H, WGc)),
            interpret=interpret,
        )(fxp, fyp, mp, xg, e2)
        return out[:, :P]

    def bwd_call_slab(xg, fx, fy, mask, dout):
        BG, H, WGc = xg.shape
        _, P, K = fx.shape
        W = WGc // Gc
        P_blk = _block_size(P)
        Pp = _round_up(P, P_blk)
        mm_dtype = xg.dtype if xg.dtype == jnp.bfloat16 else jnp.float32
        fxp = _pad_p(fx, Pp, edge=True)
        fyp = _pad_p(fy, Pp, edge=True)
        mp = _pad_p(mask, Pp)
        xgT = xg.transpose(0, 2, 1)   # (BG, WGc, H)
        e2T = jnp.asarray(_e2(W, Gc).T)
        dout_p = _pad_p(dout, Pp).astype(jnp.float32)
        nblk = Pp // P_blk
        dxg, dfx, dfy, dm = pl.pallas_call(
            functools.partial(_bwd_kernel_slab, K=K, Gc=Gc, Hs=slab,
                              mm_dtype=mm_dtype),
            grid=(BG, nblk),
            in_specs=[
                pl.BlockSpec((1, P_blk, K), lambda bg, p: (bg, p, 0)),   # fx
                pl.BlockSpec((1, P_blk, K), lambda bg, p: (bg, p, 0)),   # fy
                pl.BlockSpec((1, P_blk, K), lambda bg, p: (bg, p, 0)),   # mask
                pl.BlockSpec((1, H, WGc), lambda bg, p: (bg, 0, 0)),     # xg
                pl.BlockSpec((1, WGc, H), lambda bg, p: (bg, 0, 0)),     # xgT
                pl.BlockSpec((Gc, WGc), lambda bg, p: (0, 0)),           # e2T
                pl.BlockSpec((1, P_blk, Gc), lambda bg, p: (bg, p, 0)),  # dout
            ],
            out_specs=[
                pl.BlockSpec((1, H, WGc), lambda bg, p: (bg, 0, 0)),
                pl.BlockSpec((1, P_blk, K), lambda bg, p: (bg, p, 0)),
                pl.BlockSpec((1, P_blk, K), lambda bg, p: (bg, p, 0)),
                pl.BlockSpec((1, P_blk, K), lambda bg, p: (bg, p, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((BG, H, WGc), jnp.float32),
                jax.ShapeDtypeStruct((BG, Pp, K), jnp.float32),
                jax.ShapeDtypeStruct((BG, Pp, K), jnp.float32),
                jax.ShapeDtypeStruct((BG, Pp, K), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((P_blk, WGc), jnp.float32),
                pltpu.VMEM((P_blk, K), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_vmem_limit(P_blk, H, WGc)),
            interpret=interpret,
        )(fxp, fyp, mp, xg, xgT, e2T, dout_p)
        return (dxg.astype(xg.dtype), dfx[:, :P], dfy[:, :P], dm[:, :P])

    def bwd_call(xg, fx, fy, mask, dout):
        BG, H, WGc = xg.shape
        _, P, K = fx.shape
        W = WGc // Gc
        P_blk = _block_size(P)
        Pp = _round_up(P, P_blk)
        mm_dtype = xg.dtype if xg.dtype == jnp.bfloat16 else jnp.float32
        fxp, fyp, mp = _pad_p(fx, Pp), _pad_p(fy, Pp), _pad_p(mask, Pp)
        fyT = fyp.transpose(0, 2, 1)  # (BG, K, Pp)
        xgT = xg.transpose(0, 2, 1)   # (BG, WGc, H)
        e2T = jnp.asarray(_e2(W, Gc).T)
        dout_p = _pad_p(dout, Pp).astype(jnp.float32)
        nblk = Pp // P_blk
        dxg, dfx, dfy, dm = pl.pallas_call(
            functools.partial(_bwd_kernel, K=K, Gc=Gc, mm_dtype=mm_dtype),
            grid=(BG, nblk),
            in_specs=[
                pl.BlockSpec((1, P_blk, K), lambda bg, p: (bg, p, 0)),   # fx
                pl.BlockSpec((1, P_blk, K), lambda bg, p: (bg, p, 0)),   # fy
                pl.BlockSpec((1, K, P_blk), lambda bg, p: (bg, 0, p)),   # fyT
                pl.BlockSpec((1, P_blk, K), lambda bg, p: (bg, p, 0)),   # mask
                pl.BlockSpec((1, H, WGc), lambda bg, p: (bg, 0, 0)),     # xg
                pl.BlockSpec((1, WGc, H), lambda bg, p: (bg, 0, 0)),     # xgT
                pl.BlockSpec((Gc, WGc), lambda bg, p: (0, 0)),           # e2T
                pl.BlockSpec((1, P_blk, Gc), lambda bg, p: (bg, p, 0)),  # dout
            ],
            out_specs=[
                pl.BlockSpec((1, H, WGc), lambda bg, p: (bg, 0, 0)),
                pl.BlockSpec((1, P_blk, K), lambda bg, p: (bg, p, 0)),
                pl.BlockSpec((1, P_blk, K), lambda bg, p: (bg, p, 0)),
                pl.BlockSpec((1, P_blk, K), lambda bg, p: (bg, p, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((BG, H, WGc), jnp.float32),
                jax.ShapeDtypeStruct((BG, Pp, K), jnp.float32),
                jax.ShapeDtypeStruct((BG, Pp, K), jnp.float32),
                jax.ShapeDtypeStruct((BG, Pp, K), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_vmem_limit(P_blk, H, WGc)),
            interpret=interpret,
        )(fxp, fyp, fyT, mp, xg, xgT, e2T, dout_p)
        return (dxg.astype(xg.dtype), dfx[:, :P], dfy[:, :P], dm[:, :P])

    @jax.custom_vjp
    def sampler(xg, fx, fy, mask):
        return fwd_call(xg, fx, fy, mask)

    def sampler_fwd(xg, fx, fy, mask):
        # Residual coords are saved TRANSPOSED (BG, K, P): a (BG, P, K)
        # fp32 tensor tiles its K=4 minor dim up to 128 lanes (32x padding
        # waste — 84 MB per saved 21504-query tensor at m2f 1024^2, an HBM
        # OOM); (BG, K, P) only pads K to 8 sublanes.  The barrier keeps XLA
        # from CSE-ing the transpose pair and saving the padded original.
        # (xg stays OUTSIDE the barrier: it is saved by reference/alias, and
        # barriering it forces a materialised copy per call site)
        res = (xg,) + jax.lax.optimization_barrier(
            (fx.transpose(0, 2, 1), fy.transpose(0, 2, 1),
             mask.transpose(0, 2, 1)))
        return fwd_call(xg, fx, fy, mask), res

    def sampler_bwd(res, dout):
        xg, fxT, fyT, maskT = res
        bwd = bwd_call_slab if slab > 0 else bwd_call
        return bwd(xg, fxT.transpose(0, 2, 1), fyT.transpose(0, 2, 1),
                   maskT.transpose(0, 2, 1), dout)

    sampler.defvjp(sampler_fwd, sampler_bwd)
    return sampler


def _auto_slab(H: int) -> int:
    """Row-slab height for the skip kernels: default 0 (dense) everywhere.

    Measured end-to-end (v5e, 2026-08-20 r4f sweep): slab predication LOSES
    in both training regimes it was built for — internimage_t+upernet B=12
    @224 42.06 vs 60.94 img/s dense, and Mask2Former B=1x3 @1024 4210 vs
    2948 ms/step dense — the per-slab branch overhead and smaller hat
    matmuls cost more than the skipped rows save.  Dense is the default;
    ``SAMRS_BILINEAR_SLAB=<h>`` forces slab height h (A/B escape hatch,
    used where it divides H), ``=0`` forces dense explicitly."""
    import os

    env = os.environ.get("SAMRS_BILINEAR_SLAB")
    if env is not None:
        s = int(env)
        return s if s > 0 and H % s == 0 else 0
    return 0


def sample_weighted(xg: jnp.ndarray, fx: jnp.ndarray, fy: jnp.ndarray,
                    mask: jnp.ndarray, group_channels: int,
                    interpret: bool = False, row_slab: int = 0,
                    fwd_gather: bool = False) -> jnp.ndarray:
    """Weighted bilinear gather core (absolute pixel coords, zero padding).

    xg (BG, H, W*Gc) any float dtype; fx/fy/mask (BG, P, K) fp32.
    Returns (BG, P, Gc) fp32: sum_k mask_k * xg[fy_k, fx_k, :].
    row_slab > 0 (must divide H) selects the slab-skipping kernels: hat
    matmuls run per row_slab-row slab of the map, branched over when no tap
    of the query block lands there — a large win when sampling offsets are
    local relative to the map height (deformable attention), a small
    constant loss otherwise.
    """
    if row_slab > 0 and xg.shape[1] % row_slab != 0:
        row_slab = 0
    return _make_sampler(int(group_channels), bool(interpret),
                         int(row_slab), bool(fwd_gather))(xg, fx, fy, mask)


# ---------------------------------------------------------------------------
# DCNv3 (kernels/sampling.py::dcnv3 semantics)
# ---------------------------------------------------------------------------


def _dcnv3_base_grid(
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
    row_slab: Optional[int] = None,
) -> jnp.ndarray:
    """DCNv3 core, same semantics as kernels/sampling.py::dcnv3 (NHWC).

    x (B,H,W,G*Gc) any float dtype; offset (B,Ho,Wo,G*K*2) and mask
    (B,Ho,Wo,G*K) fp32.  Returns (B,Ho,Wo,G*Gc) fp32.
    row_slab: None = auto (slab-skipping hat matmuls on maps >= 32 rows;
    DCNv3 taps are a 3x3 ring plus small learned offsets around each output
    pixel, so a raster query block touches a narrow row band); 0 = dense.
    """
    B, H, W, _ = x.shape
    _, Ho, Wo, _ = offset.shape
    G, Gc, K = groups, group_channels, kernel_h * kernel_w
    P = Ho * Wo

    xg = x.reshape(B, H, W, G, Gc).transpose(0, 3, 1, 2, 4).reshape(B * G, H, W * Gc)
    off = offset.reshape(B, P, G, K, 2).transpose(0, 2, 1, 3, 4).reshape(B * G, P, K, 2)
    m = mask.reshape(B, P, G, K).transpose(0, 2, 1, 3).reshape(B * G, P, K)
    bx, by = _dcnv3_base_grid(Ho, Wo, kernel_h, kernel_w, stride_h, stride_w,
                              pad_h, pad_w, dilation_h, dilation_w)
    fx = jnp.asarray(bx) + off[..., 0] * offset_scale
    fy = jnp.asarray(by) + off[..., 1] * offset_scale

    slab = _auto_slab(H) if row_slab is None else row_slab
    out = sample_weighted(xg, fx, fy, m, Gc, interpret,
                          row_slab=slab)  # (BG, P, Gc)
    out = out.reshape(B, G, Ho, Wo, Gc).transpose(0, 2, 3, 1, 4)
    return out.reshape(B, Ho, Wo, G * Gc)


# ---------------------------------------------------------------------------
# grid_sample (kernels/sampling.py::grid_sample semantics, K=1)
# ---------------------------------------------------------------------------


def grid_sample_pallas(
    img: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """torch-compatible bilinear grid sample, NHWC, zero padding.

    img (B,H,W,C) any float dtype; grid (B,Ho,Wo,2) normalized [-1,1].
    Returns (B,Ho,Wo,C) fp32.  Oracle: kernels/sampling.py::grid_sample.
    """
    B, H, W, C = img.shape
    _, Ho, Wo, _ = grid.shape
    P = Ho * Wo
    gx = grid[..., 0].reshape(B, P, 1)
    gy = grid[..., 1].reshape(B, P, 1)
    if align_corners:
        fx = (gx + 1.0) * 0.5 * (W - 1)
        fy = (gy + 1.0) * 0.5 * (H - 1)
    else:
        fx = ((gx + 1.0) * W - 1.0) * 0.5
        fy = ((gy + 1.0) * H - 1.0) * 0.5
    xg = img.reshape(B, H, W * C)
    ones = jnp.ones((B, P, 1), jnp.float32)
    out = sample_weighted(xg, fx.astype(jnp.float32), fy.astype(jnp.float32),
                          ones, C, interpret)
    return out.reshape(B, Ho, Wo, C)


# ---------------------------------------------------------------------------
# point_sample: many single-channel masks, per-mask point sets
# (mmcv.ops.point_sample for the Mask2Former point losses).
#
# The main core keeps channels in lanes and points in sublanes — with C=1
# (mask logits) every (BG, P, 1) input/output pads its size-1 minor dim to
# 128 lanes: 128x HBM waste (3.6 GB temps at m2f 512^2 3-head, an OOM).
# This variant puts the POINTS in lanes and the single channel nowhere:
# fx/fy/out are (N, K) 2-D, and the gather is
#     t = imgT @ hat(fy - iota_H)        (W, H) @ (H, Kb)   [MXU]
#     out = sum_w hat(fx - iota_W) * t   (1, Kb)
# with the backward as NT dot_generals (dimg = wy @ dt^T contraction).
# ---------------------------------------------------------------------------


def _ps_fwd_kernel(fx_ref, fy_ref, xgT_ref, out_ref, *, mm_dtype):
    W, H = xgT_ref.shape[1], xgT_ref.shape[2]
    Kb = fx_ref.shape[2]
    fx = fx_ref[0]  # (1, Kb) fp32 absolute pixel coords
    fy = fy_ref[0]
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (H, Kb), 0).astype(jnp.float32)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, Kb), 0).astype(jnp.float32)
    prec = jax.lax.Precision.HIGHEST if mm_dtype == jnp.float32 else None
    wy = _hat(fy - iota_h)  # (H, Kb)
    t = jax.lax.dot(xgT_ref[0].astype(mm_dtype), wy.astype(mm_dtype),
                    precision=prec,
                    preferred_element_type=jnp.float32)  # (W, Kb)
    wx = _hat(fx - iota_w)  # (W, Kb)
    out_ref[0] = jnp.sum(wx * t, axis=0, keepdims=True).astype(out_ref.dtype)


def _ps_bwd_kernel(fx_ref, fy_ref, xg_ref, xgT_ref, dout_ref,
                   dxg_ref, dfx_ref, dfy_ref, *, mm_dtype):
    H, W = xg_ref.shape[1], xg_ref.shape[2]
    Kb = fx_ref.shape[2]

    @pl.when(pl.program_id(1) == 0)
    def _init():
        dxg_ref[0] = jnp.zeros_like(dxg_ref[0])

    fx = fx_ref[0]  # (1, Kb)
    fy = fy_ref[0]
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (H, Kb), 0).astype(jnp.float32)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (W, Kb), 0).astype(jnp.float32)
    ty = fy - iota_h
    wy = _hat(ty)  # (H, Kb)
    tx = fx - iota_w
    wx = _hat(tx)  # (W, Kb)
    dout = dout_ref[0]  # (1, Kb)
    prec = jax.lax.Precision.HIGHEST if mm_dtype == jnp.float32 else None
    t = jax.lax.dot(xgT_ref[0].astype(mm_dtype), wy.astype(mm_dtype),
                    precision=prec,
                    preferred_element_type=jnp.float32)  # (W, Kb)
    dt = wx * dout  # (W, Kb) — dL/dt, dout broadcast over rows
    # dimg[h, w] = sum_k wy[h, k] * dt[w, k]  (NT matmul)
    dxg = jax.lax.dot_general(
        wy.astype(mm_dtype), dt.astype(mm_dtype),
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=prec,
        preferred_element_type=jnp.float32)  # (H, W)
    dxg_ref[0] += dxg.astype(dxg_ref.dtype)
    dfx_ref[0] = jnp.sum(_dhat(tx) * t * dout, axis=0, keepdims=True
                         ).astype(dfx_ref.dtype)
    u = jax.lax.dot(xg_ref[0].astype(mm_dtype), wx.astype(mm_dtype),
                    precision=prec,
                    preferred_element_type=jnp.float32)  # (H, Kb)
    dfy_ref[0] = jnp.sum(_dhat(ty) * u * dout, axis=0, keepdims=True
                         ).astype(dfy_ref.dtype)


def _pad_k2(a: jnp.ndarray, Kp: int, value: float):
    K = a.shape[1]
    if K == Kp:
        return a
    return jnp.pad(a, ((0, 0), (0, Kp - K)), constant_values=value)


@functools.lru_cache(maxsize=None)
def _make_point_sampler(interpret: bool):
    def fwd_call(img, fx, fy):
        N, H, W = img.shape
        K = fx.shape[1]
        Kb = min(512, _round_up(K, 128))
        Kp = _round_up(K, Kb)
        mm_dtype = img.dtype if img.dtype == jnp.bfloat16 else jnp.float32
        # pad points far outside the map: hat weights (and dhat) vanish there
        fxp = _pad_k2(fx, Kp, -10.0)
        fyp = _pad_k2(fy, Kp, -10.0)
        imgT = img.transpose(0, 2, 1)
        # coords ride 3-D (N, 1, Kp) refs: Mosaic wants block dim -2 either
        # %8 or equal to the array dim, and a (1, Kb) block over (N, Kp) is
        # neither — (1, 1, Kb) over (N, 1, Kp) is.
        out = pl.pallas_call(
            functools.partial(_ps_fwd_kernel, mm_dtype=mm_dtype),
            grid=(N, Kp // Kb),
            in_specs=[
                pl.BlockSpec((1, 1, Kb), lambda n, k: (n, 0, k)),  # fx
                pl.BlockSpec((1, 1, Kb), lambda n, k: (n, 0, k)),  # fy
                pl.BlockSpec((1, W, H), lambda n, k: (n, 0, 0)),   # imgT
            ],
            out_specs=pl.BlockSpec((1, 1, Kb), lambda n, k: (n, 0, k)),
            out_shape=jax.ShapeDtypeStruct((N, 1, Kp), jnp.float32),
            interpret=interpret,
        )(fxp[:, None], fyp[:, None], imgT)
        return out[:, 0, :K]

    def bwd_call(img, fx, fy, dout):
        N, H, W = img.shape
        K = fx.shape[1]
        Kb = min(512, _round_up(K, 128))
        Kp = _round_up(K, Kb)
        mm_dtype = img.dtype if img.dtype == jnp.bfloat16 else jnp.float32
        fxp = _pad_k2(fx, Kp, -10.0)
        fyp = _pad_k2(fy, Kp, -10.0)
        dout_p = _pad_k2(dout.astype(jnp.float32), Kp, 0.0)
        imgT = img.transpose(0, 2, 1)
        dimg, dfx, dfy = pl.pallas_call(
            functools.partial(_ps_bwd_kernel, mm_dtype=mm_dtype),
            grid=(N, Kp // Kb),
            in_specs=[
                pl.BlockSpec((1, 1, Kb), lambda n, k: (n, 0, k)),  # fx
                pl.BlockSpec((1, 1, Kb), lambda n, k: (n, 0, k)),  # fy
                pl.BlockSpec((1, H, W), lambda n, k: (n, 0, 0)),   # img
                pl.BlockSpec((1, W, H), lambda n, k: (n, 0, 0)),   # imgT
                pl.BlockSpec((1, 1, Kb), lambda n, k: (n, 0, k)),  # dout
            ],
            out_specs=[
                pl.BlockSpec((1, H, W), lambda n, k: (n, 0, 0)),
                pl.BlockSpec((1, 1, Kb), lambda n, k: (n, 0, k)),
                pl.BlockSpec((1, 1, Kb), lambda n, k: (n, 0, k)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((N, H, W), jnp.float32),
                jax.ShapeDtypeStruct((N, 1, Kp), jnp.float32),
                jax.ShapeDtypeStruct((N, 1, Kp), jnp.float32),
            ],
            interpret=interpret,
        )(fxp[:, None], fyp[:, None], img, imgT, dout_p[:, None])
        return dimg.astype(img.dtype), dfx[:, 0, :K], dfy[:, 0, :K]

    @jax.custom_vjp
    def sampler(img, fx, fy):
        return fwd_call(img, fx, fy)

    def sampler_fwd(img, fx, fy):
        return fwd_call(img, fx, fy), (img, fx, fy)

    def sampler_bwd(res, dout):
        return bwd_call(*res, dout)

    sampler.defvjp(sampler_fwd, sampler_bwd)
    return sampler


def point_sample_pallas(img: jnp.ndarray, grid: jnp.ndarray,
                        interpret: bool = False) -> jnp.ndarray:
    """Per-mask bilinear point sampling, points-in-lanes layout.

    img (N, H, W) any float dtype; grid (N, K, 2) normalized [-1, 1]
    (align_corners=False, zero padding).  Returns (N, K) fp32.
    Oracle: kernels/sampling.py::grid_sample with C=1.
    """
    N, H, W = img.shape
    fx = ((grid[..., 0] + 1.0) * W - 1.0) * 0.5
    fy = ((grid[..., 1] + 1.0) * H - 1.0) * 0.5
    return _make_point_sampler(bool(interpret))(
        img, fx.astype(jnp.float32), fy.astype(jnp.float32))


# ---------------------------------------------------------------------------
# MSDeformAttn (kernels/sampling.py::ms_deform_attn semantics)
# ---------------------------------------------------------------------------


def ms_deform_attn_pallas(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    interpret: bool = False,
    row_slab: Optional[int] = None,
    fwd_gather: bool = False,
) -> jnp.ndarray:
    """Multi-scale deformable attention on the hat-matmul core.

    value (B,S,nH,D); spatial_shapes static [(H_l,W_l)], sum == S;
    sampling_locations (B,Q,nH,L,P,2) in [0,1]; attention_weights
    (B,Q,nH,L,P).  Returns (B,Q,nH*D) fp32.
    Oracle: kernels/sampling.py::ms_deform_attn (itself parity-tested against
    ms_deform_attn_core_pytorch, ED/backbone/ops/functions/ms_deform_attn_func.py:49-71).
    row_slab: None = auto per level (slab-skipping kernels on maps >= 32 rows
    — queries are raster tokens, so each 128-query block samples a narrow
    row band and the skipped slab matmuls dominate at large maps); 0 = dense.
    """
    B, S, nH, D = value.shape
    _, Q, _, L, Pt, _ = sampling_locations.shape
    splits = [h * w for h, w in spatial_shapes]
    split_pts = list(np.cumsum(splits)[:-1])
    values = jnp.split(value, split_pts, axis=1)
    out = jnp.zeros((B * nH, Q, D), jnp.float32)
    for lvl, (h, w) in enumerate(spatial_shapes):
        v = values[lvl].reshape(B, h, w, nH, D).transpose(0, 3, 1, 2, 4)
        xg = v.reshape(B * nH, h, w * D)
        # [0,1] -> pixel coords, align_corners=False: fx = loc*W - 0.5
        loc = sampling_locations[:, :, :, lvl]  # (B, Q, nH, Pt, 2)
        loc = loc.transpose(0, 2, 1, 3, 4).reshape(B * nH, Q, Pt, 2)
        fx = loc[..., 0] * w - 0.5
        fy = loc[..., 1] * h - 0.5
        wts = attention_weights[:, :, :, lvl].transpose(0, 2, 1, 3)
        wts = wts.reshape(B * nH, Q, Pt).astype(jnp.float32)
        slab = _auto_slab(h) if row_slab is None else row_slab
        out = out + sample_weighted(xg, fx.astype(jnp.float32),
                                    fy.astype(jnp.float32), wts, D, interpret,
                                    row_slab=slab, fwd_gather=fwd_gather)
    out = out.reshape(B, nH, Q, D).transpose(0, 2, 1, 3)
    return out.reshape(B, Q, nH * D)


def ms_deform_attn_hybrid(
    value: jnp.ndarray,
    spatial_shapes: Sequence[Tuple[int, int]],
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    min_rows_xla: int = 128,
    interpret: bool = False,
    big_impl: str = "xla",
) -> jnp.ndarray:
    """Per-level impl split for multi-scale deformable attention.

    The hat-matmul kernels do O(H_l) MXU work per sample (one (P_blk, H_l)
    row-reduction matmul per tap), so their cost grows with the map height
    while a native gather is O(1) per sample: at 224^2 training shapes the
    matmuls win 15x (18.3 vs 272 ms/call), but at Mask2Former's 1024^2
    tiles the stride-8 level is a 128x128 map and the same formulation
    burns ~2000x the useful FLOPs.  Levels with ``H_l >= min_rows_xla``
    take XLA's gather lowering (kernels/sampling.py::ms_deform_attn on the
    single-level slice), smaller levels stay on the Pallas kernels; the sum
    is exact — levels are independent additive terms.

    big_impl selects the large-level path: "xla" = the pure-JAX oracle
    (autodiff backward -> XLA scatter-add), "ghb" = gather forward + the
    transposed-hat Pallas backward (avoids the scatter lowering, keeps the
    O(1)-per-sample forward).
    """
    from samrs_tpu.kernels.sampling import ms_deform_attn as _msda_xla

    B, S, nH, D = value.shape
    Q = sampling_locations.shape[1]
    splits = [h * w for h, w in spatial_shapes]
    bounds = np.concatenate([[0], np.cumsum(splits)])
    out = jnp.zeros((B, Q, nH * D), jnp.float32)
    for i, (h, w) in enumerate(spatial_shapes):
        vi = value[:, bounds[i]:bounds[i + 1]]
        li = sampling_locations[:, :, :, i:i + 1]
        wi = attention_weights[:, :, :, i:i + 1]
        if h >= min_rows_xla:
            if big_impl == "ghb":
                o = ms_deform_attn_pallas(vi, [spatial_shapes[i]], li, wi,
                                          interpret=interpret, row_slab=0,
                                          fwd_gather=True)
            else:
                o = _msda_xla(vi, [spatial_shapes[i]], li, wi)
        else:
            o = ms_deform_attn_pallas(vi, [spatial_shapes[i]], li, wi,
                                      interpret=interpret)
        out = out + o.astype(jnp.float32)
    return out
