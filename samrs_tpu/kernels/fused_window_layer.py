"""Whole-window-layer kernel: qkv projection + window attention + output
projection in ONE Pallas call, weights resident in VMEM.

Motivation (ViT-H B=4 encoder trace, v5e): the partitioned window-attention
pipeline spends ~1.6 ms/layer moving data it immediately throws away —
window-partition transpose copies of the qkv map (0.36 ms), the
(19600,3840)->(100,196,3840) re-tiling reshape (0.47 ms, 196 rows are not a
sublane multiple), the q slice feeding the rel-pos einsums (0.16 ms), layout
copies around the attention kernel and the proj Dense (~0.5 ms), and the
unpartition+crop (0.17 ms).  This kernel removes ALL of it:

  * input is the zero-PADDED normed token map viewed 6-D as
    (B, nwh, ws, nww, ws, C) — a pure dimension split, never a transpose —
    and the grid (B, nwh, nww) carves one (ws, ws) window per program;
  * Wqkv (C, 3C) and Wproj (C, C) ride along as constant-index blocks, so
    Mosaic DMAs them into VMEM once and keeps them resident across all
    programs (ViT-H: 9.8 MB + 3.3 MB bf16 — the pallas_call raises
    `vmem_limit_bytes` above the 16 MB default);
  * qkv runs in-kernel on the zero-padded x, so pad tokens carry
    k = v = qkv BIAS — bit-identical to the reference, which zero-pads the
    normed map BEFORE its qkv projection (GD/segment_anything/modeling/
    image_encoder.py:243-289) and lets pad tokens participate unmasked;
  * decomposed rel-pos rides the augmented-K matmul (one (N, hd+2ws) x
    (hd+2ws, N) MXU op per head); the per-token rel projections are computed
    OUTSIDE from the normed map with the qkv weights folded into the tables:
        rel_h[b,x,y,(n k)] = q[b,x,y,n] . Rh[x%ws, k]
                           = xn[b,x,y] . G_h[x%ws, :, (n k)] + bias_h[x%ws]
    where G_h[r] = Wq_heads @ Rh[r]^T — a ws-batched matmul on the padded
    map (~0.12 ms/layer at ViT-H B=4) instead of slicing q back out of the
    partitioned qkv tensor;
  * per-head outputs concatenate along lanes and feed the proj matmul while
    the window is still in VMEM; the output lands in the padded 6-D map
    layout (crop + residual add are one fused XLA op outside).

Forward-only; backward falls back to the XLA composition via custom_vjp
(free rematerialization — the forward stores only the layer inputs).

MEASURED (2026-08-19, v5e, ViT-H B=4, inside the full encoder jit):
53.1 ms/img vs 66.0 ms/img for the partitioned fused kernel
(kernels/fused_attention.py) — a 1.24x layer-level win; bench.py box-prompted
generation 12.9 -> 14.4 img/s.  `window_attn_impl="block"` is the default.

Reference hot path replaced: GD/segment_anything/modeling/
image_encoder.py:119-240 (windowed Block + Attention) and :325-361
(add_decomposed_rel_pos).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from samrs_tpu.kernels.fused_window_block import _onehots


def _dense_like(x, w, b, dtype):
    """Matches nn.Dense numerics: bf16 matmul (fp32 MXU accum, rounded to the
    compute dtype) + bias add in the compute dtype."""
    y = jax.lax.dot_general(
        x.astype(dtype), w.astype(dtype),
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=dtype,
    )
    if b is not None:
        y = y + b.astype(dtype)
    return y


def _rel_projections_folded(xp, Wqkv, bqkv, Rh, Rw, ws, num_heads):
    """Per-token rel-pos projections with the q weights folded in.

    xp: (B, Hp, Wp, C) zero-padded normed map (Hp, Wp multiples of ws).
    Returns rel_h, rel_w: (B, Hp, Wp, nH*ws) in xp.dtype, where
    rel_h[b,x,y,n*ws+u] = (xp[b,x,y] @ Wq + bq)[n] . Rh[x % ws, u].
    """
    B, Hp, Wp, C = xp.shape
    nH = num_heads
    hd = C // nH
    dt = xp.dtype
    Wq = Wqkv[:, :C].reshape(C, nH, hd)
    bq = (bqkv[:C] if bqkv is not None else jnp.zeros((C,), Wqkv.dtype)).reshape(nH, hd)
    # G[r] = Wq_heads @ Rh[r]^T : (ws, C, nH*ws); bias term (ws, nH*ws)
    G_h = jnp.einsum("cnd,rkd->rcnk", Wq, Rh).reshape(ws, C, nH * ws).astype(dt)
    G_w = jnp.einsum("cnd,rkd->rcnk", Wq, Rw).reshape(ws, C, nH * ws).astype(dt)
    B_h = jnp.einsum("nd,rkd->rnk", bq, Rh).reshape(ws, nH * ws).astype(jnp.float32)
    B_w = jnp.einsum("nd,rkd->rnk", bq, Rw).reshape(ws, nH * ws).astype(jnp.float32)
    x5h = xp.reshape(B, Hp // ws, ws, Wp, C)
    rel_h = jnp.einsum("birwc,rck->birwk", x5h, G_h,
                       preferred_element_type=jnp.float32)
    rel_h = (rel_h + B_h[None, None, :, None, :]).reshape(B, Hp, Wp, nH * ws)
    x5w = xp.reshape(B, Hp, Wp // ws, ws, C)
    rel_w = jnp.einsum("bhjrc,rck->bhjrk", x5w, G_w,
                       preferred_element_type=jnp.float32)
    rel_w = (rel_w + B_w[None, None, None, :, :]).reshape(B, Hp, Wp, nH * ws)
    return rel_h.astype(dt), rel_w.astype(dt)


def _rel_projections_slab(xp, Wqkv, bqkv, Rh, Rw, ws, num_heads):
    """Same math as `_rel_projections_folded`, lowered as 2*ws SMALL matmuls
    on 6-D slabs instead of two ws-batched einsums.

    Motivation (ViT-H B=4 optimized-HLO read): XLA lowers the batched
    `birwc,rck` / `bhjrc,rck` einsums as fp32 `convolution-base-dilated` ops
    whose operands need TWO extra ~51 MB layout copies of the padded map per
    layer (the x5h/x5w views in non-standard layouts).  Slicing slab r out of
    the standard-layout 6-D view and matmul'ing it against G[r] keeps every
    operand in the layout it already has.  Returns rel_h6, rel_w6 ALREADY in
    the kernel's 6-D window layout (B, nwh, ws, nww, ws, nH*ws)."""
    B, Hp, Wp, C = xp.shape
    nH = num_heads
    hd = C // nH
    dt = xp.dtype
    Wq = Wqkv[:, :C].reshape(C, nH, hd)
    bq = (bqkv[:C] if bqkv is not None else jnp.zeros((C,), Wqkv.dtype)).reshape(nH, hd)
    G_h = jnp.einsum("cnd,rkd->rcnk", Wq, Rh).reshape(ws, C, nH * ws).astype(dt)
    G_w = jnp.einsum("cnd,rkd->rcnk", Wq, Rw).reshape(ws, C, nH * ws).astype(dt)
    B_h = jnp.einsum("nd,rkd->rnk", bq, Rh).reshape(ws, nH * ws).astype(jnp.float32)
    B_w = jnp.einsum("nd,rkd->rnk", bq, Rw).reshape(ws, nH * ws).astype(jnp.float32)
    x6 = xp.reshape(B, Hp // ws, ws, Wp // ws, ws, C)
    dot = lambda a, g: jax.lax.dot_general(
        a, g, dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    rel_h6 = jnp.stack(
        [(dot(x6[:, :, r], G_h[r]) + B_h[r]).astype(dt) for r in range(ws)],
        axis=2,
    )
    rel_w6 = jnp.stack(
        [(dot(x6[:, :, :, :, r], G_w[r]) + B_w[r]).astype(dt) for r in range(ws)],
        axis=4,
    )
    return rel_h6, rel_w6


def window_layer_xla(xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, ws, scale,
                     num_heads, dtype=jnp.bfloat16):
    """Pure-JAX oracle: zero-pad -> qkv -> windowed rel-pos attention -> proj.

    xn: (B, H, W, C) normed UNPADDED map.  Returns (B, H, W, C) in `dtype`
    (residual add happens in the caller)."""
    B, H, W, C = xn.shape
    nH = num_heads
    hd = C // nH
    Hp, Wp = -(-H // ws) * ws, -(-W // ws) * ws
    xp = jnp.pad(xn, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
    qkv = _dense_like(xp.reshape(-1, C), Wqkv, bqkv, dtype).reshape(B, Hp, Wp, 3 * C)
    nwh, nww = Hp // ws, Wp // ws
    x6 = qkv.reshape(B, nwh, ws, nww, ws, 3, nH, hd)
    x6 = x6.transpose(0, 1, 3, 5, 6, 2, 4, 7)  # (B,nwh,nww,3,nH,ws,ws,hd)
    x6 = x6.reshape(B * nwh * nww, 3, nH, ws * ws, hd)
    q = x6[:, 0].astype(jnp.float32)
    k = x6[:, 1].astype(jnp.float32)
    v = x6[:, 2].astype(jnp.float32)
    s = jnp.einsum("wnqd,wnkd->wnqk", q * scale, k)
    rq = q.reshape(-1, nH, ws, ws, hd)
    rel_h = jnp.einsum("wnxyd,xud->wnxyu", rq, Rh.astype(jnp.float32))
    rel_w = jnp.einsum("wnxyd,yvd->wnxyv", rq, Rw.astype(jnp.float32))
    s = s.reshape(-1, nH, ws, ws, ws, ws)
    s = s + rel_h[..., :, None] + rel_w[..., None, :]
    s = s.reshape(-1, nH, ws * ws, ws * ws)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("wnqk,wnkd->wnqd", p, v).astype(dtype)
    o = o.reshape(B, nwh, nww, nH, ws, ws, hd)
    o = o.transpose(0, 1, 4, 2, 5, 3, 6).reshape(B, Hp, Wp, C)[:, :H, :W]
    return _dense_like(o.reshape(-1, C), Wproj, bproj, dtype).reshape(B, H, W, C)


def _kernel(x_ref, rh_ref, rw_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
            eu_ref, ev_ref, o_ref, *, scale, nH, hd, ws):
    n = ws * ws
    C = nH * hd
    x = x_ref[0, 0, :, 0].reshape(n, C)  # sublane-collapse reshape
    qkv = jax.lax.dot_general(
        x, wqkv_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + bqkv_ref[...].astype(x.dtype)  # (n, 3C), Dense numerics
    rel_h = rh_ref[0, 0, :, 0].reshape(n, nH * ws)
    rel_w = rw_ref[0, 0, :, 0].reshape(n, nH * ws)
    eu = eu_ref[...]  # (n, ws) one-hot row/col expansions
    ev = ev_ref[...]
    outs = []
    for h in range(nH):  # static unroll; all slices at static lane offsets
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, C + h * hd:C + (h + 1) * hd]
        v = qkv[:, 2 * C + h * hd:2 * C + (h + 1) * hd]
        # augmented-K: one matmul carries QK^T and both rel-pos biases
        q_aug = jnp.concatenate([
            q * scale,
            rel_h[:, h * ws:(h + 1) * ws],
            rel_w[:, h * ws:(h + 1) * ws],
        ], axis=-1)  # (n, hd + 2ws)
        k_aug = jnp.concatenate([k, eu, ev], axis=-1)
        s = jax.lax.dot_general(
            q_aug, k_aug, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        # NB: the global kernels fold the row-sum into PV via a ones lane;
        # here that LOSES (62.0 vs 57.6 ms/iter windowed total, B=4 ViT-H) —
        # the per-head (n, hd) concat copies cost more than the small
        # (n, 196) sum+divide they remove.  Keep the plain normalization.
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append(o.astype(x.dtype))
    att = jnp.concatenate(outs, axis=-1)  # (n, C)
    out = jax.lax.dot_general(
        att, wproj_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + bproj_ref[...].astype(x.dtype)
    o_ref[0, 0, :, 0] = out.reshape(ws, ws, C)


def _kernel_q(qkv_ref, rh_ref, rw_ref, bqkv_ref, wproj_ref, bproj_ref,
              eu_ref, ev_ref, o_ref, *, scale, nH, hd, ws):
    """qkv-outside variant: the qkv projection runs OUTSIDE the kernel as one
    giant M = B*H*W matmul (full MXU row occupancy on the UNPADDED tokens,
    vs M=196 per program in `_kernel`); this kernel consumes the zero-padded
    no-bias qkv map viewed 6-D and adds the bias in VMEM, so pad tokens carry
    k = v = bias exactly as the reference's pad-before-qkv does."""
    n = ws * ws
    C = nH * hd
    qkv = (qkv_ref[0, 0, :, 0].reshape(n, 3 * C)
           + bqkv_ref[...].astype(qkv_ref.dtype))
    rel_h = rh_ref[0, 0, :, 0].reshape(n, nH * ws)
    rel_w = rw_ref[0, 0, :, 0].reshape(n, nH * ws)
    eu = eu_ref[...]
    ev = ev_ref[...]
    outs = []
    for h in range(nH):  # static unroll; all slices at static lane offsets
        q = qkv[:, h * hd:(h + 1) * hd]
        k = qkv[:, C + h * hd:C + (h + 1) * hd]
        v = qkv[:, 2 * C + h * hd:2 * C + (h + 1) * hd]
        q_aug = jnp.concatenate([
            q * scale,
            rel_h[:, h * ws:(h + 1) * ws],
            rel_w[:, h * ws:(h + 1) * ws],
        ], axis=-1)  # (n, hd + 2ws)
        k_aug = jnp.concatenate([k, eu, ev], axis=-1)
        s = jax.lax.dot_general(
            q_aug, k_aug, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append(o.astype(qkv.dtype))
    att = jnp.concatenate(outs, axis=-1)  # (n, C)
    out = jax.lax.dot_general(
        att, wproj_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(qkv.dtype) + bproj_ref[...].astype(qkv.dtype)
    o_ref[0, 0, :, 0] = out.reshape(ws, ws, nH * hd)


def _pallas_q(xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, ws, scale, num_heads,
              dtype=jnp.bfloat16, interpret=False):
    """qkv-outside whole-layer call (`window_attn_impl="blockq"`).

    Bit-compatibility with `_pallas`: the no-bias qkv matmul runs on the
    unpadded tokens (fp32 MXU accum -> round to `dtype`, exactly the kernel's
    dot), the output map is zero-padded (matmul of a zero row is zero), and
    the bias is added in-kernel — so pad tokens still see k = v = bias."""
    B, H, W, C = xn.shape
    nH = num_heads
    hd = C // nH
    n = ws * ws
    Hp, Wp = -(-H // ws) * ws, -(-W // ws) * ws
    nwh, nww = Hp // ws, Wp // ws
    xd = xn.astype(dtype)
    xp = jnp.pad(xd, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
    rel_h, rel_w = _rel_projections_folded(xp, Wqkv, bqkv, Rh, Rw, ws, nH)
    eu, ev = _onehots(ws, dtype)
    bqkv_k = (bqkv if bqkv is not None else jnp.zeros((3 * C,), Wqkv.dtype))
    bproj_k = (bproj if bproj is not None else jnp.zeros((C,), Wproj.dtype))

    qkv_nb = jax.lax.dot_general(
        xd.reshape(-1, C), Wqkv.astype(dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype).reshape(B, H, W, 3 * C)
    qkv_p = jnp.pad(qkv_nb, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
    q6 = qkv_p.reshape(B, nwh, ws, nww, ws, 3 * C)  # free dimension split
    r6 = lambda r: r.reshape(B, nwh, ws, nww, ws, nH * ws)
    win = lambda lanes: pl.BlockSpec(
        (1, 1, ws, 1, ws, lanes), lambda b, i, j: (b, i, 0, j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    cst = lambda *shape: pl.BlockSpec(
        shape, lambda b, i, j: (0,) * len(shape), memory_space=pltpu.VMEM,
    )
    kernel = functools.partial(_kernel_q, scale=scale, nH=nH, hd=hd, ws=ws)
    out6 = pl.pallas_call(
        kernel,
        grid=(B, nwh, nww),
        in_specs=[
            win(3 * C),
            win(nH * ws), win(nH * ws),
            cst(1, 3 * C),
            cst(C, C), cst(1, C),
            cst(n, ws), cst(n, ws),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, ws, 1, ws, C), lambda b, i, j: (b, i, 0, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, nwh, ws, nww, ws, C), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Hp * Wp * C * C
            + 4 * B * nwh * nww * nH * n * n * (hd + 2 * ws),
            bytes_accessed=B * Hp * Wp * (4 * C + 2 * nH * ws) * 2
            + C * C * 2,
            transcendentals=B * nwh * nww * nH * n * n,
        ),
        interpret=interpret,
    )(q6, r6(rel_h), r6(rel_w),
      bqkv_k.astype(dtype).reshape(1, 3 * C),
      Wproj.astype(dtype), bproj_k.astype(dtype).reshape(1, C),
      eu, ev)
    return out6.reshape(B, Hp, Wp, C)[:, :H, :W]


def _kernel2(x_ref, sc_ref, rh_ref, rw_ref, wqkv_ref, bqkv_ref, wproj_ref,
             bproj_ref, eu_ref, ev_ref, o_ref, acc_ref,
             *, scale, nH, hd, ws, W, nww):
    """Row-block variant with in-kernel window extraction and fused residual.

    x/rel ride as (1, ws, Wp, lanes) ROW blocks of the padded 4-D maps (last
    two block dims are the FULL array dims — Mosaic-legal — so NO 6-D-view
    layout copies are needed on the XLA side); the shortcut and the output are
    (1, ws, W, C) row blocks of the UNPADDED maps.  The grid is
    (B, nwh, nww) with j innermost: the row blocks keep a constant index
    across j (one DMA per row), each program extracts window j with a STATIC
    value slice under pl.when (Mosaic rejects dynamic sublane offsets that
    are not provably 8-multiples; static ws-offset slices are the verified
    block_row pattern — and the ~0.6 MB pre-qkv repack here is 15x smaller
    than block_row's post-qkv extraction, which measured 63 vs 54 ms/img),
    attention runs per-window exactly as `_kernel`, the result accumulates
    into a (ws, nww, ws, C) VMEM scratch via a static leading index, and the
    LAST window of each row collapses the scratch to (ws, nww*ws, C), crops
    the column pad, adds the residual, and stores the unpadded output.

    MEASURED (2026-08-19, v5e, ViT-H B=4, full encoder jit): **80.5 ms/img vs
    53.9 for the per-window 6-D `block` kernel** (outputs bit-identical).
    NEGATIVE RESULT, same lesson as block_row (63.1): in-kernel window
    extraction — whether post-qkv (block_row) or pre-qkv under predicated
    static slices (here) — costs more than the ~135 MB/layer of XLA-side
    pad/6-D-view/output layout copies it removes.  The DMA engines handle the
    strided 6-D window blocks essentially for free, while value re-slicing
    serializes on the VPU and the pl.when bodies defeat Mosaic's cross-window
    pipelining.  Kept off-default as the reference pattern for partial-block
    stores (unpadded output + aligned final row store)."""
    n = ws * ws
    C = nH * hd
    j = pl.program_id(2)
    # Mosaic rejects DYNAMIC sublane slices at non-8-multiple offsets, so the
    # window extraction unrolls over the nww static positions under pl.when;
    # static value slices at ws offsets are the Mosaic-verified block_row
    # pattern.  The row blocks keep a constant index across j, so each row is
    # DMA'd once and stays resident while its nww programs run.
    x_row = x_ref[0].reshape(ws, nww, ws, C)
    rh_row = rh_ref[0].reshape(ws, nww, ws, nH * ws)
    rw_row = rw_ref[0].reshape(ws, nww, ws, nH * ws)
    eu = eu_ref[...]
    ev = ev_ref[...]
    for jj in range(nww):
        @pl.when(j == jj)
        def _window(jj=jj):
            xw = x_row[:, jj].reshape(n, C)
            qkv = jax.lax.dot_general(
                xw, wqkv_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(xw.dtype) + bqkv_ref[...].astype(xw.dtype)  # (n, 3C)
            rel_h = rh_row[:, jj].reshape(n, nH * ws)
            rel_w = rw_row[:, jj].reshape(n, nH * ws)
            outs = []
            for h in range(nH):  # static unroll; static lane offsets
                q = qkv[:, h * hd:(h + 1) * hd]
                k = qkv[:, C + h * hd:C + (h + 1) * hd]
                v = qkv[:, 2 * C + h * hd:2 * C + (h + 1) * hd]
                q_aug = jnp.concatenate([
                    q * scale,
                    rel_h[:, h * ws:(h + 1) * ws],
                    rel_w[:, h * ws:(h + 1) * ws],
                ], axis=-1)
                k_aug = jnp.concatenate([k, eu, ev], axis=-1)
                s = jax.lax.dot_general(
                    q_aug, k_aug, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                o = jax.lax.dot_general(
                    p.astype(v.dtype), v,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                outs.append(o.astype(xw.dtype))
            att = jnp.concatenate(outs, axis=-1)  # (n, C)
            out = jax.lax.dot_general(
                att, wproj_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(xw.dtype) + bproj_ref[...].astype(xw.dtype)
            acc_ref[:, jj] = out.reshape(ws, ws, C)  # static LEADING index

    @pl.when(j == nww - 1)
    def _store_row():
        # (ws, nww, ws, C) -> (ws, nww*ws, C) leading-into-sublane collapse,
        # crop the column pad, add the residual, one aligned full-row store
        row = acc_ref[...].reshape(ws, nww * ws, C)[:, :W, :]
        o_ref[0] = row + sc_ref[0].astype(o_ref.dtype)


def _pallas2(sc, xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, ws, scale, num_heads,
             dtype=jnp.bfloat16, interpret=False):
    """Row-block whole-layer call: returns sc + window_layer(xn)."""
    B, H, W, C = xn.shape
    nH = num_heads
    hd = C // nH
    n = ws * ws
    Hp, Wp = -(-H // ws) * ws, -(-W // ws) * ws
    nwh, nww = Hp // ws, Wp // ws
    xp = jnp.pad(xn.astype(dtype), ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
    rel_h, rel_w = _rel_projections_folded(xp, Wqkv, bqkv, Rh, Rw, ws, nH)
    eu, ev = _onehots(ws, dtype)
    bqkv_k = (bqkv if bqkv is not None else jnp.zeros((3 * C,), Wqkv.dtype))
    bproj_k = (bproj if bproj is not None else jnp.zeros((C,), Wproj.dtype))

    rowspec = lambda lanes: pl.BlockSpec(
        (1, ws, Wp, lanes), lambda b, i, j: (b, i, 0, 0),
        memory_space=pltpu.VMEM,
    )
    outspec = pl.BlockSpec(
        (1, ws, W, C), lambda b, i, j: (b, i, 0, 0), memory_space=pltpu.VMEM,
    )
    cst = lambda *shape: pl.BlockSpec(
        shape, lambda b, i, j: (0,) * len(shape), memory_space=pltpu.VMEM,
    )
    kernel = functools.partial(_kernel2, scale=scale, nH=nH, hd=hd, ws=ws,
                               W=W, nww=nww)
    return pl.pallas_call(
        kernel,
        grid=(B, nwh, nww),
        in_specs=[
            rowspec(C), outspec,
            rowspec(nH * ws), rowspec(nH * ws),
            cst(C, 3 * C), cst(1, 3 * C),
            cst(C, C), cst(1, C),
            cst(n, ws), cst(n, ws),
        ],
        out_specs=outspec,
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), dtype),
        scratch_shapes=[pltpu.VMEM((ws, nww, ws, C), dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Hp * Wp * C * (4 * C)
            + 4 * B * nwh * nww * nH * n * n * (hd + 2 * ws),
            bytes_accessed=B * Hp * Wp * (2 * C + 2 * nH * ws) * 2
            + 4 * C * C * 2,
            transcendentals=B * nwh * nww * nH * n * n,
        ),
        interpret=interpret,
    )(xp, sc.astype(dtype), rel_h, rel_w,
      Wqkv.astype(dtype), bqkv_k.astype(dtype).reshape(1, 3 * C),
      Wproj.astype(dtype), bproj_k.astype(dtype).reshape(1, C),
      eu, ev)


def _kernel_row(x_ref, rh_ref, rw_ref, wqkv_ref, bqkv_ref, wproj_ref,
                bproj_ref, eu_ref, ev_ref, o_ref, *, scale, nH, hd, ws, nww):
    """Row-of-windows variant: one program covers a full window row, so the
    qkv/proj matmuls run at M = ws*nww*ws (980 for ViT-H) instead of 196 —
    much better MXU row efficiency; attention stays per-window via static
    sublane slices of the shared qkv value."""
    n = ws * ws
    C = nH * hd
    rowN = ws * nww * ws
    x = x_ref[0, 0].reshape(rowN, C)
    qkv = jax.lax.dot_general(
        x, wqkv_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + bqkv_ref[...].astype(x.dtype)  # (rowN, 3C)
    qkv4 = qkv.reshape(ws, nww, ws, 3 * C)
    rel_h4 = rh_ref[0, 0].reshape(ws, nww, ws, nH * ws)
    rel_w4 = rw_ref[0, 0].reshape(ws, nww, ws, nH * ws)
    eu = eu_ref[...]
    ev = ev_ref[...]
    att_rows = []
    for j in range(nww):  # static unroll over windows in the row
        qkvw = qkv4[:, j].reshape(n, 3 * C)
        rel_h = rel_h4[:, j].reshape(n, nH * ws)
        rel_w = rel_w4[:, j].reshape(n, nH * ws)
        outs = []
        for h in range(nH):
            q = qkvw[:, h * hd:(h + 1) * hd]
            k = qkvw[:, C + h * hd:C + (h + 1) * hd]
            v = qkvw[:, 2 * C + h * hd:2 * C + (h + 1) * hd]
            q_aug = jnp.concatenate([
                q * scale,
                rel_h[:, h * ws:(h + 1) * ws],
                rel_w[:, h * ws:(h + 1) * ws],
            ], axis=-1)
            k_aug = jnp.concatenate([k, eu, ev], axis=-1)
            s = jax.lax.dot_general(
                q_aug, k_aug, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            p = p / jnp.sum(p, axis=-1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            outs.append(o.astype(x.dtype))
        att_rows.append(jnp.concatenate(outs, axis=-1).reshape(ws, 1, ws, C))
    att = jnp.concatenate(att_rows, axis=1).reshape(rowN, C)
    out = jax.lax.dot_general(
        att, wproj_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + bproj_ref[...].astype(x.dtype)
    o_ref[0, 0] = out.reshape(ws, nww, ws, C)


def _pallas_row(xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, ws, scale, num_heads,
                dtype=jnp.bfloat16, interpret=False):
    B, H, W, C = xn.shape
    nH = num_heads
    hd = C // nH
    n = ws * ws
    Hp, Wp = -(-H // ws) * ws, -(-W // ws) * ws
    nwh, nww = Hp // ws, Wp // ws
    xp = jnp.pad(xn.astype(dtype), ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
    rel_h, rel_w = _rel_projections_folded(xp, Wqkv, bqkv, Rh, Rw, ws, nH)
    eu, ev = _onehots(ws, dtype)
    bqkv_k = (bqkv if bqkv is not None else jnp.zeros((3 * C,), Wqkv.dtype))
    bproj_k = (bproj if bproj is not None else jnp.zeros((C,), Wproj.dtype))

    x6 = xp.reshape(B, nwh, ws, nww, ws, C)
    r6 = lambda r: r.reshape(B, nwh, ws, nww, ws, nH * ws)
    row = lambda lanes: pl.BlockSpec(
        (1, 1, ws, nww, ws, lanes), lambda b, i: (b, i, 0, 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    cst = lambda *shape: pl.BlockSpec(
        shape, lambda b, i: (0,) * len(shape), memory_space=pltpu.VMEM,
    )
    kernel = functools.partial(_kernel_row, scale=scale, nH=nH, hd=hd, ws=ws,
                               nww=nww)
    out6 = pl.pallas_call(
        kernel,
        grid=(B, nwh),
        in_specs=[
            row(C),
            row(nH * ws), row(nH * ws),
            cst(C, 3 * C), cst(1, 3 * C),
            cst(C, C), cst(1, C),
            cst(n, ws), cst(n, ws),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, ws, nww, ws, C), lambda b, i: (b, i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, nwh, ws, nww, ws, C), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Hp * Wp * C * (4 * C)
            + 4 * B * nwh * nww * nH * n * n * (hd + 2 * ws),
            bytes_accessed=B * Hp * Wp * (2 * C + 2 * nH * ws) * 2
            + 4 * C * C * 2,
            transcendentals=B * nwh * nww * nH * n * n,
        ),
        interpret=interpret,
    )(x6, r6(rel_h), r6(rel_w),
      Wqkv.astype(dtype), bqkv_k.astype(dtype).reshape(1, 3 * C),
      Wproj.astype(dtype), bproj_k.astype(dtype).reshape(1, C),
      eu, ev)
    return out6.reshape(B, Hp, Wp, C)[:, :H, :W]


def _pallas(xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, ws, scale, num_heads,
            dtype=jnp.bfloat16, interpret=False, rel_slab=False,
            grid_ijb=False, padded_out=False):
    B, H, W, C = xn.shape
    nH = num_heads
    hd = C // nH
    n = ws * ws
    Hp, Wp = -(-H // ws) * ws, -(-W // ws) * ws
    nwh, nww = Hp // ws, Wp // ws
    xp = jnp.pad(xn.astype(dtype), ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
    eu, ev = _onehots(ws, dtype)
    bqkv_k = (bqkv if bqkv is not None else jnp.zeros((3 * C,), Wqkv.dtype))
    bproj_k = (bproj if bproj is not None else jnp.zeros((C,), Wproj.dtype))

    x6 = xp.reshape(B, nwh, ws, nww, ws, C)  # free dimension split
    if rel_slab:
        rel_h6, rel_w6 = _rel_projections_slab(xp, Wqkv, bqkv, Rh, Rw, ws, nH)
    else:
        rel_h, rel_w = _rel_projections_folded(xp, Wqkv, bqkv, Rh, Rw, ws, nH)
        r6 = lambda r: r.reshape(B, nwh, ws, nww, ws, nH * ws)
        rel_h6, rel_w6 = r6(rel_h), r6(rel_w)
    if grid_ijb:
        # batch innermost: consecutive programs touch consecutive B rows,
        # matching Mosaic's B-minor preferred operand layout
        grid = (nwh, nww, B)
        wmap = lambda i, j, b: (b, i, 0, j, 0, 0)
    else:
        grid = (B, nwh, nww)
        wmap = lambda b, i, j: (b, i, 0, j, 0, 0)
    win = lambda lanes: pl.BlockSpec(
        (1, 1, ws, 1, ws, lanes), wmap, memory_space=pltpu.VMEM,
    )
    cst = lambda *shape: pl.BlockSpec(
        shape, lambda *g: (0,) * len(shape), memory_space=pltpu.VMEM,
    )
    kernel = functools.partial(_kernel, scale=scale, nH=nH, hd=hd, ws=ws)
    # resident weights (bf16): Wqkv + Wproj + qkv buffer + streaming blocks;
    # ViT-H: ~16 MB of weights alone, so raise the scoped-VMEM ceiling
    out6 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            win(C),
            win(nH * ws), win(nH * ws),
            cst(C, 3 * C), cst(1, 3 * C),
            cst(C, C), cst(1, C),
            cst(n, ws), cst(n, ws),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, ws, 1, ws, C), wmap,
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, nwh, ws, nww, ws, C), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Hp * Wp * C * (4 * C)
            + 4 * B * nwh * nww * nH * n * n * (hd + 2 * ws),
            bytes_accessed=B * Hp * Wp * (2 * C + 2 * nH * ws) * 2
            + 4 * C * C * 2,
            transcendentals=B * nwh * nww * nH * n * n,
        ),
        interpret=interpret,
    )(x6, rel_h6, rel_w6,
      Wqkv.astype(dtype), bqkv_k.astype(dtype).reshape(1, 3 * C),
      Wproj.astype(dtype), bproj_k.astype(dtype).reshape(1, C),
      eu, ev)
    out_p = out6.reshape(B, Hp, Wp, C)  # free view (dimension merge)
    return out_p if padded_out else out_p[:, :H, :W]


def _pad_like(out, xn, ws):
    """Zero-pad a cropped (B, H, W, C) layer output to the kernel's padded
    (B, Hp, Wp, C) geometry (oracle for padded_out=True; pad CONTENT is
    unspecified — consumers must not read it)."""
    B, H, W, _ = xn.shape
    Hp, Wp = -(-H // ws) * ws, -(-W // ws) * ws
    return jnp.pad(out, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13))
def _fused(xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, ws, scale, num_heads,
           dtype, use_pallas, interpret, padded_out=False):
    # use_pallas: False = XLA oracle; True = per-window grid; "row" = one
    # program per window row (big-M qkv/proj matmuls); "qkv_out" = qkv as one
    # giant matmul outside, attention+proj in-kernel; "slab"/"ijb"/"slab_ijb"
    # = per-window grid with the slab rel producer and/or batch-innermost grid
    if use_pallas == "row":
        assert not padded_out
        return _pallas_row(xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, ws, scale,
                           num_heads, dtype=dtype, interpret=interpret)
    if use_pallas == "qkv_out":
        assert not padded_out
        return _pallas_q(xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, ws, scale,
                         num_heads, dtype=dtype, interpret=interpret)
    if use_pallas in ("slab", "ijb", "slab_ijb", True):
        return _pallas(xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, ws, scale,
                       num_heads, dtype=dtype, interpret=interpret,
                       rel_slab=use_pallas in ("slab", "slab_ijb"),
                       grid_ijb=use_pallas in ("ijb", "slab_ijb"),
                       padded_out=padded_out)
    out = window_layer_xla(xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, ws, scale,
                           num_heads, dtype=dtype)
    return _pad_like(out, xn, ws) if padded_out else out


def _fwd(xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, ws, scale, num_heads,
         dtype, use_pallas, interpret, padded_out=False):
    out = _fused(xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, ws, scale, num_heads,
                 dtype, use_pallas, interpret, padded_out)
    return out, (xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw)


def _bwd(ws, scale, num_heads, dtype, use_pallas, interpret, padded_out,
         res, g):
    xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw = res

    def oracle(*a):
        out = window_layer_xla(*a, ws, scale, num_heads, dtype=dtype)
        return _pad_like(out, a[0], ws) if padded_out else out

    _, vjp = jax.vjp(oracle, xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw)
    return vjp(g)


_fused.defvjp(_fwd, _bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12, 13))
def _fused2(sc, xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, ws, scale, num_heads,
            dtype, use_pallas, interpret):
    if use_pallas:
        return _pallas2(sc, xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, ws, scale,
                        num_heads, dtype=dtype, interpret=interpret)
    return (sc + window_layer_xla(xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, ws,
                                  scale, num_heads, dtype=dtype)).astype(dtype)


def _fwd2(sc, xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, ws, scale, num_heads,
          dtype, use_pallas, interpret):
    out = _fused2(sc, xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, ws, scale,
                  num_heads, dtype, use_pallas, interpret)
    return out, (sc, xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw)


def _bwd2(ws, scale, num_heads, dtype, use_pallas, interpret, res, g):
    sc, xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw = res
    _, vjp = jax.vjp(
        lambda s, *a: (s + window_layer_xla(*a, ws, scale, num_heads,
                                            dtype=dtype)).astype(dtype),
        sc, xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw,
    )
    return vjp(g)


_fused2.defvjp(_fwd2, _bwd2)


def window_layer_attention_residual(
    sc: jnp.ndarray,      # (B, H, W, C) residual stream (pre-norm1 input)
    xn: jnp.ndarray,      # (B, H, W, C) normed map
    Wqkv: jnp.ndarray,
    bqkv: jnp.ndarray,
    Wproj: jnp.ndarray,
    bproj: jnp.ndarray,
    Rh: jnp.ndarray,
    Rw: jnp.ndarray,
    ws: int,
    scale: float,
    num_heads: int,
    dtype=jnp.bfloat16,
    force_xla: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """sc + (qkv + windowed rel-pos attention + proj)(xn), with x/out as
    partial blocks of the UNPADDED maps and the residual add in-kernel
    (`window_attn_impl="block2"`)."""
    use_pallas = (not force_xla and jax.default_backend() == "tpu") or (
        interpret and not force_xla
    )
    return _fused2(sc, xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, ws, scale,
                   num_heads, jnp.dtype(dtype), use_pallas, interpret)


def window_layer_attention(
    xn: jnp.ndarray,      # (B, H, W, C) normed, unpartitioned, unpadded
    Wqkv: jnp.ndarray,    # (C, 3C) fp32 params
    bqkv: jnp.ndarray,    # (3C,) or None
    Wproj: jnp.ndarray,   # (C, C)
    bproj: jnp.ndarray,   # (C,) or None
    Rh: jnp.ndarray,      # (ws, ws, hd) gathered rel-pos tables
    Rw: jnp.ndarray,
    ws: int,
    scale: float,
    num_heads: int,
    dtype=jnp.bfloat16,
    force_xla: bool = False,
    interpret: bool = False,
    rows: bool = False,
    variant: str | None = None,
    return_padded: bool = False,
) -> jnp.ndarray:
    """qkv + windowed rel-pos attention + proj; returns (B, H, W, C)
    (pre-residual).  Pallas on TPU, XLA composition elsewhere.
    variant: None = per-window grid with in-kernel qkv ("block"); "row" = one
    program per window row ("block_row"); "qkv_out" = qkv as one giant
    outside matmul, attention+proj in-kernel ("blockq"); "slab" = slab-matmul
    rel producer; "ijb" = batch-innermost grid; "slab_ijb" = both.
    rows=True is the legacy spelling of variant="row".
    return_padded=True returns the UNCROPPED (B, Hp, Wp, C) map (a free view
    of the kernel's block grid); pad content is unspecified — for consumers
    like fused_tail_ln_mlp_residual that read only the valid region.  Not
    supported for the "row"/"qkv_out" variants."""
    use_pallas = (not force_xla and jax.default_backend() == "tpu") or (
        interpret and not force_xla
    )
    if rows:
        if variant is not None and variant != "row":
            raise ValueError(
                f"conflicting arguments: rows=True with variant={variant!r}")
        variant = "row"
    if use_pallas and variant is not None:
        use_pallas = variant
    return _fused(xn, Wqkv, bqkv, Wproj, bproj, Rh, Rw, ws, scale, num_heads,
                  jnp.dtype(dtype), use_pallas, interpret, return_padded)
