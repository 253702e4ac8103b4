"""Fused attention for SAM's global-attention layers, with decomposed rel-pos.

The reference materializes the full (4096, 4096) attention tensor per head for
the 4 global layers of the SAM encoder (image_encoder.py:185-240 + :325-361).
On TPU that costs ~1 GB of HBM round-trips per image for ViT-H; this kernel
tiles queries 128 at a time and never writes the attention matrix to HBM.

Bias trick: the decomposed rel-pos add
    s[q, k] = (q . k) * scale + rel_h[q, kh(k)] + rel_w[q, kw(k)]
is folded into ONE matmul by augmenting the contraction dim:
    q' = [q * scale, rel_h_row(q), rel_w_row(q)]      (d + kh + kw)
    k' = [k,        onehot_kh(k),  onehot_kw(k)]
so s = q' . k' on the MXU in bf16 (fp32 accumulation) — no per-program bias
matmuls, iotas, or fp32 MXU work.  (An earlier version computed the bias with
two fp32 expansion matmuls inside the kernel; the augmented form measured ~3x
faster on the ViT-H global layers.)

Forward-only Pallas (generation never trains SAM); gradients fall back to the
pure-XLA reference via custom_vjp recompute.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TQ = 128  # query tile rows


def attention_relpos_xla(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    rel_h: jnp.ndarray,
    rel_w: jnp.ndarray,
    scale: float,
) -> jnp.ndarray:
    """Pure-XLA oracle. q,k,v: (B,N,d); rel_h: (B,N,Kh); rel_w: (B,N,Kw)."""
    B, N, _ = q.shape
    Kh, Kw = rel_h.shape[-1], rel_w.shape[-1]
    s = jnp.einsum("bqd,bkd->bqk", q * scale, k, preferred_element_type=jnp.float32)
    s = s.reshape(B, N, Kh, Kw) + rel_h[..., :, None] + rel_w[..., None, :]
    p = jax.nn.softmax(s.reshape(B, N, N), axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32)


def onehot_expansions(kh: int, kw: int, dtype=jnp.bfloat16) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(N, kh) and (N, kw) one-hot matrices with N = kh*kw (host constants)."""
    n = kh * kw
    eh = np.zeros((n, kh), np.float32)
    eh[np.arange(n), np.arange(n) // kw] = 1.0
    ew = np.zeros((n, kw), np.float32)
    ew[np.arange(n), np.arange(n) % kw] = 1.0
    return jnp.asarray(eh, dtype), jnp.asarray(ew, dtype)


def _flash_kernel(qp_ref, kp_ref, v_ref, o_ref):
    qp = qp_ref[0]  # (TQ, d') — already scaled/augmented
    kp = kp_ref[0]  # (N, d')
    v = v_ref[0]    # (N, d+1) — last lane is ones, so p @ v carries the
    #                 softmax row-sum for free (the d+1 lanes pad to the same
    #                 128-lane tile) and the divide shrinks from (TQ, N) to
    #                 (TQ, d): the kernel is VPU-bound, not MXU-bound
    s = jax.lax.dot_general(
        qp, kp, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TQ, N) = logits + rel-pos bias
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    d = o.shape[-1] - 1
    o_ref[0] = (o[:, :d] / o[:, d:]).astype(o_ref.dtype)


def _flash_attention_fwd_pallas(q, k, v, rel_h, rel_w, scale, interpret=False):
    B, N, d = q.shape
    kh, kw = rel_h.shape[-1], rel_w.shape[-1]
    assert kh * kw == N, f"rel-pos grid {kh}x{kw} != {N} tokens"
    assert N % TQ == 0
    cdt = v.dtype if v.dtype == jnp.bfloat16 else jnp.float32
    eh, ew = onehot_expansions(kh, kw, cdt)
    qp = jnp.concatenate(
        [(q * scale).astype(cdt), rel_h.astype(cdt), rel_w.astype(cdt)], axis=-1
    )
    kp = jnp.concatenate(
        [k.astype(cdt),
         jnp.broadcast_to(eh[None], (B, N, kh)),
         jnp.broadcast_to(ew[None], (B, N, kw))], axis=-1
    )
    # ones lane: p @ v_aug computes the softmax row-sum on the MXU
    v_aug = jnp.concatenate(
        [v.astype(cdt), jnp.ones((B, N, 1), cdt)], axis=-1
    )
    dp = d + kh + kw
    grid = (B, N // TQ)
    return pl.pallas_call(
        _flash_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TQ, dp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, dp), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, d + 1), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TQ, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * N * (dp + d), bytes_accessed=4 * B * N * dp * 2,
            transcendentals=B * N * N,
        ),
        interpret=interpret,
    )(qp, kp, v_aug)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _attention_relpos(q, k, v, rel_h, rel_w, scale, use_pallas, interpret):
    if use_pallas:
        return _flash_attention_fwd_pallas(q, k, v, rel_h, rel_w, scale, interpret)
    return attention_relpos_xla(q, k, v, rel_h, rel_w, scale)


def _fwd(q, k, v, rel_h, rel_w, scale, use_pallas, interpret):
    out = _attention_relpos(q, k, v, rel_h, rel_w, scale, use_pallas, interpret)
    return out, (q, k, v, rel_h, rel_w)


def _bwd(scale, use_pallas, interpret, res, g):
    q, k, v, rel_h, rel_w = res
    _, vjp = jax.vjp(lambda *a: attention_relpos_xla(*a, scale), q, k, v, rel_h, rel_w)
    return vjp(g)


_attention_relpos.defvjp(_fwd, _bwd)


def attention_qkv_relpos_xla(qkv_raw, Rh, Rw, hw, scale, num_heads):
    """Oracle for the qkv-direct global kernel. qkv_raw (B, N, 3C) -> (B, N, C)."""
    H, W = hw
    B, N, threeC = qkv_raw.shape
    C = threeC // 3
    nH = num_heads
    hd = C // nH
    qkv = qkv_raw.reshape(B, N, 3, nH, hd)
    qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(3, B * nH, N, hd)
    q, k, v = qkv[0], qkv[1], qkv[2]
    r_q = q.reshape(B * nH, H, W, hd)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q.astype(jnp.float32),
                       Rh.astype(jnp.float32)).reshape(B * nH, N, H)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q.astype(jnp.float32),
                       Rw.astype(jnp.float32)).reshape(B * nH, N, W)
    out = attention_relpos_xla(q, k, v, rel_h, rel_w, scale)  # (B*nH, N, hd)
    out = out.reshape(B, nH, N, hd).transpose(0, 2, 1, 3).reshape(B, N, C)
    return out.astype(qkv_raw.dtype)


LOG2E = 1.4426950408889634  # base-2 softmax: exp(x) = exp2(x*log2e), and
# softmax is invariant to the base change when the SAME factor multiplies
# every logit term — so log2e is folded into scale and the rel tables
# OUTSIDE the kernel and the VPU runs its native exp2 without the
# per-element x*log2e multiply ((TQ, N) fp32 per head per program).


def _qkv_flash_kernel(qt_ref, kv_ref, rh_ref, rw_ref, eu_ref, ev_ref, o_ref,
                      *, scale, nH, hd, kh, kw, exp2=False):
    C = nH * hd
    qt = qt_ref[0]     # (TQ, 3C) — only the q lanes are used
    kv = kv_ref[0]     # (N, 3C) — whole sequence, resident per batch row
    rh = rh_ref[0]     # (TQ, nH*kh) — pre-scaled by log2e when exp2=True
    rw = rw_ref[0]
    eu = eu_ref[...]   # (N, kh) one-hot expansions
    ev = ev_ref[...]
    outs = []
    for h in range(nH):  # static unroll; all slices at static lane offsets
        q = qt[:, h * hd:(h + 1) * hd] * (scale * LOG2E if exp2 else scale)
        k = kv[:, C + h * hd:C + (h + 1) * hd]
        v = kv[:, 2 * C + h * hd:2 * C + (h + 1) * hd]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TQ, N)
        # decomposed rel-pos: two skinny matmuls accumulated into the logits
        # (same flops as the augmented-K form, no lane concat / qp buffer)
        s += jax.lax.dot_general(
            rh[:, h * kh:(h + 1) * kh], eu,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s += jax.lax.dot_general(
            rw[:, h * kw:(h + 1) * kw], ev,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp2(s - m) if exp2 else jnp.exp(s - m)
        # softmax row-sum rides the PV matmul as a ones lane (hd+1 pads into
        # the same 128-lane MXU tile); the divide then touches (TQ, hd)
        # instead of (TQ, N) — the kernel is VPU-bound
        v1 = jnp.concatenate([v, jnp.ones((v.shape[0], 1), v.dtype)], axis=-1)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v1, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append((o[:, :hd] / o[:, hd:]).astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=-1)  # (TQ, C)


def _qkv_flash_pallas(qkv_raw, Rh, Rw, hw, scale, num_heads, interpret=False,
                      exp2=False):
    H, W = hw
    B, N, threeC = qkv_raw.shape
    C = threeC // 3
    nH = num_heads
    hd = C // nH
    kh, kw = H, W
    assert N == H * W and N % TQ == 0
    dt = qkv_raw.dtype
    # per-token rel projections for ALL heads, packed along lanes
    # (log2e folded into the table when the kernel softmaxes in base 2)
    q4 = qkv_raw[..., :C].reshape(B, H, W, nH, hd)
    Rh_t = (Rh * LOG2E if exp2 else Rh).astype(dt)
    Rw_t = (Rw * LOG2E if exp2 else Rw).astype(dt)
    rel_h = jnp.einsum("bxynd,xkd->bxynk", q4, Rh_t,
                       preferred_element_type=jnp.float32)
    rel_w = jnp.einsum("bxynd,ykd->bxynk", q4, Rw_t,
                       preferred_element_type=jnp.float32)
    rel_h = rel_h.reshape(B, N, nH * kh).astype(dt)
    rel_w = rel_w.reshape(B, N, nH * kw).astype(dt)
    eu, ew = onehot_expansions(kh, kw, dt)
    kernel = functools.partial(_qkv_flash_kernel, scale=scale, nH=nH, hd=hd,
                               kh=kh, kw=kw, exp2=exp2)
    return pl.pallas_call(
        kernel,
        grid=(B, N // TQ),
        in_specs=[
            pl.BlockSpec((1, TQ, threeC), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, threeC), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TQ, nH * kh), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TQ, nH * kw), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, kh), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, kw), lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TQ, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), dt),
        compiler_params=pltpu.CompilerParams(
            # the resident (N, 3C) kv block alone is ~31 MB at ViT-H
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * nH * N * N * (hd + kh + kw + hd),
            bytes_accessed=B * N * threeC * 2 * 2,
            transcendentals=B * nH * N * N,
        ),
        interpret=interpret,
    )(qkv_raw, qkv_raw, rel_h, rel_w, eu, ew)


def _qkv_m_kernel(qt_ref, kv_ref, rel_ref, euv_ref, va_ref, o_ref,
                  *, scale, nH, hd, kh, kw, vseg):
    """Merged-rel split kernel: one rel matmul + one add per head.

    The 'split' kernel pays per head TWO rel matmuls whose 64-lane
    contractions each occupy a full 128-lane MXU chunk (i.e. the rel bias
    costs as much MXU as the qk itself), TWO fp32 (TQ, N) VPU adds, and an
    in-kernel (N, hd)||ones concat (~0.7 ms/layer).  Here:
      * rel_h/rel_w ride ONE (TQ, kh+kw=128) x (kh+kw, N) matmul against a
        fused one-hot expansion — one 128-lane chunk, ONE VPU add;
      * v arrives pre-concatenated with its ones lane as vseg-padded
        per-head segments (va), so the softmax row-sum still rides the pv
        matmul with no in-kernel concat.
    """
    C = nH * hd
    qt = qt_ref[0]      # (TQ, 3C) — only q lanes used
    kv = kv_ref[0]      # (N, 3C) — only k lanes used; resident per batch row
    rel = rel_ref[0]    # (TQ, nH*(kh+kw))
    euv = euv_ref[...]  # (N, kh+kw) fused one-hot expansion
    va = va_ref[0]      # (N, nH*vseg) — [v, ones, 0-pad] per head
    kk = kh + kw
    outs = []
    for h in range(nH):  # static unroll; static lane offsets
        q = qt[:, h * hd:(h + 1) * hd] * scale
        k = kv[:, C + h * hd:C + (h + 1) * hd]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s += jax.lax.dot_general(
            rel[:, h * kk:(h + 1) * kk], euv,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        o = jax.lax.dot_general(
            p.astype(va.dtype), va[:, h * vseg:(h + 1) * vseg],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TQ, vseg): softmax row-sum rides lane hd
        outs.append((o[:, :hd] / o[:, hd:hd + 1]).astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=-1)  # (TQ, C)


def _qkv_flash_m_pallas(qkv_raw, Rh, Rw, hw, scale, num_heads,
                        interpret=False):
    H, W = hw
    B, N, threeC = qkv_raw.shape
    C = threeC // 3
    nH = num_heads
    hd = C // nH
    kh, kw = H, W
    assert N == H * W and N % TQ == 0
    dt = qkv_raw.dtype
    vseg = -(-(hd + 1) // 8) * 8  # 8-aligned static lane offsets
    q4 = qkv_raw[..., :C].reshape(B, H, W, nH, hd)
    rel_h = jnp.einsum("bxynd,xkd->bxynk", q4, Rh.astype(dt),
                       preferred_element_type=jnp.float32)
    rel_w = jnp.einsum("bxynd,ykd->bxynk", q4, Rw.astype(dt),
                       preferred_element_type=jnp.float32)
    rel = jnp.concatenate(
        [rel_h.reshape(B, N, nH, kh), rel_w.reshape(B, N, nH, kw)], axis=-1
    ).reshape(B, N, nH * (kh + kw)).astype(dt)
    eu, ew = onehot_expansions(kh, kw, dt)
    euv = jnp.concatenate([eu, ew], axis=1)  # (N, kh+kw)
    v4 = qkv_raw[..., 2 * C:].reshape(B, N, nH, hd)
    va = jnp.concatenate(
        [v4.astype(dt), jnp.ones((B, N, nH, 1), dt),
         jnp.zeros((B, N, nH, vseg - hd - 1), dt)], axis=-1,
    ).reshape(B, N, nH * vseg)
    kernel = functools.partial(_qkv_m_kernel, scale=scale, nH=nH, hd=hd,
                               kh=kh, kw=kw, vseg=vseg)
    return pl.pallas_call(
        kernel,
        grid=(B, N // TQ),
        in_specs=[
            pl.BlockSpec((1, TQ, threeC), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, threeC), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TQ, nH * (kh + kw)), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, kh + kw), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, nH * vseg), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TQ, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), dt),
        compiler_params=pltpu.CompilerParams(
            # resident per batch row at ViT-H: kv 31 MB + va 11 MB + euv 1 MB
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * nH * N * N * (hd + kh + kw + hd),
            bytes_accessed=B * N * threeC * 2 * 2,
            transcendentals=B * nH * N * N,
        ),
        interpret=interpret,
    )(qkv_raw, qkv_raw, rel, euv, va)


def _qkv_aug_kernel(qa_ref, ka_ref, va_ref, o_ref, *, nH, hd, seg, vseg):
    qa = qa_ref[0]   # (TQ, nH*seg) — [q*scale, rel_h, rel_w, 0-pad] per head
    ka = ka_ref[0]   # (N,  nH*seg) — [k, onehot_kh, onehot_kw, 0-pad]
    va = va_ref[0]   # (N,  nH*vseg) — [v, ones, 0-pad]
    outs = []
    for h in range(nH):  # static unroll; 128-aligned lane slices
        s = jax.lax.dot_general(
            qa[:, h * seg:(h + 1) * seg], ka[:, h * seg:(h + 1) * seg],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TQ, N) = scaled logits + rel_h + rel_w, ONE MXU op
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        o = jax.lax.dot_general(
            p.astype(va.dtype), va[:, h * vseg:(h + 1) * vseg],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (TQ, vseg): softmax row-sum rides lane hd (the 80->128 MXU
        #    output tile is computed either way, so the ones lane is free)
        outs.append((o[:, :hd] / o[:, hd:hd + 1]).astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=-1)  # (TQ, C)


def _qkv_flash_aug_pallas(qkv_raw, Rh, Rw, hw, scale, num_heads,
                          interpret=False, tq=128):
    # tq=256 crashes the v5e AOT compiler whenever B > 1 (tpu_compile_helper
    # exit 1, 2026-08-19 bisect in scratch/dbg_aug2.py); 128 compiles and
    # is the measured default.
    """Augmented-K global attention: the decomposed rel-pos bias is folded
    into the qk matmul (the window-layer kernel's trick applied to the
    global layers).

    Motivation (r3 trace): the 4 ViT-H global layers cost 7.2 ms/iter each
    vs 2.1 for a windowed layer on near-identical matmul FLOPs.  The split
    kernel (`_qkv_flash_kernel`) spends ~2 ms/layer on two fp32 (TQ, N)
    VPU adds accumulating the rel matmuls into the logits and ~0.7 ms on
    per-head in-kernel v||ones concats.  Here every head's q/k rows are
    augmented OUTSIDE to one 128-aligned segment
        q' = [q*scale, rel_h_q, rel_w_q, 0...]   k' = [k, e_kh, e_kw, 0...]
    so s = q'.k' is ONE bf16 MXU op per head (same FLOPs: the contraction
    dim 208 occupies two 128-lane tiles either way), and v carries its
    softmax-sum ones lane in the free tail of its (N, 128) output tile.
    """
    H, W = hw
    B, N, threeC = qkv_raw.shape
    C = threeC // 3
    nH = num_heads
    hd = C // nH
    kh, kw = H, W
    if N % tq != 0:
        tq = TQ
    assert N == H * W and N % tq == 0
    dt = qkv_raw.dtype
    seg = -(-(hd + kh + kw) // 128) * 128
    vseg = -(-(hd + 1) // 128) * 128
    q4 = qkv_raw[..., :C].reshape(B, N, nH, hd)
    k4 = qkv_raw[..., C:2 * C].reshape(B, N, nH, hd)
    v4 = qkv_raw[..., 2 * C:].reshape(B, N, nH, hd)
    rel_h = jnp.einsum("bxynd,xkd->bxynk", q4.reshape(B, H, W, nH, hd),
                       Rh.astype(dt), preferred_element_type=jnp.float32)
    rel_w = jnp.einsum("bxynd,ykd->bxynk", q4.reshape(B, H, W, nH, hd),
                       Rw.astype(dt), preferred_element_type=jnp.float32)
    zq = jnp.zeros((B, N, nH, seg - hd - kh - kw), dt)
    q_aug = jnp.concatenate(
        [(q4 * scale).astype(dt),
         rel_h.reshape(B, N, nH, kh).astype(dt),
         rel_w.reshape(B, N, nH, kw).astype(dt), zq], axis=-1,
    ).reshape(B, N, nH * seg)
    eu, ew = onehot_expansions(kh, kw, dt)
    k_aug = jnp.concatenate(
        [k4.astype(dt),
         jnp.broadcast_to(eu[None, :, None, :], (B, N, nH, kh)),
         jnp.broadcast_to(ew[None, :, None, :], (B, N, nH, kw)), zq], axis=-1,
    ).reshape(B, N, nH * seg)
    v_aug = jnp.concatenate(
        [v4.astype(dt), jnp.ones((B, N, nH, 1), dt),
         jnp.zeros((B, N, nH, vseg - hd - 1), dt)], axis=-1,
    ).reshape(B, N, nH * vseg)
    kernel = functools.partial(_qkv_aug_kernel, nH=nH, hd=hd, seg=seg,
                               vseg=vseg)
    return pl.pallas_call(
        kernel,
        grid=(B, N // tq),
        in_specs=[
            pl.BlockSpec((1, tq, nH * seg), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, nH * seg), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, nH * vseg), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, C), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), dt),
        compiler_params=pltpu.CompilerParams(
            # resident per batch row at ViT-H: k_aug 32 MB + v_aug 16 MB
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * nH * N * N * (seg + vseg),
            bytes_accessed=2 * B * N * nH * (2 * seg + vseg),
            transcendentals=B * nH * N * N,
        ),
        interpret=interpret,
    )(q_aug, k_aug, v_aug)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _qkv_attention(qkv_raw, Rh, Rw, hw, scale, num_heads, use_pallas, interpret):
    if use_pallas == "aug":
        return _qkv_flash_aug_pallas(qkv_raw, Rh, Rw, hw, scale, num_heads,
                                     interpret)
    if use_pallas == "m":
        return _qkv_flash_m_pallas(qkv_raw, Rh, Rw, hw, scale, num_heads,
                                   interpret)
    if use_pallas == "exp2":
        return _qkv_flash_pallas(qkv_raw, Rh, Rw, hw, scale, num_heads,
                                 interpret, exp2=True)
    if use_pallas:
        return _qkv_flash_pallas(qkv_raw, Rh, Rw, hw, scale, num_heads, interpret)
    return attention_qkv_relpos_xla(qkv_raw, Rh, Rw, hw, scale, num_heads)


def _qkv_fwd(qkv_raw, Rh, Rw, hw, scale, num_heads, use_pallas, interpret):
    out = _qkv_attention(qkv_raw, Rh, Rw, hw, scale, num_heads, use_pallas,
                         interpret)
    return out, (qkv_raw, Rh, Rw)


def _qkv_bwd(hw, scale, num_heads, use_pallas, interpret, res, g):
    qkv_raw, Rh, Rw = res
    _, vjp = jax.vjp(
        lambda *a: attention_qkv_relpos_xla(*a, hw, scale, num_heads),
        qkv_raw, Rh, Rw,
    )
    return vjp(g.astype(qkv_raw.dtype))


_qkv_attention.defvjp(_qkv_fwd, _qkv_bwd)


def flash_attention_qkv_relpos(
    qkv_raw: jnp.ndarray,  # (B, N, 3C) — the qkv Dense output, untransposed
    Rh: jnp.ndarray,       # (H, H, hd) gathered rel-pos table
    Rw: jnp.ndarray,
    hw: Tuple[int, int],
    scale: float,
    num_heads: int,
    force_xla: bool = False,
    interpret: bool = False,
    variant: str = "m",
) -> jnp.ndarray:
    """Transpose-free global attention: heads are in-kernel static lane
    slices of the raw qkv tensor; output is (B, N, C), proj-ready.  Replaces
    the (B,N,3,nH,hd)->(3,B*nH,N,hd) layout copies of the split-head path
    (~1.3 ms/layer on the ViT-H globals, B=4).

    variant: "split" = separate in-kernel rel matmuls accumulated on the VPU;
    "exp2" = split with base-2 softmax (log2e folded into scale + rel tables,
    native VPU exp2, no per-element x*log2e multiply); "aug" = rel-pos folded
    into the qk matmul via augmented 128-aligned per-head q/k segments
    (measured-negative: 54.00 vs 53.64 ms/img split, full ViT-H B=4 encode —
    the q/k/v_aug concat HBM traffic eats the MXU fusion gain); "m" = split
    with the two rel matmuls MERGED into one 128-lane-contraction matmul
    (one VPU add instead of two, the rel bias costs one MXU chunk instead of
    two) and the v||ones concat hoisted outside as 8-aligned per-head
    segments."""
    B, N, _ = qkv_raw.shape
    use_pallas = (
        not force_xla and jax.default_backend() == "tpu" and N % TQ == 0
    ) or (interpret and not force_xla)
    if use_pallas and variant in ("aug", "exp2", "m"):
        use_pallas = variant
    return _qkv_attention(qkv_raw, Rh, Rw, hw, scale, num_heads, use_pallas,
                          interpret)


def flash_attention_relpos(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    Rh: jnp.ndarray,
    Rw: jnp.ndarray,
    hw: Tuple[int, int],
    scale: float,
    force_xla: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Attention with decomposed rel-pos bias over an (H, W) token grid.

    q, k, v: (B, N, d) with N == H*W; Rh: (H, H, d); Rw: (W, W, d)
    (the gathered tables from `get_rel_pos`).  Returns (B, N, d) fp32.
    """
    H, W = hw
    B, N, d = q.shape
    r_q = q.reshape(B, H, W, d)
    rel_h = jnp.einsum(
        "bhwc,hkc->bhwk", r_q, Rh.astype(r_q.dtype), preferred_element_type=jnp.float32
    ).reshape(B, N, H)
    rel_w = jnp.einsum(
        "bhwc,wkc->bhwk", r_q, Rw.astype(r_q.dtype), preferred_element_type=jnp.float32
    ).reshape(B, N, W)
    use_pallas = (
        not force_xla
        and jax.default_backend() == "tpu"
        and N % TQ == 0
    ) or (interpret and not force_xla)
    return _attention_relpos(q, k, v, rel_h, rel_w, scale, use_pallas, interpret)


# ---------------------------------------------------------------------------
# Plain (no rel-pos) flash attention for the seg-backbone TRAINING path
# (ED/backbone/vit.py:184-388 full attention).  Forward = the same
# one-pass VMEM-resident kernel (softmax never hits HBM); backward = XLA
# composition vjp of the oracle — free remat, matching the fused-MLP design.
# ---------------------------------------------------------------------------


def attention_plain_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                        scale: float) -> jnp.ndarray:
    """Pure-XLA oracle. q, k, v: (B, N, d) -> (B, N, d) fp32."""
    s = jnp.einsum("bqd,bkd->bqk", q * scale, k,
                   preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v,
                      preferred_element_type=jnp.float32)


def plain_q_tile(n: int, cap: int = TQ) -> int:
    """Largest %8 divisor of n that is <= cap (0 if none — caller falls back
    to XLA).  512px ViT maps (N=1024) tile at 128; 896px (N=3136) at 112;
    224px (N=196) has no %8 divisor and stays on XLA."""
    for t in range(min(cap, n), 7, -1):
        if t % 8 == 0 and n % t == 0:
            return t
    return 0


def _plain_fwd_pallas(q, k, v, scale, interpret=False):
    B, N, d = q.shape
    tq = plain_q_tile(N)
    cdt = v.dtype if v.dtype == jnp.bfloat16 else jnp.float32
    qp = (q * scale).astype(cdt)
    v_aug = jnp.concatenate([v.astype(cdt), jnp.ones((B, N, 1), cdt)], axis=-1)
    return pl.pallas_call(
        _flash_kernel,
        grid=(B, N // tq),
        in_specs=[
            pl.BlockSpec((1, tq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, d + 1), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * N * 2 * d, bytes_accessed=4 * B * N * d * 2,
            transcendentals=B * N * N,
        ),
        interpret=interpret,
    )(qp, k.astype(cdt), v_aug)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _attention_plain(q, k, v, scale, use_pallas, interpret):
    if use_pallas:
        return _plain_fwd_pallas(q, k, v, scale, interpret)
    return attention_plain_xla(q, k, v, scale)


def _plain_fwd(q, k, v, scale, use_pallas, interpret):
    return _attention_plain(q, k, v, scale, use_pallas, interpret), (q, k, v)


def _plain_bwd(scale, use_pallas, interpret, res, g):
    q, k, v = res
    _, vjp = jax.vjp(lambda *a: attention_plain_xla(*a, scale), q, k, v)
    return vjp(g)


_attention_plain.defvjp(_plain_fwd, _plain_bwd)


def flash_attention_plain(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float,
    force_xla: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Plain softmax attention, Pallas flash forward + XLA backward.

    q, k, v: (B, N, d); returns (B, N, d) fp32.  Falls back to the XLA
    oracle off-TPU or when N has no %8 query tile."""
    use_pallas = (
        not force_xla and jax.default_backend() == "tpu" and plain_q_tile(q.shape[1]) > 0
    ) or (interpret and not force_xla and plain_q_tile(q.shape[1]) > 0)
    return _attention_plain(q, k, v, scale, use_pallas, interpret)
