"""Fused image-side sweeps for the SAM TwoWayTransformer decode.

Behavioral reference: GD/segment_anything/modeling/transformer.py:16-240.
At generation bucket 64 the image side of the decoder is (64, 4096, 256)
fp32, and the r4 decode trace (12.68 ms/call, one image, 64 boxes) shows it
dominated by ~10 separate full sweeps of that tensor per decode:
k_proj/v_proj/q_proj dot fusions ~490 us each, i2t out_proj 520-900 us,
plus LayerNorm/residual/PE-add loop fusions.  Token-side work (<=12 tokens)
is negligible and stays in XLA.

Two kernels reduce the image side to THREE sweeps total:

  * ``t2i_kv_proj`` — one pass emitting the token->image attention's
    K = (keys + pe) @ Wk and V = keys @ Wv (run once, on the initial src).
  * ``i2t_update`` — one pass per two-way layer fusing the ENTIRE
    image->token update: q-projection of (keys + pe), 8-head attention
    against the <=128 token slots (additive mask bias for padding),
    out-projection, residual add, norm4 LayerNorm, AND the NEXT layer's
    t2i K/V projections of the freshly normed keys (so the following
    token->image attention needs no extra sweep).

Matmuls run in the compute dtype (bf16 on TPU) with fp32 accumulation —
same policy as kernels/fused_upscale.py; softmax and LayerNorm stats in
fp32.  Forward-only; backward falls back to the XLA composition via
custom_vjp (generation never trains SAM).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NT = 16      # padded token slots (>= iou + mask tokens + sparse prompts;
#              box prompts use 7 — keep this tight: the i2t kernel's qk/exp
#              work scales with it)
TROWS = 512  # image rows per program


def _dot(a, w, dtype):
    return jax.lax.dot_general(
        a.astype(dtype), w.astype(dtype),
        dimension_numbers=(((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


# ---------------------------------------------------------------- oracles

def t2i_kv_proj_xla(keys, key_pe, Wk, bk, Wv, bv, dtype=jnp.bfloat16):
    """keys (B,N,C) fp32; key_pe (N,C).  Returns (k, v) each (B,N,Ci)."""
    k = _dot(keys + key_pe[None], Wk, dtype) + bk
    v = _dot(keys, Wv, dtype) + bv
    return k.astype(dtype), v.astype(dtype)


def i2t_update_xla(keys, key_pe, tok_k, tok_v, mask_bias, Wq, bq, Wout, bout,
                   g4, b4, Wk_n, bk_n, Wv_n, bv_n, num_heads,
                   dtype=jnp.bfloat16, eps=1e-5, out_dtype=jnp.float32):
    """Fused image->token update, XLA composition (the exact reference math
    modulo compute dtype).

    keys (B,N,C) fp32; tok_k/tok_v (B,NT,Ci) padded token K/V; mask_bias
    (NT,) additive logit bias (-inf on pad slots).  Returns
    (keys2 (B,N,C) fp32, k_next (B,N,Ci) dtype, v_next (B,N,Ci) dtype).

    keys may have batch 1 with tok batch B > 1 (layer 0 of a no-mask-prompt
    decode, where the image side is identical across prompts): the shared
    keys broadcast across the token batch.
    """
    if keys.shape[0] == 1 and tok_k.shape[0] > 1:
        keys = jnp.broadcast_to(keys, (tok_k.shape[0],) + keys.shape[1:])
    B, N, C = keys.shape
    Ci = Wq.shape[1]
    hd = Ci // num_heads
    nts = tok_k.shape[1]
    q = _dot(keys + key_pe[None], Wq, dtype) + bq          # (B,N,Ci) fp32
    qh = q.reshape(B, N, num_heads, hd)
    kh = tok_k.astype(jnp.float32).reshape(B, nts, num_heads, hd)
    vh = tok_v.astype(jnp.float32).reshape(B, nts, num_heads, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / (hd ** 0.5)
    s = s + mask_bias[None, None, None, :]
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, vh).reshape(B, N, Ci)
    out = _dot(o, Wout, dtype) + bout
    res = keys + out.astype(jnp.float32)
    mu = res.mean(-1, keepdims=True)
    var = ((res - mu) ** 2).mean(-1, keepdims=True)
    keys2 = (res - mu) / jnp.sqrt(var + eps) * g4 + b4
    k_n = _dot(keys2 + key_pe[None], Wk_n, dtype) + bk_n
    v_n = _dot(keys2, Wv_n, dtype) + bv_n
    return keys2.astype(out_dtype), k_n.astype(dtype), v_n.astype(dtype)


# ---------------------------------------------------------------- kernels

def _kv_kernel(keys_ref, pe_ref, wk_ref, bk_ref, wv_ref, bv_ref,
               k_ref, v_ref, *, dtype):
    keys = keys_ref[0]                       # (T, C) fp32
    kpe = keys + pe_ref[...].astype(jnp.float32)
    k_ref[0] = (_dot(kpe, wk_ref[...], dtype) + bk_ref[...]).astype(k_ref.dtype)
    v_ref[0] = (_dot(keys, wv_ref[...], dtype) + bv_ref[...]).astype(v_ref.dtype)


def _i2t_kernel(keys_ref, pe_ref, kb_ref, vb_ref, mb_ref, e8_ref,
                wq_ref, bq_ref, wo_ref, bo_ref, g4_ref, b4_ref,
                wkn_ref, bkn_ref, wvn_ref, bvn_ref,
                keys2_ref, kn_ref, vn_ref, *, num_heads, nts, dtype, eps):
    """All-heads-in-one-matmul i2t attention.

    kb (Ci, nH*nts): block-diagonal token K — kb[h*hd+d, h*nts+j] =
    tok_k[j, h*hd+d] * scale — so s = q @ kb yields EVERY head's logits
    side by side in one MXU pass (the first fused version looped 8 heads
    of (T,16)-sliced dots + a 128-slot padded softmax and measured
    3.27 ms/call vs this layout's design floor ~1.2).
    vb (nH*nts, Ci + nH): block-diagonal V with per-head ones columns, so
    o = p @ vb gives head-concatenated outputs AND the softmax row-sums.
    e8 (nH, Ci): 0/1 expansion broadcasting each head's row-sum across its
    hd output lanes for the divide.
    """
    keys = keys_ref[0]                       # (T, C) fp32
    pe = pe_ref[...].astype(jnp.float32)     # (T, C)
    mb = mb_ref[...]                         # (1, nH*nts) additive bias
    Ci = wq_ref.shape[1]
    q = _dot(keys + pe, wq_ref[...], dtype) + bq_ref[...]  # (T, Ci) fp32
    # the attention block itself runs fp32 end to end: kb/vb are tiny
    # (<=128x136), so full-precision MXU passes cost nothing and the fused
    # path tracks the true-fp32 decode tighter than the XLA composition
    # (whose default-precision dots run bf16 passes)
    s = jax.lax.dot_general(
        q, kb_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + mb                                   # (T, nH*nts)
    # per-head max over static nts-lane groups
    m = jnp.concatenate(
        [jnp.broadcast_to(
            jnp.max(s[:, h * nts:(h + 1) * nts], axis=-1, keepdims=True),
            (s.shape[0], nts))
         for h in range(num_heads)], axis=-1)
    p = jnp.exp(s - m)
    o = jax.lax.dot_general(
        p, vb_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                        # (T, Ci + nH)
    den = jax.lax.dot_general(
        o[:, Ci:Ci + num_heads], e8_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                        # (T, Ci) per-head row-sums
    attn = o[:, :Ci] / den
    out = _dot(attn, wo_ref[...], dtype) + bo_ref[...]
    res = keys + out
    mu = jnp.mean(res, axis=-1, keepdims=True)
    var = jnp.mean((res - mu) ** 2, axis=-1, keepdims=True)
    keys2 = (res - mu) * jax.lax.rsqrt(var + eps) * g4_ref[...] + b4_ref[...]
    keys2_ref[0] = keys2.astype(keys2_ref.dtype)
    kn_ref[0] = (_dot(keys2 + pe, wkn_ref[...], dtype) + bkn_ref[...]).astype(kn_ref.dtype)
    vn_ref[0] = (_dot(keys2, wvn_ref[...], dtype) + bvn_ref[...]).astype(vn_ref.dtype)


def _cst(*shape):
    return pl.BlockSpec(shape, lambda b, i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _b_cst(*shape):
    return pl.BlockSpec(shape, lambda b, i: (b,) + (0,) * (len(shape) - 1),
                        memory_space=pltpu.VMEM)


def _rows(T, C):
    return pl.BlockSpec((1, T, C), lambda b, i: (b, i, 0),
                        memory_space=pltpu.VMEM)


def _pe_rows(T, C):
    return pl.BlockSpec((T, C), lambda b, i: (i, 0), memory_space=pltpu.VMEM)


def _t2i_kv_pallas(keys, key_pe, Wk, bk, Wv, bv, dtype, interpret=False):
    B, N, C = keys.shape
    Ci = Wk.shape[1]
    T = TROWS if N % TROWS == 0 else N
    kernel = functools.partial(_kv_kernel, dtype=dtype)
    return pl.pallas_call(
        kernel,
        grid=(B, N // T),
        in_specs=[_rows(T, C), _pe_rows(T, C), _cst(C, Ci), _cst(Ci),
                  _cst(C, Ci), _cst(Ci)],
        out_specs=[_rows(T, Ci), _rows(T, Ci)],
        out_shape=[jax.ShapeDtypeStruct((B, N, Ci), dtype)] * 2,
        interpret=interpret,
    )(keys, key_pe, Wk, bk, Wv, bv)


def _i2t_pallas(keys, key_pe, tok_k, tok_v, mask_bias, Wq, bq, Wout, bout,
                g4, b4, Wk_n, bk_n, Wv_n, bv_n, num_heads, dtype, eps,
                out_dtype=jnp.float32, interpret=False):
    # shared-keys mode (keys batch 1, tok batch B): the (1,N,C) image stream
    # is read ONCE per row block — the grid flips to (rows, B) with the token
    # batch INNERMOST so the keys/pe block index is unchanged across the
    # inner sweep (Pallas skips the re-fetch), trading the (B,N,C) fp32
    # keys re-reads (~268 MB at bucket 64) for per-step re-fetches of the
    # tiny (Ci,128)/(128,136) token operands
    shared = keys.shape[0] == 1 and tok_k.shape[0] > 1
    B, N, C = (tok_k.shape[0], keys.shape[1], keys.shape[2])
    Ci = Wq.shape[1]
    nH = num_heads
    hd = Ci // nH
    nts = tok_k.shape[1]
    T = TROWS if N % TROWS == 0 else N
    scale = hd ** -0.5
    # block-diagonal token operands (tiny: built once outside the kernel).
    # Built by broadcast-multiplying against a constant per-head lane mask —
    # the first version used .at[h-slices].set loops, which lowered to ~30
    # dynamic-update-slices at 31 us each (~0.9 ms/call, r4 decode trace).
    hm = np.zeros((nH, Ci), np.float32)
    for h in range(nH):
        hm[h, h * hd:(h + 1) * hd] = 1.0          # head-h lane mask
    hmj = jnp.asarray(hm, jnp.float32)        # fp32: see kernel comment
    tk = tok_k.astype(jnp.float32) * scale
    tv = tok_v.astype(jnp.float32)
    # kb[b, c, h*nts+j] = tk[b, j, c] * hm[h, c]
    kb = (tk.transpose(0, 2, 1)[:, :, None, :]
          * hmj.T[None, :, :, None]).reshape(B, Ci, nH * nts)
    # vb[b, h*nts+j, :Ci] = tv[b, j, :] * hm[h, :]; ones column per head
    vb3 = (tv[:, None, :, :] * hmj[None, :, None, :]).reshape(B, nH * nts, Ci)
    ones_cols = np.zeros((nH * nts, nH), np.float32)
    ones_cols[np.arange(nH * nts), np.arange(nH * nts) // nts] = 1.0
    vb = jnp.concatenate(
        [vb3, jnp.broadcast_to(jnp.asarray(ones_cols, jnp.float32),
                               (B, nH * nts, nH))], axis=-1)
    mb = jnp.tile(mask_bias.reshape(1, nts), (1, nH))
    e8 = hmj
    kernel = functools.partial(_i2t_kernel, num_heads=num_heads, nts=nts,
                               dtype=dtype, eps=eps)
    if shared:
        grid = (N // T, B)  # token batch innermost: keys/pe fetched once/row
        keys_spec = pl.BlockSpec((1, T, C), lambda i, b: (0, i, 0),
                                 memory_space=pltpu.VMEM)
        pe_spec = pl.BlockSpec((T, C), lambda i, b: (i, 0),
                               memory_space=pltpu.VMEM)

        def bc(*shape):
            return pl.BlockSpec(shape, lambda i, b: (b,) + (0,) * (len(shape) - 1),
                                memory_space=pltpu.VMEM)

        def cst(*shape):
            return pl.BlockSpec(shape, lambda i, b: (0,) * len(shape),
                                memory_space=pltpu.VMEM)

        out_spec = pl.BlockSpec((1, T, C), lambda i, b: (b, i, 0),
                                memory_space=pltpu.VMEM)
        out_spec_i = pl.BlockSpec((1, T, Ci), lambda i, b: (b, i, 0),
                                  memory_space=pltpu.VMEM)
        in_specs = [
            keys_spec, pe_spec,
            bc(1, Ci, nH * nts), bc(1, nH * nts, Ci + nH),
            cst(1, nH * nts), cst(nH, Ci),
            cst(C, Ci), cst(Ci), cst(Ci, C), cst(C), cst(C), cst(C),
            cst(C, Ci), cst(Ci), cst(C, Ci), cst(Ci),
        ]
        out_specs = [out_spec, out_spec_i, out_spec_i]
    else:
        grid = (B, N // T)
        in_specs = [
            _rows(T, C), _pe_rows(T, C),
            _b_cst(1, Ci, nH * nts), _b_cst(1, nH * nts, Ci + nH),
            _cst(1, nH * nts), _cst(nH, Ci),
            _cst(C, Ci), _cst(Ci), _cst(Ci, C), _cst(C), _cst(C), _cst(C),
            _cst(C, Ci), _cst(Ci), _cst(C, Ci), _cst(Ci),
        ]
        out_specs = [_rows(T, C), _rows(T, Ci), _rows(T, Ci)]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((B, N, C), out_dtype),
            jax.ShapeDtypeStruct((B, N, Ci), dtype),
            jax.ShapeDtypeStruct((B, N, Ci), dtype),
        ],
        interpret=interpret,
    )(keys, key_pe, kb, vb, mb, e8, Wq, bq, Wout,
      bout, g4, b4, Wk_n, bk_n, Wv_n, bv_n)


# ------------------------------------------------------------ public API

@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def _t2i_kv(keys, key_pe, Wk, bk, Wv, bv, dtype, use_pallas, interpret):
    if use_pallas:
        return _t2i_kv_pallas(keys, key_pe, Wk, bk, Wv, bv, dtype, interpret)
    return t2i_kv_proj_xla(keys, key_pe, Wk, bk, Wv, bv, dtype)


def _t2i_fwd(keys, key_pe, Wk, bk, Wv, bv, dtype, use_pallas, interpret):
    out = _t2i_kv(keys, key_pe, Wk, bk, Wv, bv, dtype, use_pallas, interpret)
    return out, (keys, key_pe, Wk, bk, Wv, bv)


def _t2i_bwd(dtype, use_pallas, interpret, res, g):
    _, vjp = jax.vjp(lambda *a: t2i_kv_proj_xla(*a, dtype), *res)
    return vjp(g)


_t2i_kv.defvjp(_t2i_fwd, _t2i_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(15, 16, 17, 18, 19))
def _i2t(keys, key_pe, tok_k, tok_v, mask_bias, Wq, bq, Wout, bout, g4, b4,
         Wk_n, bk_n, Wv_n, bv_n, num_heads, dtype, use_pallas, interpret,
         out_dtype):
    if use_pallas:
        return _i2t_pallas(keys, key_pe, tok_k, tok_v, mask_bias, Wq, bq,
                           Wout, bout, g4, b4, Wk_n, bk_n, Wv_n, bv_n,
                           num_heads, dtype, 1e-5, out_dtype, interpret)
    return i2t_update_xla(keys, key_pe, tok_k, tok_v, mask_bias, Wq, bq,
                          Wout, bout, g4, b4, Wk_n, bk_n, Wv_n, bv_n,
                          num_heads, dtype, out_dtype=out_dtype)


def _i2t_fwd(*args):
    out = _i2t(*args)
    return out, args[:15]


def _i2t_bwd(num_heads, dtype, use_pallas, interpret, out_dtype, res, g):
    _, vjp = jax.vjp(
        lambda *a: i2t_update_xla(*a, num_heads, dtype, out_dtype=out_dtype),
        *res,
    )
    return vjp(g)


_i2t.defvjp(_i2t_fwd, _i2t_bwd)


def t2i_kv_proj(keys, key_pe, Wk, bk, Wv, bv, dtype=jnp.bfloat16,
                force_xla=False, interpret=False):
    use_pallas = (not force_xla and jax.default_backend() == "tpu") or (
        interpret and not force_xla)
    return _t2i_kv(keys, key_pe, Wk, bk, Wv, bv, jnp.dtype(dtype),
                   use_pallas, interpret)


def i2t_update(keys, key_pe, tok_k, tok_v, mask_bias, Wq, bq, Wout, bout,
               g4, b4, Wk_n, bk_n, Wv_n, bv_n, num_heads,
               dtype=jnp.bfloat16, force_xla=False, interpret=False,
               out_dtype=jnp.float32):
    use_pallas = (not force_xla and jax.default_backend() == "tpu") or (
        interpret and not force_xla)
    return _i2t(keys, key_pe, tok_k, tok_v, mask_bias, Wq, bq, Wout, bout,
                g4, b4, Wk_n, bk_n, Wv_n, bv_n, num_heads, jnp.dtype(dtype),
                use_pallas, interpret, jnp.dtype(out_dtype))
