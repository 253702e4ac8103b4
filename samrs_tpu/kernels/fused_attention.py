"""Transpose-free attention: heads resolved by BlockSpec indexing.

Profiling the ViT-H encoder showed ~25% of device time in pure layout copies
(the (B,N,3,nH,hd)->(3,B*nH,N,hd) transposes around attention, plus the
fp32 kernel outputs).  This kernel eliminates them:

  * the qkv Dense output is viewed as (B, N, 3*nH, hd) — a FREE reshape — and
    the grid (B, nH, q_tiles) picks q/k/v head slices straight out of it via
    block index maps (DMA with striding, no materialized transpose);
  * rel-pos bias rides two small bf16 matmuls against one-hot expansion
    matrices inside the kernel (fp32 accumulation);
  * the output block writes into (B, N, nH, hd) — again a free reshape away
    from the (B, N, C) layout the following proj Dense wants — in the compute
    dtype (no fp32 round-trip).

Used for both windowed layers (q_tiles=1, N=196) and global layers
(N=4096 tiled by TQ).  Forward-only; backward falls back to the XLA
composition via custom_vjp.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from samrs_tpu.kernels.flash_attention import onehot_expansions

TQ_GLOBAL = 256  # query tile for large-N (global) layers (s-tile 4MB fp32 VMEM)


def attention_qkv_xla(qkv, rel_h, rel_w, scale, num_heads):
    """Oracle. qkv (B, N, 3, nH, hd); rel_h (B, N, nH, kh); rel_w (B, N, nH, kw)."""
    B, N, _, nH, hd = qkv.shape
    kh, kw = rel_h.shape[-1], rel_w.shape[-1]
    q = qkv[:, :, 0].astype(jnp.float32)
    k = qkv[:, :, 1].astype(jnp.float32)
    v = qkv[:, :, 2].astype(jnp.float32)
    s = jnp.einsum("bqnd,bknd->bnqk", q * scale, k)
    eh, ew = onehot_expansions(kh, kw, jnp.float32)
    s = s + jnp.einsum("bqnh,kh->bnqk", rel_h.astype(jnp.float32), eh)
    s = s + jnp.einsum("bqnw,kw->bnqk", rel_w.astype(jnp.float32), ew)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bnqk,bknd->bqnd", p, v)
    return o.astype(qkv.dtype)


def _kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, eh_ref, ew_ref, o_ref, *, scale, hb):
    # refs carry `hb` heads per program (Mosaic needs the -2 block dim % 8)
    def one(h, _):
        q = q_ref[0, :, h] * scale  # (TQ, hd)
        k = k_ref[0, :, h]  # (N, hd)
        v = v_ref[0, :, h]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s + jax.lax.dot_general(
            rh_ref[0, :, h], eh_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s + jax.lax.dot_general(
            rw_ref[0, :, h], ew_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, h] = o.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, hb, one, 0, unroll=True)


def _fused_pallas(qkv, rel_h, rel_w, scale, interpret=False):
    B, N, three, nH, hd = qkv.shape
    kh, kw = rel_h.shape[-1], rel_w.shape[-1]
    cdt = qkv.dtype
    eh, ew = onehot_expansions(kh, kw, cdt)  # (N, kh), (N, kw)
    tq = N if N <= 1024 else TQ_GLOBAL
    assert N % tq == 0
    # heads per program: the -2 block dim must be divisible by 8 (Mosaic) or
    # equal the full head axis
    if nH % 8 == 0:
        hb = 8
    elif nH % 4 == 0 and interpret:
        hb = 4  # compiled Mosaic would reject 4; fine in interpret tests
    else:
        hb = nH
    grid = (B, nH // hb, N // tq)
    # view qkv as (B, N, 3*nH, hd): head-h q at slot h, k at nH+h, v at 2nH+h
    qkv_flat = qkv.reshape(B, N, 3 * nH, hd)
    hsl = nH // hb  # head-block count
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, hb=hb),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tq, hb, hd), lambda b, h, i: (b, i, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, hb, hd), lambda b, h, i: (b, 0, hsl + h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, hb, hd), lambda b, h, i: (b, 0, 2 * hsl + h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, hb, kh), lambda b, h, i: (b, i, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, hb, kw), lambda b, h, i: (b, i, h, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, kh), lambda b, h, i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, kw), lambda b, h, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tq, hb, hd), lambda b, h, i: (b, i, h, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, nH, hd), cdt),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * nH * N * N * hd, bytes_accessed=B * N * nH * hd * 8,
            transcendentals=B * nH * N * N,
        ),
        interpret=interpret,
    )(qkv_flat, qkv_flat, qkv_flat, rel_h, rel_w, eh, ew)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused(qkv, rel_h, rel_w, scale, num_heads, use_pallas, interpret):
    if use_pallas:
        return _fused_pallas(qkv, rel_h, rel_w, scale, interpret)
    return attention_qkv_xla(qkv, rel_h, rel_w, scale, num_heads)


def _fwd(qkv, rel_h, rel_w, scale, num_heads, use_pallas, interpret):
    out = _fused(qkv, rel_h, rel_w, scale, num_heads, use_pallas, interpret)
    return out, (qkv, rel_h, rel_w)


def _bwd(scale, num_heads, use_pallas, interpret, res, g):
    qkv, rel_h, rel_w = res
    _, vjp = jax.vjp(
        lambda *a: attention_qkv_xla(*a, scale, num_heads), qkv, rel_h, rel_w
    )
    return vjp(g.astype(qkv.dtype))


_fused.defvjp(_fwd, _bwd)


def attention_qkv_fused(
    qkv: jnp.ndarray,  # (B, N, 3, nH, hd) — the Dense output, reshaped for free
    Rh: jnp.ndarray,  # (kh, kh, hd)
    Rw: jnp.ndarray,  # (kw, kw, hd)
    hw: Tuple[int, int],
    scale: float,
    force_xla: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (B, N, nH, hd) in qkv's dtype."""
    kh, kw = hw
    B, N, _, nH, hd = qkv.shape
    q4 = qkv[:, :, 0].reshape(B, kh, kw, nH, hd)
    rel_h = jnp.einsum(
        "bxynd,xkd->bxynk", q4, Rh.astype(q4.dtype), preferred_element_type=jnp.float32
    ).reshape(B, N, nH, kh).astype(qkv.dtype)
    rel_w = jnp.einsum(
        "bxynd,ykd->bxynk", q4, Rw.astype(q4.dtype), preferred_element_type=jnp.float32
    ).reshape(B, N, nH, kw).astype(qkv.dtype)
    tq = N if N <= 1024 else TQ_GLOBAL
    use_pallas = (
        not force_xla
        and jax.default_backend() == "tpu"
        and N % tq == 0
        and N <= 1024
        and nH % 8 == 0  # compiled Mosaic: -2 block dim must be %8
    ) or (interpret and not force_xla)
    return _fused(qkv, rel_h, rel_w, scale, nH, use_pallas, interpret)
