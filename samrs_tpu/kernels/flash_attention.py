"""Fused attention for SAM's global-attention layers, with decomposed rel-pos.

The reference materializes the full (4096, 4096) attention tensor per head for
the 4 global layers of the SAM encoder (image_encoder.py:185-240 + :325-361).
On TPU that costs ~1 GB of HBM round-trips per image for ViT-H; this kernel
keeps each query tile's logits in VMEM, folds the decomposed relative-position
bias into the tile (rel_h broadcast over key columns, rel_w over key rows) and
never writes the attention matrix to HBM.

Layout: tokens are row-major over the (H, W) grid, so for key index k,
kh = k // W and kw = k % W.  With a query tile of TQ rows the bias add is a
reshape to (TQ, Kh, Kw) + two broadcasts — no gathers.

Forward-only Pallas (generation never trains SAM); gradients fall back to the
pure-XLA reference via custom_vjp recompute.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
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


def _flash_kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, o_ref, *, scale, kh, kw):
    q = q_ref[0].astype(jnp.float32)  # (TQ, d)
    k = k_ref[0]  # (N, d)
    v = v_ref[0]
    n = kh * kw
    s = jax.lax.dot_general(
        (q * scale).astype(k.dtype),
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (TQ, N)
    # decomposed rel-pos bias WITHOUT lane reshapes (Mosaic rejects
    # (TQ, N)->(TQ, kh, kw)): bias = rel_h @ Eh + rel_w @ Ew where
    # Eh[i, col] = [col // kw == i], Ew[j, col] = [col % kw == j] — two small
    # 0/1 expansion matmuls that ride the MXU.
    col = jax.lax.broadcasted_iota(jnp.int32, (kh, n), 1)
    row_h = jax.lax.broadcasted_iota(jnp.int32, (kh, n), 0)
    eh = (col // kw == row_h).astype(jnp.float32)
    col_w = jax.lax.broadcasted_iota(jnp.int32, (kw, n), 1)
    row_w = jax.lax.broadcasted_iota(jnp.int32, (kw, n), 0)
    ew = (col_w % kw == row_w).astype(jnp.float32)
    s = s + jax.lax.dot_general(
        rh_ref[0], eh, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    s = s + jax.lax.dot_general(
        rw_ref[0], ew, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p = p / l
    o = jax.lax.dot_general(
        p.astype(v.dtype),
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = o.astype(o_ref.dtype)


def _flash_attention_fwd_pallas(q, k, v, rel_h, rel_w, scale, interpret=False):
    B, N, d = q.shape
    kh, kw = rel_h.shape[-1], rel_w.shape[-1]
    assert kh * kw == N, f"rel-pos grid {kh}x{kw} != {N} tokens"
    assert N % TQ == 0
    grid = (B, N // TQ)
    kernel = functools.partial(_flash_kernel, scale=scale, kh=kh, kw=kw)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TQ, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TQ, kh), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TQ, kw), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TQ, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * N * N * d, bytes_accessed=4 * B * N * d * 4, transcendentals=B * N * N
        ),
        interpret=interpret,
    )(q, k, v, rel_h, rel_w)


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
    qf = q.astype(jnp.float32)
    r_q = qf.reshape(B, H, W, d)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, Rh.astype(jnp.float32)).reshape(B, N, H)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, Rw.astype(jnp.float32)).reshape(B, N, W)
    use_pallas = (
        not force_xla
        and jax.default_backend() == "tpu"
        and N % TQ == 0
    ) or (interpret and not force_xla)
    return _attention_relpos(q, k, v, rel_h, rel_w, scale, use_pallas, interpret)
