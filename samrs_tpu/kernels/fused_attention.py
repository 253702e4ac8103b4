"""Transpose-free window attention: heads resolved by in-kernel lane slicing.

Profiling the ViT-H encoder showed ~25% of device time in pure layout copies
(the (B,N,3,nH,hd)->(3,B*nH,N,hd) transposes around attention, plus the fp32
kernel outputs).  This kernel eliminates them:

  * the qkv Dense output (B, N, 3*C) is consumed DIRECTLY: BlockSpecs carve
    the q/k/v thirds out of the last axis (block slots 0/1/2), so no
    transpose or reshape is ever materialized;
  * inside the kernel each head is a STATIC LANE SLICE of the (N, C) tile
    (q = q_all[:, h*hd:(h+1)*hd]) — verified to compile on Mosaic, unlike
    4-D head-blocked refs whose per-head writes need an unsupported shape
    cast (the round-1 blocker);
  * rel-pos bias rides two small matmuls against one-hot expansion matrices
    inside the kernel (fp32 accumulation);
  * per-head outputs are concatenated along lanes and stored once as the
    (B, N, C) layout the following proj Dense wants — in the compute dtype
    (no fp32 round-trip).

Used for the windowed layers (N = ws*ws tokens per window, B = batch*windows);
the 4096-token global layers route through kernels/flash_attention.py.
Forward-only; backward falls back to the XLA composition via custom_vjp.

Reference hot path being replaced: GD/segment_anything/modeling/
image_encoder.py:185-240 (Attention) and :325-361 (add_decomposed_rel_pos).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from samrs_tpu.kernels.flash_attention import onehot_expansions


def attention_qkv_xla(qkv_flat, rel_h, rel_w, scale, num_heads):
    """Oracle. qkv_flat (B, N, 3*C); rel_h (B, N, nH*kh); rel_w (B, N, nH*kw).
    Returns (B, N, C)."""
    B, N, threeC = qkv_flat.shape
    C = threeC // 3
    nH = num_heads
    hd = C // nH
    kh = rel_h.shape[-1] // nH
    kw = rel_w.shape[-1] // nH
    qkv = qkv_flat.reshape(B, N, 3, nH, hd)
    q = qkv[:, :, 0].astype(jnp.float32)
    k = qkv[:, :, 1].astype(jnp.float32)
    v = qkv[:, :, 2].astype(jnp.float32)
    s = jnp.einsum("bqnd,bknd->bnqk", q * scale, k)
    eh, ew = onehot_expansions(kh, kw, jnp.float32)
    rh = rel_h.reshape(B, N, nH, kh).astype(jnp.float32)
    rw = rel_w.reshape(B, N, nH, kw).astype(jnp.float32)
    s = s + jnp.einsum("bqnh,kh->bnqk", rh, eh)
    s = s + jnp.einsum("bqnw,kw->bnqk", rw, ew)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bnqk,bknd->bqnd", p, v)
    return o.reshape(B, N, C).astype(qkv_flat.dtype)


def _kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, eh_ref, ew_ref, o_ref,
            *, scale, nH, hd, kh, kw):
    q_all = q_ref[0]  # (N, C) — this program's window, all heads
    k_all = k_ref[0]
    v_all = v_ref[0]
    rh_all = rh_ref[0]  # (N, nH*kh)
    rw_all = rw_ref[0]
    eh = eh_ref[...]  # (N, kh) one-hot row->k expansion
    ew = ew_ref[...]
    outs = []
    for h in range(nH):  # static python unroll; all slices at static offsets
        q = q_all[:, h * hd:(h + 1) * hd] * scale
        k = k_all[:, h * hd:(h + 1) * hd]
        v = v_all[:, h * hd:(h + 1) * hd]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s + jax.lax.dot_general(
            rh_all[:, h * kh:(h + 1) * kh], eh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = s + jax.lax.dot_general(
            rw_all[:, h * kw:(h + 1) * kw], ew,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append(o.astype(o_ref.dtype))
    o_ref[0] = jnp.concatenate(outs, axis=-1)  # one (N, C) store


def _fused_pallas(qkv_flat, rel_h, rel_w, scale, num_heads, interpret=False):
    B, N, threeC = qkv_flat.shape
    C = threeC // 3
    nH = num_heads
    hd = C // nH
    kh = rel_h.shape[-1] // nH
    kw = rel_w.shape[-1] // nH
    cdt = qkv_flat.dtype
    eh, ew = onehot_expansions(kh, kw, cdt)  # (N, kh), (N, kw)
    kernel = functools.partial(_kernel, scale=scale, nH=nH, hd=hd, kh=kh, kw=kw)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            # q/k/v thirds of the fused Dense output, selected by block slot
            pl.BlockSpec((1, N, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b: (b, 0, 1), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b: (b, 0, 2), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, nH * kh), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, nH * kw), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, kh), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((N, kw), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, N, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), cdt),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * nH * N * N * hd, bytes_accessed=B * N * C * 8,
            transcendentals=B * nH * N * N,
        ),
        interpret=interpret,
    )(qkv_flat, qkv_flat, qkv_flat, rel_h, rel_w, eh, ew)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _fused(qkv_flat, rel_h, rel_w, scale, num_heads, use_pallas, interpret):
    if use_pallas:
        return _fused_pallas(qkv_flat, rel_h, rel_w, scale, num_heads, interpret)
    return attention_qkv_xla(qkv_flat, rel_h, rel_w, scale, num_heads)


def _fwd(qkv_flat, rel_h, rel_w, scale, num_heads, use_pallas, interpret):
    out = _fused(qkv_flat, rel_h, rel_w, scale, num_heads, use_pallas, interpret)
    return out, (qkv_flat, rel_h, rel_w)


def _bwd(scale, num_heads, use_pallas, interpret, res, g):
    qkv_flat, rel_h, rel_w = res
    _, vjp = jax.vjp(
        lambda *a: attention_qkv_xla(*a, scale, num_heads), qkv_flat, rel_h, rel_w
    )
    return vjp(g.astype(qkv_flat.dtype))


_fused.defvjp(_fwd, _bwd)


def attention_qkv_fused(
    qkv_raw: jnp.ndarray,  # (B, N, 3*C) — the qkv Dense output, untouched
    Rh: jnp.ndarray,  # (kh, kh, hd)
    Rw: jnp.ndarray,  # (kw, kw, hd)
    hw: Tuple[int, int],
    scale: float,
    num_heads: int,
    force_xla: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns (B, N, C) in qkv's dtype (proj-Dense-ready, no transposes)."""
    kh, kw = hw
    B, N, threeC = qkv_raw.shape
    C = threeC // 3
    nH = num_heads
    hd = C // nH
    # per-query rel-pos projections: two small matmuls on the q third
    q4 = qkv_raw[..., :C].reshape(B, kh, kw, nH, hd)
    rel_h = jnp.einsum(
        "bxynd,xkd->bxynk", q4, Rh.astype(q4.dtype), preferred_element_type=jnp.float32
    ).reshape(B, N, nH * kh).astype(qkv_raw.dtype)
    rel_w = jnp.einsum(
        "bxynd,ykd->bxynk", q4, Rw.astype(q4.dtype), preferred_element_type=jnp.float32
    ).reshape(B, N, nH * kw).astype(qkv_raw.dtype)
    use_pallas = (
        not force_xla and jax.default_backend() == "tpu" and N <= 1024
    ) or (interpret and not force_xla)
    return _fused(qkv_raw, rel_h, rel_w, scale, nH, use_pallas, interpret)
