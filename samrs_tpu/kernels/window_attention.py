"""Fused window attention with decomposed rel-pos for the SAM encoder.

The 28 windowed layers of ViT-H dominate HBM traffic when expressed as plain
XLA einsums: the (B*windows*heads, 196, 196) logits tensor is ~2.5 GB per
layer round-tripped through HBM.  This kernel keeps each block of windows'
logits in VMEM: QK^T + rel-pos bias + softmax + @V per grid step, never
writing attention weights to memory.

Same bias trick as flash_attention.py: the decomposed rel-pos add is two 0/1
expansion matmuls (no lane reshapes).  Forward-only custom_vjp (generation
path); backward falls back to the XLA composition.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WB = 16  # windows (rows of the batch dim) per grid step


def window_attention_xla(q, k, v, rel_h, rel_w, scale):
    """Oracle: q,k,v (B, N, d); rel_h (B, N, kh); rel_w (B, N, kw)."""
    B, N, _ = q.shape
    kh, kw = rel_h.shape[-1], rel_w.shape[-1]
    s = jnp.einsum("bqd,bkd->bqk", q * scale, k, preferred_element_type=jnp.float32)
    s = s.reshape(B, N, kh, kw) + rel_h[..., :, None] + rel_w[..., None, :]
    p = jax.nn.softmax(s.reshape(B, N, N), axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v, preferred_element_type=jnp.float32)


def _kernel(qp_ref, kp_ref, v_ref, o_ref):
    """Per-window fused attention on augmented operands (see flash_attention:
    the rel-pos bias is folded into the q'/k' contraction)."""

    def one(i, _):
        qp = qp_ref[i]  # (N, d') scaled + augmented
        kp = kp_ref[i]
        v = v_ref[i]
        s = jax.lax.dot_general(
            qp, kp, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[i] = o.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, qp_ref.shape[0], one, 0, unroll=True)


def _window_attention_pallas(q, k, v, rel_h, rel_w, scale, interpret=False):
    from samrs_tpu.kernels.flash_attention import onehot_expansions

    B, N, d = q.shape
    kh, kw = rel_h.shape[-1], rel_w.shape[-1]
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
    dp = d + kh + kw
    wb = WB
    while B % wb:
        wb //= 2
    wb = max(wb, 1)
    grid = (B // wb,)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((wb, N, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wb, N, dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((wb, N, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wb, N, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * N * N * (dp + d), bytes_accessed=2 * B * N * dp * 2,
            transcendentals=B * N * N,
        ),
        interpret=interpret,
    )(qp, kp, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _window_attention(q, k, v, rel_h, rel_w, scale, use_pallas, interpret):
    if use_pallas:
        return _window_attention_pallas(q, k, v, rel_h, rel_w, scale, interpret)
    return window_attention_xla(q, k, v, rel_h, rel_w, scale)


def _fwd(q, k, v, rel_h, rel_w, scale, use_pallas, interpret):
    return _window_attention(q, k, v, rel_h, rel_w, scale, use_pallas, interpret), (
        q, k, v, rel_h, rel_w,
    )


def _bwd(scale, use_pallas, interpret, res, g):
    q, k, v, rel_h, rel_w = res
    _, vjp = jax.vjp(lambda *a: window_attention_xla(*a, scale), q, k, v, rel_h, rel_w)
    return vjp(g)


_window_attention.defvjp(_fwd, _bwd)


def window_attention_relpos(
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
    """Windowed attention over (kh, kw) token grids.

    q, k, v: (B, N, d) with B = batch*windows*heads, N == kh*kw;
    Rh: (kh, kh, d); Rw: (kw, kw, d).  Returns (B, N, d) fp32.
    """
    kh, kw = hw
    B, N, d = q.shape
    qf = q.astype(jnp.float32)
    r_q = qf.reshape(B, kh, kw, d)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, Rh.astype(jnp.float32)).reshape(B, N, kh)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, Rw.astype(jnp.float32)).reshape(B, N, kw)
    use_pallas = (not force_xla and jax.default_backend() == "tpu") or (
        interpret and not force_xla
    )
    return _window_attention(q, k, v, rel_h, rel_w, scale, use_pallas, interpret)
