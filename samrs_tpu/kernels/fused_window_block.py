"""Partition-free windowed attention: window tiles read straight from the
(B, H, W, 3C) qkv map, output written back unpartitioned.

The round-2 fused kernel (kernels/fused_attention.py) already consumed the
qkv Dense output without head transposes, but still required the caller to
window-partition the token map first — the B=4 ViT-H trace shows ~13.7 ms/img
of copy/reshape/pad/slice traffic, most of it the partition/unpartition
shuffles around the 28 windowed blocks.  This kernel removes the partition
entirely:

  * the qkv Dense runs on the UNPADDED (B, H, W, C) map (the partitioned
    path wastes ws-pad tokens: 4900 vs 4096 rows for ViT-H), and its output
    is padded once to a window multiple (Hp, Wp);
  * the padded map is viewed as (B, nwh, ws, nww, ws, 3C) — a pure
    dimension SPLIT (H->(nwh,ws), W->(nww,ws)), i.e. a free bitcast, never
    the (..,nwh,nww,ws,ws,..) TRANSPOSE that costs the partitioned path its
    copies — and the Pallas grid (B, nwh, nww, groups) carves ONE (ws, ws)
    window tile per program via BlockSpecs.  Block dim -2 is the full ws
    axis (Mosaic-legal) and the per-program working set is a few hundred KB
    (the earlier full-row variant held 5 windows x all heads and overflowed
    the 16 MB scoped VMEM on ViT-H).  The in-kernel (ws, 1, ws, C) ->
    (ws*ws, C) collapse is a sublane reshape (lane dim untouched);
  * decomposed rel-pos rides an AUGMENTED-K matmul: per head,
    s = [q*scale | rel_h | rel_w] @ [k | onehot_u | onehot_v]^T — ONE
    (N, hd+2ws) x (hd+2ws, N) MXU matmul instead of three separate ones;
  * heads are static lane slices (round-2 Mosaic-verified pattern); outputs
    concatenate along lanes and store once per window tile, landing already
    unpartitioned in (B, Hp, Wp, C); the caller crops to (H, W) and projects
    4096 rows instead of 4900.

Padding parity: the reference zero-pads the normed token map BEFORE its qkv
projection and lets pad tokens participate in window attention
(image_encoder.py:243-289 + :227-233 — no masking), so pad tokens carry
k = v = qkv BIAS.  Since this kernel pads the qkv OUTPUT, pad positions are
filled with the bias row (``pad_fill``), not zero — zero-fill only agrees on
zero-bias (random-init) weights.

MEASURED RESULT (2026-08-18, v5e, ViT-H B=4, inside the full encoder jit):
this partition-free kernel runs 76.8 ms/img vs 66.1 ms/img for the
partitioned fused kernel (kernels/fused_attention.py), with bitwise-equal
outputs (zero-bias random init; real checkpoints additionally need the
``pad_fill`` bias fill below for exact agreement).  The per-window grid (100 programs/layer at ~250 KB blocks) loses
more to program-dispatch and small-matmul overhead than the partition
copies cost; the full-row variant (5 windows x all heads per program)
overflows the 16 MB scoped VMEM on ViT-H.  Kept as `window_attn_impl=
"fused2"` for future shapes, but "fused" remains the default.

Forward-only; backward falls back to the XLA composition via custom_vjp
(free rematerialization — the forward never stores logits).

Reference hot path replaced: GD/segment_anything/modeling/
image_encoder.py:119-240 (windowed Block + Attention) and :325-361.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _onehots(ws: int, dtype) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(ws*ws, ws) one-hot row / col expansions for the augmented-K matmul."""
    n = ws * ws
    u = np.arange(n) // ws
    v = np.arange(n) % ws
    eu = np.zeros((n, ws), np.float32)
    ev = np.zeros((n, ws), np.float32)
    eu[np.arange(n), u] = 1.0
    ev[np.arange(n), v] = 1.0
    return jnp.asarray(eu, dtype), jnp.asarray(ev, dtype)


def _rel_projections(q4, Rh, Rw, ws):
    """Per-token rel-pos projections on the UNPADDED map.

    q4: (B, H, W, nH, hd).  Rh/Rw: (ws, ws, hd) gathered tables.
    Returns rel_h, rel_w (B, H, W, nH*ws): rel_h[b,x,y,h*ws+u] is the bias a
    query at in-window row (x % ws) pays to keys at in-window row u.
    """
    B, H, W, nH, hd = q4.shape
    rh_x = Rh[jnp.asarray(np.arange(H) % ws)]  # (H, ws, hd)
    rw_y = Rw[jnp.asarray(np.arange(W) % ws)]  # (W, ws, hd)
    rel_h = jnp.einsum(
        "bxynd,xkd->bxynk", q4, rh_x.astype(q4.dtype),
        preferred_element_type=jnp.float32,
    )
    rel_w = jnp.einsum(
        "bxynd,ykd->bxynk", q4, rw_y.astype(q4.dtype),
        preferred_element_type=jnp.float32,
    )
    return (rel_h.reshape(B, H, W, nH * ws).astype(q4.dtype),
            rel_w.reshape(B, H, W, nH * ws).astype(q4.dtype))


def _pad_with_fill(qkv_raw, Hp, Wp, pad_fill):
    """Zero-pad (B,H,W,3C) to (B,Hp,Wp,3C); pad positions get ``pad_fill``.

    ``pad_fill`` is the qkv Dense BIAS row: the reference pads the normed x
    map with zeros BEFORE its qkv projection (image_encoder.py:243-289), so
    pad tokens carry k = v = bias, not zero.  Filling the padded qkv map with
    the bias reproduces that exactly (zero-fill only matches when the bias is
    zero, e.g. random flax init — NOT real checkpoints)."""
    B, H, W, _ = qkv_raw.shape
    x = jnp.pad(qkv_raw, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
    if pad_fill is not None and (Hp != H or Wp != W):
        real = (jnp.arange(Hp) < H)[:, None] & (jnp.arange(Wp) < W)[None, :]
        x = jnp.where(real[None, :, :, None], x, pad_fill.astype(x.dtype))
    return x


def window_block_xla(qkv_raw, Rh, Rw, ws, scale, num_heads, pad_fill=None):
    """Pure-JAX oracle with identical padding semantics. qkv (B,H,W,3C) ->
    (B,H,W,C)."""
    B, H, W, threeC = qkv_raw.shape
    C = threeC // 3
    nH = num_heads
    hd = C // nH
    Hp, Wp = -(-H // ws) * ws, -(-W // ws) * ws
    x = _pad_with_fill(qkv_raw, Hp, Wp, pad_fill)
    nwh, nww = Hp // ws, Wp // ws
    x = x.reshape(B, nwh, ws, nww, ws, 3, nH, hd)
    x = x.transpose(0, 1, 3, 5, 6, 2, 4, 7)  # (B,nwh,nww,3,nH,ws,ws,hd)
    x = x.reshape(B * nwh * nww, 3, nH, ws * ws, hd)
    q = x[:, 0].astype(jnp.float32)
    k = x[:, 1].astype(jnp.float32)
    v = x[:, 2].astype(jnp.float32)
    s = jnp.einsum("wnqd,wnkd->wnqk", q * scale, k)
    rq = q.reshape(-1, nH, ws, ws, hd)
    rel_h = jnp.einsum("wnxyd,xud->wnxyu", rq, Rh.astype(jnp.float32))
    rel_w = jnp.einsum("wnxyd,yvd->wnxyv", rq, Rw.astype(jnp.float32))
    s = s.reshape(-1, nH, ws, ws, ws, ws)
    s = s + rel_h[..., :, None] + rel_w[..., None, :]
    s = s.reshape(-1, nH, ws * ws, ws * ws)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("wnqk,wnkd->wnqd", p, v)
    o = o.reshape(B, nwh, nww, nH, ws, ws, hd)
    o = o.transpose(0, 1, 4, 2, 5, 3, 6).reshape(B, Hp, Wp, C)
    return o[:, :H, :W].astype(qkv_raw.dtype)


def _kernel(q_ref, k_ref, v_ref, rh_ref, rw_ref, eu_ref, ev_ref, o_ref,
            *, scale, hd, ws, gh):
    # one program = ONE (ws, ws) window for ONE head group of gh heads.
    # Refs are (1, 1, ws, 1, ws, lanes) blocks of the 6-D split view; heads
    # are contiguous lanes (static in-kernel lane slices, the Mosaic-verified
    # round-2 pattern); the rel tables arrive pre-packed per group with
    # 128-aligned lanes.
    n = ws * ws
    q_all = q_ref[0, 0, :, 0].reshape(n, gh * hd)  # sublane-collapse reshape
    k_all = k_ref[0, 0, :, 0].reshape(n, gh * hd)
    v_all = v_ref[0, 0, :, 0].reshape(n, gh * hd)
    rh_all = rh_ref[0, 0, :, 0].reshape(n, rh_ref.shape[-1])
    rw_all = rw_ref[0, 0, :, 0].reshape(n, rw_ref.shape[-1])
    eu = eu_ref[...]                     # (N, ws)
    ev = ev_ref[...]
    outs = []
    for h in range(gh):  # static unroll; all slices at static lane offsets
        # augmented-K: one matmul carries QK^T and both rel-pos biases
        q_aug = jnp.concatenate([
            q_all[:, h * hd:(h + 1) * hd] * scale,
            rh_all[:, h * ws:(h + 1) * ws],
            rw_all[:, h * ws:(h + 1) * ws],
        ], axis=-1)                   # (N, hd + 2ws)
        k_aug = jnp.concatenate([
            k_all[:, h * hd:(h + 1) * hd], eu, ev,
        ], axis=-1)                   # (N, hd + 2ws)
        s = jax.lax.dot_general(
            q_aug, k_aug, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v_all.dtype), v_all[:, h * hd:(h + 1) * hd],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        outs.append(o.astype(o_ref.dtype))
    o_ref[0, 0, :, 0] = jnp.concatenate(outs, axis=-1).reshape(ws, ws, gh * hd)


def _pallas(qkv_raw, Rh, Rw, ws, scale, num_heads, pad_fill=None, interpret=False):
    B, H, W, threeC = qkv_raw.shape
    C = threeC // 3
    nH = num_heads
    hd = C // nH
    cdt = qkv_raw.dtype
    Hp, Wp = -(-H // ws) * ws, -(-W // ws) * ws
    nwh, nww = Hp // ws, Wp // ws
    n = ws * ws

    q4 = qkv_raw[..., :C].reshape(B, H, W, nH, hd)
    rel_h, rel_w = _rel_projections(q4, Rh, Rw, ws)

    pad = ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0))
    qkv_p = _pad_with_fill(qkv_raw, Hp, Wp, pad_fill)
    rel_h = jnp.pad(rel_h, pad)
    rel_w = jnp.pad(rel_w, pad)
    eu, ev = _onehots(ws, cdt)

    # head-group split bounds per-program VMEM (q/k/v/out window tiles at
    # gh*hd lanes each); lane blocks must be %128 or the full dim.  With
    # one-window tiles the footprint is small (ViT-H all-16-heads tile:
    # 4*196*1280*2B + rel = ~2.1 MB, double-buffered ~4.2 MB), so the first
    # legal candidate is normally n_groups=1.
    dsize = np.dtype(cdt).itemsize
    n_groups = 1
    for cand in (1, 2, 4, 8, 16):
        if nH % cand:
            continue
        gh_c = nH // cand
        if (gh_c * hd) % 128 != 0 and gh_c * hd != C:
            continue
        n_groups = cand
        L_c = -(-gh_c * ws // 128) * 128
        vm = (4 * gh_c * hd + 2 * L_c) * n * dsize
        if 2 * vm < 8 * 2**20:  # double-buffered working set < 8MB
            break
    gh = nH // n_groups
    gC = gh * hd
    # rel tables packed per head group, lanes padded to a 128 multiple so
    # each group's slice is a legal lane block
    L = -(-gh * ws // 128) * 128
    def pack(rel):
        r = rel.reshape(B, Hp, Wp, n_groups, gh * ws)
        r = jnp.pad(r, ((0, 0),) * 4 + ((0, L - gh * ws),))
        return r.reshape(B, nwh, ws, nww, ws, n_groups * L)
    rel_h = pack(rel_h)
    rel_w = pack(rel_w)
    # free 6-D split view: H->(nwh, ws), W->(nww, ws); no transpose
    qkv6 = qkv_p.reshape(B, nwh, ws, nww, ws, threeC)

    kernel = functools.partial(_kernel, scale=scale, hd=hd, ws=ws, gh=gh)
    win_spec = lambda lanes, off: pl.BlockSpec(
        (1, 1, ws, 1, ws, lanes),
        lambda b, i, j, g, _o=off: (b, i, 0, j, 0, _o + g),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, nwh, nww, n_groups),
        in_specs=[
            # q/k/v head-group lane blocks of the fused qkv map: with lane
            # block gC, q group g is block g, k group g is block n_groups + g
            win_spec(gC, 0),
            win_spec(gC, n_groups),
            win_spec(gC, 2 * n_groups),
            win_spec(L, 0),
            win_spec(L, 0),
            pl.BlockSpec((n, ws), lambda b, i, j, g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, ws), lambda b, i, j, g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, ws, 1, ws, gC), lambda b, i, j, g: (b, i, 0, j, 0, g),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, nwh, ws, nww, ws, C), cdt),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * nwh * nww * nH * n * n * (hd + 2 * ws),
            bytes_accessed=B * Hp * Wp * (threeC + C) * 2,
            transcendentals=B * nwh * nww * nH * n * n,
        ),
        interpret=interpret,
    )(qkv6, qkv6, qkv6, rel_h, rel_w, eu, ev)
    return out.reshape(B, Hp, Wp, C)[:, :H, :W]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _fused(qkv_raw, Rh, Rw, pad_fill, ws, scale, num_heads, use_pallas, interpret):
    if use_pallas:
        return _pallas(qkv_raw, Rh, Rw, ws, scale, num_heads, pad_fill, interpret)
    return window_block_xla(qkv_raw, Rh, Rw, ws, scale, num_heads, pad_fill)


def _fwd(qkv_raw, Rh, Rw, pad_fill, ws, scale, num_heads, use_pallas, interpret):
    out = _fused(qkv_raw, Rh, Rw, pad_fill, ws, scale, num_heads, use_pallas, interpret)
    return out, (qkv_raw, Rh, Rw, pad_fill)


def _bwd(ws, scale, num_heads, use_pallas, interpret, res, g):
    qkv_raw, Rh, Rw, pad_fill = res
    _, vjp = jax.vjp(
        lambda *a: window_block_xla(*a[:3], ws, scale, num_heads, a[3]),
        qkv_raw, Rh, Rw, pad_fill,
    )
    return vjp(g.astype(qkv_raw.dtype))


_fused.defvjp(_fwd, _bwd)


def window_attention_partition_free(
    qkv_raw: jnp.ndarray,  # (B, H, W, 3C) — the qkv Dense output, unpartitioned
    Rh: jnp.ndarray,  # (ws, ws, hd) gathered rel-pos table
    Rw: jnp.ndarray,
    ws: int,
    scale: float,
    num_heads: int,
    force_xla: bool = False,
    interpret: bool = False,
    pad_fill: jnp.ndarray = None,  # (3C,) qkv bias row; see _pad_with_fill
) -> jnp.ndarray:
    """Returns (B, H, W, C) attention output, unpartitioned (proj-ready)."""
    use_pallas = (not force_xla and jax.default_backend() == "tpu") or (
        interpret and not force_xla
    )
    return _fused(qkv_raw, Rh, Rw, pad_fill, ws, scale, num_heads, use_pallas, interpret)
