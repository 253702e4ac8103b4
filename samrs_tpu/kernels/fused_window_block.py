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
  * the Pallas grid is (B, Hp/ws, Wp/ws); BlockSpecs carve each (ws, ws)
    window tile out of rows/cols directly — zero partition copies.  The
    in-kernel (ws, ws, C) -> (ws*ws, C) collapse is a sublane reshape,
    verified to compile on Mosaic (lane dim untouched);
  * decomposed rel-pos rides an AUGMENTED-K matmul: per head,
    s = [q*scale | rel_h | rel_w] @ [k | onehot_u | onehot_v]^T — ONE
    (N, hd+2ws) x (hd+2ws, N) MXU matmul instead of three separate ones;
  * heads are static lane slices (round-2 Mosaic-verified pattern); outputs
    concatenate along lanes and store once per window tile, landing already
    unpartitioned in (B, Hp, Wp, C); the caller crops to (H, W) and projects
    4096 rows instead of 4900.

Zero-padding parity: the reference pads the token map with zeros and lets
pad tokens participate in window attention (image_encoder.py:243-289 +
:227-233 — no masking), so padded K/V columns here behave identically.

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


def window_block_xla(qkv_raw, Rh, Rw, ws, scale, num_heads):
    """Pure-JAX oracle with identical padding semantics. qkv (B,H,W,3C) ->
    (B,H,W,C)."""
    B, H, W, threeC = qkv_raw.shape
    C = threeC // 3
    nH = num_heads
    hd = C // nH
    Hp, Wp = -(-H // ws) * ws, -(-W // ws) * ws
    x = jnp.pad(qkv_raw, ((0, 0), (0, Hp - H), (0, Wp - W), (0, 0)))
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
            *, scale, nH, hd, ws, nww, gh):
    # one program = one ROW of nww windows for ONE head GROUP of gh heads
    # (Mosaic: block dim -2 must be a multiple of 8 or the full array dim, so
    # windows along W are carved by static in-kernel slices; heads are
    # contiguous lanes so head groups block the lane dim, bounding VMEM; the
    # rel tables arrive pre-packed per group with 128-aligned lanes)
    n = ws * ws
    q_row = q_ref[0]                     # (ws, Wp, gh*hd)
    k_row = k_ref[0]
    v_row = v_ref[0]
    rh_row = rh_ref[0]                   # (ws, Wp, L) — this group's lanes
    rw_row = rw_ref[0]
    eu = eu_ref[...]                     # (N, ws)
    ev = ev_ref[...]
    row_outs = []
    for j in range(nww):  # static unroll over the row's windows
        sl = slice(j * ws, (j + 1) * ws)
        q_all = q_row[:, sl, :].reshape(n, gh * hd)  # sublane-collapse reshape
        k_all = k_row[:, sl, :].reshape(n, gh * hd)
        v_all = v_row[:, sl, :].reshape(n, gh * hd)
        rh_all = rh_row[:, sl, :].reshape(n, rh_row.shape[-1])
        rw_all = rw_row[:, sl, :].reshape(n, rw_row.shape[-1])
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
        row_outs.append(jnp.concatenate(outs, axis=-1).reshape(ws, ws, gh * hd))
    o_ref[0] = jnp.concatenate(row_outs, axis=1)  # (ws, Wp, gh*hd)


def _pallas(qkv_raw, Rh, Rw, ws, scale, num_heads, interpret=False):
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
    qkv_p = jnp.pad(qkv_raw, pad)
    rel_h = jnp.pad(rel_h, pad)
    rel_w = jnp.pad(rel_w, pad)
    eu, ev = _onehots(ws, cdt)

    # head-group split bounds per-program VMEM (q/k/v/out row blocks at
    # gh*hd lanes each); lane blocks must be %128 or the full dim
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
        vm = (4 * gh_c * hd + 2 * L_c) * ws * Wp * dsize
        if 2 * vm < 10 * 2**20:  # double-buffered working set < 10MB
            break
    gh = nH // n_groups
    gC = gh * hd
    # rel tables packed per head group, lanes padded to a 128 multiple so
    # each group's slice is a legal lane block
    L = -(-gh * ws // 128) * 128
    def pack(rel):
        r = rel.reshape(B, Hp, Wp, n_groups, gh * ws)
        r = jnp.pad(r, ((0, 0),) * 4 + ((0, L - gh * ws),))
        return r.reshape(B, Hp, Wp, n_groups * L)
    rel_h = pack(rel_h)
    rel_w = pack(rel_w)

    kernel = functools.partial(
        _kernel, scale=scale, nH=nH, hd=hd, ws=ws, nww=nww, gh=gh
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, nwh, n_groups),
        in_specs=[
            # q/k/v head-group lane blocks of the fused qkv map: with lane
            # block gC, q group g is block g, k group g is block n_groups + g
            pl.BlockSpec((1, ws, Wp, gC), lambda b, i, g: (b, i, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ws, Wp, gC),
                         lambda b, i, g, _ng=n_groups: (b, i, 0, _ng + g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ws, Wp, gC),
                         lambda b, i, g, _ng=n_groups: (b, i, 0, 2 * _ng + g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ws, Wp, L), lambda b, i, g: (b, i, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ws, Wp, L), lambda b, i, g: (b, i, 0, g),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, ws), lambda b, i, g: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, ws), lambda b, i, g: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ws, Wp, gC), lambda b, i, g: (b, i, 0, g),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Hp, Wp, C), cdt),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * nwh * nww * nH * n * n * (hd + 2 * ws),
            bytes_accessed=B * Hp * Wp * (threeC + C) * 2,
            transcendentals=B * nwh * nww * nH * n * n,
        ),
        interpret=interpret,
    )(qkv_p, qkv_p, qkv_p, rel_h, rel_w, eu, ev)
    return out[:, :H, :W]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _fused(qkv_raw, Rh, Rw, ws, scale, num_heads, use_pallas, interpret):
    if use_pallas:
        return _pallas(qkv_raw, Rh, Rw, ws, scale, num_heads, interpret)
    return window_block_xla(qkv_raw, Rh, Rw, ws, scale, num_heads)


def _fwd(qkv_raw, Rh, Rw, ws, scale, num_heads, use_pallas, interpret):
    out = _fused(qkv_raw, Rh, Rw, ws, scale, num_heads, use_pallas, interpret)
    return out, (qkv_raw, Rh, Rw)


def _bwd(ws, scale, num_heads, use_pallas, interpret, res, g):
    qkv_raw, Rh, Rw = res
    _, vjp = jax.vjp(
        lambda *a: window_block_xla(*a, ws, scale, num_heads), qkv_raw, Rh, Rw
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
) -> jnp.ndarray:
    """Returns (B, H, W, C) attention output, unpartitioned (proj-ready)."""
    use_pallas = (not force_xla and jax.default_backend() == "tpu") or (
        interpret and not force_xla
    )
    return _fused(qkv_raw, Rh, Rw, ws, scale, num_heads, use_pallas, interpret)
