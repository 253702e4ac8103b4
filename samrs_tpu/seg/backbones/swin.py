"""Swin Transformer (T/S/B) segmentation backbone.

Behavioral reference: ED/backbone/swin.py:162-696 — standard Swin with
shifted windows, relative position bias, patch merging; returns
[x, c1..c4] with out_channels (3, 96, 192, 384, 768) for Swin-T (:578).

TPU-first notes: window partition is reshape/transpose; the shifted-window
attention mask is precomputed per (H, W, shift) as a constant folded into the
jit; all windows attend in one batched matmul.
"""

from __future__ import annotations

import functools
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from samrs_tpu.nn.layers import DropPath, MLPBlock, window_partition, window_unpartition

Dtype = Any


@functools.lru_cache(maxsize=64)
def _shift_attn_mask(Hp: int, Wp: int, ws: int, shift: int) -> np.ndarray:
    """(nW, ws*ws, ws*ws) additive mask (0 / -100) for shifted windows."""
    img_mask = np.zeros((Hp, Wp), np.int32)
    cnt = 0
    for h in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for w in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[h, w] = cnt
            cnt += 1
    m = img_mask.reshape(Hp // ws, ws, Wp // ws, ws).transpose(0, 2, 1, 3)
    m = m.reshape(-1, ws * ws)
    diff = m[:, :, None] != m[:, None, :]
    return np.where(diff, -100.0, 0.0).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _rel_index(ws: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = (flat[:, :, None] - flat[:, None, :]).transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask=None) -> jnp.ndarray:
        """x: (nB, ws*ws, C); mask: (nW, N, N) or None; nB = B*nW."""
        nB, N, C = x.shape
        hd = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(nB, N, 3, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum(
            "bnqd,bnkd->bnqk", q * hd**-0.5, k, preferred_element_type=jnp.float32
        )
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            ((2 * self.window_size - 1) ** 2, self.num_heads),
        )
        idx = jnp.asarray(_rel_index(self.window_size).reshape(-1))
        bias = jnp.take(jnp.asarray(table), idx, axis=0)
        bias = bias.reshape(N, N, self.num_heads).transpose(2, 0, 1)
        attn = attn + bias[None]
        if mask is not None:
            nW = mask.shape[0]
            attn = attn.reshape(nB // nW, nW, self.num_heads, N, N) + mask[None, :, None]
            attn = attn.reshape(nB, self.num_heads, N, N)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum(
            "bnqk,bnkd->bnqd", attn.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        out = out.transpose(0, 2, 1, 3).reshape(nB, N, self.dim).astype(self.dtype)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    shift: int = 0
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, H, W, C = x.shape
        ws = self.window_size
        shortcut = x
        x = nn.LayerNorm(epsilon=1e-5, name="norm1")(x)
        # reference order (ED/backbone/swin.py:219-252): pad bottom-right to a
        # window multiple FIRST, then cyclic-shift the PADDED map; shift is
        # never disabled for small grids (a 3x3 stage still shifts by 3)
        pad_b, pad_r = (-H) % ws, (-W) % ws
        Hp, Wp = H + pad_b, W + pad_r
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        shift = self.shift
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        wins, _ = window_partition(x, ws)
        wins = wins.reshape(-1, ws * ws, C)
        mask = None
        if shift > 0:
            mask = jnp.asarray(_shift_attn_mask(Hp, Wp, ws, shift))
        y = WindowAttention(self.dim, self.num_heads, ws, dtype=self.dtype, name="attn")(
            wins, mask
        )
        y = y.reshape(-1, ws, ws, C)
        y = window_unpartition(y, ws, (Hp, Wp), (Hp, Wp))
        if shift > 0:
            y = jnp.roll(y, (shift, shift), axis=(1, 2))
        y = y[:, :H, :W]
        x = shortcut + DropPath(self.drop_path, name="dp1")(y, not train)
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = MLPBlock(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp")(y)
        return x + DropPath(self.drop_path, name="dp2")(y, not train)


class PatchMerging(nn.Module):
    dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        if H % 2 or W % 2:
            x = jnp.pad(x, ((0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, 0::2, 0::2]
        x1 = x[:, 1::2, 0::2]
        x2 = x[:, 0::2, 1::2]
        x3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype, name="reduction")(x)


class Swin(nn.Module):
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    drop_path_rate: float = 0.2
    dtype: Dtype = jnp.float32

    @property
    def out_channels(self) -> Tuple[int, ...]:
        return (3,) + tuple(self.embed_dim * 2**i for i in range(len(self.depths)))

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Sequence[jnp.ndarray]:
        img = x
        x = nn.Conv(self.embed_dim, (4, 4), strides=(4, 4), dtype=self.dtype,
                    name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="patch_norm")(x)
        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        feats = []
        blk_id = 0
        for s, depth in enumerate(self.depths):
            dim = self.embed_dim * 2**s
            for b in range(depth):
                x = SwinBlock(
                    dim=dim,
                    num_heads=self.num_heads[s],
                    window_size=self.window_size,
                    shift=0 if b % 2 == 0 else self.window_size // 2,
                    drop_path=float(dpr[blk_id]),
                    dtype=self.dtype,
                    name=f"stage{s}_block{b}",
                )(x, train)
                blk_id += 1
            feats.append(nn.LayerNorm(epsilon=1e-5, name=f"norm{s}")(x))
            if s < len(self.depths) - 1:
                x = PatchMerging(dim, dtype=self.dtype, name=f"merge{s}")(x)
        return [img] + feats


def swin_t(dtype: Any = jnp.float32, **kw: Any) -> Swin:
    # drop_path 0.3 mirrors the SEP pretrain build (ED/models.py:73-81)
    defaults = dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24),
                    drop_path_rate=0.3)
    defaults.update(kw)
    return Swin(dtype=dtype, **defaults)


def swin_s(dtype: Any = jnp.float32, **kw: Any) -> Swin:
    defaults = dict(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24),
                    drop_path_rate=0.3)
    defaults.update(kw)
    return Swin(dtype=dtype, **defaults)
