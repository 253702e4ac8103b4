"""ViTAEv2-S backbone: 4-stage CNN+transformer hybrid.

Behavioral reference: ED/backbone/ViTAE_Window_NoShift/
  * PRM: parallel dilated convs downsampling by the stage ratio, GELU,
    channel concat; per-stage dilations (1,2,3,4)/(1,2,3)/(1,2)/(1,2)
    (ReductionCell.py:13-72, base_model.py:94)
  * ReductionCell: PRM tokens -> norm -> (windowed or token-transformer)
    attention to token_dims, plus a parallel 3-conv PCM path on the raw
    input; x = attn + PCM; x += mlp(norm2 x) (ReductionCell.py:74-215).
    The 'transformer' stages use the T2T attention with the V tensor as the
    skip connection (token_transformer.py:37-48).
  * NormalCell: x = x + attn(norm1 x) + PCM(x); x += mlp(norm2 x); PCM convs
    are dim->hidden->dim->dim grouped 3x3 with BN+SiLU after the first two
    (NormalCell.py:118-259)
  * vitaev2_s config: embed 64/64/128/256, tokens 64/128/256/512, downsample
    4/2/2/2, NC depth 2/2/8/2, window 7, no relative position bias
    (base_model.py:307-330; relative_pos=False so the swin bias tables are
    dead parameters — the porter drops them)
  * NC drop-path schedule replicates the reference's quirky slicing
    (base_model.py:156-160: startDpr = NC_depth[i-1], NOT a running sum);
    ReductionCells get drop_path 0 (BasicLayer never passes it).

out_channels (3, 64, 128, 256, 512).
"""

from __future__ import annotations

import math
from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from samrs_tpu.nn.layers import DropPath, MLPBlock, window_partition, window_unpartition

Dtype = Any


class AttentionIO(nn.Module):
    """Full attention with different in/out dims.

    v_skip=True is the T2T Token_transformer attention (token_transformer.py:
    37-48): output = v + proj(attn @ v) — v is the residual because the input
    width differs from the output width."""

    in_dim: int
    out_dim: int
    num_heads: int
    v_skip: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, N, C_in)
        B, N, _ = x.shape
        hd = self.out_dim // self.num_heads
        qkv = nn.Dense(3 * self.out_dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = jnp.einsum("bnqd,bnkd->bnqk", q * hd**-0.5, k,
                          preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bnqk,bnkd->bnqd", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, self.out_dim).astype(self.dtype)
        out = nn.Dense(self.out_dim, dtype=self.dtype, name="proj")(out)
        if self.v_skip:
            out = out + v.transpose(0, 2, 1, 3).reshape(B, N, self.out_dim).astype(self.dtype)
        return out


class WindowAttentionIO(nn.Module):
    """Non-shifted window attention with in->out dim mapping; input NHWC.

    relative_pos=False in vitaev2_s, so no positional bias (swin.py:89-95)."""

    in_dim: int
    out_dim: int
    num_heads: int
    window_size: int = 7
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (B, H, W, C_in)
        B, H, W, _ = x.shape
        ws = self.window_size
        wins, pad_hw = window_partition(x, ws)
        wins = wins.reshape(-1, ws * ws, x.shape[-1])
        y = AttentionIO(self.in_dim, self.out_dim, self.num_heads, dtype=self.dtype,
                        name="attn")(wins)
        y = y.reshape(-1, ws, ws, self.out_dim)
        return window_unpartition(y, ws, pad_hw, (H, W))


class PCM(nn.Module):
    """Parallel conv module: 3 grouped 3x3 convs, BN+SiLU after the first two
    (NormalCell.py:170-178 / ReductionCell.py:109-117).

    chans: output channels of each conv (c0, c1, c2)."""

    chans: Tuple[int, int, int]
    strides: Tuple[int, int, int] = (1, 1, 1)
    groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        for i, (c, s) in enumerate(zip(self.chans, self.strides)):
            x = nn.Conv(c, (3, 3), strides=(s, s), padding=((1, 1), (1, 1)),
                        feature_group_count=max(self.groups, 1), dtype=self.dtype,
                        name=f"conv{i}")(x)
            if i < 2:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, name=f"bn{i}")(x)
                x = nn.silu(x)
        return x


class ReductionCell(nn.Module):
    embed_dim: int
    token_dim: int
    downsample: int
    num_heads: int
    kernel_size: int = 3
    dilations: Tuple[int, ...] = (1, 2, 3, 4)
    tokens_type: str = "swin"  # 'swin' | 'transformer'
    window_size: int = 7
    group: int = 1
    mlp_ratio: float = 1.0
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, H, W, C = x.shape
        Ho, Wo = H // self.downsample, W // self.downsample
        # PRM: parallel dilated convs, concat (ReductionCell.py:13-72)
        branches = []
        for d in self.dilations:
            pad = math.ceil(((self.kernel_size - 1) * d + 1 - self.downsample) / 2)
            y = nn.Conv(
                self.embed_dim, (self.kernel_size, self.kernel_size),
                strides=(self.downsample, self.downsample),
                padding=((pad, pad), (pad, pad)), kernel_dilation=(d, d),
                dtype=self.dtype, name=f"prm_conv{d}",
            )(x)
            branches.append(nn.gelu(y, approximate=False)[:, :Ho, :Wo])
        prm = jnp.concatenate(branches, axis=-1)  # (B, Ho, Wo, len(dil)*embed)

        # PCM path on the raw input, downsampling to match
        strides = []
        r = self.downsample // 2
        for _ in range(3):
            strides.append(2 if r > 0 else 1)
            r //= 2
        pcm = PCM((self.embed_dim, self.embed_dim, self.token_dim), tuple(strides),
                  self.group, dtype=self.dtype, name="pcm")(x, train)[:, :Ho, :Wo]

        # eps 1e-5: ReductionCell builds its SwinTransformerBlock /
        # Token_transformer with the torch-default LayerNorm — the eps=1e-6
        # partial is only threaded into NormalCells (base_model.py:153-162)
        y = nn.LayerNorm(epsilon=1e-5, name="norm1")(prm)
        if self.tokens_type == "swin":
            attn = WindowAttentionIO(
                prm.shape[-1], self.token_dim, self.num_heads, self.window_size,
                dtype=self.dtype, name="attn",
            )(y)
        else:
            # T2T attention with v-skip (token_transformer.py:37-48)
            attn = AttentionIO(prm.shape[-1], self.token_dim, self.num_heads,
                               v_skip=True, dtype=self.dtype, name="attn")(
                y.reshape(B, Ho * Wo, -1)
            ).reshape(B, Ho, Wo, self.token_dim)
        x = attn + DropPath(self.drop_path, name="dp1")(pcm, not train)
        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = MLPBlock(int(self.token_dim * self.mlp_ratio), dtype=self.dtype, name="mlp")(y)
        return x + DropPath(self.drop_path, name="dp2")(y, not train)


class NormalCell(nn.Module):
    dim: int
    num_heads: int
    tokens_type: str = "swin"
    window_size: int = 7
    group: int = 64
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        B, H, W, C = x.shape
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        if self.tokens_type == "swin":
            attn = WindowAttentionIO(C, C, self.num_heads, self.window_size,
                                     dtype=self.dtype, name="attn")(y)
        else:
            attn = AttentionIO(C, C, self.num_heads, dtype=self.dtype, name="attn")(
                y.reshape(B, H * W, C)
            ).reshape(B, H, W, C)
        hidden = int(C * self.mlp_ratio)
        # PCM convs: dim -> hidden -> dim -> dim (NormalCell.py:170-178)
        pcm = PCM((hidden, C, C), (1, 1, 1), self.group, dtype=self.dtype,
                  name="pcm")(x, train)
        x = (
            x
            + DropPath(self.drop_path, name="dp1")(attn, not train)
            + DropPath(self.drop_path, name="dp2")(pcm, not train)
        )
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = MLPBlock(hidden, dtype=self.dtype, name="mlp")(y)
        return x + DropPath(self.drop_path, name="dp3")(y, not train)


class ViTAEv2(nn.Module):
    embed_dims: Tuple[int, ...] = (64, 64, 128, 256)
    token_dims: Tuple[int, ...] = (64, 128, 256, 512)
    downsample_ratios: Tuple[int, ...] = (4, 2, 2, 2)
    NC_depth: Tuple[int, ...] = (2, 2, 8, 2)
    NC_heads: Tuple[int, ...] = (1, 2, 4, 8)
    RC_heads: Tuple[int, ...] = (1, 1, 2, 4)
    NC_group: Tuple[int, ...] = (1, 32, 64, 128)
    RC_group: Tuple[int, ...] = (1, 16, 32, 64)
    RC_kernel: Tuple[int, ...] = (7, 3, 3, 3)
    dilations: Tuple[Tuple[int, ...], ...] = ((1, 2, 3, 4), (1, 2, 3), (1, 2), (1, 2))
    tokens_types: Tuple[str, ...] = ("swin", "swin", "transformer", "transformer")
    window_size: int = 7
    drop_path_rate: float = 0.3
    dtype: Dtype = jnp.float32

    @property
    def out_channels(self) -> Tuple[int, ...]:
        return (3,) + tuple(self.token_dims)

    def _nc_dpr(self) -> Tuple[Tuple[float, ...], ...]:
        """The reference's quirky per-stage dpr slices (base_model.py:156-160):
        startDpr = NC_depth[i-1] (not a cumulative sum), so stage 2 REUSES
        dpr[2:10] and stage 3 gets dpr[8:10]."""
        total = sum(self.NC_depth)
        dpr = np.linspace(0, self.drop_path_rate, total)
        out = []
        for i, d in enumerate(self.NC_depth):
            start = 0 if i == 0 else self.NC_depth[i - 1]
            out.append(tuple(float(v) for v in dpr[start:start + d]))
        return tuple(out)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Sequence[jnp.ndarray]:
        img = x
        nc_dpr = self._nc_dpr()
        feats = []
        for s in range(4):
            x = ReductionCell(
                embed_dim=self.embed_dims[s],
                token_dim=self.token_dims[s],
                downsample=self.downsample_ratios[s],
                num_heads=self.RC_heads[s],
                kernel_size=self.RC_kernel[s],
                dilations=self.dilations[s],
                tokens_type=self.tokens_types[s],
                window_size=self.window_size,
                group=self.RC_group[s],
                drop_path=0.0,  # BasicLayer never passes drop_path to the RC
                dtype=self.dtype,
                name=f"rc{s}",
            )(x, train)
            for b in range(self.NC_depth[s]):
                x = NormalCell(
                    dim=self.token_dims[s],
                    num_heads=self.NC_heads[s],
                    tokens_type=self.tokens_types[s],
                    window_size=self.window_size,
                    group=self.NC_group[s],
                    drop_path=nc_dpr[s][b],
                    dtype=self.dtype,
                    name=f"nc{s}_{b}",
                )(x, train)
            feats.append(x)
        return [img] + feats


def vitaev2_s(dtype: Any = jnp.float32, **kw: Any) -> ViTAEv2:
    return ViTAEv2(dtype=dtype, **kw)
