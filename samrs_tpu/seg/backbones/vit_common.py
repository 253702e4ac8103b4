"""Shared pieces for the plain-ViT and RVSA segmentation backbones.

Behavioral reference: ED/backbone/vit_win_rvsa_v3_wsz7.py (PatchEmbed :517,
Block :480, FPN neck :640-668, forward_features :785) and ED/backbone/vit.py.
NHWC throughout; attention batched over all windows at once.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from samrs_tpu.nn.layers import ConvTranspose2x, DropPath, LayerNorm2d, MLPBlock
from samrs_tpu.sam.image_encoder import add_decomposed_rel_pos, get_rel_pos

Dtype = Any


class FullAttentionRelPos(nn.Module):
    """Global attention over the whole (H, W) token grid with decomposed
    rel-pos (the non-window layers; vit_win_rvsa_v3_wsz7.py Attention)."""

    dim: int
    num_heads: int
    qkv_bias: bool = True
    input_size: Tuple[int, int] = (14, 14)
    # the reference RVSA file's full-attention class DEFINES no rel-pos (the
    # calc_rel_pos_spatial call and params are commented out,
    # vit_win_rvsa_v3_wsz7.py:83-84,103) — ViTRVSA passes use_rel_pos=False
    use_rel_pos: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B, H, W, _ = x.shape
        hd = self.dim // self.num_heads
        scale = hd**-0.5
        qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, H * W, 3, self.num_heads, hd)
        qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(3, B * self.num_heads, H * W, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        from samrs_tpu.nn import layers as _layers

        if (not self.use_rel_pos and _layers.ATTN_IMPL_DEFAULT == "flash"
                and not self.is_initializing()):
            # RVSA's full-attn layers define no rel-pos: the one-pass Pallas
            # flash forward applies (XLA-composition backward = free remat)
            from samrs_tpu.kernels.flash_attention import flash_attention_plain

            out = flash_attention_plain(q, k, v, scale)
            out = out.reshape(B, self.num_heads, H, W, hd).transpose(0, 2, 3, 1, 4)
            out = out.reshape(B, H, W, self.dim).astype(self.dtype)
            return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)
        attn = jnp.einsum("bqd,bkd->bqk", q * scale, k, preferred_element_type=jnp.float32)
        if self.use_rel_pos:
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros, (2 * self.input_size[0] - 1, hd), jnp.float32
            )
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros, (2 * self.input_size[1] - 1, hd), jnp.float32
            )
            attn = add_decomposed_rel_pos(
                attn, q.astype(jnp.float32), rel_pos_h, rel_pos_w, (H, W), (H, W)
            )
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum(
            "bqk,bkd->bqd", attn.astype(v.dtype), v, preferred_element_type=jnp.float32
        )
        out = out.reshape(B, self.num_heads, H, W, hd).transpose(0, 2, 3, 1, 4)
        out = out.reshape(B, H, W, self.dim).astype(self.dtype)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class ViTBlock(nn.Module):
    """Pre-norm transformer block with pluggable attention and optional
    layer-scale (vit_win_rvsa_v3_wsz7.py:480-515)."""

    dim: int
    num_heads: int
    attention: Callable[..., nn.Module]  # module class taking (dim, num_heads, ...)
    attn_kwargs: dict
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    init_values: Optional[float] = None
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        attn = self.attention(
            dim=self.dim, num_heads=self.num_heads, dtype=self.dtype, name="attn",
            **self.attn_kwargs,
        )
        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        y = attn(y, deterministic=deterministic)
        if self.init_values is not None:
            gamma_1 = self.param(
                "gamma_1", nn.initializers.constant(self.init_values), (self.dim,)
            )
            y = gamma_1 * y
        x = x + DropPath(self.drop_path, name="drop_path1")(y, deterministic)
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = MLPBlock(int(self.dim * self.mlp_ratio), dtype=self.dtype, name="mlp")(y)
        if self.init_values is not None:
            gamma_2 = self.param(
                "gamma_2", nn.initializers.constant(self.init_values), (self.dim,)
            )
            y = gamma_2 * y
        return x + DropPath(self.drop_path, name="drop_path2")(y, deterministic)


class ViTFPNNeck(nn.Module):
    """4-branch FPN neck for patch-16 plain ViTs: x4 up, x2 up, identity,
    2x maxpool (vit_win_rvsa_v3_wsz7.py:640-656)."""

    embed_dim: int
    dtype: Dtype = jnp.float32

    def setup(self) -> None:
        d = self.embed_dim
        # ConvTranspose2x = nn.ConvTranspose((2,2),(2,2)) re-expressed as tap
        # matmuls (XLA lowers stride-2 deconvs poorly on TPU); same params
        self.fpn1_deconv1 = ConvTranspose2x(d, name="fpn1_deconv1")
        self.fpn1_norm = LayerNorm2d(name="fpn1_norm")
        self.fpn1_deconv2 = ConvTranspose2x(d, name="fpn1_deconv2")
        self.fpn2_deconv = ConvTranspose2x(d, name="fpn2_deconv")

    def __call__(self, feats: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        f1, f2, f3, f4 = feats
        # exact erf gelu: the reference's nn.GELU() (torch default) is erf
        c1 = self.fpn1_deconv2(
            nn.gelu(self.fpn1_norm(self.fpn1_deconv1(f1)), approximate=False)
        )
        c2 = self.fpn2_deconv(f2)
        c3 = f3
        c4 = nn.max_pool(f4, (2, 2), strides=(2, 2))
        return c1, c2, c3, c4
