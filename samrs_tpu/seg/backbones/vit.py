"""Plain ViT-B segmentation backbone.

Behavioral reference: ED/backbone/vit.py:184-388 — timm-style ViT (full
attention in every block, abs pos-embed optional), final LayerNorm, then the
4-branch FPN neck applied to the LAST feature map (x4 up / x2 up / identity /
2x maxpool).  out_channels (3, D, D, D, D) (vit.py:252).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from samrs_tpu.nn.layers import DropPath, MLPBlock
from samrs_tpu.seg.backbones.vit_common import ViTFPNNeck

Dtype = Any


class PlainAttention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32
    impl: Any = None  # "xla" | "flash" | None (= layers.ATTN_IMPL_DEFAULT)

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        from samrs_tpu.nn import layers as _layers

        B, H, W, _ = x.shape
        N = H * W
        hd = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        impl = self.impl if self.impl is not None else _layers.ATTN_IMPL_DEFAULT
        if impl == "flash" and not self.is_initializing():
            # one-pass Pallas forward (softmax stays in VMEM), XLA backward
            # (free remat); falls back to XLA off-TPU / tile-less N inside
            from samrs_tpu.kernels.flash_attention import flash_attention_plain

            bh = B * self.num_heads
            out = flash_attention_plain(
                q.reshape(bh, N, hd), k.reshape(bh, N, hd), v.reshape(bh, N, hd),
                hd**-0.5,
            ).reshape(B, self.num_heads, N, hd)
        else:
            attn = jnp.einsum(
                "bnqd,bnkd->bnqk", q * hd**-0.5, k, preferred_element_type=jnp.float32
            )
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum(
                "bnqk,bnkd->bnqd", attn.astype(v.dtype), v,
                preferred_element_type=jnp.float32
            )
        out = out.transpose(0, 2, 1, 3).reshape(B, H, W, self.dim).astype(self.dtype)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class ViTSeg(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.1
    use_abs_pos_emb: bool = True
    use_checkpoint: bool = False  # per-block remat (reference
    # torch.utils.checkpoint in ViT_Win_RVSA; backward recomputes one block
    # at a time — whole-encoder remat saves almost no peak memory)
    dtype: Dtype = jnp.float32

    @property
    def out_channels(self) -> Tuple[int, ...]:
        return (3, self.embed_dim, self.embed_dim, self.embed_dim, self.embed_dim)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Sequence[jnp.ndarray]:
        img = x
        x = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )(x)
        Hp, Wp = x.shape[1], x.shape[2]
        if self.use_abs_pos_emb:
            gp = self.img_size // self.patch_size
            pos = self.param(
                "pos_embed", nn.initializers.normal(0.02), (1, gp * gp, self.embed_dim)
            )
            pos2d = pos.reshape(1, gp, gp, self.embed_dim)
            if (gp, gp) != (Hp, Wp):
                pos2d = jax.image.resize(pos2d, (1, Hp, Wp, self.embed_dim), "bicubic")
            x = x + pos2d.astype(x.dtype)
        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        block_fn = (
            nn.remat(ViTSeg._block, prevent_cse=False, static_argnums=(2, 3))
            if self.use_checkpoint and not self.is_initializing()
            else ViTSeg._block
        )
        for i in range(self.depth):
            x = block_fn(self, x, i, not train)
        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        c1, c2, c3, c4 = ViTFPNNeck(self.embed_dim, dtype=self.dtype, name="neck")(
            [x, x, x, x]
        )
        return [img, c1, c2, c3, c4]

    def _block(self, x: jnp.ndarray, i: int, deterministic: bool) -> jnp.ndarray:
        """One pre-LN transformer block; submodule names match the inline
        originals so the param tree is checkpoint/porter-identical."""
        dpr = float(np.linspace(0, self.drop_path_rate, self.depth)[i])
        y = nn.LayerNorm(epsilon=1e-6, name=f"blocks_{i}_norm1")(x)
        y = PlainAttention(
            self.embed_dim, self.num_heads, dtype=self.dtype, name=f"blocks_{i}_attn"
        )(y)
        x = x + DropPath(dpr, name=f"blocks_{i}_dp1")(y, deterministic)
        y = nn.LayerNorm(epsilon=1e-6, name=f"blocks_{i}_norm2")(x)
        y = MLPBlock(int(self.embed_dim * self.mlp_ratio), dtype=self.dtype,
                     name=f"blocks_{i}_mlp")(y)
        return x + DropPath(dpr, name=f"blocks_{i}_dp2")(y, deterministic)


def vit_b(image_size: int = 224, dtype: Any = jnp.float32, **kw: Any) -> ViTSeg:
    kw.setdefault("embed_dim", 768)
    kw.setdefault("depth", 12)
    kw.setdefault("num_heads", 12)
    return ViTSeg(img_size=image_size, dtype=dtype, **kw)
