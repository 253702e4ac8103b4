"""SAM two-way (token <-> image) transformer.

Behavioral reference: GD/segment_anything/modeling/transformer.py
  * depth-2 blocks: token self-attn, token->image cross-attn, MLP,
    image->token cross-attn, per-step LayerNorms, query/key PE re-addition
    (:151-182)
  * attention with internal-dim downsample rate 2 (:185-240)
  * final token->image attention (:99-104)

All shapes are (B, N, C); the image side is flattened (B, H*W, C).  The whole
decode path stays fp32 — bf16 matmuls can flip thresholded mask pixels near
logit 0 (SURVEY.md "Hard parts").
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import linen as nn

from samrs_tpu.nn.layers import MLPBlock

Dtype = Any


class AttentionDownsample(nn.Module):
    """MHA with optional internal channel downsample (transformer.py:185-240)."""

    embedding_dim: int
    num_heads: int
    downsample_rate: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
        internal_dim = self.embedding_dim // self.downsample_rate
        head_dim = internal_dim // self.num_heads
        q = nn.Dense(internal_dim, dtype=self.dtype, name="q_proj")(q)
        k = nn.Dense(internal_dim, dtype=self.dtype, name="k_proj")(k)
        v = nn.Dense(internal_dim, dtype=self.dtype, name="v_proj")(v)

        def split(x: jnp.ndarray) -> jnp.ndarray:  # (B, N, C) -> (B, nH, N, hd)
            b, n, _ = x.shape
            return x.reshape(b, n, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        attn = attn / (head_dim**0.5)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v, preferred_element_type=jnp.float32)
        b, _, n, _ = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, internal_dim)
        return nn.Dense(self.embedding_dim, dtype=self.dtype, name="out_proj")(out)


class TwoWayAttentionBlock(nn.Module):
    """transformer.py:109-182."""

    embedding_dim: int
    num_heads: int
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    skip_first_layer_pe: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, queries: jnp.ndarray, keys: jnp.ndarray, query_pe: jnp.ndarray, key_pe: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # 1. token self-attention
        if self.skip_first_layer_pe:
            queries = AttentionDownsample(
                self.embedding_dim, self.num_heads, dtype=self.dtype, name="self_attn"
            )(queries, queries, queries)
        else:
            q = queries + query_pe
            attn_out = AttentionDownsample(
                self.embedding_dim, self.num_heads, dtype=self.dtype, name="self_attn"
            )(q, q, queries)
            queries = queries + attn_out
        queries = nn.LayerNorm(epsilon=1e-5, name="norm1")(queries)

        # 2. token -> image cross-attention
        q = queries + query_pe
        k = keys + key_pe
        attn_out = AttentionDownsample(
            self.embedding_dim,
            self.num_heads,
            downsample_rate=self.attention_downsample_rate,
            dtype=self.dtype,
            name="cross_attn_token_to_image",
        )(q, k, keys)
        queries = queries + attn_out
        queries = nn.LayerNorm(epsilon=1e-5, name="norm2")(queries)

        # 3. MLP on tokens
        mlp_out = MLPBlock(mlp_dim=self.mlp_dim, act=nn.relu, dtype=self.dtype, name="mlp")(
            queries
        )
        queries = queries + mlp_out
        queries = nn.LayerNorm(epsilon=1e-5, name="norm3")(queries)

        # 4. image -> token cross-attention
        q = queries + query_pe
        k = keys + key_pe
        attn_out = AttentionDownsample(
            self.embedding_dim,
            self.num_heads,
            downsample_rate=self.attention_downsample_rate,
            dtype=self.dtype,
            name="cross_attn_image_to_token",
        )(k, q, queries)
        keys = keys + attn_out
        keys = nn.LayerNorm(epsilon=1e-5, name="norm4")(keys)
        return queries, keys


class TwoWayTransformer(nn.Module):
    """transformer.py:16-107."""

    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        image_embedding: jnp.ndarray,  # (B, H, W, C)
        image_pe: jnp.ndarray,  # (B, H, W, C) or (H, W, C)
        point_embedding: jnp.ndarray,  # (B, N, C)
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        b, h, w, c = image_embedding.shape
        keys = image_embedding.reshape(b, h * w, c)
        key_pe = jnp.broadcast_to(image_pe.reshape(-1, h * w, c), keys.shape)
        queries = point_embedding

        for i in range(self.depth):
            queries, keys = TwoWayAttentionBlock(
                embedding_dim=self.embedding_dim,
                num_heads=self.num_heads,
                mlp_dim=self.mlp_dim,
                attention_downsample_rate=self.attention_downsample_rate,
                skip_first_layer_pe=(i == 0),
                dtype=self.dtype,
                name=f"layers_{i}",
            )(queries, keys, point_embedding, key_pe)

        # final token -> image attention (:99-104)
        q = queries + point_embedding
        k = keys + key_pe
        attn_out = AttentionDownsample(
            self.embedding_dim,
            self.num_heads,
            downsample_rate=self.attention_downsample_rate,
            dtype=self.dtype,
            name="final_attn_token_to_image",
        )(q, k, keys)
        queries = queries + attn_out
        queries = nn.LayerNorm(epsilon=1e-5, name="norm_final_attn")(queries)
        return queries, keys
