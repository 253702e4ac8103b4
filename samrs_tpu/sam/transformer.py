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

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
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


# ---- fused-path raw parameter declarations (identical trees to the flax
# modules above, so checkpoints/porters are impl-agnostic) -------------------


class _DenseP(nn.Module):
    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        return kernel, bias


class _LNP(nn.Module):
    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return scale, bias


class _AttnP(nn.Module):
    """AttentionDownsample's exact param tree, declared raw."""

    C: int
    Ci: int

    @nn.compact
    def __call__(self) -> Dict:
        return {
            "q": _DenseP(self.C, self.Ci, name="q_proj")(),
            "k": _DenseP(self.C, self.Ci, name="k_proj")(),
            "v": _DenseP(self.C, self.Ci, name="v_proj")(),
            "o": _DenseP(self.Ci, self.C, name="out_proj")(),
        }


class _MLPP(nn.Module):
    """MLPBlock's exact param tree (lin1/lin2), declared raw."""

    dim: int
    mlp_dim: int

    @nn.compact
    def __call__(self) -> Dict:
        return {
            "lin1": _DenseP(self.dim, self.mlp_dim, name="lin1")(),
            "lin2": _DenseP(self.mlp_dim, self.dim, name="lin2")(),
        }


class _TwoWayBlockParams(nn.Module):
    """TwoWayAttentionBlock's exact param tree, declared raw."""

    C: int
    Ci: int
    mlp_dim: int

    @nn.compact
    def __call__(self) -> Dict:
        return {
            "self_attn": _AttnP(self.C, self.C, name="self_attn")(),
            "t2i": _AttnP(self.C, self.Ci, name="cross_attn_token_to_image")(),
            "i2t": _AttnP(self.C, self.Ci, name="cross_attn_image_to_token")(),
            "norm1": _LNP(self.C, name="norm1")(),
            "norm2": _LNP(self.C, name="norm2")(),
            "norm3": _LNP(self.C, name="norm3")(),
            "norm4": _LNP(self.C, name="norm4")(),
            "mlp": _MLPP(self.C, self.mlp_dim, name="mlp")(),
        }


def _dense(x, wb):
    W, b = wb
    return x @ W + b


def _ln(x, wb, eps=1e-5):
    """flax nn.LayerNorm numerics: var = E[x^2] - E[x]^2."""
    scale, bias = wb
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=-1, keepdims=True) - mu * mu, 0.0)
    return (x - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _expanded_head_attn(q, k_img, v_img, num_heads):
    """Token->image attention with per-head q rows EXPANDED along a tiny
    (Nt*nH) axis instead of splitting k/v into heads: qexp[b, t*nH+h, :]
    carries q's head-h slice in head-h's lane block and zeros elsewhere, so

        s[b, t*nH+h, k] = <q_h, k_h>    (ONE batched matmul)

    reads k_img/v_img ONCE in their native (B, N, Ci) layout.  The
    head-split reshape einsum forced a 205 us relayout copy of each kernel
    output per use, and the per-head lane-sliced variant (8 slice-casts +
    16 tiny dots per use) measured WORSE (13.32 vs 11.77 ms decode64, r4).
    The pv pass attends every (t,h) row over ALL lanes; the head-h lane
    block is then selected by the same mask, summing over h.
    q (B, Nt, Ci) fp32; k_img/v_img (B, N, Ci) in compute dtype."""
    B, Nt, Ci = q.shape
    hd = Ci // num_heads
    scale = hd ** -0.5
    hm = np.zeros((num_heads, Ci), np.float32)
    for h in range(num_heads):
        hm[h, h * hd:(h + 1) * hd] = 1.0
    hmj = jnp.asarray(hm, k_img.dtype)
    qexp = ((q * scale)[:, :, None, :] * hmj[None, None]).reshape(
        B, Nt * num_heads, Ci).astype(k_img.dtype)
    if k_img.shape[0] == 1 and B > 1:
        # shared image side (layer 0 of a no-mask-prompt decode): k/v are
        # read once at batch 1 instead of B broadcast copies
        s = jnp.einsum("bqc,kc->bqk", qexp, k_img[0],
                       preferred_element_type=jnp.float32)
        a = jax.nn.softmax(s, axis=-1)
        o2 = jnp.einsum("bqk,kc->bqc", a.astype(v_img.dtype), v_img[0],
                        preferred_element_type=jnp.float32)
        return jnp.einsum("bthc,hc->btc", o2.reshape(B, Nt, num_heads, Ci),
                          hmj.astype(jnp.float32))
    s = jnp.einsum("bqc,bkc->bqk", qexp, k_img,
                   preferred_element_type=jnp.float32)
    a = jax.nn.softmax(s, axis=-1)
    o2 = jnp.einsum("bqk,bkc->bqc", a.astype(v_img.dtype), v_img,
                    preferred_element_type=jnp.float32)
    return jnp.einsum("bthc,hc->btc", o2.reshape(B, Nt, num_heads, Ci),
                      hmj.astype(jnp.float32))


def _mha(q, k, v, p, num_heads):
    """AttentionDownsample numerics, functional (fp32)."""
    q = _dense(q, p["q"])
    k = _dense(k, p["k"])
    v = _dense(v, p["v"])
    B, Nq, Ci = q.shape
    hd = Ci // num_heads
    qh = q.reshape(B, Nq, num_heads, hd)
    kh = k.reshape(B, k.shape[1], num_heads, hd)
    vh = v.reshape(B, v.shape[1], num_heads, hd)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32) / (hd ** 0.5)
    a = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", a, vh,
                   preferred_element_type=jnp.float32)
    return _dense(o.reshape(B, Nq, Ci), p["o"])


class TwoWayTransformer(nn.Module):
    """transformer.py:16-107.

    impl="fused" routes the image-side work (the (B, 4096, 256) keys stream
    that dominates decode at generation buckets) through the fused Pallas
    sweeps in kernels/fused_twoway.py: ONE kv-projection pass plus ONE
    pass per layer fusing q-proj + image->token attention + out-proj +
    residual + norm4 + the NEXT t2i K/V projections.  Token-side math
    (<= 128 tokens) replicates the flax modules functionally.  Param trees
    are identical across impls; init always runs the module path."""

    depth: int = 2
    embedding_dim: int = 256
    num_heads: int = 8
    mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    dtype: Dtype = jnp.float32
    impl: str = "xla"

    @nn.compact
    def __call__(
        self,
        image_embedding: jnp.ndarray,  # (B, H, W, C)
        image_pe: jnp.ndarray,  # (B, H, W, C) or (H, W, C)
        point_embedding: jnp.ndarray,  # (B, N, C)
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        from samrs_tpu.kernels.fused_twoway import NT

        b, h, w, c = image_embedding.shape
        bt = point_embedding.shape[0]
        keys = image_embedding.reshape(b, h * w, c)
        queries = point_embedding

        use_fused = (
            self.impl in ("fused", "fused_test")  # _test: CPU wiring check
            and not self.is_initializing()
            and (jax.default_backend() == "tpu" or self.impl == "fused_test")
            and point_embedding.shape[1] <= NT
        )
        if use_fused:
            # keys may arrive at batch 1 with bt > 1 prompts (uniform src:
            # no-mask-prompt decode) — the fused path keeps layer 0's image
            # side shared and only materializes per-prompt streams after the
            # first image->token update
            return self._fused(keys, image_pe.reshape(-1, h * w, c)[0],
                               point_embedding)
        if b == 1 and bt > 1:
            keys = jnp.broadcast_to(keys, (bt, h * w, c))
        key_pe = jnp.broadcast_to(image_pe.reshape(-1, h * w, c), keys.shape)

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

    def _fused(self, keys, key_pe, point_embedding):
        """Image-side-fused decode (see class docstring).  keys (B, N, C)
        fp32 — or (1, N, C) with B prompts when the initial image side is
        prompt-uniform (boxes/points, no mask input): layer 0's kv
        projection then runs at batch 1 and the i2t kernel reads the shared
        keys block once per row (value-identical; saves ~0.5 GB of HBM
        traffic at bucket 64).  key_pe (N, C), point_embedding (B, Nt, C)."""
        from samrs_tpu.kernels.fused_twoway import NT, i2t_update, t2i_kv_proj

        C = self.embedding_dim
        Ci = C // self.attention_downsample_rate
        nH = self.num_heads
        hd_t2i = Ci // nH
        B, Nt, _ = point_embedding.shape
        queries = point_embedding
        # kernel matmul dtype: fp32 streams, bf16 MXU passes on TPU (the XLA
        # path's fp32 dots already run at default matmul precision there —
        # CLAUDE.md "decode precision reality check"); fp32 off-TPU so the
        # oracle fallback is exact for the CPU wiring test
        kdt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32

        blocks = [
            _TwoWayBlockParams(C, Ci, self.mlp_dim, name=f"layers_{i}")()
            for i in range(self.depth)
        ]
        final_p = _AttnP(C, Ci, name="final_attn_token_to_image")()
        norm_final = _LNP(C, name="norm_final_attn")()

        mask_bias = jnp.asarray(
            np.where(np.arange(NT) < Nt, 0.0, -1e9), jnp.float32
        )

        def pad_tok(x):
            return jnp.pad(x, ((0, 0), (0, NT - Nt), (0, 0)))

        # one kv-projection sweep for layer 0's token->image attention
        k_img, v_img = t2i_kv_proj(
            keys, key_pe, *blocks[0]["t2i"]["k"], *blocks[0]["t2i"]["v"],
            dtype=kdt,
        )

        for i in range(self.depth):
            p = blocks[i]
            # 1. token self-attention (reference transformer.py:151-160)
            if i == 0:
                queries = _mha(queries, queries, queries, p["self_attn"], nH)
            else:
                q = queries + point_embedding
                queries = queries + _mha(q, q, queries, p["self_attn"], nH)
            queries = _ln(queries, p["norm1"])

            # 2. token -> image cross-attention (k/v precomputed by the
            # previous fused sweep); expanded-q formulation reads the kernel
            # outputs once in native layout (see _expanded_head_attn)
            q = _dense(queries + point_embedding, p["t2i"]["q"])
            queries = queries + _dense(
                _expanded_head_attn(q, k_img, v_img, nH), p["t2i"]["o"])
            queries = _ln(queries, p["norm2"])

            # 3. token MLP (relu)
            hmid = jax.nn.relu(_dense(queries, p["mlp"]["lin1"]))
            queries = queries + _dense(hmid, p["mlp"]["lin2"])
            queries = _ln(queries, p["norm3"])

            # 4. image -> token update, fused over the keys stream; also
            # emits the NEXT t2i/final K/V projections
            nxt = blocks[i + 1]["t2i"] if i + 1 < self.depth else final_p
            tok_k = pad_tok(_dense(queries + point_embedding, p["i2t"]["k"]))
            tok_v = pad_tok(_dense(queries, p["i2t"]["v"]))
            keys, k_img, v_img = i2t_update(
                keys, key_pe, tok_k, tok_v, mask_bias,
                *p["i2t"]["q"], *p["i2t"]["o"], *p["norm4"],
                *nxt["k"], *nxt["v"], nH, dtype=kdt,
                # the final keys only feed the upscale kernel, which casts
                # to the compute dtype anyway — emit it there directly
                # (saves a 609 us convert + half the last write, r4 trace)
                out_dtype=kdt if i == self.depth - 1 else jnp.float32,
            )

        # final token -> image attention (:99-104)
        q = _dense(queries + point_embedding, final_p["q"])
        queries = queries + _dense(
            _expanded_head_attn(q, k_img, v_img, nH), final_p["o"])
        queries = _ln(queries, norm_final)
        return queries, keys
