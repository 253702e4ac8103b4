"""SAM mask decoder.

Behavioral reference: GD/segment_anything/modeling/mask_decoder.py
  * IoU token + num_multimask+1 mask tokens prepended to sparse prompts (:126-129)
  * image embedding broadcast per prompt batch (:136-138)
  * TwoWayTransformer core; 2x ConvTranspose 4x upscale (:53-59)
  * per-token hypernetwork MLPs dotted with the upscaled embedding (:156-167)
  * IoU prediction MLP head (:67-69, :172)
  * multimask slice 1: vs 0:1 (:102-107)

TPU-first: the prompt-batch dimension is the leading batch dim, so decoding B
prompt sets against one cached image embedding is a single batched call (the
reference loops over images and repeat_interleaves; we broadcast).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from samrs_tpu.nn.layers import MLP, ConvTranspose2x, LayerNorm2d
from samrs_tpu.sam.transformer import TwoWayTransformer

Dtype = Any


class MaskDecoder(nn.Module):
    transformer_dim: int = 256
    transformer_depth: int = 2
    transformer_mlp_dim: int = 2048
    transformer_num_heads: int = 8
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    dtype: Dtype = jnp.float32
    # "fused": single-pass Pallas upscale+hypernetwork kernel computing only
    # the requested mask tokens (kernels/fused_upscale.py; falls back to the
    # identical XLA composition off-TPU).  "xla": the tap-matmul composition.
    upscale_impl: str = "fused"
    # "fused": image-side-fused TwoWayTransformer sweeps
    # (kernels/fused_twoway.py, TPU only).  "xla": the module composition.
    twoway_impl: str = "xla"

    def setup(self) -> None:
        self.num_mask_tokens = self.num_multimask_outputs + 1
        self.iou_token = self.param(
            "iou_token", nn.initializers.normal(1.0), (1, self.transformer_dim)
        )
        self.mask_tokens = self.param(
            "mask_tokens", nn.initializers.normal(1.0), (self.num_mask_tokens, self.transformer_dim)
        )
        self.transformer = TwoWayTransformer(
            depth=self.transformer_depth,
            embedding_dim=self.transformer_dim,
            num_heads=self.transformer_num_heads,
            mlp_dim=self.transformer_mlp_dim,
            dtype=self.dtype,
            impl=self.twoway_impl,
        )
        d = self.transformer_dim
        self.upscale_conv1 = ConvTranspose2x(d // 4, dtype=self.dtype, name="upscale_conv1")
        self.upscale_ln = LayerNorm2d(name="upscale_ln")
        self.upscale_conv2 = ConvTranspose2x(d // 8, dtype=self.dtype, name="upscale_conv2")
        self.output_hypernetworks_mlps = [
            MLP(d, d // 8, 3, name=f"hyper_mlp_{i}") for i in range(self.num_mask_tokens)
        ]
        self.iou_prediction_head = MLP(
            self.iou_head_hidden_dim, self.num_mask_tokens, self.iou_head_depth, name="iou_head"
        )

    def __call__(
        self,
        image_embeddings: jnp.ndarray,  # (1 or B, H, W, C)
        image_pe: jnp.ndarray,  # (H, W, C)
        sparse_prompt_embeddings: jnp.ndarray,  # (B, N, C)
        dense_prompt_embeddings: jnp.ndarray,  # (B, H, W, C)
        multimask_output: bool = False,
        src_uniform: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (masks (B, M, 4H, 4W), iou_pred (B, M)).

        src_uniform=True (static) asserts the per-prompt image side is
        identical across the prompt batch (one image, dense embeddings all
        the no-mask embedding — i.e. box/point prompts): the transformer
        then keeps layer 0's image stream at batch 1 (value-identical)."""
        # reference slices AFTER computing all tokens (:102-107); each token's
        # hypernetwork MLP + mask dot is independent, so computing only the
        # requested tokens is value-identical and skips 3/4 of the upscale dot
        idx = (
            tuple(range(1, self.num_mask_tokens)) if multimask_output else (0,)
        )
        masks, iou_pred = self.predict_masks(
            image_embeddings, image_pe, sparse_prompt_embeddings,
            dense_prompt_embeddings, token_idx=idx, src_uniform=src_uniform,
        )
        sl = slice(1, None) if multimask_output else slice(0, 1)
        return masks, iou_pred[:, sl]

    def predict_masks(
        self,
        image_embeddings: jnp.ndarray,
        image_pe: jnp.ndarray,
        sparse_prompt_embeddings: jnp.ndarray,
        dense_prompt_embeddings: jnp.ndarray,
        token_idx: Optional[Tuple[int, ...]] = None,
        src_uniform: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (masks (B, len(token_idx), 4H, 4W), iou_pred (B, M_all)).

        token_idx=None computes every mask token.  At init all hypernetwork
        MLPs run regardless so the full parameter tree materializes.

        src_uniform=True is an unchecked caller contract (see
        Sam.decode_masks): all B dense rows must be identical (no per-prompt
        mask inputs) — the decoder then uses dense_prompt_embeddings[:1] for
        every prompt."""
        B = sparse_prompt_embeddings.shape[0]
        output_tokens = jnp.concatenate([self.iou_token, self.mask_tokens], axis=0)
        output_tokens = jnp.broadcast_to(
            output_tokens[None], (B, *output_tokens.shape)
        )
        tokens = jnp.concatenate([output_tokens, sparse_prompt_embeddings], axis=1)

        # broadcast image embedding across the prompt batch (:136-138 used
        # repeat_interleave; a broadcast + add is fusion-friendly on TPU).
        # With src_uniform (box/point prompts, one image) every row of that
        # broadcast is identical — keep it at batch 1; the transformer
        # broadcasts lazily (or, fused, shares layer 0's image stream)
        if (src_uniform and image_embeddings.shape[0] == 1 and B > 1
                and not self.is_initializing()):
            src = image_embeddings + dense_prompt_embeddings[:1]
        else:
            src = image_embeddings + dense_prompt_embeddings
        h, w, c = src.shape[-3:]

        hs, src = self.transformer(src, image_pe, tokens)
        iou_token_out = hs[:, 0, :]
        mask_tokens_out = hs[:, 1 : 1 + self.num_mask_tokens, :]

        src = src.reshape(B, h, w, c)
        idx = (
            tuple(range(self.num_mask_tokens))
            if token_idx is None or self.is_initializing()
            else tuple(token_idx)
        )
        hyper_in = jnp.stack(
            [self.output_hypernetworks_mlps[i](mask_tokens_out[:, i, :]) for i in idx],
            axis=1,
        )  # (B, len(idx), c/8)

        if self.upscale_impl == "fused" and not self.is_initializing():
            # single-pass Pallas kernel: conv taps + LN + gelus + hypernetwork
            # dot never leave VMEM (kernels/fused_upscale.py; exact-composition
            # XLA fallback off-TPU)
            from samrs_tpu.kernels.fused_upscale import fused_upscale_hyper

            k1, b1 = self.upscale_conv1(src, params_only=True)
            lns, lnb = self.upscale_ln(
                jnp.zeros((1, k1.shape[-1]), jnp.float32), params_only=True
            )
            k2, b2 = self.upscale_conv2(
                jnp.zeros((1, 1, 1, k1.shape[-1]), jnp.float32), params_only=True
            )
            masks = fused_upscale_hyper(
                src, k1, b1, lns, lnb, k2, b2,
                hyper_in.astype(jnp.float32), dtype=self.dtype,
            )
            iou_pred = self.iou_prediction_head(iou_token_out)
            return masks, iou_pred

        # deferred-interleave upscale: carry the 2x2 tap axes (i,j then k,l)
        # instead of materialising pixel order after each deconv — LayerNorm2d
        # and gelu are per-pixel, so only the final mask tensor needs the
        # (4h+2i+k, 4w+2j+l) ordering (one small transpose vs two wide ones)
        up = self.upscale_conv1(src, interleave=False)  # (B, h, w, 2, 2, c/4)
        up = self.upscale_ln(up)
        up = nn.gelu(up, approximate=False)
        up = self.upscale_conv2(up, interleave=False)  # (B, h, w, 2,2, 2,2, c/8)
        up = nn.gelu(up, approximate=False)

        masks = jnp.einsum(
            "bmc,bhwijklc->bmhwijkl", hyper_in, up, preferred_element_type=jnp.float32
        )
        M = masks.shape[1]
        # output pixel (4h+2i+k, 4w+2j+l) -> order (b, m, h, i, k, w, j, l)
        masks = masks.transpose(0, 1, 2, 4, 6, 3, 5, 7).reshape(B, M, 4 * h, 4 * w)
        iou_pred = self.iou_prediction_head(iou_token_out)
        return masks, iou_pred
