"""The composite SAM model.

Behavioral reference: GD/segment_anything/modeling/sam.py
  * preprocess: normalize + pad-to-imgsize² (:164-174)
  * postprocess: two bilinear interpolations, crop between them (:133-162)
  * mask_threshold = 0.0 (:19)

The torch reference loops a Python list of per-image prompt dicts (:101).  Here
`Sam` exposes three jittable sub-applies — `encode_image`, `encode_prompts`,
`decode_masks` — plus the composed `__call__`; the orchestration (batching,
prompt bucketing, host I/O) lives in the Predictor and the generate drivers,
keeping everything inside jit fixed-shape.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from samrs_tpu.core.config import SamConfig
from samrs_tpu.nn.interpolate import resize_bilinear
from samrs_tpu.sam.image_encoder import ImageEncoderViT
from samrs_tpu.sam.mask_decoder import MaskDecoder
from samrs_tpu.sam.prompt_encoder import PromptEncoder


def preprocess(
    x: jnp.ndarray, pixel_mean, pixel_std, img_size: int
) -> jnp.ndarray:
    """(B, H, W, 3) uint8/float -> normalized, zero-padded (B, S, S, 3).

    Mirrors sam.py:164-174 (normalize then bottom/right pad).
    """
    x = (x.astype(jnp.float32) - jnp.asarray(pixel_mean)) / jnp.asarray(pixel_std)
    h, w = x.shape[1], x.shape[2]
    return jnp.pad(x, ((0, 0), (0, img_size - h), (0, img_size - w), (0, 0)))


def postprocess_masks(
    masks: jnp.ndarray,
    input_size: Tuple[int, int],
    original_size: Tuple[int, int],
    img_size: int = 1024,
) -> jnp.ndarray:
    """(B, M, h, w) low-res logits -> (B, M, *original_size) logits.

    Two-stage bilinear upsample with crop in between (sam.py:133-162), exact
    torch `align_corners=False` semantics via resize_bilinear.
    `input_size`/`original_size` must be static under jit.
    """
    masks = resize_bilinear(masks, (img_size, img_size))
    masks = masks[..., : input_size[0], : input_size[1]]
    return resize_bilinear(masks, original_size)


class Sam(nn.Module):
    """SAM = image encoder + prompt encoder + mask decoder (sam.py:18)."""

    cfg: SamConfig
    # optional sequence parallelism for the encoder's global-attention layers
    # (huge tiles / multi-chip): a 1-D Mesh over a "seq" axis
    sp_mesh: Any = None
    sp_axis: str = "seq"

    def setup(self) -> None:
        c = self.cfg
        dtype = jnp.bfloat16 if c.compute_dtype == "bfloat16" else jnp.float32
        self.image_encoder = ImageEncoderViT(
            img_size=c.image_size,
            patch_size=c.patch_size,
            embed_dim=c.encoder_embed_dim,
            depth=c.encoder_depth,
            num_heads=c.encoder_num_heads,
            out_chans=c.prompt_embed_dim,
            window_size=c.window_size,
            global_attn_indexes=c.encoder_global_attn_indexes,
            dtype=dtype,
            use_flash=c.use_flash_attention,
            window_attn_impl=c.window_attn_impl,
            mlp_impl=c.mlp_impl,
            tail_impl=c.tail_impl,
            global_attn_impl=c.global_attn_impl,
            sp_mesh=self.sp_mesh,
            sp_axis=self.sp_axis,
        )
        self.prompt_encoder = PromptEncoder(
            embed_dim=c.prompt_embed_dim,
            image_embedding_size=(c.grid_size, c.grid_size),
            input_image_size=(c.image_size, c.image_size),
            mask_in_chans=c.mask_in_chans,
        )
        self.mask_decoder = MaskDecoder(
            transformer_dim=c.prompt_embed_dim,
            transformer_depth=c.decoder_depth,
            transformer_mlp_dim=c.decoder_mlp_dim,
            transformer_num_heads=c.decoder_num_heads,
            num_multimask_outputs=c.num_multimask_outputs,
            iou_head_depth=c.iou_head_depth,
            iou_head_hidden_dim=c.iou_head_hidden_dim,
            dtype=jnp.bfloat16 if c.decode_dtype == "bfloat16" else jnp.float32,
            upscale_impl=c.upscale_impl,
            twoway_impl=c.twoway_impl,
        )

    # --- jittable sub-applies (each usable via model.apply(..., method=...)) ---

    def encode_image(self, x: jnp.ndarray) -> jnp.ndarray:
        """Preprocessed (B, S, S, 3) -> (B, S/16, S/16, 256) fp32 features."""
        return self.image_encoder(x).astype(jnp.float32)

    def dense_pe(self) -> jnp.ndarray:
        return self.prompt_encoder.get_dense_pe()

    def encode_prompts(
        self,
        points: Optional[jnp.ndarray] = None,
        labels: Optional[jnp.ndarray] = None,
        masks: Optional[jnp.ndarray] = None,
        batch: int = 1,
    ):
        return self.prompt_encoder(points=points, labels=labels, masks=masks, batch=batch)

    def decode_masks(
        self,
        image_embeddings: jnp.ndarray,
        sparse: jnp.ndarray,
        dense: jnp.ndarray,
        multimask_output: bool = False,
        src_uniform: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Decode prompt embeddings against cached image embeddings.

        src_uniform=True is a CALLER CONTRACT, not checked at runtime (the
        rows live on device inside jit): it asserts every prompt shares one
        image AND one dense (mask) embedding row, so the decoder may run its
        layer-0 image stream at batch 1 using dense[:1].  Only set it when
        there is no per-prompt mask input (`Sam.predict` sets it exactly when
        `mask_inputs is None`); passing distinct dense rows with
        src_uniform=True silently decodes every prompt against dense[0].
        """
        return self.mask_decoder(
            image_embeddings,
            self.prompt_encoder.get_dense_pe(),
            sparse,
            dense,
            multimask_output=multimask_output,
            src_uniform=src_uniform,
        )

    def predict(
        self,
        image_embeddings: jnp.ndarray,
        points: Optional[jnp.ndarray] = None,
        labels: Optional[jnp.ndarray] = None,
        mask_inputs: Optional[jnp.ndarray] = None,
        multimask_output: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Cached-embedding decode: prompts -> (low-res mask logits, iou)."""
        sparse, dense = self.prompt_encoder(points=points, labels=labels, masks=mask_inputs)
        # without a mask prompt, dense is the no-mask embedding broadcast —
        # the per-prompt image side is uniform and layer 0 of the decode can
        # run its image stream at batch 1 (guarded on shapes downstream)
        return self.decode_masks(image_embeddings, sparse, dense,
                                 multimask_output,
                                 src_uniform=mask_inputs is None)

    def __call__(
        self,
        x: jnp.ndarray,
        points: Optional[jnp.ndarray] = None,
        labels: Optional[jnp.ndarray] = None,
        multimask_output: bool = False,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """End-to-end: preprocessed image batch + one prompt set per image."""
        feats = self.encode_image(x)
        sparse, dense = self.prompt_encoder(points=points, labels=labels)
        return self.decode_masks(feats, sparse, dense, multimask_output)

    def init_all(
        self, x: jnp.ndarray, points: jnp.ndarray, labels: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Init-time entry that traces EVERY parameterized path (including the
        mask-prompt downscaler, which `__call__` with masks=None skips)."""
        feats = self.encode_image(x)
        g = self.cfg.grid_size
        m = jnp.zeros((points.shape[0], 4 * g, 4 * g, 1), jnp.float32)
        sparse, dense = self.prompt_encoder(points=points, labels=labels, masks=m)
        return self.decode_masks(feats, sparse, dense, False)
