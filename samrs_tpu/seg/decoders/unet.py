"""UNet decoder (reference: ED/unet.py:8-127).

Takes [img, c1..c4]; drops img, reverses, and runs skip-concat upsampling
blocks: 2x nearest upsample, bilinear-resize skip to match, concat, two
ConvBNReLU; final 2x bilinear (unet.py:109-128).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from samrs_tpu.seg.decoders.blocks import (
    ConvBNReLU,
    SCSEModule,
    resize_bilinear_nhwc,
    upsample_nearest_2x,
)

Dtype = Any


class DecoderBlock(nn.Module):
    out_ch: int
    attention_type: str = "none"  # 'none' | 'scse' (ED/unet.py attention_type)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip=None, train: bool = False) -> jnp.ndarray:
        x = upsample_nearest_2x(x)
        if skip is not None:
            skip = resize_bilinear_nhwc(skip, x.shape[1:3])
            x = jnp.concatenate([x, skip.astype(x.dtype)], axis=-1)
            if self.attention_type == "scse":
                x = SCSEModule(dtype=self.dtype, name="attention1")(x)
        x = ConvBNReLU(self.out_ch, dtype=self.dtype, name="conv1")(x, train)
        x = ConvBNReLU(self.out_ch, dtype=self.dtype, name="conv2")(x, train)
        if self.attention_type == "scse":
            x = SCSEModule(dtype=self.dtype, name="attention2")(x)
        return x


class UnetDecoder(nn.Module):
    decoder_channels: Tuple[int, ...] = (512, 256, 128, 64)
    attention_type: str = "none"
    dtype: Dtype = jnp.float32

    @property
    def out_features(self) -> int:
        return self.decoder_channels[-1]

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], train: bool = False) -> jnp.ndarray:
        feats = list(features[1:])[::-1]  # drop img, head-first (unet.py:109-117)
        x = feats[0]
        skips = feats[1:]
        for i, out_ch in enumerate(self.decoder_channels):
            skip = skips[i] if i < len(skips) else None
            x = DecoderBlock(
                out_ch, attention_type=self.attention_type, dtype=self.dtype,
                name=f"block{i}",
            )(x, skip, train)
        return resize_bilinear_nhwc(x, (x.shape[1] * 2, x.shape[2] * 2))
