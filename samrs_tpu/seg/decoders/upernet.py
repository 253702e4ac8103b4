"""UperNet head (reference: ED/upernet_mmseg_30.py:439-570, mmseg-0.30 vendored).

PPM pyramid pooling on the top feature, FPN lateral/top-down fusion over the
lower features, concat + bottleneck; forward drops the raw-image element and
ends with a 4x bilinear upsample, WITHOUT the classification conv (moved into
the framework heads, upernet_mmseg_30.py:561-570).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from samrs_tpu.seg.decoders.blocks import ConvBNReLU, adaptive_avg_pool, resize_bilinear_nhwc

Dtype = Any


class PPM(nn.Module):
    """Pooling pyramid module (upernet_mmseg_30.py:46-93)."""

    channels: int
    pool_scales: Tuple[int, ...] = (1, 2, 3, 6)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Sequence[jnp.ndarray]:
        B, H, W, C = x.shape
        outs = []
        for i, s in enumerate(self.pool_scales):
            pooled = adaptive_avg_pool(x, (s, s))
            y = ConvBNReLU(self.channels, kernel=1, dtype=self.dtype, name=f"ppm{i}")(
                pooled, train
            )
            outs.append(resize_bilinear_nhwc(y, (H, W)))
        return outs


class UPerHead(nn.Module):
    channels: int = 512
    pool_scales: Tuple[int, ...] = (1, 2, 3, 6)
    dtype: Dtype = jnp.float32

    @property
    def out_features(self) -> int:
        return self.channels

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], train: bool = False) -> jnp.ndarray:
        inputs = list(features[1:])  # drop raw image (upernet_mmseg_30.py:563)

        # PSP on the top level
        top = inputs[-1]
        psp_outs = [top] + list(
            PPM(self.channels, self.pool_scales, dtype=self.dtype, name="ppm")(top, train)
        )
        psp = ConvBNReLU(self.channels, dtype=self.dtype, name="bottleneck")(
            jnp.concatenate([p.astype(top.dtype) for p in psp_outs], axis=-1), train
        )

        # laterals + top-down
        laterals = [
            ConvBNReLU(self.channels, kernel=1, dtype=self.dtype, name=f"lateral{i}")(
                inputs[i], train
            )
            for i in range(len(inputs) - 1)
        ]
        laterals.append(psp)
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + resize_bilinear_nhwc(
                laterals[i], laterals[i - 1].shape[1:3]
            ).astype(laterals[i - 1].dtype)

        fpn_outs = [
            ConvBNReLU(self.channels, dtype=self.dtype, name=f"fpn{i}")(laterals[i], train)
            for i in range(len(laterals) - 1)
        ]
        fpn_outs.append(laterals[-1])
        target_hw = fpn_outs[0].shape[1:3]
        fpn_outs = [
            f if f.shape[1:3] == target_hw else resize_bilinear_nhwc(f, target_hw)
            for f in fpn_outs
        ]
        feats = ConvBNReLU(self.channels, dtype=self.dtype, name="fpn_bottleneck")(
            jnp.concatenate([f.astype(fpn_outs[0].dtype) for f in fpn_outs], axis=-1), train
        )
        # 4x bilinear to input resolution (for stride-4 c1)
        return resize_bilinear_nhwc(feats, (feats.shape[1] * 4, feats.shape[2] * 4))
