"""ResNet-50 segmentation backbone.

Behavioral reference: ED/backbone/resnet_mmseg_10.py (mmseg-vendored ResNet
with out_indices (0-3), out_channels (3, 256, 512, 1024, 2048),
resnet_mmseg_10.py:532).  Rebuilt as standard bottleneck ResNet in flax/NHWC;
BatchNorm is flax nn.BatchNorm — under jit with a batch-sharded input the
batch statistics are computed over the GLOBAL batch, which is exactly the
reference's SyncBN (ED/main_pretrain.py:443) without any process-group code.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x
    strides: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
        )
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = norm("bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), strides=(self.strides, self.strides),
            padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype, name="conv2",
        )(y)
        y = norm("bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(y)
        y = norm("bn3")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features * 4, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            residual = norm("downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Returns [img, c1(s4), c2(s8), c3(s16), c4(s32)]."""

    stage_sizes: Tuple[int, ...] = (3, 4, 6, 3)  # ResNet-50
    dtype: Dtype = jnp.float32

    @property
    def out_channels(self) -> Tuple[int, ...]:
        return (3, 256, 512, 1024, 2048)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Sequence[jnp.ndarray]:
        img = x
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)), use_bias=False,
            dtype=self.dtype, name="stem_conv",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = []
        widths = (64, 128, 256, 512)
        for s, (n_blocks, w) in enumerate(zip(self.stage_sizes, widths)):
            for b in range(n_blocks):
                strides = 2 if (s > 0 and b == 0) else 1
                x = Bottleneck(w, strides=strides, dtype=self.dtype,
                               name=f"layer{s + 1}_block{b}")(x, train)
            feats.append(x)
        return [img] + feats


def resnet50(dtype: Any = jnp.float32, **kw: Any) -> ResNet:
    kw.pop("image_size", None)
    kw.setdefault("stage_sizes", (3, 4, 6, 3))
    return ResNet(dtype=dtype, **kw)
