"""UNet++ decoder (reference: ED/unetpp.py:8-140): dense nested skip pathways.

Node X[i][j] consumes the upsampled X[i+1][j-1] concatenated with all
same-level predecessors X[i][0..j-1]; the output is the deepest path's last
node, followed by a final 2x bilinear like UNet.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from samrs_tpu.seg.decoders.blocks import ConvBNReLU, resize_bilinear_nhwc, upsample_nearest_2x

Dtype = Any


class UnetPlusPlusDecoder(nn.Module):
    decoder_channels: Tuple[int, ...] = (512, 256, 128, 64)
    dtype: Dtype = jnp.float32

    @property
    def out_features(self) -> int:
        return self.decoder_channels[-1]

    @nn.compact
    def __call__(self, features: Sequence[jnp.ndarray], train: bool = False) -> jnp.ndarray:
        feats = list(features[1:])  # [c1, c2, c3, c4], strides 4..32
        depth = len(feats) - 1  # 3 nested levels of nodes
        # nodes[(level, j)]: level = encoder level of the node's resolution
        nodes: Dict[Tuple[int, int], jnp.ndarray] = {
            (lvl, 0): f for lvl, f in enumerate(feats)
        }
        for j in range(1, depth + 1):
            for lvl in range(0, depth + 1 - j):
                below = upsample_nearest_2x(nodes[(lvl + 1, j - 1)])
                below = resize_bilinear_nhwc(below, nodes[(lvl, 0)].shape[1:3])
                cat = [nodes[(lvl, k)] for k in range(j)] + [below]
                x = jnp.concatenate([c.astype(below.dtype) for c in cat], axis=-1)
                ch = self.decoder_channels[min(len(self.decoder_channels) - 1,
                                               depth - lvl)]
                x = ConvBNReLU(ch, dtype=self.dtype, name=f"node_{lvl}_{j}_conv1")(x, train)
                x = ConvBNReLU(ch, dtype=self.dtype, name=f"node_{lvl}_{j}_conv2")(x, train)
                nodes[(lvl, j)] = x
        out = nodes[(0, depth)]
        # one extra decoder step to stride 2 then the final 2x (matching UNet's
        # output stride of 1x input resolution)
        out = upsample_nearest_2x(out)
        out = ConvBNReLU(self.decoder_channels[-1], dtype=self.dtype, name="final_conv")(
            out, train
        )
        return resize_bilinear_nhwc(out, (out.shape[1] * 2, out.shape[2] * 2))
