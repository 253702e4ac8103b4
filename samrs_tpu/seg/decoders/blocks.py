"""Shared decoder blocks (reference: ED/modules.py — Conv2dReLU, SCSEModule).

NHWC; BatchNorm is global-batch (== SyncBN) under sharded jit.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ConvBNReLU(nn.Module):
    """3x3 (or kxk) conv -> BN -> ReLU (ED/modules.py:10)."""

    features: int
    kernel: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        p = self.kernel // 2
        x = nn.Conv(
            self.features, (self.kernel, self.kernel), padding=((p, p), (p, p)),
            use_bias=False, dtype=self.dtype, name="conv",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9, epsilon=1e-5,
                         name="bn")(x)
        return nn.relu(x)


class SCSEModule(nn.Module):
    """Spatial + channel squeeze-excitation (ED/modules.py:50)."""

    reduction: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        # channel SE
        s = x.mean(axis=(1, 2), keepdims=True)
        s = nn.Conv(max(c // self.reduction, 1), (1, 1), dtype=self.dtype, name="cse_fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(c, (1, 1), dtype=self.dtype, name="cse_fc2")(s)
        cse = x * nn.sigmoid(s)
        # spatial SE
        t = nn.Conv(1, (1, 1), dtype=self.dtype, name="sse_conv")(x)
        sse = x * nn.sigmoid(t)
        return cse + sse


def resize_bilinear_nhwc(x: jnp.ndarray, hw, align_corners: bool = False) -> jnp.ndarray:
    """Bilinear resize of NHWC maps (mmseg `resize` equivalent)."""
    from samrs_tpu.nn.interpolate import resize_bilinear

    if align_corners:
        import jax

        return jax.image.resize(x, (x.shape[0], *hw, x.shape[-1]), "bilinear")
    x = jnp.moveaxis(x, -1, 1)
    x = resize_bilinear(x, tuple(hw))
    return jnp.moveaxis(x, 1, -1)


def adaptive_avg_pool(x: jnp.ndarray, out_hw) -> jnp.ndarray:
    """torch.nn.AdaptiveAvgPool2d semantics for NHWC, any in/out sizes.

    Bin i covers [floor(i*N/s), ceil((i+1)*N/s)); implemented as two small
    matmuls (pooling matrices), which XLA maps straight onto the MXU.
    """
    import numpy as np

    def pool_matrix(n: int, s: int) -> jnp.ndarray:
        m = np.zeros((s, n), np.float32)
        for i in range(s):
            lo = (i * n) // s
            hi = -(-((i + 1) * n) // s)  # ceil
            m[i, lo:hi] = 1.0 / (hi - lo)
        return jnp.asarray(m)

    B, H, W, C = x.shape
    oh, ow = out_hw
    ph = pool_matrix(H, oh)
    pw = pool_matrix(W, ow)
    y = jnp.einsum("oh,bhwc->bowc", ph, x.astype(jnp.float32))
    y = jnp.einsum("pw,bowc->bopc", pw, y)
    return y.astype(x.dtype)


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    B, H, W, C = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (B, H, 2, W, 2, C))
    return x.reshape(B, 2 * H, 2 * W, C)
