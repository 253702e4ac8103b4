"""Shared neural-net building blocks (flax.linen, NHWC everywhere).

TPU-first conventions:
  * all image tensors are NHWC (XLA's native conv layout on TPU);
  * matmul-heavy modules take a ``dtype`` compute dtype (bf16 for throughput)
    while parameters stay fp32;
  * window partitioning is pure reshape/transpose (free under XLA).

Reference semantics: GD/segment_anything/modeling/common.py:13-43 (MLPBlock,
LayerNorm2d), image_encoder.py:243-289 (window partition/unpartition),
mask_decoder.py:179-201 (MLP).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class ConvTranspose2x(nn.Module):
    """2x2-stride-2 transposed conv as FOUR matmuls + a pixel interleave.

    Mathematically identical to nn.ConvTranspose(features, (2,2), strides
    (2,2)) — with stride 2 and kernel 2 every output pixel receives exactly
    one input tap, so out[2i+di, 2j+dj] = x[i,j] @ W[di,dj] + b.  XLA lowers
    the transposed conv itself catastrophically on TPU (the two upscaling
    deconvs cost 34 ms/step of the SAM decode at bucket 64 vs ~2 ms as
    matmuls); this keeps the exact ConvTranspose param shapes (kernel
    (2,2,Cin,Cout), bias (Cout,)) so checkpoint porters are unaffected.

    Pixel-order note: any op that is per-pixel (LayerNorm2d over channels,
    gelu) or contracts only channels commutes with the pixel interleave, so
    callers may defer it (``interleave=False``) and carry the 2x2 tap axes
    as extra trailing batch dims — SAM's predict_masks does this and
    materialises the pixel order once, on the small final mask tensor,
    instead of twice on the wide channel tensors.
    """

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, interleave: bool = True, params_only: bool = False
    ):
        C = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (2, 2, C, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        if params_only:  # declare + expose params (for fused-kernel callers)
            return kernel, bias
        xc = x.astype(self.dtype)
        # nn.ConvTranspose applies the kernel spatially FLIPPED relative to the
        # direct tap formulation (lax.conv_transpose = zero-dilate + correlate
        # with the mirrored kernel); flip so params stay porter-compatible.
        kc = kernel[::-1, ::-1].astype(self.dtype)
        # (..., H, W, C) @ (2,2,C,D) -> (..., H, W, 2, 2, D)
        y = jnp.einsum("...c,ijcd->...ijd", xc, kc, preferred_element_type=jnp.float32)
        y = (y + bias).astype(self.dtype)
        if interleave:
            *lead, H, W, _, _, D = y.shape
            n = y.ndim
            y = y.transpose(*range(n - 5), n - 5, n - 3, n - 4, n - 2, n - 1)
            y = y.reshape(*lead, 2 * H, 2 * W, D)
        return y


class LayerNorm2d(nn.Module):
    """Per-position LayerNorm over the channel axis of an NHWC tensor.

    Equivalent to the reference's channels-first LayerNorm2d (common.py:31-43,
    eps 1e-6) — in NHWC it reduces to a plain LayerNorm on the last axis.
    """

    epsilon: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray, params_only: bool = False):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (x.shape[-1],), jnp.float32)
        if params_only:  # declare + expose params (for fused-kernel callers)
            return scale, bias
        orig_dtype = x.dtype
        x = x.astype(jnp.float32)
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (x * scale + bias).astype(orig_dtype)


class _DenseParams(nn.Module):
    """Declares nn.Dense-shaped params (kernel, bias) without the compute —
    lets MLPBlock route the math through a fused kernel while keeping the
    exact {lin1,lin2}/{kernel,bias} tree the checkpoint porters expect."""

    features: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_features, self.features),
            jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return kernel, bias


# Process-wide default for MLPBlock(impl=None) callers (the seg backbones,
# which share MLPBlock but don't plumb a per-model knob).  The SAM encoder
# passes an explicit impl from SamConfig.mlp_impl instead.  Read at TRACE
# time: set it before building/jitting a model (it does not invalidate
# already-compiled functions).
MLP_IMPL_DEFAULT = "xla"


def set_default_mlp_impl(impl: str) -> None:
    """Set the process default MLPBlock implementation ('xla' | 'fused')."""
    global MLP_IMPL_DEFAULT
    if impl not in ("xla", "fused"):
        raise ValueError(f"impl must be 'xla' or 'fused', got {impl!r}")
    MLP_IMPL_DEFAULT = impl


# Same pattern for the seg backbones' full-attention blocks: 'flash' routes
# PlainAttention through the one-pass Pallas forward (softmax never hits HBM;
# backward stays the XLA composition = free remat).  Read at trace time.
ATTN_IMPL_DEFAULT = "xla"


def set_default_attn_impl(impl: str) -> None:
    """Set the process default seg-backbone attention impl ('xla' | 'flash')."""
    global ATTN_IMPL_DEFAULT
    if impl not in ("xla", "flash"):
        raise ValueError(f"impl must be 'xla' or 'flash', got {impl!r}")
    ATTN_IMPL_DEFAULT = impl


class MLPBlock(nn.Module):
    """lin -> act -> lin (common.py:13-28).

    impl="fused" routes the erf-gelu MLP through the single-pass Pallas
    kernel (kernels/fused_mlp.py): hidden activations never leave VMEM and
    gelu is evaluated once per element (XLA recomputes it per output tile).
    Only valid for the default exact-gelu ``act``.  impl=None defers to the
    process-wide MLP_IMPL_DEFAULT.
    """

    mlp_dim: int
    # exact (erf) GELU: torch nn.GELU default, used by every reference MLP
    act: Callable = staticmethod(lambda x: nn.gelu(x, approximate=False))
    dtype: Dtype = jnp.float32
    impl: Optional[str] = None  # "xla" | "fused" | None (= MLP_IMPL_DEFAULT)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d = x.shape[-1]
        impl = self.impl if self.impl is not None else MLP_IMPL_DEFAULT
        if impl == "fused" and self.act is not type(self).act:
            if self.impl == "fused":  # explicit request: refuse loudly
                raise ValueError(
                    "MLPBlock(impl='fused') hard-codes exact-erf gelu; use "
                    "impl='xla' with a custom act"
                )
            impl = "xla"  # global default + custom act: keep the act
        if impl == "fused":
            from samrs_tpu.kernels.fused_mlp import fused_mlp

            w1, b1 = _DenseParams(self.mlp_dim, name="lin1")(d)
            w2, b2 = _DenseParams(d, name="lin2")(self.mlp_dim)
            return fused_mlp(x, w1, b1, w2, b2, dtype=self.dtype)
        x = nn.Dense(self.mlp_dim, dtype=self.dtype, name="lin1")(x)
        x = self.act(x)
        return nn.Dense(d, dtype=self.dtype, name="lin2")(x)


class MLP(nn.Module):
    """num_layers Dense stack with ReLU between; optional sigmoid output.

    Reference: mask_decoder.py:179-201 (hypernetwork / IoU-head MLP).
    """

    hidden_dim: int
    output_dim: int
    num_layers: int
    sigmoid_output: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers):
            out = self.output_dim if i == self.num_layers - 1 else self.hidden_dim
            x = nn.Dense(out, dtype=self.dtype, name=f"layers_{i}")(x)
            if i < self.num_layers - 1:
                x = nn.relu(x)
        if self.sigmoid_output:
            x = nn.sigmoid(x)
        return x


class DropPath(nn.Module):
    """Stochastic depth per sample (used by the seg backbones)."""

    rate: float = 0.0
    deterministic: Optional[bool] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: Optional[bool] = None) -> jnp.ndarray:
        det = nn.merge_param("deterministic", self.deterministic, deterministic)
        if det or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


def window_partition(x: jnp.ndarray, window_size: int) -> Tuple[jnp.ndarray, Tuple[int, int]]:
    """Split NHWC into non-overlapping windows, zero-padding H/W up.

    Returns (windows [B*nW, ws, ws, C], (Hp, Wp)).
    Reference: image_encoder.py:243-265.
    """
    B, H, W, C = x.shape
    pad_h = (-H) % window_size
    pad_w = (-W) % window_size
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    Hp, Wp = H + pad_h, W + pad_w
    x = x.reshape(B, Hp // window_size, window_size, Wp // window_size, window_size, C)
    windows = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, window_size, window_size, C)
    return windows, (Hp, Wp)


def window_unpartition(
    windows: jnp.ndarray, window_size: int, pad_hw: Tuple[int, int], hw: Tuple[int, int]
) -> jnp.ndarray:
    """Inverse of :func:`window_partition`, cropping padding off.

    Reference: image_encoder.py:267-289.
    """
    Hp, Wp = pad_hw
    H, W = hw
    B = windows.shape[0] // (Hp // window_size * Wp // window_size)
    x = windows.reshape(B, Hp // window_size, Wp // window_size, window_size, window_size, -1)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, -1)
    return x[:, :H, :W, :]


def patchify_conv(
    x: jnp.ndarray, kernel: jnp.ndarray, bias: Optional[jnp.ndarray], patch: int
) -> jnp.ndarray:
    """16x16/stride-16 patch embedding as a conv (image_encoder.py:364-395)."""
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(patch, patch), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        y = y + bias
    return y
