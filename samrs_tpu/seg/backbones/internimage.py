"""InternImage-T backbone: deformable-conv-v3 hierarchical CNN.

Behavioral reference: ED/backbone/intern_image.py
  * StemLayer: two 3x3 stride-2 convs with LN+GELU (:239-277) -> stride 4
  * 4 levels (depths 4/4/18/4 for T, groups 4/8/16/32), channels 64 doubling
    per level; DownsampleLayer = 3x3 stride-2 conv + LN (:279-300)
  * InternImageLayer block: x += drop_path(gamma1 * dcn(norm1 x));
    x += drop_path(gamma2 * mlp(norm2 x)) (:336-527)
  * out_channels (3, 64, 128, 256, 512) (:639)

The DCNv3 op itself (ED/backbone/ops_dcnv3/modules/dcnv3.py:221: depthwise
3x3 + LN + GELU -> offset/mask linears, softmaxed mask, input/output proj)
runs through samrs_tpu.kernels.sampling.dcnv3 — a gather+weighted-sum whose
autodiff VJP replaces the CUDA col2im backward.  InternImage is natively
channels-last, which matches our NHWC convention exactly.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from samrs_tpu.kernels.bilinear_gather import dcnv3_pallas
from samrs_tpu.kernels.sampling import dcnv3
from samrs_tpu.nn.layers import DropPath, MLPBlock

Dtype = Any


class DCNv3Module(nn.Module):
    """Full DCNv3 block op (ops_dcnv3/modules/dcnv3.py:221-320).

    impl='pallas' routes the sampling core through the hat-weight-matmul
    Pallas kernel (kernels/bilinear_gather.py — all MXU work, no gathers);
    'xla' keeps the gather+weighted-sum oracle (kernels/sampling.py).
    """

    channels: int
    groups: int
    kernel_size: int = 3
    offset_scale: float = 1.0
    impl: str = "pallas"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C, G = self.channels, self.groups
        Gc = C // G
        K = self.kernel_size * self.kernel_size
        value = nn.Dense(C, dtype=self.dtype, name="input_proj")(x)
        # depthwise 3x3 + LN + GELU feeds the offset/mask predictors
        f = nn.Conv(
            C, (self.kernel_size, self.kernel_size), padding="SAME", feature_group_count=C,
            dtype=self.dtype, name="dw_conv",
        )(x)
        f = nn.LayerNorm(epsilon=1e-6, name="dw_norm")(f)
        f = nn.gelu(f, approximate=False)
        offset = nn.Dense(G * K * 2, dtype=jnp.float32, name="offset",
                          kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros)(f)
        mask = nn.Dense(G * K, dtype=jnp.float32, name="mask",
                        kernel_init=nn.initializers.zeros,
                        bias_init=nn.initializers.zeros)(f)
        B, H, W, _ = x.shape
        mask = nn.softmax(mask.reshape(B, H, W, G, K), axis=-1).reshape(B, H, W, G * K)
        if self.impl == "pallas" and jax.default_backend() == "tpu":
            # matmul-form sampling: bf16 stays bf16 on the MXU, fp32 accum
            out = dcnv3_pallas(
                value, offset, mask, self.kernel_size, self.kernel_size,
                1, 1, self.kernel_size // 2, self.kernel_size // 2, 1, 1,
                G, Gc, self.offset_scale,
            )
        else:
            out = dcnv3(
                value.astype(jnp.float32), offset, mask,
                self.kernel_size, self.kernel_size,
                pad_h=self.kernel_size // 2, pad_w=self.kernel_size // 2,
                groups=G, group_channels=Gc, offset_scale=self.offset_scale,
            )
        return nn.Dense(C, dtype=self.dtype, name="output_proj")(out.astype(self.dtype))


class InternImageBlock(nn.Module):
    channels: int
    groups: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    layer_scale: Optional[float] = None
    post_norm: bool = False
    dcn_impl: str = "pallas"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        def maybe_scale(name):
            if self.layer_scale is None:
                return 1.0
            return self.param(name, nn.initializers.constant(self.layer_scale),
                              (self.channels,))

        y = nn.LayerNorm(epsilon=1e-6, name="norm1")(x)
        y = DCNv3Module(self.channels, self.groups, impl=self.dcn_impl,
                        dtype=self.dtype, name="dcn")(y)
        x = x + DropPath(self.drop_path, name="dp1")(maybe_scale("gamma1") * y, not train)
        y = nn.LayerNorm(epsilon=1e-6, name="norm2")(x)
        y = MLPBlock(int(self.channels * self.mlp_ratio), dtype=self.dtype, name="mlp")(y)
        x = x + DropPath(self.drop_path, name="dp2")(maybe_scale("gamma2") * y, not train)
        return x


class InternImage(nn.Module):
    channels: int = 64
    depths: Tuple[int, ...] = (4, 4, 18, 4)
    groups: Tuple[int, ...] = (4, 8, 16, 32)
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.2
    layer_scale: Optional[float] = None
    dcn_impl: str = "pallas"
    dtype: Dtype = jnp.float32

    @property
    def out_channels(self) -> Tuple[int, ...]:
        return (3,) + tuple(self.channels * 2**i for i in range(len(self.depths)))

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Sequence[jnp.ndarray]:
        img = x
        # stem: stride 4 (intern_image.py:239-277)
        x = nn.Conv(self.channels // 2, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="stem_conv1")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="stem_norm1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Conv(self.channels, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    dtype=self.dtype, name="stem_conv2")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="stem_norm2")(x)

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        feats = []
        blk = 0
        for lvl, depth in enumerate(self.depths):
            ch = self.channels * 2**lvl
            for b in range(depth):
                x = InternImageBlock(
                    channels=ch, groups=self.groups[lvl], mlp_ratio=self.mlp_ratio,
                    drop_path=float(dpr[blk]), layer_scale=self.layer_scale,
                    dcn_impl=self.dcn_impl, dtype=self.dtype,
                    name=f"level{lvl}_block{b}",
                )(x, train)
                blk += 1
            # per-level out-norm, applied before BOTH the feature output and
            # the downsample (intern_image.py:500-527, post_norm=False path)
            x = nn.LayerNorm(epsilon=1e-6, name=f"level_norm{lvl}")(x)
            feats.append(x)
            if lvl < len(self.depths) - 1:
                # reference DownsampleLayer conv has no bias (intern_image.py:286)
                x = nn.Conv(ch * 2, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                            use_bias=False, dtype=self.dtype, name=f"downsample{lvl}")(x)
                x = nn.LayerNorm(epsilon=1e-6, name=f"downsample_norm{lvl}")(x)
        return [img] + feats


def internimage_t(dtype: Any = jnp.float32, **kw: Any) -> InternImage:
    # layer_scale=1.0 matches the reference construction (ED/models.py:89-102)
    defaults = dict(channels=64, depths=(4, 4, 18, 4), groups=(4, 8, 16, 32),
                    drop_path_rate=0.2, layer_scale=1.0)
    defaults.update(kw)
    return InternImage(dtype=dtype, **defaults)
