"""ViT-Adapter-B backbone: plain ViT + spatial prior + deformable interactions.

Behavioral reference: ED/backbone/vit_adapter.py
  * vendored-TIMM ViT core (:522) with abs pos-embed (cls slot dropped,
    bicubic-resized, :700-706), layer-scale gammas in every block
    (layer_scale=True default, :482-529)
  * SpatialPriorModule conv pyramid -> c1(s4)/c2(s8)/c3(s16)/c4(s32) projected
    to embed dim (:246-320); level_embed added to c2/c3/c4 (:713-717)
  * Injector (multi-scale conv features -> ViT tokens, gamma-scaled) and
    Extractor (ViT tokens -> conv features + ConvFFN with one SHARED depthwise
    conv across levels, :60-100) via MSDeformAttn; InteractionBlock x4 over
    the 12 ViT blocks (:166-244); the LAST interaction appends 2 extra
    extractors (use_extra_extractor=True, :668-676)
  * add_vit_feature: each interaction's ViT map is added to the matching
    scale (x1 up4 / x2 up2 / x3 / x4 down2), NOT the final map everywhere
    (:747-752)
  * final norms are (Sync)BatchNorm, not LayerNorm (:671-674)
  * out_channels (3, 768, 768, 768, 768); built as ED/models.py:105-122
    (deform_num_heads 12, deform_ratio 0.5, cffn_ratio 0.25, dpr 0.3)

The MSDeformAttn module mirrors ops/modules/ms_deform_attn.py:28 (value proj,
per-query offset/weight linears with the rotated-grid bias init, softmax over
levels*points) on top of the TPU gather op samrs_tpu.kernels.sampling.
"""

from __future__ import annotations

import math
import os
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from samrs_tpu.kernels.bilinear_gather import (ms_deform_attn_hybrid,
                                               ms_deform_attn_pallas)
from samrs_tpu.kernels.sampling import ms_deform_attn
from samrs_tpu.nn.layers import ConvTranspose2x, DropPath, MLPBlock
from samrs_tpu.seg.backbones.vit import PlainAttention

Dtype = Any


def _grid_init(n_heads: int, n_levels: int, n_points: int) -> np.ndarray:
    """Rotated-unit-grid bias init for sampling offsets
    (ms_deform_attn.py _reset_parameters)."""
    thetas = np.arange(n_heads) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (nH, 2)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1
    return grid.reshape(-1).astype(np.float32)


class MSDeformAttnModule(nn.Module):
    d_model: int = 768
    n_levels: int = 3
    n_heads: int = 8
    n_points: int = 4
    ratio: float = 1.0  # value-dim reduction ratio (vit_adapter uses 0.5)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, Q, C)
        reference_points: jnp.ndarray,  # (B, Q, L, 2) in [0, 1]
        value: jnp.ndarray,  # (B, S, C)
        spatial_shapes: Sequence[Tuple[int, int]],
    ) -> jnp.ndarray:
        B, Q, C = query.shape
        S = value.shape[1]
        nH, L, P = self.n_heads, self.n_levels, self.n_points
        vdim = int(C * self.ratio)
        hd = vdim // nH

        v = nn.Dense(vdim, dtype=self.dtype, name="value_proj")(value)
        v = v.reshape(B, S, nH, hd)
        offsets = nn.Dense(
            nH * L * P * 2, dtype=jnp.float32, name="sampling_offsets",
            kernel_init=nn.initializers.zeros,
            bias_init=lambda *a: jnp.asarray(_grid_init(nH, L, P)),
        )(query).reshape(B, Q, nH, L, P, 2)
        weights = nn.Dense(
            nH * L * P, dtype=jnp.float32, name="attention_weights",
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
        )(query).reshape(B, Q, nH, L * P)
        weights = nn.softmax(weights, axis=-1).reshape(B, Q, nH, L, P)

        wh = jnp.asarray([[w, h] for h, w in spatial_shapes], jnp.float32)  # (L, 2) xy
        locations = (
            reference_points[:, :, None, :, None, :]
            + offsets / wh[None, None, None, :, None, :]
        )
        impl = os.environ.get("SAMRS_MSDA_IMPL", "pallas")
        if jax.default_backend() != "tpu" or impl == "xla":
            out = ms_deform_attn(v.astype(jnp.float32), spatial_shapes, locations, weights)
        elif impl.startswith("hybrid"):
            # per-level split: big maps (>= the row threshold) on a gather
            # forward, small maps on the hat-matmul kernels — the kernels'
            # O(H_l)-rows-per-sample matmuls stop paying at Mask2Former's
            # 1024^2 stride-8 level (A/B escape hatch;
            # SAMRS_MSDA_IMPL=hybrid[:rows[:ghb]] — ghb = gather fwd +
            # transposed-hat Pallas bwd instead of XLA scatter-add bwd)
            parts = impl.split(":")
            rows = int(parts[1]) if len(parts) > 1 and parts[1] else 128
            big = parts[2] if len(parts) > 2 else "xla"
            out = ms_deform_attn_hybrid(v, spatial_shapes, locations, weights,
                                        min_rows_xla=rows, big_impl=big)
        else:
            # hat-matmul Pallas core (kernels/bilinear_gather.py); bf16 stays
            # bf16 on the MXU, fp32 accumulation
            out = ms_deform_attn_pallas(v, spatial_shapes, locations, weights)
        # Under nn.remat with policy=save_only_these_names("msda_sampled")
        # this pins the sampled output so the backward recompute DCEs the
        # expensive sampling kernels and re-runs only the cheap
        # value/offset/weight projections (everything between module input
        # and the sampler is Dense/softmax/linear reshapes).
        out = checkpoint_name(out, "msda_sampled")
        return nn.Dense(self.d_model, dtype=self.dtype, name="output_proj")(
            out.astype(self.dtype)
        )


def _ref_points(spatial_shapes, dtype=jnp.float32) -> jnp.ndarray:
    """Normalized center points of every location across levels -> (1, S, 2)."""
    pts = []
    for h, w in spatial_shapes:
        ys = (jnp.arange(h, dtype=dtype) + 0.5) / h
        xs = (jnp.arange(w, dtype=dtype) + 0.5) / w
        gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
        pts.append(jnp.stack([gx, gy], -1).reshape(-1, 2))
    return jnp.concatenate(pts, axis=0)[None]


class SpatialPriorModule(nn.Module):
    """Conv pyramid prior (vit_adapter.py:246-320)."""

    inplanes: int = 64
    embed_dim: int = 768
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        def conv_bn_relu(x, ch, stride, name):
            x = nn.Conv(ch, (3, 3), strides=(stride, stride), padding=((1, 1), (1, 1)),
                        use_bias=False, dtype=self.dtype, name=name)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=name + "_bn")(x)
            return nn.relu(x)

        # stem: 3 convs + 3x3/s2 maxpool -> stride 4
        s = conv_bn_relu(x, self.inplanes, 2, "stem1")
        s = conv_bn_relu(s, self.inplanes, 1, "stem2")
        s = conv_bn_relu(s, self.inplanes, 1, "stem3")
        s = nn.max_pool(s, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        c1 = s
        c2 = conv_bn_relu(c1, 2 * self.inplanes, 2, "conv2")
        c3 = conv_bn_relu(c2, 4 * self.inplanes, 2, "conv3")
        c4 = conv_bn_relu(c3, 4 * self.inplanes, 2, "conv4")
        fc = lambda t, name: nn.Conv(self.embed_dim, (1, 1), dtype=self.dtype, name=name)(t)
        return fc(c1, "fc1"), fc(c2, "fc2"), fc(c3, "fc3"), fc(c4, "fc4")


class ConvFFN(nn.Module):
    """FFN with ONE shared 3x3 depthwise conv applied to every level of the
    multi-scale token stack (vit_adapter.py:60-100, DWConv)."""

    hidden: int
    spatial_shapes: Sequence[Tuple[int, int]]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, S, C = x.shape
        y = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        dw = nn.Conv(self.hidden, (3, 3), padding=((1, 1), (1, 1)),
                     feature_group_count=self.hidden, dtype=self.dtype, name="dwconv")
        parts = []
        start = 0
        for h, w in self.spatial_shapes:
            seg = y[:, start : start + h * w].reshape(B, h, w, self.hidden)
            parts.append(dw(seg).reshape(B, h * w, self.hidden))
            start += h * w
        y = jnp.concatenate(parts, axis=1)
        y = nn.gelu(y, approximate=False)
        return nn.Dense(C, dtype=self.dtype, name="fc2")(y)


class Extractor(nn.Module):
    """ViT tokens -> conv features cross-attention + ConvFFN
    (vit_adapter.py:101-137)."""

    d_model: int
    num_heads: int
    n_points: int
    deform_ratio: float
    cffn_ratio: float
    spatial_shapes_c: Sequence[Tuple[int, int]]
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, c, ref_c, t, shapes_x):
        ext = MSDeformAttnModule(
            self.d_model, 1, self.num_heads, self.n_points, self.deform_ratio,
            dtype=self.dtype, name="attn",
        )(
            nn.LayerNorm(epsilon=1e-6, name="query_norm")(c),
            ref_c,
            nn.LayerNorm(epsilon=1e-6, name="feat_norm")(t),
            shapes_x,
        )
        c = c + ext
        c = c + ConvFFN(
            int(self.d_model * self.cffn_ratio), self.spatial_shapes_c,
            dtype=self.dtype, name="ffn",
        )(nn.LayerNorm(epsilon=1e-6, name="ffn_norm")(c))
        return c


class ViTAdapter(nn.Module):
    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    interaction_indexes: Tuple[Tuple[int, int], ...] = ((0, 2), (3, 5), (6, 8), (9, 11))
    deform_num_heads: int = 12
    n_points: int = 4
    deform_ratio: float = 0.5
    cffn_ratio: float = 0.25
    drop_path_rate: float = 0.3
    add_vit_feature: bool = True
    use_extra_extractor: bool = True
    dtype: Dtype = jnp.float32

    @property
    def out_channels(self) -> Tuple[int, ...]:
        return (3, self.embed_dim, self.embed_dim, self.embed_dim, self.embed_dim)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Sequence[jnp.ndarray]:
        img = x
        B = x.shape[0]
        D = self.embed_dim

        # spatial prior + level embeddings (vit_adapter.py:713-717)
        c1, c2, c3, c4 = SpatialPriorModule(64, D, dtype=self.dtype, name="spm")(x, train)
        level_embed = self.param("level_embed", nn.initializers.normal(1.0), (3, D))
        shapes_c = [c2.shape[1:3], c3.shape[1:3], c4.shape[1:3]]
        c = jnp.concatenate(
            [
                c2.reshape(B, -1, D) + level_embed[0],
                c3.reshape(B, -1, D) + level_embed[1],
                c4.reshape(B, -1, D) + level_embed[2],
            ],
            axis=1,
        )

        # ViT patch embed
        t = nn.Conv(D, (self.patch_size, self.patch_size),
                    strides=(self.patch_size, self.patch_size), padding="VALID",
                    dtype=self.dtype, name="patch_embed")(x)
        Hp, Wp = t.shape[1], t.shape[2]
        gp = self.img_size // self.patch_size
        pos = self.param("pos_embed", nn.initializers.normal(0.02), (1, gp * gp, D))
        pos2d = pos.reshape(1, gp, gp, D)
        if (gp, gp) != (Hp, Wp):
            pos2d = jax.image.resize(pos2d, (1, Hp, Wp, D), "bicubic")
        t = t + pos2d.astype(t.dtype)
        shapes_x = [(Hp, Wp)]

        ref_x = jnp.broadcast_to(_ref_points(shapes_x), (B, Hp * Wp, 2))[:, :, None, :]
        ref_x3 = jnp.broadcast_to(ref_x, (B, Hp * Wp, 3, 2))
        ref_c = jnp.broadcast_to(_ref_points(shapes_c), (B, c.shape[1], 2))[:, :, None, :]

        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        t = t.reshape(B, Hp * Wp, D)
        vit_outs: List[jnp.ndarray] = []
        n_inter = len(self.interaction_indexes)
        for ib, (lo, hi) in enumerate(self.interaction_indexes):
            # Injector: conv features -> ViT tokens (gamma-scaled, init 0)
            gamma = self.param(f"injector{ib}_gamma", nn.initializers.zeros, (D,))
            inj = MSDeformAttnModule(
                D, 3, self.deform_num_heads, self.n_points, self.deform_ratio,
                dtype=self.dtype, name=f"injector{ib}",
            )(
                nn.LayerNorm(epsilon=1e-6, name=f"injector{ib}_qnorm")(t),
                ref_x3,
                nn.LayerNorm(epsilon=1e-6, name=f"injector{ib}_vnorm")(c),
                shapes_c,
            )
            t = t + gamma * inj
            # ViT blocks of this group (vendored-TIMM Block with layer scale)
            t2d = t.reshape(B, Hp, Wp, D)
            for i in range(lo, hi + 1):
                g1 = self.param(f"blocks_{i}_gamma1", nn.initializers.ones, (D,))
                g2 = self.param(f"blocks_{i}_gamma2", nn.initializers.ones, (D,))
                y = nn.LayerNorm(epsilon=1e-6, name=f"blocks_{i}_norm1")(t2d)
                y = PlainAttention(D, self.num_heads, dtype=self.dtype,
                                   name=f"blocks_{i}_attn")(y)
                t2d = t2d + DropPath(float(dpr[i]), name=f"blocks_{i}_dp1")(g1 * y, not train)
                y = nn.LayerNorm(epsilon=1e-6, name=f"blocks_{i}_norm2")(t2d)
                y = MLPBlock(int(D * self.mlp_ratio), dtype=self.dtype,
                             name=f"blocks_{i}_mlp")(y)
                t2d = t2d + DropPath(float(dpr[i]), name=f"blocks_{i}_dp2")(g2 * y, not train)
            t = t2d.reshape(B, Hp * Wp, D)
            vit_outs.append(t2d)
            # Extractor: ViT tokens -> conv features (+ ConvFFN)
            c = Extractor(D, self.deform_num_heads, self.n_points, self.deform_ratio,
                          self.cffn_ratio, shapes_c, dtype=self.dtype,
                          name=f"extractor{ib}")(c, ref_c, t, shapes_x)
            if ib == n_inter - 1 and self.use_extra_extractor:
                for j in range(2):
                    c = Extractor(D, self.deform_num_heads, self.n_points,
                                  self.deform_ratio, self.cffn_ratio, shapes_c,
                                  dtype=self.dtype, name=f"extra_extractor{j}",
                                  )(c, ref_c, t, shapes_x)

        # split + reshape the conv branch
        (h2, w2), (h3, w3), (h4, w4) = shapes_c
        n2, n3 = h2 * w2, h3 * w3
        f2 = c[:, :n2].reshape(B, h2, w2, D)
        f3 = c[:, n2 : n2 + n3].reshape(B, h3, w3, D)
        f4 = c[:, n2 + n3 :].reshape(B, h4, w4, D)
        f1 = c1 + ConvTranspose2x(D, dtype=self.dtype, name="up")(f2)
        if self.add_vit_feature:
            # each interaction's ViT map feeds the matching scale (:747-752);
            # with a non-standard interaction count (tiny test configs) the
            # final map feeds every scale
            if len(vit_outs) == 4:
                x1, x2, x3, x4 = [v.astype(jnp.float32) for v in vit_outs]
            else:
                x1 = x2 = x3 = x4 = vit_outs[-1].astype(jnp.float32)
            # antialias=False: F.interpolate(align_corners=False) never
            # low-pass filters, even on the 0.5x downscale to c4 (:747-752)
            rs = lambda v, ref: jax.image.resize(v, ref.shape, "bilinear",
                                                 antialias=False).astype(ref.dtype)
            f1 = f1 + rs(x1, f1)
            f2 = f2 + rs(x2, f2)
            f3 = f3 + x3.astype(f3.dtype)
            f4 = f4 + rs(x4, f4)
        # final norms are BatchNorm in the reference (SyncBN -> global-batch BN)
        bn = lambda name: nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                       epsilon=1e-5, name=name)
        f1 = bn("norm1")(f1)
        f2 = bn("norm2")(f2)
        f3 = bn("norm3")(f3)
        f4 = bn("norm4")(f4)
        return [img, f1, f2, f3, f4]


def vit_adapter_b(image_size: int = 224, dtype: Any = jnp.float32, **kw: Any) -> ViTAdapter:
    defaults = dict(patch_size=16, embed_dim=768, depth=12, num_heads=12,
                    deform_num_heads=12, n_points=4, deform_ratio=0.5,
                    cffn_ratio=0.25, drop_path_rate=0.3)
    defaults.update(kw)
    return ViTAdapter(img_size=image_size, dtype=dtype, **defaults)
