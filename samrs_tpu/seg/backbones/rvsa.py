"""ViT + Rotated Varied-Size Window Attention (the paper's flagship backbone).

Behavioral reference: ED/backbone/vit_win_rvsa_v3_wsz7.py
  * RotatedVariedSizeWindowAttention (:195-477): per-window learnable
    offset/scale/angle nets over avg-pooled features; the window's sampling
    grid is scaled, rotated about the window center, offset, and K/V are
    resampled there via grid_sample (align_corners=True, zero padding);
    windowed QK^T gets decomposed rel-pos (`calc_rel_pos_spatial`) plus a
    Swin-style learned relative bias table.
  * full attention every `interval`=3 layers, 7x7 RVSA windows otherwise
    (:625-631); 4 feature taps (out_indices) -> 4-branch FPN neck (:640-668).

TPU-first notes: all windows/heads sample in ONE grid_sample batch
(B*heads, H, W, hd) -> gathers vectorize on the VPU; attention runs as one
batched matmul over (B*nWin, heads, ws^2, ws^2) on the MXU.  The reference's
quirks are preserved where weights could be ported (offset normalization uses
the UNPADDED h//ws for x and w//ws for y, :360-362; symmetric padding).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from samrs_tpu.kernels.bilinear_gather import grid_sample_pallas
from samrs_tpu.kernels.sampling import grid_sample
from samrs_tpu.sam.image_encoder import get_rel_pos
from samrs_tpu.seg.backbones.vit_common import FullAttentionRelPos, ViTBlock, ViTFPNNeck

Dtype = Any


def _swin_rel_index(ws: int) -> np.ndarray:
    """Swin-style pairwise relative-position index over a ws x ws window."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


class RotatedVariedSizeWindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int = 7
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        B, H, W, C = x.shape
        ws = self.window_size
        nH = self.num_heads
        hd = self.dim // nH
        scale = hd**-0.5

        # symmetric padding to a multiple of ws (:305-312)
        pad_td = (-H) % ws
        pad_lr = (-W) % ws
        pt, pb = pad_td // 2, pad_td - pad_td // 2
        pl, pr = pad_lr // 2, pad_lr - pad_lr // 2
        eh, ew = H + pad_td, W + pad_lr
        nwh, nww = eh // ws, ew // ws

        x_pad = jnp.pad(x, ((0, 0), (pt, pb), (pl, pr), (0, 0)))

        # --- sampling-parameter nets: avgpool(ws) -> leaky_relu -> 1x1 conv ---
        pooled = nn.avg_pool(x_pad, (ws, ws), strides=(ws, ws))  # (B, nwh, nww, C)
        act = nn.leaky_relu(pooled)
        offsets = nn.Conv(nH * 2, (1, 1), name="sampling_offsets",
                          kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros)(act)
        scales = nn.Conv(nH * 2, (1, 1), name="sampling_scales",
                         kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.zeros)(act)
        angles = nn.Conv(nH * 1, (1, 1), name="sampling_angles",
                         kernel_init=nn.initializers.zeros,
                         bias_init=nn.initializers.zeros)(act)
        # (B, nwh, nww, nH, k) -> (B*nH, nwh, nww, k)
        def heads_first(t, k):
            t = t.reshape(B, nwh, nww, nH, k).transpose(0, 3, 1, 2, 4)
            return t.reshape(B * nH, nwh, nww, k).astype(jnp.float32)

        offsets = heads_first(offsets, 2)
        # reference normalization quirk: x by h//ws, y by w//ws (:360-362)
        offsets = offsets / jnp.asarray([max(H // ws, 1), max(W // ws, 1)], jnp.float32)
        scales = heads_first(scales, 2)
        angles = heads_first(angles, 1)[..., 0]  # (B*nH, nwh, nww)

        # --- sampling grid (normalized [-1,1], align_corners=True) (:316-345) ---
        ref_y = jnp.linspace(-1.0, 1.0, eh)
        ref_x = jnp.linspace(-1.0, 1.0, ew)
        win_cy = ref_y.reshape(nwh, ws).mean(axis=1)  # window centers
        win_cx = ref_x.reshape(nww, ws).mean(axis=1)
        base_h = jnp.arange(ws) * 2.0 * ws / ws / max(eh - 1, 1)
        base_h = base_h - base_h.mean()
        base_w = jnp.arange(ws) * 2.0 * ws / ws / max(ew - 1, 1)
        base_w = base_w - base_w.mean()
        # per-window tap coords before transform: (nwh, ws, nww, ws)
        by = jnp.broadcast_to(base_h[None, :, None, None], (nwh, ws, nww, ws))
        bx = jnp.broadcast_to(base_w[None, None, None, :], (nwh, ws, nww, ws))

        sx = 1.0 + scales[..., 0][:, :, None, :, None]  # (B*nH, nwh, 1, nww, 1)
        sy = 1.0 + scales[..., 1][:, :, None, :, None]
        cx = bx[None] * sx
        cy = by[None] * sy
        ca = angles[:, :, None, :, None]
        rx = -cy * jnp.sin(ca) + cx * jnp.cos(ca)
        ry = cy * jnp.cos(ca) + cx * jnp.sin(ca)
        fx = win_cx[None, None, None, :, None] + rx + offsets[..., 0][:, :, None, :, None]
        fy = win_cy[None, :, None, None, None] + ry + offsets[..., 1][:, :, None, :, None]
        grid = jnp.stack([fx, fy], axis=-1).reshape(B * nH, nwh * ws, nww * ws, 2)

        # --- qkv over UNPADDED x, then pad and head-split (:393-399) ---
        qkv = nn.Dense(3 * self.dim, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, H, W, 3, nH, hd).transpose(3, 0, 4, 1, 2, 5)
        qkv = qkv.reshape(3, B * nH, H, W, hd)
        qkv = jnp.pad(qkv, ((0, 0), (0, 0), (pt, pb), (pl, pr), (0, 0)))
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B*nH, eh, ew, hd)

        if jax.default_backend() == "tpu":
            # hat-matmul Pallas core (kernels/bilinear_gather.py): bilinear
            # sampling as MXU matmuls; bf16 K/V stay bf16, fp32 accumulation
            k_sel = grid_sample_pallas(k, grid, align_corners=True)
            v_sel = grid_sample_pallas(v, grid, align_corners=True)
        else:
            k_sel = grid_sample(k.astype(jnp.float32), grid, align_corners=True)
            v_sel = grid_sample(v.astype(jnp.float32), grid, align_corners=True)

        def to_windows(t):  # (B*nH, eh, ew, hd) -> (B*nwh*nww, nH, ws*ws, hd)
            t = t.reshape(B, nH, nwh, ws, nww, ws, hd)
            t = t.transpose(0, 2, 4, 1, 3, 5, 6)
            return t.reshape(B * nwh * nww, nH, ws * ws, hd)

        qw = to_windows(q).astype(jnp.float32)
        kw = to_windows(k_sel)
        vw = to_windows(v_sel)

        attn = jnp.einsum(
            "wnqd,wnkd->wnqk", qw * scale, kw, preferred_element_type=jnp.float32
        )

        # decomposed rel-pos (calc_rel_pos_spatial, :410-412)
        rel_pos_h = self.param(
            "rel_pos_h", nn.initializers.zeros, (2 * ws - 1, hd), jnp.float32
        )
        rel_pos_w = self.param(
            "rel_pos_w", nn.initializers.zeros, (2 * ws - 1, hd), jnp.float32
        )
        Rh = get_rel_pos(ws, ws, rel_pos_h)
        Rw = get_rel_pos(ws, ws, rel_pos_w)
        r_q = qw.reshape(-1, nH, ws, ws, hd)
        rel_h = jnp.einsum("wnhxc,hkc->wnhxk", r_q, Rh)
        rel_w = jnp.einsum("wnhxc,xkc->wnhxk", r_q, Rw)
        attn = attn.reshape(-1, nH, ws, ws, ws, ws)
        attn = attn + rel_h[..., :, None] + rel_w[..., None, :]
        attn = attn.reshape(-1, nH, ws * ws, ws * ws)

        # Swin-style learned relative bias (:414-418)
        table = self.param(
            "relative_position_bias_table",
            nn.initializers.normal(0.02),
            ((2 * ws - 1) * (2 * ws - 1), nH),
        )
        idx = jnp.asarray(_swin_rel_index(ws).reshape(-1))
        bias = jnp.take(jnp.asarray(table), idx, axis=0)
        bias = bias.reshape(ws * ws, ws * ws, nH).transpose(2, 0, 1)
        attn = attn + bias[None]

        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum(
            "wnqk,wnkd->wnqd", attn, vw, preferred_element_type=jnp.float32
        )
        out = out.reshape(B, nwh, nww, nH, ws, ws, hd)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6).reshape(B, eh, ew, self.dim)
        out = out[:, pt : pt + H, pl : pl + W, :]
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out.astype(self.dtype))


class ViTRVSA(nn.Module):
    """RVSA trunk: patch embed + blocks (full attn every `interval`) + FPN.

    Returns [img, c1, c2, c3, c4]; out_channels (3, D, D, D, D)
    (vit_win_rvsa_v3_wsz7.py:587-884).
    """

    img_size: int = 224
    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    window_size: int = 7
    interval: int = 3
    out_indices: Tuple[int, ...] = (3, 5, 7, 11)
    drop_path_rate: float = 0.1
    use_abs_pos_emb: bool = True
    use_checkpoint: bool = False  # remat blocks (reference torch.utils.checkpoint,
    # vit_win_rvsa_v3_wsz7.py:799-800) — trades recompute for activation memory
    dtype: Dtype = jnp.float32

    @property
    def out_channels(self) -> Tuple[int, ...]:
        return (3, self.embed_dim, self.embed_dim, self.embed_dim, self.embed_dim)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> Sequence[jnp.ndarray]:
        img = x
        B = x.shape[0]
        x = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), padding="VALID",
            dtype=self.dtype, name="patch_embed",
        )(x)
        Hp, Wp = x.shape[1], x.shape[2]
        if self.use_abs_pos_emb:
            pos = self.param(
                "pos_embed", nn.initializers.normal(0.02),
                (1, (self.img_size // self.patch_size) ** 2, self.embed_dim),
            )
            gp = self.img_size // self.patch_size
            pos2d = pos.reshape(1, gp, gp, self.embed_dim)
            if (gp, gp) != (Hp, Wp):
                pos2d = jax.image.resize(
                    pos2d, (1, Hp, Wp, self.embed_dim), method="bicubic"
                )
            x = x + pos2d.astype(x.dtype)

        dpr = np.linspace(0, self.drop_path_rate, self.depth)
        feats = {}
        for i in range(self.depth):
            full = (i + 1) % self.interval == 0
            if full:
                # no rel-pos in the reference's full-attn class (:83-84,103)
                attn_cls, kwargs = FullAttentionRelPos, dict(
                    input_size=(Hp, Wp), use_rel_pos=False
                )
            else:
                attn_cls, kwargs = RotatedVariedSizeWindowAttention, dict(
                    window_size=self.window_size
                )
            block_cls = ViTBlock
            if self.use_checkpoint:
                block_cls = nn.remat(ViTBlock, static_argnums=(2,))
            x = block_cls(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                attention=attn_cls,
                attn_kwargs=kwargs,
                mlp_ratio=self.mlp_ratio,
                drop_path=float(dpr[i]),
                dtype=self.dtype,
                name=f"blocks_{i}",
            )(x, not train)
            if i in self.out_indices:
                feats[i] = x
        taps = [feats[i] for i in self.out_indices]
        c1, c2, c3, c4 = ViTFPNNeck(self.embed_dim, dtype=self.dtype, name="neck")(taps)
        return [img, c1, c2, c3, c4]


def vit_b_rvsa(image_size: int = 224, dtype: Any = jnp.float32, **kw: Any) -> ViTRVSA:
    """Builder matching vit_b_rvsa (vit_win_rvsa_v3_wsz7.py:819-845)."""
    defaults = dict(patch_size=16, embed_dim=768, depth=12, num_heads=12,
                    mlp_ratio=4.0, window_size=7, interval=3, out_indices=(3, 5, 7, 11),
                    drop_path_rate=0.1, use_abs_pos_emb=False)
    defaults.update(kw)
    return ViTRVSA(img_size=image_size, dtype=dtype, **defaults)


def vit_l_rvsa(image_size: int = 224, dtype: Any = jnp.float32, **kw: Any) -> ViTRVSA:
    return ViTRVSA(
        img_size=image_size, patch_size=16, embed_dim=1024, depth=24, num_heads=16,
        mlp_ratio=4.0, window_size=7, interval=3, out_indices=(7, 11, 15, 23),
        drop_path_rate=0.1, use_abs_pos_emb=False, dtype=dtype, **kw,
    )


def vit_h_rvsa(image_size: int = 224, dtype: Any = jnp.float32, **kw: Any) -> ViTRVSA:
    """Builder matching vit_h_rvsa (vit_win_rvsa_v3_wsz7.py:862-881)."""
    return ViTRVSA(
        img_size=image_size, patch_size=16, embed_dim=1280, depth=32, num_heads=16,
        mlp_ratio=4.0, window_size=7, interval=3, out_indices=(10, 15, 20, 31),
        drop_path_rate=0.1, use_abs_pos_emb=False, dtype=dtype, **kw,
    )
