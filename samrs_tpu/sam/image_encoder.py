"""ViTDet-style SAM image encoder, TPU-first.

Behavioral reference: GD/segment_anything/modeling/image_encoder.py
  * 16x16 conv patch embed (:364-395)
  * learned absolute pos-embed (:65-70)
  * N transformer blocks, 14x14 window attention except the global layers (:72-86)
  * decomposed relative position bias added to attention logits (:325-361)
  * 2-conv neck to 256ch with LayerNorm2d (:88-104)

TPU-first design notes:
  * NHWC end to end; window partition is reshape/transpose (XLA-free).
  * Attention runs all windows as one big batched matmul on the MXU
    (B*num_windows, 196, C) — no per-window loops.
  * Global-attention layers (4096 tokens) can route through the Pallas
    flash-attention kernel with the decomposed rel-pos bias fused into the
    inner loop (samrs_tpu.kernels.flash_attention); default path is plain XLA
    einsum attention, numerically identical.
  * Compute dtype configurable (bf16 matmuls); softmax + rel-pos in fp32.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from samrs_tpu.nn.layers import LayerNorm2d, MLPBlock, window_partition, window_unpartition

Dtype = Any


def get_rel_pos(q_size: int, k_size: int, rel_pos: jnp.ndarray) -> jnp.ndarray:
    """Relative positional embeddings for query/key sizes, with linear resize.

    Mirrors image_encoder.py:292-322 (`get_rel_pos`): the (2*max-1, head_dim)
    table is linearly interpolated when the stored length differs, then gathered
    by relative coordinate.
    """
    max_rel_dist = 2 * max(q_size, k_size) - 1
    if rel_pos.shape[0] != max_rel_dist:
        rel_pos = jax.image.resize(
            rel_pos.astype(jnp.float32), (max_rel_dist, rel_pos.shape[1]), method="linear"
        )
    q_coords = jnp.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k_coords = jnp.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    relative = (q_coords - k_coords) + (k_size - 1) * max(q_size / k_size, 1.0)
    return rel_pos[relative.astype(jnp.int32)]


def add_decomposed_rel_pos(
    attn: jnp.ndarray,
    q: jnp.ndarray,
    rel_pos_h: jnp.ndarray,
    rel_pos_w: jnp.ndarray,
    q_hw: Tuple[int, int],
    k_hw: Tuple[int, int],
) -> jnp.ndarray:
    """Add decomposed relative-position bias to attention logits.

    attn: (B, q_h*q_w, k_h*k_w); q: (B, q_h*q_w, head_dim).
    Mirrors image_encoder.py:325-361 (einsum bhwc,hkc->bhwk).
    """
    q_h, q_w = q_hw
    k_h, k_w = k_hw
    Rh = get_rel_pos(q_h, k_h, rel_pos_h)
    Rw = get_rel_pos(q_w, k_w, rel_pos_w)
    B, _, dim = q.shape
    r_q = q.reshape(B, q_h, q_w, dim)
    rel_h = jnp.einsum("bhwc,hkc->bhwk", r_q, Rh)
    rel_w = jnp.einsum("bhwc,wkc->bhwk", r_q, Rw)
    attn = attn.reshape(B, q_h, q_w, k_h, k_w)
    attn = attn + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
    return attn.reshape(B, q_h * q_w, k_h * k_w)


class _DenseParams(nn.Module):
    """Declares nn.Dense-shaped params (kernel/bias, fp32, lecun_normal/zeros)
    WITHOUT applying them — for kernels that consume raw weights.  Named
    "qkv"/"proj" this lands on exactly the same param tree as nn.Dense, so
    checkpoints port between impls unchanged."""

    in_features: int
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.in_features, self.features), jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias else None
        )
        return kernel, bias


class _ConvParams(nn.Module):
    """nn.Conv-shaped params ((kh,kw,cin,cout) kernel + bias, fp32,
    lecun_normal/zeros) declared WITHOUT applying the conv — for paths that
    re-express the conv as an explicit matmul.  Checkpoint-compatible with
    nn.Conv."""

    kernel_shape: Tuple[int, ...]
    use_bias: bool = True

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), self.kernel_shape, jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.kernel_shape[-1],), jnp.float32)
            if self.use_bias else None
        )
        return kernel, bias


class _LNParams(nn.Module):
    """flax LayerNorm-shaped params (scale ones / bias zeros, fp32) declared
    WITHOUT applying the norm — for kernels that fuse the LN.  Named "norm2"
    this lands on nn.LayerNorm's exact param tree."""

    dim: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.dim,), jnp.float32)
        return scale, bias


class _MLPParams(nn.Module):
    """MLPBlock-shaped params (lin1/lin2 Dense trees) declared raw — for the
    fused LN+MLP+residual kernel."""

    dim: int
    mlp_dim: int

    @nn.compact
    def __call__(self):
        w1, b1 = _DenseParams(self.dim, self.mlp_dim, name="lin1")()
        w2, b2 = _DenseParams(self.mlp_dim, self.dim, name="lin2")()
        return w1, b1, w2, b2


class Attention(nn.Module):
    """Multi-head attention with optional decomposed relative positions.

    Reference: image_encoder.py:185-240.
    """

    dim: int
    num_heads: int = 8
    qkv_bias: bool = True
    use_rel_pos: bool = True
    input_size: Optional[Tuple[int, int]] = None  # (H, W) of tokens at init
    dtype: Dtype = jnp.float32
    use_flash: bool = False
    window_attn_impl: str = "pallas"
    global_attn_impl: str = "m"
    # >0 = partition-free mode ("fused2"): x arrives UNPARTITIONED (B,H,W,C)
    # and the window tiling happens inside the Pallas kernel's BlockSpecs
    window_size: int = 0
    # return the UNCROPPED padded map from the block-family window kernels
    # (consumed by the fused sublayer-tail kernel; see Block)
    return_padded: bool = False
    # sequence parallelism (global layers only; set by Block when a seq mesh
    # is configured): token rows shard over sp_axis, K/V ride the ICI ring
    sp_mesh: Optional[Any] = None
    sp_axis: str = "seq"

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 shortcut: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        B, H, W, _ = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim**-0.5

        if (self.window_size > 0 and self.use_rel_pos
                and self.window_attn_impl in ("block", "block_row", "block2",
                                              "blockq", "block_slab",
                                              "block_ijb", "block_sg")):
            # whole-layer kernel: qkv + window attention + proj in one Pallas
            # call (kernels/fused_window_layer).  Params are declared raw but
            # mirror nn.Dense's tree ({qkv,proj}/{kernel,bias}) exactly.
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros,
                (2 * self.input_size[0] - 1, head_dim), jnp.float32,
            )
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros,
                (2 * self.input_size[1] - 1, head_dim), jnp.float32,
            )
            Wqkv, bqkv = _DenseParams(
                self.dim, 3 * self.dim, self.qkv_bias, name="qkv")()
            Wproj, bproj = _DenseParams(self.dim, self.dim, True, name="proj")()
            ws = self.window_size
            if self.window_attn_impl == "block2":
                # partial-block variant with the residual add fused in-kernel
                # (x/out/shortcut skip the pad + 6-D-view layout copies)
                assert shortcut is not None
                from samrs_tpu.kernels.fused_window_layer import (
                    window_layer_attention_residual,
                )

                return window_layer_attention_residual(
                    shortcut, x, Wqkv, bqkv, Wproj, bproj,
                    get_rel_pos(ws, ws, rel_pos_h),
                    get_rel_pos(ws, ws, rel_pos_w),
                    ws, scale, self.num_heads, dtype=self.dtype,
                    force_xla=self.is_initializing(),
                )
            from samrs_tpu.kernels.fused_window_layer import window_layer_attention

            return window_layer_attention(
                x, Wqkv, bqkv, Wproj, bproj,
                get_rel_pos(ws, ws, rel_pos_h), get_rel_pos(ws, ws, rel_pos_w),
                ws, scale, self.num_heads, dtype=self.dtype,
                force_xla=self.is_initializing(),
                variant={"block": None, "block_row": "row",
                         "blockq": "qkv_out", "block_slab": "slab",
                         "block_ijb": "ijb",
                         "block_sg": "slab_ijb"}[self.window_attn_impl],
                return_padded=self.return_padded
                and self.window_attn_impl not in ("block_row", "blockq"),
            )

        # 2-D input to the qkv projection: XLA emits the plain row-major dot
        # layout, so the (B, N, 3C) view below is a bitcast — without this the
        # conv-style lowering picks a {2,0,1} layout and a 13 ms/step copy
        # appears in front of the Pallas fused-attention call (B=4 ViT-H trace)
        qkv_mod = nn.Dense(self.dim * 3, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv")
        qkv_raw = qkv_mod(x.reshape(-1, x.shape[-1])).reshape(B, H, W, 3 * self.dim)

        if self.use_rel_pos:
            assert self.input_size is not None
            rel_pos_h = self.param(
                "rel_pos_h", nn.initializers.zeros, (2 * self.input_size[0] - 1, head_dim),
                jnp.float32,
            )
            rel_pos_w = self.param(
                "rel_pos_w", nn.initializers.zeros, (2 * self.input_size[1] - 1, head_dim),
                jnp.float32,
            )
        else:
            rel_pos_h = rel_pos_w = None

        if self.window_size > 0 and self.use_rel_pos:
            # partition-free windowed attention (kernels/fused_window_block):
            # window tiles are BlockSpec slices of the qkv map, the output
            # lands unpartitioned, and qkv/proj run on the unpadded 4096
            # tokens instead of the partitioned path's 4900
            from samrs_tpu.kernels.fused_window_block import (
                window_attention_partition_free,
            )

            ws = self.window_size
            Rh = get_rel_pos(ws, ws, rel_pos_h)
            Rw = get_rel_pos(ws, ws, rel_pos_w)
            # pad positions must carry the qkv BIAS (reference pads x before
            # its qkv projection); qkv_mod(0) == bias row
            pad_fill = (
                qkv_mod(jnp.zeros((1, x.shape[-1]), self.dtype))[0]
                if (H % ws or W % ws) and self.qkv_bias else None
            )
            out = window_attention_partition_free(
                qkv_raw, Rh, Rw, ws, scale, self.num_heads,
                force_xla=self.is_initializing(), pad_fill=pad_fill,
            )
            return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out.astype(self.dtype))

        if (
            self.use_flash
            and self.use_rel_pos
            and not self.is_initializing()
            and self.window_attn_impl == "fused"
            and H * W <= 1024
        ):
            # windowed layers: transpose-free path — the qkv Dense output is
            # consumed as-is, heads are static lane slices inside the kernel
            # (globals fall through to the flash kernel below)
            from samrs_tpu.kernels.fused_attention import attention_qkv_fused

            Rh = get_rel_pos(H, H, rel_pos_h)
            Rw = get_rel_pos(W, W, rel_pos_w)
            out = attention_qkv_fused(
                qkv_raw.reshape(B, H * W, 3 * self.dim), Rh, Rw, (H, W), scale,
                self.num_heads,
            )
            out = out.reshape(B, H, W, self.dim)
            return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out.astype(self.dtype))

        if (
            self.use_flash
            and self.use_rel_pos
            and not self.is_initializing()
            and self.sp_mesh is None
            and self.window_attn_impl != "xla"
            and H * W >= 2048
        ):
            # global layers, transpose-free: heads are in-kernel lane slices
            # of the raw qkv tensor; output lands (B, N, C) proj-ready
            from samrs_tpu.kernels.flash_attention import flash_attention_qkv_relpos

            Rh = get_rel_pos(H, H, rel_pos_h)
            Rw = get_rel_pos(W, W, rel_pos_w)
            out = flash_attention_qkv_relpos(
                qkv_raw.reshape(B, H * W, 3 * self.dim), Rh, Rw, (H, W), scale,
                self.num_heads, variant=self.global_attn_impl,
            )
            out = out.reshape(B, H, W, self.dim)
            return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out.astype(self.dtype))

        # (B, H*W, 3, nH, hd) -> (3, B*nH, H*W, hd) [the layout-copy path]
        qkv = qkv_raw.reshape(B, H * W, 3, self.num_heads, head_dim)
        qkv = qkv.transpose(2, 0, 3, 1, 4).reshape(3, B * self.num_heads, H * W, head_dim)
        q, k, v = qkv[0], qkv[1], qkv[2]

        if self.use_flash and self.use_rel_pos and not self.is_initializing():
            Rh = get_rel_pos(H, H, rel_pos_h)
            Rw = get_rel_pos(W, W, rel_pos_w)
            if self.sp_mesh is not None:
                # sequence-parallel exact attention (kernels/ring_attention.py)
                from samrs_tpu.kernels.ring_attention import sp_flash_attention_relpos

                out = sp_flash_attention_relpos(
                    q, k, v, Rh, Rw, (H, W), scale, self.sp_mesh, self.sp_axis
                )
            elif H * W >= 2048:
                # global layers: flash attention, logits tiled per 128 queries
                from samrs_tpu.kernels.flash_attention import flash_attention_relpos

                out = flash_attention_relpos(q, k, v, Rh, Rw, (H, W), scale)
            else:
                # windowed layers: whole-window fused kernel (logits in VMEM)
                from samrs_tpu.kernels.window_attention import window_attention_relpos

                out = window_attention_relpos(
                    q, k, v, Rh, Rw, (H, W), scale,
                    force_xla=(self.window_attn_impl == "xla"),
                )
        else:
            attn = jnp.einsum(
                "bqd,bkd->bqk", q * scale, k, preferred_element_type=jnp.float32
            )
            if self.use_rel_pos:
                attn = add_decomposed_rel_pos(
                    attn, q.astype(jnp.float32), rel_pos_h, rel_pos_w, (H, W), (H, W)
                )
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum(
                "bqk,bkd->bqd", attn.astype(v.dtype), v, preferred_element_type=jnp.float32
            )

        out = out.reshape(B, self.num_heads, H, W, head_dim)
        out = out.transpose(0, 2, 3, 1, 4).reshape(B, H, W, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out.astype(self.dtype))


class Block(nn.Module):
    """Transformer block with optional window attention (image_encoder.py:119-183)."""

    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    use_rel_pos: bool = True
    window_size: int = 0  # 0 = global attention
    input_size: Optional[Tuple[int, int]] = None
    dtype: Dtype = jnp.float32
    use_flash: bool = False
    window_attn_impl: str = "pallas"
    global_attn_impl: str = "m"
    mlp_impl: str = "xla"
    tail_impl: str = "xla"  # 'fused' = crop+residual+LN2+MLP+residual kernel
    sp_mesh: Optional[Any] = None
    sp_axis: str = "seq"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shortcut = x
        # LN stats in fp32, output cast to the compute dtype: every attention
        # path immediately casts the normed map to bf16 anyway (the qkv Dense
        # or the kernel pad), so emitting bf16 here is numerically identical
        # and halves the LN's HBM write (84 MB/layer fp32 at ViT-H B=4)
        x = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        x = x.astype(self.dtype)
        H, W = x.shape[1], x.shape[2]
        # partition-free mode: the fused2 kernel windows via BlockSpecs, so
        # the token map stays (B, H, W, C) end to end (no partition copies)
        partition_free = (
            self.window_size > 0
            and self.window_attn_impl in ("fused2", "block", "block_row",
                                          "block2", "blockq", "block_slab",
                                          "block_ijb", "block_sg")
            and self.use_rel_pos
        )
        # block2: the residual add is fused INTO the window-layer kernel
        residual_in_kernel = (
            partition_free and self.window_attn_impl == "block2"
        )
        # sublayer-tail fusion: the window kernel returns its PADDED map (a
        # free view) and crop + attention-residual + LN2 + MLP + residual all
        # run in ONE Pallas call (kernels/fused_mlp.fused_tail_ln_mlp_residual)
        # — the crop slice (127 us) and residual copy_add (67 us) per layer
        # cannot fuse into either Pallas call under XLA (r4 trace)
        tail_fused = (
            partition_free
            and not residual_in_kernel
            and self.mlp_impl == "fused"
            and self.tail_impl == "fused"
            and self.window_attn_impl not in ("block_row", "blockq")
        )
        if self.window_size > 0 and not partition_free:
            x, pad_hw = window_partition(x, self.window_size)
            attn_size = (self.window_size, self.window_size)
        elif partition_free:
            attn_size = (self.window_size, self.window_size)
        else:
            attn_size = self.input_size
        x = Attention(
            dim=self.dim,
            num_heads=self.num_heads,
            qkv_bias=self.qkv_bias,
            use_rel_pos=self.use_rel_pos,
            input_size=attn_size,
            dtype=self.dtype,
            use_flash=self.use_flash,
            window_attn_impl=self.window_attn_impl,
            global_attn_impl=self.global_attn_impl,
            window_size=self.window_size if partition_free else 0,
            sp_mesh=self.sp_mesh if self.window_size == 0 else None,
            sp_axis=self.sp_axis,
            return_padded=tail_fused,
            name="attn",
        )(x, shortcut=shortcut if residual_in_kernel else None)
        if self.window_size > 0 and not partition_free:
            x = window_unpartition(x, self.window_size, pad_hw, (H, W))
        if tail_fused:
            from samrs_tpu.kernels.fused_mlp import fused_tail_ln_mlp_residual

            C = self.dim
            M = int(self.dim * self.mlp_ratio)
            g_ln, b_ln = _LNParams(C, name="norm2")()
            w1, b1, w2, b2 = _MLPParams(C, M, name="mlp")()
            return fused_tail_ln_mlp_residual(
                x, shortcut, g_ln, b_ln, w1, b1, w2, b2, dtype=self.dtype,
                eps=1e-6, force_xla=self.is_initializing(),
            )
        if not residual_in_kernel:
            x = shortcut + x
        if self.mlp_impl == "fused":
            # whole-sublayer kernel: LayerNorm + MLP + residual in one Pallas
            # call (kernels/fused_mlp.fused_ln_mlp_residual) — the LN and the
            # residual add stop costing HBM round-trips.  Params land on the
            # exact flax tree (norm2/{scale,bias}, mlp/lin{1,2}/{kernel,bias}).
            from samrs_tpu.kernels.fused_mlp import fused_ln_mlp_residual

            C = self.dim
            M = int(self.dim * self.mlp_ratio)
            g_ln, b_ln = _LNParams(C, name="norm2")()
            w1, b1, w2, b2 = _MLPParams(C, M, name="mlp")()
            return fused_ln_mlp_residual(
                x, g_ln, b_ln, w1, b1, w2, b2, dtype=self.dtype, eps=1e-6,
                force_xla=self.is_initializing(),
            )
        # same fp32-stats / compute-dtype-output trick as norm1 (the MLP
        # kernel and the Dense both cast their input to bf16 first)
        y = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        y = y.astype(self.dtype)
        y = MLPBlock(
            mlp_dim=int(self.dim * self.mlp_ratio), dtype=self.dtype,
            impl=self.mlp_impl, name="mlp",
        )(y)
        return x + y


class ImageEncoderViT(nn.Module):
    """SAM image encoder (image_encoder.py:17-117). NHWC in, NHWC out.

    Input  (B, img_size, img_size, 3) preprocessed pixels.
    Output (B, img_size/16, img_size/16, out_chans) neck features.
    """

    img_size: int = 1024
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    out_chans: int = 256
    qkv_bias: bool = True
    use_rel_pos: bool = True
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    use_abs_pos: bool = True
    dtype: Dtype = jnp.float32
    use_flash: bool = False
    window_attn_impl: str = "pallas"
    global_attn_impl: str = "m"
    mlp_impl: str = "xla"
    tail_impl: str = "xla"  # 'fused' = crop+residual+LN2+MLP+residual kernel
    patch_embed_impl: str = "matmul"  # 'matmul' (patch-flatten + dot) | 'conv'
    sp_mesh: Optional[Any] = None
    sp_axis: str = "seq"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        grid = self.img_size // self.patch_size
        if self.patch_embed_impl == "matmul":
            # non-overlapping patch conv as explicit flatten + matmul: XLA
            # lowers the 16x16/s16 conv on (B,1024,1024,3) through a slow
            # channel-minor im2col (3.4 ms/iter + a 1.6 ms input layout copy
            # at ViT-H B=4); reshape/transpose/dot is ~0.4 ms.  Param tree is
            # nn.Conv's exact (kh,kw,cin,cout) kernel — checkpoints port
            # unchanged.
            P = self.patch_size
            kern, bias = _ConvParams(
                (P, P, self.in_chans, self.embed_dim), name="patch_embed")()
            B = x.shape[0]
            xp = x.astype(self.dtype).reshape(B, grid, P, grid, P, self.in_chans)
            xp = xp.transpose(0, 1, 3, 2, 4, 5).reshape(
                B * grid * grid, P * P * self.in_chans)
            x = jax.lax.dot_general(
                xp, kern.astype(self.dtype).reshape(-1, self.embed_dim),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=self.dtype,
            ) + bias.astype(self.dtype)
            x = x.reshape(B, grid, grid, self.embed_dim)
        else:
            x = nn.Conv(
                self.embed_dim,
                kernel_size=(self.patch_size, self.patch_size),
                strides=(self.patch_size, self.patch_size),
                padding="VALID",
                dtype=self.dtype,
                name="patch_embed",
            )(x)
        if self.use_abs_pos:
            pos_embed = self.param(
                "pos_embed", nn.initializers.zeros, (1, grid, grid, self.embed_dim), jnp.float32
            )
            x = x + pos_embed.astype(x.dtype)
        for i in range(self.depth):
            x = Block(
                dim=self.embed_dim,
                num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias,
                use_rel_pos=self.use_rel_pos,
                window_size=0 if i in self.global_attn_indexes else self.window_size,
                input_size=(grid, grid),
                dtype=self.dtype,
                use_flash=self.use_flash,
                window_attn_impl=self.window_attn_impl,
                global_attn_impl=self.global_attn_impl,
                mlp_impl=self.mlp_impl,
                tail_impl=self.tail_impl,
                sp_mesh=self.sp_mesh,
                sp_axis=self.sp_axis,
                name=f"blocks_{i}",
            )(x)
        # neck: 1x1 conv -> LN2d -> 3x3 conv -> LN2d (image_encoder.py:88-104)
        x = nn.Conv(self.out_chans, (1, 1), use_bias=False, dtype=self.dtype, name="neck_conv1")(x)
        x = LayerNorm2d(name="neck_ln1")(x)
        x = nn.Conv(
            self.out_chans, (3, 3), padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype,
            name="neck_conv2",
        )(x)
        x = LayerNorm2d(name="neck_ln2")(x)
        return x
