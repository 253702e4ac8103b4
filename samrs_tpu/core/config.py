"""Structured configuration system.

The reference scatters configuration across per-driver argparse blocks and hard-coded
constants (ED/main_pretrain.py:30-77, dataset roots :189-204, pretrained-weight paths
models.py:201-265).  Here every driver consumes one typed dataclass tree that can be
built from CLI ``key=value`` overrides, JSON files, or Python.
"""

from __future__ import annotations

import dataclasses
import json
import typing
from dataclasses import dataclass, field, fields, is_dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple


def field_types(cls) -> Dict[str, Any]:
    """Resolved (non-string) field annotations of a dataclass.

    `from __future__ import annotations` stringifies `dataclasses.fields(...)
    .type`, so CLI coercion must go through get_type_hints.
    """
    return typing.get_type_hints(cls)


def _coerce(value: str, typ: Any) -> Any:
    """Coerce a CLI string to the annotated field type."""
    origin = getattr(typ, "__origin__", None)
    if typ in (str, Any):
        return value
    if typ is bool:
        return value.lower() in ("1", "true", "yes", "on")
    if typ is int:
        return int(value)
    if typ is float:
        return float(value)
    if origin in (tuple, list):
        args = getattr(typ, "__args__", (str,))
        elem = args[0]
        parts = [p for p in value.split(",") if p]
        out = [_coerce(p, elem) for p in parts]
        return tuple(out) if origin is tuple else out
    if origin is not None and type(None) in getattr(typ, "__args__", ()):  # Optional[...]
        if value.lower() in ("none", "null", ""):
            return None
        inner = [a for a in typ.__args__ if a is not type(None)][0]
        return _coerce(value, inner)
    return value


@dataclass
class Config:
    """Base class: dict/JSON round-trip + dotted-path CLI overrides."""

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, default=str)

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        kwargs = {}
        ftypes = field_types(cls)
        for f in fields(cls):
            if f.name not in d:
                continue
            v = d[f.name]
            typ = ftypes.get(f.name)
            if is_dataclass(typ) and isinstance(v, dict):
                v = typ.from_dict(v)
            kwargs[f.name] = v
        return cls(**kwargs)

    def override(self, assignments: Sequence[str]) -> "Config":
        """Apply ``a.b.c=value`` CLI overrides, returning a new config."""
        cfg = dataclasses.replace(self)
        for a in assignments:
            if "=" not in a:
                raise ValueError(f"override must be key=value, got {a!r}")
            path, value = a.split("=", 1)
            keys = path.split(".")
            objs = [cfg]
            for k in keys[:-1]:
                objs.append(getattr(objs[-1], k))
            leaf_owner, leaf = objs[-1], keys[-1]
            ftypes = field_types(type(leaf_owner))
            if leaf not in ftypes:
                raise KeyError(f"unknown config field {path!r}")
            new_val = _coerce(value, ftypes[leaf])
            # rebuild from the leaf outwards so nested dataclasses stay immutable-ish
            updated = dataclasses.replace(leaf_owner, **{leaf: new_val})
            for parent, key in zip(reversed(objs[:-1]), reversed(keys[:-1])):
                updated = dataclasses.replace(parent, **{key: updated})
            cfg = updated
        return cfg


# ---------------------------------------------------------------------------
# SAM model configs (reference: GD/segment_anything/build_sam.py:14-101)
# ---------------------------------------------------------------------------


@dataclass
class SamConfig(Config):
    """Hyper-parameters of one SAM variant.

    Defaults mirror the shared hyper-parameters of ``_build_sam``
    (build_sam.py:55-101): prompt dim 256, image 1024, patch 16, window 14,
    decoder depth 2 / mlp 2048 / heads 8, iou head depth 3.
    """

    variant: str = "vit_b"
    encoder_embed_dim: int = 768
    encoder_depth: int = 12
    encoder_num_heads: int = 12
    encoder_global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    image_size: int = 1024
    patch_size: int = 16
    window_size: int = 14
    prompt_embed_dim: int = 256
    mask_in_chans: int = 16
    decoder_depth: int = 2
    decoder_mlp_dim: int = 2048
    decoder_num_heads: int = 8
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256
    num_multimask_outputs: int = 3
    mask_threshold: float = 0.0
    pixel_mean: Tuple[float, float, float] = (123.675, 116.28, 103.53)
    pixel_std: Tuple[float, float, float] = (58.395, 57.12, 57.375)
    # TPU-specific knobs (no reference analogue)
    compute_dtype: str = "bfloat16"  # encoder matmuls; decode path stays fp32
    # decoder (two-way transformer + upscaling) matmul dtype.  'float32'
    # (default) matches the reference's fp32 decode; note the TPU backend's
    # DEFAULT matmul precision multiplies f32 operands in bf16 passes, so
    # measured per-mask IoU vs a true-fp32 CPU decode is >=0.994 (random
    # weights, threshold 0) rather than bit-exact.  'bfloat16' halves the
    # decode's HBM traffic (src is prompts x 4096 x 256) — mask logits still
    # accumulate in fp32; measured per-mask IoU vs fp32 >= 0.990
    decode_dtype: str = "float32"
    use_flash_attention: bool = True  # Pallas kernel for the global-attn layers
    window_attn_impl: str = "block_ijb"  # 'block_ijb' = whole-window-layer
    # kernel with the batch-innermost grid: kills the ~51 MB pallas-operand
    # relayout copy per layer (A/B inside the full ViT-H B=4 encode,
    # 2026-08-19: 53.63 vs 53.99 ms/img 'block', bit-identical outputs).
    # 'block' (whole-window-layer Pallas
    # kernel: qkv + attention + proj in one call, weights resident in VMEM,
    # partition-free — A/B on v5e B=4 ViT-H encode: 57.3 ms/img vs 64.1
    # 'fused') | 'fused' (transpose-free, heads as static lane slices — 63.9
    # vs 88.7 'pallas', 117 'xla') | 'fused2' (partition-free qkv-consuming
    # kernel) | 'pallas' (per-head window kernel) | 'xla' | measured-negative
    # experiment variants kept for A/B: 'blockq' (qkv hoisted outside),
    # 'block_row' (one program per window row), 'block2' (in-kernel window
    # extraction + residual), 'block_slab' / 'block_ijb' / 'block_sg'
    # (rel-producer / grid-order variants).  Validated in __post_init__.
    mlp_impl: str = "fused"  # 'fused' = single-pass Pallas MLP (hidden stays
    # in VMEM, gelu evaluated once — A/B on v5e B=4 ViT-H encode: 66.3 ms/img
    # vs 72.8 'xla') | 'xla' (Dense-gelu-Dense, XLA fusion)
    tail_impl: str = "xla"  # windowed-sublayer tail: 'fused' = the block
    # window kernels return their PADDED map (free view) and crop + attention
    # residual + LN2 + MLP + residual run in one Pallas call
    # (kernels/fused_mlp.fused_tail_ln_mlp_residual — the crop slice and
    # residual copy_add can't fuse into Pallas calls under XLA, ~194 us/layer)
    # | 'xla' (crop + add outside, then the mlp_impl path).  Requires
    # mlp_impl='fused' and a block-family window_attn_impl to take effect.
    # MEASURED A WASH on the full ViT-H B=4 encode (2026-08-19): 53.90 vs
    # 53.93 ms/img, and 52.33 vs 52.40 on top of global 'm' — the removed
    # slice/copy_add ops overlap with kernel time, while the tail kernel
    # runs slightly longer than the plain MLP-sublayer kernel.  Kept for
    # larger maps / future A/Bs; default stays 'xla'.
    upscale_impl: str = "fused"  # mask-decoder upscale+hypernetwork tail:
    # 'fused' = single-pass Pallas kernel (conv taps + LN + gelus + mask dot
    # in VMEM, only the requested mask tokens) | 'xla' (tap-matmul composition)
    twoway_impl: str = "fused"  # TwoWayTransformer decode: 'fused' =
    # image-side Pallas sweeps (kernels/fused_twoway.py: one kv-projection
    # pass + one pass per layer fusing q-proj + block-diagonal all-heads i2t
    # attention + out-proj + residual + norm4 + the next t2i K/V; t2i via
    # expanded-q rows) | 'xla' (module composition).  A/B on the 64-box
    # decode jit (scratch/ab_twoway.py, 2026-08-19): 9.15 vs 10.96 ms/call,
    # per-mask IoU vs 'xla' min 0.99721 / mean 0.99821 on random weights
    # (the same order as the TPU-default-precision vs true-fp32 gap).
    global_attn_impl: str = "m"  # global-attention flash-kernel variant:
    # 'm' = split with the two rel matmuls MERGED into one 128-lane-
    # contraction matmul (one VPU add instead of two; the rel bias costs one
    # MXU chunk instead of two) and v||ones hoisted outside as 8-aligned
    # per-head segments.  A/B inside the full ViT-H B=4 encode jit
    # (2026-08-19): 52.40 vs 53.93 ms/img 'split', BIT-IDENTICAL outputs.
    # 'aug' = rel-pos folded into the qk matmul via augmented 128-aligned
    # per-head q/k segments (measured-negative: 54.00 vs 53.64) | 'split' =
    # separate in-kernel rel matmuls accumulated on the VPU (the r3 kernel)
    # | 'exp2' = base-2 softmax split (wash: 53.74 vs 53.63).

    WINDOW_ATTN_IMPLS = ("block", "fused", "fused2", "pallas", "xla",
                         "blockq", "block_row", "block2", "block_slab",
                         "block_ijb", "block_sg")
    MLP_IMPLS = ("fused", "xla")
    TAIL_IMPLS = ("fused", "xla")
    UPSCALE_IMPLS = ("fused", "xla")
    GLOBAL_ATTN_IMPLS = ("aug", "split", "exp2", "m")
    TWOWAY_IMPLS = ("fused", "xla")

    def __post_init__(self) -> None:
        # typo'd impl names would otherwise silently fall through to the
        # generic partitioned path — fail loudly instead (ADVICE r3)
        if self.window_attn_impl not in self.WINDOW_ATTN_IMPLS:
            raise ValueError(
                f"unknown window_attn_impl {self.window_attn_impl!r}; "
                f"have {self.WINDOW_ATTN_IMPLS}")
        if self.mlp_impl not in self.MLP_IMPLS:
            raise ValueError(
                f"unknown mlp_impl {self.mlp_impl!r}; have {self.MLP_IMPLS}")
        if self.tail_impl not in self.TAIL_IMPLS:
            raise ValueError(
                f"unknown tail_impl {self.tail_impl!r}; have {self.TAIL_IMPLS}")
        if self.upscale_impl not in self.UPSCALE_IMPLS:
            raise ValueError(
                f"unknown upscale_impl {self.upscale_impl!r}; "
                f"have {self.UPSCALE_IMPLS}")
        if self.global_attn_impl not in self.GLOBAL_ATTN_IMPLS:
            raise ValueError(
                f"unknown global_attn_impl {self.global_attn_impl!r}; "
                f"have {self.GLOBAL_ATTN_IMPLS}")
        if self.twoway_impl not in self.TWOWAY_IMPLS:
            raise ValueError(
                f"unknown twoway_impl {self.twoway_impl!r}; "
                f"have {self.TWOWAY_IMPLS}")

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size


SAM_VARIANTS: Dict[str, Dict[str, Any]] = {
    # build_sam.py:14-44 — embed 1280/1024/768, depth 32/24/12, heads 16/16/12
    "vit_h": dict(
        encoder_embed_dim=1280,
        encoder_depth=32,
        encoder_num_heads=16,
        encoder_global_attn_indexes=(7, 15, 23, 31),
    ),
    "vit_l": dict(
        encoder_embed_dim=1024,
        encoder_depth=24,
        encoder_num_heads=16,
        encoder_global_attn_indexes=(5, 11, 17, 23),
    ),
    "vit_b": dict(
        encoder_embed_dim=768,
        encoder_depth=12,
        encoder_num_heads=12,
        encoder_global_attn_indexes=(2, 5, 8, 11),
    ),
}


def sam_config(variant: str, **overrides: Any) -> SamConfig:
    if variant not in SAM_VARIANTS:
        raise KeyError(f"unknown SAM variant {variant!r}; have {list(SAM_VARIANTS)}")
    kw = dict(SAM_VARIANTS[variant])
    kw.update(overrides)
    return SamConfig(variant=variant, **kw)


# ---------------------------------------------------------------------------
# Training configs (reference: ED/main_pretrain.py:30-77, main_finetune.py)
# ---------------------------------------------------------------------------


@dataclass
class OptimConfig(Config):
    optimizer: str = "adamw"
    lr: float = 6e-5
    weight_decay: float = 0.05
    betas: Tuple[float, float] = (0.9, 0.999)
    layer_decay: float = 0.9  # layer-wise lr decay rate (mmcv_custom constructors)
    grad_clip: float = 5.0  # ED/main_pretrain.py:616
    warmup_iters: int = 1500
    min_lr_ratio: float = 0.0
    schedule: str = "cosine"  # per-iteration (ED/main_pretrain.py:656)


@dataclass
class DataConfig(Config):
    root: str = "/data/samrs"
    datasets: Tuple[str, ...] = ("sota", "sior", "fast")
    # subset sizes drive the proportional batch split (ED/main_pretrain.py:233-269)
    image_size: int = 224
    batch_size: int = 96  # global
    num_workers: int = 8
    val_images: int = 500  # last-500 val split (ED/datasets.py:55-56)


@dataclass
class PretrainConfig(Config):
    backbone: str = "vit_b_rvsa"
    decoder: str = "upernet"
    init: str = "none"  # none | imp | mae | beit ... pretrained-init family
    pretrained: Optional[str] = None  # torch .pth (timm/MAE) for the encoder
    total_iters: int = 80_000
    eval_interval: int = 1000
    seed: int = 2023
    data: DataConfig = field(default_factory=DataConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    ckpt_dir: str = "checkpoints/pretrain"
    resume: Optional[str] = None
    mesh_shape: Tuple[int, ...] = (-1,)  # 1-D data mesh by default
    mesh_axes: Tuple[str, ...] = ("data",)
    # Mask2Former mask-loss point sampling (mmdet uses 12544 at high res;
    # None = exact full-mask losses, fine at 224²)
    m2f_num_points: Optional[int] = None
    # rematerialize encoder activations (gradient checkpointing) to fit large
    # per-chip batches
    remat: bool = False


@dataclass
class FinetuneConfig(Config):
    dataset: str = "potsdam"  # potsdam | vaihingen | isaid
    backbone: str = "vit_b_rvsa"
    decoder: str = "upernet"
    epochs: int = 75
    image_size: int = 512  # 512/512/896 per dataset (main_finetune.py:166-229)
    batch_size: int = 8
    seed: int = 2023
    pretrained: Optional[str] = None  # SEP checkpoint
    data: DataConfig = field(default_factory=DataConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    ckpt_dir: str = "checkpoints/finetune"


@dataclass
class GenerateConfig(Config):
    """Dataset-generation driver config (GD/main_sam_*_semantic.py argparse)."""

    dataset: str = "dior"  # dota | dior | hrsc | fair1m
    sam_variant: str = "vit_h"
    sam_checkpoint: Optional[str] = None
    image_dir: str = ""
    ann_dir: str = ""
    save_dir: str = ""
    box_batch: int = 64  # reference used 20 (main_sam_hbox_semantic.py:91); TPU prefers bigger
    box_buckets: Tuple[int, ...] = (16, 64, 256, 1024)  # pad-to-bucket to bound recompiles
    shard_index: int = 0  # this process's shard of the image worklist
    shard_count: int = 1
