"""Optimizers: AdamW with layer-wise lr decay + no-decay masks, grad clip.

Behavioral reference:
  * ED/mmcv_custom/layer_decay_optimizer_constructor_vit.py:7-100 — per-layer
    lr scale rate^(L+1-layer_id); layer id 0 for pos_embed/patch_embed,
    i+1 for blocks.i, L+1 otherwise; NO weight decay for 1-D params, biases,
    pos_embed, rel-pos tables.
  * grad-clip 5 before the step (ED/main_pretrain.py:616).
  * LARS for linear probing (ED/utils.py:56-89).

Implemented as composable optax transforms over the flax param tree; layer ids
are parsed from the param path (works for our ViT/RVSA/Swin naming).
"""

from __future__ import annotations

import re
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


def _path_str(path) -> str:
    return "/".join(
        p.key if hasattr(p, "key") else str(getattr(p, "idx", p)) for p in path
    )


def vit_layer_id(path: str, num_layers: int) -> int:
    """Layer id for trunk params (layer_decay_optimizer_constructor_vit.py:7-17;
    the ViT-Adapter constructor's id fn is identical,
    layer_decay_optimizer_constructor_vitadapter.py:17-40).  Stage-level
    fallbacks cover swin/vitae when no depths are known."""
    if "spm" in path:
        # ViT-Adapter's spatial prior module: its internal stem is NOT the
        # trunk patch embed; the reference's else-branch gives it the max id
        return num_layers + 1
    if "pos_embed" in path or "patch_embed" in path or "stem" in path:
        return 0
    m = re.search(r"blocks_(\d+)", path)
    if m:
        return int(m.group(1)) + 1
    m = re.search(r"stage(\d+)_block(\d+)", path)  # swin
    if m:
        return int(m.group(1)) + 1
    m = re.search(r"level(\d+)_block(\d+)", path)  # internimage
    if m:
        return int(m.group(1)) + 1
    m = re.search(r"(?:rc|nc)(\d+)", path)  # vitae stages
    if m:
        return int(m.group(1)) + 1
    return num_layers + 1


def depthwise_layer_id(path: str, num_layers: int, depths: Sequence[int]) -> int:
    """Depth-aware layer id for staged backbones — every BLOCK gets its own id
    counted cumulatively across stages, downsample/stage-norm params get the
    id one past the stage's last block
    (custom_layer_decay_optimizer_constructor.py:17-63,
    `get_num_layer_for_swin` with depths e.g. [4,4,18,4] for InternImage-T)."""
    if "pos_embed" in path or "patch_embed" in path or "stem" in path \
            or "level_embed" in path:
        return 0
    m = re.search(r"(?:stage|level)(\d+)_block(\d+)", path)
    if m:
        s, b = int(m.group(1)), int(m.group(2))
        return b + 1 + sum(depths[:s])
    m = re.search(r"(?:downsample|downsample_norm|level_norm)(\d+)", path)
    if m:
        s = int(m.group(1))
        # reference caps the last stage at the stage-2 boundary id
        return 1 + sum(depths[: min(s + 1, len(depths) - 1)])
    return num_layers + 1


def layer_id_for(path: str, num_layers: int, scheme: str = "vit",
                 depths: Optional[Sequence[int]] = None) -> int:
    if scheme == "depthwise":
        assert depths is not None, "depthwise scheme needs per-stage depths"
        return depthwise_layer_id(path, num_layers, depths)
    return vit_layer_id(path, num_layers)


def no_weight_decay(path: str, param) -> bool:
    """True for params that get NO decay (1-D, bias, pos/rel-pos tables)."""
    if param.ndim <= 1:
        return True
    return any(
        k in path
        for k in ("pos_embed", "rel_pos", "relative_position_bias_table", "not_a_point")
    )


def scale_by_tree(scales) -> optax.GradientTransformation:
    """Multiply each leaf's update by its precomputed scalar."""

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        return jax.tree_util.tree_map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init_fn, update_fn)


def layer_decay_scales(params, layer_decay: float, num_layers: int,
                       scheme: str = "vit", depths: Optional[Sequence[int]] = None):
    """Per-leaf lr multiplier tree.  All three reference constructors share the
    same formula rate^(N - id - 1) with N = num_layers + 2, i.e.
    rate^(num_layers + 1 - id)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, p: layer_decay
        ** (num_layers + 1 - layer_id_for(_path_str(path), num_layers, scheme, depths)),
        params,
    )


def build_optimizer(
    params,
    lr_schedule: Callable[[jnp.ndarray], jnp.ndarray],
    weight_decay: float = 0.05,
    betas: Tuple[float, float] = (0.9, 0.999),
    grad_clip: float = 5.0,
    layer_decay: Optional[float] = None,
    num_layers: int = 12,
    optimizer: str = "adamw",
    layer_id_scheme: str = "vit",
    depths: Optional[Sequence[int]] = None,
) -> optax.GradientTransformation:
    """AdamW (or SGD/LARS) with the reference's masking + layer decay."""
    decay_mask = jax.tree_util.tree_map_with_path(
        lambda path, p: not no_weight_decay(_path_str(path), p), params
    )
    parts = [optax.clip_by_global_norm(grad_clip)]
    if optimizer == "adamw":
        parts += [
            optax.scale_by_adam(b1=betas[0], b2=betas[1]),
            optax.add_decayed_weights(weight_decay, mask=decay_mask),
        ]
    elif optimizer == "sgd":
        parts += [optax.trace(decay=0.9), optax.add_decayed_weights(weight_decay, mask=decay_mask)]
    elif optimizer == "lars":
        return optax.chain(
            optax.clip_by_global_norm(grad_clip),
            optax.lars(
                learning_rate=lr_schedule, weight_decay=weight_decay,
                weight_decay_mask=decay_mask, momentum=0.9,
            ),
        )
    else:
        raise KeyError(f"unknown optimizer {optimizer!r}")
    if layer_decay is not None and layer_decay < 1.0:
        parts.append(scale_by_tree(
            layer_decay_scales(params, layer_decay, num_layers, layer_id_scheme, depths)
        ))
    parts += [optax.scale_by_learning_rate(lr_schedule)]
    return optax.chain(*parts)


# Per-backbone optimizer defaults mirroring the reference's per-family zoo
# (ED/main_pretrain.py:329-409).  `layer_id_scheme`/`depths` select the id
# function; `num_layers` of None means "derive from the encoder module".
# resnet's lr follows the reference's blr scaling lr = 1e-3 * global_batch/96.
BACKBONE_OPTIM_DEFAULTS: Dict[str, Dict[str, Any]] = {
    "resnet50": dict(lr=None, blr=1e-3, weight_decay=0.05, layer_decay=None),
    "swin_t": dict(lr=6e-5, weight_decay=0.01, layer_decay=None),
    "vitaev2_s": dict(lr=6e-5, weight_decay=0.01, layer_decay=None),
    "vit_b": dict(lr=6e-5, weight_decay=0.05, layer_decay=0.9, scheme="vit"),
    "vit_b_rvsa": dict(lr=6e-5, weight_decay=0.05, layer_decay=0.9, scheme="vit"),
    "vit_l_rvsa": dict(lr=6e-5, weight_decay=0.05, layer_decay=0.9, scheme="vit"),
    "vit_h_rvsa": dict(lr=6e-5, weight_decay=0.05, layer_decay=0.9, scheme="vit"),
    # rate 1.0 == no actual decay, but the depth-aware ids are the reference's
    # (custom_layer_decay_optimizer_constructor paramwise_cfg: num_layers=30,
    # depths=[4,4,18,4], layer_decay_rate=1.0)
    "internimage_t": dict(lr=6e-5, weight_decay=0.05, layer_decay=1.0,
                          scheme="depthwise"),
    "vit_adapter_b": dict(lr=6e-5, weight_decay=0.01, layer_decay=0.95,
                          scheme="vit"),
}


def backbone_optim_settings(backbone: str, encoder=None,
                            global_batch: int = 96) -> Dict[str, Any]:
    """Resolved per-backbone optimizer settings.

    ``num_layers``/``depths`` are derived from the encoder module when given
    (ViT-family ``.depth``; staged backbones ``.depths``) instead of a
    hard-coded name->depth table."""
    d = dict(BACKBONE_OPTIM_DEFAULTS.get(backbone, BACKBONE_OPTIM_DEFAULTS["vit_b"]))
    if d.get("lr") is None and "blr" in d:
        d["lr"] = d.pop("blr") * global_batch / 96.0
    d.pop("blr", None)
    d.setdefault("scheme", "vit")
    depths = getattr(encoder, "depths", None) if encoder is not None else None
    if depths is not None:
        d["depths"] = tuple(depths)
        d["num_layers"] = int(sum(depths))
    else:
        d["depths"] = None
        d["num_layers"] = int(getattr(encoder, "depth", 12)) if encoder is not None else 12
    return d


def warmup_cosine_schedule(
    base_lr: float, total_steps: int, warmup_steps: int = 1500, min_lr_ratio: float = 0.0
) -> Callable:
    """Per-iteration warmup + cosine decay (ED/utils.py:92-104 /
    main_pretrain.py:656 steps the scheduler every iteration)."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=base_lr,
        warmup_steps=max(warmup_steps, 1),
        decay_steps=max(total_steps, warmup_steps + 1),
        end_value=base_lr * min_lr_ratio,
    )
