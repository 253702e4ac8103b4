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
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax


def _path_str(path) -> str:
    return "/".join(
        p.key if hasattr(p, "key") else str(getattr(p, "idx", p)) for p in path
    )


def vit_layer_id(path: str, num_layers: int) -> int:
    """Layer id for trunk params (layer_decay_optimizer_constructor_vit.py:7-17
    for ViT; swin/internimage use stage-level ids like the reference's
    custom_layer_decay_optimizer_constructor.py:17-61)."""
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


def layer_decay_scales(params, layer_decay: float, num_layers: int):
    """Per-leaf lr multiplier tree (rate^(L+1-layer_id))."""
    return jax.tree_util.tree_map_with_path(
        lambda path, p: layer_decay ** (num_layers + 1 - vit_layer_id(_path_str(path), num_layers)),
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
        parts.append(scale_by_tree(layer_decay_scales(params, layer_decay, num_layers)))
    parts += [optax.scale_by_learning_rate(lr_schedule)]
    return optax.chain(*parts)


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
