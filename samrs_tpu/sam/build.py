"""SAM builders / registry.

Behavioral reference: GD/segment_anything/build_sam.py:14-107
(`sam_model_registry` with vit_h/vit_l/vit_b configs, checkpoint loading).

`build_sam` returns `(model, variables)`: the linen module plus an initialized
(or checkpoint-loaded) fp32 param pytree.  Checkpoints may be either native
Orbax/msgpack trees or original PyTorch ``sam_vit_*.pth`` files (ported on the
fly via samrs_tpu.sam.port).
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from samrs_tpu.core.config import SamConfig, sam_config
from samrs_tpu.sam.sam import Sam


def init_sam_variables(model: Sam, seed: int = 0) -> Any:
    """Random-init variables with throwaway tracing shapes (init is shape-driven)."""
    cfg = model.cfg
    # init on a small spatial extent is NOT possible: pos_embed/rel_pos shapes
    # depend on the full grid, so init with the real image size but batch 1.
    x = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    pts = jnp.zeros((1, 2, 2), jnp.float32)
    lab = jnp.zeros((1, 2), jnp.int32)
    return model.init(jax.random.PRNGKey(seed), x, pts, lab, method=Sam.init_all)


def build_sam(
    variant: str = "vit_h",
    checkpoint: Optional[str] = None,
    seed: int = 0,
    **overrides: Any,
) -> Tuple[Sam, Any]:
    cfg = sam_config(variant, **overrides)
    model = Sam(cfg)
    if checkpoint is not None:
        if checkpoint.endswith((".pth", ".pt")):
            from samrs_tpu.sam.port import load_torch_sam_checkpoint

            variables = load_torch_sam_checkpoint(checkpoint, cfg)
        else:
            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            abstract = jax.eval_shape(lambda: _abstract_variables(model))
            variables = ckptr.restore(checkpoint, abstract)
    else:
        variables = init_sam_variables(model, seed)
    return model, variables


def _abstract_variables(model: Sam):
    cfg = model.cfg
    x = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    pts = jnp.zeros((1, 2, 2), jnp.float32)
    lab = jnp.zeros((1, 2), jnp.int32)
    return model.init(jax.random.PRNGKey(0), x, pts, lab, method=Sam.init_all)


sam_model_registry = {
    "default": functools.partial(build_sam, "vit_h"),
    "vit_h": functools.partial(build_sam, "vit_h"),
    "vit_l": functools.partial(build_sam, "vit_l"),
    "vit_b": functools.partial(build_sam, "vit_b"),
}
