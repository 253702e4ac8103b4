"""Deployment export of the SAM decode path.

Behavioral reference: GD/segment_anything/utils/onnx.py:17-144 (`SamOnnxModel`:
a decoder-only wrapper with fixed-shape-friendly embeddings/postprocess for
onnxruntime).  The TPU-native equivalent serializes the jitted decode function
to portable StableHLO via `jax.export` — loadable from any JAX process (CPU,
GPU or TPU serving hosts) without the model code.

`SamExportModel.__call__` mirrors the ONNX wrapper's signature: cached image
embeddings + padded point/mask prompts -> (masks, iou_predictions, low_res).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from samrs_tpu.sam.sam import Sam, postprocess_masks


class SamExportModel:
    """Fixed-shape decode wrapper around a built Sam (onnx.py:17 parity)."""

    def __init__(
        self,
        model: Sam,
        variables: Any,
        num_points: int = 2,
        multimask_output: bool = False,
        return_extra_metrics: bool = False,
    ):
        self.model = model
        self.variables = variables
        self.num_points = num_points
        self.multimask_output = multimask_output
        self.cfg = model.cfg

    def decode_fn(self):
        """The pure function to export: (params, embeddings, coords, labels,
        mask_input, has_mask) -> (masks_imgsize, iou, low_res)."""
        cfg = self.cfg
        model = self.model
        multimask = self.multimask_output

        def fn(variables, image_embeddings, point_coords, point_labels, mask_input,
               has_mask_input):
            g4 = cfg.grid_size * 4
            mask_in = mask_input.reshape(-1, g4, g4, 1)
            sparse, dense_masked = model.apply(
                variables, point_coords, point_labels, mask_in,
                method=Sam.encode_prompts,
            )
            # Blend dense embeddings by has_mask (onnx.py:69-74 _embed_masks):
            # has_mask * mask_downscaling(mask_input) + (1-has_mask) * no_mask_embed.
            _, dense_nomask = model.apply(
                variables, point_coords, point_labels, None,
                method=Sam.encode_prompts,
            )
            h = has_mask_input.reshape(-1, 1, 1, 1)
            dense = h * dense_masked + (1.0 - h) * dense_nomask
            low_res, iou = model.apply(
                variables, image_embeddings, sparse, dense, multimask,
                method=Sam.decode_masks,
            )
            masks = postprocess_masks(
                low_res, (cfg.image_size, cfg.image_size),
                (cfg.image_size, cfg.image_size), cfg.image_size,
            )
            return masks, iou, low_res

        return fn

    def __call__(self, image_embeddings, point_coords, point_labels, mask_input,
                 has_mask_input):
        return jax.jit(self.decode_fn())(
            self.variables, image_embeddings, point_coords, point_labels, mask_input,
            has_mask_input,
        )

    def example_inputs(self, batch: int = 1):
        cfg = self.cfg
        g = cfg.grid_size
        return (
            jnp.zeros((1, g, g, cfg.prompt_embed_dim), jnp.float32),
            jnp.zeros((batch, self.num_points, 2), jnp.float32),
            jnp.zeros((batch, self.num_points), jnp.int32),
            jnp.zeros((batch, 4 * g, 4 * g, 1), jnp.float32),
            jnp.zeros((batch, 1, 1, 1), jnp.float32),
        )


def export_decoder(
    model: Sam,
    variables: Any,
    path: Optional[str] = None,
    num_points: int = 2,
    batch: int = 1,
    multimask_output: bool = False,
) -> bytes:
    """Serialize the decode path to StableHLO bytes (jax.export)."""
    from jax import export as jexport

    wrapper = SamExportModel(model, variables, num_points, multimask_output)
    fn = wrapper.decode_fn()
    args = (variables, *wrapper.example_inputs(batch))
    exp = jexport.export(jax.jit(fn))(*args)
    data = exp.serialize()
    if path:
        with open(path, "wb") as f:
            f.write(data)
    return data


def load_exported(data_or_path) -> Any:
    """Deserialize an exported decoder; returns `.call(variables, *inputs)`."""
    from jax import export as jexport

    if isinstance(data_or_path, (str,)):
        with open(data_or_path, "rb") as f:
            data = f.read()
    else:
        data = bytes(data_or_path)
    return jexport.deserialize(data)
