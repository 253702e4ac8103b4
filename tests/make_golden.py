"""Regenerate tests/goldens/predictor_tiny.npz — frozen predictor outputs.

Run manually (CPU): python tests/make_golden.py
The golden pins the END-TO-END numeric behavior of the tiny-SAM predictor
(preprocess -> encode -> prompt-encode -> decode -> postprocess) at fp32 on
CPU so refactors can be checked against a committed artifact without torch.
"""
import pathlib
import sys

import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def build():
    from samrs_tpu.sam.build import build_sam
    from samrs_tpu.sam.predictor import SamPredictor

    model, variables = build_sam(
        "vit_b", image_size=256, encoder_embed_dim=64, encoder_depth=2,
        encoder_num_heads=2, encoder_global_attn_indexes=(1,), window_size=8,
        compute_dtype="float32", use_flash_attention=False, seed=7,
    )
    pred = SamPredictor(model, variables)
    rng = np.random.default_rng(123)
    img = (rng.random((96, 128, 3)) * 255).astype(np.uint8)
    pred.set_image(img)

    boxes = np.array([[10, 10, 80, 60], [30, 20, 120, 90], [0, 0, 50, 95]], np.float32)
    bm, biou, blow = pred.predict_boxes(boxes, multimask_output=False)
    points = np.array([[40.0, 30.0], [100.0, 70.0]], np.float32)
    pm, piou, plow = pred.predict_points(points, multimask_output=True)
    return img, boxes, points, bm, biou, blow, pm, piou, plow


if __name__ == "__main__":
    img, boxes, points, bm, biou, blow, pm, piou, plow = build()
    out = pathlib.Path(__file__).parent / "goldens"
    out.mkdir(exist_ok=True)
    np.savez_compressed(
        out / "predictor_tiny.npz",
        image=img, boxes=boxes, points=points,
        box_masks=np.packbits(bm.astype(np.uint8)), box_masks_shape=np.array(bm.shape),
        box_iou=biou.astype(np.float32),
        box_low=blow.astype(np.float16),
        point_masks=np.packbits(pm.astype(np.uint8)),
        point_masks_shape=np.array(pm.shape),
        point_iou=piou.astype(np.float32),
    )
    print("wrote", out / "predictor_tiny.npz", "masks:", bm.shape, pm.shape)
