"""HRSC2016 prompt-type evaluation harness.

Behavioral reference: GD/main_sam_{hbox,rbox,rhbox}_mask_instance.py —
  * per-instance GT masks extracted from color-coded LandMask PNGs
    (main_sam_hbox_mask_instance.py:251-262)
  * prompt variants: center point, hbox, hbox-as-mask (a +-1000-logit canvas
    resized to the 256² low-res grid, :128-147), rotated polygon rasterized
    via cv2.fillPoly as a mask prompt (main_sam_rbox_mask_instance.py:125-164),
    rbox -> enclosing-hbox box prompt (main_sam_rhbox_mask_instance.py:163-167)
  * metrics: per-instance average mIoU AND area-weighted mIoU (:264-289)
  * COCO JSON export of GT + predictions for AP (:291-302)
  * overlay visualization (:305-339)

TPU-first: prompts for a whole image decode in one bucketed batch call.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from samrs_tpu.data.loaders import Annotation, load_hrsc
from samrs_tpu.sam.predictor import SamPredictor
from samrs_tpu.sam.transforms import ResizeLongestSide
from samrs_tpu.tools.instance_to_json import binary_to_coco_gt, binary_to_coco_pre

PROMPT_MODES = ("point", "hbox", "hbox_mask", "rbox_mask", "rhbox")


def gt_masks_from_landmask(land_mask_rgb: np.ndarray, colors: np.ndarray) -> np.ndarray:
    """Color-coded LandMask PNG + per-instance colors -> (N, H, W) binaries."""
    return np.stack(
        [np.all(land_mask_rgb == c.reshape(1, 1, 3), axis=2).astype(np.uint8) for c in colors]
    )


def box_as_mask_prompt(
    box: np.ndarray, image_hw: Tuple[int, int], img_size: int = 1024, lowres: int = 256
) -> np.ndarray:
    """Box -> +-1000 logit canvas resized/padded to the low-res prompt grid
    (main_sam_hbox_mask_instance.py:128-147)."""
    import cv2

    canvas = np.full(image_hw, -1000.0, np.float32)
    x0, y0, x1, y1 = (int(v) for v in box)
    canvas[max(y0, 0) : y1 + 1, max(x0, 0) : x1 + 1] = 1000.0
    th, tw = ResizeLongestSide.get_preprocess_shape(image_hw[0], image_hw[1], img_size)
    m = cv2.resize(canvas, (tw, th), interpolation=cv2.INTER_LINEAR)
    m = cv2.copyMakeBorder(
        m, 0, img_size - th, 0, img_size - tw, cv2.BORDER_CONSTANT, value=-1000.0
    )
    return cv2.resize(m, (lowres, lowres), interpolation=cv2.INTER_LINEAR)


def poly_as_mask_prompt(
    poly: np.ndarray, image_hw: Tuple[int, int], img_size: int = 1024, lowres: int = 256
) -> np.ndarray:
    """Rotated polygon -> fillPoly rasterized +-1000 mask prompt
    (main_sam_rbox_mask_instance.py:125-164)."""
    import cv2

    canvas = np.zeros((*image_hw, 3), np.uint8)
    cv2.fillPoly(canvas, [poly.reshape(-1, 2).astype(np.int32)], (255, 255, 255))
    logit = np.where(canvas[..., 0] > 0, 1000.0, -1000.0).astype(np.float32)
    th, tw = ResizeLongestSide.get_preprocess_shape(image_hw[0], image_hw[1], img_size)
    m = cv2.resize(logit, (tw, th), interpolation=cv2.INTER_LINEAR)
    m = cv2.copyMakeBorder(
        m, 0, img_size - th, 0, img_size - tw, cv2.BORDER_CONSTANT, value=-1000.0
    )
    return cv2.resize(m, (lowres, lowres), interpolation=cv2.INTER_LINEAR)


def predict_instances(
    predictor: SamPredictor, image: np.ndarray, ann: Annotation, prompt: str
) -> Tuple[np.ndarray, np.ndarray]:
    """One image -> ((N, H, W) uint8 masks, (N,) iou scores)."""
    import jax.numpy as jnp

    hw = image.shape[:2]
    predictor.set_image(image)
    n = ann.num_instances

    if prompt == "point":
        # ALL instances decode in one bucket-padded jit call (the box path's
        # batching, applied to points; the reference loops predictor.predict)
        m, s = predictor.predict_points(ann.points[:n], multimask_output=False)[:2]
        return m[:, 0].astype(np.uint8), s[:, 0]

    if prompt in ("hbox", "rhbox"):
        if prompt == "rhbox":
            from samrs_tpu.geometry.obb import poly_to_hbb

            boxes = poly_to_hbb(ann.polys.reshape(-1, 8))
        else:
            boxes = ann.hboxes
        m, s, _ = predictor.predict_boxes(boxes, multimask_output=False)
        return m[:, 0].astype(np.uint8), s[:, 0]

    if prompt in ("hbox_mask", "rbox_mask"):
        # mask-only prompts: ZERO sparse tokens, exactly the reference's
        # empty sparse-embedding path (prompt_encoder.py:155-160) — a
        # not-a-point pad token would change the decoder's token attention.
        # All canvases rasterize on host, then ONE bucket-padded decode.
        lowres = predictor.cfg.grid_size * 4
        if prompt == "hbox_mask":
            mps = [box_as_mask_prompt(ann.hboxes[i], hw, predictor.cfg.image_size, lowres)
                   for i in range(n)]
        else:
            mps = [poly_as_mask_prompt(ann.polys[i], hw, predictor.cfg.image_size, lowres)
                   for i in range(n)]
        m, s = predictor.predict_mask_prompts(np.stack(mps), multimask_output=False)[:2]
        return m[:, 0].astype(np.uint8), s[:, 0]

    raise KeyError(f"unknown prompt mode {prompt!r}; have {PROMPT_MODES}")


def miou_metrics(
    pred_masks: Sequence[np.ndarray], gt_masks: Sequence[np.ndarray]
) -> Dict[str, float]:
    """Per-instance average + area-weighted mIoU (:264-289)."""
    ious, inters, unions = [], [], []
    for preds, gts in zip(pred_masks, gt_masks):
        for p, g in zip(preds, gts):
            inter = float(np.sum(p.astype(bool) & g.astype(bool)))
            union = float(np.sum(p.astype(bool) | g.astype(bool)))
            if union > 0:
                ious.append(inter / union)
                inters.append(inter)
                unions.append(union)
    return {
        "miou_avg": float(np.mean(ious)) if ious else 0.0,
        "miou_area": float(np.sum(inters) / np.sum(unions)) if unions else 0.0,
        "num_instances": len(ious),
    }


def run_prompt_eval(
    predictor: SamPredictor,
    image_dir: str,
    ann_dir: str,
    landmask_dir: str,
    names: Sequence[str],
    prompt: str = "hbox",
    json_dir: Optional[str] = None,
    vis_dir: Optional[str] = None,
) -> Dict[str, float]:
    """Driver body: evaluate `prompt` over the named HRSC images."""
    from PIL import Image

    all_pred, all_gt, all_scores, used = [], [], [], []
    for name in names:
        ann = load_hrsc(name, ann_dir)
        if ann.error and ann.num_instances == 0:
            continue
        img_path = None
        for ext in (".bmp", ".png", ".jpg"):
            p = os.path.join(image_dir, name + ext)
            if os.path.exists(p):
                img_path = p
                break
        if img_path is None:
            continue
        image = np.asarray(Image.open(img_path).convert("RGB"))
        land = np.asarray(Image.open(os.path.join(landmask_dir, name + ".png")).convert("RGB"))
        gt = gt_masks_from_landmask(land, ann.colors)
        pred, scores = predict_instances(predictor, image, ann, prompt)
        if vis_dir:
            # per-instance overlay dump (the reference's matplotlib figures,
            # main_sam_hbox_mask_instance.py:305-339)
            from samrs_tpu.tools.visualize import overlay_instances

            os.makedirs(vis_dir, exist_ok=True)
            ov = overlay_instances(image, pred, boxes=ann.hboxes,
                                   points=ann.points)
            Image.fromarray(ov).save(
                os.path.join(vis_dir, f"out_{prompt}_prompt_{name}.png")
            )
        all_pred.append(pred)
        all_gt.append(gt)
        all_scores.append(scores)
        used.append(name)

    metrics = miou_metrics(all_pred, all_gt)
    print(f"[{prompt}] Average mIoU: {metrics['miou_avg']:.4f} "
          f"Area mIoU: {metrics['miou_area']:.4f} ({metrics['num_instances']} instances)")
    if json_dir:
        os.makedirs(json_dir, exist_ok=True)
        with open(os.path.join(json_dir, f"gt_ins_{prompt}.json"), "w") as f:
            json.dump(binary_to_coco_gt(all_gt, used), f)
        with open(os.path.join(json_dir, f"sam_ins_{prompt}.json"), "w") as f:
            json.dump(binary_to_coco_pre(all_pred, all_scores), f)
    return metrics


def main(argv: Optional[Sequence[str]] = None) -> None:
    import argparse

    from samrs_tpu.sam.build import build_sam

    p = argparse.ArgumentParser(description="HRSC SAM prompt-type evaluation")
    p.add_argument("--prompt", default="hbox", choices=PROMPT_MODES)
    p.add_argument("--sam-variant", default="vit_h")
    p.add_argument("--sam-checkpoint", default=None)
    p.add_argument("--image-dir", required=True)
    p.add_argument("--ann-dir", required=True)
    p.add_argument("--landmask-dir", required=True)
    p.add_argument("--json-dir", default=None)
    p.add_argument("--vis-dir", default=None, help="per-image overlay PNG dump")
    a = p.parse_args(argv)
    model, variables = build_sam(a.sam_variant, checkpoint=a.sam_checkpoint)
    predictor = SamPredictor(model, variables)
    names = sorted(
        os.path.splitext(f)[0] for f in os.listdir(a.ann_dir) if f.endswith(".xml")
    )
    run_prompt_eval(
        predictor, a.image_dir, a.ann_dir, a.landmask_dir, names, a.prompt,
        a.json_dir, a.vis_dir,
    )


if __name__ == "__main__":
    main()
