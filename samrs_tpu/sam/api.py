"""Reference-parity end-to-end API: `sam_forward_batched`.

Behavioral reference: GD/segment_anything/modeling/sam.py:53-131 —
`Sam.forward(batched_input, multimask_output)` takes a LIST of per-image dicts
  {'image' (3,H,W) or (H,W,3) uint8/float, 'original_size' (h,w),
   'point_coords', 'point_labels', 'boxes', 'mask_inputs'}
and returns per-image dicts {'masks', 'iou_predictions', 'low_res_logits'}.

TPU-first: images are batch-encoded in one jit call; per-image prompt decodes
reuse the predictor's bucketed executables.  Host-side convenience only — the
hot paths live in SamPredictor / the generate drivers.
"""

from __future__ import annotations

from typing import Any, Dict, List

import numpy as np

from samrs_tpu.sam.predictor import SamPredictor


def sam_forward_batched(
    predictor: SamPredictor,
    batched_input: List[Dict[str, Any]],
    multimask_output: bool = False,
) -> List[Dict[str, Any]]:
    outputs: List[Dict[str, Any]] = []
    images = []
    for rec in batched_input:
        img = np.asarray(rec["image"])
        if img.ndim == 3 and img.shape[0] == 3:  # CHW -> HWC
            img = img.transpose(1, 2, 0)
        images.append(img.astype(np.uint8))
    encoded = predictor.encode_images(images)

    for rec, enc in zip(batched_input, encoded):
        predictor.set_image_features(*enc)
        if rec.get("boxes") is not None:
            boxes = np.asarray(rec["boxes"], np.float32).reshape(-1, 4)
            masks, iou, low_res = predictor.predict_boxes(
                boxes, multimask_output=multimask_output
            )
        else:
            pc = rec.get("point_coords")
            pl = rec.get("point_labels")
            mi = rec.get("mask_inputs")
            masks, iou, low_res = predictor.predict(
                point_coords=None if pc is None else np.asarray(pc, np.float32).reshape(-1, 2),
                point_labels=None if pl is None else np.asarray(pl, np.int32).reshape(-1),
                mask_input=None if mi is None else np.asarray(mi, np.float32),
                multimask_output=multimask_output,
            )
            masks = masks[None] if masks.ndim == 3 else masks
            iou = iou[None] if iou.ndim == 1 else iou
            low_res = low_res[None] if low_res.ndim == 3 else low_res
        outputs.append(
            {"masks": masks, "iou_predictions": iou, "low_res_logits": low_res}
        )
    predictor.reset_image()
    return outputs
