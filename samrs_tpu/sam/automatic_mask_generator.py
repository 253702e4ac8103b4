"""Automatic mask generation via grid-point prompting over crops.

Behavioral reference: GD/segment_anything/automatic_mask_generator.py:35-372 —
  * `generate` -> `_generate_masks` (crop loop + cross-crop NMS, :197-223)
  * `_process_crop` (:225-264): per-crop point grid, batched point predicts,
    within-crop NMS, uncrop
  * `_process_batch` (:266-322): multimask point decode, IoU / stability-score
    filters, threshold, boxes, RLEs — here fused into `_process_points`
  * `postprocess_small_regions` (:324-372)

TPU-first: the crop's WHOLE point grid decodes as one async device sweep
(`predictor.amg_sweep`: fixed-shape jitted chunks + on-device stacking), so
each crop size compiles one chunk executable and costs two host fetches
regardless of grid size; mask upscale/stats/bit-packing run in the fused
Pallas kernel (kernels/amg_post.py) without materializing full-res logits.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from samrs_tpu.sam.amg import (
    MaskData,
    batched_mask_to_box,
    box_nms,
    build_all_layer_point_grids,
    calculate_stability_score,
    coco_encode_rle,
    generate_crop_boxes,
    is_box_near_crop_edge,
    mask_to_rle,
    remove_small_regions,
    rle_to_mask,
    uncrop_boxes_xyxy,
    uncrop_masks,
    uncrop_points,
)
from samrs_tpu.sam.predictor import SamPredictor, unpackbits2d


class SamAutomaticMaskGenerator:
    def __init__(
        self,
        predictor: SamPredictor,
        points_per_side: Optional[int] = 32,
        points_per_batch: int = 64,
        pred_iou_thresh: float = 0.88,
        stability_score_thresh: float = 0.95,
        stability_score_offset: float = 1.0,
        box_nms_thresh: float = 0.7,
        crop_n_layers: int = 0,
        crop_nms_thresh: float = 0.7,
        crop_overlap_ratio: float = 512 / 1500,
        crop_n_points_downscale_factor: int = 1,
        point_grids: Optional[List[np.ndarray]] = None,
        min_mask_region_area: int = 0,
        output_mode: str = "binary_mask",
    ):
        assert (points_per_side is None) != (point_grids is None), (
            "Exactly one of points_per_side or point_grids must be provided."
        )
        if points_per_side is not None:
            self.point_grids = build_all_layer_point_grids(
                points_per_side, crop_n_layers, crop_n_points_downscale_factor
            )
        else:
            self.point_grids = point_grids
        assert output_mode in ("binary_mask", "uncompressed_rle", "coco_rle")
        self.predictor = predictor
        self.points_per_batch = points_per_batch
        self.pred_iou_thresh = pred_iou_thresh
        self.stability_score_thresh = stability_score_thresh
        self.stability_score_offset = stability_score_offset
        self.box_nms_thresh = box_nms_thresh
        self.crop_n_layers = crop_n_layers
        self.crop_nms_thresh = crop_nms_thresh
        self.crop_overlap_ratio = crop_overlap_ratio
        self.min_mask_region_area = min_mask_region_area
        self.output_mode = output_mode

    def generate(self, image: np.ndarray) -> List[Dict[str, Any]]:
        """(H, W, 3) uint8 -> list of mask records (automatic_mask_generator.py:137-195)."""
        mask_data = self._generate_masks(image)

        if self.min_mask_region_area > 0:
            mask_data = self.postprocess_small_regions(
                mask_data, self.min_mask_region_area,
                max(self.box_nms_thresh, self.crop_nms_thresh),
            )

        if self.output_mode == "coco_rle":
            mask_data["segmentations"] = [coco_encode_rle(r) for r in mask_data["rles"]]
        elif self.output_mode == "binary_mask":
            mask_data["segmentations"] = [rle_to_mask(r) for r in mask_data["rles"]]
        else:
            mask_data["segmentations"] = mask_data["rles"]

        anns = []
        for idx in range(len(mask_data["segmentations"])):
            anns.append(
                {
                    "segmentation": mask_data["segmentations"][idx],
                    "area": int(sum(mask_data["rles"][idx]["counts"][1::2])),
                    "bbox": _xyxy_to_xywh(mask_data["boxes"][idx]).tolist(),
                    "predicted_iou": float(mask_data["iou_preds"][idx]),
                    "point_coords": [mask_data["points"][idx].tolist()],
                    "stability_score": float(mask_data["stability_score"][idx]),
                    "crop_box": _xyxy_to_xywh(np.asarray(mask_data["crop_boxes"][idx])).tolist(),
                }
            )
        return anns

    def _generate_masks(self, image: np.ndarray) -> MaskData:
        orig_size = image.shape[:2]
        crop_boxes, layer_idxs = generate_crop_boxes(
            orig_size, self.crop_n_layers, self.crop_overlap_ratio
        )
        data = MaskData()
        for crop_box, layer_idx in zip(crop_boxes, layer_idxs):
            crop_data = self._process_crop(image, crop_box, layer_idx, orig_size)
            data.cat(crop_data)

        if len(crop_boxes) > 1 and len(data["boxes"]):
            # prefer masks from smaller crops (automatic_mask_generator.py:214-222)
            scores = 1.0 / np.array([box_area(b) for b in data["crop_boxes"]])
            keep = box_nms(data["boxes"].astype(np.float32), scores, self.crop_nms_thresh)
            data.filter(keep)
        return data

    def _process_crop(
        self, image: np.ndarray, crop_box: List[int], crop_layer_idx: int, orig_size
    ) -> MaskData:
        x0, y0, x1, y1 = crop_box
        cropped_im = image[y0:y1, x0:x1, :]
        cropped_im_size = cropped_im.shape[:2]
        self.predictor.set_image(cropped_im)

        points_scale = np.array(cropped_im_size)[None, ::-1]
        points_for_image = self.point_grids[crop_layer_idx] * points_scale

        data = self._process_points(
            points_for_image, cropped_im_size, crop_box, orig_size
        )
        self.predictor.reset_image()

        if len(data["boxes"]):
            keep = box_nms(
                data["boxes"].astype(np.float32), data["iou_preds"], self.box_nms_thresh
            )
            data.filter(keep)
        data["boxes"] = uncrop_boxes_xyxy(data["boxes"], crop_box)
        data["points"] = uncrop_points(data["points"], crop_box)
        data["crop_boxes"] = [crop_box for _ in range(len(data["rles"]))]
        return data

    def _process_points(
        self, points: np.ndarray, im_size, crop_box: List[int], orig_size
    ) -> MaskData:
        """Decode + filter the crop's WHOLE point grid in one device sweep.

        `predictor.amg_sweep` dispatches every `points_per_batch` chunk
        asynchronously (one fixed-shape jit, so live memory matches the old
        per-batch loop) and stacks results on device; exactly TWO things are
        fetched per crop: one (N, nm, 7) fp32 stats record and the
        survivors' bit-packed masks.  The per-batch loop this replaces made
        ~5 D2H round trips per 64-point batch and recomputed stats from
        HBM-materialized full-res fp32 masks (125 s/img at 32² points)."""
        orig_h, orig_w = orig_size
        pred = self.predictor
        n = len(points)
        nb = self.points_per_batch
        G = max(1, -(-n // nb))
        # one positive point per prompt set; slot 1 is the not-a-point pad,
        # grid rows beyond n are all-pad prompts sliced away after the fetch
        tp = pred.transform.apply_coords(points.astype(np.float32), im_size)
        pts = np.zeros((G * nb, 2, 2), np.float32)
        labs = np.full((G * nb, 2), -1, np.int32)
        pts[:n, 0] = tp
        labs[:n, 0] = 1

        stats_d, packed = pred.amg_sweep(
            pts.reshape(G, nb, 2, 2), labs.reshape(G, nb, 2),
            self.stability_score_offset,
        )
        nm = stats_d.shape[1]  # masks per prompt (3 for multimask)
        stats = np.asarray(stats_d)[:n]  # ONE fetch
        iou_preds = stats[..., 0].reshape(-1)
        hi = stats[..., 1].reshape(-1).astype(np.int64)
        lo = stats[..., 2].reshape(-1).astype(np.int64)
        stability = hi / np.maximum(lo, 1)
        boxes = stats[..., 3:7].reshape(-1, 4).astype(np.int64)
        pts_rep = np.repeat(points, nm, axis=0)

        keep = np.ones(n * nm, bool)
        if self.pred_iou_thresh > 0.0:
            keep &= iou_preds > self.pred_iou_thresh
        if self.stability_score_thresh > 0.0:
            keep &= stability >= self.stability_score_thresh
        keep &= ~is_box_near_crop_edge(boxes, crop_box, [0, 0, orig_w, orig_h])

        idx = np.nonzero(keep)[0]
        h, w = pred.original_size
        packed_kept = pred.amg_take_packed(packed, idx)
        masks_kept = unpackbits2d(packed_kept, w)
        masks_kept = uncrop_masks(masks_kept, crop_box, orig_h, orig_w)

        data = MaskData(
            iou_preds=iou_preds[idx],
            points=pts_rep[idx],
            stability_score=stability[idx],
            boxes=boxes[idx],
            rles=[mask_to_rle(m) for m in masks_kept],
        )
        return data

    @staticmethod
    def postprocess_small_regions(
        mask_data: MaskData, min_area: int, nms_thresh: float
    ) -> MaskData:
        """Remove small regions/holes, dedup via NMS (amg reference :324-372)."""
        if len(mask_data["rles"]) == 0:
            return mask_data
        new_masks, scores = [], []
        for rle in mask_data["rles"]:
            mask = rle_to_mask(rle)
            mask, changed = remove_small_regions(mask, min_area, mode="holes")
            unchanged = not changed
            mask, changed = remove_small_regions(mask, min_area, mode="islands")
            unchanged = unchanged and not changed
            new_masks.append(mask)
            scores.append(float(unchanged))  # prefer unchanged masks in NMS
        masks = np.stack(new_masks)
        boxes = batched_mask_to_box(masks)
        keep = box_nms(boxes.astype(np.float32), np.asarray(scores), nms_thresh)
        for i in keep:
            if scores[i] == 0.0:
                mask_data["rles"][i] = mask_to_rle(masks[i])
                mask_data["boxes"][i] = boxes[i]
        mask_data.filter(keep)
        return mask_data


def box_area(box) -> float:
    return max(box[2] - box[0], 0) * max(box[3] - box[1], 0)


def _xyxy_to_xywh(box: np.ndarray) -> np.ndarray:
    return np.array([box[0], box[1], box[2] - box[0], box[3] - box[1]])
