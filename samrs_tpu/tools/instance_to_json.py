"""Binary instance stacks -> COCO JSON dicts (HRSC prompt evaluation).

Behavioral reference: GD/instance_to_json.py:5-109 — GT dict with
images/annotations/categories (single 'ship' category, id 0) and a predictions
list with scores, both using compressed RLE with ascii-str counts.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Sequence

import numpy as np

from samrs_tpu.data.rle import rle_encode


def _ascii_rle(mask: np.ndarray) -> Dict[str, Any]:
    rle = rle_encode(np.asarray(mask, np.uint8))
    return {"size": rle["size"], "counts": rle["counts"].decode("ascii")}


def binary_to_coco_gt(
    binary_list: Sequence[np.ndarray], img_name_list: Sequence[str]
) -> Dict[str, Any]:
    """List of (C, H, W) per-image instance stacks -> COCO GT dict."""
    coco: Dict[str, Any] = {
        "images": [],
        "annotations": [],
        "categories": [{"id": 0, "name": "ship", "supercategory": "None"}],
    }
    for n, stack in enumerate(binary_list):
        _, H, W = stack.shape
        coco["images"].append(
            {"id": int(n), "width": int(W), "height": int(H),
             "file_name": f"{img_name_list[n]}.png"}
        )
    ann_id = 0
    for n, stack in enumerate(binary_list):
        for c in range(stack.shape[0]):
            m = stack[c]
            coco["annotations"].append(
                {
                    "id": int(ann_id),
                    "image_id": int(n),
                    "category_id": 0,
                    "area": int(m.sum()),
                    "iscrowd": 0,
                    "segmentation": _ascii_rle(m),
                    "attributes": {},
                }
            )
            ann_id += 1
    return coco


def binary_to_coco_pre(
    binary_list: Sequence[np.ndarray],
    score_list: Sequence[np.ndarray],
) -> List[Dict[str, Any]]:
    """Prediction stacks + per-instance scores -> COCO results list."""
    out: List[Dict[str, Any]] = []
    for n, stack in enumerate(binary_list):
        scores = np.asarray(score_list[n]).reshape(-1)
        for c in range(stack.shape[0]):
            out.append(
                {
                    "image_id": int(n),
                    "category_id": 0,
                    "segmentation": _ascii_rle(stack[c]),
                    "score": float(scores[c]),
                }
            )
    return out


def save_json(obj: Any, path: str) -> None:
    with open(path, "w") as f:
        json.dump(obj, f)
