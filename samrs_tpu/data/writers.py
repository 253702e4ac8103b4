"""Label writers: semantic PNGs + instance pkl records.

Output formats are bit-compatible with the reference
(GD/main_sam_hbox_semantic.py:201-216): per image a grayscale label PNG, a
palette-color PNG, and a pickle holding a list of per-instance dicts
{'bbox', 'label', 'category', 'segmentation' (COCO RLE), 'area', ...}.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, List, Optional, Sequence

import numpy as np
from PIL import Image


def save_semantic_png(path: str, gray: np.ndarray) -> None:
    Image.fromarray(gray, mode="L").save(path)


def save_color_png(path: str, color: np.ndarray) -> None:
    Image.fromarray(color, mode="RGB").save(path)


def instance_record(
    rle: Dict[str, Any],
    bbox: Sequence[float],
    label: int,
    category: str,
    area: int,
    rbox: Optional[Sequence[float]] = None,
    rhbox: Optional[Sequence[float]] = None,
) -> Dict[str, Any]:
    """One per-instance dict, bit-compatible with the reference's pkl schema
    (main_sam_hbox_semantic.py:201-206): keys 'mask' (COCO RLE with ascii-str
    counts), 'bbox' (the prompt hbox), 'category', 'label', 'size'.  The FAST
    rotated variant additionally stores 'rbox'/'rhbox'
    (main_sam_rhbox_semantic.py:197-209)."""
    if isinstance(rle.get("counts"), bytes):
        rle = {"size": rle["size"], "counts": rle["counts"].decode("ascii")}
    rec: Dict[str, Any] = {
        "mask": rle,
        "bbox": np.asarray(bbox, np.float32),
        "category": str(category),
        "label": int(label),
        "size": int(area),
    }
    if rbox is not None:
        rec["rbox"] = np.asarray(rbox, np.float32)
    if rhbox is not None:
        rec["rhbox"] = np.asarray(rhbox, np.float32)
    return rec


def save_instances_pkl(path: str, records: List[Dict[str, Any]]) -> None:
    with open(path, "wb") as f:
        pickle.dump(records, f)


def load_instances_pkl(path: str) -> List[Dict[str, Any]]:
    with open(path, "rb") as f:
        return pickle.load(f)


def ensure_dirs(*paths: str) -> None:
    for p in paths:
        os.makedirs(p, exist_ok=True)
