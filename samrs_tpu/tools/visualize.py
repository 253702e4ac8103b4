"""Label visualization: blend image with palette-colored labels.

Behavioral reference: GD/visualize.py:80-101 — gray label + palette ->
`Image.blend(img, color, 0.4)` overlays.
"""

from __future__ import annotations

import os
from glob import glob
from typing import Optional, Sequence

import numpy as np
from PIL import Image

from samrs_tpu.data.mapping import PALETTE


def colorize_label(gray: np.ndarray) -> np.ndarray:
    """uint8 label map -> RGB via the SAMRS palette (255 stays white)."""
    return PALETTE[gray]


def blend_overlay(image: np.ndarray, gray: np.ndarray, alpha: float = 0.4) -> np.ndarray:
    """Image + label overlay, reference-equivalent to Image.blend(img, color, 0.4)."""
    color = colorize_label(gray).astype(np.float32)
    out = image.astype(np.float32) * (1 - alpha) + color * alpha
    return np.clip(out + 0.5, 0, 255).astype(np.uint8)


def overlay_instances(
    image: np.ndarray,
    masks: np.ndarray,
    boxes: Optional[np.ndarray] = None,
    points: Optional[np.ndarray] = None,
    alpha: float = 0.6,
    seed: int = 0,
) -> np.ndarray:
    """Per-instance prompt-eval overlay: random-colored masks, white box
    edges, green center points (the twin of the reference's matplotlib dump,
    GD/main_sam_hbox_mask_instance.py:305-339 show_hbox_mask — pure numpy,
    no matplotlib dependency)."""
    out = image.astype(np.float32).copy()
    rng = np.random.default_rng(seed)
    for i, m in enumerate(np.asarray(masks).astype(bool)):
        color = rng.uniform(64, 255, 3)
        out[m] = out[m] * (1 - alpha) + color[None] * alpha
    out = np.clip(out + 0.5, 0, 255).astype(np.uint8)
    h, w = out.shape[:2]
    if boxes is not None:
        for x0, y0, x1, y1 in np.asarray(boxes).astype(int):
            x0, x1 = np.clip([x0, x1], 0, w - 1)
            y0, y1 = np.clip([y0, y1], 0, h - 1)
            out[y0, x0:x1 + 1] = 255
            out[y1, x0:x1 + 1] = 255
            out[y0:y1 + 1, x0] = 255
            out[y0:y1 + 1, x1] = 255
    if points is not None:
        for x, y in np.asarray(points).astype(int):
            y0, y1 = max(y - 2, 0), min(y + 3, h)
            x0, x1 = max(x - 2, 0), min(x + 3, w)
            out[y0:y1, x0:x1] = (0, 255, 0)
    return out


def main(argv: Optional[Sequence[str]] = None) -> None:
    import argparse

    p = argparse.ArgumentParser(description="visualize SAMRS labels")
    p.add_argument("--image-dir", required=True)
    p.add_argument("--label-dir", required=True, help="gray label PNGs")
    p.add_argument("--save-dir", required=True)
    p.add_argument("--alpha", type=float, default=0.4)
    a = p.parse_args(argv)
    os.makedirs(a.save_dir, exist_ok=True)
    for lbl_path in sorted(glob(os.path.join(a.label_dir, "*.png"))):
        name = os.path.splitext(os.path.basename(lbl_path))[0]
        img_path = None
        for ext in (".png", ".jpg", ".tif"):
            cand = os.path.join(a.image_dir, name + ext)
            if os.path.exists(cand):
                img_path = cand
                break
        if img_path is None:
            continue
        img = np.asarray(Image.open(img_path).convert("RGB"))
        gray = np.asarray(Image.open(lbl_path))
        Image.fromarray(blend_overlay(img, gray, a.alpha)).save(
            os.path.join(a.save_dir, name + ".png")
        )
        print(f"blended {name}")


if __name__ == "__main__":
    main()
