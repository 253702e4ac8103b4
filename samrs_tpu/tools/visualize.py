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
