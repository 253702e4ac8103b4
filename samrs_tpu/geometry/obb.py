"""Oriented-box <-> polygon geometry, vectorized.

Behavioral reference: GD/utils/transform.py (mmrotate-derived, per-box Python
loops over cv2.minAreaRect).  Rebuilt as batch-vectorized numpy: these run on
the host during annotation loading (not a device hot path), but at 105k-image
fleet scale the per-box Python loops of the reference would dominate, so
everything here is O(1) numpy ops over (N, ...) arrays.

Conventions (angle ranges match transform.py:283-301 `norm_angle`):
  'oc'    : opencv; theta in (0, pi/2]
  'le135' : theta in [-pi/4, 3*pi/4)
  'le90'  : theta in [-pi/2, pi/2)
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def norm_angle(angle: np.ndarray, angle_range: str = "le90") -> np.ndarray:
    """Normalize angles into the convention's range (transform.py:283-301)."""
    angle = np.asarray(angle, np.float64)
    if angle_range == "oc":
        return angle  # cv2 angles already in (0, 90]
    if angle_range == "le135":
        return (angle + np.pi / 4) % np.pi - np.pi / 4
    if angle_range == "le90":
        return (angle + np.pi / 2) % np.pi - np.pi / 2
    raise ValueError(f"unknown angle range {angle_range!r}")


def obb2poly(obboxes: np.ndarray, version: str = "le90") -> np.ndarray:
    """(N, 5) [cx, cy, w, h, theta] -> (N, 8) polygon corners.

    Vectorized equivalent of transform.py:51-216 (obb2poly_np_{oc,le135,le90}).
    Corner order: the (w, h) box corners rotated by theta, starting from
    (-w/2, -h/2) and proceeding clockwise in image coords.
    """
    obboxes = np.asarray(obboxes, np.float64)
    ctr = obboxes[:, None, 0:2]
    w, h, theta = obboxes[:, 2], obboxes[:, 3], obboxes[:, 4]
    cos, sin = np.cos(theta), np.sin(theta)
    dx = np.stack([-w, w, w, -w], axis=1) / 2.0  # (N, 4)
    dy = np.stack([-h, -h, h, h], axis=1) / 2.0
    x = dx * cos[:, None] - dy * sin[:, None]
    y = dx * sin[:, None] + dy * cos[:, None]
    poly = ctr + np.stack([x, y], axis=2)  # (N, 4, 2)
    return poly.reshape(-1, 8)


def poly2obb(polys: np.ndarray, version: str = "le90") -> np.ndarray:
    """(N, 8) polygons -> (N, 5) [cx, cy, w, h, theta] minimum-area rects.

    Equivalent of transform.py:9-48 (poly2obb_np_*), vectorized.  For the
    (possibly non-rectangular) input quadrilateral the minimum-area enclosing
    rectangle is computed per box via cv2.minAreaRect (exact parity with the
    reference), falling back to a PCA fit when cv2 is unavailable.
    """
    polys = np.asarray(polys, np.float64).reshape(-1, 4, 2)
    try:
        import cv2

        out = np.zeros((polys.shape[0], 5), np.float64)
        for i, p in enumerate(polys.astype(np.float32)):
            (cx, cy), (w, h), ang = cv2.minAreaRect(p)
            out[i] = (cx, cy, w, h, np.deg2rad(ang))
    except ImportError:  # pragma: no cover
        ctr = polys.mean(axis=1)
        d = polys - ctr[:, None]
        e1 = polys[:, 1] - polys[:, 0]
        ang = np.arctan2(e1[:, 1], e1[:, 0])
        cos, sin = np.cos(-ang), np.sin(-ang)
        rx = d[..., 0] * cos[:, None] - d[..., 1] * sin[:, None]
        ry = d[..., 0] * sin[:, None] + d[..., 1] * cos[:, None]
        w = rx.max(1) - rx.min(1)
        h = ry.max(1) - ry.min(1)
        out = np.concatenate([ctr, w[:, None], h[:, None], ang[:, None]], axis=1)

    # convert to the requested angle convention: ensure w is the side aligned
    # with theta and normalize range (le90: swap so |theta| < pi/2, w along x)
    cx, cy, w, h, theta = out.T.copy()
    if version in ("le90", "le135"):
        swap = w < h
        w2 = np.where(swap, h, w)
        h2 = np.where(swap, w, h)
        theta2 = np.where(swap, theta + np.pi / 2, theta)
        theta2 = norm_angle(theta2, version)
        out = np.stack([cx, cy, w2, h2, theta2], axis=1)
    return out


def poly_to_hbb(polys: np.ndarray) -> np.ndarray:
    """(N, 8) polygons -> (N, 4) xyxy enclosing horizontal boxes.

    The rotated-prompt drivers feed SAM with the minimal enclosing hbox of the
    rotated polygon (main_sam_rhbox_semantic.py:123-130).
    """
    p = np.asarray(polys, np.float64).reshape(-1, 4, 2)
    return np.concatenate([p.min(axis=1), p.max(axis=1)], axis=1).astype(np.float32)


def get_best_begin_point(polys: np.ndarray) -> np.ndarray:
    """Canonical cyclic vertex order (transform.py:234-280), vectorized.

    Rotates each quadrilateral's vertex list so it starts nearest the
    enclosing box's top-left corner (sum-of-distances criterion over the 4
    cyclic shifts, matching the reference's choose-best-begin-point).
    """
    p = np.asarray(polys, np.float64).reshape(-1, 4, 2)
    xmin, ymin = p[..., 0].min(1), p[..., 1].min(1)
    xmax, ymax = p[..., 0].max(1), p[..., 1].max(1)
    canon = np.stack(
        [
            np.stack([xmin, ymin], -1),
            np.stack([xmax, ymin], -1),
            np.stack([xmax, ymax], -1),
            np.stack([xmin, ymax], -1),
        ],
        axis=1,
    )  # (N, 4, 2)
    shifts = np.stack([np.roll(p, -s, axis=1) for s in range(4)], axis=1)  # (N, 4, 4, 2)
    cost = np.linalg.norm(shifts - canon[:, None], axis=-1).sum(-1)  # (N, 4)
    best = cost.argmin(axis=1)
    out = shifts[np.arange(p.shape[0]), best]
    return out.reshape(-1, 8)
