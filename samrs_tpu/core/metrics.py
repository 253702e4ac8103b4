"""Metrics and meters.

Reference: ED/utils.py:7-53 (`AverageMeter`, `intersectionAndUnion{,GPU}`).
The confusion-histogram metric is reimplemented as a jit-friendly bincount so it
runs on device and all-reduces via `jax.lax.psum` inside sharded eval steps.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


class AverageMeter:
    """Running average (reference: ED/utils.py:7-21)."""

    def __init__(self) -> None:
        self.reset()

    def reset(self) -> None:
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1) -> None:
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)


def intersection_and_union(
    pred: jnp.ndarray, target: jnp.ndarray, num_classes: int, ignore_index: int = 255
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-class intersection / target / union histograms.

    jit-compatible equivalent of ED/utils.py:24-53 (`intersectionAndUnionGPU`).
    Returns (intersection, target_area, union), each shape (num_classes,).
    """
    pred = pred.reshape(-1)
    target = target.reshape(-1)
    valid = target != ignore_index
    # masked-out pixels are pushed to a scratch bin (num_classes) then dropped
    pred_m = jnp.where(valid, pred, num_classes)
    tgt_m = jnp.where(valid, target, num_classes)
    inter_mask = pred_m == tgt_m
    inter = jnp.bincount(jnp.where(inter_mask, pred_m, num_classes), length=num_classes + 1)[:-1]
    area_p = jnp.bincount(pred_m, length=num_classes + 1)[:-1]
    area_t = jnp.bincount(tgt_m, length=num_classes + 1)[:-1]
    union = area_p + area_t - inter
    return inter, area_t, union


def segmentation_scores(
    inter: np.ndarray, target: np.ndarray, union: np.ndarray, skip_background: bool = False
):
    """mIoU / mAcc / mF1 / allAcc from accumulated histograms.

    Mirrors the score computation of ED/main_finetune.py:490-529 including the
    iSAID background-skip (class 0 excluded from means when skip_background).
    """
    eps = 1e-10
    iou = inter / (union + eps)
    acc = inter / (target + eps)
    f1 = 2 * inter / (union + inter + eps)  # 2TP/(2TP+FP+FN); pred+target = union+inter
    sl = slice(1, None) if skip_background else slice(None)
    return dict(
        iou=iou,
        acc=acc,
        f1=f1,
        miou=float(np.mean(iou[sl])),
        macc=float(np.mean(acc[sl])),
        mf1=float(np.mean(f1[sl])),
        all_acc=float(inter.sum() / (target.sum() + eps)),
    )
