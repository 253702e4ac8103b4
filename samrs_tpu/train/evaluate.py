"""Sliding-window test/inference driver with flip + multi-scale TTA.

Behavioral reference: ED/test_gpu.py —
  * net_process: softmax average of the normal and horizontally-flipped pass
    (:159-176)
  * scale_process: 2/3-overlap crop grid, accumulating summed probabilities
    and visit counts (:179-214)
  * optional multi-scale [0.75, 1.0, 1.25, 1.5, 1.75, 2.0] (:70-74, :236)
  * gray + palette PNG dump and per-class IoU/F1 report (:252-317)

TPU-first: the per-crop forward (with flip TTA folded in) is ONE jitted
function at a fixed crop shape — every crop of every image reuses the same
executable; accumulation happens host-side in fp32 numpy.
"""

from __future__ import annotations

import functools
import logging
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from samrs_tpu.core.metrics import segmentation_scores
from samrs_tpu.data.transforms import normalize_image

logger = logging.getLogger("samrs_tpu.evaluate")

DEFAULT_SCALES = (0.75, 1.0, 1.25, 1.5, 1.75, 2.0)


def make_crop_forward(model, variables, flip_tta: bool = True):
    """Jitted (B, ch, cw, 3) crop -> (B, ch, cw, C) softmax probabilities."""

    @jax.jit
    def fwd(x):
        logits = model.apply(variables, x, False)
        prob = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        if flip_tta:
            logits_f = model.apply(variables, x[:, :, ::-1], False)
            prob = prob + jax.nn.softmax(logits_f.astype(jnp.float32), axis=-1)[:, :, ::-1]
            prob = prob / 2.0
        return prob

    return fwd


def scale_process(
    fwd,
    image: np.ndarray,
    num_classes: int,
    crop: int,
    stride_rate: float = 2.0 / 3.0,
    batch_crops: int = 8,
) -> np.ndarray:
    """Sliding-window over one (H, W, 3) normalized image -> (H, W, C) probs.

    Matches test_gpu.py:179-214: pad to at least crop size, visit a 2/3-overlap
    grid, average by visit count.  Crops are batched through the jitted fwd.
    """
    h, w = image.shape[:2]
    ph, pw = max(0, crop - h), max(0, crop - w)
    t, b_, l_, r_ = ph // 2, ph - ph // 2, pw // 2, pw - pw // 2
    img = np.pad(image, ((t, b_), (l_, r_), (0, 0)))
    nh, nw = img.shape[:2]
    stride = int(np.ceil(crop * stride_rate))
    ys = list(range(0, max(nh - crop, 0) + 1, stride))
    xs = list(range(0, max(nw - crop, 0) + 1, stride))
    if ys[-1] + crop < nh:
        ys.append(nh - crop)
    if xs[-1] + crop < nw:
        xs.append(nw - crop)

    pred = np.zeros((nh, nw, num_classes), np.float32)
    count = np.zeros((nh, nw, 1), np.float32)
    coords = [(y, x) for y in ys for x in xs]
    for i in range(0, len(coords), batch_crops):
        chunk = coords[i : i + batch_crops]
        batch = np.stack([img[y : y + crop, x : x + crop] for y, x in chunk])
        if len(chunk) < batch_crops:  # pad to the jit shape
            batch = np.concatenate(
                [batch, np.zeros((batch_crops - len(chunk), crop, crop, 3), np.float32)]
            )
        probs = np.asarray(fwd(jnp.asarray(batch)))
        for j, (y, x) in enumerate(chunk):
            pred[y : y + crop, x : x + crop] += probs[j]
            count[y : y + crop, x : x + crop] += 1.0
    pred /= np.maximum(count, 1.0)
    return pred[t : t + h, l_ : l_ + w]


def predict_image(
    fwd,
    image_u8: np.ndarray,
    num_classes: int,
    crop: int,
    scales: Sequence[float] = (1.0,),
) -> np.ndarray:
    """Full TTA prediction for one uint8 HWC image -> (H, W) label map."""
    import cv2

    h, w = image_u8.shape[:2]
    total = np.zeros((h, w, num_classes), np.float32)
    for s in scales:
        nh, nw = int(round(h * s)), int(round(w * s))
        scaled = (
            image_u8
            if (nh, nw) == (h, w)
            else cv2.resize(image_u8, (nw, nh), interpolation=cv2.INTER_LINEAR)
        )
        prob = scale_process(fwd, normalize_image(scaled), num_classes, crop)
        if (nh, nw) != (h, w):
            prob = cv2.resize(prob, (w, h), interpolation=cv2.INTER_LINEAR)
        total += prob
    return total.argmax(-1).astype(np.uint8)


def run_test(
    model,
    variables,
    dataset,
    num_classes: int,
    crop: int,
    scales: Sequence[float] = (1.0,),
    save_dir: Optional[str] = None,
    palette: Optional[np.ndarray] = None,
    skip_background: bool = False,
):
    """Evaluate a dataset (pairs of (uint8 image, int label)); returns scores
    (per-class IoU/F1 + means, test_gpu.py:295-317)."""
    from samrs_tpu.core.metrics import intersection_and_union

    fwd = make_crop_forward(model, variables)
    inter = np.zeros(num_classes)
    target = np.zeros(num_classes)
    union = np.zeros(num_classes)
    if save_dir:
        os.makedirs(os.path.join(save_dir, "gray"), exist_ok=True)
        os.makedirs(os.path.join(save_dir, "color"), exist_ok=True)
    for i in range(len(dataset)):
        image_u8, label = dataset.raw_item(i) if hasattr(dataset, "raw_item") else dataset[i]
        pred = predict_image(fwd, image_u8, num_classes, crop, scales)
        iu = intersection_and_union(jnp.asarray(pred), jnp.asarray(label), num_classes)
        inter += np.asarray(iu[0])
        target += np.asarray(iu[1])
        union += np.asarray(iu[2])
        if save_dir:
            from PIL import Image

            name = f"{i:06d}"
            Image.fromarray(pred, mode="L").save(
                os.path.join(save_dir, "gray", name + ".png")
            )
            if palette is not None:
                Image.fromarray(palette[pred]).save(
                    os.path.join(save_dir, "color", name + ".png")
                )
    scores = segmentation_scores(inter, target, union, skip_background=skip_background)
    logger.info(
        "test: mIoU %.4f mF1 %.4f OA %.4f", scores["miou"], scores["mf1"], scores["all_acc"]
    )
    return scores


class _RawDataset:
    """Wraps a SegmentationDataset-style file list into raw (uint8, label)
    pairs for sliding-window testing (no crop augmentation)."""

    def __init__(self, ds):
        self.ds = ds

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i):
        import numpy as _np
        from PIL import Image

        image = _np.asarray(Image.open(self.ds.files[i]).convert("RGB"))
        label = _np.asarray(Image.open(self.ds.targets[i]))
        if hasattr(self.ds, "NUM_CLASSES") and self.ds.NUM_CLASSES == 6 and label.ndim == 3:
            from samrs_tpu.data.datasets import isprs_rgb_to_label

            label = isprs_rgb_to_label(label)
        elif label.ndim == 3:
            label = label[..., 0]
        return image, label.astype(_np.int32)


def main(argv: Optional[Sequence[str]] = None) -> None:
    """CLI: sliding-window test of a finetuned checkpoint (test_gpu.py CLI)."""
    import argparse

    import jax.numpy as jnp

    from samrs_tpu.core.checkpoint import load_checkpoint
    from samrs_tpu.data.datasets import ISAIDDataset, ISPRSDataset
    from samrs_tpu.data.mapping import PALETTE
    from samrs_tpu.seg.frameworks import SegModel
    from samrs_tpu.train.finetune import FINETUNE_DATASETS

    p = argparse.ArgumentParser(description="SAMRS sliding-window test")
    p.add_argument("--dataset", default="potsdam", choices=sorted(FINETUNE_DATASETS))
    p.add_argument("--backbone", default="vit_b_rvsa")
    p.add_argument("--decoder", default="upernet")
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--data-root", required=True)
    p.add_argument("--crop", type=int, default=0, help="0 = dataset default size")
    p.add_argument("--multiscale", action="store_true")
    p.add_argument("--save-dir", default=None)
    a = p.parse_args(argv)

    ds_cls, num_classes, default_size, skip_bg = FINETUNE_DATASETS[a.dataset]
    crop = a.crop or default_size
    model = SegModel(backbone=a.backbone, decoder=a.decoder, num_classes=num_classes,
                     image_size=crop)
    import jax as _jax
    import os as _os

    x0 = jnp.zeros((1, crop, crop, 3), jnp.float32)
    variables = model.init(
        {"params": _jax.random.PRNGKey(0), "dropout": _jax.random.PRNGKey(1)}, x0, False
    )
    tree = load_checkpoint(a.checkpoint)
    from flax import serialization

    params = serialization.from_state_dict(variables["params"], tree["params"])
    bstats = serialization.from_state_dict(
        variables.get("batch_stats", {}), tree.get("batch_stats", {}))
    variables = _jax.tree_util.tree_map(jnp.asarray, {"params": params, "batch_stats": bstats})

    root = _os.path.join(a.data_root, a.dataset)
    ds = ds_cls(root, _os.path.join(root, "images"), _os.path.join(root, "labels"),
                split="tes")
    logging.basicConfig(level=logging.INFO)
    # dataset-specific output palettes (ED/utils.py:106-137)
    if a.dataset in ("potsdam", "vaihingen"):
        from samrs_tpu.data.datasets import ISPRS_PALETTE

        palette = np.zeros((256, 3), np.uint8)
        palette[: len(ISPRS_PALETTE)] = ISPRS_PALETTE
    else:
        palette = PALETTE
    run_test(
        model, variables, _RawDataset(ds), num_classes, crop,
        scales=DEFAULT_SCALES if a.multiscale else (1.0,),
        save_dir=a.save_dir, palette=palette, skip_background=skip_bg,
    )


if __name__ == "__main__":
    main()
