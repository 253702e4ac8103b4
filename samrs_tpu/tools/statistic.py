"""Dataset statistics from instance pkls.

Behavioral reference: GD/statistic.py:8-96 — per-class pixel/instance counts
and per-instance mask-size lists, saved as pkls.  Class counts: SOTA 18,
SIOR 20, FAST 37 (statistic.py:69-80).
"""

from __future__ import annotations

import os
import pickle
from glob import glob
from typing import List, Optional, Sequence, Tuple

import numpy as np

NUM_CLASSES = {"sota": 18, "dota": 18, "sior": 20, "dior": 20, "fast": 37, "fair1m": 37}


def class_pixel_instance_counts(
    files: Sequence[str], num_classes: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Accumulate per-class pixel and instance counts over instance pkls."""
    pixel = np.zeros(num_classes, np.int64)
    inst = np.zeros(num_classes, np.int64)
    for path in files:
        with open(path, "rb") as f:
            records = pickle.load(f)
        for rec in records:
            if rec["size"] > 0:
                pixel[rec["label"]] += rec["size"]
                inst[rec["label"]] += 1
    return pixel, inst


def instance_mask_sizes(files: Sequence[str]) -> List[int]:
    sizes: List[int] = []
    for path in files:
        with open(path, "rb") as f:
            records = pickle.load(f)
        sizes.extend(int(rec["size"]) for rec in records if rec["size"] > 0)
    return sizes


def main(argv: Optional[Sequence[str]] = None) -> None:
    import argparse

    p = argparse.ArgumentParser(description="SAMRS dataset statistics")
    p.add_argument("--dataset", default="sota", choices=sorted(NUM_CLASSES))
    p.add_argument("--ins-dir", required=True, help="directory of instance pkls")
    p.add_argument("--save-dir", required=True)
    p.add_argument(
        "--mode", default="counts", choices=["counts", "sizes"],
        help="counts: per-class pixel/instance histograms; sizes: mask size list",
    )
    a = p.parse_args(argv)
    files = sorted(glob(os.path.join(a.ins_dir, "*.pkl")))
    os.makedirs(a.save_dir, exist_ok=True)
    if a.mode == "counts":
        pixel, inst = class_pixel_instance_counts(files, NUM_CLASSES[a.dataset])
        print(f"{a.dataset} class vs pixel num:\n{pixel}")
        print(f"{a.dataset} class vs instance num:\n{inst}")
        with open(os.path.join(a.save_dir, f"class_pixel_num_{a.dataset}.pkl"), "wb") as f:
            pickle.dump(pixel, f)
        with open(os.path.join(a.save_dir, f"class_instance_num_{a.dataset}.pkl"), "wb") as f:
            pickle.dump(inst, f)
    else:
        sizes = instance_mask_sizes(files)
        print(f"{a.dataset}: {len(sizes)} instances, mean size {np.mean(sizes):.1f}")
        with open(os.path.join(a.save_dir, f"instance_mask_size_{a.dataset}.pkl"), "wb") as f:
            pickle.dump(sizes, f)


if __name__ == "__main__":
    main()
