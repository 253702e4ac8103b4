"""Annotation-format converters for dataset preparation.

Behavioral reference: GD/ann_transform.py:27-128 —
  * BboxToolkit clip-pkl -> per-patch DOTA-format txt files
  * FAIR1M XML (objects/object/points) -> DOTA txt for clipping
  * train/val merge with renaming (FAIR1M train and val share file names)
  * tif -> png conversion

All converters take explicit paths (the reference hard-codes them).
"""

from __future__ import annotations

import os
import pickle
import shutil
import xml.etree.ElementTree as ET
from glob import glob
from typing import Optional, Sequence

from samrs_tpu.data.mapping import CLASS_SETS, NAME_TO_INDEX


def boxtoolpkl_to_dotatxt(pkl_path: str, save_path: str, dataset: str = "fair1m") -> int:
    """BboxToolkit patch_annfile.pkl -> one DOTA txt per clipped patch."""
    lbl2cls = dict(enumerate(CLASS_SETS[dataset]))
    with open(pkl_path, "rb") as f:
        pkl_file = pickle.load(f)
    content = pkl_file["content"]
    os.makedirs(save_path, exist_ok=True)
    for item in content:
        filename = os.path.splitext(item["filename"])[0]
        boxes = item["ann"]["bboxes"]
        labels = item["ann"]["labels"]
        with open(os.path.join(save_path, f"{filename}.txt"), "w") as f:
            for box, label in zip(boxes, labels):
                coords = " ".join(str(v) for v in box[:8])
                f.write(f"{coords} {lbl2cls[int(label)]} {int(label)}\n")
    return len(content)


def fair1m_xml_to_txt(xml_dir: str, save_dir: str) -> int:
    """FAIR1M XML (possibleresult/name + 4 corner points) -> DOTA txt.

    Category names have spaces replaced by '-' to match the FAIR1M tuple.
    """
    cls2lbl = NAME_TO_INDEX["fair1m"]
    os.makedirs(save_dir, exist_ok=True)
    xml_files = sorted(glob(os.path.join(xml_dir, "*.xml")))
    for xml_file in xml_files:
        filename = os.path.splitext(os.path.basename(xml_file))[0]
        tree = ET.parse(xml_file)
        with open(os.path.join(save_dir, f"{filename}.txt"), "w") as f:
            for obj in tree.getroot().findall("objects/object"):
                category = str(obj.find("possibleresult/name").text).replace(" ", "-")
                label = cls2lbl[category]
                pts = [p.text for p in obj.find("points").findall("point")]
                coords = []
                for p in pts[:4]:
                    x, y = p.split(",")
                    coords += [x.strip(), y.strip()]
                f.write(" ".join(coords) + f" {category} {label}\n")
    return len(xml_files)


def merge_train_val(
    train_dir: str, val_dir: str, out_dir: str, val_offset_prefix: str = "v_"
) -> int:
    """Merge FAIR1M train+val file sets whose names collide: val files are
    renamed with a prefix (ann_transform.py:81-128 renames by numeric offset;
    a prefix is collision-proof for arbitrary name schemes)."""
    os.makedirs(out_dir, exist_ok=True)
    n = 0
    for f in sorted(glob(os.path.join(train_dir, "*"))):
        shutil.copy(f, os.path.join(out_dir, os.path.basename(f)))
        n += 1
    for f in sorted(glob(os.path.join(val_dir, "*"))):
        shutil.copy(f, os.path.join(out_dir, val_offset_prefix + os.path.basename(f)))
        n += 1
    return n


def tif_to_png(src_dir: str, dst_dir: str) -> int:
    from PIL import Image

    os.makedirs(dst_dir, exist_ok=True)
    files = sorted(glob(os.path.join(src_dir, "*.tif"))) + sorted(
        glob(os.path.join(src_dir, "*.tiff"))
    )
    for f in files:
        name = os.path.splitext(os.path.basename(f))[0]
        Image.open(f).convert("RGB").save(os.path.join(dst_dir, name + ".png"))
    return len(files)


def fix_instance_pkls(ins_dir: str, save_dir: str, dataset: str = "fair1m") -> int:
    """Repair pkls whose 'category' field holds the int label (GD/script.py:29-46):
    swap so 'label' is the int and 'category' the class name."""
    lbl2cls = dict(enumerate(CLASS_SETS[dataset]))
    os.makedirs(save_dir, exist_ok=True)
    files = sorted(glob(os.path.join(ins_dir, "*.pkl")))
    for path in files:
        with open(path, "rb") as f:
            records = pickle.load(f)
        for rec in records:
            label = rec["category"]
            rec["label"] = int(label)
            rec["category"] = lbl2cls[int(label)]
        with open(os.path.join(save_dir, os.path.basename(path)), "wb") as f:
            pickle.dump(records, f)
    return len(files)
