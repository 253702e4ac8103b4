import json
import os
import pickle

import numpy as np

from samrs_tpu.data.rle import rle_decode
from samrs_tpu.tools.ann_transform import (
    fair1m_xml_to_txt,
    fix_instance_pkls,
    merge_train_val,
)
from samrs_tpu.tools.instance_to_json import binary_to_coco_gt, binary_to_coco_pre
from samrs_tpu.tools.statistic import class_pixel_instance_counts, instance_mask_sizes
from samrs_tpu.tools.visualize import blend_overlay, colorize_label


def _write_pkl(path, records):
    with open(path, "wb") as f:
        pickle.dump(records, f)


def test_statistic_counts(tmp_path):
    recs = [
        {"label": 2, "size": 100},
        {"label": 2, "size": 50},
        {"label": 5, "size": 0},  # empty masks excluded (statistic.py:19)
        {"label": 7, "size": 10},
    ]
    _write_pkl(tmp_path / "a.pkl", recs)
    pixel, inst = class_pixel_instance_counts([str(tmp_path / "a.pkl")], 10)
    assert pixel[2] == 150 and inst[2] == 2
    assert pixel[5] == 0 and inst[5] == 0
    assert pixel[7] == 10 and inst[7] == 1
    assert instance_mask_sizes([str(tmp_path / "a.pkl")]) == [100, 50, 10]


def test_coco_gt_and_pre():
    stack = np.zeros((2, 8, 8), np.uint8)
    stack[0, :4, :4] = 1
    stack[1, 4:, 4:] = 1
    gt = binary_to_coco_gt([stack], ["img0"])
    assert len(gt["images"]) == 1 and len(gt["annotations"]) == 2
    assert gt["categories"][0]["name"] == "ship"
    ann = gt["annotations"][0]
    assert ann["area"] == 16 and isinstance(ann["segmentation"]["counts"], str)
    m = rle_decode(ann["segmentation"])
    np.testing.assert_array_equal(m, stack[0])
    json.dumps(gt)  # must be JSON-serializable

    pre = binary_to_coco_pre([stack], [np.array([0.9, 0.8])])
    assert len(pre) == 2 and pre[1]["score"] == 0.8
    json.dumps(pre)


def test_fair1m_xml_to_txt(tmp_path):
    xml = """<annotation><objects>
      <object><possibleresult><name>Small Car</name></possibleresult>
        <points><point>1.0,2.0</point><point>3.0,2.0</point>
                <point>3.0,4.0</point><point>1.0,4.0</point><point>1.0,2.0</point></points>
      </object></objects></annotation>"""
    (tmp_path / "xml").mkdir()
    (tmp_path / "xml" / "f1.xml").write_text(xml)
    n = fair1m_xml_to_txt(str(tmp_path / "xml"), str(tmp_path / "txt"))
    assert n == 1
    line = (tmp_path / "txt" / "f1.txt").read_text().strip().split()
    assert line[8] == "Small-Car"
    assert line[9] == "29"  # FAIR1M index of Small-Car
    assert line[:8] == ["1.0", "2.0", "3.0", "2.0", "3.0", "4.0", "1.0", "4.0"]


def test_fix_instance_pkls(tmp_path):
    (tmp_path / "ins").mkdir()
    _write_pkl(tmp_path / "ins" / "x.pkl", [{"category": 3, "label": "junk", "size": 5}])
    fix_instance_pkls(str(tmp_path / "ins"), str(tmp_path / "fixed"), dataset="fair1m")
    with open(tmp_path / "fixed" / "x.pkl", "rb") as f:
        rec = pickle.load(f)[0]
    assert rec["label"] == 3 and rec["category"] == "A350"


def test_merge_train_val(tmp_path):
    (tmp_path / "tr").mkdir()
    (tmp_path / "va").mkdir()
    (tmp_path / "tr" / "0001.txt").write_text("t")
    (tmp_path / "va" / "0001.txt").write_text("v")
    n = merge_train_val(str(tmp_path / "tr"), str(tmp_path / "va"), str(tmp_path / "out"))
    assert n == 2
    assert (tmp_path / "out" / "0001.txt").read_text() == "t"
    assert (tmp_path / "out" / "v_0001.txt").read_text() == "v"


def test_visualize():
    gray = np.full((4, 4), 255, np.uint8)
    gray[0, 0] = 0
    color = colorize_label(gray)
    assert tuple(color[0, 0]) == (0, 127, 255)
    assert tuple(color[1, 1]) == (255, 255, 255)
    img = np.zeros((4, 4, 3), np.uint8)
    out = blend_overlay(img, gray, 0.4)
    assert out.shape == (4, 4, 3)
    assert tuple(out[1, 1]) == (102, 102, 102)  # 0.4 * 255


def test_statistic_cli(tmp_path):
    from samrs_tpu.tools.statistic import main

    (tmp_path / "ins").mkdir()
    _write_pkl(tmp_path / "ins" / "a.pkl", [{"label": 1, "size": 9}])
    main(["--dataset", "sota", "--ins-dir", str(tmp_path / "ins"),
          "--save-dir", str(tmp_path / "stats")])
    assert (tmp_path / "stats" / "class_pixel_num_sota.pkl").exists()
    main(["--dataset", "sota", "--ins-dir", str(tmp_path / "ins"),
          "--save-dir", str(tmp_path / "stats"), "--mode", "sizes"])
    assert (tmp_path / "stats" / "instance_mask_size_sota.pkl").exists()


def test_visualize_cli(tmp_path):
    from PIL import Image

    from samrs_tpu.tools.visualize import main

    (tmp_path / "img").mkdir()
    (tmp_path / "lbl").mkdir()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(tmp_path / "img" / "x.png")
    Image.fromarray(np.full((8, 8), 255, np.uint8)).save(tmp_path / "lbl" / "x.png")
    main(["--image-dir", str(tmp_path / "img"), "--label-dir", str(tmp_path / "lbl"),
          "--save-dir", str(tmp_path / "out")])
    out = np.asarray(Image.open(tmp_path / "out" / "x.png"))
    assert tuple(out[0, 0]) == (102, 102, 102)  # 0.4 * white over black


def test_overlay_instances():
    """Prompt-eval overlay twin (main_sam_hbox_mask_instance.py:305-339)."""
    import numpy as np
    from samrs_tpu.tools.visualize import overlay_instances

    img = np.zeros((20, 30, 3), np.uint8)
    masks = np.zeros((2, 20, 30), np.uint8)
    masks[0, 2:8, 3:9] = 1
    masks[1, 10:15, 12:20] = 1
    out = overlay_instances(img, masks, boxes=np.array([[3, 2, 8, 7]]),
                            points=np.array([[5, 4]]))
    assert out.shape == (20, 30, 3) and out.dtype == np.uint8
    assert (out[2, 8] == 255).all()            # white box edge corner
    assert (out[7, 3:9] == 255).all()          # bottom edge (clear of marker)
    assert tuple(out[4, 5]) == (0, 255, 0)     # green point marker
    assert out[12, 15].sum() > 0               # colored mask region
    assert out[0, 0].sum() == 0                # background untouched
