"""HRSC prompt-eval harness tests on a synthetic mini dataset."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from samrs_tpu.generate.instance_eval import (
    box_as_mask_prompt,
    gt_masks_from_landmask,
    miou_metrics,
    poly_as_mask_prompt,
    run_prompt_eval,
)
from samrs_tpu.sam.predictor import SamPredictor

HRSC_XML = """<HRSC_Image><HRSC_Objects>
  <HRSC_Object>
    <box_xmin>10</box_xmin><box_ymin>10</box_ymin>
    <box_xmax>40</box_xmax><box_ymax>30</box_ymax>
    <mbox_cx>25</mbox_cx><mbox_cy>20</mbox_cy>
    <mbox_w>30</mbox_w><mbox_h>16</mbox_h><mbox_ang>0.3</mbox_ang>
    <seg_color>200,30,30</seg_color>
  </HRSC_Object>
  <HRSC_Object>
    <box_xmin>45</box_xmin><box_ymin>35</box_ymin>
    <box_xmax>75</box_xmax><box_ymax>55</box_ymax>
    <mbox_cx>60</mbox_cx><mbox_cy>45</mbox_cy>
    <mbox_w>28</mbox_w><mbox_h>14</mbox_h><mbox_ang>-0.2</mbox_ang>
    <seg_color>30,200,30</seg_color>
  </HRSC_Object>
</HRSC_Objects></HRSC_Image>"""


@pytest.fixture()
def hrsc_dataset(tmp_path):
    (tmp_path / "img").mkdir()
    (tmp_path / "ann").mkdir()
    (tmp_path / "land").mkdir()
    rng = np.random.default_rng(0)
    img = (rng.random((60, 80, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(tmp_path / "img" / "h0.png")
    (tmp_path / "ann" / "h0.xml").write_text(HRSC_XML)
    land = np.zeros((60, 80, 3), np.uint8)
    land[12:28, 12:38] = (200, 30, 30)
    land[37:53, 47:73] = (30, 200, 30)
    Image.fromarray(land).save(tmp_path / "land" / "h0.png")
    return tmp_path


def test_gt_masks_from_landmask():
    land = np.zeros((10, 10, 3), np.uint8)
    land[2:5, 2:5] = (9, 8, 7)
    masks = gt_masks_from_landmask(land, np.array([[9, 8, 7], [1, 1, 1]], np.uint8))
    assert masks.shape == (2, 10, 10)
    assert masks[0].sum() == 9 and masks[1].sum() == 0


def test_mask_prompts():
    mp = box_as_mask_prompt(np.array([10, 10, 40, 30]), (60, 80), img_size=128, lowres=32)
    assert mp.shape == (32, 32)
    assert mp.max() > 0 and mp.min() <= -999
    poly = np.array([[10, 10], [40, 10], [40, 30], [10, 30]], np.float32)
    pp = poly_as_mask_prompt(poly, (60, 80), img_size=128, lowres=32)
    assert pp.shape == (32, 32)
    assert pp.max() > 0


def test_miou_metrics():
    a = np.zeros((1, 10, 10), np.uint8)
    b = np.zeros((1, 10, 10), np.uint8)
    a[0, :5] = 1
    b[0, 2:7] = 1  # IoU = 30/70
    m = miou_metrics([a], [b])
    assert abs(m["miou_avg"] - 30 / 70) < 1e-6
    assert m["num_instances"] == 1


@pytest.mark.parametrize("prompt", ["point", "hbox", "rhbox", "hbox_mask", "rbox_mask"])
def test_run_prompt_eval_all_modes(tiny_sam, hrsc_dataset, prompt):
    model, variables = tiny_sam
    pred = SamPredictor(model, variables, buckets=(4, 16))
    metrics = run_prompt_eval(
        pred,
        str(hrsc_dataset / "img"),
        str(hrsc_dataset / "ann"),
        str(hrsc_dataset / "land"),
        ["h0"],
        prompt=prompt,
        json_dir=str(hrsc_dataset / "json") if prompt == "hbox" else None,
    )
    assert 0.0 <= metrics["miou_avg"] <= 1.0
    assert metrics["num_instances"] == 2
    if prompt == "hbox":
        with open(hrsc_dataset / "json" / "gt_ins_hbox.json") as f:
            gt = json.load(f)
        assert len(gt["annotations"]) == 2
        with open(hrsc_dataset / "json" / "sam_ins_hbox.json") as f:
            pre = json.load(f)
        assert len(pre) == 2 and "score" in pre[0]
