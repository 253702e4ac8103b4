"""End-to-end generation pipeline tests on a synthetic mini dataset."""

import os
import pickle

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from samrs_tpu.core.config import GenerateConfig
from samrs_tpu.data.mapping import PALETTE
from samrs_tpu.data.rle import rle_decode
from samrs_tpu.generate.painter import paint_semantic, paint_semantic_device
from samrs_tpu.generate.semantic import SemanticGenerator, generate_semantic
from samrs_tpu.sam.predictor import SamPredictor


DIOR_XML = """<annotation>
  <object><name>ship</name>
    <bndbox><xmin>{x0}</xmin><ymin>{y0}</ymin><xmax>{x1}</xmax><ymax>{y1}</ymax></bndbox>
  </object>
  <object><name>harbor</name>
    <bndbox><xmin>{a0}</xmin><ymin>{b0}</ymin><xmax>{a1}</xmax><ymax>{b1}</ymax></bndbox>
  </object>
</annotation>"""


@pytest.fixture()
def mini_dataset(tmp_path):
    img_dir = tmp_path / "images"
    ann_dir = tmp_path / "anns"
    save_dir = tmp_path / "out"
    img_dir.mkdir()
    ann_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        img = (rng.random((60, 80, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(img_dir / f"im{i}.png")
        (ann_dir / f"im{i}.xml").write_text(
            DIOR_XML.format(x0=5, y0=5, x1=30, y1=25, a0=40, b0=20, a1=75, b1=55)
        )
    return str(img_dir), str(ann_dir), str(save_dir)


def test_painter_host_device_equivalence():
    rng = np.random.default_rng(1)
    masks = rng.random((7, 20, 30)) > 0.6
    labels = rng.integers(0, 10, 7).astype(np.int32)
    g1, c1 = paint_semantic(masks, labels, (20, 30))
    chunks = [(0, jnp.asarray(masks[:4])), (4, jnp.asarray(masks[4:]))]
    g2, c2 = paint_semantic_device(chunks, labels, (20, 30))
    np.testing.assert_array_equal(g1, g2)
    np.testing.assert_array_equal(c1, c2)


def test_painter_last_instance_wins():
    masks = np.zeros((2, 4, 4), bool)
    masks[0, :2] = True
    masks[1, 1:3] = True  # overlaps row 1; instance 1 must win there
    gray, _ = paint_semantic(masks, np.array([3, 7]), (4, 4))
    assert (gray[0] == 3).all() and (gray[1] == 7).all() and (gray[2] == 7).all()
    assert (gray[3] == 255).all()


def test_generate_semantic_end_to_end(tiny_sam, mini_dataset):
    model, variables = tiny_sam
    predictor = SamPredictor(model, variables, buckets=(4, 16))
    img_dir, ann_dir, save_dir = mini_dataset
    cfg = GenerateConfig(
        dataset="dior", image_dir=img_dir, ann_dir=ann_dir, save_dir=save_dir
    )
    n = generate_semantic(cfg, predictor=predictor)
    assert n == 2
    for i in range(2):
        gray = np.asarray(Image.open(os.path.join(save_dir, "gray", f"im{i}.png")))
        color = np.asarray(Image.open(os.path.join(save_dir, "color", f"im{i}.png")))
        assert gray.shape == (60, 80) and color.shape == (60, 80, 3)
        # color PNG must be the palette image of the gray PNG
        np.testing.assert_array_equal(color, PALETTE[gray])
        with open(os.path.join(save_dir, "ins", f"im{i}.pkl"), "rb") as f:
            records = pickle.load(f)
        assert len(records) == 2
        rec = records[0]
        assert set(rec) >= {"mask", "bbox", "category", "label", "size"}
        assert rec["category"] == "ship"
        m = rle_decode(rec["mask"])
        assert m.shape == (60, 80)
        assert int(m.sum()) == rec["size"]
        assert isinstance(rec["mask"]["counts"], str)  # ascii, reference parity


def test_generate_sharding(tiny_sam, mini_dataset):
    model, variables = tiny_sam
    predictor = SamPredictor(model, variables, buckets=(4, 16))
    img_dir, ann_dir, save_dir = mini_dataset
    cfg = GenerateConfig(
        dataset="dior", image_dir=img_dir, ann_dir=ann_dir, save_dir=save_dir,
        shard_index=0, shard_count=2,
    )
    assert generate_semantic(cfg, predictor=predictor) == 1
