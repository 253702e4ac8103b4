"""AMG utility + automatic mask generator tests."""

import numpy as np
import pytest

from samrs_tpu.sam.amg import (
    MaskData,
    batched_mask_to_box,
    box_nms,
    build_all_layer_point_grids,
    build_point_grid,
    calculate_stability_score,
    coco_encode_rle,
    generate_crop_boxes,
    is_box_near_crop_edge,
    mask_to_rle,
    remove_small_regions,
    rle_to_mask,
    uncrop_masks,
)


def test_maskdata_filter_cat():
    d = MaskData(a=np.arange(5), b=[f"x{i}" for i in range(5)])
    d.filter(np.array([True, False, True, False, True]))
    np.testing.assert_array_equal(d["a"], [0, 2, 4])
    assert d["b"] == ["x0", "x2", "x4"]
    d2 = MaskData(a=np.array([9]), b=["y"])
    d.cat(d2)
    np.testing.assert_array_equal(d["a"], [0, 2, 4, 9])
    assert d["b"][-1] == "y"


def test_stability_score():
    masks = np.full((1, 10, 10), -10.0, np.float32)  # strongly negative bg
    masks[0, :5] = 2.0  # strongly positive half
    s = calculate_stability_score(masks, 0.0, 1.0)
    assert s[0] == 1.0  # same area at +-1 thresholds
    masks[0, 5:7] = 0.5  # rows between the two thresholds
    s = calculate_stability_score(masks, 0.0, 1.0)
    assert s[0] == 50 / 70


def test_point_grids():
    g = build_point_grid(4)
    assert g.shape == (16, 2)
    assert g.min() > 0 and g.max() < 1
    grids = build_all_layer_point_grids(8, 2, 2)
    assert [len(x) for x in grids] == [64, 16, 4]


def test_crop_boxes():
    boxes, layers = generate_crop_boxes((100, 200), 1, 0.2)
    assert boxes[0] == [0, 0, 200, 100] and layers[0] == 0
    assert all(l == 1 for l in layers[1:]) and len(boxes) == 5
    for b in boxes[1:]:
        assert b[2] <= 200 and b[3] <= 100


def test_mask_box_nms():
    masks = np.zeros((3, 20, 20), bool)
    masks[0, 2:8, 3:9] = True
    masks[1, 2:8, 3:9] = True  # duplicate
    masks[2, 12:18, 12:18] = True
    boxes = batched_mask_to_box(masks)
    # reference convention: right/bottom are INCLUSIVE max indices (amg.py:321-332)
    np.testing.assert_array_equal(boxes[0], [3, 2, 8, 7])
    keep = box_nms(boxes.astype(np.float32), np.array([0.9, 0.8, 0.7]), 0.5)
    assert sorted(keep.tolist()) == [0, 2]


def test_box_near_crop_edge():
    boxes = np.array([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32)
    near = is_box_near_crop_edge(boxes, [0, 0, 100, 100], [0, 0, 200, 200], atol=5)
    assert near.tolist() == [False, False]  # near image edge doesn't count... crop==0,0
    near = is_box_near_crop_edge(boxes, [0, 0, 100, 100], [0, 0, 100, 100], atol=5)
    assert near.tolist() == [False, False]  # crop == image


def test_remove_small_regions():
    mask = np.zeros((20, 20), np.uint8)
    mask[2:12, 2:12] = 1
    mask[5, 5] = 0  # small hole
    mask[15, 15] = 1  # small island
    out, changed = remove_small_regions(mask.astype(bool), 4, "holes")
    assert changed and out[5, 5]
    out2, changed2 = remove_small_regions(out, 4, "islands")
    assert changed2 and not out2[15, 15]


def test_rle_roundtrip_uncompressed():
    m = np.random.default_rng(0).random((13, 17)) > 0.5
    rle = mask_to_rle(m)
    assert isinstance(rle["counts"], list)
    np.testing.assert_array_equal(rle_to_mask(rle), m)
    crle = coco_encode_rle(rle)
    assert isinstance(crle["counts"], str)
    from samrs_tpu.data.rle import rle_decode

    np.testing.assert_array_equal(rle_decode(crle).astype(bool), m)


def test_uncrop_masks():
    m = np.ones((1, 4, 4), bool)
    out = uncrop_masks(m, [2, 3, 6, 7], 10, 12)
    assert out.shape == (1, 10, 12)
    assert out[0, 3:7, 2:6].all() and out.sum() == 16


def test_automatic_mask_generator_runs(tiny_sam):
    from samrs_tpu.sam.automatic_mask_generator import SamAutomaticMaskGenerator
    from samrs_tpu.sam.predictor import SamPredictor

    model, variables = tiny_sam
    pred = SamPredictor(model, variables, buckets=(16, 64))
    gen = SamAutomaticMaskGenerator(
        pred, points_per_side=4, points_per_batch=16,
        pred_iou_thresh=0.0, stability_score_thresh=0.0,
    )
    img = (np.random.default_rng(3).random((48, 64, 3)) * 255).astype(np.uint8)
    anns = gen.generate(img)
    # random model: just check schema and geometry consistency
    for a in anns:
        assert set(a) >= {
            "segmentation", "area", "bbox", "predicted_iou", "point_coords",
            "stability_score", "crop_box",
        }
        assert a["segmentation"].shape == (48, 64)
        assert a["area"] == int(a["segmentation"].sum())


def test_packbits_roundtrip():
    """Device packbits2d must invert exactly through np.unpackbits, incl.
    widths that are not multiples of 8."""
    import jax.numpy as jnp

    from samrs_tpu.sam.predictor import packbits2d, unpackbits2d

    rng = np.random.default_rng(0)
    for shape in [(3, 16, 24), (2, 5, 13), (1, 7, 8), (4, 1024 // 16, 100)]:
        m = rng.random(shape) > 0.5
        packed = np.asarray(packbits2d(jnp.asarray(m)))
        assert packed.shape == (*shape[:-1], -(-shape[-1] // 8))
        got = unpackbits2d(packed, shape[-1])
        np.testing.assert_array_equal(got, m)
        # matches np.packbits bit order exactly
        np.testing.assert_array_equal(packed, np.packbits(m, axis=-1))
