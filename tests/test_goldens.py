"""Committed golden regression: frozen tiny-SAM predictor outputs.

The official sam_vit_*.pth weights are not present in this environment
(ROADMAP.md), so end-to-end real-weight parity cannot be captured here;
this golden pins the full predictor numeric path (preprocess -> encode ->
prompt encode -> decode -> postprocess, fp32 CPU) against a committed
artifact instead, catching silent numeric drift without needing torch.
Regenerate intentionally with: python tests/make_golden.py
"""

import pathlib

import numpy as np
import pytest

GOLDEN = pathlib.Path(__file__).parent / "goldens" / "predictor_tiny.npz"


@pytest.fixture(scope="module")
def outputs():
    from make_golden import build

    return build()


def test_predictor_matches_committed_golden(outputs):
    img, boxes, points, bm, biou, blow, pm, piou, plow = outputs
    g = np.load(GOLDEN)
    np.testing.assert_array_equal(img, g["image"])

    want_bm = np.unpackbits(g["box_masks"])[: bm.size].reshape(tuple(g["box_masks_shape"]))
    # thresholded masks: allow a sliver of boundary pixels to flip (fp32
    # reductions can reassociate across compiler versions), no more
    flips = (bm.astype(np.uint8) != want_bm).mean()
    assert flips < 1e-3, f"box mask flip fraction {flips}"
    np.testing.assert_allclose(biou, g["box_iou"], atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(blow, g["box_low"].astype(np.float32), atol=2e-2)

    want_pm = np.unpackbits(g["point_masks"])[: pm.size].reshape(tuple(g["point_masks_shape"]))
    flips = (pm.astype(np.uint8) != want_pm).mean()
    assert flips < 1e-3, f"point mask flip fraction {flips}"
    np.testing.assert_allclose(piou, g["point_iou"], atol=1e-4, rtol=1e-4)
