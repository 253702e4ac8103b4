"""Golden-value regression: the tiny SAM forward must stay numerically stable
across refactors (catches silent semantic changes in encoder/prompt/decoder).

Regenerate tests/golden_sam_tiny.npz ONLY for intentional numeric changes
(see the capture snippet in git history)."""

import os

import jax.numpy as jnp
import numpy as np

from samrs_tpu.sam.sam import Sam

GOLDEN = os.path.join(os.path.dirname(__file__), "golden_sam_tiny.npz")


def test_sam_forward_matches_golden(tiny_sam):
    model, variables = tiny_sam  # conftest builds with seed 0 — same weights
    rng = np.random.default_rng(12345)
    x = jnp.asarray(rng.random((1, 64, 64, 3)) * 255.0, jnp.float32)
    pts = jnp.asarray([[[10.0, 12.0], [50.0, 44.0]]], jnp.float32)
    labs = jnp.asarray([[2, 3]], jnp.int32)
    masks, iou = model.apply(variables, x, pts, labs, False)
    feats = model.apply(variables, x, method=Sam.encode_image)

    g = np.load(GOLDEN)
    np.testing.assert_allclose(np.asarray(masks), g["masks"], atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(iou), g["iou"], atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(feats[0, :4, :4, :8]), g["feats_slice"], atol=1e-4, rtol=1e-4
    )
