"""Fused AMG postprocess kernel vs the XLA composition oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from samrs_tpu.kernels.amg_post import amg_postprocess
from samrs_tpu.sam.sam import postprocess_masks


@pytest.mark.parametrize(
    "g,img_size,input_size,original_size",
    [
        (16, 64, (64, 64), (64, 64)),      # square full tile (identity stage 2)
        (16, 64, (48, 64), (37, 50)),      # resized rectangular image
        (32, 128, (128, 96), (200, 150)),  # upscale beyond img_size
    ],
)
def test_amg_post_matches_oracle(g, img_size, input_size, original_size):
    rng = np.random.default_rng(0)
    M = 5
    mt, off = 0.0, 1.0
    lowres = jnp.asarray(rng.standard_normal((M, g, g)) * 2.0, jnp.float32)

    ref = np.asarray(postprocess_masks(lowres[None], input_size,
                                       original_size, img_size)[0])
    hi, lo, boxes, packed = amg_postprocess(
        lowres, input_size, original_size, img_size, mt, off, interpret=True)

    np.testing.assert_array_equal(np.asarray(hi), (ref > mt + off).sum((-1, -2)))
    np.testing.assert_array_equal(np.asarray(lo), (ref > mt - off).sum((-1, -2)))

    mb = ref > mt
    H, W = original_size
    for m in range(M):
        ys, xs = np.nonzero(mb[m])
        want = ([xs.min(), ys.min(), xs.max(), ys.max()]
                if len(ys) else [0, 0, 0, 0])
        np.testing.assert_array_equal(np.asarray(boxes)[m], want)

    want_packed = np.packbits(mb, axis=-1)
    got_packed = np.asarray(packed).astype(np.uint8)
    np.testing.assert_array_equal(got_packed, want_packed)


def test_amg_post_empty_and_full_masks():
    g, img_size = 16, 64
    lowres = jnp.stack([
        jnp.full((g, g), -5.0, jnp.float32),   # empty
        jnp.full((g, g), 5.0, jnp.float32),    # full
    ])
    hi, lo, boxes, packed = amg_postprocess(
        lowres, (64, 64), (60, 61), img_size, 0.0, 1.0, interpret=True)
    assert float(hi[0]) == 0 and float(lo[0]) == 0
    np.testing.assert_array_equal(np.asarray(boxes)[0], [0, 0, 0, 0])
    assert float(hi[1]) == 60 * 61
    np.testing.assert_array_equal(np.asarray(boxes)[1], [0, 0, 60, 59])
    mb = np.unpackbits(np.asarray(packed[1]).astype(np.uint8), axis=-1)[:, :61]
    assert mb.all()
