import numpy as np
import pytest

from samrs_tpu.data.rle import (
    rle_area,
    rle_decode,
    rle_encode,
    rle_to_bbox,
    _decode_counts,
    _encode_counts,
    _mask_to_counts,
)
from samrs_tpu.geometry.obb import get_best_begin_point, obb2poly, poly2obb, poly_to_hbb


def test_rle_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(5):
        m = (rng.random((37, 53)) > 0.7).astype(np.uint8)
        rle = rle_encode(m)
        back = rle_decode(rle)
        np.testing.assert_array_equal(m, back)
        assert rle_area(rle) == int(m.sum())


def test_rle_counts_column_major():
    m = np.zeros((3, 4), np.uint8)
    m[0, 0] = 1  # first pixel in Fortran order
    counts = _mask_to_counts(m)
    assert counts[0] == 0 and counts[1] == 1 and counts[2] == 11


def test_rle_varint_roundtrip():
    for counts in ([0, 5, 7], [3, 1000000, 2, 2, 2], [0, 1, 1, 1, 1, 1]):
        assert _decode_counts(_encode_counts(counts)) == counts


def test_rle_matches_pycocotools_format():
    """Golden value: COCO-compressed counts for a known tiny mask.

    Cross-checked against pycocotools semantics: mask 2x2 with fortran-flat
    [1,0,0,1] -> counts [0,1,2,1]."""
    m = np.array([[1, 0], [0, 1]], np.uint8)
    counts = list(_mask_to_counts(m))
    assert counts == [0, 1, 2, 1]


def test_rle_bbox():
    m = np.zeros((10, 10), np.uint8)
    m[2:5, 3:8] = 1
    assert rle_to_bbox(rle_encode(m)) == (3.0, 2.0, 5.0, 3.0)


def test_obb_poly_roundtrip():
    rng = np.random.default_rng(1)
    n = 16
    obb = np.stack(
        [
            rng.uniform(100, 200, n),
            rng.uniform(100, 200, n),
            rng.uniform(20, 50, n),
            rng.uniform(5, 19, n),
            rng.uniform(-np.pi / 2 + 0.01, np.pi / 2 - 0.01, n),
        ],
        axis=1,
    )
    poly = obb2poly(obb, "le90")
    back = poly2obb(poly, "le90")
    np.testing.assert_allclose(back[:, :2], obb[:, :2], atol=1e-2)
    np.testing.assert_allclose(np.sort(back[:, 2:4]), np.sort(obb[:, 2:4]), atol=1e-1)


def test_poly_to_hbb():
    poly = np.array([[0, 0, 10, 0, 10, 5, 0, 5]], np.float64)
    hbb = poly_to_hbb(poly)
    np.testing.assert_allclose(hbb, [[0, 0, 10, 5]])


def test_get_best_begin_point():
    # square with vertices listed starting at bottom-right: canonical order
    # should rotate to start nearest top-left
    p = np.array([[10, 10, 0, 10, 0, 0, 10, 0]], np.float64)
    out = get_best_begin_point(p).reshape(4, 2)
    np.testing.assert_allclose(out[0], [0, 0])
