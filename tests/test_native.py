"""Native C RLE encoder vs the Python oracle."""

import numpy as np
import pytest

from samrs_tpu.data.rle import _encode_counts, _mask_to_counts, rle_decode
from samrs_tpu.native.build import get_rle_lib, native_rle_encode, native_rle_encode_batch


pytestmark = pytest.mark.skipif(get_rle_lib() is None, reason="no C toolchain")


def test_native_matches_python():
    rng = np.random.default_rng(0)
    for shape in [(13, 17), (1, 1), (64, 64), (100, 3)]:
        m = (rng.random(shape) > 0.6).astype(np.uint8)
        expect = _encode_counts(_mask_to_counts(m))
        got = native_rle_encode(m)
        assert got == expect, shape


def test_native_edge_cases():
    for m in [np.zeros((5, 5), np.uint8), np.ones((5, 5), np.uint8)]:
        expect = _encode_counts(_mask_to_counts(m))
        assert native_rle_encode(m) == expect


def test_native_batch():
    rng = np.random.default_rng(1)
    masks = (rng.random((4, 20, 30)) > 0.5).astype(np.uint8)
    outs = native_rle_encode_batch(masks)
    assert outs is not None and len(outs) == 4
    for m, c in zip(masks, outs):
        assert c == _encode_counts(_mask_to_counts(m))
        np.testing.assert_array_equal(
            rle_decode({"size": [20, 30], "counts": c}), m
        )


def test_native_roundtrip_through_rle_encode():
    from samrs_tpu.data.rle import rle_encode

    m = (np.random.default_rng(2).random((48, 64)) > 0.5).astype(np.uint8)
    rle = rle_encode(m)
    np.testing.assert_array_equal(rle_decode(rle), m)


def test_native_speedup():
    """The C path should comfortably beat Python varint encoding."""
    import time

    rng = np.random.default_rng(3)
    m = (rng.random((1024, 1024)) > 0.5).astype(np.uint8)  # worst case: many runs
    t0 = time.perf_counter()
    for _ in range(3):
        native_rle_encode(m)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    _encode_counts(_mask_to_counts(m))
    t_py = time.perf_counter() - t0
    assert t_native / 3 < t_py  # conservative: at least parity per call
