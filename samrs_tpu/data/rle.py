"""COCO-compatible run-length-encoding codec, dependency-free.

The reference stores per-instance masks as pycocotools compressed RLE dicts
(`maskUtils.encode`, GD/main_sam_hbox_semantic.py:201-206) and the prompt-eval
harness round-trips them for COCO JSON export (GD/instance_to_json.py).
pycocotools is not available here, so this module implements the exact COCO
byte format (column-major runs, delta + 5-bit varint chars offset by 48) so
produced pkls/JSONs are bit-compatible with pycocotools consumers.

Run extraction is vectorized numpy (np.flatnonzero over the Fortran-flattened
mask) — the reference's C loop equivalent, no per-pixel Python.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple, Union

import numpy as np

RLE = Dict[str, Union[Tuple[int, int], List[int], bytes, str]]


def _mask_to_counts(mask: np.ndarray) -> np.ndarray:
    """Binary (H, W) mask -> COCO run counts (column-major, starts with 0-run)."""
    flat = np.asarray(mask, np.uint8).flatten(order="F")
    n = flat.size
    # boundaries where the value changes
    change = np.flatnonzero(flat[1:] != flat[:-1]) + 1
    idx = np.concatenate([[0], change, [n]])
    counts = np.diff(idx)
    if flat.size and flat[0] == 1:  # counts must start with a zero-run
        counts = np.concatenate([[0], counts])
    return counts.astype(np.int64)


def _counts_to_mask(counts: Sequence[int], size: Tuple[int, int]) -> np.ndarray:
    h, w = size
    total = h * w
    counts = np.asarray(counts, np.int64)
    vals = np.zeros(len(counts), np.uint8)
    vals[1::2] = 1
    flat = np.repeat(vals, counts)
    if flat.size < total:
        flat = np.concatenate([flat, np.zeros(total - flat.size, np.uint8)])
    return flat[:total].reshape((h, w), order="F")


def _encode_counts(counts: Sequence[int]) -> bytes:
    """COCO compressed counts string (delta + 5-bit varint chars + 48)."""
    out = bytearray()
    cnts = list(map(int, counts))
    for i, x in enumerate(cnts):
        if i > 2:
            x -= cnts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = (x != -1) if (c & 0x10) else (x != 0)
            if more:
                c |= 0x20
            out.append(c + 48)
    return bytes(out)


def _decode_counts(s: Union[bytes, str]) -> List[int]:
    if isinstance(s, str):
        s = s.encode("ascii")
    cnts: List[int] = []
    i = 0
    while i < len(s):
        x = 0
        k = 0
        more = True
        while more:
            c = s[i] - 48
            x |= (c & 0x1F) << (5 * k)
            more = bool(c & 0x20)
            i += 1
            k += 1
            if not more and (c & 0x10):
                x |= -1 << (5 * k)
        if len(cnts) > 2:
            x += cnts[-2]
        cnts.append(x)
    return cnts


def rle_encode(mask: np.ndarray) -> RLE:
    """Binary (H, W) mask -> compressed COCO RLE dict (maskUtils.encode parity).

    Routes through the native C encoder (samrs_tpu/native/rle_ext.c) when the
    toolchain built it; numpy+Python fallback otherwise."""
    h, w = mask.shape
    try:
        from samrs_tpu.native.build import native_rle_encode

        counts = native_rle_encode(mask)
    except Exception:
        counts = None
    if counts is None:
        counts = _encode_counts(_mask_to_counts(mask))
    return {"size": [int(h), int(w)], "counts": counts}


def rle_decode(rle: RLE) -> np.ndarray:
    """Compressed or uncompressed RLE dict -> binary (H, W) uint8 mask."""
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        counts = _decode_counts(counts)
    return _counts_to_mask(counts, tuple(rle["size"]))


def rle_area(rle: RLE) -> int:
    """Foreground pixel count (maskUtils.area parity)."""
    counts = rle["counts"]
    if isinstance(counts, (bytes, str)):
        counts = _decode_counts(counts)
    return int(sum(counts[1::2]))


def rle_to_bbox(rle: RLE) -> Tuple[float, float, float, float]:
    """xywh bounding box of the mask (maskUtils.toBbox parity)."""
    m = rle_decode(rle)
    ys, xs = np.nonzero(m)
    if xs.size == 0:
        return (0.0, 0.0, 0.0, 0.0)
    x0, x1 = xs.min(), xs.max()
    y0, y1 = ys.min(), ys.max()
    return (float(x0), float(y0), float(x1 - x0 + 1), float(y1 - y0 + 1))


def masks_to_rles(masks: np.ndarray) -> List[RLE]:
    """(N, H, W) binary stack -> list of compressed RLEs."""
    return [rle_encode(m) for m in np.asarray(masks)]
