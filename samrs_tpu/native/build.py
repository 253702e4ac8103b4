"""Lazy cc build + ctypes bindings for the native extensions."""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import List, Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_dir() -> str:
    d = os.path.join(os.path.dirname(__file__), "_build")
    os.makedirs(d, exist_ok=True)
    return d


def get_rle_lib() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the RLE extension; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("SAMRS_NO_NATIVE"):
        return None
    src = os.path.join(os.path.dirname(__file__), "rle_ext.c")
    # Cache key = source content hash (mtime is unreliable: git checkouts do
    # not preserve it, so an mtime gate could load a stale binary).
    import hashlib

    with open(src, "rb") as f:
        tag = hashlib.sha256(f.read()).hexdigest()[:12]
    so = os.path.join(_build_dir(), f"librle_ext_{tag}.so")
    try:
        if not os.path.exists(so):
            for cc in ("cc", "gcc", "clang"):
                try:
                    subprocess.run(
                        [cc, "-O3", "-shared", "-fPIC", "-o", so, src],
                        check=True, capture_output=True,
                    )
                    break
                except (FileNotFoundError, subprocess.CalledProcessError):
                    continue
            else:
                return None
        lib = ctypes.CDLL(so)
        lib.rle_encode_mask.restype = ctypes.c_long
        lib.rle_encode_mask.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ]
        lib.rle_encode_batch.restype = ctypes.c_long
        lib.rle_encode_batch.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
        ]
        _LIB = lib
    except OSError:
        return None
    return _LIB


def native_rle_encode(mask: np.ndarray) -> Optional[bytes]:
    """C-path COCO compressed counts for one (H, W) binary mask, or None."""
    lib = get_rle_lib()
    if lib is None:
        return None
    m = np.ascontiguousarray(mask, np.uint8)
    h, w = m.shape
    cap = max(4 * h * w + 64, 1024)
    out = np.empty(cap, np.uint8)
    n = lib.rle_encode_mask(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
    )
    if n < 0:
        return None
    return bytes(out[:n])


def native_rle_encode_batch(masks: np.ndarray) -> Optional[List[bytes]]:
    """C-path batch encode of (N, H, W) binary masks."""
    lib = get_rle_lib()
    if lib is None:
        return None
    m = np.ascontiguousarray(masks, np.uint8)
    n_masks, h, w = m.shape
    cap = max(4 * h * w * max(n_masks, 1) + 64, 1024)
    out = np.empty(cap, np.uint8)
    offs = np.empty(n_masks, np.int64)
    lens = np.empty(n_masks, np.int64)
    total = lib.rle_encode_batch(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_masks, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), cap,
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
    )
    if total < 0:
        return None
    return [bytes(out[offs[i] : offs[i] + lens[i]]) for i in range(n_masks)]
