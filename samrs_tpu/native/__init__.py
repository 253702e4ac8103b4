"""Native (C) host-side components, loaded via ctypes.

Build happens lazily at import with the system compiler; everything has a
pure-Python fallback so the package works without a toolchain (set
SAMRS_NO_NATIVE=1 to force the fallback).
"""

from samrs_tpu.native.build import get_rle_lib, native_rle_encode  # noqa: F401
