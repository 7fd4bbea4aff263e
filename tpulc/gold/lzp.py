"""ctypes wrapper for the native LZP stage."""

from __future__ import annotations

import ctypes

import numpy as np

from tpulc.gold.lzss_gold import _load, _as_buf

DEFAULT_HASH_BITS = 18
DEFAULT_MIN_LEN = 32


def _fn(lib, name):
    fn = getattr(lib, name)
    if not getattr(fn, "_configured", False):
        fn.restype = ctypes.c_long
        fn.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.c_int, ctypes.c_int,
        ]
        fn._configured = True
    return fn


def lzp_encode(data: bytes | np.ndarray, hash_bits: int = DEFAULT_HASH_BITS,
               min_len: int = DEFAULT_MIN_LEN) -> bytes | None:
    """Returns the LZP stream, or None if it would not shrink the data."""
    lib = _load()
    arr = np.frombuffer(data, np.uint8) if isinstance(data, (bytes, bytearray)) \
        else np.ascontiguousarray(data, np.uint8)
    if arr.size < 64:
        return None
    cap = arr.size  # only accept actual shrinkage
    out = np.zeros(cap, np.uint8)
    n = _fn(lib, "lzp_gold_encode")(
        _as_buf(arr), arr.size, _as_buf(out), cap, hash_bits, min_len
    )
    if n < 0 or n >= arr.size:
        return None
    return out[:n].tobytes()


def lzp_decode(data: bytes | np.ndarray, out_cap: int,
               hash_bits: int = DEFAULT_HASH_BITS,
               min_len: int = DEFAULT_MIN_LEN) -> bytes:
    lib = _load()
    arr = np.frombuffer(data, np.uint8) if isinstance(data, (bytes, bytearray)) \
        else np.ascontiguousarray(data, np.uint8)
    out = np.zeros(max(out_cap, 1), np.uint8)
    n = _fn(lib, "lzp_gold_decode")(
        _as_buf(arr), arr.size, _as_buf(out), out_cap, hash_bits, min_len
    )
    if n < 0:
        raise ValueError("invalid LZP stream")
    return out[:n].tobytes()
