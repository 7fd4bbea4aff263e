"""ctypes bindings for the CPU gold codecs (native C library).

The gold library plays the role the reference's CPU codecs play in its
test strategy (SURVEY.md §4): a bit-exact, independently implemented
oracle.  Built on demand with `make` (cc -shared).
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libtpulc_gold.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) or os.path.getmtime(_SO) < max(
        os.path.getmtime(os.path.join(_DIR, "csrc", f))
        for f in os.listdir(os.path.join(_DIR, "csrc"))
    ):
        subprocess.run(["make", "-C", _DIR], check=True, capture_output=True)
    _lib = ctypes.CDLL(_SO)
    _lib.lzss_gold_encode.restype = ctypes.c_long
    _lib.lzss_gold_encode.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
    ]
    _lib.lzss_gold_decode.restype = ctypes.c_long
    _lib.lzss_gold_decode.argtypes = _lib.lzss_gold_encode.argtypes
    return _lib


def _as_buf(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def lzss_encode(data: bytes | np.ndarray) -> bytes:
    lib = _load()
    arr = np.frombuffer(data, np.uint8) if isinstance(data, (bytes, bytearray)) \
        else np.ascontiguousarray(data, np.uint8)
    cap = 2 * max(len(arr), 64) + 64
    out = np.zeros(cap, np.uint8)
    n = lib.lzss_gold_encode(_as_buf(arr), len(arr), _as_buf(out), cap)
    if n < 0:
        raise RuntimeError("gold lzss encode overflow")
    return out[:n].tobytes()


def lzss_decode(data: bytes | np.ndarray, out_cap: int) -> bytes:
    lib = _load()
    arr = np.frombuffer(data, np.uint8) if isinstance(data, (bytes, bytearray)) \
        else np.ascontiguousarray(data, np.uint8)
    out = np.zeros(max(out_cap, 1), np.uint8)
    n = lib.lzss_gold_decode(_as_buf(arr), len(arr), _as_buf(out), out_cap)
    if n < 0:
        raise RuntimeError("gold lzss decode overflow")
    return out[:n].tobytes()


def bz2_decompress(data: bytes | np.ndarray, out_cap: int) -> bytes:
    """Native .bz2 decode via the gold C library."""
    lib = _load()
    if not hasattr(lib.bz2_gold_decompress, "_configured"):
        lib.bz2_gold_decompress.restype = ctypes.c_long
        lib.bz2_gold_decompress.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_long,
        ]
        lib.bz2_gold_decompress._configured = True
    arr = np.frombuffer(data, np.uint8) if isinstance(data, (bytes, bytearray)) \
        else np.ascontiguousarray(data, np.uint8)
    out = np.zeros(max(out_cap, 1), np.uint8)
    n = lib.bz2_gold_decompress(_as_buf(arr), len(arr), _as_buf(out), out_cap)
    if n == -2:
        raise BufferError("bz2 output buffer too small")
    if n == -3:
        raise ValueError("bz2 CRC mismatch (corrupt stream)")
    if n < 0:
        raise ValueError("invalid .bz2 stream")
    return out[:n].tobytes()
