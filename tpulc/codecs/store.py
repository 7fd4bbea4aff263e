"""Raw store codec — the incompressible fallback.

Mirrors the reference's resilience pattern: CULZSS stores the raw block
when compression grew (`culzss.c:176-183`), libbsc returns
LIBBSC_NOT_COMPRESSIBLE and uses `bsc_store` (`libbsc.cpp`).
"""

from __future__ import annotations

import numpy as np

from tpulc.pipeline.container import Container
from tpulc.pipeline.registry import CODEC_STORE
from tpulc.primitives.checksum import adler32_np


def compress(data: bytes | np.ndarray, block_size: int = 1 << 20) -> bytes:
    arr = np.frombuffer(data, np.uint8) if isinstance(data, (bytes, bytearray)) \
        else np.asarray(data, np.uint8)
    n = arr.shape[0]
    payloads = [
        arr[s: s + block_size].tobytes() for s in range(0, max(n, 1), block_size)
    ]
    c = Container(
        codec_id=CODEC_STORE, flags=0, orig_len=n, block_size=block_size,
        comp_sizes=[len(p) for p in payloads], payloads=payloads,
        data_adler=adler32_np(arr),
    )
    return c.to_bytes()


def decompress(buf: bytes) -> bytes:
    c = Container.from_bytes(buf)
    assert c.codec_id == CODEC_STORE
    out = b"".join(c.payloads)[: c.orig_len]
    if not c.verify_data(np.frombuffer(out, np.uint8)):
        raise ValueError("data checksum mismatch")
    return out
