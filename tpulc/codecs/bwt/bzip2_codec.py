"""The `bzip2` codec: emits/reads REAL .bz2 files (no tpulc container).

Compression is the bit-exact device-assisted emitter (bz2stream);
decompression uses the native C decoder in the gold library — the same
CPU-decode arrangement as the reference (`decompress.c` does all
cuda-bzip2 decompression, README.md:82-84).
"""

from __future__ import annotations

import numpy as np

from tpulc.codecs.bwt.bz2stream import bz2_compress


def compress(data: bytes | np.ndarray, block_size: int = 900_000,
             level: int | None = None) -> bytes:
    if level is None:
        level = max(1, min(9, block_size // 100_000))
    arr = np.frombuffer(data, np.uint8) if isinstance(data, (bytes, bytearray)) \
        else np.asarray(data, np.uint8)
    return bz2_compress(arr, level)


def decompress(buf: bytes, out_cap: int | None = None) -> bytes:
    from tpulc.gold.lzss_gold import bz2_decompress

    if out_cap is None:
        out_cap = max(64 * len(buf), 1 << 20)  # bzip2 max ratio is huge
    return bz2_decompress(buf, out_cap)
