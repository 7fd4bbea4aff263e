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
    """Decode a .bz2 stream, sizing the output from the stream itself.

    The reference decoder sizes buffers from the stream header
    (`cuda-bzip2-ipdpsw/decompress.c`: `BZh<level>` bounds each block
    at level*100k pre-RLE1 bytes).  RLE1 expansion is unbounded-ratio
    (5 coded bytes -> up to 259 output), so a fixed multiple of the
    compressed size cannot bound the output: start from the header
    bound and grow-and-retry on the decoder's distinct
    buffer-too-small signal.
    """
    from tpulc.gold.lzss_gold import bz2_decompress

    if out_cap is not None:
        return bz2_decompress(buf, out_cap)
    if len(buf) < 4 or buf[:3] != b"BZh" or not (0x31 <= buf[3] <= 0x39):
        raise ValueError("invalid .bz2 stream")
    level = buf[3] - 0x30
    # >= 1 block; each block holds <= level*100k post-RLE1 bytes, which
    # expand < 52x through inverse RLE1 — one block's worth is a good
    # first guess, doubling covers multi-block streams geometrically.
    out_cap = max(64 * len(buf), 52 * 100_000 * level)
    while True:
        try:
            return bz2_decompress(buf, out_cap)
        except BufferError:
            out_cap *= 2
