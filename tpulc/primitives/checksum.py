"""Checksums: adler32 (libbsc block integrity) and bzip2's MSB-first CRC32.

libbsc stores adler32 of the data, of the compressed payload, and of the
header in every block header (`libbsc/libbsc/libbsc.cpp:211-219`); the
tpulc container does the same.  bzip2 streams carry a per-block and a
combined CRC32 (MSB-first variant) that the .bz2 emitter must reproduce.
"""

from __future__ import annotations

import zlib

import jax
import jax.numpy as jnp
import numpy as np

_MOD = 65521
_CHUNK = 1024  # max weighted partial sum: 1024*1025/2*255 < 2^27, int32-safe


def adler32_np(data: bytes | np.ndarray, value: int = 1) -> int:
    """Host adler32 (zlib-compatible)."""
    buf = data.tobytes() if isinstance(data, np.ndarray) else data
    return zlib.adler32(buf, value) & 0xFFFFFFFF


def adler32(data: jax.Array) -> jax.Array:
    """Device adler32 of uint8[N] -> uint32 scalar (zlib-compatible).

    Fully parallel: per-chunk plain and position-weighted sums, combined
    with modular arithmetic (uint32 products of two residues < 65521
    cannot overflow).
    """
    n = data.shape[0]
    nchunks = -(-n // _CHUNK) if n else 1
    padded = jnp.zeros((nchunks * _CHUNK,), jnp.int32).at[:n].set(
        data.astype(jnp.int32)
    )
    d = padded.reshape(nchunks, _CHUNK)
    s = jnp.sum(d, axis=1) % _MOD                       # S_c
    # W_c = sum_{j} (CHUNK - j) * d[c, j]  (weight of byte j inside chunk)
    w_in = (_CHUNK - jnp.arange(_CHUNK, dtype=jnp.int32))
    w = jnp.sum(d * w_in[None, :], axis=1) % _MOD       # W_c
    # Bytes after chunk c's end: n - min((c+1)*CHUNK, n); padding bytes are
    # zero so using the padded end offsets is exact.
    after = (n - (jnp.arange(nchunks, dtype=jnp.int32) + 1) * _CHUNK) % _MOD
    after = jnp.where(after < 0, after + _MOD, after).astype(jnp.uint32)
    su, wu = s.astype(jnp.uint32), w.astype(jnp.uint32)
    # B = n + sum_i (n - i) * d_i  (mod M), with A0 = 1, B0 = 0.
    contrib = (wu + (after * su) % _MOD) % _MOD
    # Padding chunks contribute W=0, S=0 — safe to sum all.
    b = (jnp.sum(contrib) + jnp.uint32(n % _MOD)) % _MOD
    a = (jnp.sum(su) + jnp.uint32(1)) % _MOD
    return (b << jnp.uint32(16)) | a


# --- bzip2 CRC32: MSB-first, poly 0x04C11DB7, init/xorout 0xFFFFFFFF ---

_BITREV8 = np.array(
    [int(f"{i:08b}"[::-1], 2) for i in range(256)], dtype=np.uint8
)


def crc32_bzip2_np(data: bytes | np.ndarray) -> int:
    """bzip2's CRC32 of a whole buffer (init/xorout 0xFFFFFFFF applied).

    Implemented via the reflection identity: the MSB-first CRC equals the
    bit-reversed reflected CRC of bit-reversed bytes, so zlib's fast
    crc32 does the heavy lifting.
    """
    arr = np.frombuffer(data, np.uint8) if isinstance(data, bytes) else data
    refl = zlib.crc32(_BITREV8[arr].tobytes()) & 0xFFFFFFFF
    return int(f"{refl:032b}"[::-1], 2)


def crc32_bzip2_slow(data: bytes, crc: int = 0xFFFFFFFF) -> int:
    """Reference bit-by-bit MSB-first CRC (test oracle only)."""
    for byte in data:
        crc ^= byte << 24
        for _ in range(8):
            crc = ((crc << 1) ^ 0x04C11DB7) if crc & 0x80000000 else (crc << 1)
            crc &= 0xFFFFFFFF
    return crc ^ 0xFFFFFFFF
