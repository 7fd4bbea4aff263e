"""Checksum primitives vs zlib and a bit-by-bit CRC oracle."""

import zlib

import jax.numpy as jnp
import numpy as np

from tpulc.primitives.checksum import (
    adler32,
    adler32_np,
    crc32_bzip2_np,
    crc32_bzip2_slow,
)


def test_adler32_device_matches_zlib():
    rng = np.random.default_rng(3)
    for n in (0, 1, 17, 1024, 5000, 70000):
        data = rng.integers(0, 256, size=n).astype(np.uint8)
        want = zlib.adler32(data.tobytes()) & 0xFFFFFFFF
        got = int(adler32(jnp.asarray(data)))
        assert got == want, n
        assert adler32_np(data) == want


def test_crc32_bzip2_matches_slow_oracle():
    rng = np.random.default_rng(4)
    for n in (0, 1, 7, 300):
        data = rng.integers(0, 256, size=n).astype(np.uint8).tobytes()
        assert crc32_bzip2_np(data) == crc32_bzip2_slow(data), n
