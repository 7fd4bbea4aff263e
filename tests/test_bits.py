"""Bit packing/unpacking primitives vs a numpy bit-string oracle."""

import jax.numpy as jnp
import numpy as np

from tpulc.primitives.bits import (
    pack_bits,
    peek_bits,
    bytes_to_words_msb,
    words_msb_to_bytes,
    bitreverse_u32,
)


def _ref_pack(codes, lengths):
    bits = []
    for c, l in zip(codes, lengths):
        if l:
            bits.extend(int(b) for b in f"{c:0{l}b}")
    words = []
    for i in range(0, len(bits), 32):
        chunk = bits[i: i + 32] + [0] * (32 - len(bits[i: i + 32]))
        words.append(int("".join(map(str, chunk)), 2))
    return np.array(words, np.uint32), len(bits)


def test_pack_bits_matches_reference():
    rng = np.random.default_rng(0)
    lengths = rng.integers(0, 13, size=1000).astype(np.int32)
    codes = np.array(
        [rng.integers(0, 1 << l) if l else 0 for l in lengths], np.uint32
    )
    ref_words, ref_bits = _ref_pack(codes, lengths)
    out_words = len(ref_words) + 2
    words, total = pack_bits(jnp.asarray(codes), jnp.asarray(lengths), out_words)
    assert int(total) == ref_bits
    np.testing.assert_array_equal(np.asarray(words)[: len(ref_words)], ref_words)


def test_peek_bits_roundtrip():
    rng = np.random.default_rng(1)
    lengths = rng.integers(1, 13, size=500).astype(np.int32)
    codes = np.array([rng.integers(0, 1 << l) for l in lengths], np.uint32)
    words, _ = pack_bits(jnp.asarray(codes), jnp.asarray(lengths), 300)
    words_p = jnp.concatenate([words, jnp.zeros(2, jnp.uint32)])
    offs = np.cumsum(lengths) - lengths
    for width in (1, 7, 12, 32):
        got = peek_bits(words_p, jnp.asarray(offs, jnp.int32), width)
        # the top `width` bits starting at each offset must begin with the code
        for i in range(0, 500, 97):
            l = int(lengths[i])
            if l <= width:
                assert (int(got[i]) >> (width - l)) == int(codes[i]), i


def test_bytes_words_roundtrip():
    rng = np.random.default_rng(2)
    data = rng.integers(0, 256, size=1001).astype(np.uint8)
    words = bytes_to_words_msb(jnp.asarray(data))
    back = words_msb_to_bytes(words, 1001)
    np.testing.assert_array_equal(np.asarray(back), data)


def test_bitreverse():
    x = jnp.asarray(np.array([0b1011, 0b0001], np.uint32))
    got = bitreverse_u32(x, 4)
    np.testing.assert_array_equal(np.asarray(got), [0b1101, 0b1000])
