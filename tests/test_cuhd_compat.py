"""CUHD interop: llhuff bitstream layout + self-sync decode."""

import numpy as np

from tpulc.codecs.huffman.cuhd_compat import (
    MAX_CODEWORD_LENGTH,
    cuhd_decode,
    llhuff_encode,
    llhuff_encoder_table,
    llhuff_symbol_lengths,
    load_table,
    save_table,
)


def _encode_memory_serial(data, table):
    """Direct port of `encode_memory` (`llhuffman_encoder.cc:200-239`):
    MSB-first window fill, 32-bit units, zero-padded tail."""
    bits = []
    for s in data:
        code, ln = table[int(s)]
        bits.append(format(code, "b").zfill(ln))
    stream = "".join(bits)
    pad = (-len(stream)) % 32
    stream += "0" * pad
    units = [int(stream[i: i + 32], 2) for i in range(0, len(stream), 32)]
    # demo writes raw uint32 memory -> little-endian on the wire
    return np.array(units, "<u4").tobytes()


def test_llhuff_layout_matches_reference_packer():
    rng = np.random.default_rng(42)
    data = rng.choice(
        np.frombuffer(b"abcdefgh  eeaa", np.uint8), size=5000
    ).astype(np.uint8)
    stream, lengths = llhuff_encode(data)
    table = llhuff_encoder_table(lengths)
    assert stream == _encode_memory_serial(data, table)
    assert max(lengths.values()) <= MAX_CODEWORD_LENGTH


def test_cuhd_roundtrip_selfsync():
    rng = np.random.default_rng(7)
    # skewed distribution like the demo's binomial data
    data = np.clip(rng.binomial(255, 0.5, size=20000), 0, 255).astype(
        np.uint8
    )
    stream, lengths = llhuff_encode(data)
    out = cuhd_decode(stream, lengths, data.shape[0])
    assert np.array_equal(out.astype(np.uint8), data)


def test_cuhd_table_sidecar(tmp_path):
    data = np.frombuffer(b"the quick brown fox " * 50, np.uint8)
    stream, lengths = llhuff_encode(data)
    p = str(tmp_path / "tab.bin")
    save_table(lengths, p)
    assert load_table(p) == lengths
    out = cuhd_decode(stream, load_table(p), data.shape[0])
    assert out.astype(np.uint8).tobytes() == data.tobytes()


def test_single_symbol_input():
    data = np.full(100, 65, np.uint8)
    lengths = llhuff_symbol_lengths(data)
    assert lengths == {65: 1}
    stream, lengths = llhuff_encode(data)
    out = cuhd_decode(stream, lengths, 100)
    assert np.array_equal(out.astype(np.uint8), data)
