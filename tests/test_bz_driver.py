"""bz codec end-to-end: container round trip + ratio sanity."""

import numpy as np
import pytest

from tpulc.codecs.bwt import driver


def test_bz_roundtrip_text():
    text = (b"the quick brown fox jumps over the lazy dog. " * 1200)[:50000]
    comp = driver.compress(text, block_size=32768)
    back = driver.decompress(comp)
    assert back == text
    # repetitive text through BWT+MTF+RLE2+Huffman must compress hard
    assert len(comp) < len(text) // 4


def test_bz_roundtrip_random():
    rng = np.random.default_rng(21)
    data = rng.integers(0, 256, size=70000).astype(np.uint8).tobytes()
    comp = driver.compress(data, block_size=32768)
    assert driver.decompress(comp) == data


def test_bz_roundtrip_structured():
    # wikipedia-ish: words with skewed distribution
    rng = np.random.default_rng(22)
    words = [b"the ", b"and ", b"compression ", b"block ", b"a ", b"of "]
    data = b"".join(words[i] for i in rng.integers(0, 6, size=20000))[:80000]
    comp = driver.compress(data, block_size=32768)
    assert driver.decompress(comp) == data
    ratio = len(data) / len(comp)
    assert ratio > 3.0, ratio


def test_bz_edge_sizes():
    for n in (1, 63, 64, 65, 1000):
        rng = np.random.default_rng(n)
        data = rng.integers(0, 4, size=n).astype(np.uint8).tobytes()
        comp = driver.compress(data, block_size=1024)
        assert driver.decompress(comp) == data


def test_bz_vs_real_bzip2_ratio():
    """Compressed size should be in the same league as real bzip2."""
    import bz2

    text = (
        b"It was the best of times, it was the worst of times, it was the "
        b"age of wisdom, it was the age of foolishness, it was the epoch "
        b"of belief, it was the epoch of incredulity. " * 500
    )
    # 1<<17 shares the compiled cap with test_multitable (the CPU-suite
    # wall clock is dominated by per-cap XLA compiles on small hosts)
    ours = driver.compress(text, block_size=1 << 17)
    theirs = bz2.compress(text, 9)
    # within 2x of libbzip2 (no multi-table Huffman yet)
    assert len(ours) < 2 * len(theirs), (len(ours), len(theirs))


def test_bz_mixed_anchor_group():
    """Text blocks (multi-table, anchored) + a zero-padded tail whose
    refinement exhausts (anchor-less, single-table) in one batch group
    must decode: the fallback partitions the group instead of assuming
    all-single-table (regression: fused-compress verify drive)."""
    with open("tests/data/pg1661.txt", "rb") as f:
        data = f.read(150000)
    comp = driver.compress(data, block_size=1 << 16)
    assert driver.decompress(comp) == data
