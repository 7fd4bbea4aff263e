"""Multi-table Huffman group refinement (bzip2 sendMTFValues analogue,
`cuda-bzip2-ipdpsw/compress.c:242-600`)."""

import numpy as np
import jax.numpy as jnp
import pytest

from tpulc.codecs.bwt import driver
from tpulc.codecs.bwt.multitable import groups_for, refine_tables
from tpulc.codecs.bwt.rle import ALPHABET


def test_groups_for_schedule():
    assert groups_for(100) == 2
    assert groups_for(500) == 3
    assert groups_for(1000) == 4
    assert groups_for(2000) == 5
    assert groups_for(100000) == 6


def test_refine_separates_disjoint_statistics():
    # two interleaved populations with disjoint alphabets must land in
    # different tables, and the cluster histograms must be exact
    rng = np.random.default_rng(0)
    chunk = 128
    nchunks = 64
    syms = np.zeros(nchunks * chunk, np.int32)
    for c in range(nchunks):
        lo, hi = (0, 8) if c % 2 == 0 else (100, 140)
        syms[c * chunk: (c + 1) * chunk] = rng.integers(lo, hi, chunk)
    m = syms.shape[0]
    sel, clhist = refine_tables(
        jnp.asarray(syms), jnp.int32(m), chunk, 4
    )
    sel = np.asarray(sel)
    clhist = np.asarray(clhist)
    # the two populations never share a table (refinement may split a
    # population across several tables, but must not mix populations)
    assert set(sel[0::2]).isdisjoint(set(sel[1::2]))
    # exact per-symbol accounting
    assert clhist.sum() == m
    want = np.bincount(syms, minlength=ALPHABET)
    np.testing.assert_array_equal(clhist.sum(axis=0), want)


@pytest.mark.parametrize("pattern", ["mixed", "uniform"])
def test_mt_roundtrip(pattern):
    rng = np.random.default_rng(3)
    if pattern == "mixed":
        # alternating text-ish and binary-ish segments force multiple
        # tables into actual use
        parts = []
        for i in range(40):
            if i % 2 == 0:
                parts.append(rng.choice(
                    list(b"the quick brown fox "), 2000
                ).astype(np.uint8))
            else:
                parts.append(rng.integers(0, 256, 2000, dtype=np.uint8))
        data = np.concatenate(parts).tobytes()
    else:
        data = rng.integers(97, 104, 60000, dtype=np.uint8).tobytes()
    comp = driver.compress(data, block_size=1 << 17)
    out = driver.decompress(comp)
    assert out == data


def test_mt_beats_single_table_on_mixed_statistics():
    rng = np.random.default_rng(5)
    parts = []
    for i in range(32):
        lo, hi = (97, 105) if i % 2 == 0 else (0, 256)
        parts.append(rng.integers(lo, hi, 4096, dtype=np.uint8))
    data = np.concatenate(parts).tobytes()  # exactly 1<<17 bytes
    # 1<<17 shares the compiled cap with the roundtrip tests above
    comp = driver.compress(data, block_size=1 << 17)
    # single-table encoder: the standalone block API at the same cap
    single = driver.compress_block(np.frombuffer(data, np.uint8), 1 << 17)
    assert len(comp) < 0.93 * len(single), (len(comp), len(single))
