"""BWT forward/inverse and RLE2 vs serial golds."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpulc.codecs.bwt.rle import rle2_decode, rle2_encode, rle2_encode_np
from tpulc.codecs.bwt.rotsort import bwt_decode, bwt_encode, bwt_encode_np


@pytest.mark.parametrize(
    "s",
    [
        b"banana",
        b"abracadabra",
        b"mississippi",
        b"aaaa",
        b"abab",
        b"abcabcabc",
        b"x",
        bytes(range(256)),
    ],
)
def test_bwt_matches_gold_small(s):
    arr = np.frombuffer(s, np.uint8)
    want_last, want_idx = bwt_encode_np(arr)
    last, idx0 = bwt_encode(jnp.asarray(arr))
    np.testing.assert_array_equal(np.asarray(last), want_last)
    assert int(idx0) == want_idx
    back = bwt_decode(last, idx0)
    np.testing.assert_array_equal(np.asarray(back), arr)


@pytest.mark.parametrize("n", [1000, 4096, 65536])
def test_bwt_roundtrip_random(n):
    rng = np.random.default_rng(n)
    arr = rng.integers(0, 256, size=n).astype(np.uint8)
    last, idx0 = bwt_encode(jnp.asarray(arr))
    back = bwt_decode(last, idx0)
    np.testing.assert_array_equal(np.asarray(back), arr)


def test_bwt_roundtrip_text():
    text = (b"the quick brown fox jumps over the lazy dog. " * 400)[:16384]
    arr = np.frombuffer(text, np.uint8)
    last, idx0 = bwt_encode(jnp.asarray(arr))
    back = bwt_decode(last, idx0)
    np.testing.assert_array_equal(np.asarray(back), arr)
    # BWT of text must cluster: MTF of it should be mostly small
    from tpulc.primitives.mtf import mtf_encode

    enc = np.asarray(mtf_encode(last))
    assert (enc < 16).mean() > 0.8


def test_bwt_periodic_inputs():
    for pat, reps in [(b"ab", 512), (b"abc", 100), (b"\x00", 64)]:
        arr = np.frombuffer(pat * reps, np.uint8)
        last, idx0 = bwt_encode(jnp.asarray(arr))
        back = bwt_decode(last, idx0)
        np.testing.assert_array_equal(np.asarray(back), arr)


def test_bwt_long_range_repeat_pairs():
    """Period-P blocks with n < 2P: rotation pairs (i, i+P) stay tied
    to depth ~P; the refinement loop's periodic-pair shortcut resolves
    them via the first-mismatch scan.  Pinned against the naive gold
    (order, not just round trip) so a wrong pair order cannot hide."""
    from tpulc.codecs.bwt.rotsort import bwt_encode_anchored

    rng = np.random.default_rng(1234)
    cases = []
    for P, n in [(700, 1300), (211, 400), (997, 1900)]:
        s = rng.integers(0, 256, P).astype(np.uint8)
        cases.append(np.concatenate([s, s])[:n])
    with open("tests/data/pg1661.txt", "rb") as f:
        tx = np.frombuffer(f.read()[:900], np.uint8)
    cases.append(np.concatenate([tx, tx])[:1700])
    for arr in cases:
        gl, gi = bwt_encode_np(arr)
        last, idx0 = bwt_encode(jnp.asarray(arr))
        np.testing.assert_array_equal(np.asarray(last), gl)
        assert int(idx0) == gi
        l2, i2, anch, aok = bwt_encode_anchored(jnp.asarray(arr), 256)
        np.testing.assert_array_equal(np.asarray(l2), gl)
        # exact resolution means anchors stay usable on repeat-heavy data
        assert bool(aok)


@pytest.mark.parametrize("zero_frac", [0.0, 0.5, 0.95, 1.0])
def test_rle2_matches_gold(zero_frac):
    rng = np.random.default_rng(17)
    n = 5000
    ranks = rng.integers(1, 256, size=n).astype(np.uint8)
    mask = rng.random(n) < zero_frac
    ranks[mask] = 0
    want = rle2_encode_np(ranks)
    syms, m = rle2_encode(jnp.asarray(ranks))
    m = int(m)
    assert m == len(want)
    np.testing.assert_array_equal(np.asarray(syms)[:m], want)
    # roundtrip
    back, n_dec = rle2_decode(syms, jnp.int32(m))
    assert int(n_dec) == n
    np.testing.assert_array_equal(np.asarray(back)[:n], ranks)


def test_rle2_run_lengths_exhaustive():
    # every run length 1..70 must round-trip exactly
    for L in range(1, 71):
        ranks = np.concatenate(
            [np.zeros(L, np.uint8), np.array([5], np.uint8)]
        )
        want = rle2_encode_np(ranks)
        syms, m = rle2_encode(jnp.asarray(ranks))
        np.testing.assert_array_equal(np.asarray(syms)[: int(m)], want)
        back, n_dec = rle2_decode(syms, m)
        assert int(n_dec) == L + 1
        np.testing.assert_array_equal(np.asarray(back)[: L + 1], ranks)
