"""MTF scan kernels vs the serial gold (cudpp `computeMtfGold` pattern)."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpulc.primitives.mtf import mtf_decode, mtf_encode, mtf_encode_np


def _rand(n, seed, alphabet=256):
    rng = np.random.default_rng(seed)
    return rng.integers(0, alphabet, size=n).astype(np.uint8)


@pytest.mark.parametrize("alphabet", [2, 16, 256])
@pytest.mark.parametrize("n", [128, 4096])
def test_mtf_encode_matches_gold(n, alphabet):
    data = _rand(n, n + alphabet, alphabet)
    want = mtf_encode_np(data)
    got = np.asarray(mtf_encode(jnp.asarray(data)))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("n", [128, 512, 8192])
def test_mtf_roundtrip(n):
    data = _rand(n, n)
    enc = mtf_encode(jnp.asarray(data))
    dec = np.asarray(mtf_decode(enc))
    np.testing.assert_array_equal(dec, data)


def test_mtf_text_like_bias():
    # BWT-like clustered data must MTF to small ranks mostly
    data = np.repeat(_rand(128, 99), 32)[:4096]
    enc = np.asarray(mtf_encode(jnp.asarray(data)))
    assert (enc == 0).mean() > 0.9
    dec = np.asarray(mtf_decode(jnp.asarray(enc)))
    np.testing.assert_array_equal(dec, data)


def test_mtf_chunk_sizes():
    data = _rand(2048, 123)
    want = mtf_encode_np(data)
    for chunk in (64, 128, 256):
        got = np.asarray(mtf_encode(jnp.asarray(data), chunk=chunk))
        np.testing.assert_array_equal(got, want)
        back = np.asarray(mtf_decode(jnp.asarray(got), chunk=chunk))
        np.testing.assert_array_equal(back, data)
