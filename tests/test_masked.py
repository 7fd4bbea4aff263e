"""Masked (dynamic-length) block-sorting pipeline vs the exact-shape one."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpulc.codecs.bwt.masked import (
    bwt_decode_masked,
    bwt_encode_masked,
    forward_masked,
    inverse_masked,
)
from tpulc.codecs.bwt.rotsort import bwt_encode


CAP = 4096


@pytest.mark.parametrize("n", [5, 64, 1000, 4095, 4096])
def test_masked_bwt_matches_exact(n):
    rng = np.random.default_rng(n)
    data = rng.integers(0, 4, size=n).astype(np.uint8)
    padded = np.zeros(CAP, np.uint8)
    padded[:n] = data
    last_m, idx0_m = bwt_encode_masked(jnp.asarray(padded), jnp.int32(n))
    last_e, idx0_e = bwt_encode(jnp.asarray(data))
    np.testing.assert_array_equal(np.asarray(last_m)[:n], np.asarray(last_e))
    assert int(idx0_m) == int(idx0_e)
    back = bwt_decode_masked(last_m, jnp.int32(n), idx0_m)
    np.testing.assert_array_equal(np.asarray(back)[:n], data)


@pytest.mark.parametrize("n", [64, 777, 4000])
def test_masked_full_pipeline_roundtrip(n):
    rng = np.random.default_rng(n + 7)
    data = np.repeat(
        rng.integers(0, 16, size=(n + 31) // 32), 32
    )[:n].astype(np.uint8)
    padded = np.zeros(CAP, np.uint8)
    padded[:n] = data
    syms, m, idx0, hist = forward_masked(jnp.asarray(padded), jnp.int32(n))
    assert int(hist.sum()) == int(m)
    back = inverse_masked(syms, m, jnp.int32(n), idx0)
    np.testing.assert_array_equal(np.asarray(back)[:n], data)
