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


def test_masked_anchored_roundtrip():
    import numpy as np
    from tpulc.codecs.bwt.masked import (
        bwt_encode_masked_anchored,
        bwt_decode_masked_anchored,
        forward_masked_anchored,
        inverse_masked_anchored,
    )

    rng = np.random.default_rng(7)
    cap = 4096
    for n in (1, 5, 700, 2049, 4096):
        data = np.zeros(cap, np.uint8)
        data[:n] = rng.integers(0, 10, n)
        last, idx0, anchors, ok = bwt_encode_masked_anchored(
            jnp.asarray(data), jnp.int32(n), 64
        )
        if bool(ok):
            back = bwt_decode_masked_anchored(
                last, jnp.int32(n), idx0, anchors, 64
            )
            assert np.array_equal(np.asarray(back)[:n], data[:n]), n

    # full pipeline with anchors
    data = np.zeros(cap, np.uint8)
    txt = (b"the quick brown fox jumps over the lazy dog " * 60)[:2500]
    data[: len(txt)] = np.frombuffer(txt, np.uint8)
    n = len(txt)
    syms, m, idx0, hist, anchors, ok = forward_masked_anchored(
        jnp.asarray(data), jnp.int32(n), 64
    )
    assert bool(ok)
    back = inverse_masked_anchored(syms, m, jnp.int32(n), idx0, anchors, 64)
    assert np.asarray(back)[:n].tobytes() == txt
