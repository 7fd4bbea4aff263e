"""ST-k sort transform: forward vs naive gold, inverse round trip."""

import jax.numpy as jnp
import numpy as np
import pytest

from tpulc.codecs.bwt.stk import st_decode, st_encode, st_encode_np


def _pg(n):
    with open("/root/reference/cuda-lzss-unknown/pg1661.txt", "rb") as f:
        return np.frombuffer(f.read()[:n], np.uint8)


CASES = {
    "text": lambda: _pg(12000),
    "random": lambda: np.random.default_rng(4).integers(
        0, 256, size=8000
    ).astype(np.uint8),
    "runs": lambda: np.frombuffer((b"abcabc" * 2000)[:9000], np.uint8),
    "tiny": lambda: np.frombuffer(b"banana", np.uint8),
    "binary": lambda: np.frombuffer(bytes(range(256)) * 20, np.uint8),
}


@pytest.mark.parametrize("k", [3, 4, 5, 8])
@pytest.mark.parametrize("name", sorted(CASES))
def test_st_forward_matches_gold_and_roundtrips(name, k):
    arr = CASES[name]()
    last, idx0 = st_encode(jnp.asarray(arr), k=k)
    want_last, want_idx = st_encode_np(arr, k=k)
    np.testing.assert_array_equal(np.asarray(last), want_last)
    assert int(idx0) == want_idx
    back = st_decode(np.asarray(last), int(idx0), k=k)
    np.testing.assert_array_equal(back, arr)


def test_st_clusters_like_bwt():
    # bounded-context sorting should still cluster text for MTF
    from tpulc.primitives.mtf import mtf_encode

    arr = _pg(16384)
    last, _ = st_encode(jnp.asarray(arr), k=8)
    enc = np.asarray(mtf_encode(jnp.asarray(np.asarray(last))))
    assert (enc < 16).mean() > 0.75
