"""Unit tests for the adaptive binary rANS coder (`-e2` kernels).

Driver-level coverage lives in test_bsc.py; these pin the kernel trio
(abc_stats / abc_encode / abc_decode) directly on adversarial symbol
streams: the full alphabet range (0..256), degenerate constants, and
lane-boundary context handoff.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpulc.codecs.bsclike.rans_adaptive import (
    ACHUNK,
    NMODELS,
    abc_decode,
    abc_encode,
    abc_stats,
    bucket_bits,
    quantize_inits,
)

CAP = 2 * ACHUNK  # two lanes per block


def _roundtrip(syms_np: np.ndarray, B: int = 1):
    """Encode [B, CAP] (valid prefixes = full) and decode back."""
    syms2 = jnp.asarray(syms_np.reshape(B, CAP).astype(np.int32))
    ms = jnp.asarray(np.full(B, CAP, np.int32))
    ones, tot, lane_bits, lane_cls = abc_stats(syms2, ms)
    inits = quantize_inits(np.asarray(ones), np.asarray(tot))
    W = bucket_bits(max(int(np.asarray(lane_bits).max()), 1))
    words, counts, states = abc_encode(syms2, ms, jnp.asarray(inits), W)
    nsteps = int(np.asarray(lane_bits).max())
    out = abc_decode(
        words, counts, states, lane_cls, ms, jnp.asarray(inits),
        jnp.int32(nsteps), B=B,
    )
    return np.asarray(out).reshape(B, CAP), counts


def test_abc_full_alphabet_roundtrip():
    rng = np.random.default_rng(11)
    # skewed toward small ranks like real MTF streams, but covering
    # every symbol 0..256 (all exponent/mantissa model paths)
    syms = np.minimum(
        rng.geometric(0.35, size=CAP) - 1, 256
    ).astype(np.int32)
    syms[:257] = np.arange(257)  # force every symbol at least once
    out, _ = _roundtrip(syms)
    np.testing.assert_array_equal(out[0], syms)


@pytest.mark.parametrize("const", [0, 1, 2, 255, 256])
def test_abc_constant_streams(const):
    syms = np.full(CAP, const, np.int32)
    out, counts = _roundtrip(syms)
    np.testing.assert_array_equal(out[0], syms)
    # a constant stream must code to almost nothing per lane
    assert int(np.asarray(counts).sum()) < 2 * (CAP // ACHUNK) + 20


def test_abc_lane_boundary_context():
    """Symbols straddling the lane boundary must decode with the
    wire'd lane-entry classes, not a reset context."""
    rng = np.random.default_rng(5)
    syms = rng.integers(0, 20, size=CAP).astype(np.int32)
    syms[ACHUNK - 3: ACHUNK + 3] = [17, 0, 5, 9, 0, 3]
    out, _ = _roundtrip(syms)
    np.testing.assert_array_equal(out[0], syms)


def test_abc_batched_blocks_differ():
    """Two blocks with very different statistics share one lockstep
    decode; per-block inits keep them independent."""
    rng = np.random.default_rng(9)
    a = np.minimum(rng.geometric(0.6, size=CAP) - 1, 256)
    b = np.minimum(rng.integers(0, 257, size=CAP), 256)
    syms = np.stack([a, b]).astype(np.int32)
    out, _ = _roundtrip(syms.reshape(-1), B=2)
    np.testing.assert_array_equal(out, syms)


def test_abc_short_valid_prefix():
    """m not a lane multiple: trailing lanes partially/fully invalid."""
    rng = np.random.default_rng(3)
    syms_np = np.minimum(rng.geometric(0.5, size=CAP) - 1, 256)
    m = ACHUNK + 37
    syms2 = jnp.asarray(syms_np.reshape(1, CAP).astype(np.int32))
    ms = jnp.asarray(np.array([m], np.int32))
    ones, tot, lane_bits, lane_cls = abc_stats(syms2, ms)
    inits = quantize_inits(np.asarray(ones), np.asarray(tot))
    W = bucket_bits(max(int(np.asarray(lane_bits).max()), 1))
    words, counts, states = abc_encode(syms2, ms, jnp.asarray(inits), W)
    nsteps = int(np.asarray(lane_bits).max())
    out = abc_decode(words, counts, states, lane_cls, ms,
                     jnp.asarray(inits), jnp.int32(nsteps), B=1)
    np.testing.assert_array_equal(np.asarray(out)[0, :m], syms_np[:m])


def test_abc_inits_shape():
    assert NMODELS == 117
    ones = np.zeros((1, NMODELS)); tot = np.zeros((1, NMODELS))
    tot[0, :5] = 100; ones[0, :5] = [0, 1, 50, 99, 100]
    q = quantize_inits(ones, tot)
    assert q.shape == (1, NMODELS)
    assert (q[0, 5:] == 2048).all()          # unused -> 1/2
    assert 16 <= q[0, 0] and q[0, 4] <= 4096 - 16
