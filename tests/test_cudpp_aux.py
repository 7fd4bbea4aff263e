"""CUDPP auxiliary primitives (rand/spmv/tridiagonal/hash)."""

import hashlib
import struct

import numpy as np
import pytest

import jax.numpy as jnp

from tpulc.primitives import cudpp_aux as aux


def test_md5_bit_exact_vs_hashlib():
    """Counter-mode MD5 must match hashlib digest-for-digest (the
    cudppRand MD5 generator role, deterministic across machines)."""
    seed = 0xDEADBEEF
    out = np.asarray(aux.md5_rand(40, jnp.uint32(seed)))
    for blk in range(10):
        msg = struct.pack("<II", seed, blk)
        want = np.frombuffer(hashlib.md5(msg).digest(), "<u4")
        got = out[4 * blk: 4 * blk + 4]
        assert np.array_equal(got, want), blk


def test_md5_rand_determinism_and_spread():
    a = np.asarray(aux.md5_rand(1000, jnp.uint32(1)))
    b = np.asarray(aux.md5_rand(1000, jnp.uint32(1)))
    c = np.asarray(aux.md5_rand(1000, jnp.uint32(2)))
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    # crude uniformity: mean of u32 near 2^31
    assert abs(a.astype(np.float64).mean() / 2**31 - 1) < 0.1


def test_spmv_matches_dense():
    rng = np.random.default_rng(0)
    nrows, ncols = 37, 23
    dense = np.where(rng.random((nrows, ncols)) < 0.2,
                     rng.standard_normal((nrows, ncols)), 0.0)
    x = rng.standard_normal(ncols)
    rows, cols = np.nonzero(dense)
    values = dense[rows, cols]
    row_ptr = np.zeros(nrows + 1, np.int32)
    np.add.at(row_ptr, rows + 1, 1)
    row_ptr = np.cumsum(row_ptr).astype(np.int32)
    y = np.asarray(aux.spmv(jnp.asarray(values, dtype=jnp.float32),
                            jnp.asarray(cols, dtype=jnp.int32),
                            jnp.asarray(row_ptr),
                            jnp.asarray(x, dtype=jnp.float32)))
    assert np.allclose(y, dense @ x, atol=1e-4)


@pytest.mark.parametrize("n", [8, 64, 256])
def test_tridiagonal_solve(n):
    rng = np.random.default_rng(n)
    B = 5
    a = rng.standard_normal((B, n)) * 0.3
    c = rng.standard_normal((B, n)) * 0.3
    b = 2.0 + np.abs(rng.standard_normal((B, n)))  # diag dominant
    d = rng.standard_normal((B, n))
    x = np.asarray(aux.tridiagonal_solve(
        jnp.asarray(a, dtype=jnp.float32), jnp.asarray(b, dtype=jnp.float32),
        jnp.asarray(c, dtype=jnp.float32), jnp.asarray(d, dtype=jnp.float32)))
    for i in range(B):
        M = np.diag(b[i]) + np.diag(a[i][1:], -1) + np.diag(c[i][:-1], 1)
        want = np.linalg.solve(M, d[i])
        assert np.allclose(x[i], want, atol=2e-3), (n, i)


def test_cuckoo_table_roundtrip():
    rng = np.random.default_rng(3)
    n = 5000
    keys = rng.choice(1 << 30, size=n, replace=False).astype(np.uint32)
    vals = rng.integers(0, 1 << 31, n).astype(np.uint32)
    t = aux.CuckooTable(keys, vals)
    got, found = t.lookup(jnp.asarray(keys))
    assert bool(np.asarray(found).all())
    assert np.array_equal(np.asarray(got), vals)
    # misses
    miss = (keys[:100].astype(np.uint64) + (1 << 31)).astype(np.uint32)
    _, found = t.lookup(jnp.asarray(miss))
    assert not bool(np.asarray(found).any())
