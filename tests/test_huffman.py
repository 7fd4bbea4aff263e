"""Huffman family: tables, device encode, parallel decode, driver e2e.

Test strategy follows the reference's gold-model pattern (SURVEY.md §4):
a slow numpy bit-serial codec is the oracle, plus Kraft/optimality
checks on the package-merge lengths.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from tpulc.codecs.huffman import (
    HuffmanTable,
    canonical_codes,
    huffman_decode,
    huffman_encode,
    package_merge_lengths,
)
from tpulc.codecs.huffman import driver


def _ref_encode(data, codes, lengths):
    bits = "".join(f"{codes[b]:0{lengths[b]}b}" for b in data)
    return bits


def _ref_decode(bits, codes, lengths, n):
    inv = {}
    for s in np.flatnonzero(lengths):
        inv[f"{codes[s]:0{lengths[s]}b}"] = s
    out, cur = [], ""
    for ch in bits:
        cur += ch
        if cur in inv:
            out.append(inv[cur])
            cur = ""
            if len(out) == n:
                break
    return np.array(out, np.uint8)


def _rand_data(n, seed, skew=False):
    rng = np.random.default_rng(seed)
    if skew:
        p = rng.dirichlet(np.full(256, 0.05))
        return rng.choice(256, size=n, p=p).astype(np.uint8)
    return rng.integers(0, 256, size=n).astype(np.uint8)


@pytest.mark.parametrize("skew", [False, True])
def test_package_merge_kraft_and_optimality(skew):
    data = _rand_data(20000, 7, skew)
    freqs = np.bincount(data, minlength=256)
    for L in (9, 12, 15):
        lengths = package_merge_lengths(freqs, L)
        assert lengths.max() <= L
        used = lengths[freqs > 0]
        assert (used > 0).all()
        assert (lengths[freqs == 0] == 0).all()
        kraft = np.sum(2.0 ** (-used.astype(np.float64)))
        assert kraft <= 1.0 + 1e-12
    # With a loose limit, total cost must be within 1% of entropy bound
    lengths = package_merge_lengths(freqs, 15)
    cost = int(np.sum(freqs * lengths))
    p = freqs[freqs > 0] / freqs.sum()
    entropy_bits = -np.sum(p * np.log2(p)) * freqs.sum()
    assert cost < entropy_bits * 1.03 + 8 * len(p)


def test_canonical_codes_prefix_free():
    freqs = np.bincount(_rand_data(5000, 8, skew=True), minlength=256)
    lengths = package_merge_lengths(freqs, 12)
    codes = canonical_codes(lengths)
    strs = [f"{codes[s]:0{lengths[s]}b}" for s in np.flatnonzero(lengths)]
    for i, a in enumerate(strs):
        for j, b in enumerate(strs):
            if i != j:
                assert not b.startswith(a)


@pytest.mark.parametrize("skew", [False, True])
def test_device_encode_matches_reference_bitstream(skew):
    data = _rand_data(3000, 9, skew)
    table = HuffmanTable.from_freqs(np.bincount(data, minlength=256), 12)
    bits = _ref_encode(data, table.codes, table.lengths)
    out_words = len(bits) // 32 + 2
    words, total = huffman_encode(
        jnp.asarray(data), jnp.asarray(table.codes),
        jnp.asarray(table.lengths), out_words,
    )
    assert int(total) == len(bits)
    got_bits = "".join(f"{int(w):032b}" for w in np.asarray(words))[: len(bits)]
    assert got_bits == bits


@pytest.mark.parametrize("sub_bits", [128, 512])
@pytest.mark.parametrize("skew", [False, True])
def test_selfsync_decode_roundtrip(skew, sub_bits):
    data = _rand_data(20000, 10, skew)
    table = HuffmanTable.from_freqs(np.bincount(data, minlength=256), 12)
    out_words = 20000 * 12 // 32 + 2
    words, total = huffman_encode(
        jnp.asarray(data), jnp.asarray(table.codes),
        jnp.asarray(table.lengths), out_words,
    )
    out, n_valid = huffman_decode(
        words, total, 20000 + 64,
        jnp.asarray(table.lut_sym), jnp.asarray(table.lut_len),
        12, sub_bits=sub_bits,
    )
    assert int(n_valid) == 20000
    np.testing.assert_array_equal(np.asarray(out)[:20000], data)


def test_decode_tiny_and_single_symbol():
    # degenerate: one distinct symbol
    data = np.full(100, 42, np.uint8)
    table = HuffmanTable.from_freqs(np.bincount(data, minlength=256), 12)
    words, total = huffman_encode(
        jnp.asarray(data), jnp.asarray(table.codes),
        jnp.asarray(table.lengths), 16,
    )
    out, n_valid = huffman_decode(
        words, total, 128, jnp.asarray(table.lut_sym),
        jnp.asarray(table.lut_len), 12,
    )
    assert int(n_valid) == 100
    np.testing.assert_array_equal(np.asarray(out)[:100], data)


@pytest.mark.parametrize("aligned", [True, False])
def test_driver_container_roundtrip(aligned):
    data = _rand_data(300000, 11, skew=True).tobytes()
    comp = driver.compress(data, block_size=1 << 17, aligned=aligned)
    back = driver.decompress(comp)
    assert back == data
    # skewed data must actually compress
    assert len(comp) < len(data)


def test_driver_roundtrip_text_like():
    text = (b"the quick brown fox jumps over the lazy dog. " * 3000)
    comp = driver.compress(text, block_size=1 << 16)
    assert driver.decompress(comp) == text
    assert len(comp) < len(text) * 0.7


def test_package_merge_device_matches_host():
    """Device PM (the bz fused-compress table build) is bit-identical
    to the host package-merge across distribution shapes."""
    import jax.numpy as jnp

    from tpulc.codecs.huffman.device_tables import (
        package_merge_lengths_device,
    )

    rng = np.random.default_rng(7)
    cases = [rng.integers(0, 1000, 257)]
    z = (rng.zipf(1.3, 257) * (rng.random(257) < 0.7)).astype(np.int64)
    while z.sum() > (1 << 25):
        z = z // 2
    cases.append(z)
    one = np.zeros(257, np.int64)
    one[100] = 5
    cases.append(one)
    skew = np.zeros(257, np.int64)
    skew[:3] = [1, 1, (1 << 25) - 2]
    cases.append(skew)
    cases.append(np.zeros(257, np.int64))
    for f in cases:
        for L in (11, 15):
            want = package_merge_lengths(f, L)
            got = np.asarray(
                package_merge_lengths_device(jnp.asarray(f.astype(np.int32)), L)
            )
            np.testing.assert_array_equal(want, got)


def test_v2_wire_roundtrip_chunks():
    """FLAG_ALIGNED2 (u16 delta offsets) round-trips at several chunk
    sizes, including blocks whose tail chunk is partial."""
    rng = np.random.default_rng(11)
    data = rng.choice(
        np.frombuffer(b"abcdefgh hello world", np.uint8), 150_001
    ).tobytes()
    for chunk in (64, 128, 256, 512):
        comp = driver.compress(data, block_size=1 << 16,
                               chunk_syms=chunk)
        assert driver.decompress(comp) == data, chunk
    # v1 absolute-offset wire still decodes
    comp1 = driver.compress(data, block_size=1 << 16, chunk_syms=256)
    assert driver.decompress(comp1) == data


@pytest.mark.skipif(
    not os.environ.get("TPULC_TEST_TPU"),
    reason="set TPULC_TEST_TPU=1 with a TPU attached (XLA:CPU compile "
           "of the jit-of-interpret graph is pathologically slow)",
)
def test_buffered_kernel_matches_rank_decoder():
    """The v2 buffered Pallas kernel is bit-identical to the XLA rank
    decoder on a mixed batch with a partial tail block (on-chip; the
    always-run CPU pinning of the same wire path is
    test_v2_wire_roundtrip_chunks through the rank decoder, and
    tests/tpu_kernels_check.py pins the production chunk=128 shape)."""
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(__file__),
                          "huff_interpret_check.py")
    r = subprocess.run([sys.executable, script, "tpu"],
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0 and "EQUAL" in r.stdout, (
        r.stdout[-500:], r.stderr[-500:])


def test_buffered_kernel_interpret_tiny():
    """Always-run interpret-mode pinning of the buffered kernel
    (ADVICE r4: a default CPU run should exercise the production TPU
    decode path at least once).  Runs in a subprocess because XLA:CPU
    compile of the jit-of-interpret graph is nondeterministically
    slow — a timeout skips rather than hangs the suite."""
    import subprocess
    import sys

    script = os.path.join(os.path.dirname(__file__),
                          "huff_interpret_check.py")
    try:
        r = subprocess.run([sys.executable, script],
                           capture_output=True, text=True, timeout=420)
    except subprocess.TimeoutExpired:
        pytest.skip("interpret-mode compile exceeded 420s (known "
                    "XLA:CPU pathology)")
    assert r.returncode == 0 and "EQUAL" in r.stdout, (
        r.stdout[-500:], r.stderr[-500:])
