"""Smoke tests for bench.py helpers (the driver runs bench.py on the
real chip at round end; the plumbing must not be chip-only)."""

import sys


def test_huffman_decode_bench_small():
    sys.path.insert(0, ".")
    from bench import bench_huffman_decode_100mb

    r = bench_huffman_decode_100mb(size=1_000_000)
    assert r["decode_kernel_s"] > 0
    assert r["compressed_MB"] < r["input_MB"]


def test_make_corpus_identity():
    from bench import SIZE, make_corpus

    data = make_corpus(SIZE)
    assert len(data) == 3_569_598
    # the reconstruction property BASELINE comparability rests on
    assert data[:594933] == data[594933: 2 * 594933]
