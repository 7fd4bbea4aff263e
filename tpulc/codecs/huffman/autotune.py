"""Subsequence-size autotune for the self-sync Huffman decoder.

CUHD picks its subsequence size from the compression ratio
(`CUHDUtil::optimal_subsequence_size`, `src/cuhd_util.cc:24-56`): denser
streams decode more symbols per subsequence, so larger subsequences
amortize better.  The tpulc decoder's cost model differs (the
map-composition phase decodes each subsequence from L entry offsets, so
the tradeoff is lanes-vs-serial-steps), but the driving statistic is
the same: expected symbols per subsequence = sub_bits / avg_code_len.
"""

from __future__ import annotations


def optimal_sub_bits(
    total_bits: int,
    n_symbols: int,
    max_len: int,
    min_sub_bits: int = 128,
    max_sub_bits: int = 4096,
    target_lanes: int = 2048,
) -> int:
    """Pick the self-sync decoder's subsequence size.

    Aims for ~target_lanes subsequences (enough VPU lanes to fill the
    chip) while keeping the serial symbol loop short; clamps to
    [min_sub_bits, max_sub_bits] and rounds to a 32-bit unit multiple.
    """
    if total_bits <= 0 or n_symbols <= 0:
        return min_sub_bits
    ideal = total_bits / max(target_lanes, 1)
    sub = int(ideal // 32) * 32
    sub = max(min_sub_bits, min(max_sub_bits, sub))
    # never smaller than ~4 max-length codewords, or the entry-state
    # overhead (L lanes per subsequence) dominates
    sub = max(sub, ((4 * max_len + 31) // 32) * 32)
    return sub
