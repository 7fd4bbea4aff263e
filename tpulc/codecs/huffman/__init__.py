"""Canonical length-limited Huffman codec.

Capabilities mirrored from the reference (SURVEY.md §2.3, §2.4):
  - package-merge optimal length-limited code construction
    (cuhd `llhuffman_encoder.cc:18` behavior),
  - canonical codeword assignment + flat 2^L decode LUT
    (`llhuffman_encoder.cc:160,240`),
  - fully parallel device encode via prefix-sum bit offsets
    (replacing cudpp's atomicOr packer, `compress_kernel.cuh:2525-2716`),
  - fully parallel self-synchronizing decode: a scan-composition
    reformulation of the CUHD 4-phase gap-array decoder
    (`cuhd_gpu_decoder.cu:16-420`) with no host sync loop.
"""

from tpulc.codecs.huffman.tables import (  # noqa: F401
    package_merge_lengths,
    canonical_codes,
    decode_lut,
    HuffmanTable,
)
from tpulc.codecs.huffman.encode import huffman_encode  # noqa: F401
from tpulc.codecs.huffman.decode import huffman_decode  # noqa: F401
