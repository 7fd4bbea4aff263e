"""tpulc — TPU-native lossless compression framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities surveyed in
dingwentao/GPU-lossless-compression (see SURVEY.md):

- LZSS sliding-window codecs (CULZSS flag-byte and Dipperstein bitstream
  wire formats),
- canonical length-limited Huffman encoding with a fully parallel,
  self-synchronizing decoder (a scan-composition reformulation of the
  CUHD gap-array algorithm),
- the block-sorting family: BWT (rotation sort / sort-transform),
  MTF-as-a-scan, RLE, and bzip2-compatible entropy coding,
- a bsc-class large-block path (LZP + QLFC-rank + interleaved rANS).

Everything on the compute path is jittable JAX (lax.sort,
lax.associative_scan, scatter/gather bit packing, Pallas kernels for the
hot loops); blocks shard data-parallel over a `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from tpulc.pipeline.registry import available_codecs  # noqa: F401
