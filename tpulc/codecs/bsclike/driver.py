"""bsc-class large-block codec: LZP -> BWT -> MTF -> RLE2 -> Huffman.

The tpulc counterpart of libbsc's pipeline (`libbsc.cpp
bsc_compress_inplace`: adler32 -> LZP -> block sorter -> coder), with
bsc's own division of labor (SURVEY.md §2.6): LZP runs on the host
(native C, as bsc does even in -G mode), the block sort and modelling
transforms run on the TPU via the masked dynamic-length pipeline, and
blocks default to 25 MB (`bsc.cpp:76`).  The entropy stage is the
257-symbol canonical Huffman coder; per-block incompressible fallback
stores raw (bsc's `bsc_store`).

Per-block payload (little-endian):

    n           u32   raw bytes in this block
    m_lzp       u32   LZP-stage bytes (== n when LZP was skipped)
    m           u32   RLE2 symbol count
    idx0        u32   BWT primary index
    total_bits  u32
    flags       u8    bit0: LZP applied; bit1: stored raw
    lengths     129B  nibble-packed code lengths
    nchunks     u32 + offsets u32*nchunks
    words
"""

from __future__ import annotations

import struct

import jax
import jax.numpy as jnp
import numpy as np

from tpulc.codecs.bwt.driver import CHUNK_SYMS, MAX_LEN, _NIBBLES
from tpulc.codecs.bwt.masked import forward_masked, inverse_masked
from tpulc.codecs.bwt.rle import ALPHABET
from tpulc.codecs.huffman.decode import huffman_decode_aligned
from tpulc.codecs.huffman.tables import HuffmanTable
from tpulc.gold.lzp import lzp_decode, lzp_encode
from tpulc.pipeline.container import Container
from tpulc.pipeline.registry import CODEC_BSC
from tpulc.primitives.bits import pack_bits
from tpulc.primitives.checksum import adler32_np

DEFAULT_BLOCK = 25 * 1024 * 1024
_HEAD = struct.Struct("<IIIIIB")
FLAG_LZP = 1
FLAG_STORED = 2


def _cap_for(block_size: int) -> int:
    return -(-block_size // 64) * 64


@jax.jit
def _entropy_stage(syms, m, codes, lengths):
    cap = syms.shape[0]
    out_words = -(-cap * MAX_LEN // 32)
    nchunks = max(1, -(-cap // CHUNK_SYMS))
    valid = jnp.arange(cap, dtype=jnp.int32) < m
    sym_lens = jnp.where(valid, lengths[syms], 0)
    sym_codes = jnp.where(valid, codes[syms], 0).astype(jnp.uint32)
    words, total_bits = pack_bits(sym_codes, sym_lens, out_words)
    off = jnp.cumsum(sym_lens) - sym_lens
    chunk_offsets = off[::CHUNK_SYMS][:nchunks].astype(jnp.int32)
    chunk_valid = (jnp.arange(nchunks, dtype=jnp.int32) * CHUNK_SYMS) < m
    chunk_offsets = jnp.where(chunk_valid, chunk_offsets, total_bits)
    return words, total_bits, chunk_offsets


@jax.jit
def _decode_stage(words, total_bits, m, n, idx0, lut_sym, lut_len, offs):
    cap = offs.shape[0] * CHUNK_SYMS
    sym_offsets = jnp.arange(offs.shape[0], dtype=jnp.int32) * CHUNK_SYMS
    syms = huffman_decode_aligned(
        words, total_bits, cap, lut_sym, lut_len, MAX_LEN,
        offs, sym_offsets, out_dtype=jnp.int32,
    )
    return inverse_masked(syms, m, n, idx0)


def compress_block(block: np.ndarray, block_cap: int,
                   use_lzp: bool = True) -> bytes:
    n = block.shape[0]
    cap = _cap_for(block_cap)
    flags = 0
    stage = block
    if use_lzp:
        lz = lzp_encode(block)
        if lz is not None:
            stage = np.frombuffer(lz, np.uint8)
            flags |= FLAG_LZP
    m_lzp = stage.shape[0]
    padded = np.zeros(cap, np.uint8)
    padded[:m_lzp] = stage
    syms, m, idx0, hist = forward_masked(jnp.asarray(padded), jnp.int32(m_lzp))
    table = HuffmanTable.from_freqs(np.asarray(hist), MAX_LEN)
    words, total_bits, chunk_offsets = _entropy_stage(
        syms, m, jnp.asarray(table.codes), jnp.asarray(table.lengths)
    )
    m, idx0, total_bits = int(m), int(idx0), int(total_bits)
    nw = -(-total_bits // 32)
    body_size = _HEAD.size + _NIBBLES + 4 + 4 * max(1, -(-m // CHUNK_SYMS)) \
        + 4 * nw
    if body_size >= n:
        return _HEAD.pack(n, n, 0, 0, 0, FLAG_STORED) + block.tobytes()
    lens = np.asarray(table.lengths, np.uint8)
    lens_pad = np.zeros(_NIBBLES * 2, np.uint8)
    lens_pad[:ALPHABET] = lens
    nibbles = (lens_pad[0::2] | (lens_pad[1::2] << 4)).tobytes()
    used_chunks = max(1, -(-m // CHUNK_SYMS))
    offs = np.asarray(chunk_offsets[:used_chunks]).astype("<u4")
    payload = _HEAD.pack(n, m_lzp, m, idx0, total_bits, flags) + nibbles
    payload += struct.pack("<I", used_chunks) + offs.tobytes()
    payload += np.asarray(words[:nw]).astype("<u4").tobytes()
    return payload


def decompress_block(payload: bytes, block_cap: int) -> np.ndarray:
    n, m_lzp, m, idx0, total_bits, flags = _HEAD.unpack(
        payload[: _HEAD.size]
    )
    off = _HEAD.size
    if flags & FLAG_STORED:
        return np.frombuffer(payload[off: off + n], np.uint8)
    nib = np.frombuffer(payload[off: off + _NIBBLES], np.uint8)
    off += _NIBBLES
    lengths = np.zeros(_NIBBLES * 2, np.int32)
    lengths[0::2] = nib & 0xF
    lengths[1::2] = nib >> 4
    lengths = lengths[:ALPHABET]
    (nchunks,) = struct.unpack("<I", payload[off: off + 4])
    off += 4
    bit_offsets = np.frombuffer(payload[off: off + 4 * nchunks], "<u4").astype(
        np.int32
    )
    off += 4 * nchunks
    nw = -(-total_bits // 32)
    words = np.frombuffer(payload[off: off + 4 * nw], "<u4")
    cap = _cap_for(block_cap)
    wcap = -(-cap * MAX_LEN // 32)
    words_p = np.zeros(wcap, np.uint32)
    words_p[:nw] = words
    ccap = max(1, -(-cap // CHUNK_SYMS))
    offs_p = np.full(ccap, total_bits, np.int32)
    offs_p[:nchunks] = bit_offsets
    table = HuffmanTable.from_lengths(lengths, MAX_LEN)
    stage = _decode_stage(
        jnp.asarray(words_p), jnp.int32(total_bits), jnp.int32(m),
        jnp.int32(m_lzp), jnp.int32(idx0),
        jnp.asarray(table.lut_sym), jnp.asarray(table.lut_len),
        jnp.asarray(offs_p),
    )
    stage = np.asarray(stage[:m_lzp])
    if flags & FLAG_LZP:
        return np.frombuffer(lzp_decode(stage, n), np.uint8)
    return stage[:n]


def compress(data: bytes | np.ndarray, block_size: int = DEFAULT_BLOCK) -> bytes:
    arr = np.frombuffer(data, np.uint8) if isinstance(data, (bytes, bytearray)) \
        else np.asarray(data, np.uint8)
    n = arr.shape[0]
    payloads = []
    for start in range(0, max(n, 1), block_size):
        payloads.append(
            compress_block(arr[start: start + block_size], block_size)
        )
    c = Container(
        codec_id=CODEC_BSC, flags=0, orig_len=n, block_size=block_size,
        comp_sizes=[len(p) for p in payloads], payloads=payloads,
        data_adler=adler32_np(arr),
    )
    return c.to_bytes()


def decompress(buf: bytes) -> bytes:
    c = Container.from_bytes(buf)
    assert c.codec_id == CODEC_BSC
    parts = [decompress_block(p, c.block_size) for p in c.payloads]
    out = b"".join(x.tobytes() for x in parts)[: c.orig_len]
    if not c.verify_data(np.frombuffer(out, np.uint8)):
        raise ValueError("data checksum mismatch after decompress")
    return out
