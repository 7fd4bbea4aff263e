"""bz codec driver: BWT -> MTF -> RLE2 -> canonical Huffman per block.

The tpulc equivalent of `cudppCompress`'s device-resident pipeline
(`compress_app.cu:507-526`: BWT, MTF, Huffman) extended with bzip2's
zero-run stage (`compress.c:123-240`), in tpulc's own container (the
bit-exact `.bz2` emitter is a separate codec).  The whole forward
transform chain runs as one jitted program per block; only the table
build (256-entry package-merge, microseconds) sits on host between the
transform and entropy stages.

Per-block payload (little-endian):

    n           u32   raw bytes in this block (<= cap, zero-padded)
    m           u32   RLE2 symbol count
    idx0        u32   BWT primary index
    total_bits  u32   entropy-stream bits
    mode        u8    bit0: decode anchors present
    lengths     129B  257 code lengths, nibble-packed
    nchunks     u32
    offsets     u32 * nchunks   bit offset of each 256-symbol chunk
    [n_anchors  u32 + anchors u32*n_anchors   when mode&1]
    words       4B * ceil(total_bits/32)
"""

from __future__ import annotations

import struct
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from tpulc.codecs.bwt.rle import ALPHABET, rle2_decode, rle2_encode
from tpulc.codecs.bwt.rotsort import (
    bwt_decode,
    bwt_decode_anchored,
    bwt_encode_anchored,
)
from tpulc.codecs.huffman.decode import huffman_decode_aligned
from tpulc.codecs.huffman.tables import HuffmanTable
from tpulc.pipeline.container import Container
from tpulc.pipeline.registry import CODEC_BZ
from tpulc.primitives.bits import pack_bits
from tpulc.primitives.checksum import adler32_np
from tpulc.primitives.mtf import mtf_encode, mtf_decode

MAX_LEN = 15
CHUNK_SYMS = 256
_BLOCK_HEAD = struct.Struct("<IIIIB")
_NIBBLES = (ALPHABET + 1) // 2 + ((ALPHABET + 1) % 2)  # 129 bytes


def _cap_for(block_size: int) -> int:
    return -(-block_size // 256) * 256  # MTF-chunk and CHUNK_SYMS multiple


ANCHOR_STRIDE = 1024


@jax.jit
def _forward(block):
    """block uint8[cap] -> (syms, m, idx0, hist, anchors, anchors_ok)."""
    last, idx0, anchors, ok = bwt_encode_anchored(block, ANCHOR_STRIDE)
    ranks = mtf_encode(last)
    syms, m = rle2_encode(ranks)
    cap = block.shape[0]
    masked = jnp.where(jnp.arange(cap, dtype=jnp.int32) < m, syms, ALPHABET)
    hist = jnp.zeros((ALPHABET + 1,), jnp.int32).at[masked].add(
        1, mode="drop"
    )[:ALPHABET]
    return syms, m, idx0, hist, anchors, ok


@partial(jax.jit, static_argnames=("anchor_count",))
def _forward_packed(block, anchor_count: int):
    """_forward with all small outputs packed into ONE int32 array:
    [m, idx0, ok, hist(257), anchors(R)].  Device->host roundtrips
    through the remote tunnel cost ~30-50ms each regardless of size,
    so the driver pulls exactly one buffer per stage."""
    syms, m, idx0, hist, anchors, ok = _forward(block)
    meta = jnp.concatenate([
        jnp.stack([m, idx0, ok.astype(jnp.int32)]),
        hist,
        anchors[:anchor_count],
    ])
    return syms, meta


@partial(jax.jit, static_argnames=("out_words", "nchunks"))
def _entropy_packed(syms, m, codes, lengths, out_words: int, nchunks: int):
    """_entropy with [total_bits, chunk_offsets(nchunks), words] packed
    into one uint32 array (single D2H pull)."""
    words, total_bits, chunk_offsets = _entropy(
        syms, m, codes, lengths, out_words, nchunks
    )
    return jnp.concatenate([
        jnp.reshape(total_bits, (1,)).astype(jnp.uint32),
        chunk_offsets.astype(jnp.uint32),
        words,
    ])


@partial(jax.jit, static_argnames=("out_words", "nchunks"))
def _entropy(syms, m, codes, lengths, out_words: int, nchunks: int):
    cap = syms.shape[0]
    valid = jnp.arange(cap, dtype=jnp.int32) < m
    sym_lens = jnp.where(valid, lengths[syms], 0)
    sym_codes = jnp.where(valid, codes[syms], 0).astype(jnp.uint32)
    words, total_bits = pack_bits(sym_codes, sym_lens, out_words)
    off = jnp.cumsum(sym_lens) - sym_lens
    # cap is a CHUNK_SYMS multiple: reshape beats a strided gather
    chunk_offsets = off.reshape(-1, CHUNK_SYMS)[:nchunks, 0].astype(jnp.int32)
    chunk_valid = (jnp.arange(nchunks, dtype=jnp.int32) * CHUNK_SYMS) < m
    chunk_offsets = jnp.where(chunk_valid, chunk_offsets, total_bits)
    return words, total_bits, chunk_offsets


@partial(jax.jit, static_argnames=("cap",))
def _inverse(words, total_bits, m, idx0, lut_sym, lut_len, offs, cap: int):
    sym_offsets = jnp.arange(offs.shape[0], dtype=jnp.int32) * CHUNK_SYMS
    syms = huffman_decode_aligned(
        words, total_bits, cap, lut_sym, lut_len, MAX_LEN,
        offs, sym_offsets, out_dtype=jnp.int32,
    )
    ranks, _ = rle2_decode(syms, m)
    last = mtf_decode(ranks)
    return bwt_decode(last, idx0)


@partial(jax.jit, static_argnames=("cap",))
def _inverse_anchored(words, total_bits, m, idx0, lut_sym, lut_len, offs,
                      anchors, cap: int):
    sym_offsets = jnp.arange(offs.shape[0], dtype=jnp.int32) * CHUNK_SYMS
    syms = huffman_decode_aligned(
        words, total_bits, cap, lut_sym, lut_len, MAX_LEN,
        offs, sym_offsets, out_dtype=jnp.int32,
    )
    ranks, _ = rle2_decode(syms, m)
    last = mtf_decode(ranks)
    return bwt_decode_anchored(last, idx0, anchors, ANCHOR_STRIDE)


def compress_block(block: np.ndarray, block_cap: int) -> bytes:
    n = block.shape[0]
    cap = _cap_for(block_cap)
    assert n <= cap
    padded = np.zeros(cap, np.uint8)
    padded[:n] = block
    syms, m, idx0, hist, anchors, ok = _forward(jnp.asarray(padded))
    table = HuffmanTable.from_freqs(np.asarray(hist), MAX_LEN)
    out_words = -(-cap * MAX_LEN // 32)
    nchunks = max(1, -(-cap // CHUNK_SYMS))
    words, total_bits, chunk_offsets = _entropy(
        syms, m, jnp.asarray(table.codes), jnp.asarray(table.lengths),
        out_words, nchunks,
    )
    m, idx0, total_bits = int(m), int(idx0), int(total_bits)
    nw = -(-total_bits // 32)
    lens = np.asarray(table.lengths, np.uint8)
    lens_pad = np.zeros(_NIBBLES * 2, np.uint8)
    lens_pad[:ALPHABET] = lens
    nibbles = (lens_pad[0::2] | (lens_pad[1::2] << 4)).tobytes()
    used_chunks = max(1, -(-m // CHUNK_SYMS))
    offs = np.asarray(chunk_offsets[:used_chunks]).astype("<u4")
    # anchors pay off only when they are a sliver of the payload
    mode = 1 if (bool(ok) and 4 * int(np.asarray(anchors).shape[0]) * 20
                 < nw * 4) else 0
    payload = _BLOCK_HEAD.pack(n, m, idx0, total_bits, mode) + nibbles
    payload += struct.pack("<I", used_chunks) + offs.tobytes()
    if mode & 1:
        a = np.asarray(anchors).astype("<u4")
        payload += struct.pack("<I", a.shape[0]) + a.tobytes()
    payload += np.asarray(words[:nw]).astype("<u4").tobytes()
    return payload


def _parse_block(payload: bytes):
    n, m, idx0, total_bits, mode = _BLOCK_HEAD.unpack(
        payload[: _BLOCK_HEAD.size]
    )
    off = _BLOCK_HEAD.size
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
    anchors = None
    if mode & 1:
        (na,) = struct.unpack("<I", payload[off: off + 4])
        off += 4
        anchors = np.frombuffer(payload[off: off + 4 * na], "<u4").astype(
            np.int32
        )
        off += 4 * na
    nw = -(-total_bits // 32)
    words = np.frombuffer(payload[off: off + 4 * nw], "<u4")
    return n, m, idx0, total_bits, lengths, bit_offsets, anchors, words


def decompress_block(payload: bytes, block_cap: int) -> np.ndarray:
    n, m, idx0, total_bits, lengths, bit_offsets, anchors, words =         _parse_block(payload)
    cap = _cap_for(block_cap)
    wcap = -(-cap * MAX_LEN // 32)
    words_p = np.zeros(wcap, np.uint32)
    words_p[: words.shape[0]] = words
    ccap = max(1, -(-cap // CHUNK_SYMS))
    offs_p = np.full(ccap, total_bits, np.int32)
    offs_p[: bit_offsets.shape[0]] = bit_offsets
    table = HuffmanTable.from_lengths(lengths, MAX_LEN)
    args = (
        jnp.asarray(words_p), jnp.int32(total_bits), jnp.int32(m),
        jnp.int32(idx0), jnp.asarray(table.lut_sym),
        jnp.asarray(table.lut_len), jnp.asarray(offs_p),
    )
    if anchors is not None:
        block = _inverse_anchored(*args, jnp.asarray(anchors), cap)
    else:
        block = _inverse(*args, cap)
    return np.asarray(block[:n])


# Batched (vmapped) pipeline: all blocks of a batch run as ONE device
# program each way — the TPU analogue of bzip2's all-core block
# scheduler (`compress.c:876-1006`), with XLA batching instead of a
# work queue.  Tunnel/dispatch overhead amortizes across the batch.
_forward_batch = jax.jit(jax.vmap(_forward))
_entropy_batch = jax.jit(
    jax.vmap(_entropy, in_axes=(0, 0, 0, 0, None, None)),
    static_argnums=(4, 5),
)
_inverse_batch = jax.jit(
    jax.vmap(_inverse, in_axes=(0, 0, 0, 0, 0, 0, 0, None)),
    static_argnums=(7,),
)
_inverse_anchored_batch = jax.jit(
    jax.vmap(_inverse_anchored, in_axes=(0, 0, 0, 0, 0, 0, 0, 0, None)),
    static_argnums=(8,),
)

MAX_BATCH = 16  # blocks per device round (bounds HBM working set)


def _encode_payloads(blocks: np.ndarray, ns: list[int]) -> list[bytes]:
    """blocks uint8[B, cap] (zero-padded), ns true sizes -> payloads.

    Blocks are dispatched sequentially: measured on the v5e, the
    vmapped batch runs ~1.7x SLOWER than back-to-back single-block
    programs (batched multi-operand sorts vectorize worse), and
    per-dispatch overhead is ~1ms — so sequential wins.
    """
    B, cap = blocks.shape
    R = -(-cap // ANCHOR_STRIDE)
    per = [_forward_packed(jnp.asarray(blocks[b]), R) for b in range(B)]
    syms = [p[0] for p in per]
    m_dev = [p[1][0] for p in per]           # device scalars for entropy
    metas = np.asarray(jnp.stack([p[1] for p in per]))  # ONE pull
    ms = [int(mt[0]) for mt in metas]
    idx0s = [int(mt[1]) for mt in metas]
    ok_b = np.asarray([bool(mt[2]) for mt in metas])
    hists = np.stack([mt[3: 3 + ALPHABET] for mt in metas])
    anchors_b = np.stack([mt[3 + ALPHABET:] for mt in metas])
    tables = [HuffmanTable.from_freqs(hists[b], MAX_LEN) for b in range(B)]
    out_words = -(-cap * MAX_LEN // 32)
    nchunks = max(1, -(-cap // CHUNK_SYMS))
    ent_dev = [
        _entropy_packed(
            syms[b], m_dev[b], jnp.asarray(tables[b].codes),
            jnp.asarray(tables[b].lengths), out_words, nchunks,
        )
        for b in range(B)
    ]
    ent = np.asarray(jnp.stack(ent_dev))  # ONE pull for the batch
    total_bits = [int(e[0]) for e in ent]
    chunk_offsets = np.stack([e[1: 1 + nchunks].astype(np.int32)
                              for e in ent])
    words = [e[1 + nchunks:] for e in ent]
    ms = np.asarray(ms)
    idx0s = np.asarray(idx0s)
    payloads = []
    for b in range(B):
        m, idx0, tb = int(ms[b]), int(idx0s[b]), total_bits[b]
        nw = -(-tb // 32)
        lens = np.asarray(tables[b].lengths, np.uint8)
        lens_pad = np.zeros(_NIBBLES * 2, np.uint8)
        lens_pad[:ALPHABET] = lens
        nibbles = (lens_pad[0::2] | (lens_pad[1::2] << 4)).tobytes()
        used_chunks = max(1, -(-m // CHUNK_SYMS))
        offs = chunk_offsets[b, :used_chunks].astype("<u4")
        mode = 1 if (bool(ok_b[b]) and 4 * anchors_b.shape[1] * 20
                     < nw * 4) else 0
        payload = _BLOCK_HEAD.pack(ns[b], m, idx0, tb, mode) + nibbles
        payload += struct.pack("<I", used_chunks) + offs.tobytes()
        if mode & 1:
            a = anchors_b[b].astype("<u4")
            payload += struct.pack("<I", a.shape[0]) + a.tobytes()
        payload += np.asarray(words[b][:nw]).astype("<u4").tobytes()
        payloads.append(payload)
    return payloads


def compress(data: bytes | np.ndarray, block_size: int = 900_000) -> bytes:
    arr = np.frombuffer(data, np.uint8) if isinstance(data, (bytes, bytearray)) \
        else np.asarray(data, np.uint8)
    n = arr.shape[0]
    cap = _cap_for(block_size)
    starts = list(range(0, max(n, 1), block_size))
    payloads = []
    for i in range(0, len(starts), MAX_BATCH):
        group = starts[i: i + MAX_BATCH]
        blocks = np.zeros((len(group), cap), np.uint8)
        ns = []
        for j, s in enumerate(group):
            chunk = arr[s: s + block_size]
            blocks[j, : chunk.shape[0]] = chunk
            ns.append(chunk.shape[0])
        payloads.extend(_encode_payloads(blocks, ns))
    c = Container(
        codec_id=CODEC_BZ, flags=0, orig_len=n, block_size=block_size,
        comp_sizes=[len(p) for p in payloads], payloads=payloads,
        data_adler=adler32_np(arr),
    )
    return c.to_bytes()


def decompress(buf: bytes) -> bytes:
    c = Container.from_bytes(buf)
    assert c.codec_id == CODEC_BZ
    cap = _cap_for(c.block_size)
    wcap = -(-cap * MAX_LEN // 32)
    ccap = max(1, -(-cap // CHUNK_SYMS))
    n_anch = -(-cap // ANCHOR_STRIDE)
    parts = []
    for i in range(0, len(c.payloads), MAX_BATCH):
        group = c.payloads[i: i + MAX_BATCH]
        B = len(group)
        words_b = np.zeros((B, wcap), np.uint32)
        offs_b = np.zeros((B, ccap), np.int32)
        anch_b = np.zeros((B, n_anch), np.int32)
        tb_b = np.zeros((B,), np.int32)
        m_b = np.zeros((B,), np.int32)
        idx0_b = np.zeros((B,), np.int32)
        ns = []
        luts_s, luts_l = [], []
        all_anchored = True
        for j, payload in enumerate(group):
            n, m, idx0, tb, lengths, bit_offsets, anchors, words =                 _parse_block(payload)
            ns.append(n)
            words_b[j, : words.shape[0]] = words
            offs_b[j] = tb
            offs_b[j, : bit_offsets.shape[0]] = bit_offsets
            if anchors is not None and anchors.shape[0] == n_anch:
                anch_b[j] = anchors
            else:
                all_anchored = False
            tb_b[j], m_b[j], idx0_b[j] = tb, m, idx0
            table = HuffmanTable.from_lengths(lengths, MAX_LEN)
            luts_s.append(table.lut_sym)
            luts_l.append(table.lut_len)
        outs = []
        for j in range(B):
            args = (
                jnp.asarray(words_b[j]), jnp.int32(tb_b[j]),
                jnp.int32(m_b[j]), jnp.int32(idx0_b[j]),
                jnp.asarray(luts_s[j]), jnp.asarray(luts_l[j]),
                jnp.asarray(offs_b[j]),
            )
            if all_anchored:
                outs.append(_inverse_anchored(*args, jnp.asarray(anch_b[j]),
                                              cap))
            else:
                outs.append(_inverse(*args, cap))
        # one D2H pull for the whole group (per-pull tunnel latency
        # dwarfs the extra bytes)
        stacked = np.asarray(jnp.stack(outs))
        parts.extend(stacked[j, : ns[j]] for j in range(B))
    out = b"".join(x.tobytes() for x in parts)[: c.orig_len]
    if not c.verify_data(np.frombuffer(out, np.uint8)):
        raise ValueError("data checksum mismatch after decompress")
    return out
