"""bsc-class large-block codec: LZP -> BWT -> MTF -> RLE2 -> Huffman.

The tpulc counterpart of libbsc's pipeline (`libbsc.cpp
bsc_compress_inplace`: adler32 -> LZP -> block sorter -> coder), with
bsc's own division of labor (SURVEY.md §2.6): LZP runs on the host
(native C, as bsc does even in -G mode), the block sort and modelling
transforms run on the TPU via the masked dynamic-length pipeline, and
blocks default to 25 MB (`bsc.cpp:76`).  Two entropy coders (libbsc's
`-e` switch): coder 1 is the chunk-interleaved static order-2 rANS
(`rans.py` — the fast parallel stand-in for bsc's QLFC range coder,
same sub-block parallelization idea as `coder.cpp:52-61`); coder 2 is
the adaptive binary rANS (`rans_adaptive.py` — QLFC's per-event
adaptivity, lane-restarted).  Per-block incompressible fallback stores
raw (bsc's `bsc_store`).

Per-block payload (little-endian):

    n           u32   raw bytes in this block
    m_lzp       u32   LZP-stage bytes (== n when LZP was skipped)
    m           u32   RLE2 symbol count
    idx0        u32   BWT primary index
    nwords      u32   total rANS u16 words
    flags       u8    bit0: LZP applied; bit1: stored raw; bit2: order-2
                      context model (always set by coder 1);
                      bit3: decode anchors present; bits4-6: sorter
                      mode (0 = BWT, 3..8 = ST-k); bit7: filter byte
    coder       u8    1 = static context rANS, 2 = adaptive binary
    [filter     u8    when flags bit7]
    [anchors    bit-packed ceil(log2(cap))-wide, ceil(m_lzp/1024) of
                them   when bit3]
  coder 1:
    freqs       NCTX * (33B presence bitmap + u16 per present symbol)
    nlanes      u32
    first_ctx   5-bit-packed context id entering each lane
  coder 2:
    inits       NMODELS * u16  initial model probabilities
    maxbits     u32   deepest lane bit count (decode loop bound)
    nlanes      u32
    lane_cls    5-bit-packed context classes entering each lane
  both:
    counts      u16 * nlanes   per-lane word counts
    states      u32 * nlanes   final rANS states
    words       u16 * nwords   per-lane streams back to back
"""

from __future__ import annotations

import struct

import jax
import jax.numpy as jnp
import numpy as np

from tpulc.codecs.bsclike.rans import (
    CHUNK,
    NCTX,
    PROB_SCALE,
    build_tables_ctx,
    compact_words,
    ctx_of_stream,
    expand_words,
    normalize_freqs_ctx,
    rans_decode_ctx_batch,
    rans_decode_ctx_chained,
    rans_encode_ctx,
    rans_encode_ctx_batch,
)
from tpulc.codecs.bsclike.rans_adaptive import (
    ACHUNK,
    NMODELS,
    abc_decode,
    abc_encode,
    abc_stats,
    bucket_bits,
    quantize_inits,
)
from tpulc.codecs.bwt.masked import (
    forward_masked_anchored,
    inverse_masked,
    inverse_masked_anchored,
)
from tpulc.codecs.bwt.rle import ALPHABET
from tpulc.codecs.bsclike.filters import (
    FILTER_NONE,
    apply_filter_np,
    detect_record_size,
    invert_filter_np,
)
from tpulc.gold.lzp import lzp_decode, lzp_encode
from tpulc.pipeline.container import Container
from tpulc.pipeline.registry import CODEC_BSC
from tpulc.primitives.checksum import adler32_np
from tpulc.utils import timing

DEFAULT_BLOCK = 25 * 1024 * 1024
ANCHOR_STRIDE = 1024  # bsc blocks are large; halve anchor count


def _pack_bits_np(vals: np.ndarray, width: int) -> bytes:
    """np bit-packer: uint32[R] (< 2^width) -> ceil(R*width/8) bytes."""
    v = vals.astype(np.uint32)
    bits = (
        (v[:, None] >> np.arange(width - 1, -1, -1, dtype=np.uint32)) & 1
    ).astype(np.uint8)
    return np.packbits(bits.reshape(-1)).tobytes()


def _unpack_bits_np(buf: bytes, width: int, R: int) -> np.ndarray:
    bits = np.unpackbits(
        np.frombuffer(buf, np.uint8), count=R * width
    ).reshape(R, width).astype(np.uint32)
    w = np.arange(width - 1, -1, -1, dtype=np.uint32)
    return (bits << w).sum(axis=1).astype(np.int32)
_HEAD = struct.Struct("<IIIIIBB")  # ..., flags, coder
FCTX_BITS = 5  # context ids < NCTX = 32; abc lane classes < 32 too
# coder byte (libbsc's `-e` coder switch, `bsc.cpp`): 1 = static
# order-2 context rANS (`rans.py`), 2 = adaptive binary rANS
# (`rans_adaptive.py`, the QLFC-adaptivity equivalent)
CODER_RANS = 1
CODER_ABC = 2
# group-rank coder (grc.py): QLFC-class (rank, run) group decomposition
# over the raw MTF stream — replaces CODER_ABC for new -e2 streams on
# the BWT sorter (ST modes keep ABC: their transform emits RLE2 syms).
CODER_GRC = 4
# wrapper payload: the entropy-model segmentation detector split this
# block into independently-coded segments (libbsc's bsc_detect_segments,
# `filters/detectors.cpp:70-290`); header nwords field = segment count,
# followed by u32 sub-payload sizes + concatenated sub-payloads.
CODER_SEGMENTED = 3
FLAG_LZP = 1
FLAG_STORED = 2
FLAG_CTX = 4
FLAG_ANCHORS = 8
# bits 4-6: sorter mode — 0 = BWT, else ST-k stored as k-2 (1..6 for
# k=3..8, fitting 3 bits).  libbsc's `-m` switch (`bsc.cpp:85`); the
# mode is recorded per block as `libbsc.cpp:177-194` does, so decode
# dispatches the right inverse.
SORTER_SHIFT = 4
SORTER_MASK = 0x7 << SORTER_SHIFT
# bit 7: a filter byte follows the header (libbsc's preprocessing
# switch, `bsc.cpp` -p / `filters/preprocessing.cpp`); byte semantics
# in `filters.py` (0 none, 1 reverse, else reorder record size)
FLAG_FILTER = 0x80


def _filter_byte_for(block: np.ndarray, filter_mode: str) -> int:
    if filter_mode == "none":
        return FILTER_NONE
    if filter_mode == "reverse":
        return 1
    if filter_mode.startswith("reorder:"):
        rs = int(filter_mode.split(":", 1)[1])
        if not 2 <= rs <= 255:
            raise ValueError("reorder record size must be in 2..255")
        return rs
    if filter_mode == "auto":
        return detect_record_size(block)
    raise ValueError(f"unknown filter {filter_mode!r} "
                     "(none, reverse, reorder:N, auto)")


def _sorter_k(name: str) -> tuple[int, bool]:
    """'bwt' -> (0, False); 'st3'..'st8' -> (k, False); 'st8w' ->
    (8, True): ST-8 with the wired next-char stream, whose inverse is
    fully device-resident (`stk.st_decode_device_masked`) at ~2x
    payload (sorter code 7 on the wire)."""
    if name == "bwt":
        return 0, False
    if name == "st8w":
        return 8, True
    if name.startswith("st"):
        k = int(name[2:])
        if 3 <= k <= 8:
            return k, False
    raise ValueError(f"unknown sorter {name!r} (bwt, st3..st8, st8w)")


def _sorter_flag_bits(k_sort: int, wired: bool = False) -> int:
    if wired:
        return 7 << SORTER_SHIFT
    return ((k_sort - 2) << SORTER_SHIFT) if k_sort else 0


def _sorter_k_of_flags(flags: int) -> tuple[int, bool]:
    c = (flags & SORTER_MASK) >> SORTER_SHIFT
    if c == 7:
        return 8, True
    return (c + 2, False) if c else (0, False)


def _pack_freq_tables(fq: np.ndarray) -> bytes:
    """[NCTX, ALPHABET] quantized freqs -> u32 context-presence mask,
    then per PRESENT context (33-byte presence bitmap + u16 per present
    symbol).  Unused contexts (never entered in the stream) cost zero
    bytes; typical contexts hold well under half the alphabet, ~3x
    smaller than the dense u16 grid."""
    # a context whose table is the default (symbol-0-certain — what
    # normalize_freqs emits for never-entered contexts) ships as one
    # mask bit; the decoder reconstructs the identical table.
    used = ~((fq[:, 0] == PROB_SCALE) & (fq[:, 1:].sum(axis=1) == 0))
    mask = int(sum(1 << k for k in np.flatnonzero(used)))
    parts = [struct.pack("<I", mask)]
    for k in np.flatnonzero(used):
        present = fq[k] > 0
        bits = np.zeros(264, np.uint8)
        bits[: ALPHABET] = present
        parts.append(np.packbits(bits).tobytes())
        parts.append(fq[k][present].astype("<u2").tobytes())
    return b"".join(parts)


def _unpack_freq_tables(buf: bytes, off: int):
    (mask,) = struct.unpack("<I", buf[off: off + 4])
    off += 4
    fq = np.zeros((NCTX, ALPHABET), np.int32)
    for k in range(NCTX):
        if not (mask >> k) & 1:
            # never-entered context: decoder tables default to
            # symbol-0-certain (normalize_freqs of an empty histogram)
            fq[k][0] = PROB_SCALE
            continue
        bits = np.unpackbits(
            np.frombuffer(buf[off: off + 33], np.uint8)
        )[:ALPHABET].astype(bool)
        off += 33
        nnz = int(bits.sum())
        fq[k][bits] = np.frombuffer(
            buf[off: off + 2 * nnz], "<u2"
        ).astype(np.int32)
        off += 2 * nnz
    return fq, off


@jax.jit
def _ctx_stats(syms, m):
    """Order-1 stats: ([NCTX, ALPHABET] histograms over the valid
    prefix, per-position context classes).  Histogram via sort +
    searchsorted (scatter-free, see bwt driver note)."""
    cap = syms.shape[0]
    ctx = ctx_of_stream(syms)
    valid = jnp.arange(cap, dtype=jnp.int32) < m
    key = jnp.where(valid, ctx * ALPHABET + syms, NCTX * ALPHABET)
    ks = jax.lax.sort((key,), num_keys=1)[0]
    edges = jnp.searchsorted(
        ks, jnp.arange(NCTX * ALPHABET + 1, dtype=jnp.int32)
    ).astype(jnp.int32)
    hists = jnp.diff(edges).reshape(NCTX, ALPHABET)
    return hists, ctx


def _cap_for(block_size: int) -> int:
    # tile to both coders' lane sizes (CHUNK=512 divides ACHUNK=1024)
    q = max(64, CHUNK, ACHUNK)
    return -(-block_size // q) * q


def _tcap_for(nbytes: int, cap: int) -> int:
    """Transform-shape bucket: power-of-two >= nbytes, clamped to cap.

    LZP routinely shrinks repetitive blocks several-fold; running the
    sort-dominated transform (and the inverse at decode) at the
    container cap would waste that factor in every rank-refinement
    round.  Wire format is unchanged — lane/anchor counts are explicit
    per block — so encode and decode bucket independently."""
    t = max(64, CHUNK, ACHUNK)
    while t < nbytes:
        t *= 2
    return min(t, cap)


@jax.jit
def _decode_stage(syms, m, n, idx0):
    return inverse_masked(syms, m, n, idx0)


from functools import partial as _partial  # noqa: E402


@_partial(jax.jit, static_argnames=("k",))
def _fwd_packed_st(padded, n, k: int):
    """ST-k twin of `_fwd_packed`: identical meta layout ([m, idx0, ok,
    anchors(Rcap), hists, fctx]) with ok=0 and zero anchor rows — the
    host batch code unpacks both sorters the same way.  ONE stable sort
    against the BWT path's refinement loop (`st2.cu` rationale)."""
    from tpulc.codecs.bwt.rle import rle2_encode
    from tpulc.codecs.bwt.stk import st_encode_masked
    from tpulc.primitives.mtf import mtf_encode

    cap = padded.shape[0]
    r_cap = -(-cap // ANCHOR_STRIDE)
    idx = jnp.arange(cap, dtype=jnp.int32)
    last, idx0 = st_encode_masked(padded, n, k)
    ranks = mtf_encode(last)
    ranks = jnp.where(idx < n, ranks, jnp.uint8(255))
    syms, m_all = rle2_encode(ranks)
    m = m_all - (cap - n)
    hists, ctx = _ctx_stats(syms, m)
    fctx = ctx.reshape(-1, CHUNK)[:, 0]
    meta = jnp.concatenate([
        jnp.stack([m, idx0, jnp.int32(0)]),
        jnp.zeros((r_cap,), jnp.int32),
        hists.reshape(-1),
        fctx,
    ])
    return syms, ctx, meta


@_partial(jax.jit, static_argnames=("k",))
def _fwd_packed_st_wired(padded, n, k: int):
    """Wired-F ST-k forward (`stk.st_encode_with_next_masked`): the
    combined last||F stream (valid prefix 2n over [2*cap]) rides the
    same MTF/RLE2/ctx pipeline, making the inverse ST a static device
    permutation at decode (`_st_decode_wired_stage`) — no ctypes on
    the decode path.  Costs one extra entropy-coded stream (measured
    ~2.7x payload on pg text — the F stream clusters worse than the
    last column): the decode-parallelism trade libbsc cannot make because
    it does not own the container format (its inverse ST is a serial
    CPU walk, `cuda-bsc/libbsc/st/st.cpp:1029+`)."""
    from tpulc.codecs.bwt.rle import rle2_encode
    from tpulc.codecs.bwt.stk import st_encode_with_next_masked
    from tpulc.primitives.mtf import mtf_encode

    cap = padded.shape[0]
    r_cap = -(-(2 * cap) // ANCHOR_STRIDE)
    idx2 = jnp.arange(2 * cap, dtype=jnp.int32)
    last, fnext, idx0 = st_encode_with_next_masked(padded, n, k)
    z = jnp.zeros((cap,), jnp.uint8)
    combined = jnp.concatenate([last, z]) | jnp.roll(
        jnp.concatenate([fnext, z]), n)
    ranks = mtf_encode(combined)
    ranks = jnp.where(idx2 < 2 * n, ranks, jnp.uint8(255))
    syms, m_all = rle2_encode(ranks)
    m = m_all - (2 * cap - 2 * n)
    hists, ctx = _ctx_stats(syms, m)
    fctx = ctx.reshape(-1, CHUNK)[:, 0]
    meta = jnp.concatenate([
        jnp.stack([m, idx0, jnp.int32(0)]),
        jnp.zeros((r_cap,), jnp.int32),
        hists.reshape(-1),
        fctx,
    ])
    return syms, ctx, meta


@_partial(jax.jit, static_argnames=("k", "cap2"))
def _st_decode_wired_stage(syms, m, n, idx0, k: int, cap2: int):
    """Chip-resident inverse for wired ST blocks: RLE2 + MTF inverse
    recover the combined last||F stream (2n valid bytes over [2*cap2]),
    then the static predecessor-permutation walk restores the text
    (`stk.st_decode_device_masked`)."""
    from tpulc.codecs.bwt.rle import rle2_decode
    from tpulc.codecs.bwt.stk import st_decode_device_masked
    from tpulc.primitives.mtf import mtf_decode

    ranks, _ = rle2_decode(syms, m)
    combined = mtf_decode(ranks)
    last = combined[:cap2]
    fnext = jnp.roll(combined, -n)[:cap2]
    return st_decode_device_masked(last, fnext, idx0, n, k)


@jax.jit
def _st_last_stage(syms, m):
    """RLE2 + MTF inverse -> the ST last column (uint8[cap], valid
    prefix is the block's pre-sort length); the serial inverse-ST walk
    is host-side native C (`stk.st_decode`)."""
    from tpulc.codecs.bwt.rle import rle2_decode
    from tpulc.primitives.mtf import mtf_decode

    ranks, _ = rle2_decode(syms, m)
    return mtf_decode(ranks)


@jax.jit
def _decode_stage_anchored(syms, m, n, idx0, anchors):
    return inverse_masked_anchored(syms, m, n, idx0, anchors,
                                   ANCHOR_STRIDE)


@jax.jit
def _decode_stage_ranks_anchored(ranks, n, idx0, anchors):
    from tpulc.codecs.bwt.masked import inverse_ranks_anchored

    return inverse_ranks_anchored(ranks, n, idx0, anchors,
                                  ANCHOR_STRIDE)


@jax.jit
def _decode_stage_ranks(ranks, n, idx0):
    from tpulc.codecs.bwt.masked import bwt_decode_masked
    from tpulc.primitives.mtf import mtf_decode

    last = mtf_decode(ranks.astype(jnp.uint8))
    return bwt_decode_masked(last, n, idx0)


def _finish_block_grc(ranks, idx0, anchors, a_ok, orig_block, n,
                      m_lzp, cap, flags, fb) -> bytes:
    """Entropy stage + payload assembly for the group-rank coder
    (grc.py) — the `-e2` best-ratio path."""
    from tpulc.codecs.bsclike import grc as G

    with timing.stage("bsc.rans"):
        # Tunnel discipline (measured r4: ~25 ms RTT per D2H pull):
        # three pulls total — (1) the sizing pre-pass, (2) all small
        # metadata concatenated, (3) a tight bucket of the words.
        lane_bits_d, nstarts_d = G.grc_lane_bits(ranks, jnp.int32(m_lzp))
        pre = np.asarray(jnp.concatenate(
            [lane_bits_d, jnp.reshape(nstarts_d, (1,))]))
        lane_bits, nstarts = pre[:-1], int(pre[-1])
        maxbits = int(lane_bits.max()) if lane_bits.size else 0
        W = bucket_bits(max(maxbits, 1))
        # static start-count bucket: the binarize scatter rounds cost
        # per source element, so run them over ~nstarts, not cap
        bs = min(bucket_bits(max(nstarts, 1), lo=1024), ranks.shape[0])
        from tpulc.codecs.bsclike import grc_pallas as GP

        enc = GP.grc_encode_pallas if GP.use_pallas() else G.grc_encode
        words, counts, states, inits_d, cinits_d, tot_d = enc(
            ranks, jnp.int32(m_lzp), W, bs=bs)
        used = max(1, -(-int(m_lzp) // G.GCHUNK))
        meta = np.asarray(jnp.concatenate([
            counts[:used].astype(jnp.int32),
            jax.lax.bitcast_convert_type(states[:used], jnp.int32),
            inits_d.astype(jnp.int32), cinits_d.astype(jnp.int32),
            tot_d,
        ]))
        counts_np = meta[:used]
        states_np = meta[used: 2 * used].view(np.uint32).astype("<u4")
        o = 2 * used
        inits = meta[o: o + G.NM].astype(np.uint16)
        cinits = meta[o + G.NM: o + G.NM + G.NFAM].astype(np.uint16)
        tot = meta[o + G.NM + G.NFAM:]
        # tight words pull: bucket both lane count and width
        wmax = int(counts_np.max(initial=0)) + 1
        used_b = min(bucket_bits(used, lo=64), words.shape[0])
        wc2 = min(bucket_bits(wmax, lo=64), words.shape[1])
        words_np = np.asarray(words[:used_b, :wc2])[:used]
    nwords = int(counts_np.sum())
    inits_b = G.pack_inits(inits, tot)
    r_used = max(1, -(-m_lzp // ANCHOR_STRIDE))
    aw = max(1, int(cap - 1).bit_length())
    body_size = _HEAD.size + len(inits_b) + 2 * G.NFAM + 8 + 6 * used \
        + 2 * nwords + (-(-r_used * aw // 8) if bool(a_ok) else 0)
    if body_size >= n:
        return _HEAD.pack(n, n, 0, 0, 0, FLAG_STORED, CODER_GRC) \
            + orig_block.tobytes()
    lane_valid = (
        np.arange(words_np.shape[1])[None, :] < counts_np[:, None]
    )
    flat = words_np[lane_valid].astype("<u2")
    anchors_np = None
    if bool(a_ok):
        flags |= FLAG_ANCHORS
        anchors_np = np.asarray(anchors[:r_used]).astype(np.uint32)
    payload = _HEAD.pack(n, m_lzp, m_lzp, int(idx0), nwords, flags,
                         CODER_GRC)
    if flags & FLAG_FILTER:
        payload += bytes([fb])
    if anchors_np is not None:
        payload += _pack_bits_np(anchors_np, aw)
    payload += inits_b
    payload += cinits.astype("<u2").tobytes()
    payload += struct.pack("<II", int(maxbits), used)
    payload += counts_np.astype("<u2").tobytes()
    payload += states_np.tobytes()
    payload += flat.tobytes()
    return payload


def _finish_block_abc(syms, m, idx0, anchors, a_ok, orig_block, n,
                      m_lzp, cap, flags, fb) -> bytes:
    """Entropy stage + payload assembly for the adaptive binary coder
    (single-block path).  Mirrors the coder-1 tail of
    `compress_block`."""
    with timing.stage("bsc.rans"):
        ms_d = jnp.reshape(m, (1,)).astype(jnp.int32)
        ones, tot, lane_bits_d, lane_cls_d = abc_stats(syms[None], ms_d)
        inits = quantize_inits(np.asarray(ones), np.asarray(tot))
        lane_bits = np.asarray(lane_bits_d)
        lane_cls_np = np.asarray(lane_cls_d)
        m_i, idx0_i = int(m), int(idx0)
        used = max(1, -(-m_i // ACHUNK))
        maxbits = int(lane_bits[:used].max()) if m_i else 0
        W = bucket_bits(max(maxbits, 1))
        words, counts, states = abc_encode(
            syms[None], ms_d, jnp.asarray(inits), W
        )
        counts_np = np.asarray(counts[:used])
        states_np = np.asarray(states[:used]).astype("<u4")
        words_np = np.asarray(words[:used])
    nwords = int(counts_np.sum())
    lane_valid = (
        np.arange(words_np.shape[1])[None, :] < counts_np[:, None]
    )
    flat = words_np[lane_valid].astype("<u2")
    r_used = max(1, -(-m_lzp // ANCHOR_STRIDE))
    aw = max(1, int(cap - 1).bit_length())
    body_size = _HEAD.size + 2 * NMODELS + 8 + 6 * used \
        + -(-used * FCTX_BITS // 8) + 2 * nwords \
        + (-(-r_used * aw // 8) if bool(a_ok) else 0)
    if body_size >= n:
        return _HEAD.pack(n, n, 0, 0, 0, FLAG_STORED, CODER_ABC) \
            + orig_block.tobytes()
    anchors_np = None
    if bool(a_ok):
        flags |= FLAG_ANCHORS
        anchors_np = np.asarray(anchors[:r_used]).astype(np.uint32)
    payload = _HEAD.pack(n, m_lzp, m_i, idx0_i, nwords, flags, CODER_ABC)
    if flags & FLAG_FILTER:
        payload += bytes([fb])
    if anchors_np is not None:
        payload += _pack_bits_np(anchors_np, aw)
    payload += inits[0].astype("<u2").tobytes()
    payload += struct.pack("<II", maxbits, used)
    payload += _pack_bits_np(lane_cls_np[:used].astype(np.uint32),
                             FCTX_BITS)
    payload += counts_np.astype("<u2").tobytes()
    payload += states_np.tobytes()
    payload += flat.tobytes()
    return payload


def compress_block(block: np.ndarray, block_cap: int,
                   use_lzp: bool = True, sorter: str = "bwt",
                   filter_mode: str = "auto",
                   coder: int = CODER_RANS, _segments=None) -> bytes:
    n = block.shape[0]
    if filter_mode == "auto" and _segments is None:
        from tpulc.codecs.bsclike.filters import detect_segments_gated

        _segments = detect_segments_gated(block)
    if _segments is not None and len(_segments) > 1:
        subs = []
        start = 0
        for sl in _segments:
            subs.append(compress_block(
                block[start: start + sl], block_cap, use_lzp, sorter,
                filter_mode, coder, _segments=[sl],
            ))
            start += sl
        head = _HEAD.pack(n, 0, 0, 0, len(subs), 0, CODER_SEGMENTED)
        return head + np.asarray(
            [len(s) for s in subs], "<u4"
        ).tobytes() + b"".join(subs)
    cap = _cap_for(block_cap)
    k_sort, st_wired = _sorter_k(sorter)
    flags = _sorter_flag_bits(k_sort, st_wired)
    orig_block = block
    fb = _filter_byte_for(block, filter_mode)
    if fb != FILTER_NONE:
        block = apply_filter_np(block, fb)
        flags |= FLAG_FILTER
    stage = block
    if use_lzp:
        with timing.stage("bsc.lzp"):
            lz = lzp_encode(block)
        if lz is not None:
            stage = np.frombuffer(lz, np.uint8)
            flags |= FLAG_LZP
    m_lzp = stage.shape[0]
    tcap = _tcap_for(m_lzp, cap)
    padded = np.zeros(tcap, np.uint8)
    padded[:m_lzp] = stage
    if coder == CODER_ABC and not k_sort:
        coder = CODER_GRC      # new -e2 streams use the group coder
    if coder == CODER_GRC:
        from tpulc.codecs.bwt.masked import forward_ranks_anchored

        with timing.stage("bsc.transform"):
            ranks, idx0, anchors, a_ok = forward_ranks_anchored(
                jnp.asarray(padded), jnp.int32(m_lzp), ANCHOR_STRIDE
            )
        return _finish_block_grc(ranks, idx0, anchors, a_ok,
                                 orig_block, n, m_lzp, cap, flags, fb)
    with timing.stage("bsc.transform"):
        if k_sort:
            if st_wired:
                syms, ctx, meta = _fwd_packed_st_wired(
                    jnp.asarray(padded), jnp.int32(m_lzp), k_sort
                )
                r_cap = -(-(2 * tcap) // ANCHOR_STRIDE)
            else:
                syms, ctx, meta = _fwd_packed_st(
                    jnp.asarray(padded), jnp.int32(m_lzp), k_sort
                )
                r_cap = -(-tcap // ANCHOR_STRIDE)
            m, idx0 = meta[0], meta[1]
            a_ok = jnp.bool_(False)
            anchors = meta[3: 3 + r_cap]
            hists = meta[3 + r_cap: 3 + r_cap + NCTX * ALPHABET].reshape(
                NCTX, ALPHABET
            )
        else:
            syms, m, idx0, hist, anchors, a_ok = forward_masked_anchored(
                jnp.asarray(padded), jnp.int32(m_lzp), ANCHOR_STRIDE
            )
            del hist  # order-1 context histograms replace the global one
            hists, ctx = _ctx_stats(syms, m)
    if coder == CODER_ABC:
        return _finish_block_abc(
            syms, m, idx0, anchors, a_ok, orig_block, n, m_lzp, cap,
            flags, fb
        )
    with timing.stage("bsc.transform"):
        fq = normalize_freqs_ctx(np.asarray(hists))
    freq_d, cum_d, _ = build_tables_ctx(fq)
    with timing.stage("bsc.rans"):
        words, counts, states = rans_encode_ctx(
            syms, ctx, m, jnp.asarray(freq_d), jnp.asarray(cum_d)
        )
        first_ctx = ctx.reshape(-1, CHUNK)[:, 0]
        m, idx0 = int(m), int(idx0)
        used_lanes = max(1, -(-m // CHUNK))
        counts_np = np.asarray(counts[:used_lanes])
    states_np = np.asarray(states[:used_lanes]).astype("<u4")
    words_np = np.asarray(words[:used_lanes])
    fctx_np = np.asarray(first_ctx[:used_lanes]).astype(np.uint8)
    nwords = int(counts_np.sum())
    body_size = _HEAD.size + 33 * NCTX + 2 * int(
        (fq > 0).sum()
    ) + 4 + 6 * used_lanes \
        + -(-used_lanes * FCTX_BITS // 8) + 2 * nwords \
        + (-(-max(1, -(-m_lzp // ANCHOR_STRIDE))
             * max(1, int(cap - 1).bit_length()) // 8)
           if bool(a_ok) else 0)
    if body_size >= n:
        return _HEAD.pack(n, n, 0, 0, 0, FLAG_STORED,
                          CODER_RANS) + orig_block.tobytes()
    # compact per-lane words into one stream (row-major boolean mask ==
    # lane-major concatenation; no per-lane Python loop)
    lane_valid = (
        np.arange(words_np.shape[1])[None, :] < counts_np[:, None]
    )
    flat = words_np[lane_valid].astype("<u2")
    flags |= FLAG_CTX
    r_used = max(1, -(-m_lzp // ANCHOR_STRIDE))
    aw = max(1, int(cap - 1).bit_length())
    anchors_np = None
    if bool(a_ok):
        flags |= FLAG_ANCHORS
        anchors_np = np.asarray(anchors[:r_used]).astype(np.uint32)
    payload = _HEAD.pack(n, m_lzp, m, idx0, nwords, flags, CODER_RANS)
    if flags & FLAG_FILTER:
        payload += bytes([fb])
    if anchors_np is not None:
        payload += _pack_bits_np(anchors_np, aw)
    payload += _pack_freq_tables(fq)
    payload += struct.pack("<I", used_lanes)
    payload += _pack_bits_np(fctx_np.astype(np.uint32), FCTX_BITS)
    payload += counts_np.astype("<u2").tobytes()
    payload += states_np.tobytes()
    payload += flat.tobytes()
    return payload


def decompress_block(payload: bytes, block_cap: int,
                     _depth: int = 0) -> np.ndarray:
    (n, m_lzp, m, idx0, nwords, flags,
     coder) = _HEAD.unpack(payload[: _HEAD.size])
    off = _HEAD.size
    if flags & FLAG_STORED:
        return np.frombuffer(payload[off: off + n], np.uint8)
    if coder == CODER_SEGMENTED:
        # compress never nests segments; a crafted chain of single-
        # segment payloads must raise a stream error, not recurse.
        if _depth >= 1:
            raise ValueError("bad segmented payload: nested segments")
        nseg = nwords
        if nseg < 1 or nseg > 4096 or off + 4 * nseg > len(payload):
            raise ValueError("bad segmented payload")
        sizes = np.frombuffer(payload[off: off + 4 * nseg], "<u4")
        off += 4 * nseg
        if int(sizes.sum()) != len(payload) - off:
            raise ValueError("bad segmented payload sizes")
        parts = []
        for sz in sizes:
            parts.append(decompress_block(payload[off: off + int(sz)],
                                          block_cap, _depth + 1))
            off += int(sz)
        return np.concatenate(parts)
    if coder == CODER_RANS:
        assert flags & FLAG_CTX, "pre-context bsc streams not supported"
    filt = FILTER_NONE
    if flags & FLAG_FILTER:
        filt = payload[off]
        off += 1
    cap0 = _cap_for(block_cap)
    anchors = None
    if flags & FLAG_ANCHORS:
        r_used = max(1, -(-m_lzp // ANCHOR_STRIDE))
        aw = max(1, int(cap0 - 1).bit_length())
        nb = -(-r_used * aw // 8)
        anchors = _unpack_bits_np(payload[off: off + nb], aw, r_used)
        off += nb
    cap = _cap_for(block_cap)
    k_sort, st_wired = _sorter_k_of_flags(flags)
    if st_wired:
        # wired ST streams code 2*m_lzp bytes (last || F)
        dcap = _tcap_for(max(m, 2 * m_lzp), 2 * cap)
    else:
        dcap = _tcap_for(max(m, m_lzp), cap)
    if coder == CODER_GRC:
        from tpulc.codecs.bsclike import grc as G

        inits, off = G.unpack_inits(payload, off)
        cinits = np.frombuffer(payload[off: off + 2 * G.NFAM], "<u2")
        off += 2 * G.NFAM
        maxbits, nlanes = struct.unpack("<II", payload[off: off + 8])
        off += 8
        counts = np.frombuffer(
            payload[off: off + 2 * nlanes], "<u2").astype(np.int32)
        off += 2 * nlanes
        states = np.frombuffer(payload[off: off + 4 * nlanes], "<u4")
        off += 4 * nlanes
        flat = np.frombuffer(payload[off: off + 2 * nwords], "<u2")
        lcap_g = max(1, dcap // G.GCHUNK)
        # hostile-field bounds (bzip2 DATA_ERROR discipline): a lane
        # cannot carry more events than MAX_GROUP_BITS per symbol, and
        # the lane count is fixed by the block geometry
        if (nlanes > lcap_g or maxbits > G.MAX_GROUP_BITS * G.GCHUNK
                or int(counts.max(initial=0)) > G.MAX_GROUP_BITS
                * G.GCHUNK):
            raise ValueError("bad grc payload geometry")
        Wc = bucket_bits(int(counts.max(initial=0)) + 2, lo=64)
        words_p = np.zeros((lcap_g, Wc), np.uint16)
        lane_valid = np.arange(Wc)[None, :] < counts[:, None]
        words_p[:nlanes][lane_valid] = flat
        states_p = np.full(lcap_g, 1 << 16, np.uint32)
        states_p[:nlanes] = states
        counts_p = np.zeros(lcap_g, np.int32)
        counts_p[:nlanes] = counts
        with timing.stage("bsc.rans.decode"):
            from tpulc.codecs.bsclike import grc_pallas as GP

            dec = (GP.grc_decode_pallas if GP.use_pallas()
                   else G.grc_decode)
            ranks = dec(
                jnp.asarray(words_p), jnp.asarray(counts_p),
                jnp.asarray(states_p), jnp.int32(m_lzp),
                jnp.asarray(inits), jnp.asarray(cinits),
                jnp.int32(maxbits), dcap,
            )
        if anchors is not None:
            r_cap = -(-dcap // ANCHOR_STRIDE)
            anch_p = np.full(r_cap, idx0, np.int32)
            anch_p[: anchors.shape[0]] = anchors
            stage = _decode_stage_ranks_anchored(
                ranks, jnp.int32(m_lzp), jnp.int32(idx0),
                jnp.asarray(anch_p),
            )
        else:
            stage = _decode_stage_ranks(ranks, jnp.int32(m_lzp),
                                        jnp.int32(idx0))
        stage = np.asarray(stage[:m_lzp])
        if flags & FLAG_LZP:
            out = np.frombuffer(lzp_decode(stage, n), np.uint8)
        else:
            out = stage[:n]
        return invert_filter_np(out, filt)
    if coder == CODER_ABC:
        inits = np.frombuffer(
            payload[off: off + 2 * NMODELS], "<u2"
        ).reshape(1, NMODELS)
        off += 2 * NMODELS
        maxbits, nlanes = struct.unpack("<II", payload[off: off + 8])
        off += 8
        fb = -(-nlanes * FCTX_BITS // 8)
        lane_cls = _unpack_bits_np(payload[off: off + fb], FCTX_BITS,
                                   nlanes)
        off += fb
        counts = np.frombuffer(
            payload[off: off + 2 * nlanes], "<u2"
        ).astype(np.int32)
        off += 2 * nlanes
        states = np.frombuffer(payload[off: off + 4 * nlanes], "<u4")
        off += 4 * nlanes
        flat = np.frombuffer(payload[off: off + 2 * nwords], "<u2")
        lcap_a = max(1, dcap // ACHUNK)
        Wc = bucket_bits(int(counts.max(initial=0)) + 2, lo=64)
        words_p = np.zeros((lcap_a, Wc), np.uint16)
        lane_valid = np.arange(Wc)[None, :] < counts[:, None]
        words_p[:nlanes][lane_valid] = flat
        states_p = np.full(lcap_a, 1 << 16, np.uint32)
        states_p[:nlanes] = states
        counts_p = np.zeros(lcap_a, np.int32)
        counts_p[:nlanes] = counts
        cls_p = np.zeros(lcap_a, np.int32)
        cls_p[:nlanes] = lane_cls
        syms = abc_decode(
            jnp.asarray(words_p), jnp.asarray(counts_p),
            jnp.asarray(states_p), jnp.asarray(cls_p),
            jnp.asarray(np.array([m], np.int32)), jnp.asarray(inits),
            jnp.int32(maxbits), B=1,
        )[0]
    else:
        fq, off = _unpack_freq_tables(payload, off)
        (nlanes,) = struct.unpack("<I", payload[off: off + 4])
        off += 4
        fb = -(-nlanes * FCTX_BITS // 8)
        fctx = _unpack_bits_np(payload[off: off + fb], FCTX_BITS, nlanes)
        off += fb
        counts = np.frombuffer(
            payload[off: off + 2 * nlanes], "<u2"
        ).astype(np.int32)
        off += 2 * nlanes
        states = np.frombuffer(payload[off: off + 4 * nlanes], "<u4")
        off += 4 * nlanes
        flat = np.frombuffer(payload[off: off + 2 * nwords], "<u2")
        lcap = max(1, dcap // CHUNK)
        words_p = np.zeros((lcap, CHUNK + 2), np.uint16)
        lane_valid = np.arange(CHUNK + 2)[None, :] < counts[:, None]
        words_p[:nlanes][lane_valid] = flat
        states_p = np.full(lcap, 1 << 16, np.uint32)
        states_p[:nlanes] = states
        counts_p = np.zeros(lcap, np.int32)
        counts_p[:nlanes] = counts
        fctx_p = np.zeros(lcap, np.int32)
        fctx_p[:nlanes] = fctx
        freq_d, cum_d, lut = build_tables_ctx(fq)
        syms = rans_decode_ctx_chained(
            jnp.asarray(words_p), jnp.asarray(counts_p),
            jnp.asarray(states_p), jnp.asarray(fctx_p), jnp.int32(m),
            jnp.asarray(freq_d), jnp.asarray(cum_d), jnp.asarray(lut),
        )
    if k_sort:
        if st_wired:
            with timing.stage("bsc.unsort"):
                stage = np.asarray(_st_decode_wired_stage(
                    syms, jnp.int32(m), jnp.int32(m_lzp),
                    jnp.int32(idx0), k_sort, dcap // 2,
                ))[:m_lzp]
        else:
            from tpulc.codecs.bwt.stk import st_decode

            last = np.asarray(_st_last_stage(syms, jnp.int32(m)))[:m_lzp]
            stage = st_decode(last, idx0, k_sort)
        if flags & FLAG_LZP:
            out = np.frombuffer(lzp_decode(stage, n), np.uint8)
        else:
            out = stage[:n]
        return invert_filter_np(out, filt)
    if anchors is not None:
        r_cap = -(-dcap // ANCHOR_STRIDE)
        anch_p = np.full(r_cap, idx0, np.int32)
        anch_p[: anchors.shape[0]] = anchors
        stage = _decode_stage_anchored(
            syms, jnp.int32(m), jnp.int32(m_lzp), jnp.int32(idx0),
            jnp.asarray(anch_p),
        )
    else:
        stage = _decode_stage(syms, jnp.int32(m), jnp.int32(m_lzp),
                              jnp.int32(idx0))
    stage = np.asarray(stage[:m_lzp])
    if flags & FLAG_LZP:
        out = np.frombuffer(lzp_decode(stage, n), np.uint8)
    else:
        out = stage[:n]
    return invert_filter_np(out, filt)


@jax.jit
def _fwd_packed(padded, n):
    """Transform + stats with small outputs packed into one int32 meta
    row: [m, idx0, ok, anchors(Rcap), hists(NCTX*ALPHABET), fctx(lcap)].
    syms/ctx stay on device for the batched entropy stage."""
    cap = padded.shape[0]
    syms, m, idx0, hist, anchors, a_ok = forward_masked_anchored(
        padded, n, ANCHOR_STRIDE
    )
    del hist
    hists, ctx = _ctx_stats(syms, m)
    fctx = ctx.reshape(-1, CHUNK)[:, 0]
    meta = jnp.concatenate([
        jnp.stack([m, idx0, a_ok.astype(jnp.int32)]),
        anchors,
        hists.reshape(-1),
        fctx,
    ])
    return syms, ctx, meta


@jax.jit
def _stack_gctx(ctx2):
    """[B, cap] local contexts -> global (block-offset) contexts."""
    B = ctx2.shape[0]
    return ctx2 + (jnp.arange(B, dtype=jnp.int32) * NCTX)[:, None]


@jax.jit
def _lut_from_freqs(freq, cum):
    """[R, S] quantized tables -> flat slot->symbol LUT int32[R * 2^PB]
    built on device (uploading host LUTs costs B*NCTX*2^PB ints).

    symbol(slot) = #{s : end[s] <= slot} — a broadcast compare-reduce
    XLA fuses without materializing [R, 2^PB, S] (the vmapped
    searchsorted it replaces lowered to a 48 ms gather loop, r4
    trace)."""
    slots = jnp.arange(PROB_SCALE, dtype=jnp.int32)
    ends = cum + freq  # cumulative ends per row
    lut = jnp.sum(
        (slots[None, :, None] >= ends[:, None, :]).astype(jnp.int32),
        axis=2,
    )
    return lut.reshape(-1)


def _bucket(x: int, lo: int = 4096) -> int:
    b = lo
    while b < x:
        b *= 2
    return b


def compress(data: bytes | np.ndarray, block_size: int = DEFAULT_BLOCK,
             use_lzp: bool = True, sorter: str = "bwt",
             filter_mode: str = "auto", coder: int = CODER_RANS) -> bytes:
    arr = np.frombuffer(data, np.uint8) if isinstance(data, (bytes, bytearray)) \
        else np.asarray(data, np.uint8)
    n_total = arr.shape[0]
    cap = _cap_for(block_size)
    k_sort, st_wired = _sorter_k(sorter)
    aw = max(1, int(cap - 1).bit_length())
    starts = list(range(0, max(n_total, 1), block_size))
    B = len(starts)

    if filter_mode == "auto":
        # entropy-model segmentation (detectors.cpp role): blocks that
        # split route through the per-block path as segmented payloads;
        # homogeneous inputs fall through to the batched pipeline.
        # `auto` is the DEFAULT since r5: the O(n) homogeneity pre-gate
        # makes it ~free on uniform corpora (VERDICT r4 next #9).
        from tpulc.codecs.bsclike.filters import detect_segments_gated

        seg_lists = [detect_segments_gated(arr[s: s + block_size])
                     for s in starts]
        if any(len(sl) > 1 for sl in seg_lists):
            payloads = [
                compress_block(arr[s: s + block_size], block_size,
                               use_lzp, sorter, filter_mode, coder,
                               _segments=sl)
                for s, sl in zip(starts, seg_lists)
            ]
            c = Container(
                codec_id=CODEC_BSC, flags=0, orig_len=n_total,
                block_size=block_size,
                comp_sizes=[len(p) for p in payloads],
                payloads=payloads, data_adler=adler32_np(arr),
            )
            return c.to_bytes()

    if (coder == CODER_ABC and k_sort == 0) or st_wired:
        # group-rank coder (-e2 on the BWT sorter) and wired-ST blocks
        # ride the per-block path; blocks at the default 25 MB mean B
        # is small
        payloads = [
            compress_block(arr[s: s + block_size], block_size,
                           use_lzp, sorter, filter_mode, coder)
            for s in starts
        ]
        c = Container(
            codec_id=CODEC_BSC, flags=0, orig_len=n_total,
            block_size=block_size,
            comp_sizes=[len(p) for p in payloads],
            payloads=payloads, data_adler=adler32_np(arr),
        )
        return c.to_bytes()

    # LZP runs in worker threads (ctypes drops the GIL) — the TPU shape
    # of the reference's OpenMP-parallel LZP (`lzp.cpp:244,323`).  All
    # stripes finish BEFORE the first dispatch so the transform shapes
    # can bucket to the post-LZP sizes (`_tcap_for`): native LZP runs
    # ~290 MB/s, so the serialized wait is microscopic next to one
    # saved refinement round at 4x the rows.
    def _lzp_one(s):
        orig = arr[s: s + block_size]
        fbb = _filter_byte_for(orig, filter_mode)
        blk = apply_filter_np(orig, fbb) if fbb != FILTER_NONE else orig
        return orig, blk, fbb, (lzp_encode(blk) if use_lzp else None)

    from concurrent.futures import ThreadPoolExecutor

    with timing.stage("bsc.lzp"):
        with ThreadPoolExecutor(max_workers=2) as lzp_pool:
            lzp_results = list(lzp_pool.map(_lzp_one, starts))

    stages, flags_l, fbs, devs = [], [], [], []
    for orig, blk, fbb, lz in lzp_results:
        flags = FLAG_FILTER if fbb != FILTER_NONE else 0
        fbs.append(fbb)
        stage = blk
        if lz is not None:
            stage = np.frombuffer(lz, np.uint8)
            flags |= FLAG_LZP
        stages.append((orig, stage))
        flags_l.append(flags)
    tcap = _tcap_for(max(s.shape[0] for _, s in stages), cap)
    lcap = max(1, tcap // CHUNK)
    r_cap = -(-tcap // ANCHOR_STRIDE)
    for _, stage in stages:
        padded = np.zeros(tcap, np.uint8)
        padded[: stage.shape[0]] = stage
        if k_sort:
            devs.append(_fwd_packed_st(
                jnp.asarray(padded), jnp.int32(stage.shape[0]), k_sort
            ))
        else:
            devs.append(_fwd_packed(
                jnp.asarray(padded), jnp.int32(stage.shape[0])
            ))

    with timing.stage("bsc.transform"):
        metas = np.asarray(jnp.stack([d[2] for d in devs]))  # ONE pull
    ms = metas[:, 0].astype(np.int64)
    idx0s = metas[:, 1]
    oks = metas[:, 2].astype(bool)
    anchors_all = metas[:, 3: 3 + r_cap]
    hists = metas[:, 3 + r_cap: 3 + r_cap + NCTX * ALPHABET].reshape(
        B, NCTX, ALPHABET
    )
    fctx_all = metas[:, 3 + r_cap + NCTX * ALPHABET:]

    if coder == CODER_ABC:
        with timing.stage("bsc.rans"):
            syms2 = jnp.stack([d[0] for d in devs])
            ms32 = jnp.asarray(ms.astype(np.int32))
            ones, tot, lane_bits_d, lane_cls_d = abc_stats(syms2, ms32)
            inits = quantize_inits(np.asarray(ones), np.asarray(tot))
            lane_bits = np.asarray(lane_bits_d).reshape(B, -1)
            lane_cls_all = np.asarray(lane_cls_d)
            lcap_a = max(1, tcap // ACHUNK)
            W = bucket_bits(max(int(lane_bits.max()), 1))
            words, counts, states = abc_encode(
                syms2, ms32, jnp.asarray(inits), W
            )
            counts_np = np.asarray(counts)
            total_words = int(counts_np.sum())
            flat = np.asarray(
                compact_words(words, counts, _bucket(max(total_words, 1)))
            )[:total_words]
            states_np = np.asarray(states)
        lane_offs = np.concatenate(
            [[0], np.cumsum(counts_np)]
        ).astype(np.int64)
        payloads = []
        for b in range(B):
            block, stage = stages[b]
            n = block.shape[0]
            m_lzp = stage.shape[0]
            m = int(ms[b])
            used = max(1, -(-m // ACHUNK))
            lane0 = b * lcap_a
            cnts = counts_np[lane0: lane0 + used]
            nwords = int(cnts.sum())
            r_used = max(1, -(-m_lzp // ANCHOR_STRIDE))
            flags = flags_l[b] | _sorter_flag_bits(k_sort)
            body_size = _HEAD.size + 2 * NMODELS + 8 + 6 * used \
                + -(-used * FCTX_BITS // 8) + 2 * nwords \
                + (-(-r_used * aw // 8) if oks[b] else 0)
            if body_size >= n:
                payloads.append(
                    _HEAD.pack(n, n, 0, 0, 0, FLAG_STORED, CODER_ABC)
                    + block.tobytes()
                )
                continue
            if oks[b]:
                flags |= FLAG_ANCHORS
            maxbits = int(lane_bits[b].max())
            payload = _HEAD.pack(n, m_lzp, m, int(idx0s[b]), nwords,
                                 flags, CODER_ABC)
            if flags & FLAG_FILTER:
                payload += bytes([fbs[b]])
            if oks[b]:
                payload += _pack_bits_np(
                    anchors_all[b, :r_used].astype(np.uint32), aw
                )
            payload += inits[b].astype("<u2").tobytes()
            payload += struct.pack("<II", maxbits, used)
            payload += _pack_bits_np(
                lane_cls_all[lane0: lane0 + used].astype(np.uint32),
                FCTX_BITS,
            )
            payload += cnts.astype("<u2").tobytes()
            payload += states_np[lane0: lane0 + used].astype(
                "<u4"
            ).tobytes()
            payload += flat[
                lane_offs[lane0]: lane_offs[lane0] + nwords
            ].astype("<u2").tobytes()
            payloads.append(payload)
        c = Container(
            codec_id=CODEC_BSC, flags=0, orig_len=n_total,
            block_size=block_size, comp_sizes=[len(p) for p in payloads],
            payloads=payloads, data_adler=adler32_np(arr),
        )
        return c.to_bytes()

    fqs = np.stack([normalize_freqs_ctx(h) for h in hists])  # [B,NCTX,S]
    freq_d = jnp.asarray(fqs.reshape(B * NCTX, ALPHABET).astype(np.int32))
    cum_np = np.concatenate(
        [np.zeros((B * NCTX, 1), np.int32),
         np.cumsum(fqs.reshape(B * NCTX, ALPHABET), axis=1)[:, :-1]
         .astype(np.int32)],
        axis=1,
    )
    cum_d = jnp.asarray(cum_np)

    with timing.stage("bsc.rans"):
        syms2 = jnp.stack([d[0] for d in devs])
        gctx2 = _stack_gctx(jnp.stack([d[1] for d in devs]))
        words, counts, states = rans_encode_ctx_batch(
            syms2, gctx2, jnp.asarray(ms.astype(np.int32)), freq_d, cum_d
        )
        counts_np = np.asarray(counts)          # [B*lcap] small pull
        total_words = int(counts_np.sum())
        flat = np.asarray(
            compact_words(words, counts, _bucket(max(total_words, 1)))
        )[:total_words]
        states_np = np.asarray(states)

    lane_offs = np.concatenate([[0], np.cumsum(counts_np)]).astype(np.int64)
    payloads = []
    for b in range(B):
        block, stage = stages[b]
        n = block.shape[0]
        m_lzp = stage.shape[0]
        m = int(ms[b])
        used_lanes = max(1, -(-m // CHUNK))
        lane0 = b * lcap
        cnts = counts_np[lane0: lane0 + used_lanes]
        nwords = int(cnts.sum())
        r_used = max(1, -(-m_lzp // ANCHOR_STRIDE))
        flags = flags_l[b] | FLAG_CTX | _sorter_flag_bits(k_sort)
        body_size = _HEAD.size + 33 * NCTX + 2 * int(
            (fqs[b] > 0).sum()
        ) + 4 + 6 * used_lanes + -(-used_lanes * FCTX_BITS // 8) \
            + 2 * nwords + (-(-r_used * aw // 8) if oks[b] else 0)
        if body_size >= n:
            payloads.append(
                _HEAD.pack(n, n, 0, 0, 0, FLAG_STORED, coder)
                + block.tobytes()
            )
            continue
        if oks[b]:
            flags |= FLAG_ANCHORS
        payload = _HEAD.pack(n, m_lzp, m, int(idx0s[b]), nwords,
                             flags, CODER_RANS)
        if flags & FLAG_FILTER:
            payload += bytes([fbs[b]])
        if oks[b]:
            payload += _pack_bits_np(
                anchors_all[b, :r_used].astype(np.uint32), aw
            )
        payload += _pack_freq_tables(fqs[b])
        payload += struct.pack("<I", used_lanes)
        payload += _pack_bits_np(
            fctx_all[b, :used_lanes].astype(np.uint32), FCTX_BITS
        )
        payload += cnts.astype("<u2").tobytes()
        payload += states_np[lane0: lane0 + used_lanes].astype(
            "<u4"
        ).tobytes()
        payload += flat[
            lane_offs[lane0]: lane_offs[lane0] + nwords
        ].astype("<u2").tobytes()
        payloads.append(payload)

    c = Container(
        codec_id=CODEC_BSC, flags=0, orig_len=n_total,
        block_size=block_size, comp_sizes=[len(p) for p in payloads],
        payloads=payloads, data_adler=adler32_np(arr),
    )
    return c.to_bytes()


def decompress(buf: bytes) -> bytes:
    c = Container.from_bytes(buf)
    assert c.codec_id == CODEC_BSC
    cap = _cap_for(c.block_size)
    aw = max(1, int(cap - 1).bit_length())

    parsed = []
    for p in c.payloads:
        (n, m_lzp, m, idx0, nwords, flags,
         coder) = _HEAD.unpack(p[: _HEAD.size])
        off = _HEAD.size
        if flags & FLAG_STORED:
            parsed.append(("stored", np.frombuffer(
                p[off: off + n], np.uint8
            )))
            continue
        if coder in (CODER_SEGMENTED, CODER_GRC) \
                or _sorter_k_of_flags(flags)[1]:
            # segmented, grc, and wired-ST payloads take the per-block
            # path (wired ST streams are 2x-sized; see _fwd_packed_st_wired)
            parsed.append(("seg", p))
            continue
        if coder == CODER_RANS:
            assert flags & FLAG_CTX
        filt = FILTER_NONE
        if flags & FLAG_FILTER:
            filt = p[off]
            off += 1
        anchors = None
        if flags & FLAG_ANCHORS:
            r_used = max(1, -(-m_lzp // ANCHOR_STRIDE))
            nb = -(-r_used * aw // 8)
            anchors = _unpack_bits_np(p[off: off + nb], aw, r_used)
            off += nb
        if coder == CODER_ABC:
            inits = np.frombuffer(
                p[off: off + 2 * NMODELS], "<u2"
            ).reshape(NMODELS)
            off += 2 * NMODELS
            maxbits, nlanes = struct.unpack("<II", p[off: off + 8])
            off += 8
            fb = -(-nlanes * FCTX_BITS // 8)
            lane_cls = _unpack_bits_np(p[off: off + fb], FCTX_BITS,
                                       nlanes)
            off += fb
            counts = np.frombuffer(
                p[off: off + 2 * nlanes], "<u2"
            ).astype(np.int32)
            off += 2 * nlanes
            states = np.frombuffer(p[off: off + 4 * nlanes], "<u4")
            off += 4 * nlanes
            flat = np.frombuffer(p[off: off + 2 * nwords], "<u2")
            parsed.append((
                "ablock", n, m_lzp, m, idx0, flags, anchors, inits,
                lane_cls, counts, states, flat, filt, maxbits,
            ))
            continue
        fq, off = _unpack_freq_tables(p, off)
        (nlanes,) = struct.unpack("<I", p[off: off + 4])
        off += 4
        fb = -(-nlanes * FCTX_BITS // 8)
        fctx = _unpack_bits_np(p[off: off + fb], FCTX_BITS, nlanes)
        off += fb
        counts = np.frombuffer(p[off: off + 2 * nlanes], "<u2").astype(
            np.int32
        )
        off += 2 * nlanes
        states = np.frombuffer(p[off: off + 4 * nlanes], "<u4")
        off += 4 * nlanes
        flat = np.frombuffer(p[off: off + 2 * nwords], "<u2")
        parsed.append((
            "block", n, m_lzp, m, idx0, flags, anchors, fq, fctx,
            counts, states, flat, filt,
        ))

    blocks_idx = [i for i, pr in enumerate(parsed) if pr[0] == "block"]
    ablocks_idx = [i for i, pr in enumerate(parsed) if pr[0] == "ablock"]
    outs: list = [None] * len(parsed)
    syms_map: dict = {}
    if blocks_idx:
        B = len(blocks_idx)
        # decode-side transform bucket (see _tcap_for)
        dcap1 = _tcap_for(
            max(max(parsed[i][2], parsed[i][3]) for i in blocks_idx), cap
        )
        lcap = max(1, dcap1 // CHUNK)
        counts_all = np.zeros(B * lcap, np.int32)
        states_all = np.full(B * lcap, 1 << 16, np.uint32)
        fctx_all = np.zeros(B * lcap, np.int32)
        flats = []
        fq_all = np.zeros((B * NCTX, ALPHABET), np.int32)
        ms = np.zeros(B, np.int32)
        for j, i in enumerate(blocks_idx):
            _, n, m_lzp, m, idx0, flags, anchors, fq, fctx, counts, \
                states, flat, filt = parsed[i]
            lane0 = j * lcap
            counts_all[lane0: lane0 + counts.shape[0]] = counts
            states_all[lane0: lane0 + states.shape[0]] = states
            fctx_all[lane0: lane0 + fctx.shape[0]] = fctx + j * NCTX
            fctx_all[lane0 + fctx.shape[0]: lane0 + lcap] = j * NCTX
            flats.append(flat)
            fq_all[j * NCTX: (j + 1) * NCTX] = fq
            ms[j] = m
        flat_all = np.concatenate(flats) if flats else np.zeros(1, "<u2")
        with timing.stage("bsc.rans.decode"):
            freq_d = jnp.asarray(fq_all)
            cum_np = np.concatenate(
                [np.zeros((B * NCTX, 1), np.int32),
                 np.cumsum(fq_all, axis=1)[:, :-1].astype(np.int32)],
                axis=1,
            )
            cum_d = jnp.asarray(cum_np)
            lut = _lut_from_freqs(freq_d, cum_d)
            rows = expand_words(
                jnp.asarray(flat_all.astype(np.uint16)),
                jnp.asarray(counts_all),
            )
            syms2 = rans_decode_ctx_batch(
                rows, jnp.asarray(counts_all), jnp.asarray(states_all),
                jnp.asarray(fctx_all), jnp.asarray(ms), freq_d, cum_d,
                lut, B,
            )
        for j, i in enumerate(blocks_idx):
            syms_map[i] = syms2[j]

    if ablocks_idx:
        B2 = len(ablocks_idx)
        dcap2 = _tcap_for(
            max(max(parsed[i][2], parsed[i][3]) for i in ablocks_idx), cap
        )
        lcap_a = max(1, dcap2 // ACHUNK)
        counts_all = np.zeros(B2 * lcap_a, np.int32)
        states_all = np.full(B2 * lcap_a, 1 << 16, np.uint32)
        cls_all = np.zeros(B2 * lcap_a, np.int32)
        inits_all = np.zeros((B2, NMODELS), np.uint16)
        ms2 = np.zeros(B2, np.int32)
        flats = []
        nsteps = 0
        for j, i in enumerate(ablocks_idx):
            _, n, m_lzp, m, idx0, flags, anchors, inits, lane_cls, \
                counts, states, flat, filt, maxbits = parsed[i]
            lane0 = j * lcap_a
            counts_all[lane0: lane0 + counts.shape[0]] = counts
            states_all[lane0: lane0 + states.shape[0]] = states
            cls_all[lane0: lane0 + lane_cls.shape[0]] = lane_cls
            inits_all[j] = inits
            ms2[j] = m
            flats.append(flat)
            nsteps = max(nsteps, maxbits)
        with timing.stage("bsc.rans.decode"):
            Wc = bucket_bits(int(counts_all.max(initial=0)) + 2, lo=64)
            words_p = np.zeros((B2 * lcap_a, Wc), np.uint16)
            lane_valid = (
                np.arange(Wc)[None, :] < counts_all[:, None]
            )
            words_p[lane_valid] = np.concatenate(flats)
            syms2a = abc_decode(
                jnp.asarray(words_p), jnp.asarray(counts_all),
                jnp.asarray(states_all), jnp.asarray(cls_all),
                jnp.asarray(ms2), jnp.asarray(inits_all),
                jnp.int32(nsteps), B=B2,
            )
        for j, i in enumerate(ablocks_idx):
            syms_map[i] = syms2a[j]

    all_idx = sorted(syms_map)
    if all_idx:
        stages_dev = []
        for i in all_idx:
            pr = parsed[i]
            _, n, m_lzp, m, idx0, flags, anchors = pr[:7]
            syms = syms_map[i]
            k_sort, _ = _sorter_k_of_flags(flags)
            if k_sort:
                stages_dev.append(_st_last_stage(syms, jnp.int32(m)))
            elif anchors is not None:
                r_cap_i = -(-int(syms.shape[0]) // ANCHOR_STRIDE)
                anch_p = np.full(r_cap_i, idx0, np.int32)
                anch_p[: anchors.shape[0]] = anchors
                stages_dev.append(_decode_stage_anchored(
                    syms, jnp.int32(m), jnp.int32(m_lzp),
                    jnp.int32(idx0), jnp.asarray(anch_p),
                ))
            else:
                stages_dev.append(_decode_stage(
                    syms, jnp.int32(m), jnp.int32(m_lzp), jnp.int32(idx0)
                ))
        from concurrent.futures import ThreadPoolExecutor

        with timing.stage("bsc.inverse+pull"):
            with ThreadPoolExecutor(max_workers=min(4, len(all_idx))) as ex:
                pulled = list(ex.map(np.asarray, stages_dev))
        for j, i in enumerate(all_idx):
            pr = parsed[i]
            _, n, m_lzp, m, idx0, flags = pr[:6]
            filt = pr[12]
            k_sort, _ = _sorter_k_of_flags(flags)
            if k_sort:
                from tpulc.codecs.bwt.stk import st_decode

                stage = st_decode(pulled[j][:m_lzp], idx0, k_sort)
            else:
                stage = pulled[j][:m_lzp]
            if flags & FLAG_LZP:
                out_b = np.frombuffer(lzp_decode(stage, n), np.uint8)
            else:
                out_b = stage[:n]
            outs[i] = invert_filter_np(out_b, filt)
    for i, pr in enumerate(parsed):
        if pr[0] == "stored":
            outs[i] = pr[1]
        elif pr[0] == "seg":
            outs[i] = decompress_block(pr[1], c.block_size)
    out = b"".join(x.tobytes() for x in outs)[: c.orig_len]
    if not c.verify_data(np.frombuffer(out, np.uint8)):
        raise ValueError("data checksum mismatch after decompress")
    return out
