"""LZSS codec driver: container integration + raw reference-format IO.

Payload per block is simply the Dipperstein bitstream (self-sync
parallel decode needs no metadata).  `compress_raw`/`decompress_raw`
emit/read the bare reference format (what lzss-0.6.2's comp/decomp
produce), giving full interop with the reference CPU codec.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from tpulc.codecs.lzss.decode import lzss_decode_device
from tpulc.codecs.lzss.encode import lzss_encode_device
from tpulc.pipeline.container import Container
from tpulc.pipeline.registry import CODEC_LZSS
from tpulc.primitives.checksum import adler32_np

# 16 exact-3-gram chains + 8 7-gram chains: ratio 1.9102 vs 1.9162 at
# k=32 on the bench corpus, at ~1.9x the encode speed (the candidate
# match extension is gather-bound at ~120 M elem/s on the v5e; each
# candidate costs 5 full-width gathers)
K_CANDIDATES = 16


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _bucket_cap(n: int, block_cap: int) -> int:
    """Power-of-two tail buckets: at most log2(block_cap) compiled
    encode programs instead of one per stray tail length."""
    cap = 4096
    while cap < n:
        cap *= 2
    return min(max(cap, 1), block_cap) if n < block_cap else block_cap


def compress_block(block: np.ndarray, block_cap: int,
                   k_cand: int = K_CANDIDATES, exact: bool = False) -> bytes:
    n = block.shape[0]
    cap = _bucket_cap(n, block_cap)
    padded = np.zeros(cap, np.uint8)
    padded[:n] = block
    # worst case 9 bits/byte
    out_words = _round_up(cap * 9 + 64, 32) // 32
    words, total_bits = lzss_encode_device(
        jnp.asarray(padded), k_cand, out_words, exact,
        n_valid=jnp.int32(n),
    )
    total_bits = int(total_bits)
    nbytes = -(-total_bits // 8)
    raw = np.asarray(words).astype(">u4").tobytes()[:nbytes]
    return raw


def decompress_block(payload: bytes, raw_size: int, block_cap: int) -> np.ndarray:
    nw = -(-len(payload) // 4)
    buf = payload + b"\x00" * (4 * nw - len(payload))
    words = np.frombuffer(buf, ">u4").astype(np.uint32)
    wcap = _round_up(block_cap * 9 + 64, 32) // 32
    words_p = np.zeros(wcap, np.uint32)
    words_p[: len(words)] = words
    out, n_valid = lzss_decode_device(
        jnp.asarray(words_p), jnp.int32(len(payload) * 8), block_cap
    )
    assert int(n_valid) >= raw_size, (int(n_valid), raw_size)
    return np.asarray(out[:raw_size])


def compress_raw(data: bytes | np.ndarray, k_cand: int = K_CANDIDATES,
                 exact: bool = False) -> bytes:
    """Bare reference-format bitstream (single stream, no container).

    exact=True computes true longest matches (compressed size matches
    the reference brute-force encoder); the default uses hash chains
    (ratio 1.910 vs the reference's 1.925 on the bench corpus, at a
    small fraction of the cost — each candidate costs 5 full-width
    gathers and gathers are the scarce TPU resource).
    """
    arr = np.frombuffer(data, np.uint8) if isinstance(data, (bytes, bytearray)) \
        else np.asarray(data, np.uint8)
    return compress_block(arr, arr.shape[0], k_cand, exact)


def decompress_raw(payload: bytes, out_cap: int) -> bytes:
    """Decode a bare reference-format bitstream (e.g. lzss-0.6.2 output).

    out_cap must bound the decoded size (callers know it or over-allocate).
    """
    nw = -(-len(payload) // 4)
    buf = payload + b"\x00" * (4 * nw - len(payload))
    words = np.frombuffer(buf, ">u4").astype(np.uint32)
    wcap = _round_up(max(out_cap * 9 + 64, len(payload) * 8 + 64), 32) // 32
    words_p = np.zeros(wcap, np.uint32)
    words_p[: len(words)] = words
    out, n_valid = lzss_decode_device(
        jnp.asarray(words_p), jnp.int32(len(payload) * 8), out_cap
    )
    return np.asarray(out[: int(n_valid)]).tobytes()


def compress(data: bytes | np.ndarray, block_size: int = 1 << 20,
             k_cand: int = K_CANDIDATES, exact: bool = False) -> bytes:
    arr = np.frombuffer(data, np.uint8) if isinstance(data, (bytes, bytearray)) \
        else np.asarray(data, np.uint8)
    n = arr.shape[0]
    payloads = []
    for start in range(0, max(n, 1), block_size):
        payloads.append(
            compress_block(
                arr[start: start + block_size], block_size, k_cand, exact
            )
        )
    c = Container(
        codec_id=CODEC_LZSS, flags=0, orig_len=n, block_size=block_size,
        comp_sizes=[len(p) for p in payloads], payloads=payloads,
        data_adler=adler32_np(arr),
    )
    return c.to_bytes()


def _decode_batch(words, total_bits, n_out: int):
    """All blocks in ONE program: the decode while-loops are latency-
    bound (tiny per-iteration work), so vmapping B blocks costs the
    same wall time as one."""
    import jax

    from functools import partial as _partial

    fn = _partial(lzss_decode_device, n_out=n_out)
    return jax.vmap(lambda w, t: fn(w, t))(words, total_bits)


def decompress(buf: bytes) -> bytes:
    c = Container.from_bytes(buf)
    assert c.codec_id == CODEC_LZSS
    infos = list(c.block_infos())
    B = len(infos)
    wcap = _round_up(c.block_size * 9 + 64, 32) // 32
    W = np.zeros((B, wcap), np.uint32)
    tbs = np.zeros(B, np.int32)
    for j, payload in enumerate(c.payloads):
        nw = -(-len(payload) // 4)
        pbuf = payload + b"\x00" * (4 * nw - len(payload))
        words = np.frombuffer(pbuf, ">u4").astype(np.uint32)
        W[j, : len(words)] = words
        tbs[j] = len(payload) * 8
    outs, n_valids = _decode_batch(
        jnp.asarray(W), jnp.asarray(tbs), c.block_size
    )
    outs_np = np.asarray(outs)
    n_valids = np.asarray(n_valids)
    parts = []
    for j, info in enumerate(infos):
        if int(n_valids[j]) < info.raw_size:
            raise ValueError(
                "corrupt lzss block: decoded %d of %d bytes"
                % (int(n_valids[j]), info.raw_size))
        parts.append(outs_np[j, : info.raw_size])
    out = b"".join(x.tobytes() for x in parts)[: c.orig_len]
    if not c.verify_data(np.frombuffer(out, np.uint8)):
        raise ValueError("data checksum mismatch after decompress")
    return out
