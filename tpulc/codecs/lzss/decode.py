"""Parallel LZSS decoder for the Dipperstein 12/4 bitstream.

Two fully parallel stages replace the reference's serial decoders
(lzss-0.6.2 `lzdecode.c:131`; CULZSS one-thread-per-packet
`gpu_decompress.cu:120`):

  1. Token boundary discovery: tokens are 9 bits (flag 1 + char) or 17
     bits (flag 0 + offset + len), so a token straddles a fixed
     subsequence boundary by at most 16 bits — the identical
     map-composition trick as the Huffman decoder (17 entry states),
     scanned with `lax.associative_scan`.  Output *byte* counts ride
     the same monoid, giving every token its output position.
  2. Copy resolution: each output byte's source is either a literal, a
     virtual-window space, or an earlier output byte (matches copy the
     pre-token window snapshot, `lzdecode.c:205-220`, so sources are
     strictly earlier).  The copy graph is a forest resolved by
     pointer doubling in log2(n) gather rounds — no serial window walk.

Works on any reference-encoded stream (no partition metadata needed).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tpulc.codecs.huffman.decode import _compose_scan, _pad_words
from tpulc.primitives.bits import byte_windows, peek_bits_bw

WINDOW = 4096
N_STATES = 17
SUB_BITS = 512


def _token_fields(v17: jax.Array):
    """Decode a peeked 17-bit window into (is_lit, char, off, length)."""
    is_lit = (v17 >> 16) & 1
    char = (v17 >> 8) & 0xFF
    off = ((v17 >> 8) & 0xFF) | (((v17 >> 4) & 0xF) << 8)
    length = (v17 & 0xF) + 3
    return is_lit, char, off, length


def _scan_maps(bwin, total_bits, nsub: int):
    """Per-subsequence (entry-offset -> exit-offset, output bytes)."""
    sub_start = (jnp.arange(nsub, dtype=jnp.int32) * SUB_BITS)[:, None]
    end = sub_start + SUB_BITS
    pos0 = sub_start + jnp.arange(N_STATES, dtype=jnp.int32)[None, :]
    cnt0 = jnp.zeros((nsub, N_STATES), jnp.int32)

    def cond(state):
        pos, _ = state
        return jnp.any(pos < end)

    def body(state):
        pos, cnt = state
        active = pos < end
        v17 = peek_bits_bw(bwin, jnp.minimum(pos, total_bits), 17).astype(
            jnp.int32
        )
        is_lit, _, _, length = _token_fields(v17)
        tok_bits = jnp.where(is_lit == 1, 9, 17)
        out_b = jnp.where(is_lit == 1, 1, length)
        fits = pos + tok_bits <= total_bits
        # A token that would run past the stream is discarded (the
        # reference decoder breaks on EOF mid-read, lzdecode.c:172).
        pos = jnp.where(
            active, jnp.where(fits, pos + tok_bits, end[:, : 1] * 0 + end), pos
        )
        cnt = cnt + jnp.where(active & fits, out_b, 0)
        return pos, cnt

    pos, cnt = jax.lax.while_loop(cond, body, (pos0, cnt0))
    next_map = jnp.clip(pos - end, 0, N_STATES - 1)
    return next_map, cnt


@partial(jax.jit, static_argnames=("n_out",))
def lzss_decode_device(words: jax.Array, total_bits: jax.Array, n_out: int):
    """Decode uint32 words (MSB-first bitstream) -> (uint8[n_out], n_valid)."""
    W = words.shape[0]
    nsub = max(1, -(-(W * 32) // SUB_BITS))
    words_p = _pad_words(words)
    # byte-granular windows: ONE gather per walk step instead of the
    # straddling word pair (both serial walks are gather-bound)
    bwin = byte_windows(words_p)

    next_map, count_map = _scan_maps(bwin, total_bits, nsub)
    incl_next, incl_cnt = _compose_scan(next_map, count_map)
    entry = jnp.concatenate([jnp.zeros((1,), jnp.int32), incl_next[:-1, 0]])
    offset = jnp.concatenate([jnp.zeros((1,), jnp.int32), incl_cnt[:-1, 0]])
    n_valid = incl_cnt[-1, 0]

    # Phase 2: re-walk each subsequence once, scattering per-token
    # records (code, start flag) at token output positions.
    sub_start = jnp.arange(nsub, dtype=jnp.int32) * SUB_BITS
    end = sub_start + SUB_BITS
    pos0 = sub_start + entry
    code_arr0 = jnp.zeros((n_out + 1,), jnp.int32)
    start0 = jnp.zeros((n_out + 1,), jnp.int32)

    def cond2(state):
        pos, _, _, _ = state
        return jnp.any(pos < end)

    def body2(state):
        pos, outp, code_arr, start = state
        active = pos < end
        v17 = peek_bits_bw(bwin, jnp.minimum(pos, total_bits), 17).astype(
            jnp.int32
        )
        is_lit, _, _, length = _token_fields(v17)
        tok_bits = jnp.where(is_lit == 1, 9, 17)
        out_b = jnp.where(is_lit == 1, 1, length)
        fits = pos + tok_bits <= total_bits
        emit = active & fits
        tgt = jnp.where(emit, jnp.minimum(outp, n_out), n_out)
        code_arr = code_arr.at[tgt].set(v17, mode="drop")
        start = start.at[tgt].set(1, mode="drop")
        pos = jnp.where(active, jnp.where(fits, pos + tok_bits, end), pos)
        outp = outp + jnp.where(emit, out_b, 0)
        return pos, outp, code_arr, start

    _, _, code_arr, start = jax.lax.while_loop(
        cond2, body2, (pos0, offset, code_arr0, start0)
    )

    # Phase 3: byte-level resolution.
    idx = jnp.arange(n_out, dtype=jnp.int32)
    starts = start[:n_out] > 0
    tok_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(starts, idx, -1)
    )
    tok_start_c = jnp.maximum(tok_start, 0)
    v17 = code_arr[tok_start_c]
    is_lit, char, off, _ = _token_fields(v17)
    j = idx - tok_start_c
    # ring index of this byte's source, then back to linear coords
    w = (off + j) % WINDOW
    p_pad = tok_start_c + WINDOW  # padded coords of the token start
    q = p_pad - 1 - ((p_pad - 1 - w) % WINDOW)

    total = n_out + WINDOW
    pidx = jnp.arange(total, dtype=jnp.int32)
    lit_mask = (is_lit == 1) & (tok_start >= 0) & (idx < n_valid)
    src = jnp.where(
        (is_lit == 0) & (tok_start >= 0) & (idx < n_valid), q, idx + WINDOW
    )
    # literal chars land at their OWN positions — identity scatter ==
    # masked select (spaces fill the virtual window and non-literals)
    resolved_val = jnp.concatenate(
        [jnp.full((WINDOW,), 32, jnp.uint8),
         jnp.where(lit_mask, char.astype(jnp.uint8), jnp.uint8(32))])
    src_full = jnp.concatenate([pidx[:WINDOW], src])
    # literals and spaces are roots (self-loops)
    root_mask = jnp.concatenate(
        [jnp.ones((WINDOW,), bool), lit_mask | (idx >= n_valid)]
    )
    src_full = jnp.where(root_mask, pidx, src_full)

    # pointer doubling to fixpoint with a convergence check: worst
    # case log2(total) rounds, but real copy forests resolve in a
    # handful — each round is a full-size gather, so the early exit
    # pays for itself many times over (r5 trace: the fixed-count
    # unroll was ~1.4 s of the 3.1 s decode at 3.5 MB).
    rounds = max(1, (total - 1).bit_length())

    def db_cond(st):
        i, src, done = st
        return (i < rounds) & ~done

    def db_step(st):
        i, src, _ = st
        nxt = src[src]
        return i + 1, nxt, jnp.all(nxt == src)

    _, src_full, _ = jax.lax.while_loop(
        db_cond, db_step, (jnp.int32(0), src_full, jnp.bool_(False)))
    out = resolved_val[src_full][WINDOW:]
    return out, n_valid
