"""Chunk-interleaved static rANS coder.

The TPU-native answer to libbsc's QLFC binary range coder
(`libbsc/coder/qlfc/`, serial bit-by-bit with adaptive models): range
coding is inherently sequential per stream, so — exactly like bsc's
coder framework, which splits each block into ~64 sub-blocks coded in
parallel (`coder.cpp:52-61`) — the symbol stream is cut into
fixed-size chunks, each coded by an independent rANS lane, thousands
of lanes running in lockstep on the VPU.

Classic 32-bit rANS, 12-bit quantized frequencies, 16-bit renorm (at
most one emission per symbol), per-lane word counts in the container.

Encode walks each chunk in reverse (rANS is LIFO); decode walks
forward.  Both are C-step `fori_loop`s over [nlanes] vectors.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

PROB_BITS = 12
PROB_SCALE = 1 << PROB_BITS
RANS_L = 1 << 16
CHUNK = 256


def normalize_freqs(freqs: np.ndarray) -> np.ndarray:
    """Quantize frequencies to sum 2^12 with every present symbol >= 1."""
    freqs = np.asarray(freqs, np.int64)
    total = freqs.sum()
    if total == 0:
        out = np.zeros_like(freqs)
        out[0] = PROB_SCALE
        return out.astype(np.int32)
    scaled = np.maximum((freqs * PROB_SCALE) // total, np.where(freqs > 0, 1, 0))
    # fix rounding drift by adjusting the largest symbol
    drift = PROB_SCALE - scaled.sum()
    scaled[np.argmax(scaled)] += drift
    assert scaled.sum() == PROB_SCALE and (scaled[freqs > 0] > 0).all()
    return scaled.astype(np.int32)


def build_tables(freq_q: np.ndarray):
    """(freq, cum, slot->sym LUT) device tables from quantized freqs."""
    cum = np.concatenate([[0], np.cumsum(freq_q)[:-1]]).astype(np.int32)
    lut = np.zeros(PROB_SCALE, np.int32)
    for s in np.flatnonzero(freq_q):
        lut[cum[s]: cum[s] + freq_q[s]] = s
    return freq_q.astype(np.int32), cum, lut


@partial(jax.jit, static_argnames=("chunk",))
def rans_encode(syms: jax.Array, m: jax.Array, freq: jax.Array,
                cum: jax.Array, chunk: int = CHUNK):
    """Encode int32[cap] (valid prefix m) -> per-lane u16 words.

    Returns (words uint16[nlanes, chunk+2], counts int32[nlanes],
    states uint32[nlanes]).  Padding symbols (index >= m) are skipped
    via zero-emission no-ops.
    """
    cap = syms.shape[0]
    nlanes = cap // chunk
    s2 = syms.reshape(nlanes, chunk)
    valid = (
        jnp.arange(cap, dtype=jnp.int32).reshape(nlanes, chunk) < m
    )

    x0 = jnp.full((nlanes,), RANS_L, jnp.uint32)
    emit0 = jnp.zeros((chunk, nlanes), jnp.uint16)
    emask0 = jnp.zeros((chunk, nlanes), bool)

    def body(t, st):
        x, emit, emask = st
        j = chunk - 1 - t  # reverse order
        s = s2[:, j]
        v = valid[:, j]
        f = freq[s].astype(jnp.uint32)
        c = cum[s].astype(jnp.uint32)
        x_max = f << jnp.uint32(20)
        do_emit = v & (x >= x_max)
        emit = jax.lax.dynamic_update_slice(
            emit, (x & 0xFFFF).astype(jnp.uint16)[None, :], (t, 0)
        )
        emask = jax.lax.dynamic_update_slice(
            emask, do_emit[None, :], (t, 0)
        )
        x = jnp.where(do_emit, x >> jnp.uint32(16), x)
        fx = jnp.maximum(f, 1)
        x_new = ((x // fx) << jnp.uint32(PROB_BITS)) + (x % fx) + c
        x = jnp.where(v, x_new, x)
        return x, emit, emask

    x, emit, emask = jax.lax.fori_loop(0, chunk, body, (x0, emit0, emask0))
    # compact per lane: emissions were recorded at step t (reverse sym
    # order); decode consumes them in the same order it re-renormalizes,
    # which is the reverse of emission order per lane -> store reversed.
    emit_t = emit.T          # [nlanes, chunk] in emission order
    emask_t = emask.T
    counts = jnp.sum(emask_t.astype(jnp.int32), axis=1)
    # position from the END: decode reads words last-emitted-first
    pos_in_lane = jnp.cumsum(emask_t.astype(jnp.int32), axis=1) - 1
    tgt = jnp.where(
        emask_t, counts[:, None] - 1 - pos_in_lane, chunk + 2
    )
    words = jnp.zeros((nlanes, chunk + 2), jnp.uint16)
    words = words.at[
        jnp.arange(nlanes, dtype=jnp.int32)[:, None], tgt
    ].set(emit_t, mode="drop")
    return words, counts, x


@partial(jax.jit, static_argnames=("chunk",))
def rans_decode(words: jax.Array, counts: jax.Array, states: jax.Array,
                m: jax.Array, freq: jax.Array, cum: jax.Array,
                lut: jax.Array, chunk: int = CHUNK):
    """Decode back to int32[nlanes*chunk] (valid prefix m)."""
    nlanes = words.shape[0]
    lane_ids = jnp.arange(nlanes, dtype=jnp.int32)
    x0 = states.astype(jnp.uint32)
    rpos0 = jnp.zeros((nlanes,), jnp.int32)  # next word index per lane
    out0 = jnp.zeros((nlanes, chunk), jnp.int32)
    valid = (
        jnp.arange(nlanes * chunk, dtype=jnp.int32).reshape(nlanes, chunk)
        < m
    )

    def body(j, st):
        x, rpos, out = st
        v = valid[:, j]
        slot = (x & jnp.uint32(PROB_SCALE - 1)).astype(jnp.int32)
        s = lut[slot]
        f = freq[s].astype(jnp.uint32)
        c = cum[s].astype(jnp.uint32)
        x_new = f * (x >> jnp.uint32(PROB_BITS)) + (
            x & jnp.uint32(PROB_SCALE - 1)
        ) - c
        need = v & (x_new < jnp.uint32(RANS_L))
        w = words[lane_ids, jnp.minimum(rpos, chunk + 1)].astype(jnp.uint32)
        x_new2 = jnp.where(need, (x_new << jnp.uint32(16)) | w, x_new)
        rpos = rpos + need.astype(jnp.int32)
        x = jnp.where(v, x_new2, x)
        out = out.at[:, j].set(jnp.where(v, s, 0))
        return x, rpos, out

    x, rpos, out = jax.lax.fori_loop(0, chunk, body, (x0, rpos0, out0))
    return out.reshape(-1)
