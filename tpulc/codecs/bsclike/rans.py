"""Chunk-interleaved static rANS coder.

The TPU-native answer to libbsc's QLFC binary range coder
(`libbsc/coder/qlfc/`, serial bit-by-bit with adaptive models): range
coding is inherently sequential per stream, so — exactly like bsc's
coder framework, which splits each block into ~64 sub-blocks coded in
parallel (`coder.cpp:52-61`) — the symbol stream is cut into
fixed-size chunks, each coded by an independent rANS lane, thousands
of lanes running in lockstep on the VPU.

Classic 32-bit rANS, 14-bit quantized frequencies, 16-bit renorm (at
most one emission per symbol), per-lane word counts in the container.

Encode walks each chunk in reverse (rANS is LIFO); decode walks
forward.  Both are C-step `fori_loop`s over [nlanes] vectors.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

# 14-bit quantization: the 257-symbol alphabet forces every present
# symbol to >= 1 slot, so coarser scales waste ~1% of probability mass
# per context on rare-symbol floors; 14 bits quarters that loss (the
# NCTX x 2^14 decode LUT is still small for HBM).
PROB_BITS = 14
PROB_SCALE = 1 << PROB_BITS
RANS_L = 1 << 16
# 512-symbol lanes: half the per-lane metadata (count+state+ctx ~ 7B
# per lane) of 256 at twice the serial step count -- the decode loop is
# lane-parallel, so steps, not lanes, are the wall-clock axis; measured
# net ~1.3% ratio gain for ~0.1s on the 3.5MB bench.
CHUNK = 512


def normalize_freqs(freqs: np.ndarray) -> np.ndarray:
    """Quantize frequencies to sum 2^PROB_BITS, every present sym >= 1."""
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
        # f == PROB_SCALE (a probability-1 symbol: single-symbol
        # context) makes the true renorm threshold 2^32 -- never emit;
        # the u32 shift would wrap it to 0 and emit a word the decoder
        # never consumes.
        x_max = f << jnp.uint32(32 - PROB_BITS)
        do_emit = v & (x >= x_max) & (f < jnp.uint32(PROB_SCALE))
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

    x, emit, emask = jax.lax.fori_loop(0, chunk, body,
                                       (x0, emit0, emask0), unroll=4)
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

    x, rpos, out = jax.lax.fori_loop(0, chunk, body, (x0, rpos0, out0),
                                     unroll=4)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# Order-2 context-conditioned rANS (QLFC-grade modeling, TPU-shaped).
#
# libbsc's QLFC coder conditions every binary decision on neighboring
# rank statistics with adaptive models (`qlfc.cpp:448-752`,
# `qlfc_model.h`).  Serial adaptation does not vectorize across lanes,
# but the block is fully available before coding, so the same
# information is captured by STATIC per-context tables: symbol t is
# coded under a table selected by the rank classes of symbols t-1 and
# t-2.  Measured on BWT+MTF+RLE2 streams, the 8-bucket order-1 class
# already saturates order-1 information (finer/exact prev-symbol
# contexts gain < 0.1%), while adding a 4-bucket class of sym t-2
# cuts the stream a further ~5%.  Contexts cost one table select per
# step and 32x257 sparse quantized frequencies on the wire.

_C1 = 8   # rank-class buckets of sym t-1
_C2 = 4   # coarse buckets of sym t-2
NCTX = _C1 * _C2

_CTX_EDGES = (1, 2, 3, 4, 6, 10, 18)  # rank-class buckets (geometric)


def ctx_class(s: jax.Array) -> jax.Array:
    """Map an RLE2 symbol (0..256) to its order-1 class (0.._C1-1)."""
    c = jnp.zeros(s.shape, jnp.int32)
    for e in _CTX_EDGES:
        c = c + (s >= e).astype(jnp.int32)
    return c


def ctx_combine(c1: jax.Array, c2: jax.Array) -> jax.Array:
    """(class(sym t-1), class(sym t-2)) -> context id (0..NCTX-1)."""
    return c1 * _C2 + jnp.minimum(c2, _C2 - 1)


def ctx_of_stream(syms: jax.Array) -> jax.Array:
    """Per-position order-2 context (class 0 history at t<=1)."""
    prev = jnp.concatenate(
        [jnp.zeros((1,), syms.dtype), syms[:-1]]
    )
    prev2 = jnp.concatenate(
        [jnp.zeros((2,), syms.dtype), syms[:-2]]
    )
    return ctx_combine(ctx_class(prev), ctx_class(prev2))


def normalize_freqs_ctx(hists: np.ndarray) -> np.ndarray:
    """[NCTX, S] raw counts -> [NCTX, S] tables each summing 2^PROB_BITS."""
    return np.stack([normalize_freqs(h) for h in hists])


def build_tables_ctx(freq_q: np.ndarray):
    """[NCTX, S] quantized freqs -> stacked (freq, cum, slot LUT) device
    tables; LUT is [NCTX * 2^PROB_BITS] (ctx-major)."""
    fs, cs, ls = [], [], []
    for k in range(freq_q.shape[0]):
        f, c, l = build_tables(freq_q[k])
        fs.append(f)
        cs.append(c)
        ls.append(l)
    return np.stack(fs), np.stack(cs), np.concatenate(ls)


@partial(jax.jit, static_argnames=("chunk",))
def rans_encode_ctx(syms: jax.Array, ctx: jax.Array, m: jax.Array,
                    freq: jax.Array, cum: jax.Array, chunk: int = CHUNK):
    """`rans_encode` with per-symbol context selecting the table.

    freq/cum are [NCTX, S]; ctx int32[cap] (causal: position t's ctx
    derives from symbols < t, so the forward decoder can rebuild it).
    """
    cap = syms.shape[0]
    S = freq.shape[1]
    nlanes = cap // chunk
    # one packed table gather per step instead of two: c rides the low
    # PROB_BITS bits, f (which reaches 2^PROB_BITS, 15 bits) the high.
    fc = (cum | (freq << PROB_BITS)).reshape(-1)
    s2 = syms.reshape(nlanes, chunk)
    k2 = ctx.reshape(nlanes, chunk)
    valid = (
        jnp.arange(cap, dtype=jnp.int32).reshape(nlanes, chunk) < m
    )

    x0 = jnp.full((nlanes,), RANS_L, jnp.uint32)
    emit0 = jnp.zeros((chunk, nlanes), jnp.uint16)
    emask0 = jnp.zeros((chunk, nlanes), bool)

    def body(t, st):
        x, emit, emask = st
        j = chunk - 1 - t  # reverse order
        idx = k2[:, j] * S + s2[:, j]
        v = valid[:, j]
        e = fc[idx]
        f = (e >> PROB_BITS).astype(jnp.uint32)
        c = (e & (PROB_SCALE - 1)).astype(jnp.uint32)
        # f == PROB_SCALE (a probability-1 symbol: single-symbol
        # context) makes the true renorm threshold 2^32 -- never emit;
        # the u32 shift would wrap it to 0 and emit a word the decoder
        # never consumes.
        x_max = f << jnp.uint32(32 - PROB_BITS)
        do_emit = v & (x >= x_max) & (f < jnp.uint32(PROB_SCALE))
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

    x, emit, emask = jax.lax.fori_loop(0, chunk, body,
                                       (x0, emit0, emask0), unroll=4)
    emit_t = emit.T
    emask_t = emask.T
    counts = jnp.sum(emask_t.astype(jnp.int32), axis=1)
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
def rans_decode_ctx_chained(words: jax.Array, counts: jax.Array,
                            states: jax.Array, first_ctx: jax.Array,
                            m: jax.Array, freq: jax.Array, cum: jax.Array,
                            lut: jax.Array, chunk: int = CHUNK):
    """Context-conditioned decode.

    Contexts regenerate on the fly: within a lane, ctx_{t} =
    class(sym_{t-1}) — sequential exactly like the rANS state itself.
    Lane boundaries need the class of the previous lane's LAST symbol,
    which the encoder cannot know cheaply at decode time — so the
    driver stores `first_ctx` (one class per lane, 3 bits each).

    freq/cum [NCTX, S]; lut [NCTX * 2^PROB_BITS].
    """
    nlanes = words.shape[0]
    S = freq.shape[1]
    # one packed table gather per step instead of two: c rides the low
    # PROB_BITS bits, f (which reaches 2^PROB_BITS, 15 bits) the high.
    fc = (cum | (freq << PROB_BITS)).reshape(-1)
    lane_ids = jnp.arange(nlanes, dtype=jnp.int32)
    x0 = states.astype(jnp.uint32)
    rpos0 = jnp.zeros((nlanes,), jnp.int32)
    out0 = jnp.zeros((nlanes, chunk), jnp.int32)
    k0 = first_ctx.astype(jnp.int32)
    valid = (
        jnp.arange(nlanes * chunk, dtype=jnp.int32).reshape(nlanes, chunk)
        < m
    )

    def body(j, st):
        x, rpos, k, out = st
        v = valid[:, j]
        slot = (x & jnp.uint32(PROB_SCALE - 1)).astype(jnp.int32)
        s = lut[k * PROB_SCALE + slot]
        idx = k * S + s
        e = fc[idx]
        f = (e >> PROB_BITS).astype(jnp.uint32)
        c = (e & (PROB_SCALE - 1)).astype(jnp.uint32)
        x_new = f * (x >> jnp.uint32(PROB_BITS)) + (
            x & jnp.uint32(PROB_SCALE - 1)
        ) - c
        need = v & (x_new < jnp.uint32(RANS_L))
        w = words[lane_ids, jnp.minimum(rpos, chunk + 1)].astype(jnp.uint32)
        x_new2 = jnp.where(need, (x_new << jnp.uint32(16)) | w, x_new)
        rpos = rpos + need.astype(jnp.int32)
        x = jnp.where(v, x_new2, x)
        out = out.at[:, j].set(jnp.where(v, s, 0))
        # order-2 regeneration: the carried id's high bits ARE the
        # class of sym t-1, which becomes the t-2 component next step
        k = jnp.where(v, ctx_combine(ctx_class(s), k // _C2), k)
        return x, rpos, k, out

    x, rpos, k, out = jax.lax.fori_loop(0, chunk, body,
                                        (x0, rpos0, k0, out0), unroll=4)
    return out.reshape(-1)


# ---------------------------------------------------------------------------
# Batched (multi-block) context rANS: all blocks' lanes run in ONE
# lockstep loop.  The serial axis (symbols within a lane) is the
# wall-clock cost on TPU; lanes are nearly free — so B blocks coded
# together cost ~1/B the dispatches of per-block loops.  Per-block
# tables stack as [B*NCTX, S]; the caller pre-offsets each block's
# context ids by block*NCTX.

@partial(jax.jit, static_argnames=("chunk",))
def rans_encode_ctx_batch(syms2: jax.Array, gctx2: jax.Array,
                          ms: jax.Array, freq: jax.Array, cum: jax.Array,
                          chunk: int = CHUNK):
    """syms2/gctx2 int32[B, cap]; ms int32[B]; freq/cum [B*NCTX, S].

    Returns (words uint16[B*nlanes, chunk+2], counts int32[B*nlanes],
    states uint32[B*nlanes]) with lanes block-major.
    """
    B, cap = syms2.shape
    S = freq.shape[1]
    nlanes = cap // chunk
    # one packed table gather per step instead of two: c rides the low
    # PROB_BITS bits, f (which reaches 2^PROB_BITS, 15 bits) the high.
    fc = (cum | (freq << PROB_BITS)).reshape(-1)
    s2 = syms2.reshape(B * nlanes, chunk)
    k2 = gctx2.reshape(B * nlanes, chunk)
    pos = jnp.arange(cap, dtype=jnp.int32)[None, :]
    valid = (pos < ms[:, None]).reshape(B * nlanes, chunk)

    L = B * nlanes
    x0 = jnp.full((L,), RANS_L, jnp.uint32)
    emit0 = jnp.zeros((chunk, L), jnp.uint16)
    emask0 = jnp.zeros((chunk, L), bool)

    def body(t, st):
        x, emit, emask = st
        j = chunk - 1 - t
        idx = k2[:, j] * S + s2[:, j]
        v = valid[:, j]
        e = fc[idx]
        f = (e >> PROB_BITS).astype(jnp.uint32)
        c = (e & (PROB_SCALE - 1)).astype(jnp.uint32)
        # f == PROB_SCALE (a probability-1 symbol: single-symbol
        # context) makes the true renorm threshold 2^32 -- never emit;
        # the u32 shift would wrap it to 0 and emit a word the decoder
        # never consumes.
        x_max = f << jnp.uint32(32 - PROB_BITS)
        do_emit = v & (x >= x_max) & (f < jnp.uint32(PROB_SCALE))
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

    x, emit, emask = jax.lax.fori_loop(0, chunk, body,
                                       (x0, emit0, emask0), unroll=4)
    emit_t = emit.T
    emask_t = emask.T
    counts = jnp.sum(emask_t.astype(jnp.int32), axis=1)
    pos_in_lane = jnp.cumsum(emask_t.astype(jnp.int32), axis=1) - 1
    tgt = jnp.where(
        emask_t, counts[:, None] - 1 - pos_in_lane, chunk + 2
    )
    words = jnp.zeros((L, chunk + 2), jnp.uint16)
    words = words.at[
        jnp.arange(L, dtype=jnp.int32)[:, None], tgt
    ].set(emit_t, mode="drop")
    return words, counts, x


@partial(jax.jit, static_argnames=("chunk", "B"))
def rans_decode_ctx_batch(words: jax.Array, counts: jax.Array,
                          states: jax.Array, first_gctx: jax.Array,
                          ms: jax.Array, freq: jax.Array, cum: jax.Array,
                          lut: jax.Array, B: int, chunk: int = CHUNK):
    """Batched `rans_decode_ctx_chained`.

    words [B*nlanes, chunk+2]; first_gctx pre-offset by block*NCTX;
    freq/cum [B*NCTX, S]; lut [B*NCTX*2^PROB_BITS].  In-lane contexts
    regenerate as block*NCTX + class(prev symbol).
    """
    L = words.shape[0]
    nlanes = L // B
    S = freq.shape[1]
    # one packed table gather per step instead of two: c rides the low
    # PROB_BITS bits, f (which reaches 2^PROB_BITS, 15 bits) the high.
    fc = (cum | (freq << PROB_BITS)).reshape(-1)
    lane_ids = jnp.arange(L, dtype=jnp.int32)
    blk = lane_ids // nlanes
    x0 = states.astype(jnp.uint32)
    rpos0 = jnp.zeros((L,), jnp.int32)
    out0 = jnp.zeros((L, chunk), jnp.int32)
    k0 = first_gctx.astype(jnp.int32)
    pos = (lane_ids % nlanes)[:, None] * chunk + jnp.arange(
        chunk, dtype=jnp.int32
    )[None, :]
    valid = pos < ms[blk][:, None]

    def body(j, st):
        x, rpos, k, out = st
        v = valid[:, j]
        slot = (x & jnp.uint32(PROB_SCALE - 1)).astype(jnp.int32)
        s = lut[k * PROB_SCALE + slot]
        idx = k * S + s
        e = fc[idx]
        f = (e >> PROB_BITS).astype(jnp.uint32)
        c = (e & (PROB_SCALE - 1)).astype(jnp.uint32)
        x_new = f * (x >> jnp.uint32(PROB_BITS)) + (
            x & jnp.uint32(PROB_SCALE - 1)
        ) - c
        need = v & (x_new < jnp.uint32(RANS_L))
        w = words[lane_ids, jnp.minimum(rpos, chunk + 1)].astype(jnp.uint32)
        x_new2 = jnp.where(need, (x_new << jnp.uint32(16)) | w, x_new)
        rpos = rpos + need.astype(jnp.int32)
        x = jnp.where(v, x_new2, x)
        out = out.at[:, j].set(jnp.where(v, s, 0))
        kl = k - blk * NCTX
        k = jnp.where(
            v, blk * NCTX + ctx_combine(ctx_class(s), kl // _C2), k
        )
        return x, rpos, k, out

    x, rpos, k, out = jax.lax.fori_loop(0, chunk, body,
                                        (x0, rpos0, k0, out0), unroll=4)
    return out.reshape(B, nlanes * chunk)


@partial(jax.jit, static_argnames=("take",))
def compact_words(words: jax.Array, counts: jax.Array, take: int):
    """[L, chunk+2] padded lane words + per-lane counts -> flat uint16
    [take] (lane-major concatenation).  Device-side so only the true
    stream crosses the host link (the padded grid is ~6x larger)."""
    L, W = words.shape
    offs = jnp.cumsum(counts) - counts
    iota = jnp.arange(W, dtype=jnp.int32)[None, :]
    valid = iota < counts[:, None]
    tgt = jnp.where(valid, offs[:, None] + iota, jnp.int32(2 ** 30))
    _, flat = jax.lax.sort(
        (tgt.reshape(-1), words.reshape(-1)), num_keys=1
    )
    return flat[:take]


@jax.jit
def expand_words(flat: jax.Array, counts: jax.Array):
    """Inverse of `compact_words`: flat uint16 + counts -> padded rows
    [L, chunk+2] (one gather).  Handles the zero-word stream (every
    symbol probability-1: single-symbol contexts emit nothing)."""
    if flat.shape[0] == 0:
        flat = jnp.zeros((1,), flat.dtype)
    W = flat.shape[0]
    offs = jnp.cumsum(counts) - counts
    iota = jnp.arange(CHUNK + 2, dtype=jnp.int32)[None, :]
    idx = jnp.clip(offs[:, None] + iota, 0, W - 1)
    valid = iota < counts[:, None]
    return jnp.where(valid, flat[idx], 0)
