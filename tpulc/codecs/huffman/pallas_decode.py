"""Pallas TPU kernel for the chunked Huffman symbol walk.

The aligned decode (`decode.huffman_decode_uniform*`) is a serial
C-step loop whose XLA form pays 2 HBM gathers per step (bit window +
LUT).  This kernel keeps everything in VMEM: chunks ride the 128 lanes,
each chunk's word slice sits on the sublane axis, and the codeword
length comes from a LUT-free canonical compare chain (first length l
with ``win >> (L-l) < lim[l]``, cuhd table semantics rebuilt from
lengths — see `device_tables.canonical_decode_params`).

Per step and lane: two masked sublane reductions fetch the straddling
word pair, a 15-way unrolled compare finds the code length, and the
CANONICAL INDEX (not the symbol) is emitted — the caller maps indices
to symbols afterwards with one MXU one-hot contraction, which also
absorbs per-chunk table selectors (bzip2 multi-table mode,
`compress.c:242-600`).

Mosaic constraints shaping the design (this chip):
  - no gathers across >1 source vreg -> no 2^15 LUT, no 257-entry
    symbol map in-kernel;
  - dynamic VMEM indexing must be 128-aligned -> word fetch is a
    masked reduction over the sublane axis, not an index;
  - per-lane variable shifts are native.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NL = 128        # chunks per grid step (lane dimension)
ROW_WORDS = 64  # words of stream per chunk row (>= 62, see driver calc)

_U32 = jnp.uint32


def _kernel(max_len: int, chunk_syms: int, row_words: int,
            wrow_ref, pos_ref, end_ref, lim_ref, base_ref, out_ref):
    L = max_len
    sub = jax.lax.broadcasted_iota(jnp.int32, (row_words, NL), 0)
    wrow = wrow_ref[:, :]                          # [row_words, NL] i32 bits
    pos0 = pos_ref[0, :]                           # [NL] i32 (bits, row-rel)
    end = end_ref[0, :]
    lim = lim_ref[:, :]                            # [L+1, NL] i32
    base = base_ref[:, :]

    def body(t, state):
        pos, out = state
        active = pos < end
        widx = pos >> 5
        # Mosaic has no unsigned reductions: mask/sum in int32 (rows
        # arrive bitcast), reinterpret as u32 only for the shifts.
        m0 = (sub == widx[None, :]).astype(jnp.int32)
        m1 = (sub == (widx + 1)[None, :]).astype(jnp.int32)
        w0 = jnp.sum(m0 * wrow, axis=0).astype(_U32)  # [NL]
        w1 = jnp.sum(m1 * wrow, axis=0).astype(_U32)
        b = (pos & 31).astype(_U32)
        hi = w0 << b
        lo = jnp.where(b > 0, w1 >> (_U32(32) - b), _U32(0))
        win = ((hi | lo) >> _U32(32 - L)).astype(jnp.int32)  # top L bits

        ln = jnp.zeros((NL,), jnp.int32)
        ci = jnp.zeros((NL,), jnp.int32)
        found = jnp.zeros((NL,), jnp.bool_)
        for l in range(1, L + 1):
            code = win >> (L - l)
            hit = (~found) & (code < lim[l, :])
            ln = jnp.where(hit, l, ln)
            ci = jnp.where(hit, base[l, :] + code, ci)
            found = found | hit
        ln = jnp.where(found, ln, 1)               # corrupt-stream guard

        # masked row write (dynamic_update_slice doesn't lower in Mosaic)
        row = jax.lax.broadcasted_iota(jnp.int32, out.shape, 0)
        val = jnp.broadcast_to(jnp.where(active, ci, 0)[None, :], out.shape)
        out = jnp.where(row == t, val, out)
        pos = pos + jnp.where(active, ln, 0)
        return pos, out

    out0 = jnp.zeros((chunk_syms, NL), jnp.int32)
    _, out = jax.lax.fori_loop(0, chunk_syms, body, (pos0, out0))
    out_ref[:, :] = out


@partial(jax.jit, static_argnames=("chunk_syms", "max_len",
                                   "row_words"))
def decode_canonical_indices(words_p: jax.Array,
                             chunk_bit_offsets: jax.Array,
                             total_bits: jax.Array,
                             lim_chunk: jax.Array,
                             base_chunk: jax.Array,
                             chunk_syms: int,
                             max_len: int,
                             row_words: int = ROW_WORDS) -> jax.Array:
    """Decode every chunk's canonical indices.

    Args:
      words_p: uint32[W] padded stream (>= 2 pad words).
      chunk_bit_offsets: int32[nsub] absolute start bit per chunk
        (empty chunks point at total_bits).
      total_bits: scalar int32.
      lim_chunk/base_chunk: int32[nsub, max_len+1] per-chunk canonical
        params (already table-selected for multi-table blocks).
      chunk_syms: symbols per chunk (static).

    Returns int32[nsub, chunk_syms] canonical indices (0 past the end).
    """
    nsub = chunk_bit_offsets.shape[0]
    pad = -(-nsub // NL) * NL
    L = max_len

    start_word = chunk_bit_offsets >> 5
    # Word rows: chunk spans <= 31 + chunk_syms*L bits, +1 word for the
    # straddle fetch.
    need = -(-(31 + chunk_syms * L) // 32) + 1
    assert need <= row_words, (need, row_words)
    rows = words_p[
        jnp.clip(start_word[:, None] + jnp.arange(row_words)[None, :],
                 0, words_p.shape[0] - 1)
    ]                                               # [nsub, row_words]
    pos_rel = chunk_bit_offsets - (start_word << 5)
    end_rel = jnp.minimum(
        total_bits.astype(jnp.int32) - (start_word << 5),
        pos_rel + chunk_syms * L,
    )

    def padlanes(x, fill=0):
        return jnp.pad(x, [(0, pad - nsub)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)

    rows_t = jax.lax.bitcast_convert_type(
        padlanes(rows), jnp.int32
    ).T                                             # [ROW_WORDS, pad]
    pos_t = padlanes(pos_rel)[None, :]              # [1, pad]
    end_t = padlanes(end_rel)[None, :]
    lim_t = padlanes(lim_chunk).T                   # [L+1, pad]
    base_t = padlanes(base_chunk).T

    out = pl.pallas_call(
        partial(_kernel, max_len, chunk_syms, row_words),
        out_shape=jax.ShapeDtypeStruct((chunk_syms, pad), jnp.int32),
        grid=(pad // NL,),
        in_specs=[
            pl.BlockSpec((row_words, NL), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NL), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NL), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L + 1, NL), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L + 1, NL), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk_syms, NL), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
    )(rows_t, pos_t, end_t, lim_t, base_t)
    return out[:, :nsub].T                          # [nsub, chunk_syms]
