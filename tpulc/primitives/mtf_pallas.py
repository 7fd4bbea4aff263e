"""Pallas TPU kernels for the MTF lockstep phases.

The serial intra-chunk phases of `mtf_decode`/`mtf_encode` are C-step
loops whose body reads one table entry and applies a masked shift
(move-to-front) over [chunks, 256] tables.  As a `lax.scan` each step
streams the full [nchunks, 256] table state through HBM; in Pallas the
whole loop runs inside one kernel with the table tile resident in VMEM.

TPU mapping notes (verified on this chip):
  - Mosaic cannot gather across more than one 128-lane vreg ("Multiple
    source vregs along gather dimension"), so the 256-entry table rides
    as two 128-lane halves and the table read is a masked lane-max
    reduction (no gather at all).
  - Mosaic rejects non-128-aligned dynamic VMEM indexing, so the rank
    block loads once and column selection is elementwise-masked in
    registers.
  - the grid tiles chunks in groups of 8 (sublane dim).

The kernel emits BOTH the per-step values and the final table, so one
kernel body serves the decode phase (values = symbols) and the
permutation-build phase (final table = chunk permutation applied to the
given start table).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128  # chunks per grid step; 128 measured fastest on the v5e


def _pad_chunks(table0, seq):
    nchunks = seq.shape[0]
    pad = -(-nchunks // TILE) * TILE - nchunks
    if pad:
        ident = jnp.broadcast_to(
            jnp.arange(256, dtype=table0.dtype)[None, :], (pad, 256)
        )
        table0 = jnp.concatenate([table0, ident], axis=0)
        seq = jnp.concatenate(
            [seq, jnp.zeros((pad, seq.shape[1]), seq.dtype)], axis=0
        )
    return table0, seq, nchunks


def _mtf_kernel(table_ref, ranks_ref, out_ref, tabout_ref):
    C = ranks_ref.shape[1]
    ranks = ranks_ref[:, :].astype(jnp.int32)              # [TILE, C]
    col = jax.lax.broadcasted_iota(jnp.int32, ranks.shape, 1)
    pos0 = jax.lax.broadcasted_iota(jnp.int32, (TILE, 128), 1)
    pos1 = pos0 + 128
    h0 = table_ref[:, :128].astype(jnp.int32)
    h1 = table_ref[:, 128:].astype(jnp.int32)

    def body(j, carry):
        h0, h1, out = carry
        rank = jnp.sum(jnp.where(col == j, ranks, 0), axis=1,
                       keepdims=True)                      # [TILE, 1]
        s0 = jnp.max(jnp.where(pos0 == rank, h0, 0), axis=1, keepdims=True)
        s1 = jnp.max(jnp.where(pos1 == rank, h1, 0), axis=1, keepdims=True)
        sym = jnp.maximum(s0, s1)                          # [TILE, 1]
        h1 = jnp.where(pos1 <= rank,
                       jnp.concatenate([h0[:, -1:], h1[:, :-1]], axis=1), h1)
        h0 = jnp.where(pos0 <= rank,
                       jnp.concatenate([sym, h0[:, :-1]], axis=1), h0)
        out = jnp.where(col == j, jnp.broadcast_to(sym, out.shape), out)
        return h0, h1, out

    out0 = jnp.zeros((TILE, C), jnp.int32)
    h0, h1, out = jax.lax.fori_loop(0, C, body, (h0, h1, out0))
    out_ref[:, :] = out
    tabout_ref[:, :] = jnp.concatenate([h0, h1], axis=1)


@partial(jax.jit, static_argnames=("interpret",))
def mtf_lockstep_pallas(table0: jax.Array, ranks: jax.Array,
                        interpret: bool = False):
    """Lockstep MTF-by-rank over chunks: table0 int32[nchunks, 256],
    ranks int32[nchunks, C] -> (symbols int32[nchunks, C], final table
    int32[nchunks, 256])."""
    table0, ranks, n_real = _pad_chunks(table0, ranks)
    nchunks, C = ranks.shape
    grid = (nchunks // TILE,)
    out, tab = pl.pallas_call(
        _mtf_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nchunks, C), jnp.int32),
            jax.ShapeDtypeStruct((nchunks, 256), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, 256), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 256), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(table0, ranks)
    return out[:n_real], tab[:n_real]


def mtf_decode_phase_pallas(table0: jax.Array, ranks: jax.Array,
                            interpret: bool = False) -> jax.Array:
    """Decode phase only (back-compat wrapper): symbols int32[nchunks, C]."""
    return mtf_lockstep_pallas(table0, ranks, interpret=interpret)[0]


def _mtf_encode_kernel(table_ref, syms_ref, out_ref, tabout_ref):
    C = syms_ref.shape[1]
    syms = syms_ref[:, :].astype(jnp.int32)                # [TILE, C]
    col = jax.lax.broadcasted_iota(jnp.int32, syms.shape, 1)
    pos0 = jax.lax.broadcasted_iota(jnp.int32, (TILE, 128), 1)
    pos1 = pos0 + 128
    h0 = table_ref[:, :128].astype(jnp.int32)
    h1 = table_ref[:, 128:].astype(jnp.int32)

    def body(j, carry):
        h0, h1, out = carry
        sym = jnp.sum(jnp.where(col == j, syms, 0), axis=1,
                      keepdims=True)                       # [TILE, 1]
        r0 = jnp.max(jnp.where(h0 == sym, pos0, 0), axis=1, keepdims=True)
        r1 = jnp.max(jnp.where(h1 == sym, pos1, 0), axis=1, keepdims=True)
        rank = jnp.maximum(r0, r1)                         # [TILE, 1]
        h1 = jnp.where(pos1 <= rank,
                       jnp.concatenate([h0[:, -1:], h1[:, :-1]], axis=1), h1)
        h0 = jnp.where(pos0 <= rank,
                       jnp.concatenate([sym, h0[:, :-1]], axis=1), h0)
        out = jnp.where(col == j, jnp.broadcast_to(rank, out.shape), out)
        return h0, h1, out

    out0 = jnp.zeros((TILE, C), jnp.int32)
    h0, h1, out = jax.lax.fori_loop(0, C, body, (h0, h1, out0))
    out_ref[:, :] = out
    tabout_ref[:, :] = jnp.concatenate([h0, h1], axis=1)


@partial(jax.jit, static_argnames=("interpret",))
def mtf_encode_lockstep_pallas(table0: jax.Array, syms: jax.Array,
                               interpret: bool = False):
    """Lockstep MTF-by-symbol over chunks: table0 int32[nchunks, 256],
    syms int32[nchunks, C] -> (ranks int32[nchunks, C], final table)."""
    table0, syms, n_real = _pad_chunks(table0, syms)
    nchunks, C = syms.shape
    grid = (nchunks // TILE,)
    out, tab = pl.pallas_call(
        _mtf_encode_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((nchunks, C), jnp.int32),
            jax.ShapeDtypeStruct((nchunks, 256), jnp.int32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, 256), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((TILE, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 256), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(table0, syms)
    return out[:n_real], tab[:n_real]


def _recency_kernel(syms_ref, out_ref):
    """Per-chunk last-occurrence step index of every symbol (-1 unseen)."""
    C = syms_ref.shape[1]
    syms = syms_ref[:, :].astype(jnp.int32)                # [TILE, C]
    col = jax.lax.broadcasted_iota(jnp.int32, syms.shape, 1)
    pos0 = jax.lax.broadcasted_iota(jnp.int32, (TILE, 128), 1)
    pos1 = pos0 + 128
    r0 = jnp.full((TILE, 128), -1, jnp.int32)
    r1 = jnp.full((TILE, 128), -1, jnp.int32)

    def body(t, carry):
        r0, r1 = carry
        sym = jnp.sum(jnp.where(col == t, syms, 0), axis=1,
                      keepdims=True)                       # [TILE, 1]
        r0 = jnp.where(pos0 == sym, t, r0)
        r1 = jnp.where(pos1 == sym, t, r1)
        return r0, r1

    r0, r1 = jax.lax.fori_loop(0, C, body, (r0, r1))
    out_ref[:, :] = jnp.concatenate([r0, r1], axis=1)


@partial(jax.jit, static_argnames=("interpret",))
def mtf_recency_pallas(syms: jax.Array, interpret: bool = False):
    """syms int32[nchunks, C] -> last-occurrence step int32[nchunks, 256]
    (-1 for symbols absent from the chunk).  Replaces a 900K-lane
    scatter-max (the mtf_encode hotspot, ~8.6ms/MB on the v5e) with a
    ~2ms VMEM loop."""
    nchunks, C = syms.shape
    pad = -(-nchunks // TILE) * TILE - nchunks
    if pad:
        syms = jnp.concatenate(
            [syms, jnp.zeros((pad, C), syms.dtype)], axis=0
        )
    grid = ((nchunks + pad) // TILE,)
    out = pl.pallas_call(
        _recency_kernel,
        out_shape=jax.ShapeDtypeStruct((nchunks + pad, 256), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, 256), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(syms)
    return out[:nchunks]
