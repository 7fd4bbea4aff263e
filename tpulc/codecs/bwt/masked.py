"""Dynamic-length block-sorting pipeline at fixed compiled shape.

BWT cannot run on zero-padded data (padding changes the rotations), but
recompiling per data length is prohibitive on TPU.  These variants take
a fixed capacity `cap` and a traced valid length `n`:

  - padding positions carry unique rank keys greater than every real
    key, so they sort after all real rotations and never disturb real
    group numbering (the invariant `real ranks < n <= pad ranks` is
    maintained through every doubling round);
  - wraparound indexing uses `(i + k) mod n` with traced n (one gather
    per round instead of a roll — the price of dynamic length);
  - MTF is causal, so padding just rides along; RLE2 padding bytes are
    forced to a nonzero value so a trailing real zero run closes
    correctly, and the pad's 1:1 literals are trimmed by count.

Used by the bsc-class large-block codec (LZP output length is data
dependent) and the .bz2 emitter (RLE1 block lengths vary).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tpulc.codecs.bwt.rle import rle2_encode, rle2_decode
from tpulc.primitives.mtf import mtf_encode, mtf_decode


@partial(jax.jit, static_argnames=("tie_desc",))
def bwt_encode_masked(data: jax.Array, n: jax.Array, tie_desc: bool = False):
    """BWT of the first n bytes of uint8[cap].

    Returns (last uint8[cap] valid prefix n, idx0 int32).
    """
    cap = data.shape[0]
    idx = jnp.arange(cap, dtype=jnp.int32)
    real = idx < n
    byte = jnp.where(real, data.astype(jnp.int32), 256 + idx)
    _, order0 = jax.lax.sort((byte, idx), num_keys=1, is_stable=True)
    b_sorted = byte[order0]
    grp0 = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         (b_sorted[1:] != b_sorted[:-1]).astype(jnp.int32)]
    )
    rank0 = jnp.zeros((cap,), jnp.int32).at[order0].set(jnp.cumsum(grp0))

    def cond(state):
        rank, k = state
        return (k < n) & (jnp.max(rank) < cap - 1)

    def body(state):
        rank, k = state
        nxt = jnp.where(real, (idx + k) % jnp.maximum(n, 1), idx)
        key2 = rank[nxt]
        r1, r2, order = jax.lax.sort(
            (rank, key2, idx), num_keys=2, is_stable=True
        )
        newgrp = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32),
             ((r1[1:] != r1[:-1]) | (r2[1:] != r2[:-1])).astype(jnp.int32)]
        )
        rank = jnp.zeros((cap,), jnp.int32).at[order].set(jnp.cumsum(newgrp))
        return rank, k * 2

    rank, _ = jax.lax.while_loop(cond, body, (rank0, jnp.int32(1)))
    tie_key = jnp.where(real, (n - 1) - idx if tie_desc else idx, idx)
    _, tk = jax.lax.sort((rank, tie_key), num_keys=2, is_stable=True)
    order = jnp.where(jnp.arange(cap) < n, ((n - 1) - tk) if tie_desc else tk, 0)
    last = jnp.where(
        jnp.arange(cap) < n,
        data[(order - 1) % jnp.maximum(n, 1)],
        0,
    ).astype(jnp.uint8)
    idx0 = jnp.argmax((order == 0) & (jnp.arange(cap) < n)).astype(jnp.int32)
    return last, idx0


@jax.jit
def bwt_decode_masked(last: jax.Array, n: jax.Array, idx0: jax.Array):
    """Inverse BWT of the first n bytes of uint8[cap] -> uint8[cap]."""
    cap = last.shape[0]
    idx = jnp.arange(cap, dtype=jnp.int32)
    real = idx < n
    sym = jnp.where(real, last.astype(jnp.int32), 256 + idx)
    _, order = jax.lax.sort((sym, idx), num_keys=1, is_stable=True)
    T = jnp.zeros((cap,), jnp.int32).at[order].set(idx)
    T = jnp.where(real, T, idx)  # padding self-loops

    rounds = max(1, (cap - 1).bit_length())
    state0 = jnp.stack([T, jnp.ones((cap,), jnp.int32)], axis=1)

    def round_body(_, state):
        ptr = state[:, 0]
        tgt = state[ptr]
        live = (ptr != idx0)[:, None] & real[:, None]
        upd = jnp.stack([tgt[:, 0], state[:, 1] + tgt[:, 1]], axis=1)
        return jnp.where(live, upd, state)

    state = jax.lax.fori_loop(0, rounds, round_body, state0)
    ptr, d = state[:, 0], state[:, 1]
    in_cycle = (ptr == idx0) & real
    p = jnp.maximum(d[idx0], 1)
    slot = jnp.where(in_cycle, (p - d) % p, cap)
    cyc = jnp.zeros((cap,), jnp.uint8).at[slot].set(last, mode="drop")
    j = jnp.arange(cap, dtype=jnp.int32)
    return cyc[(n - 1 - j) % p]


@jax.jit
def forward_masked(block: jax.Array, n: jax.Array):
    """BWT -> MTF -> RLE2 over the valid prefix; single compiled program.

    Returns (syms int32[cap], m, idx0, hist int32[257]).
    """
    from tpulc.codecs.bwt.rle import ALPHABET

    cap = block.shape[0]
    idx = jnp.arange(cap, dtype=jnp.int32)
    last, idx0 = bwt_encode_masked(block, n)
    ranks = mtf_encode(last)
    # force pad ranks nonzero so a trailing real zero-run closes, and
    # pad maps 1:1 to literals for the count trim
    ranks = jnp.where(idx < n, ranks, jnp.uint8(255))
    syms, m_all = rle2_encode(ranks)
    m = m_all - (cap - n)
    masked = jnp.where(idx < m, syms, ALPHABET)
    hist = jnp.zeros((ALPHABET + 1,), jnp.int32).at[masked].add(
        1, mode="drop"
    )[:ALPHABET]
    return syms, m, idx0, hist


@jax.jit
def inverse_masked(syms: jax.Array, m: jax.Array, n: jax.Array,
                   idx0: jax.Array):
    """RLE2 -> MTF -> BWT inverse over the valid prefix -> uint8[cap]."""
    ranks, _ = rle2_decode(syms, m)
    # rle2 output beyond n is zeros; restore the pad literals the
    # encoder used so mtf_decode state stays causal-consistent (it is
    # causal, so the tail simply does not matter)
    last = mtf_decode(ranks)
    return bwt_decode_masked(last, n, idx0)
