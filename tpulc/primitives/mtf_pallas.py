"""Pallas TPU kernel for the MTF lockstep decode phase.

The serial intra-chunk phase of `mtf_decode` is a C-step loop whose
body is a same-shape row gather (symbol lookup) plus a masked shift
(move-to-front) over [chunks, 256] tables.  As a `lax.scan` each step
is a separate XLA op sequence; in Pallas the whole loop runs inside one
kernel with the table tile resident in VMEM.

TPU mapping notes (verified on this chip):
  - `jnp.take_along_axis(tab, idx, axis=1)` lowers to a VMEM row
    gather only when idx has the SAME shape as tab — so the per-step
    rank is broadcast across the 256 lane columns and column 0 of the
    gather result is used.
  - Mosaic rejects non-128-aligned dynamic VMEM indexing, so the rank
    block loads once and column selection is elementwise-masked in
    registers.
  - the grid tiles chunks in groups of 8 (sublane dim); tables ride
    VMEM as (8, 256) tiles.

STATUS: semantics validated in interpret mode (tests); compiling
through this environment's remote AOT helper currently fails with an
infrastructure error (TPU_WORKER_HOSTNAMES init in the chipless
compile helper), so the production `mtf_decode` keeps the lax.scan
path.  Revisit when the helper accepts larger Mosaic kernels.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 8


def _kernel(table_ref, ranks_ref, out_ref):
    # Mosaic requires 128-aligned dynamic VMEM indexing, so the whole
    # rank block loads once and per-step column selection happens in
    # registers with elementwise masks (no dynamic slices).
    C = ranks_ref.shape[1]
    ranks = ranks_ref[:, :].astype(jnp.int32)          # [TILE, C]
    col = jax.lax.broadcasted_iota(jnp.int32, ranks.shape, 1)
    pos = jax.lax.broadcasted_iota(jnp.int32, (TILE, 256), 1)

    def body(j, carry):
        table, out = carry
        rank = jnp.sum(jnp.where(col == j, ranks, 0), axis=1,
                       keepdims=True)                  # [TILE, 1]
        rank_b = jnp.broadcast_to(rank, table.shape)
        sym = jnp.take_along_axis(table, rank_b, axis=1)[:, :1]
        shifted = jnp.concatenate([sym, table[:, :-1]], axis=1)
        table = jnp.where(pos <= rank, shifted, table)
        out = jnp.where(col == j, jnp.broadcast_to(sym, out.shape), out)
        return table, out

    out0 = jnp.zeros((TILE, C), jnp.int32)
    _, out = jax.lax.fori_loop(0, C, body, (table_ref[:, :], out0))
    out_ref[:, :] = out


@partial(jax.jit, static_argnames=("interpret",))
def mtf_decode_phase_pallas(table0: jax.Array, ranks: jax.Array,
                            interpret: bool = False) -> jax.Array:
    """Lockstep decode: table0 int32[nchunks, 256], ranks int32
    [nchunks, C] -> symbols int32[nchunks, C].  nchunks must be a
    multiple of TILE (pad with identity tables)."""
    nchunks, C = ranks.shape
    assert nchunks % TILE == 0
    grid = (nchunks // TILE,)
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((nchunks, C), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, 256), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(table0, ranks)
