"""Pallas TPU kernels for the group-rank coder's model walks.

The `-e2` hot loop (`grc.py`) advances one adaptive-probability model
per lane per bit.  The XLA form keeps the [lanes, NM=1221] counter
array in the fori_loop carry, so every bit-step streams the full model
state through HBM (~40 MB r/w per step at 4 MiB blocks — the measured
-e2 cost, VERDICT r3 Weak #2).  Here the state tile lives in VMEM for
the whole walk:

  - layout [NMP, 128]: models on the sublane axis, lanes on the 128
    lanes (the mtf/huffman kernel pattern proven on this chip);
  - each model row packs (counter | init << 16) so the per-step masked
    reduction returns the fine counter AND the wired block-static init
    with one pass;
  - the counter update is delta-form (state += where(hit, nf-pf, 0)):
    two VPU passes instead of a select-rewrite of the whole tile;
  - rANS state is int32 with logical shifts (Mosaic has no unsigned
    reductions; wraparound matches uint32 mod-2^32 semantics).

Both kernels reproduce `grc.py`'s integer arithmetic bit-for-bit —
`tests/test_grc.py` pins kernel-vs-XLA equality in interpret mode, and
the wire format is unchanged (a stream encoded by either path decodes
by either path).

Reference chased: libbsc's serial QLFC coder `qlfc.cpp:448-752`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpulc.codecs.bsclike.grc import (
    B_L0,
    B_RE,
    B_RM,
    B_RT,
    B_UE,
    B_UM,
    B_UT,
    GCHUNK,
    MAX_EK,
    NFAM,
    NM,
    PROB_BITS,
    RANS_L,
    RATE_C,
    RATE_F,
    SCALE,
    _ctx_regs,
    _rq_of,
)

NL = 128                      # lanes per grid step (lane dimension)
NMP = -(-NM // 8) * 8         # 1224: model rows padded to sublane tile
T_BLOCK = 512                 # steps per encode-walk grid tile


def _shr_u32(x, n):
    return jax.lax.shift_right_logical(x, jnp.int32(n))


def _bitlen_small(v):
    """bit_length for 0 <= v < 512 without lax.clz (9 compares)."""
    n = jnp.zeros_like(v)
    for i in range(9):
        n = n + (v >= (1 << i)).astype(jnp.int32)
    return n


def _fam_of(mdl):
    """family index of a model id by base compares (no table gather)."""
    f = jnp.zeros_like(mdl)
    for b in (B_RT, B_RE, B_RM, B_UT, B_UE, B_UM):
        f = f + (mdl >= b).astype(jnp.int32)
    return f


def _mix_i(pf, pc, pi):
    pe = (19 * pf + 7 * pc + 6 * pi) >> 5
    return jnp.clip(pe, 8, SCALE - 8)


def _adapt_delta(p, bit, rate):
    """nf - p of grc._adapt (the unconditional adapted step)."""
    return jnp.clip(p + (((bit << PROB_BITS) - p) >> rate),
                    8, SCALE - 8) - p


def _pack_pinit(init_i):
    """[NM] int32 inits -> [NMP, NL] packed (init | init<<16) rows."""
    v = jnp.zeros((NMP,), jnp.int32).at[:NM].set(
        init_i.astype(jnp.int32))
    packed = v | (v << 16)
    return jnp.broadcast_to(packed[:, None], (NMP, NL))


# ---------------------------------------------------------------- encode

def _walk_kernel(nsteps_ref, pinit_ref, cinit_ref, gmb_ref, probs_ref,
                 pstate, cstate):
    """One (lane-tile, step-tile) grid cell of the encode model walk.

    Grid is (L_tiles, T_tiles) with T inner; pstate/cstate scratch
    persists across the sequential T tiles and re-initializes at
    t_tile == 0 (TPU grid cells run in order on the core)."""
    t_tile = pl.program_id(1)

    @pl.when(t_tile == 0)
    def _():
        pstate[:, :] = pinit_ref[:, :]
        cstate[:, :] = cinit_ref[:, :]

    rows_m = jax.lax.broadcasted_iota(jnp.int32, (NMP, NL), 0)
    rows_c = jax.lax.broadcasted_iota(jnp.int32, (8, NL), 0)
    rows_t = jax.lax.broadcasted_iota(jnp.int32, (T_BLOCK, NL), 0)
    nsteps = nsteps_ref[0]
    base_t = t_tile * T_BLOCK
    gmb = gmb_ref[:, :]                              # [T_BLOCK, NL]

    def body(tl, probs):
        e = jnp.sum(jnp.where(rows_t == tl, gmb, 0), axis=0)   # [NL]
        mdl = jnp.maximum(e // 2 - 1, 0)
        upd = e > 0
        bit = e & 1
        fam = _fam_of(mdl)
        mhit = rows_m == mdl[None, :]
        chit = rows_c == fam[None, :]
        packed = jnp.sum(jnp.where(mhit, pstate[:, :], 0), axis=0)
        pf = packed & 0xFFFF
        pi = _shr_u32(packed, 16)
        pc = jnp.sum(jnp.where(chit, cstate[:, :], 0), axis=0)
        pe = _mix_i(pf, pc, pi)
        updi = upd.astype(jnp.int32)
        df = _adapt_delta(pf, bit, RATE_F) * updi
        dc = _adapt_delta(pc, bit, RATE_C) * updi
        pstate[:, :] = pstate[:, :] + jnp.where(mhit, df[None, :], 0)
        cstate[:, :] = cstate[:, :] + jnp.where(chit, dc[None, :], 0)
        probs = jnp.where(rows_t == tl,
                          jnp.broadcast_to(pe[None, :], probs.shape),
                          probs)
        return probs

    probs0 = jnp.zeros((T_BLOCK, NL), jnp.int32)
    # steps past nsteps never feed the reverse rANS (ebody masks on
    # t < nsteps), so tiles beyond the live range run zero iterations.
    steps_here = jnp.clip(nsteps - base_t, 0, T_BLOCK)
    probs_ref[:, :] = jax.lax.fori_loop(0, steps_here, body, probs0)


@partial(jax.jit, static_argnames=("interpret",))
def grc_walk_probs_pallas(gmb_t: jax.Array, init_i: jax.Array,
                          cinit_i: jax.Array, nsteps: jax.Array,
                          interpret: bool = False) -> jax.Array:
    """Encode-side forward model walk.

    gmb_t int32[W, L] (transposed event grid, W a T_BLOCK multiple,
    L an NL multiple), init_i int32[NM], cinit_i int32[NFAM] ->
    probs int32[W, L] (mixed probability per event slot; slots past a
    lane's events carry unused values, as in the XLA walk)."""
    W, L = gmb_t.shape
    assert W % T_BLOCK == 0 and L % NL == 0, (W, L)
    pinit = _pack_pinit(init_i)
    cinit = jnp.zeros((8,), jnp.int32).at[:NFAM].set(
        cinit_i.astype(jnp.int32))
    cinit = jnp.broadcast_to(cinit[:, None], (8, NL))
    return pl.pallas_call(
        _walk_kernel,
        out_shape=jax.ShapeDtypeStruct((W, L), jnp.int32),
        grid=(L // NL, W // T_BLOCK),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((NMP, NL), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, NL), lambda i, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T_BLOCK, NL), lambda i, t: (t, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T_BLOCK, NL), lambda i, t: (t, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((NMP, NL), jnp.int32),
            pltpu.VMEM((8, NL), jnp.int32),
        ],
        interpret=interpret,
    )(jnp.reshape(nsteps.astype(jnp.int32), (1,)), pinit, cinit, gmb_t)


@partial(jax.jit, static_argnames=("chunk", "W", "bs", "interpret"))
def grc_encode_pallas(ranks: jax.Array, m: jax.Array, W: int,
                      chunk: int = GCHUNK, bs: int | None = None,
                      interpret: bool = False):
    """Drop-in twin of `grc.grc_encode` with the forward model walk in
    the VMEM-resident Pallas kernel (binarize / stats / reverse rANS
    stay XLA — they are scan/scatter shaped, not state-walk shaped)."""
    from tpulc.codecs.bsclike.grc import (
        _binarize,
        _reverse_rans_t,
        _stats_quant,
    )

    gmb, lane_bits = _binarize(ranks, m, W, chunk, bs)
    init_i, cinit_i, tot = _stats_quant(gmb)
    nsteps = jnp.max(lane_bits)
    L = gmb.shape[0]
    Wp = -(-W // T_BLOCK) * T_BLOCK
    Lp = -(-L // NL) * NL
    gmb_t = jnp.zeros((Wp, Lp), jnp.int32).at[:W, :L].set(gmb.T)
    probs_t = grc_walk_probs_pallas(gmb_t, init_i, cinit_i, nsteps,
                                    interpret=interpret)
    # time-major emission: contiguous row slices per step instead of
    # 2 x nsteps strided column gathers (GRC_TRACE_r5)
    words, counts, x = _reverse_rans_t(gmb_t, probs_t, nsteps, L, W)
    return (words, counts, x, init_i.astype(jnp.uint16),
            cinit_i.astype(jnp.uint16), tot)


def use_pallas() -> bool:
    """Pallas walks by default on real TPU backends; the XLA walks are
    the portable reference elsewhere.  TPULC_GRC_PALLAS=0/1 forces."""
    import os

    env = os.environ.get("TPULC_GRC_PALLAS")
    if env is not None:
        return env not in ("0", "")
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


# ---------------------------------------------------------------- decode

def _decode_kernel(chunk: int, nsteps_ref, pinit_ref, cinit_ref,
                   words_ref, x0_ref, nsym_ref, out_ref, pstate):
    """Full forward FSM decode for one 128-lane tile (grc_decode's
    body2 with the model state resident in VMEM)."""
    pstate[:, :] = pinit_ref[:, :]
    rows_m = jax.lax.broadcasted_iota(jnp.int32, (NMP, NL), 0)
    rows_c = jax.lax.broadcasted_iota(jnp.int32, (8, NL), 0)
    Wc = words_ref.shape[0]
    rows_w = jax.lax.broadcasted_iota(jnp.int32, (Wc, NL), 0)
    rows_o = jax.lax.broadcasted_iota(jnp.int32, (chunk, NL), 0)
    words = words_ref[:, :]                          # [Wc, NL] i32
    nsym = nsym_ref[0, :]
    nsteps = nsteps_ref[0]
    z = jnp.zeros((NL,), jnp.int32)

    def body(t, carry):
        (x, rpos, out, opos, phase, lvl, val, mleft, ek, kval, kleft,
         r, prev_r, prev2_r, prev_k, prev2_k, prev_e, cstate) = carry
        active = opos < nsym
        cR4, cRun, hE, cR4c, cR0 = _ctx_regs(
            prev_r, prev2_r, prev_k, prev2_k, prev_e)
        rq = _rq_of(r)
        mdl = jnp.where(
            phase == 0, B_L0,
            jnp.where(
                phase == 1, B_RT + cR4 * 16 + cRun * 4 + hE,
                jnp.where(
                    phase == 2,
                    B_RE + (jnp.clip(lvl, 1, 6) - 1) * 4 + cR4c,
                    jnp.where(
                        phase == 3,
                        B_RM + (jnp.clip(ek, 1, 7) - 1) * 64
                        + jnp.minimum(val, 63),
                        jnp.where(
                            phase == 4,
                            B_UT + rq * 32 + cRun * 8 + cR0,
                            jnp.where(
                                phase == 5,
                                B_UE + (jnp.clip(lvl, 1, MAX_EK - 1)
                                        - 1) * 4 + rq,
                                B_UM + (jnp.clip(ek, 1, MAX_EK)
                                        - 1) * 32
                                + jnp.minimum(kval, 31),
                            ))))))
        mdl = jnp.clip(mdl, 0, NM - 1)
        mhit = rows_m == mdl[None, :]
        chit = rows_c == phase[None, :]              # family == phase
        packed = jnp.sum(jnp.where(mhit, pstate[:, :], 0), axis=0)
        pf = packed & 0xFFFF
        pi = _shr_u32(packed, 16)
        pc = jnp.sum(jnp.where(chit, cstate, 0), axis=0)
        pe = _mix_i(pf, pc, pi)
        # rANS advance (int32 with u32 wrap semantics)
        f0 = SCALE - pe
        slot = x & (SCALE - 1)
        bit = (slot >= f0).astype(jnp.int32)
        f = jnp.where(bit == 1, pe, f0)
        c = jnp.where(bit == 1, f0, 0)
        x_new = f * _shr_u32(x, PROB_BITS) + slot - c
        need = active & (x_new >= 0) & (x_new < RANS_L)
        w = jnp.sum(jnp.where(
            rows_w == jnp.minimum(rpos, Wc - 1)[None, :], words, 0),
            axis=0)
        x_new2 = jnp.where(need, (x_new << 16) | w, x_new)
        rpos = rpos + need.astype(jnp.int32)
        x = jnp.where(active, x_new2, x)
        ai = active.astype(jnp.int32)
        df = _adapt_delta(pf, bit, RATE_F) * ai
        dc = _adapt_delta(pc, bit, RATE_C) * ai
        pstate[:, :] = pstate[:, :] + jnp.where(mhit, df[None, :], 0)
        cstate = cstate + jnp.where(chit, dc[None, :], 0)

        b1 = bit == 1
        is0, is1, is2 = phase == 0, phase == 1, phase == 2
        is3, is4, is5, is6 = phase == 3, phase == 4, phase == 5, \
            phase == 6
        # --- rank side ---
        r_n = jnp.where(is0 & b1, 0, jnp.where(is1 & b1, 1, r))
        to_ut = (is0 & b1) | (is1 & b1)
        to_rt = is0 & ~b1
        to_re = is1 & ~b1
        lvl_n = jnp.where(to_re, 1, lvl)
        re_cont = is2 & b1
        lvl_n = jnp.where(re_cont, lvl + 1, lvl_n)
        re_to_rm_hi = re_cont & (lvl_n == 7)
        re_stop = is2 & ~b1
        enter_rm = re_to_rm_hi | re_stop
        ek_rank = jnp.where(re_to_rm_hi, 7, lvl)
        ek_n = jnp.where(enter_rm, ek_rank, ek)
        val_n = jnp.where(enter_rm, 1, val)
        mleft_n = jnp.where(enter_rm, ek_rank, mleft)
        val_n = jnp.where(is3, val * 2 + bit, val_n)
        mleft_n = jnp.where(is3, mleft - 1, mleft_n)
        rm_done = is3 & (mleft_n == 0)
        r_n = jnp.where(rm_done, val_n, r_n)
        to_ut = to_ut | rm_done
        # --- run side ---
        ut_one = is4 & b1
        to_ue = is4 & ~b1
        lvl_n = jnp.where(to_ue, 1, lvl_n)
        ue_cont = is5 & b1
        lvl_n = jnp.where(ue_cont, lvl + 1, lvl_n)
        ue_to_um_hi = ue_cont & (lvl_n == MAX_EK)
        ue_stop = is5 & ~b1
        enter_um = ue_to_um_hi | ue_stop
        ek_run = jnp.where(ue_to_um_hi, MAX_EK, lvl)
        ek_n = jnp.where(enter_um, ek_run, ek_n)
        kval_n = jnp.where(enter_um, 1, kval)
        kleft_n = jnp.where(enter_um, ek_run, kleft)
        kval_n = jnp.where(is6, kval * 2 + bit, kval_n)
        kleft_n = jnp.where(is6, kleft - 1, kleft_n)
        um_done = is6 & (kleft_n == 0)
        k_done = jnp.where(ut_one, 1, jnp.where(um_done, kval_n, 0))
        complete = active & (ut_one | um_done)
        k_done = jnp.clip(k_done, 0, jnp.maximum(nsym - opos, 1))
        out = jnp.where(
            (complete & (r_n > 0))[None, :] & (rows_o == opos[None, :]),
            jnp.broadcast_to(r_n[None, :], out.shape), out)
        opos_n = jnp.where(complete, opos + k_done, opos)
        prev2_r_n = jnp.where(complete, prev_r, prev2_r)
        prev2_k_n = jnp.where(complete, prev_k, prev2_k)
        prev_r_n = jnp.where(complete, r_n, prev_r)
        prev_k_n = jnp.where(complete, k_done, prev_k)
        prev_e_n = jnp.where(
            complete,
            jnp.where(r_n > 0,
                      _bitlen_small(jnp.maximum(r_n, 1)) - 1, 0),
            prev_e)
        phase_n = jnp.where(
            complete, 1,
            jnp.where(to_rt, 1,
                      jnp.where(to_re, 2,
                                jnp.where(enter_rm, 3,
                                          jnp.where(to_ut & ~complete, 4,
                                                    jnp.where(to_ue, 5,
                                                              jnp.where(enter_um, 6, phase)))))))
        phase_n = jnp.where((to_ut & ~complete), 4, phase_n)
        r_n2 = jnp.where(complete, 0, r_n)
        upd = active
        return (x, rpos, out,
                jnp.where(upd, opos_n, opos),
                jnp.where(upd, phase_n, phase),
                jnp.where(upd, lvl_n, lvl),
                jnp.where(upd, val_n, val),
                jnp.where(upd, mleft_n, mleft),
                jnp.where(upd, ek_n, ek),
                jnp.where(upd, kval_n, kval),
                jnp.where(upd, kleft_n, kleft),
                jnp.where(upd, r_n2, r),
                jnp.where(upd, prev_r_n, prev_r),
                jnp.where(upd, prev2_r_n, prev2_r),
                jnp.where(upd, prev_k_n, prev_k),
                jnp.where(upd, prev2_k_n, prev2_k),
                jnp.where(upd, prev_e_n, prev_e),
                cstate)

    carry0 = (x0_ref[0, :], z, jnp.zeros((chunk, NL), jnp.int32), z,
              z, z, z, z, z, z, z, z,
              z, z, z + 1, z + 1, z, cinit_ref[:, :])

    # Early exit once every lane in this tile has produced its symbols
    # (nsteps is the GLOBAL max; padded/short tiles finish far sooner —
    # on the r4 bench corpus 443 of 1024 lanes are pure padding).
    def cond(tc):
        t, carry = tc
        opos = carry[3]
        return (t < nsteps) & jnp.any(opos < nsym)

    def step(tc):
        t, carry = tc
        return t + 1, body(t, carry)

    _, carry = jax.lax.while_loop(cond, step, (jnp.int32(0), carry0))
    out_ref[:, :] = carry[2]


@partial(jax.jit, static_argnames=("cap", "chunk", "interpret"))
def grc_decode_pallas(words: jax.Array, counts: jax.Array,
                      states: jax.Array, m: jax.Array,
                      inits: jax.Array, cinits: jax.Array,
                      nsteps: jax.Array, cap: int,
                      chunk: int = GCHUNK,
                      interpret: bool = False) -> jax.Array:
    """Drop-in twin of `grc.grc_decode` (same signature/semantics) with
    the FSM walk in a VMEM-resident Pallas kernel."""
    del counts
    L = cap // chunk
    Lp = -(-L // NL) * NL
    rows = jnp.arange(Lp, dtype=jnp.int32)
    nsym_lane = jnp.clip(m - rows * chunk, 0, chunk)[None, :]
    Wc = words.shape[1]
    words_t = jnp.zeros((Wc, Lp), jnp.int32).at[:, :L].set(
        words.astype(jnp.int32).T)
    x0 = jnp.zeros((Lp,), jnp.int32).at[:L].set(
        states.astype(jnp.int32))[None, :]
    pinit = _pack_pinit(inits.astype(jnp.int32))
    cinit = jnp.zeros((8,), jnp.int32).at[:NFAM].set(
        cinits.astype(jnp.int32))
    cinit = jnp.broadcast_to(cinit[:, None], (8, NL))
    out = pl.pallas_call(
        partial(_decode_kernel, chunk),
        out_shape=jax.ShapeDtypeStruct((chunk, Lp), jnp.int32),
        grid=(Lp // NL,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((NMP, NL), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, NL), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Wc, NL), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NL), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NL), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((chunk, NL), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((NMP, NL), jnp.int32)],
        interpret=interpret,
    )(jnp.reshape(nsteps.astype(jnp.int32), (1,)), pinit, cinit,
      words_t, x0, nsym_lane)
    return out.T[:L].reshape(cap)
