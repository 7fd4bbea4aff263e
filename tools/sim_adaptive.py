"""Offline design simulator for the bsc adaptive binary coder (-e2).

Reproduces the bsc pipeline's symbol stream (LZP -> rotation BWT ->
MTF -> RLE2) on the bench corpus with fast host-side stages, then
prices entropy-coder designs WITHOUT implementing them on device:

  1. static order-2 context rANS (the shipped `-e1` coder) — sanity
     anchor, should land at the measured ~177.6 KB payload;
  2. QLFC-style adaptive binary decomposition, global adaptation
     (libbsc's regime, not lane-parallelizable) — the ceiling;
  3. the TPU-implementable variant: within-lane adaptation restarted
     from wire'd static inits every CHUNK symbols (what
     `rans_adaptive.py` implements in lockstep lanes).

Costs are exact information content (sum -log2 p) plus real wire
overheads (tables, lane metadata), so coder rankings transfer directly
to the rANS implementation (rANS is within ~0.1% of entropy at 12-bit
probabilities).

Usage: python tools/sim_adaptive.py [--size BYTES]
Intermediate streams cache to /tmp/tpulc_sim (BWT of 3.5 MB takes
~1 min once).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

CACHE = "/tmp/tpulc_sim"
CHUNK = 512
PROB_BITS = 12
SCALE = 1 << PROB_BITS


def make_corpus(size: int) -> bytes:
    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    with open(os.path.join(here, "tests", "data", "pg1661.txt"), "rb") as f:
        raw = f.read()
    return (raw * (size // len(raw) + 1))[:size]


def bwt_rotation_np(arr: np.ndarray):
    """Rotation BWT via circular rank doubling (np.lexsort rounds)."""
    n = len(arr)
    rank = arr.astype(np.int64)
    k = 1
    idx = np.arange(n)
    while k < n:
        rank2 = rank[(idx + k) % n]
        order = np.lexsort((rank2, rank))
        r = rank[order]
        r2 = rank2[order]
        new = np.empty(n, np.int64)
        changed = np.ones(n, bool)
        changed[1:] = (r[1:] != r[:-1]) | (r2[1:] != r2[:-1])
        new[order] = np.cumsum(changed) - 1
        rank = new
        if rank.max() == n - 1:
            break
        k *= 2
    order = np.argsort(rank, kind="stable")
    last = arr[(order - 1) % n]
    idx0 = int(np.nonzero(order == 0)[0][0])
    return last, idx0


def mtf_np(data: np.ndarray) -> np.ndarray:
    """Serial MTF; fast on BWT output (ranks cluster near 0)."""
    table = list(range(256))
    out = np.empty(len(data), np.uint8)
    lst = data.tolist()
    for i, b in enumerate(lst):
        r = table.index(b)
        out[i] = r
        if r:
            del table[r]
            table.insert(0, b)
    return out


def rle2_np(ranks: np.ndarray) -> np.ndarray:
    """Vectorized RUNA/RUNB zero-run coding (matches rle.rle2_encode)."""
    n = len(ranks)
    z = ranks == 0
    # run starts & lengths
    zi = np.flatnonzero(z)
    if len(zi) == 0:
        return ranks.astype(np.int32) + 1
    starts_mask = np.ones(len(zi), bool)
    starts_mask[1:] = np.diff(zi) > 1
    run_starts = zi[starts_mask]
    run_ends_idx = np.flatnonzero(starts_mask)
    run_lens = np.diff(np.append(run_ends_idx, len(zi)))
    # output tokens in order: walk positions; literals keep order, runs
    # collapse. Build per-position emission then concatenate.
    out = []
    pos = 0
    li = 0  # run index
    lit_val = ranks.astype(np.int32) + 1
    # vectorized stitch: segments between runs are literal slices
    prev_end = 0
    for s, L in zip(run_starts, run_lens):
        if s > prev_end:
            out.append(lit_val[prev_end:s][ranks[prev_end:s] != 0])
        M = int(L) + 1
        k = M.bit_length() - 1
        digits = (M >> np.arange(k)) & 1
        out.append(digits.astype(np.int32))
        prev_end = s + int(L)
    if prev_end < n:
        out.append(lit_val[prev_end:])
    return np.concatenate(out)


def get_stream(size: int) -> np.ndarray:
    os.makedirs(CACHE, exist_ok=True)
    f = os.path.join(CACHE, f"syms_{size}.npy")
    if os.path.exists(f):
        return np.load(f)
    from tpulc.gold.lzp import lzp_encode

    data = np.frombuffer(make_corpus(size), np.uint8)
    lz = lzp_encode(data)
    stage = np.frombuffer(lz, np.uint8) if lz is not None else data
    print(f"lzp: {len(data)} -> {len(stage)}")
    last, idx0 = bwt_rotation_np(stage)
    print("bwt done")
    ranks = mtf_np(last)
    print("mtf done")
    syms = rle2_np(ranks)
    print(f"rle2: {len(ranks)} -> {len(syms)}")
    np.save(f, syms)
    return syms


# ---------------------------------------------------------------------------
# Coder 1: static order-2 rANS (shipped). Entropy + wire accounting.

_CTX_EDGES = (1, 2, 3, 4, 6, 10, 18)


def ctx_class(s):
    c = np.zeros(len(s), np.int32)
    for e in _CTX_EDGES:
        c += s >= e
    return c


def static_order2_cost(syms: np.ndarray) -> float:
    prev = np.concatenate([[0], syms[:-1]])
    prev2 = np.concatenate([[0, 0], syms[:-2]])
    ctx = ctx_class(prev) * 4 + np.minimum(ctx_class(prev2), 3)
    nctx = 32
    bits = 0.0
    table_bytes = 4
    for k in range(nctx):
        sel = syms[ctx == k]
        if len(sel) == 0:
            continue
        hist = np.bincount(sel, minlength=257).astype(np.float64)
        p = hist / hist.sum()
        nz = hist > 0
        bits += -(hist[nz] * np.log2(p[nz])).sum()
        table_bytes += 33 + 2 * int(nz.sum())
    nlanes = -(-len(syms) // CHUNK)
    meta = nlanes * (2 + 4) + (nlanes * 5 + 7) // 8
    return bits / 8 + table_bytes + meta


# ---------------------------------------------------------------------------
# Binary decomposition + adaptive models.
#
# Events per RLE2 symbol s (alphabet 0..256):
#   E0: bit (s == 0)                    ctx: cls(prev) x cls2(prev2)
#   E1: bit (s == 1)        if s > 0    ctx: cls(prev)
#   EXP l: continuation bit if s > 1    ctx: level l x coarse cls(prev)
#   MANT: bits of v+1 below the top bit ctx: (exponent, position)
# where v = s - 2, E = bit_length(v+1), levels 0..E-1 (stop bit at
# E-1 omitted when E-1 == 7: max exponent is known).

def decompose(syms: np.ndarray, rich: bool = False):
    """-> (model_id int32[nbits], bit uint8[nbits], sym_id int32[nbits],
    nmodels int)

    rich=False: E0 c1x4c2 (32), E1 c1 (8), EXP lvl x c1/2 (32),
                MANT (E,pos) (49)  -> 121 models
    rich=True:  E0 c1 x c2 x c3/2 (64), E1 c1 x c2/2 (16), EXP lvl x c1
                (64), MANT same    -> 193 models
    """
    prev = np.concatenate([[0], syms[:-1]])
    prev2 = np.concatenate([[0, 0], syms[:-2]])
    prev3 = np.concatenate([[0, 0, 0], syms[:-3]])
    c1 = ctx_class(prev)
    c2 = np.minimum(ctx_class(prev2), 3)
    c3 = np.minimum(ctx_class(prev3), 1)
    c1c = np.minimum(c1, 3)

    n_e0 = 64 if rich else 32
    n_e1 = 16 if rich else 8
    n_exp = 64 if rich else 32
    n_mant = 49
    nmodels = n_e0 + n_e1 + n_exp + n_mant

    n = len(syms)
    models, bits, owner = [], [], []

    # E0 for every symbol
    if rich:
        models.append(c1 * 8 + c2 * 2 + c3)
    else:
        models.append(c1 * 4 + c2)
    bits.append((syms == 0).astype(np.uint8))
    owner.append(np.arange(n))

    nz = np.flatnonzero(syms > 0)
    if rich:
        models.append(n_e0 + c1[nz] * 2 + np.minimum(c2[nz], 1))
    else:
        models.append(n_e0 + c1[nz])
    bits.append((syms[nz] == 1).astype(np.uint8))
    owner.append(nz)

    big = np.flatnonzero(syms > 1)
    v1 = syms[big] - 1  # v + 1 = s - 2 + 1, in [1, 255]
    E = np.frexp(v1.astype(np.float64))[1].astype(np.int32)  # bit_length
    base_exp = n_e0 + n_e1
    expw = 8 if rich else 4
    for lvl in range(8):
        sel = E > lvl  # symbols still emitting at this level
        if lvl == 7:
            break  # E == 8 implied, no stop bit
        idx = big[sel]
        cont = (E[sel] > lvl + 1).astype(np.uint8)
        ec = c1[idx] if rich else c1c[idx]
        models.append(base_exp + lvl * expw + ec)
        bits.append(cont)
        owner.append(idx)
    base_mant = base_exp + n_exp
    for e in range(2, 9):
        sel = E == e
        idx = big[sel]
        vv = v1[sel]
        for pos in range(e - 1):
            b = ((vv >> (e - 2 - pos)) & 1).astype(np.uint8)
            models.append(np.full(len(idx), base_mant + (e - 2) * 7 + pos))
            bits.append(b)
            owner.append(idx)

    mid = np.concatenate(models).astype(np.int32)
    bb = np.concatenate(bits)
    ow = np.concatenate(owner)
    # order: by owner symbol, then by emission phase. Phase order is the
    # order we appended within a symbol only if we sort stably by owner
    # with a phase key. Build phase ids:
    phase = np.concatenate([
        np.full(len(m), i) for i, m in enumerate(models)
    ])
    o = np.lexsort((phase, ow))
    return mid[o], bb[o], ow[o], nmodels


def adaptive_cost_global(mid, bb, nmodels, rate=5, init=None):
    """Serial global adaptation (libbsc regime) — lockstep over models
    via grouping: process events model-by-model keeps exact per-model
    order (adaptation is per-model, so cross-model order is irrelevant)."""
    total = 0.0
    for m in range(nmodels):
        sel = mid == m
        b = bb[sel].astype(np.float64)
        if len(b) == 0:
            continue
        p = 0.5 if init is None else init[m]
        pr = np.empty(len(b))
        pv = p * SCALE
        bl = bb[sel]
        for i in range(len(b)):
            pr[i] = pv
            if bl[i]:
                pv += (SCALE - pv) / (1 << rate)
            else:
                pv -= pv / (1 << rate)
        pq = np.clip(pr / SCALE, 1 / SCALE, 1 - 1 / SCALE)
        total += -(np.where(b == 1, np.log2(pq), np.log2(1 - pq))).sum()
    return total / 8


def adaptive_cost_lanes(mid, bb, ow, nmodels, rate=5, rate2=None,
                        chunk=CHUNK, static_mix=False):
    """Within-lane adaptation from static inits (the TPU variant).

    Lanes cut the SYMBOL stream every `chunk` symbols; each lane's
    models restart from the block-static init = quantized global rate
    of 1s per model (wired, NMODELS u16).  Lockstep across lanes, like
    the future kernel: step t processes every lane's t-th event."""
    init = np.zeros(nmodels)
    for m in range(nmodels):
        sel = mid == m
        if sel.any():
            init[m] = np.clip(bb[sel].mean(), 1 / SCALE, 1 - 1 / SCALE)
    lane = ow // chunk
    nlanes = int(lane.max()) + 1
    # event index within lane
    order = np.lexsort((np.arange(len(mid)), lane))  # stable by lane
    ml, bl, lnl = mid[order], bb[order], lane[order]
    starts = np.searchsorted(lnl, np.arange(nlanes))
    counts = np.diff(np.append(starts, len(ml)))
    maxbits = int(counts.max())
    # lockstep grids [nlanes, maxbits]
    gm = np.zeros((nlanes, maxbits), np.int32)
    gb = np.zeros((nlanes, maxbits), np.uint8)
    gv = np.arange(maxbits)[None, :] < counts[:, None]
    gm[gv] = ml
    gb[gv] = bl
    p = np.tile(init, (nlanes, 1))
    p2 = np.tile(init, (nlanes, 1))
    rows = np.arange(nlanes)
    total = 0.0
    for t in range(maxbits):
        m = gm[:, t]
        b = gb[:, t].astype(np.float64)
        v = gv[:, t]
        if static_mix:
            pe = (p[rows, m] + init[m]) / 2
        elif rate2:
            pe = (p[rows, m] + p2[rows, m]) / 2
        else:
            pe = p[rows, m]
        pq = np.clip(pe, 1 / SCALE, 1 - 1 / SCALE)
        cost = -np.where(b == 1, np.log2(pq), np.log2(1 - pq))
        total += cost[v].sum()
        upd = np.where(b == 1, (1 - p[rows, m]) / (1 << rate),
                       -p[rows, m] / (1 << rate))
        p[rows, m] = np.where(v, p[rows, m] + upd, p[rows, m])
        if rate2:
            u2 = np.where(b == 1, (1 - p2[rows, m]) / (1 << rate2),
                          -p2[rows, m] / (1 << rate2))
            p2[rows, m] = np.where(v, p2[rows, m] + u2, p2[rows, m])
    meta = nlanes * (2 + 4) + nmodels * 2 + 4
    return total / 8 + meta, maxbits


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=3_569_598)
    ap.add_argument("--quick", action="store_true",
                    help="lane sim on a 1/8 prefix (global sim is slow)")
    args = ap.parse_args()
    syms = get_stream(args.size)
    print(f"stream: {len(syms)} symbols")

    c1 = static_order2_cost(syms)
    print(f"static order-2 rANS (shipped -e1):  {c1:,.0f} B")

    for rich in (False, True):
        mid, bb, ow, nmodels = decompose(syms, rich=rich)
        print(f"[rich={rich}] binary events: {len(bb)} "
              f"({len(bb)/len(syms):.2f}/sym), {nmodels} models")
        for rate in (3, 4, 5):
            lc, mx = adaptive_cost_lanes(mid, bb, ow, nmodels,
                                         rate=rate, chunk=1024,
                                         static_mix=True)
            print(f"  LANES 1024 rate={rate} +staticmix:  "
                  f"{lc:,.0f} B   max bits/lane {mx}")
        lc, mx = adaptive_cost_lanes(mid, bb, ow, nmodels, rate=5,
                                     chunk=1024)
        print(f"  LANES 1024 rate=5 plain:       {lc:,.0f} B")


if __name__ == "__main__":
    main()
