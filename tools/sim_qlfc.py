"""Design simulator for a QLFC-class group-run adaptive coder.

Prices the richer decomposition VERDICT r2 asked for (missing #2):
instead of coding the RLE2 digit stream (rans_adaptive's events), code
(rank, run-length) GROUPS of the MTF stream the way libbsc's QLFC does
(`qlfc.cpp:448-752`): rank==1 test + exponent unary + tree-context
mantissa, run==1 test + exponent + tree-context mantissa, with
3-predictor linear mixing (fine-state adaptive, coarse adaptive,
block-static) standing in for libbsc's char/state/static mixers
(per-char models need the recency list, which lane-parallel decode
cannot reproduce — see the module docstring of rans_adaptive.py).

Lanes cut the MTF stream every CHUNK symbols (groups truncate at lane
boundaries; a lane-initial continuation group codes a leading zero-run
with no rank), so decode stays embarrassingly lane-parallel and the
downstream inverse MTF keeps fixed offsets.

Costs are exact information content + wire overheads. Usage:
    python tools/sim_qlfc.py [--size BYTES] [--chunk N]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

from sim_adaptive import (  # noqa: E402
    CACHE, SCALE, bwt_rotation_np, make_corpus, mtf_np,
)


def get_ranks(size: int) -> np.ndarray:
    os.makedirs(CACHE, exist_ok=True)
    f = os.path.join(CACHE, f"ranks_{size}.npy")
    if os.path.exists(f):
        return np.load(f)
    from tpulc.gold.lzp import lzp_encode

    data = np.frombuffer(make_corpus(size), np.uint8)
    lz = lzp_encode(data)
    stage = np.frombuffer(lz, np.uint8) if lz is not None else data
    last, _ = bwt_rotation_np(stage)
    ranks = mtf_np(last)
    np.save(f, ranks)
    return ranks


def _q2(r):
    """rank -> 2-bit class (libbsc's contextRank4 quantizer: min(r,3))."""
    return np.minimum(r, 3)


def build_groups(ranks: np.ndarray, chunk: int):
    """-> dict of per-group arrays (vectorized, lane-aware)."""
    n = len(ranks)
    pos = np.arange(n)
    in_lane_pos = pos % chunk
    start = (ranks != 0) | (in_lane_pos == 0)
    gid = np.cumsum(start) - 1
    g_start = np.flatnonzero(start)
    g_lane = g_start // chunk
    g_r = ranks[g_start].astype(np.int32)          # 0 => continuation
    lane_end = (g_lane + 1) * chunk
    nxt = np.append(g_start[1:], n)
    g_end = np.minimum(nxt, lane_end)
    g_k = (g_end - g_start).astype(np.int32)       # run length, >= 1
    # per-lane group sequence contexts (shift within lane, reset at 0)
    same = np.zeros(len(g_r), bool)
    same[1:] = g_lane[1:] == g_lane[:-1]
    prev_r = np.where(same, np.append(0, g_r[:-1]), 0)
    prev2_r = np.zeros_like(prev_r)
    same2 = np.zeros(len(g_r), bool)
    same2[2:] = g_lane[2:] == g_lane[:-2]
    prev2_r[2:] = np.where(same2[2:], g_r[:-2], 0)
    prev_k = np.where(same, np.append(1, g_k[:-1]), 1)
    prev2_k = np.ones_like(prev_k)
    prev2_k[2:] = np.where(same2[2:], g_k[:-2], 1)
    e_of = np.zeros(len(g_r), np.int32)
    nzp = prev_r > 0
    e_of[nzp] = np.frexp(prev_r[nzp].astype(np.float64))[1] - 1
    return dict(r=g_r, k=g_k, lane=g_lane, start=g_start,
                prev_r=prev_r, prev2_r=prev2_r,
                prev_k=prev_k, prev2_k=prev2_k, prev_e=e_of)


# model id layout (families partition the id space):
#   L0  : 1                      lane-initial continuation bit
#   RT  : cR4(16) x cRun(4) x hE(4)  = 256    rank==1 bit
#   RE  : lvl(7) x cR4c(4)           = 28     exponent unary bits
#   RM  : e(7) x path(<=64)          = 448    mantissa bits
#   UT  : rq(4) x cRun(4) x cR0(8)   = 128    run==1 bit
#   UE  : lvl(10) x rq(4)            = 40     run exponent bits
#   UM  : e(10) x path(<=32)         = 320    run mantissa bits


def decompose_groups(ranks: np.ndarray, chunk: int,
                     mant_cap: int = 64, run_mant_cap: int = 32,
                     wide: bool = False, return_owner: bool = False):
    g = build_groups(ranks, chunk)
    r, k, lane = g["r"], g["k"], g["lane"]
    ng = len(r)
    cR4 = _q2(g["prev_r"]) * 4 + _q2(g["prev2_r"])          # 16
    cRun = (g["prev_k"] < 3).astype(np.int32) * 2 + (
        g["prev2_k"] < 3).astype(np.int32)                   # 4
    hE = np.minimum(g["prev_e"], 3)                          # 4
    hE8 = np.minimum(g["prev_e"], 7)                         # 8
    cR4c = np.minimum(_q2(g["prev_r"]) * 2 +
                      (g["prev2_r"] > 0), 3)                 # 4
    cR0 = ((g["prev_r"] == 1).astype(np.int32) * 4
           + (g["prev2_r"] == 1).astype(np.int32) * 2
           + (g["prev_r"] > 4).astype(np.int32))             # 8
    rq = np.minimum(np.clip(r - 1, 0, None), 2) + (r == 0)   # 0..3

    n_exp_ctx = 16 if wide else 4     # RE secondary context width
    maxek_lay = max(1, int(np.log2(chunk)))   # run exponent levels
    base_L0, n_L0 = 0, 1
    base_RT, n_RT = 1, (512 if wide else 256)
    base_RE, n_RE = base_RT + n_RT, 7 * n_exp_ctx
    base_RM, n_RM = base_RE + n_RE, 7 * mant_cap * (2 if wide else 1)
    base_UT, n_UT = base_RM + n_RM, 128
    base_UE, n_UE = base_UT + n_UT, maxek_lay * 4
    base_UM, n_UM = base_UE + n_UE, maxek_lay * run_mant_cap
    nmodels = base_UM + n_UM

    mids, bits, gown, phase = [], [], [], []
    pc = 0

    def emit(m, b, own):
        nonlocal pc
        mids.append(m.astype(np.int32))
        bits.append(b.astype(np.uint8))
        gown.append(own)
        phase.append(np.full(len(m), pc))
        pc += 1

    is_first = np.zeros(ng, bool)
    is_first[0] = True
    is_first[1:] = lane[1:] != lane[:-1]
    # L0: lane-initial continuation bit
    fidx = np.flatnonzero(is_first)
    emit(np.zeros(len(fidx)), (r[fidx] == 0), fidx)

    coded = np.flatnonzero(r > 0)           # groups that code a rank
    # RT
    if wide:
        emit(base_RT + cR4[coded] * 32 + cRun[coded] * 8 + hE8[coded],
             r[coded] == 1, coded)
    else:
        emit(base_RT + cR4[coded] * 16 + cRun[coded] * 4 + hE[coded],
             r[coded] == 1, coded)
    big = coded[r[coded] > 1]
    rb = r[big]
    E = np.frexp(rb.astype(np.float64))[1].astype(np.int32) - 1  # >=1
    # RE: unary levels 1..E-1 are 1s, stop 0 at E (E<8 => stop exists)
    for lvl in range(1, 8):
        sel = E >= lvl
        if not sel.any():
            break
        idx = big[sel]
        cont = E[sel] > lvl
        if lvl == 7:
            continue  # E==7 max for 8-bit ranks: no stop bit
        ec = cR4[idx] if wide else cR4c[idx]
        emit(base_RE + (lvl - 1) * n_exp_ctx + ec, cont, idx)
    # RM: E mantissa bits, tree-path context (+hE bit when wide)
    for e in range(1, 8):
        sel = E == e
        idx = big[sel]
        if len(idx) == 0:
            continue
        vv = rb[sel]
        path = np.ones(len(idx), np.int32)
        hbit = (hE8[idx] >= 2).astype(np.int32) if wide else 0
        for bitpos in range(e - 1, -1, -1):
            b = (vv >> bitpos) & 1
            mslot = (e - 1) * mant_cap * (2 if wide else 1) \
                + np.minimum(path, mant_cap - 1)
            if wide:
                mslot = mslot + hbit * mant_cap
            emit(base_RM + mslot, b, idx)
            path = np.minimum(path * 2 + b, mant_cap - 1)

    # UT
    emit(base_UT + rq * 32 + cRun * 8 + cR0, k == 1, np.arange(ng))
    bigk = np.flatnonzero(k > 1)
    kb = k[bigk]
    Ek = np.frexp(kb.astype(np.float64))[1].astype(np.int32) - 1
    maxek = max(1, int(np.log2(chunk)))
    for lvl in range(1, maxek + 1):
        sel = Ek >= lvl
        if not sel.any():
            break
        idx = bigk[sel]
        cont = Ek[sel] > lvl
        if lvl == maxek:
            continue
        emit(base_UE + (lvl - 1) * 4 + rq[idx], cont, idx)
    for e in range(1, maxek + 1):
        sel = Ek == e
        idx = bigk[sel]
        if len(idx) == 0:
            continue
        vv = kb[sel]
        path = np.ones(len(idx), np.int32)
        for bitpos in range(e - 1, -1, -1):
            b = (vv >> bitpos) & 1
            emit(base_UM + (e - 1) * run_mant_cap
                 + np.minimum(path, run_mant_cap - 1), b, idx)
            path = np.minimum(path * 2 + b, run_mant_cap - 1)

    mid = np.concatenate(mids)
    bb = np.concatenate(bits)
    ow = np.concatenate(gown)
    ph = np.concatenate(phase)
    o = np.lexsort((ph, ow))  # events grouped by owner, phase-ordered
    fam = np.zeros(nmodels, np.int32)
    for fi, (b0, nn) in enumerate([(base_L0, n_L0), (base_RT, n_RT),
                                   (base_RE, n_RE), (base_RM, n_RM),
                                   (base_UT, n_UT), (base_UE, n_UE),
                                   (base_UM, n_UM)]):
        fam[b0: b0 + nn] = fi
    if return_owner:
        return mid[o], bb[o], g["lane"][ow[o]], nmodels, fam, ow[o]
    return mid[o], bb[o], g["lane"][ow[o]], nmodels, fam


def cost_lanes(mid, bb, lanes, nmodels, fam, coarse_of, rates,
               wmix=(0.5, 0.3, 0.2), chunk=1024):
    """Lockstep lane adaptation with 3-predictor mixing.

    coarse_of: int32[nmodels] mapping each fine model to a coarse one.
    rates: per-family adaptation shift.
    wmix: weights (fine, coarse, static)."""
    nlanes = int(lanes.max()) + 1
    order = np.lexsort((np.arange(len(mid)), lanes))
    ml, bl, lnl = mid[order], bb[order], lanes[order]
    starts = np.searchsorted(lnl, np.arange(nlanes))
    counts = np.diff(np.append(starts, len(ml)))
    maxbits = int(counts.max())
    gm = np.zeros((nlanes, maxbits), np.int32)
    gb = np.zeros((nlanes, maxbits), np.uint8)
    gv = np.arange(maxbits)[None, :] < counts[:, None]
    gm[gv] = ml
    gb[gv] = bl

    init = np.full(nmodels, 0.5)
    ncoarse = int(coarse_of.max()) + 1
    cinit = np.full(ncoarse, 0.5)
    for m in range(nmodels):
        sel = mid == m
        if sel.any():
            init[m] = np.clip(bb[sel].mean(), 1 / SCALE, 1 - 1 / SCALE)
    sums = np.zeros(ncoarse)
    cnts = np.zeros(ncoarse)
    np.add.at(sums, coarse_of[mid], bb)
    np.add.at(cnts, coarse_of[mid], 1)
    nzc = cnts > 0
    cinit[nzc] = np.clip(sums[nzc] / cnts[nzc], 1 / SCALE, 1 - 1 / SCALE)

    p = np.tile(init, (nlanes, 1))
    pc = np.tile(cinit, (nlanes, 1))
    rows = np.arange(nlanes)
    rate_of = rates[fam]
    w0, w1, w2 = wmix
    nfam = int(fam.max()) + 1
    fam_bits = np.zeros(nfam)
    for t in range(maxbits):
        m = gm[:, t]
        b = gb[:, t].astype(np.float64)
        v = gv[:, t]
        cm = coarse_of[m]
        pe = w0 * p[rows, m] + w1 * pc[rows, cm] + w2 * init[m]
        pq = np.clip(pe, 1 / SCALE, 1 - 1 / SCALE)
        cost = -(np.where(b == 1, np.log2(pq), np.log2(1 - pq)))
        np.add.at(fam_bits, fam[m[v]], cost[v])
        rt = rate_of[m].astype(np.float64)
        upd = np.where(b == 1, (1 - p[rows, m]), -p[rows, m]) / (2 ** rt)
        p[rows, m] = np.where(v, p[rows, m] + upd, p[rows, m])
        updc = np.where(b == 1, (1 - pc[rows, cm]),
                        -pc[rows, cm]) / (2 ** (rt + 1))
        pc[rows, cm] = np.where(v, pc[rows, cm] + updc, pc[rows, cm])
    # wire: per-lane (u16 count + u32 state), per-COARSE static inits
    meta = nlanes * 6 + ncoarse * 2 + 8
    total = fam_bits.sum()
    return total / 8 + meta, maxbits, fam_bits / 8


def cost_lanes2(mid, bb, lanes, nmodels, fam, coarse_of, r1, r2,
                w, chunk=1024):
    """Two-speed fine counters (fast r1, slow r2) + coarse + static."""
    nlanes = int(lanes.max()) + 1
    order = np.lexsort((np.arange(len(mid)), lanes))
    ml, bl, lnl = mid[order], bb[order], lanes[order]
    starts = np.searchsorted(lnl, np.arange(nlanes))
    counts = np.diff(np.append(starts, len(ml)))
    maxbits = int(counts.max())
    gm = np.zeros((nlanes, maxbits), np.int32)
    gb = np.zeros((nlanes, maxbits), np.uint8)
    gv = np.arange(maxbits)[None, :] < counts[:, None]
    gm[gv] = ml
    gb[gv] = bl
    init = np.full(nmodels, 0.5)
    for m in range(nmodels):
        sel = mid == m
        if sel.any():
            init[m] = np.clip(bb[sel].mean(), 1 / SCALE, 1 - 1 / SCALE)
    ncoarse = int(coarse_of.max()) + 1
    sums = np.zeros(ncoarse)
    cnts = np.zeros(ncoarse)
    np.add.at(sums, coarse_of[mid], bb)
    np.add.at(cnts, coarse_of[mid], 1)
    cinit = np.full(ncoarse, 0.5)
    nzc = cnts > 0
    cinit[nzc] = np.clip(sums[nzc] / cnts[nzc], 1 / SCALE, 1 - 1 / SCALE)
    pf = np.tile(init, (nlanes, 1))
    ps = np.tile(init, (nlanes, 1))
    pc = np.tile(cinit, (nlanes, 1))
    rows = np.arange(nlanes)
    w0, w1, w2, w3 = w
    nfam = int(fam.max()) + 1
    fam_bits = np.zeros(nfam)
    for t in range(maxbits):
        m = gm[:, t]
        b = gb[:, t].astype(np.float64)
        v = gv[:, t]
        cm = coarse_of[m]
        pe = (w0 * pf[rows, m] + w1 * ps[rows, m]
              + w2 * pc[rows, cm] + w3 * init[m])
        pq = np.clip(pe, 1 / SCALE, 1 - 1 / SCALE)
        cost = -(np.where(b == 1, np.log2(pq), np.log2(1 - pq)))
        np.add.at(fam_bits, fam[m[v]], cost[v])
        for arr, rt in ((pf, r1), (ps, r2)):
            upd = np.where(b == 1, (1 - arr[rows, m]),
                           -arr[rows, m]) / (1 << rt)
            arr[rows, m] = np.where(v, arr[rows, m] + upd, arr[rows, m])
        updc = np.where(b == 1, (1 - pc[rows, cm]),
                        -pc[rows, cm]) / (1 << (r1 + 2))
        pc[rows, cm] = np.where(v, pc[rows, cm] + updc, pc[rows, cm])
    meta = nlanes * 6 + ncoarse * 2 + 8
    return fam_bits.sum() / 8 + meta, maxbits, fam_bits / 8


def cost_global(mid, bb, nmodels, fam, rates):
    """No-restart global adaptation ceiling (per-model grouping)."""
    nfam = int(fam.max()) + 1
    fam_bits = np.zeros(nfam)
    for m in range(nmodels):
        sel = mid == m
        bl = bb[sel]
        if len(bl) == 0:
            continue
        rate = int(rates[fam[m]])
        pv = np.clip(bl.mean(), 1 / SCALE, 1 - 1 / SCALE)
        prs = np.empty(len(bl))
        for i in range(len(bl)):
            prs[i] = pv
            if bl[i]:
                pv += (1 - pv) / (1 << rate)
            else:
                pv -= pv / (1 << rate)
        pq = np.clip(prs, 1 / SCALE, 1 - 1 / SCALE)
        fam_bits[fam[m]] += -(np.where(bl == 1, np.log2(pq),
                                       np.log2(1 - pq))).sum()
    return fam_bits.sum() / 8, fam_bits / 8


def coarse_map(nmodels, fam, mant_cap=64, run_mant_cap=32):
    """Medium-context coarse models: strip the finest context dimension
    per family instead of collapsing to the family id."""
    base_RT = 1
    base_RE = base_RT + 256
    base_RM = base_RE + 28
    base_UT = base_RM + 7 * mant_cap
    base_UE = base_UT + 128
    base_UM = base_UE + 40
    out = np.zeros(nmodels, np.int32)
    nxt = 0

    def alloc(k):
        nonlocal nxt
        b = nxt
        nxt += k
        return b

    cL0 = alloc(1)
    out[0] = cL0
    cRT = alloc(16)     # keep cR4 only
    ids = np.arange(256)
    out[base_RT: base_RE] = cRT + ids // 16
    cRE = alloc(7)      # keep lvl only
    out[base_RE: base_RM] = cRE + np.arange(28) // 4
    cRM = alloc(7 * 8)  # (e, top-3 path bits)
    ids = np.arange(7 * mant_cap)
    e = ids // mant_cap
    path = ids % mant_cap
    pc = np.where(path >= 8, path // (mant_cap // 8), path)
    out[base_RM: base_UT] = cRM + e * 8 + np.minimum(pc, 7)
    cUT = alloc(32)     # rq x cRun
    ids = np.arange(128)
    out[base_UT: base_UE] = cUT + ids // 4
    cUE = alloc(10)
    out[base_UE: base_UM] = cUE + np.arange(40) // 4
    cUM = alloc(10 * 4)
    ids = np.arange(10 * run_mant_cap)
    e = ids // run_mant_cap
    path = ids % run_mant_cap
    out[base_UM:] = cUM + e * 4 + np.minimum(path, 3)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=3_569_598)
    ap.add_argument("--chunk", type=int, default=1024)
    ap.add_argument("--exp", default="grid")
    args = ap.parse_args()
    ranks = get_ranks(args.size)
    print(f"mtf stream: {len(ranks)} symbols, "
          f"{(ranks != 0).mean():.3f} nonzero")
    fam_names = ["L0", "RT", "RE", "RM", "UT", "UE", "UM"]
    mid, bb, lanes, nmodels, fam = decompose_groups(ranks, args.chunk)
    coarse_of = fam.copy()
    for r1, r2, w in [(3, 6, (0.35, 0.25, 0.2, 0.2)),
                      (3, 6, (0.4, 0.3, 0.15, 0.15)),
                      (2, 5, (0.35, 0.25, 0.2, 0.2)),
                      (3, 7, (0.3, 0.3, 0.2, 0.2))]:
        c, mx, fb = cost_lanes2(mid, bb, lanes, nmodels, fam,
                                coarse_of, r1, r2, w, args.chunk)
        print(f"2speed r=({r1},{r2}) w={w}: {c:,.0f} B")
        for nm, v in zip(fam_names, fb):
            print(f"   {nm}: {v:10,.0f} B")


if __name__ == "__main__":
    main()
