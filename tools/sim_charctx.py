"""Price LANE-LOCAL MTF + libbsc-style per-char models (VERDICT r4 #4).

Round 3 claimed libbsc's per-char models (`qlfc_model.h:183-187`) are
"structurally unavailable to lane-parallel decode".  That was wrong:
libbsc's DECODER indexes every CharModel with `currentChar =
MTFTable[0]` — the PREVIOUS run's char (`qlfc.cpp:825,830`), which is
known before the rank bit is decoded.  The only thing a lane-parallel
decoder lacks is the recency table itself — and that is fixable by
making MTF LANE-LOCAL: each 1024-symbol lane runs its own 256-entry
recency list seeded from a wired global-frequency order, so the FSM
can maintain table/rankHistory/runHistory per lane and index per-char
models exactly the way libbsc does.

This simulator prices the two design questions:
  A. lane-local MTF vs global MTF under the CURRENT grc model set
     (how much does losing cross-lane recency cost?), and
  B. lane-local MTF + per-char models + char histories
     (how much does the libbsc model structure buy back?).

Costs are exact information content of adaptively-mixed binary events
(the same methodology as sim_qlfc.py, whose grc estimate was 165.5 KB
vs the shipped 167.7 KB).  Reference anchors on this corpus: libbsc
159,230 B; grc -e2 ships 167,749 B.

Usage: python tools/sim_charctx.py [--size BYTES] [--chunk N]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))

from sim_adaptive import CACHE, SCALE  # noqa: E402
from sim_qlfc import decompose_groups, cost_lanes2, get_ranks  # noqa: E402


def get_last(size: int) -> np.ndarray:
    """BWT last column (post-LZP) — inverse global MTF of the cached
    rank stream."""
    f = os.path.join(CACHE, f"last_{size}.npy")
    if os.path.exists(f):
        return np.load(f)
    ranks = get_ranks(size)
    table = list(range(256))
    out = np.empty(len(ranks), np.uint8)
    for i, r in enumerate(ranks):
        s = table.pop(int(r))
        out[i] = s
        table.insert(0, s)
    np.save(f, out)
    return out


def local_mtf(last: np.ndarray, chunk: int, init_table: np.ndarray):
    """Per-lane MTF with a wired initial table.  Lockstep across lanes.
    -> ranks int32[n]."""
    n = len(last)
    L = -(-n // chunk)
    syms = np.zeros((L, chunk), np.int64)
    syms.reshape(-1)[:n] = last
    tables = np.tile(init_table.astype(np.int64), (L, 1))
    pos = np.arange(256)[None, :]
    ranks = np.zeros((L, chunk), np.int64)
    for j in range(chunk):
        col = syms[:, j][:, None]
        r = np.argmax(tables == col, axis=1)
        ranks[:, j] = r
        shift = r[:, None] >= pos  # positions 0..r shift right
        shifted = np.concatenate([col, tables[:, :-1]], axis=1)
        tables = np.where(pos <= r[:, None], shifted, tables)
    return ranks.reshape(-1)[:n].astype(np.int32)


# ---------------------------------------------------------------------
# B: per-char model pricing.
# Event decomposition identical to grc (rank side RT/RE/RM, run side
# UT/UE/UM, L0 continuation), but each event also carries:
#   c0    = previous group's char in the lane (wired table order first)
#   hR    = rankHistory[c0] (last rank-exponent coded for c0, 0..7)
#   hU    = runHistory[c0]
# and the probability is a 4-way mix: fine state model (grc contexts),
# per-char model, per-(char,history) refinement, block-static init.
# ---------------------------------------------------------------------


def build_group_charctx(last, ranks, chunk, init_table):
    """Per-group char contexts: c0 (prev group char), hR, hU."""
    n = len(ranks)
    pos = np.arange(n)
    in_lane = pos % chunk
    start = (ranks != 0) | (in_lane == 0)
    g_start = np.flatnonzero(start)
    g_lane = g_start // chunk
    g_char = last[g_start].astype(np.int32)
    ng = len(g_start)
    # prev group char within lane (wired front char for lane-initial)
    c0 = np.full(ng, int(init_table[0]), np.int32)
    same = np.zeros(ng, bool)
    same[1:] = g_lane[1:] == g_lane[:-1]
    c0[1:][same[1:]] = g_char[:-1][same[1:]]
    # rank/run histories per (lane, char): serial per lane over groups,
    # vectorized across lanes at the group-slot level
    order = np.lexsort((g_start, g_lane))  # already sorted, but explicit
    nlanes = int(g_lane.max()) + 1
    gi_in_lane = np.zeros(ng, np.int64)
    gi_in_lane[1:] = np.where(same[1:], 1, 0)
    gi_in_lane = np.cumsum(gi_in_lane) * 0  # placeholder (unused)
    # histories keyed on the CURRENT group's char (libbsc updates
    # rankHistory[currentChar] after coding its exponent)
    hR = np.zeros(ng, np.int32)
    hU = np.zeros(ng, np.int32)
    rank_hist = np.zeros((nlanes, 256), np.int32)
    run_hist = np.zeros((nlanes, 256), np.int32)
    # iterate groups lane-lockstep: slot index within lane
    slot = np.zeros(ng, np.int64)
    slot[1:] = np.where(same[1:], 1, 0)
    slot = np.cumsum(slot)
    reset = np.flatnonzero(~same)
    base = np.zeros(ng, np.int64)
    base[reset] = slot[reset]
    np.maximum.accumulate(base, out=base)
    slot = slot - base
    max_slots = int(slot.max()) + 1
    r_e = np.zeros(ng, np.int32)
    nz = ranks[g_start] > 0
    r_e[nz] = np.frexp(np.maximum(ranks[g_start][nz], 1).astype(
        np.float64))[1] - 1
    lane_end = (g_lane + 1) * chunk
    nxt = np.append(g_start[1:], n)
    g_k = np.minimum(nxt, lane_end) - g_start
    k_e = np.frexp(np.maximum(g_k, 1).astype(np.float64))[1] - 1
    for s in range(max_slots):
        sel = np.flatnonzero(slot == s)
        ln, ch = g_lane[sel], g_char[sel]
        # history OF THE CONTEXT CHAR c0 (read before update)
        hR[sel] = rank_hist[ln, c0[sel]]
        hU[sel] = run_hist[ln, c0[sel]]
        rank_hist[ln, ch] = r_e[sel]
        run_hist[ln, ch] = np.minimum(k_e[sel], 7)
    return g_char, c0, np.minimum(hR, 7), np.minimum(hU, 7)


def cost_char_mix(mid, bb, lanes, gown_char_ctx, nmodels, fam,
                  w, r_f=4, r_c=4, chunk=1024):
    """4-way mix: fine state model + per-(char ctx) model per family +
    per-(char,history-bucket) + static init.  gown_char_ctx: per-event
    (c0, hR|hU bucket) int32 pairs."""
    c0, hbuck = gown_char_ctx
    nlanes = int(lanes.max()) + 1
    order = np.lexsort((np.arange(len(mid)), lanes))
    ml, bl, lnl = mid[order], bb[order], lanes[order]
    c0l, hbl = c0[order], hbuck[order]
    fm = fam[ml]
    starts = np.searchsorted(lnl, np.arange(nlanes))
    counts = np.diff(np.append(starts, len(ml)))
    maxbits = int(counts.max())
    gm = np.zeros((nlanes, maxbits), np.int32)
    gb = np.zeros((nlanes, maxbits), np.uint8)
    gc = np.zeros((nlanes, maxbits), np.int32)
    gh = np.zeros((nlanes, maxbits), np.int32)
    gf = np.zeros((nlanes, maxbits), np.int32)
    gv = np.arange(maxbits)[None, :] < counts[:, None]
    gm[gv], gb[gv], gc[gv], gh[gv], gf[gv] = ml, bl, c0l, hbl, fm

    init = np.full(nmodels, 0.5)
    for m in range(nmodels):
        sel = mid == m
        if sel.any():
            init[m] = np.clip(bb[sel].mean(), 1 / SCALE, 1 - 1 / SCALE)
    nfam = int(fam.max()) + 1
    # per-lane adaptive states: dual-rate fine (as the shipping grc's
    # best sim config) + per-char + per-(char,history) + static
    p_f = np.tile(init, (nlanes, 1))
    p_s = np.tile(init, (nlanes, 1))
    p_char = np.full((nlanes, nfam * 256), 0.5)
    p_charh = np.full((nlanes, nfam * 256 * 8), 0.5)
    rows = np.arange(nlanes)
    w0, w1, w2, w3, w4 = w
    fam_bits = np.zeros(nfam)
    for t in range(maxbits):
        m = gm[:, t]
        b = gb[:, t].astype(np.float64)
        v = gv[:, t]
        cix = gf[:, t] * 256 + gc[:, t]
        chix = cix * 8 + gh[:, t]
        pe = (w0 * p_f[rows, m] + w1 * p_s[rows, m]
              + w2 * p_char[rows, cix] + w3 * p_charh[rows, chix]
              + w4 * init[m])
        pq = np.clip(pe, 1 / SCALE, 1 - 1 / SCALE)
        cost = -(np.where(b == 1, np.log2(pq), np.log2(1 - pq)))
        np.add.at(fam_bits, gf[:, t][v], cost[v])
        for arr, ix, rt in ((p_f, m, 3), (p_s, m, 6),
                            (p_char, cix, r_c),
                            (p_charh, chix, r_c + 1)):
            upd = np.where(b == 1, 1 - arr[rows, ix],
                           -arr[rows, ix]) / (1 << rt)
            arr[rows, ix] = np.where(v, arr[rows, ix] + upd,
                                     arr[rows, ix])
    nlanes_used = nlanes
    meta = nlanes_used * 6 + 256 + 8  # + wired table order
    return fam_bits.sum() / 8 + meta, maxbits, fam_bits / 8


def cost_adaptive_mixer(mid, bb, lanes, ev_c0, nmodels, fam,
                        per_char: bool, lr=0.02, chunk=1024):
    """Experiment C: libbsc-style ADAPTIVE MIXER — the 4 predictors
    (fast fine, slow fine, per-char, static) are combined with
    per-context LEARNED weights (gradient of log-loss on the linear
    mix), per (family) or per (family, char ctx) like
    `model->mixerOfRank[currentChar]` (qlfc.cpp:833)."""
    nlanes = int(lanes.max()) + 1
    order = np.lexsort((np.arange(len(mid)), lanes))
    ml, bl, lnl = mid[order], bb[order], lanes[order]
    c0l = ev_c0[order]
    fm = fam[ml]
    starts = np.searchsorted(lnl, np.arange(nlanes))
    counts = np.diff(np.append(starts, len(ml)))
    maxbits = int(counts.max())
    gm = np.zeros((nlanes, maxbits), np.int32)
    gb = np.zeros((nlanes, maxbits), np.uint8)
    gc = np.zeros((nlanes, maxbits), np.int32)
    gf = np.zeros((nlanes, maxbits), np.int32)
    gv = np.arange(maxbits)[None, :] < counts[:, None]
    gm[gv], gb[gv], gc[gv], gf[gv] = ml, bl, c0l, fm

    init = np.full(nmodels, 0.5)
    for m in range(nmodels):
        sel = mid == m
        if sel.any():
            init[m] = np.clip(bb[sel].mean(), 1 / SCALE, 1 - 1 / SCALE)
    nfam = int(fam.max()) + 1
    p_f = np.tile(init, (nlanes, 1))
    p_s = np.tile(init, (nlanes, 1))
    p_char = np.full((nlanes, nfam * 256), 0.5)
    rows = np.arange(nlanes)
    nmix = nfam * 256 if per_char else nfam
    W = np.tile(np.array([0.35, 0.25, 0.2, 0.2]), (nlanes, nmix, 1))
    fam_bits = np.zeros(nfam)
    for t in range(maxbits):
        m = gm[:, t]
        b = gb[:, t].astype(np.float64)
        v = gv[:, t]
        cix = gf[:, t] * 256 + gc[:, t]
        mixix = cix if per_char else gf[:, t]
        preds = np.stack([p_f[rows, m], p_s[rows, m],
                          p_char[rows, cix], init[m]], axis=1)
        ww = W[rows, mixix]                       # [nlanes, 4]
        pe = np.einsum("lk,lk->l", ww, preds)
        pq = np.clip(pe, 1 / SCALE, 1 - 1 / SCALE)
        cost = -(np.where(b == 1, np.log2(pq), np.log2(1 - pq)))
        np.add.at(fam_bits, gf[:, t][v], cost[v])
        # gradient step on log loss wrt linear-mix weights
        g = (pq - b) / np.maximum(pq * (1 - pq), 1e-4)
        ww2 = ww - lr * g[:, None] * preds
        ww2 = np.clip(ww2, 0.0, 1.5)
        s = ww2.sum(axis=1, keepdims=True)
        ww2 = ww2 / np.maximum(s, 1e-6)
        W[rows, mixix] = np.where(v[:, None], ww2, ww)
        for arr, ix, rt in ((p_f, m, 3), (p_s, m, 6), (p_char, cix, 4)):
            upd = np.where(b == 1, 1 - arr[rows, ix],
                           -arr[rows, ix]) / (1 << rt)
            arr[rows, ix] = np.where(v, arr[rows, ix] + upd,
                                     arr[rows, ix])
    meta = nlanes * 6 + 256 + 8
    return fam_bits.sum() / 8 + meta, maxbits, fam_bits / 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=3_569_598)
    ap.add_argument("--chunk", type=int, default=1024)
    args = ap.parse_args()
    chunk = args.chunk
    gl_ranks = get_ranks(args.size).astype(np.int32)
    last = get_last(args.size)
    n = len(last)
    freq_order = np.argsort(-np.bincount(last, minlength=256),
                            kind="stable").astype(np.uint8)
    print(f"stream {n} syms; global-MTF nonzero "
          f"{(gl_ranks != 0).mean():.3f}")
    lo_ranks = local_mtf(last, chunk, freq_order)
    print(f"local-MTF nonzero {(lo_ranks != 0).mean():.3f}")

    fam_names = ["L0", "RT", "RE", "RM", "UT", "UE", "UM"]
    results = {}
    for name, rks, wd in (("global", gl_ranks, False),
                          ("local", lo_ranks, False),
                          ("global-wide", gl_ranks, True),
                          ("local-wide", lo_ranks, True)):
        mid, bb, lanes, nmodels, fam = decompose_groups(rks, chunk,
                                                        wide=wd)
        c, mx, fb = cost_lanes2(mid, bb, lanes, nmodels, fam,
                                fam.copy(), 3, 6,
                                (0.35, 0.25, 0.2, 0.2), chunk)
        results[name] = c
        print(f"A[{name}] grc-models: {c:,.0f} B (maxbits {mx})")
        for nm, v in zip(fam_names, fb):
            print(f"   {nm}: {v:10,.0f} B")

    # B: local ranks + per-char models (libbsc CharModel structure:
    # ctx char = previous group's char, qlfc.cpp:825)
    mid, bb, lanes, nmodels, fam, owner = decompose_groups(
        lo_ranks, chunk, return_owner=True)
    g_char, c0, hR, hU = build_group_charctx(last, lo_ranks, chunk,
                                             freq_order)
    ev_c0 = c0[owner]
    # rank-side events take the rank history, run-side the run history
    is_run_side = fam[mid] >= 4
    ev_h = np.where(is_run_side, hU[owner], hR[owner])
    for w, rc in [((0.35, 0.25, 0.15, 0.05, 0.20), 4)]:
        c, mx, fb = cost_char_mix(mid, bb, lanes, (ev_c0, ev_h),
                                  nmodels, fam, w, r_c=rc, chunk=chunk)
        print(f"B[local+char] w={w} rc={rc}: {c:,.0f} B")
    for per_char, lr in [(False, 0.02), (False, 0.05), (True, 0.02),
                         (True, 0.05), (True, 0.1)]:
        c, mx, fb = cost_adaptive_mixer(mid, bb, lanes, ev_c0,
                                        nmodels, fam, per_char, lr,
                                        chunk)
        print(f"C[mixer per_char={per_char} lr={lr}]: {c:,.0f} B")
        for nm, v in zip(fam_names, fb):
            print(f"   {nm}: {v:10,.0f} B")


if __name__ == "__main__" and not (len(sys.argv) > 1
                                        and sys.argv[1] == "extra"):
    main()


def cost_wired_rates(mid, bb, lanes, nmodels, fam, chunk=1024):
    """Experiment D: per-model WIRED dual adaptation rates — the
    encoder measures each model's events and wires the best (r1, r2)
    pair from a small menu (libbsc's trained per-context constants,
    tables.h, made data-driven).  Wire cost: 3 bits per used model."""
    menu = [(2, 5), (3, 6), (4, 7), (5, 8)]
    nlanes = int(lanes.max()) + 1
    order = np.lexsort((np.arange(len(mid)), lanes))
    ml, bl, lnl = mid[order], bb[order], lanes[order]
    starts = np.searchsorted(lnl, np.arange(nlanes))
    counts = np.diff(np.append(starts, len(ml)))
    maxbits = int(counts.max())
    gm = np.zeros((nlanes, maxbits), np.int32)
    gb = np.zeros((nlanes, maxbits), np.uint8)
    gv = np.arange(maxbits)[None, :] < counts[:, None]
    gm[gv], gb[gv] = ml, bl
    init = np.full(nmodels, 0.5)
    for m in range(nmodels):
        sel = mid == m
        if sel.any():
            init[m] = np.clip(bb[sel].mean(), 1 / SCALE, 1 - 1 / SCALE)
    nfam = int(fam.max()) + 1
    rows = np.arange(nlanes)
    # per-model costs under each menu entry, one lockstep pass per menu
    per_model_cost = np.zeros((len(menu), nmodels))
    for mi, (r1, r2) in enumerate(menu):
        p_f = np.tile(init, (nlanes, 1))
        p_s = np.tile(init, (nlanes, 1))
        for t in range(maxbits):
            m = gm[:, t]
            b = gb[:, t].astype(np.float64)
            v = gv[:, t]
            pe = (0.45 * p_f[rows, m] + 0.3 * p_s[rows, m]
                  + 0.25 * init[m])
            pq = np.clip(pe, 1 / SCALE, 1 - 1 / SCALE)
            cost = -(np.where(b == 1, np.log2(pq), np.log2(1 - pq)))
            np.add.at(per_model_cost[mi], m[v], cost[v])
            for arr, rt in ((p_f, r1), (p_s, r2)):
                upd = np.where(b == 1, 1 - arr[rows, m],
                               -arr[rows, m]) / (1 << rt)
                arr[rows, m] = np.where(v, arr[rows, m] + upd,
                                        arr[rows, m])
    best = per_model_cost.min(axis=0)
    used = np.zeros(nmodels, bool)
    used[np.unique(mid)] = True
    total = best[used].sum() / 8
    meta = nlanes * 6 + 8 + (used.sum() * 3) / 8 + 256
    fixed = per_model_cost[1][used].sum() / 8  # the (3,6) baseline
    return total + meta, fixed + meta


def main_extra():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=3_569_598)
    args = ap.parse_args(sys.argv[2:])
    gl_ranks = get_ranks(args.size).astype(np.int32)
    for chunk in (1024, 2048, 4096):
        mid, bb, lanes, nmodels, fam = decompose_groups(gl_ranks, chunk)
        c, mx, fb = cost_lanes2(mid, bb, lanes, nmodels, fam,
                                fam.copy(), 3, 6,
                                (0.35, 0.25, 0.2, 0.2), chunk)
        print(f"E[global chunk={chunk}]: {c:,.0f} B (maxbits {mx})")
    mid, bb, lanes, nmodels, fam = decompose_groups(gl_ranks, 1024)
    d, dfix = cost_wired_rates(mid, bb, lanes, nmodels, fam, 1024)
    print(f"D[wired rates]: {d:,.0f} B (same-pass fixed-rate "
          f"baseline {dfix:,.0f} B)")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "extra":
    main_extra()
    sys.exit(0)
