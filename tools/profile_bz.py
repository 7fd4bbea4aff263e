"""Per-stage on-chip attribution for the bz fused programs.

Compiles cumulative prefixes of the `_compress_fused` / `_inverse_packed`
pipelines (each reduced to a scalar so output shape doesn't skew
timing) and reports consecutive differences — the stage table VERDICT
r2 asked for (weak #3: "optimization is flying blind").

Usage: python tools/profile_bz.py [block_bytes]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpulc.codecs.bwt import driver as bz  # noqa: E402
from tpulc.codecs.bwt.driver import (  # noqa: E402
    ALPHABET, ANCHOR_STRIDE, CHUNK_SYMS, MAX_LEN, _entropy_mt_core,
    _forward,
)
from tpulc.codecs.bwt.rle import rle2_decode  # noqa: E402
from tpulc.codecs.bwt.rotsort import (  # noqa: E402
    bwt_decode_anchored,
    bwt_encode_anchored,
)
from tpulc.primitives.mtf import mtf_decode, mtf_encode  # noqa: E402


def timed(fn, *args, n=4):
    r = fn(*args)
    float(np.asarray(r).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        r = fn(*args)
    float(np.asarray(r).ravel()[0])
    return (time.perf_counter() - t0) / n


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 900_000
    from bench import make_corpus

    data = np.frombuffer(make_corpus(size), np.uint8)
    cap = bz._cap_for(size)
    padded = np.zeros(cap, np.uint8)
    padded[:size] = data
    blk = jnp.asarray(padded)

    K = 6  # matches _encode_payloads' compiled refinement
    out_words = -(-cap * MAX_LEN // 32)
    nchunks = max(1, -(-cap // CHUNK_SYMS))
    R = -(-cap // ANCHOR_STRIDE)

    # ---- compress stages (cumulative prefixes) ----
    @jax.jit
    def s1_bwt(b):
        last, idx0, anchors, ok = bwt_encode_anchored(b, ANCHOR_STRIDE)
        return last.astype(jnp.int32).sum() + idx0

    @jax.jit
    def s2_mtf(b):
        last, idx0, anchors, ok = bwt_encode_anchored(b, ANCHOR_STRIDE)
        return mtf_encode(last).astype(jnp.int32).sum() + idx0

    @jax.jit
    def s3_fwd(b):
        syms, m, idx0, hist, anchors, ok = _forward(b)
        return syms.sum() + m + hist.sum()

    @jax.jit
    def s4_tables(b):
        from tpulc.codecs.bwt.multitable import refine_tables
        from tpulc.codecs.huffman.device_tables import (
            canonical_codes_device,
            package_merge_lengths_device,
        )

        syms, m, idx0, hist, anchors, ok = _forward(b)
        sel, clhist = refine_tables(syms, m, CHUNK_SYMS, K)
        lens_mt = jax.vmap(
            lambda h: package_merge_lengths_device(h, MAX_LEN)
        )(clhist)
        lens_single = package_merge_lengths_device(clhist.sum(0), MAX_LEN)
        codes, _ = jax.vmap(
            lambda ln: canonical_codes_device(ln, MAX_LEN)
        )(lens_mt)
        return codes.sum() + lens_single.sum() + sel.sum()

    def s5_full(b):
        meta, words = bz._compress_fused(b, R, K, out_words, nchunks)
        return meta[:1]

    names = ["bwt", "+mtf", "+rle2/hist", "+tables", "full(+entropy)"]
    fns = [s1_bwt, s2_mtf, s3_fwd, s4_tables, s5_full]
    times = []
    for nm, f in zip(names, fns):
        t = timed(f, blk)
        times.append(t)
        print(f"compress {nm:16s} cumulative {t*1e3:8.1f} ms")
    print("-- per-stage diffs --")
    prev = 0.0
    for nm, t in zip(names, times):
        print(f"compress {nm:16s} {'%8.1f' % ((t - prev) * 1e3)} ms")
        prev = t

    # ---- inverse stages (packed row exactly as the driver builds it) ----
    payload = bz.compress_block(data, size)
    out_words2 = -(-cap * MAX_LEN // 32)
    ccap = max(1, -(-cap // CHUNK_SYMS))
    n_anch = -(-cap // ANCHOR_STRIDE)
    sc = -(-ccap // 4)
    (n, m, idx0, tb, lengths, sel, bit_offsets, anchors, words) = \
        bz._parse_block(payload)
    Kp = lengths.shape[0]
    w_pad = bz._bucket_words(max(-(-tb // 32), 1), out_words2)
    width = 4 + Kp * 65 + sc + ccap + n_anch + w_pad
    arr = np.zeros(width, np.uint32)
    arr[0], arr[1], arr[2], arr[3] = tb, m, idx0, 1
    o = 4
    for k in range(Kp):
        lens_pad = np.zeros(260, np.uint8)
        lens_pad[:ALPHABET] = lengths[k].astype(np.uint8)
        arr[o + k * 65: o + (k + 1) * 65] = lens_pad.view("<u4")
    o += Kp * 65
    if sel is not None:
        sel_pad = np.zeros(sc * 4, np.uint8)
        sel_pad[: sel.shape[0]] = sel
        arr[o: o + sc] = sel_pad.view("<u4")
    o += sc
    arr[o: o + ccap] = tb
    arr[o: o + bit_offsets.shape[0]] = bit_offsets.astype(np.uint32)
    o += ccap
    arr[o: o + n_anch] = anchors.astype(np.uint32)
    o += n_anch
    arr[o: o + words.shape[0]] = words
    row = jnp.asarray(arr)

    def _syms_from_row(row):
        """Replicates _inverse_packed's entropy-decode stage."""
        from tpulc.codecs.huffman.device_tables import (
            canonical_decode_params, canonical_lut_packed,
        )

        total_bits = row[0].astype(jnp.int32)
        o = 4
        lens_u8 = jax.lax.bitcast_convert_type(
            row[o: o + Kp * 65], jnp.uint8
        ).reshape(Kp, 260)
        lengths_d = lens_u8[:, :ALPHABET].astype(jnp.int32)
        o += Kp * 65
        sel_d = jax.lax.bitcast_convert_type(
            row[o: o + sc], jnp.uint8
        ).reshape(-1)[:ccap].astype(jnp.int32)
        o += sc
        offs = row[o: o + ccap].astype(jnp.int32)
        o += ccap
        anchors_d = row[o: o + n_anch].astype(jnp.int32)
        o += n_anch
        words_d = row[o: o + w_pad]
        if bz._PALLAS_DECODE:
            from tpulc.codecs.huffman.pallas_decode import (
                decode_canonical_indices,
            )

            lim_k, base_k, ss_k = jax.vmap(
                lambda ln: canonical_decode_params(ln, MAX_LEN)
            )(lengths_d)
            lim_chunk = jnp.take(lim_k, sel_d, axis=0)
            base_chunk = jnp.take(base_k, sel_d, axis=0)
            words_pp = jnp.concatenate(
                [words_d, jnp.zeros((2,), jnp.uint32)])
            ci = decode_canonical_indices(
                words_pp, offs, total_bits, lim_chunk, base_chunk,
                CHUNK_SYMS, MAX_LEN,
            )
            flat = jnp.clip(ci.reshape(-1)[:cap], 0, ALPHABET - 1)
            oh = jax.nn.one_hot(flat, ALPHABET, dtype=jnp.float32)
            per_k = jnp.matmul(
                oh, ss_k.astype(jnp.float32).T,
                precision=jax.lax.Precision.HIGHEST,
            ).astype(jnp.int32)
            ctx = jnp.broadcast_to(
                sel_d[: cap // CHUNK_SYMS, None],
                (cap // CHUNK_SYMS, CHUNK_SYMS),
            ).reshape(cap)
            syms = jnp.zeros((cap,), jnp.int32)
            for k in range(Kp):
                syms = jnp.where(ctx == k, per_k[:, k], syms)
        else:
            from tpulc.codecs.huffman.decode import (
                huffman_decode_uniform_packed,
            )

            luts = jax.vmap(
                lambda ln: canonical_lut_packed(ln, MAX_LEN)
            )(lengths_d)
            syms = huffman_decode_uniform_packed(
                words_d, total_bits, cap, luts.reshape(-1), MAX_LEN,
                offs, CHUNK_SYMS, out_dtype=jnp.int32,
                lut_base=None if Kp == 1 else (sel_d << MAX_LEN),
            )
        return syms, row[1].astype(jnp.int32), anchors_d

    @jax.jit
    def i1_entropy(row):
        syms, m_d, _ = _syms_from_row(row)
        return syms.sum() + m_d

    @jax.jit
    def i2_rle2(row):
        syms, m_d, _ = _syms_from_row(row)
        ranks, _ = rle2_decode(syms, m_d)
        return ranks.sum()

    @jax.jit
    def i3_mtf(row):
        syms, m_d, _ = _syms_from_row(row)
        ranks, _ = rle2_decode(syms, m_d)
        return mtf_decode(ranks).astype(jnp.int32).sum()

    @jax.jit
    def i4_full(row):
        syms, m_d, anchors_d = _syms_from_row(row)
        ranks, _ = rle2_decode(syms, m_d)
        last = mtf_decode(ranks)
        out = bwt_decode_anchored(last, anchors_d[0], anchors_d,
                                  ANCHOR_STRIDE)
        return out.astype(jnp.int32).sum()

    inames = ["entropy", "+rle2", "+mtf", "full(+ibwt)"]
    ifns = [i1_entropy, i2_rle2, i3_mtf, i4_full]
    itimes = []
    for nm, f in zip(inames, ifns):
        tt = timed(f, row)
        itimes.append(tt)
        print(f"inverse  {nm:16s} cumulative {tt*1e3:8.1f} ms")
    print("-- per-stage diffs --")
    prev = 0.0
    for nm, tt in zip(inames, itimes):
        print(f"inverse  {nm:16s} {'%8.1f' % ((tt - prev) * 1e3)} ms")
        prev = tt


if __name__ == "__main__":
    main()
