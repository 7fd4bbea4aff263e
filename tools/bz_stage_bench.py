"""Per-stage on-chip attribution for the bz codec.

`_compress_fused` / `_inverse_packed` are single programs, so host
timers cannot see inside them.  This compiles the stages standalone
(same shapes as the 900 KB bench blocks) and times each warm, giving
the breakdown the 20 MB/s roundtrip work needs.

Usage: python tools/bz_stage_bench.py  (on the chip; compiles a few
stage programs on first run — cached afterwards).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    from tpulc.codecs.bwt.driver import _cap_for
    from tpulc.codecs.bwt.rle import rle2_encode, rle2_decode
    from tpulc.codecs.bwt.rotsort import (
        bwt_decode_anchored,
        bwt_encode_anchored,
    )
    from tpulc.primitives.mtf import mtf_decode, mtf_encode

    here = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    with open(os.path.join(here, "tests", "data", "pg1661.txt"), "rb") as f:
        raw = f.read()
    data = (raw * 7)[:3_569_598]
    cap = _cap_for(900_000)
    # block 1 (pure text) and block 2 (contains the long-range repeat)
    blocks = [np.frombuffer(data[:cap], np.uint8),
              np.frombuffer(data[cap: 2 * cap], np.uint8)]

    bwt_j = jax.jit(lambda b: bwt_encode_anchored(b, 1024))
    mtf_j = jax.jit(mtf_encode)
    rle_j = jax.jit(rle2_encode)
    imtf_j = jax.jit(mtf_decode)
    ibwt_j = jax.jit(lambda l, a: bwt_decode_anchored(l, a[0], a, 1024))

    for bi, blk in enumerate(blocks):
        d = jnp.asarray(blk)
        t_bwt = timeit(bwt_j, d)
        last, idx0, anchors, ok = bwt_j(d)
        t_mtf = timeit(mtf_j, last)
        ranks = mtf_j(last)
        t_rle = timeit(rle_j, ranks)
        syms, m = rle_j(ranks)
        t_irle = timeit(jax.jit(rle2_decode), syms, m)
        t_imtf = timeit(imtf_j, ranks)
        t_ibwt = timeit(ibwt_j, last, anchors) if bool(ok) else float("nan")
        print(
            f"block{bi}: bwt {t_bwt*1e3:.1f}ms  mtf {t_mtf*1e3:.1f}ms  "
            f"rle2 {t_rle*1e3:.1f}ms  | irle {t_irle*1e3:.1f}ms  "
            f"imtf {t_imtf*1e3:.1f}ms  ibwt {t_ibwt*1e3:.1f}ms  "
            f"(anchors ok={bool(ok)})", flush=True,
        )


if __name__ == "__main__":
    main()
