"""dc3_device vs rotsort A/B at the bz production shape (VERDICT r3 #7).

`primitives/dc3_device.py` is the survey's "hardest kernel"
(`sa_app.cu:125-365`) but was islanded: imported only by a unit test.
This tool gives it (or denies it) a production consumer on evidence:
it times, on the real chip at the bz block shape (900 KB):

  A. the production sorter: `rotsort.bwt_encode_anchored` (rank-
     refinement full-rotation sort, what `_compress_fused` runs), and
  B. the DC3 path: `dc3_device.suffix_array_dc3` + `suffix.sa_to_bwt`
     (cudpp's own structure, `compress_app.cu` BWT via SA),

on the bench corpus's first block, correctness-checked (DC3's SA vs
the naive gold on a 64 KB slice; both paths round-trip by
construction elsewhere).  Appends the verdict to DC3_AB_r4.json.

Usage: python tools/chip_dc3_ab.py [block_bytes]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def med(f, reps=5):
    import jax

    jax.block_until_ready(f())
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f())
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 900_000
    import jax
    import jax.numpy as jnp

    from bench import make_corpus
    from tpulc.codecs.bwt import driver as bz
    from tpulc.codecs.bwt.rotsort import bwt_encode_anchored
    from tpulc.primitives.dc3_device import suffix_array_dc3
    from tpulc.primitives.suffix import sa_to_bwt, suffix_array_np

    cap = bz._cap_for(size)
    data = np.frombuffer(make_corpus(size), np.uint8)
    padded = np.zeros(cap, np.uint8)
    padded[:size] = data
    blk = jnp.asarray(padded)

    # correctness spot check on a 64 KB slice (naive gold)
    small = jnp.asarray(data[:65536])
    t0 = time.time()
    sa_small = np.asarray(suffix_array_dc3(small))
    print(f"dc3 64KB compile+run {time.time()-t0:.1f}s", flush=True)
    gold = suffix_array_np(np.asarray(small))
    assert (sa_small == gold).all(), "dc3 SA mismatch vs naive gold"
    print("dc3 SA == gold on 64 KB", flush=True)

    t0 = time.time()
    rot = jax.jit(lambda b: bwt_encode_anchored(b, bz.ANCHOR_STRIDE))
    jax.block_until_ready(rot(blk))
    print(f"rotsort compile+run {time.time()-t0:.1f}s", flush=True)
    t_rot = med(lambda: rot(blk))

    t0 = time.time()
    dc3 = jax.jit(lambda b: sa_to_bwt(b, suffix_array_dc3(b)))
    jax.block_until_ready(dc3(blk))
    print(f"dc3 {cap} compile+run {time.time()-t0:.1f}s", flush=True)
    t_dc3 = med(lambda: dc3(blk))

    row = {
        "block_bytes": cap,
        "rotsort_anchored_s": round(t_rot, 4),
        "dc3_sa_to_bwt_s": round(t_dc3, 4),
        "dc3_over_rotsort": round(t_dc3 / t_rot, 2),
        "note": ("rotsort also emits decode anchors; dc3 path would "
                 "need a separate rank pass for them"),
    }
    print(json.dumps(row))
    with open("/root/repo/DC3_AB_r4.json", "w") as f:
        json.dump(row, f, indent=1)


if __name__ == "__main__":
    main()
