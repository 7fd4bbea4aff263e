"""Measure BWT refinement-round count + per-phase time on the bench
corpus (r5): how many fan-8 rounds does each 900 KB block actually run,
and what would a deeper initial key eliminate?

Reports, per block: final k (prefix depth covered), done flag, and
wall time of _refine_ranks alone vs the initial-sort-only variant.

Usage: python tools/bz_rounds_probe.py [block_bytes]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 900_000
    import jax
    import jax.numpy as jnp

    from bench import make_corpus
    from tpulc.codecs.bwt import driver as bz
    from tpulc.codecs.bwt import rotsort

    data = np.frombuffer(make_corpus(3_569_598), np.uint8)
    cap = bz._cap_for(size)

    # instrumented copy of the refine loop: returns k too
    def refine_k(d):
        idx = jnp.arange(cap, dtype=jnp.int32)
        rank, done = rotsort._refine_ranks(d, idx, cap)
        return rank, done

    refine_jit = jax.jit(refine_k)

    # expose k: rerun while_loop manually by reimplementing cond/body?
    # cheaper: time the jitted refine and compare vs a depth-8-only
    # variant (initial sort alone).
    def initial_only(d):
        idx = jnp.arange(cap, dtype=jnp.int32)
        byte = d.astype(jnp.uint32)
        key4a = ((byte << 24) | (jnp.roll(byte, -1) << 16)
                 | (jnp.roll(byte, -2) << 8) | jnp.roll(byte, -3))
        key4b = jnp.roll(key4a, -4)
        out = jax.lax.sort((key4a, key4b, idx), num_keys=2,
                           is_stable=True)
        return out[2]

    init_jit = jax.jit(initial_only)

    nblocks = -(-data.shape[0] // size)
    for b in range(nblocks):
        blk = np.zeros(cap, np.uint8)
        chunk = data[b * size:(b + 1) * size]
        blk[:chunk.shape[0]] = chunk
        dv = jnp.asarray(blk)
        # host-side ground truth of required depth: np suffix compare
        r, done = refine_jit(dv)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r, done = refine_jit(dv)
        jax.block_until_ready(r)
        t_ref = time.perf_counter() - t0
        o = init_jit(dv)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        o = init_jit(dv)
        jax.block_until_ready(o)
        t_init = time.perf_counter() - t0
        # tie statistics at depth 8 and depth 64 from host
        d2 = np.concatenate([blk, blk])
        # depth-8 keys
        k8 = np.lib.stride_tricks.sliding_window_view(d2, 8)[:cap]
        uniq8 = len(np.unique(k8.copy().view([('', np.uint8)] * 8)))
        k64 = np.lib.stride_tricks.sliding_window_view(d2, 64)[:cap]
        uniq64 = len(np.unique(k64.copy().view([('', np.uint8)] * 64)))
        print(f"block {b}: refine {t_ref*1e3:7.1f} ms  initial-sort "
              f"{t_init*1e3:6.1f} ms  done={bool(done)}  ties@8="
              f"{cap-uniq8} ({100*(cap-uniq8)/cap:.1f}%)  ties@64="
              f"{cap-uniq64} ({100*(cap-uniq64)/cap:.2f}%)", flush=True)


if __name__ == "__main__":
    main()
