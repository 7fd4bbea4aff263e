"""On-chip A/B of Huffman decode kernels (r5): flat v3 vs buffered v2.

Times decode-only GB/s at a given input size for each kernel, checks
bit-identity against the rank decoder on the first group, and (with
--profile) dumps a per-op attribution of the flat path so the next
lever is measured, not guessed (VERDICT r4 weak #1: no kernel-level
profile existed).

Usage: python tools/chip_huffman_v3.py [size_mb] [chunk_syms] [--profile]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def _median(xs):
    return sorted(xs)[len(xs) // 2]


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    size = int(float(args[0]) * 1e6) if args else 100_000_000
    chunk_req = int(args[1]) if len(args) > 1 else 128
    do_profile = "--profile" in sys.argv

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from bench import make_corpus
    from tpulc.codecs.huffman import driver as hd
    from tpulc.codecs.huffman.decode import (
        huffman_decode_buffered_batch,
        huffman_decode_flat_batch,
    )
    from tpulc.pipeline.container import Container

    data = make_corpus(size)
    bs = 1 << 20
    t0 = time.perf_counter()
    comp = hd.compress(data, block_size=bs, chunk_syms=chunk_req)
    print(f"compress {time.perf_counter()-t0:.1f}s ratio "
          f"{len(data)/len(comp):.4f} chunk={chunk_req}", flush=True)
    c = Container.from_bytes(comp)
    groups = [c.payloads[i: i + hd.MAX_BATCH]
              for i in range(0, len(c.payloads), hd.MAX_BATCH)]
    preps = []
    chunk = None
    for g in groups:
        words_a, tbits_a, lens_a, offs_a, ns, chunk = \
            hd._parse_aligned_group(g, bs, 12)
        preps.append(((jnp.asarray(words_a), jnp.asarray(tbits_a),
                       jnp.asarray(lens_a), jnp.asarray(offs_a)), ns))

    rw_flat = hd.flat_row_words(chunk, 12)
    need = -(-(31 + chunk * 12) // 32) + 1
    rw_buf = -(-(31 + need) // 32) * 32

    def run_flat(p):
        return huffman_decode_flat_batch(*p, chunk, 12, rw_flat)

    def run_buf(p):
        return huffman_decode_buffered_batch(*p, chunk, 12, rw_buf)

    # correctness: first group, flat vs rank decoder
    p0, ns0 = preps[0]
    ref = np.asarray(hd._decode_batch_ranks(*p0, chunk, 12))
    got = np.asarray(run_flat(p0))
    bad = [j for j, n in enumerate(ns0) if not (ref[j, :n] == got[j, :n]).all()]
    print("flat identity:", "EQUAL" if not bad else f"MISMATCH {bad}",
          flush=True)
    if bad:
        j = bad[0]
        n = ns0[j]
        w = np.flatnonzero(ref[j, :n] != got[j, :n])
        print("  first diffs", w[:10], ref[j, w[:5]], got[j, w[:5]])
        return 1

    for name, fn in (("flat", run_flat), ("buffered", run_buf)):
        for p, _ in preps:           # warm/compile every w_pad bucket
            fn(p).block_until_ready()
        reps = []
        for _ in range(5):
            t0 = time.perf_counter()
            outs = [fn(p) for p, _ in preps]
            for o in outs:
                o.block_until_ready()
            reps.append(time.perf_counter() - t0)
        dt = _median(reps)
        print(f"{name:9s} {dt*1e3:8.2f} ms  {size/1e9/dt:7.3f} GB/s",
              flush=True)

    if do_profile:
        import tempfile

        from tools.profile_bz_trace import parse_trace

        for name, fn in (("buffered", run_buf), ("flat", run_flat)):
            logdir = tempfile.mkdtemp(prefix=f"huff_trace_{name}_")
            with jax.profiler.trace(logdir):
                outs = [fn(p) for p, _ in preps]
                for o in outs:
                    o.block_until_ready()
            print(f"=== top device ops ({name} decode) ===")
            parse_trace(logdir)
    return 0


if __name__ == "__main__":
    sys.exit(main())
