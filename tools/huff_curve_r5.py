"""HUFF_CURVE_r5: decode GB/s vs ratio across (kernel, chunk_syms)
configs at 100 MB — extends HUFF_CURVE_r4 (which stopped at chunk 64)
with the r5 flat kernel and the MAX_BATCH=128 dispatch regime.

Writes HUFF_CURVE_r5.json.

Usage: python tools/huff_curve_r5.py [size_mb]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def _median(xs):
    return sorted(xs)[len(xs) // 2]


def main():
    size = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 \
        else 100_000_000
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from bench import make_corpus, tunnel_health
    from tpulc.codecs.huffman import driver as hd
    from tpulc.codecs.huffman.decode import (
        huffman_decode_buffered_batch,
        huffman_decode_flat_batch,
    )
    from tpulc.pipeline.container import Container

    data = make_corpus(size)
    bs = 1 << 20
    rows = []
    for chunk in (64, 128, 256):
        t0 = time.perf_counter()
        comp = hd.compress(data, block_size=bs, chunk_syms=chunk)
        c_s = time.perf_counter() - t0
        ratio = len(data) / len(comp)
        c = Container.from_bytes(comp)
        groups = [c.payloads[i: i + hd.MAX_BATCH]
                  for i in range(0, len(c.payloads), hd.MAX_BATCH)]
        preps = []
        for g in groups:
            words_a, tbits_a, lens_a, offs_a, ns, ck = \
                hd._parse_aligned_group(g, bs, 12)
            preps.append((jnp.asarray(words_a), jnp.asarray(tbits_a),
                          jnp.asarray(lens_a), jnp.asarray(offs_a)))
        rw_flat = hd.flat_row_words(chunk, 12)
        need = -(-(31 + chunk * 12) // 32) + 1
        rw_buf = -(-(31 + need) // 32) * 32
        kernels = {
            "buffered": lambda p: huffman_decode_buffered_batch(
                *p, chunk, 12, rw_buf),
            "flat": lambda p: huffman_decode_flat_batch(
                *p, chunk, 12, rw_flat),
        }
        for name, fn in kernels.items():
            try:
                for p in preps:
                    fn(p).block_until_ready()
                reps = []
                for _ in range(5):
                    t0 = time.perf_counter()
                    outs = [fn(p) for p in preps]
                    for o in outs:
                        o.block_until_ready()
                    reps.append(time.perf_counter() - t0)
                dt = _median(reps)
                row = {"kernel": name, "chunk_syms": chunk,
                       "ratio": round(ratio, 4),
                       "decode_GBps": round(size / 1e9 / dt, 3),
                       "decode_ms": round(dt * 1e3, 2),
                       "compress_s": round(c_s, 1)}
            except Exception as e:
                row = {"kernel": name, "chunk_syms": chunk,
                       "error": str(e)[:120]}
            rows.append(row)
            print(row, flush=True)
    out = {"input_MB": size / 1e6, "max_batch": hd.MAX_BATCH,
           "tunnel_health": tunnel_health(), "rows": rows,
           "note": "decode-only, dispatch-all-then-sync, median of 5; "
                   "vs CUHD 66 GB/s V100 (README.md:107-117)"}
    with open("/root/repo/HUFF_CURVE_r5.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote HUFF_CURVE_r5.json")


if __name__ == "__main__":
    main()
