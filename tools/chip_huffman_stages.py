"""Stage-isolated timing of the flat Huffman decode at 100 MB:
gather_rows | kernel | table prep | symbol map, each jitted alone, to
attribute the 21 ms mystery fusion in the fused program.

Usage: python tools/chip_huffman_stages.py [size_mb] [chunk]
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def _median(xs):
    return sorted(xs)[len(xs) // 2]


def timeit(name, fn, *args, reps=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    print(f"{name:28s} {_median(ts)*1e3:9.2f} ms", flush=True)
    return out


def main():
    size = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 100_000_000
    chunk = int(sys.argv[2]) if len(sys.argv) > 2 else 128

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
    from tpulc.codecs.huffman.device_tables import canonical_decode_params
    from tpulc.codecs.huffman.pallas_decode import (
        decode_canonical_indices_flat,
        gather_rows,
    )
    from tpulc.pipeline.container import Container

    data = make_corpus(size)
    bs = 1 << 20
    comp = hd.compress(data, block_size=bs, chunk_syms=chunk)
    c = Container.from_bytes(comp)
    g = c.payloads[: hd.MAX_BATCH]
    words_a, tbits_a, lens_a, offs_a, ns, chunk = \
        hd._parse_aligned_group(g, bs, 12)
    B = len(g)
    words = jnp.asarray(words_a[:B])
    tbits = jnp.asarray(tbits_a[:B])
    lens = jnp.asarray(lens_a[:B])
    offs = jnp.asarray(offs_a[:B])
    gmb = B * bs / 1e6
    print(f"one group = {gmb:.0f} MB, w_pad {words.shape[1]}", flush=True)

    rw = hd.flat_row_words(chunk, 12)
    L = 12
    ccap = offs.shape[1]

    gather_j = jax.jit(partial(gather_rows, row_words=rw))
    rows, pos = timeit("gather_rows", gather_j, words, offs)

    @jax.jit
    def tables(lens, offs, tbits):
        lim, base, ss = jax.vmap(
            lambda ln: canonical_decode_params(ln, L))(lens)
        shifts = (L - jnp.arange(L + 1, dtype=jnp.int32))[None, :]
        lj = lim << shifts
        bl = jnp.minimum(tbits[:, None] - offs, chunk * L).reshape(-1)
        lj_c = jnp.broadcast_to(
            lj[:, None, :], (B, ccap, L + 1)).reshape(B * ccap, L + 1)
        base_c = jnp.broadcast_to(
            base[:, None, :], (B, ccap, L + 1)).reshape(B * ccap, L + 1)
        return lj_c, base_c, bl, ss

    lj_c, base_c, bl, ss = timeit("tables+repeat", tables, lens, offs,
                                  tbits)

    kern = jax.jit(partial(decode_canonical_indices_flat,
                           chunk_syms=chunk, max_len=L, row_words=rw))
    ci = timeit("kernel(+tile transposes)", kern, rows, pos, bl, lj_c,
                base_c)

    @jax.jit
    def symmap(ci, ss):
        ranks_p = ci.reshape(B, ccap * chunk // 4)

        def _map_one(args):
            rp, o = args
            ss16 = o[:256].astype(jnp.bfloat16).reshape(16, 16)
            packed_sym = jnp.zeros_like(rp)
            for b in range(4):
                fb = (rp >> (8 * b)) & 255
                oh_h = jax.nn.one_hot(fb >> 4, 16, dtype=jnp.bfloat16)
                oh_l = jax.nn.one_hot(fb & 15, 16, dtype=jnp.bfloat16)
                tmp = jnp.matmul(oh_h, ss16,
                                 precision=jax.lax.Precision.HIGHEST)
                sym = jnp.sum(tmp * oh_l, axis=1).astype(jnp.int32) & 255
                packed_sym = packed_sym | (sym << (8 * b))
            return packed_sym

        syms_p = jax.lax.map(_map_one, (ranks_p, ss))
        return jax.lax.bitcast_convert_type(
            syms_p, jnp.uint8).reshape(B, ccap * chunk)

    timeit("symbol map", symmap, ci, ss)

    # whole thing fused, for reference
    from tpulc.codecs.huffman.decode import huffman_decode_flat_batch

    whole = jax.jit(partial(huffman_decode_flat_batch, chunk_syms=chunk,
                            max_len=L, row_words=rw))
    timeit("fused whole", whole, words, tbits, lens, offs)


if __name__ == "__main__":
    main()
