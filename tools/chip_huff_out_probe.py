"""Is the 100 MB decode wall bound by output materialization?

Times the buffered decode jit (a) returning the full [B, n] u8 symbol
array, (b) returning only a u32 checksum of it (same device work, 4 B
output).  If (b) ~= device time (~21 ms) while (a) stays ~52 ms, the
gap is the loopback relay materializing outputs host-side — an
environment tax, not decode work.
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_corpus
    from tpulc.codecs.huffman import driver as hd
    from tpulc.codecs.huffman.decode import huffman_decode_buffered_batch
    from tpulc.pipeline.container import Container

    size = 100_000_000
    data = make_corpus(size)
    bs = 1 << 20
    comp = hd.compress(data, block_size=bs, chunk_syms=128)
    c = Container.from_bytes(comp)
    group = c.payloads[: hd.MAX_BATCH]
    words_a, tbits_a, lens_a, offs_a, ns, chunk = \
        hd._parse_aligned_group(group, bs, 12)
    p = (jnp.asarray(words_a), jnp.asarray(tbits_a),
         jnp.asarray(lens_a), jnp.asarray(offs_a))
    jax.block_until_ready(p)
    need = -(-(31 + chunk * 12) // 32) + 1
    rw = -(-(31 + need) // 32) * 32

    @partial(jax.jit, static_argnames=())
    def decode_sum(w, tb, ln, of):
        syms = huffman_decode_buffered_batch(w, tb, ln, of, chunk, 12, rw)
        return jnp.sum(syms.astype(jnp.uint32))

    def full():
        return huffman_decode_buffered_batch(*p, chunk, 12, rw)

    def summed():
        return decode_sum(*p)

    for tag, fn in (("full-out", full), ("sum-out", summed)):
        fn().block_until_ready()
        reps = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn().block_until_ready()
            reps.append(time.perf_counter() - t0)
        dt = sorted(reps)[2]
        print(f"{tag}: {dt*1e3:8.2f} ms  {size/1e9/dt:7.3f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
