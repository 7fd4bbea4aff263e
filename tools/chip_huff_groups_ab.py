"""A/B decode group size for the buffered Huffman kernel at 100 MB.

The r5 gap probe (chip_huff_gap_probe) measured ~16 ms of overlappable
host/dispatch cost per decode call: one 96-block call runs 51 ms wall
vs ~28 ms device.  Splitting the batch into G-block calls issued
back-to-back lets the host tax of call i ride under the device compute
of call i-1.  Times group sizes 96/48/32 end-to-end (all calls issued,
then one block_until_ready sweep), median of 5.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def _median(xs):
    return sorted(xs)[len(xs) // 2]


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
    chunk = 128
    need = -(-(31 + chunk * 12) // 32) + 1
    rw = -(-(31 + need) // 32) * 32

    for G in (96, 48, 32):
        groups = [c.payloads[i: i + G]
                  for i in range(0, len(c.payloads), G)]
        preps = []
        for g in groups:
            words_a, tbits_a, lens_a, offs_a, ns, ck = \
                hd._parse_aligned_group(g, bs, 12)
            preps.append((jnp.asarray(words_a), jnp.asarray(tbits_a),
                          jnp.asarray(lens_a), jnp.asarray(offs_a)))
        jax.block_until_ready(preps)

        def call(p):
            return huffman_decode_buffered_batch(*p, chunk, 12, rw)

        for p in preps:
            call(p).block_until_ready()
        reps = []
        for _ in range(5):
            t0 = time.perf_counter()
            outs = [call(p) for p in preps]
            for o in outs:
                o.block_until_ready()
            reps.append(time.perf_counter() - t0)
        dt = _median(reps)
        print(f"G={G:3d} ({len(preps)} calls): {dt*1e3:8.2f} ms  "
              f"{size/1e9/dt:7.3f} GB/s", flush=True)


if __name__ == "__main__":
    main()
