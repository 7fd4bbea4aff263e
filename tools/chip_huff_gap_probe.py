"""Probe the wall-vs-device gap of the buffered Huffman decode call.

r5 profile: one 100 MB buffered decode = 54 ms wall but only ~28 ms of
traced device ops.  This times (a) one blocked call, (b) three calls
issued back-to-back then blocked together.  If (b) ~= 3*device + gap,
the gap is overlappable host/dispatch cost; if (b) ~= 3*wall, it is
serialized per-call (transfer or device-side) cost.
"""

import os
import sys
import time

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

    def call():
        return huffman_decode_buffered_batch(*p, chunk, 12, rw)

    call().block_until_ready()        # compile/warm
    for tag, n in (("x1", 1), ("x3", 3)):
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [call() for _ in range(n)]
            for o in outs:
                o.block_until_ready()
            best = min(best, time.perf_counter() - t0)
        print(f"{tag}: {best*1e3:8.2f} ms  ({best*1e3/n:.2f} ms/call)",
              flush=True)
    # device-array reuse sanity: is the input resident? time a trivial
    # reduction over the big operand
    t0 = time.perf_counter()
    jnp.sum(p[0]).block_until_ready()
    print(f"sum(words) {1e3*(time.perf_counter()-t0):.2f} ms", flush=True)


if __name__ == "__main__":
    main()
