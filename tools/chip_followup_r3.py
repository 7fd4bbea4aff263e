"""Post-bench follow-ups: Pallas huffman decoder A/B + bz op trace."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_corpus
    from tpulc.codecs.huffman import driver as hd
    from tpulc.pipeline.container import Container

    size = 100_000_000
    data = make_corpus(size)
    bs = 1 << 20
    comp = hd.compress(data, block_size=bs)
    c = Container.from_bytes(comp)
    groups = [c.payloads[i: i + hd.MAX_BATCH]
              for i in range(0, len(c.payloads), hd.MAX_BATCH)]
    preps = []
    for g in groups:
        words_a, tbits_a, lens_a, offs_a, ns, _chunk = \
            hd._parse_aligned_group(g, bs, 12)
        preps.append((jnp.asarray(words_a), jnp.asarray(tbits_a),
                      jnp.asarray(lens_a), jnp.asarray(offs_a)))

    # A: rank decoder
    for p in preps:
        hd._decode_batch_ranks(*p, hd.CHUNK_SYMS, 12).block_until_ready()
    t0 = time.perf_counter()
    outs = [hd._decode_batch_ranks(*p, hd.CHUNK_SYMS, 12) for p in preps]
    for o in outs:
        o.block_until_ready()
    ta = time.perf_counter() - t0

    # B: Pallas decoder
    from tpulc.codecs.huffman.decode import huffman_decode_pallas_batch

    need = -(-(31 + hd.CHUNK_SYMS * 12) // 32) + 1
    rw = 1 << max(1, (need - 1).bit_length())
    for p in preps:
        huffman_decode_pallas_batch(
            *p, hd.CHUNK_SYMS, 12, rw).block_until_ready()
    t0 = time.perf_counter()
    outsb = [huffman_decode_pallas_batch(*p, hd.CHUNK_SYMS, 12, rw)
             for p in preps]
    for o in outsb:
        o.block_until_ready()
    tb = time.perf_counter() - t0
    same = all(bool((np.asarray(a) == np.asarray(b)).all())
               for a, b in zip(outs, outsb))
    print(json.dumps({
        "ranks_GBps": round(size / 1e9 / ta, 3),
        "pallas_GBps": round(size / 1e9 / tb, 3),
        "outputs_match": same,
    }), flush=True)

    os.system(f"{sys.executable} /root/repo/tools/profile_bz_trace.py "
              "2>&1 | tail -30")


if __name__ == "__main__":
    main()
