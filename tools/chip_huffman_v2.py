"""On-chip A/B + ratio/GB/s curve for the v2 buffered Huffman decoder.

VERDICT r3 #1: close the 0.131 GB/s vs CUHD-66 GB/s gap. Measures, at
100 MB on the real chip:
  - rank decoder (XLA, r3 default)      at chunk 128
  - v1 Pallas masked-reduction kernel   at chunk 256 (r3 kernel)
  - v2 buffered Pallas kernel           at chunk 64 / 128 / 256
and the wire ratio at each chunk, emitting the decode-GB/s-vs-ratio
curve as JSON (append to HUFF_CURVE_r4.json).

Usage: python tools/chip_huffman_v2.py [size] [reps]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import jax
    import jax.numpy as jnp

    from bench import make_corpus
    from tpulc.codecs.huffman import driver as hd
    from tpulc.codecs.huffman.decode import (
        huffman_decode_buffered_batch,
        huffman_decode_pallas_batch,
    )
    from tpulc.pipeline.container import Container

    data = make_corpus(size)
    bs = 1 << 20
    results = {"input_MB": size / 1e6, "reps": reps, "rows": []}

    def prep_groups(comp):
        c = Container.from_bytes(comp)
        groups = [c.payloads[i: i + hd.MAX_BATCH]
                  for i in range(0, len(c.payloads), hd.MAX_BATCH)]
        preps, chunk = [], None
        for g in groups:
            wa, tb, ln, of, ns, chunk = hd._parse_aligned_group(g, bs, 12)
            preps.append(((jnp.asarray(wa), jnp.asarray(tb),
                           jnp.asarray(ln), jnp.asarray(of)), ns))
        return preps, chunk

    def measure(fn, preps, label, ratio, verify=True):
        t0 = time.time()
        outs = [fn(p) for p, _ in preps]
        jax.block_until_ready(outs)
        warm_s = time.time() - t0
        if verify:
            arr = np.frombuffer(data, np.uint8)
            pos = 0
            for (p, ns), o in zip(preps, outs):
                po = np.asarray(o)
                for j, n in enumerate(ns):
                    assert (po[j, :n] == arr[pos: pos + n]).all(), \
                        (label, pos)
                    pos += n
            assert pos == size
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            outs = [fn(p) for p, _ in preps]
            jax.block_until_ready(outs)
            ts.append(time.perf_counter() - t0)
        dec = sorted(ts)[len(ts) // 2]
        row = {"label": label, "ratio": round(ratio, 4),
               "decode_s": round(dec, 4),
               "GBps": round(size / 1e9 / dec, 3),
               "warm_first_s": round(warm_s, 1)}
        results["rows"].append(row)
        print(json.dumps(row), flush=True)

    for chunk in (256, 128, 64):
        t0 = time.time()
        comp = hd.compress(data, block_size=bs, chunk_syms=chunk)
        ratio = size / len(comp)
        print(f"chunk {chunk}: compressed {len(comp)/1e6:.1f} MB "
              f"ratio {ratio:.4f} enc {time.time()-t0:.1f}s", flush=True)
        preps, pchunk = prep_groups(comp)
        assert pchunk == chunk
        need = -(-(31 + chunk * 12) // 32) + 1
        rwb = -(-(31 + need) // 32) * 32

        measure(lambda p, c=chunk, r=rwb: huffman_decode_buffered_batch(
            *p, c, 12, r), preps, f"buffered@{chunk}", ratio)
        if chunk == 128:
            measure(lambda p, c=chunk: hd._decode_batch_ranks(*p, c, 12),
                    preps, f"ranks@{chunk}", ratio)
        if chunk == 256:
            rw1 = 1 << max(1, (need - 1).bit_length())
            measure(lambda p, c=chunk, r=rw1: huffman_decode_pallas_batch(
                *p, c, 12, r), preps, f"v1pallas@{chunk}", ratio)

    with open("/root/repo/HUFF_CURVE_r4.json", "w") as f:
        json.dump(results, f, indent=1)
    print("wrote HUFF_CURVE_r4.json")


if __name__ == "__main__":
    main()
