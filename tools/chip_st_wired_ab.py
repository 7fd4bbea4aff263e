"""A/B the wired-F device inverse ST (-m st8w) vs the hybrid (-m st8).

VERDICT r4 #5 asked for the chip-resident ST decode measured against
the host-walk hybrid.  Times warm round trips (median of 3) on the
bench corpus and reports the decode-side split.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def _median(xs):
    return sorted(xs)[len(xs) // 2]


def main():
    from bench import make_corpus
    from tpulc.codecs.bsclike import driver as D

    data = make_corpus(3_569_598)
    for sorter in ("st8", "st8w"):
        comp = D.compress(data, block_size=25 << 20, sorter=sorter)
        assert D.decompress(comp) == data
        cs, ds = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            comp = D.compress(data, block_size=25 << 20, sorter=sorter)
            cs.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            out = D.decompress(comp)
            ds.append(time.perf_counter() - t0)
        assert out == data
        c, d = _median(cs), _median(ds)
        mb = len(data) / 1e6
        print(f"{sorter:5s} ratio {len(data)/len(comp):7.3f}  "
              f"compress {c:6.3f}s  decompress {d:6.3f}s  "
              f"rt {mb/(c+d):6.3f} MB/s", flush=True)


if __name__ == "__main__":
    main()
