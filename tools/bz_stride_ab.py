"""A/B the bz inverse anchor stride on the bench corpus: each stride
runs in a fresh subprocess (the stride is a module constant shared by
encode and decode).

Usage: python tools/bz_stride_ab.py            # driver
       python tools/bz_stride_ab.py --one 256  # worker
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")


def worker(stride: int):
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/root/repo/.jax_cache")
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["JAX_COMPILATION_CACHE_DIR"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1.0)
    except Exception:
        pass
    from bench import bench_roundtrip, make_corpus

    data = make_corpus()
    r = bench_roundtrip("bz", data, block_size=900_000)
    print(f"RESULT stride={stride} compress={r['compress_s']:.4f} "
          f"decompress={r['decompress_s']:.4f} "
          f"rt={r['roundtrip_mbps']:.3f} MB/s ratio={r['ratio']:.3f}",
          flush=True)


def main():
    if "--one" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--one") + 1]))
        return
    for stride in (512, 256, 128):
        env = dict(os.environ, TPULC_ANCHOR_STRIDE=str(stride))
        t0 = time.perf_counter()
        r = subprocess.run(
            [sys.executable, __file__, "--one", str(stride)],
            env=env, capture_output=True, text=True, timeout=2400)
        for line in r.stdout.splitlines():
            if line.startswith("RESULT"):
                print(line, f"(wall {time.perf_counter()-t0:.0f}s)",
                      flush=True)
                break
        else:
            print(f"stride {stride} FAILED:", r.stderr[-300:], flush=True)


if __name__ == "__main__":
    main()
