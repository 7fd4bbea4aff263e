"""Per-op attribution of the CULZSS round trip (r5): where do the
compress and the whole-corpus batched decode actually spend device
time?  Same jax.profiler approach as the bz/grc traces.

Usage: python tools/profile_culzss_trace.py [size_bytes]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from tools.profile_bz_trace import parse_trace  # noqa: E402


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 3_569_598
    import jax

    from bench import make_corpus
    from tpulc.pipeline.registry import get_codec

    data = make_corpus(size)
    codec = get_codec("culzss")
    comp = codec.compress(data, block_size=1 << 20)
    out = codec.decompress(comp)
    assert out == data
    t0 = time.perf_counter()
    comp = codec.compress(data, block_size=1 << 20)
    t1 = time.perf_counter()
    out = codec.decompress(comp)
    t2 = time.perf_counter()
    assert out == data
    print(f"warm: compress {t1-t0:.3f}s decompress {t2-t1:.3f}s "
          f"rt {size/1e6/(t2-t0):.3f} MB/s ratio "
          f"{len(data)/len(comp):.4f}", flush=True)

    logdir = tempfile.mkdtemp(prefix="culzss_c_")
    with jax.profiler.trace(logdir):
        comp = codec.compress(data, block_size=1 << 20)
    print("=== top device ops: CULZSS COMPRESS ===")
    parse_trace(logdir, top=20)

    logdir = tempfile.mkdtemp(prefix="culzss_d_")
    with jax.profiler.trace(logdir):
        out = codec.decompress(comp)
    print("=== top device ops: CULZSS DECOMPRESS ===")
    parse_trace(logdir, top=20)


if __name__ == "__main__":
    main()
