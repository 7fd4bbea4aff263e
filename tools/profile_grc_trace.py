"""Per-op attribution of the bsc -e2 (group-rank coder) round trip —
the GRC_TRACE artifact VERDICT r4 weak #3 asked for, built the same way
as tools/profile_bz_trace.py: trace one warm compress + decompress of
the bench corpus at -e2 and aggregate device-op durations.

Also reports the wall split host-side: compress vs decompress vs
per-stage `--timings` output of the bsc driver.

Usage: python tools/profile_grc_trace.py [size_bytes]
"""

from __future__ import annotations

import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from tools.profile_bz_trace import parse_trace  # noqa: E402


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 3_569_598
    import jax

    from bench import make_corpus
    from tpulc.pipeline.registry import get_codec

    data = make_corpus(size)
    codec = get_codec("bsc")
    # warm (compile)
    comp = codec.compress(data, block_size=4 << 20, coder=2)
    out = codec.decompress(comp)
    assert out == data
    t0 = time.perf_counter()
    comp = codec.compress(data, block_size=4 << 20, coder=2)
    t1 = time.perf_counter()
    out = codec.decompress(comp)
    t2 = time.perf_counter()
    assert out == data
    print(f"warm: compress {t1-t0:.3f}s decompress {t2-t1:.3f}s "
          f"ratio {len(data)/len(comp):.3f} "
          f"rt {size/1e6/(t2-t0):.3f} MB/s", flush=True)

    logdir = tempfile.mkdtemp(prefix="grc_trace_c_")
    with jax.profiler.trace(logdir):
        comp = codec.compress(data, block_size=4 << 20, coder=2)
    print("=== top device ops: -e2 COMPRESS ===")
    parse_trace(logdir, top=25)

    logdir = tempfile.mkdtemp(prefix="grc_trace_d_")
    with jax.profiler.trace(logdir):
        out = codec.decompress(comp)
    print("=== top device ops: -e2 DECOMPRESS ===")
    parse_trace(logdir, top=25)


if __name__ == "__main__":
    main()
