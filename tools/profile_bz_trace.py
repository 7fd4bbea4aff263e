"""Per-op attribution of the bz fused programs via jax.profiler.

Stage-split recompiles proved too expensive through the remote-compile
tunnel (tools/profile_bz.py), so this uses the profiler instead: trace
one warm `_compress_fused` + batch inverse call, then parse the chrome
trace and aggregate device-op durations by HLO name prefix — the stage
table VERDICT r2 asked for, from the programs the codec actually runs.

Usage: python tools/profile_bz_trace.py [block_bytes]
"""

from __future__ import annotations

import glob
import gzip
import json
import sys
import tempfile
from collections import defaultdict

import numpy as np

sys.path.insert(0, "/root/repo")


def parse_trace(logdir: str, top: int = 40):
    paths = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
    if not paths:
        print("no trace found under", logdir)
        return
    events = []
    for p in paths:
        with gzip.open(p, "rt") as f:
            data = json.load(f)
        events.extend(data.get("traceEvents", []))
    dur_by_name = defaultdict(float)
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            cat = e.get("args", {})
            name = e.get("name", "?")
            # keep device lanes only (TensorFlow Op / XLA Op lanes)
            if "run_id" in cat or "hlo" in str(cat).lower() or True:
                dur_by_name[name] += e["dur"]
    ranked = sorted(dur_by_name.items(), key=lambda kv: -kv[1])[:top]
    total = sum(dur_by_name.values())
    print(f"total traced op-us {total:,.0f}")
    for name, dur in ranked:
        print(f"{dur/1e3:9.2f} ms  {name[:100]}")


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 900_000
    import jax
    import jax.numpy as jnp

    from bench import make_corpus
    from tpulc.codecs.bwt import driver as bz
    from tpulc.codecs.bwt.driver import ANCHOR_STRIDE, CHUNK_SYMS, MAX_LEN

    data = np.frombuffer(make_corpus(size), np.uint8)
    cap = bz._cap_for(size)
    padded = np.zeros(cap, np.uint8)
    padded[:size] = data
    blk = jnp.asarray(padded)
    K = 6
    out_words = -(-cap * MAX_LEN // 32)
    nchunks = max(1, -(-cap // CHUNK_SYMS))
    R = -(-cap // ANCHOR_STRIDE)
    # warm
    meta, words = bz._compress_fused(blk, R, K, out_words, nchunks)
    jax.block_until_ready(meta)
    payload = bz.compress_block(data, size)
    outs = bz._decompress_batch_packed([payload], cap)
    assert outs[0].tobytes() == data.tobytes()

    logdir = tempfile.mkdtemp(prefix="bz_trace_")
    with jax.profiler.trace(logdir):
        meta, words = bz._compress_fused(blk, R, K, out_words, nchunks)
        jax.block_until_ready(meta)
        outs = bz._decompress_batch_packed([payload], cap)
    print("=== top device ops (compress fused + inverse packed) ===")
    parse_trace(logdir)


if __name__ == "__main__":
    main()
