"""tpulc benchmark harness — prints ONE JSON line.

Headline metric (BASELINE.json): compress+decompress throughput of the
bzip2-class pipeline per chip, vs the reference's cuda-bzip2 on a V100
(3,569,598 B in 2.185 s compress + 0.191 s decompress -> 1.502 MB/s
round-trip, BASELINE.md rows 6-7).  Until the bz pipeline lands, the
fallback benchmark is the Huffman codec round-trip against the same
baseline denominator.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# Persistent XLA compilation cache: bench shapes are stable across
# runs, so recompiles through the remote-compile tunnel are the main
# fixed cost to avoid.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax  # noqa: E402

try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["JAX_COMPILATION_CACHE_DIR"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

# V100 cuda-bzip2: 3,569,598 bytes in (2.185 + 0.191) s round-trip.
BASELINE_ROUNDTRIP_MBPS = 3.569598 / (2.185 + 0.191)

SIZE = 3_569_598  # the reference benchmark file size (BASELINE.md)


def make_corpus(size: int) -> bytes:
    """Deterministic enwik-like text (markov-ish English letter soup)."""
    rng = np.random.default_rng(12345)
    words = [
        b"the", b"of", b"and", b"compression", b"lossless", b"entropy",
        b"transform", b"block", b"sorting", b"data", b"parallel", b"encode",
        b"decode", b"huffman", b"window", b"match", b"stream", b"symbol",
    ]
    parts = []
    total = 0
    while total < size:
        w = words[int(rng.integers(len(words)))]
        parts.append(w)
        parts.append(b" ")
        total += len(w) + 1
    return b"".join(parts)[:size]


def bench_roundtrip(codec_name: str, data: bytes, block_size: int):
    from tpulc.pipeline.registry import get_codec

    codec = get_codec(codec_name)
    # warmup/compile
    comp = codec.compress(data, block_size=block_size)
    out = codec.decompress(comp)
    assert out == data, "round-trip mismatch"
    t0 = time.perf_counter()
    comp = codec.compress(data, block_size=block_size)
    t1 = time.perf_counter()
    out = codec.decompress(comp)
    t2 = time.perf_counter()
    assert out == data
    return {
        "compress_s": t1 - t0,
        "decompress_s": t2 - t1,
        "ratio": len(data) / len(comp),
        "roundtrip_mbps": len(data) / 1e6 / (t2 - t0),
    }


def main():
    data = make_corpus(SIZE)
    try:
        r = bench_roundtrip("bz", data, block_size=900_000)
        metric = "bz_pipeline_roundtrip_MBps"
    except Exception:
        r = bench_roundtrip("huffman", data, block_size=1 << 20)
        metric = "huffman_roundtrip_MBps"
    value = r["roundtrip_mbps"]
    detail = {
        "compress_s": round(r["compress_s"], 4),
        "decompress_s": round(r["decompress_s"], 4),
        "ratio": round(r["ratio"], 3),
        "input_bytes": SIZE,
    }
    # TPULC_BENCH_FULL=1 adds the per-codec matrix (slower: compiles
    # every codec); the headline metric/line stays identical.
    if os.environ.get("TPULC_BENCH_FULL"):
        codecs = {}
        for name, bs in [("huffman", 1 << 20), ("bsc", 4 << 20),
                         ("lzss", 1 << 20), ("culzss", 1 << 20)]:
            try:
                rr = bench_roundtrip(name, data, block_size=bs)
                codecs[name] = {
                    "MBps": round(rr["roundtrip_mbps"], 3),
                    "ratio": round(rr["ratio"], 3),
                }
            except Exception as e:  # pragma: no cover - diagnostics only
                codecs[name] = {"error": str(e)[:80]}
        detail["codecs"] = codecs
    print(json.dumps({
        "metric": metric,
        "value": round(value, 3),
        "unit": "MB/s",
        "vs_baseline": round(value / BASELINE_ROUNDTRIP_MBPS, 3),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
