"""Round-3 consolidated chip measurements (run after GRC warms)."""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    from bench import make_corpus

    data = make_corpus()


    # 2. culzss whole-corpus warm round trip
    from tpulc.codecs.lzss import culzss_driver

    comp = culzss_driver.compress(data, block_size=1 << 20)
    assert culzss_driver.decompress(comp) == data
    t0 = time.perf_counter()
    comp = culzss_driver.compress(data, block_size=1 << 20)
    t1 = time.perf_counter()
    out = culzss_driver.decompress(comp)
    t2 = time.perf_counter()
    assert out == data
    print(json.dumps({
        "culzss_ratio": round(len(data) / len(comp), 4),
        "enc_s": round(t1 - t0, 3), "dec_s": round(t2 - t1, 3),
        "rt_MBps": round(len(data) / 1e6 / (t2 - t0), 3)}), flush=True)

    # 3. lzss k=16 warm round trip (batched decode)
    from tpulc.codecs.lzss import driver as lz

    comp = lz.compress(data, block_size=1 << 20)
    assert lz.decompress(comp) == data
    t0 = time.perf_counter()
    comp = lz.compress(data, block_size=1 << 20)
    t1 = time.perf_counter()
    out = lz.decompress(comp)
    t2 = time.perf_counter()
    assert out == data
    print(json.dumps({
        "lzss_ratio": round(len(data) / len(comp), 4),
        "enc_s": round(t1 - t0, 3), "dec_s": round(t2 - t1, 3),
        "rt_MBps": round(len(data) / 1e6 / (t2 - t0), 3)}), flush=True)

    # 4. bz warm round trip
    from tpulc.codecs.bwt import driver as bz

    comp = bz.compress(data, block_size=900_000)
    assert bz.decompress(comp) == data
    t0 = time.perf_counter()
    comp = bz.compress(data, block_size=900_000)
    t1 = time.perf_counter()
    out = bz.decompress(comp)
    t2 = time.perf_counter()
    assert out == data
    print(json.dumps({
        "bz_ratio": round(len(data) / len(comp), 3),
        "enc_s": round(t1 - t0, 3), "dec_s": round(t2 - t1, 3),
        "rt_MBps": round(len(data) / 1e6 / (t2 - t0), 3)}), flush=True)

    # 4b. bsc -e2 (GRC, fused encode) warm round trip
    from tpulc.pipeline.registry import get_codec

    bsc = get_codec("bsc")
    comp = bsc.compress(data, block_size=4 << 20, coder=2)
    assert bsc.decompress(comp) == data
    t0 = time.perf_counter()
    comp = bsc.compress(data, block_size=4 << 20, coder=2)
    t1 = time.perf_counter()
    out = bsc.decompress(comp)
    t2 = time.perf_counter()
    assert out == data
    print(json.dumps({
        "e2_grc_bytes": len(comp),
        "ratio": round(len(data) / len(comp), 3),
        "enc_s": round(t1 - t0, 3), "dec_s": round(t2 - t1, 3),
        "rt_MBps": round(len(data) / 1e6 / (t2 - t0), 3)}), flush=True)

    # 4c. bsc -e1 warm round trip
    comp = bsc.compress(data, block_size=4 << 20)
    assert bsc.decompress(comp) == data
    t0 = time.perf_counter()
    comp = bsc.compress(data, block_size=4 << 20)
    t1 = time.perf_counter()
    out = bsc.decompress(comp)
    t2 = time.perf_counter()
    assert out == data
    print(json.dumps({
        "e1_bytes": len(comp),
        "ratio": round(len(data) / len(comp), 3),
        "enc_s": round(t1 - t0, 3), "dec_s": round(t2 - t1, 3),
        "rt_MBps": round(len(data) / 1e6 / (t2 - t0), 3)}), flush=True)

    # 5. production-shape chip checks
    import subprocess

    r = subprocess.run(
        [sys.executable, "/root/repo/tests/tpu_kernels_check.py"],
        capture_output=True, text=True, timeout=3000,
    )
    print(r.stdout[-2000:], flush=True)
    assert r.returncode == 0, r.stderr[-2000:]


if __name__ == "__main__":
    main()
