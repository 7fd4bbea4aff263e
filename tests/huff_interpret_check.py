"""Subprocess body for test_buffered_kernel_matches_rank_decoder.

Run as a fresh process with arg "tpu" to compare the real Mosaic
kernel against the XLA rank decoder on-chip (the default interpret
mode exists for local debugging: XLA:CPU compile of the
jit-of-interpret graph is non-deterministically slow, which is why
the CPU suite skips it).  Exits 0 iff bit-identical."""

import os
import sys

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main() -> int:
    import jax

    on_tpu = len(sys.argv) > 1 and sys.argv[1] == "tpu"
    if not on_tpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from tpulc.codecs.huffman import driver
    from tpulc.codecs.huffman.decode import huffman_decode_buffered_batch
    from tpulc.pipeline.container import Container

    rng = np.random.default_rng(3)
    parts = [
        rng.choice(np.frombuffer(b"aaab", np.uint8), 1 << 13),
        rng.integers(0, 256, 1 << 13).astype(np.uint8),  # ~8-bit codes
        rng.choice(np.frombuffer(b"the quick brown fox!", np.uint8),
                   5_123),                               # partial block
    ]
    data = np.concatenate(parts).tobytes()
    bs = 1 << 13
    comp = driver.compress(data, block_size=bs, chunk_syms=16)
    c = Container.from_bytes(comp)
    words_a, tbits_a, lens_a, offs_a, ns, chunk = \
        driver._parse_aligned_group(c.payloads, bs, 12)
    assert chunk == 16
    B = len(ns)
    args = (jnp.asarray(words_a[:B]), jnp.asarray(tbits_a[:B]),
            jnp.asarray(lens_a[:B]), jnp.asarray(offs_a[:B]))
    ref = np.asarray(driver._decode_batch_ranks(*args, chunk, 12))
    need = -(-(31 + chunk * 12) // 32) + 1
    rw = -(-(31 + need) // 32) * 32
    got = np.asarray(huffman_decode_buffered_batch(
        *args, chunk, 12, rw, interpret=not on_tpu))
    for j, n in enumerate(ns):
        if not (ref[j, :n] == got[j, :n]).all():
            print("MISMATCH in block", j)
            return 1
    print("EQUAL")
    return 0


if __name__ == "__main__":
    sys.exit(main())
