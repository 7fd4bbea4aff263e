"""Sharded block-parallel steps on the 8-device CPU mesh.

Replaces the reference's role of CPU gold implementations for parallel
paths (SURVEY.md §4.7): sharded output must equal the single-device
output exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpulc.dist.mesh import make_mesh
from tpulc.dist.sharded import (
    global_histogram,
    sharded_huffman_encode,
    sharded_huffman_roundtrip_step,
)


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_global_histogram_matches_numpy():
    mesh = make_mesh()
    rng = np.random.default_rng(6)
    blocks = rng.integers(0, 256, size=(16, 1024)).astype(np.uint8)
    ns = np.full((16,), 1024, np.int32)
    ns[-1] = 100  # short last block
    hist = np.asarray(global_histogram(mesh, jnp.asarray(blocks), jnp.asarray(ns)))
    want = np.bincount(
        np.concatenate([blocks[i, : ns[i]] for i in range(16)]), minlength=256
    )
    np.testing.assert_array_equal(hist, want)


def test_sharded_encode_matches_single_device():
    mesh = make_mesh()
    rng = np.random.default_rng(7)
    blocks = rng.integers(0, 256, size=(8, 2048)).astype(np.uint8)
    ns = np.full((8,), 2048, np.int32)
    codes = np.arange(256, dtype=np.uint32)
    lengths = np.full((256,), 8, np.int32)
    out_words = 2048 * 8 // 32 + 1
    words, bits = sharded_huffman_encode(
        mesh, jnp.asarray(blocks), jnp.asarray(ns),
        jnp.asarray(codes), jnp.asarray(lengths), out_words,
    )
    # 8-bit flat code: packed words are just the bytes big-endian
    from tpulc.primitives.bits import bytes_to_words_msb

    for i in range(8):
        want = np.asarray(bytes_to_words_msb(jnp.asarray(blocks[i]), out_words))
        np.testing.assert_array_equal(np.asarray(words[i]), want)
    assert np.all(np.asarray(bits) == 2048 * 8)


def test_dryrun_step_runs():
    mesh = make_mesh()
    from tpulc.dist.sharded import sharded_huffman_roundtrip_step

    step, make_args = sharded_huffman_roundtrip_step(mesh, 512)
    ghist, words, all_bits = step(*make_args(16))
    jax.block_until_ready((ghist, words, all_bits))
    assert int(jnp.sum(ghist)) == 16 * 512


def test_sharded_bz_forward_matches_single_device():
    """Sharded bz transform must equal the unsharded result exactly."""
    from tpulc.codecs.bwt.driver import _forward_batch
    from tpulc.dist.sharded import sharded_bz_forward

    mesh = make_mesh()
    step, make_args = sharded_bz_forward(mesh, 512)
    (blocks,) = make_args(16, rng_seed=42)
    syms, m, idx0, hist, anchors, ok, sizes = step(blocks)
    ref = _forward_batch(jnp.asarray(np.asarray(blocks)))
    np.testing.assert_array_equal(np.asarray(m), np.asarray(ref[1]))
    np.testing.assert_array_equal(np.asarray(idx0), np.asarray(ref[2]))
    np.testing.assert_array_equal(np.asarray(syms), np.asarray(ref[0]))
    np.testing.assert_array_equal(np.asarray(sizes), np.asarray(ref[1]))


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_multihost_assembly_single_process():
    """compress_multihost on one process == plain compress semantics."""
    import numpy as np

    from tpulc.dist.multihost import (
        assemble_container,
        block_owner,
        compress_multihost,
        local_block_indices,
    )
    from tpulc.pipeline.registry import get_codec

    data = (b"multi host block parallel compression " * 400)[:12000]
    out = compress_multihost(data, block_size=4096, codec_name="huffman")
    assert out is not None
    assert get_codec("huffman").decompress(out) == data


def test_multihost_assembly_ordering():
    """Round-robin stripes from N fake processes reassemble in order."""
    import numpy as np

    from tpulc.dist.multihost import (
        assemble_container,
        local_block_indices,
    )
    from tpulc.pipeline.container import Container
    from tpulc.pipeline.registry import CODEC_STORE, get_codec
    from tpulc.primitives.checksum import adler32_np
    from tpulc.codecs import store

    data = bytes(range(256)) * 40          # 10240 bytes
    bs = 1024
    n_blocks = 10
    n_procs = 3
    arr = np.frombuffer(data, np.uint8)
    per_proc = []
    for p in range(n_procs):
        payloads = []
        for b in local_block_indices(n_blocks, p, n_procs):
            sub = Container.from_bytes(store.compress(
                arr[b * bs: (b + 1) * bs].tobytes(), block_size=bs
            ))
            payloads.append(sub.payloads[0])
        per_proc.append(payloads)
    buf = assemble_container(
        CODEC_STORE, len(data), bs, n_blocks, per_proc, adler32_np(arr)
    )
    assert get_codec(CODEC_STORE).decompress(buf) == data


def test_sharded_bz_roundtrip_decode_equals_input():
    """Sharded DECODE coverage (round-1 VERDICT missing #6): the
    forward+inverse sharded program reproduces the original bytes."""
    from tpulc.dist.sharded import sharded_bz_roundtrip

    mesh = make_mesh()
    step, make_args = sharded_bz_roundtrip(mesh, 512)
    (blocks,) = make_args(16, rng_seed=11)
    back, sizes = step(blocks)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(blocks))


def test_sharded_bsc_rans_matches_single_device():
    """Sharded bsc/rANS forward: per-block word counts equal the
    unsharded encoder's."""
    from tpulc.codecs.bsclike.rans import CHUNK, ctx_of_stream, rans_encode_ctx
    from tpulc.codecs.bwt.masked import forward_masked
    from tpulc.dist.sharded import sharded_bsc_rans_forward

    mesh = make_mesh()
    step, make_args = sharded_bsc_rans_forward(mesh, 512)
    args = make_args(8, rng_seed=13)
    all_words, all_m = step(*args)
    blocks, ns, fq, cum = (np.asarray(a) for a in args)
    for i in range(8):
        syms, m, idx0, hist = forward_masked(
            jnp.asarray(blocks[i]), jnp.int32(ns[i])
        )
        ctx = ctx_of_stream(syms)
        w, counts, st = rans_encode_ctx(
            syms, ctx, m, jnp.asarray(fq), jnp.asarray(cum), chunk=CHUNK
        )
        assert int(all_m[i]) == int(m)
        assert int(all_words[i]) == int(counts.sum())


def test_sharded_abc_roundtrip_decode_equals_input():
    """Sharded adaptive-binary-coder (-e2) round trip on the mesh:
    encode + decode inside one shard_map program with a replicated
    init table; decoded symbols equal the input, and the all_gather'ed
    word counts match the unsharded encoder's."""
    from tpulc.codecs.bsclike.rans_adaptive import abc_encode, bucket_bits
    from tpulc.dist.sharded import sharded_abc_roundtrip

    mesh = make_mesh()
    step, make_args = sharded_abc_roundtrip(mesh, 1024)
    args = make_args(8, rng_seed=17)
    out, all_words = step(*args)
    syms, ns, inits = (np.asarray(a) for a in args)
    np.testing.assert_array_equal(np.asarray(out), syms)
    for i in range(8):
        w, counts, st = abc_encode(
            jnp.asarray(syms[i: i + 1]), jnp.asarray(ns[i: i + 1]),
            jnp.asarray(inits), bucket_bits(16 * 1024)
        )
        assert int(all_words[i]) == int(np.asarray(counts).sum())
