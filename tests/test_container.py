"""Container format: roundtrip, integrity, block independence."""

import numpy as np
import pytest

from tpulc.codecs import store
from tpulc.pipeline.container import Container, ContainerError


def test_container_roundtrip():
    payloads = [b"abc", b"defgh", b""]
    c = Container(
        codec_id=1, flags=0, orig_len=11, block_size=5,
        comp_sizes=[3, 5, 0], payloads=payloads, data_adler=123,
    )
    buf = c.to_bytes()
    c2 = Container.from_bytes(buf)
    assert c2.codec_id == 1 and c2.orig_len == 11 and c2.block_size == 5
    assert c2.payloads == payloads
    infos = c2.block_infos()
    assert [b.raw_size for b in infos] == [5, 5, 1]


def test_container_detects_corruption():
    c = Container(
        codec_id=1, flags=0, orig_len=3, block_size=4,
        comp_sizes=[3], payloads=[b"abc"], data_adler=1,
    )
    buf = bytearray(c.to_bytes())
    buf[6] ^= 0xFF  # flags byte inside checksummed header
    with pytest.raises(ContainerError):
        Container.from_bytes(bytes(buf))


def test_store_codec_roundtrip():
    rng = np.random.default_rng(5)
    data = rng.integers(0, 256, size=123456).astype(np.uint8).tobytes()
    comp = store.compress(data, block_size=1 << 16)
    assert store.decompress(comp) == data


def test_container_localizes_payload_corruption():
    """Per-block payload adlers (libbsc.cpp:211-219 parity): corrupting
    one payload byte names the corrupt block before any decode work."""
    payloads = [b"abc", b"defgh", b"xy"]
    c = Container(
        codec_id=1, flags=0, orig_len=12, block_size=5,
        comp_sizes=[3, 5, 2], payloads=payloads, data_adler=123,
    )
    buf = bytearray(c.to_bytes())
    # corrupt one byte inside the SECOND payload
    pay_start = len(buf) - sum(len(p) for p in payloads)
    buf[pay_start + 3 + 2] ^= 0xFF
    with pytest.raises(ContainerError, match="block 1"):
        Container.from_bytes(bytes(buf))


def test_container_rejects_hostile_fields():
    """Bounded-allocation discipline: absurd block_size or inconsistent
    nblocks is rejected before any buffer is sized from it."""
    c = Container(
        codec_id=1, flags=0, orig_len=3, block_size=4,
        comp_sizes=[3], payloads=[b"abc"], data_adler=1,
    )
    good = c.to_bytes()

    def patched(block_size=None, nblocks=None):
        import struct as _s
        buf = bytearray(good)
        if block_size is not None:
            buf[16:20] = _s.pack("<I", block_size)
        if nblocks is not None:
            buf[20:24] = _s.pack("<I", nblocks)
        # refresh header adler so only the target check fires
        from tpulc.primitives.checksum import adler32_np
        buf[28:32] = _s.pack("<I", adler32_np(bytes(buf[:28])))
        return bytes(buf)

    with pytest.raises(ContainerError, match="block_size"):
        Container.from_bytes(patched(block_size=1 << 31))
    with pytest.raises(ContainerError, match="nblocks"):
        Container.from_bytes(patched(nblocks=1 << 30))
    with pytest.raises(ContainerError):
        Container.from_bytes(good[:-1])  # truncated payload bytes
