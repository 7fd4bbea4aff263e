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
