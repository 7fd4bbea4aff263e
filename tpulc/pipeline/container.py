"""tpulc container format.

Layout (all integers little-endian):

    magic   4  b"TPLC"
    version 1  u8
    codec   1  u8   (see pipeline.registry)
    flags   2  u16
    orig_len    8  u64   total uncompressed bytes
    block_size  4  u32   nominal uncompressed block size
    nblocks     4  u32
    data_adler  4  u32   adler32 of the uncompressed data
    header_adler 4 u32   adler32 of the 24 bytes above
    comp_sizes  4*nblocks u32
    payloads    ...      nblocks back-to-back codec payloads

Every block is independently decodable given the container header —
the design requirement distilled from CULZSS's bookkeeping header
(`culzss.c:220-264`), bsc's per-block headers (`libbsc.cpp:211-219`)
and cudpp's returned offset tables (`include/cudpp.h:327`).  Block
independence is what the multi-host decode path shards on.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np

from tpulc.primitives.checksum import adler32_np

MAGIC = b"TPLC"
VERSION = 1
_HEAD = struct.Struct("<4sBBHQII")  # through nblocks
_FULL_HEAD_LEN = _HEAD.size + 8  # + data_adler + header_adler


class ContainerError(ValueError):
    pass


@dataclass
class BlockInfo:
    index: int
    offset: int          # payload byte offset within the container
    comp_size: int
    raw_size: int        # uncompressed size of this block


@dataclass
class Container:
    codec_id: int
    flags: int
    orig_len: int
    block_size: int
    comp_sizes: list[int]
    payloads: list[bytes]
    data_adler: int = 1

    def to_bytes(self) -> bytes:
        nblocks = len(self.payloads)
        head = _HEAD.pack(
            MAGIC, VERSION, self.codec_id, self.flags,
            self.orig_len, self.block_size, nblocks,
        )
        head += struct.pack("<I", self.data_adler)
        head += struct.pack("<I", adler32_np(head))
        sizes = np.asarray(self.comp_sizes, dtype="<u4").tobytes()
        return head + sizes + b"".join(self.payloads)

    @classmethod
    def from_bytes(cls, buf: bytes) -> "Container":
        if len(buf) < _FULL_HEAD_LEN:
            raise ContainerError("truncated container header")
        magic, ver, codec_id, flags, orig_len, block_size, nblocks = _HEAD.unpack(
            buf[: _HEAD.size]
        )
        if magic != MAGIC:
            raise ContainerError("bad magic")
        if ver != VERSION:
            raise ContainerError(f"unsupported version {ver}")
        data_adler, header_adler = struct.unpack(
            "<II", buf[_HEAD.size:_FULL_HEAD_LEN]
        )
        if adler32_np(buf[: _HEAD.size + 4]) != header_adler:
            raise ContainerError("header checksum mismatch")
        off = _FULL_HEAD_LEN
        sizes = np.frombuffer(buf[off: off + 4 * nblocks], dtype="<u4")
        off += 4 * nblocks
        payloads = []
        for s in sizes:
            payloads.append(buf[off: off + int(s)])
            if len(payloads[-1]) != int(s):
                raise ContainerError("truncated block payload")
            off += int(s)
        return cls(
            codec_id=codec_id, flags=flags, orig_len=orig_len,
            block_size=block_size, comp_sizes=[int(s) for s in sizes],
            payloads=payloads, data_adler=data_adler,
        )

    def block_infos(self) -> list[BlockInfo]:
        infos = []
        off = _FULL_HEAD_LEN + 4 * len(self.payloads)
        remaining = self.orig_len
        for i, s in enumerate(self.comp_sizes):
            raw = min(self.block_size, remaining) if self.block_size else remaining
            infos.append(BlockInfo(i, off, s, raw))
            off += s
            remaining -= raw
        return infos

    def verify_data(self, data: bytes) -> bool:
        return adler32_np(data) == self.data_adler
