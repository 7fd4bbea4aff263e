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
    payload_adlers 4*nblocks u32   adler32 of each compressed payload
    payloads    ...      nblocks back-to-back codec payloads

Every block is independently decodable given the container header —
the design requirement distilled from CULZSS's bookkeeping header
(`culzss.c:220-264`), bsc's per-block headers (`libbsc.cpp:211-219`)
and cudpp's returned offset tables (`include/cudpp.h:327`).  Block
independence is what the multi-host decode path shards on.

Integrity layers (libbsc parity, `libbsc.cpp:211-219` stores adler32
of data, compressed payload and header per block): the header adler
catches metadata corruption before any allocation; per-block payload
adlers localize corruption to a specific block BEFORE decode work
starts; the whole-stream data adler is the end-to-end check after
decode.  All fields are validated before use — a hostile container
cannot demand absurd allocations (bzip2's DATA_ERROR discipline).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

from tpulc.primitives.checksum import adler32_np

MAGIC = b"TPLC"
# v3: bsc per-block header grew a coder byte (21->22) and _cap_for
# granularity changed 512->1024 during round 2; the bump makes streams
# written by the older layout fail with a clear "unsupported version"
# instead of a misleading checksum error.
VERSION = 3
_HEAD = struct.Struct("<4sBBHQII")  # through nblocks
_FULL_HEAD_LEN = _HEAD.size + 8  # + data_adler + header_adler

# A block_size larger than this is rejected as hostile: drivers size
# device buffers from it, and no tpulc codec uses blocks past 256 MB
# (bsc's default is 25 MB, `bsc.cpp:76`).
MAX_BLOCK_SIZE = 256 * 1024 * 1024


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
    payload_adlers: list[int] = field(default_factory=list)

    def to_bytes(self) -> bytes:
        nblocks = len(self.payloads)
        if not self.payload_adlers:
            self.payload_adlers = [adler32_np(p) for p in self.payloads]
        head = _HEAD.pack(
            MAGIC, VERSION, self.codec_id, self.flags,
            self.orig_len, self.block_size, nblocks,
        )
        head += struct.pack("<I", self.data_adler)
        head += struct.pack("<I", adler32_np(head))
        sizes = np.asarray(self.comp_sizes, dtype="<u4").tobytes()
        adlers = np.asarray(self.payload_adlers, dtype="<u4").tobytes()
        return head + sizes + adlers + b"".join(self.payloads)

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
        # field sanity BEFORE any allocation sized from them
        if block_size > MAX_BLOCK_SIZE:
            raise ContainerError(f"block_size {block_size} exceeds limit")
        if orig_len > 0:
            if block_size == 0:
                raise ContainerError("zero block_size with nonzero data")
            expect = -(-orig_len // block_size)
            if nblocks != expect:
                raise ContainerError(
                    f"nblocks {nblocks} inconsistent with orig_len/"
                    f"block_size (expected {expect})"
                )
        if len(buf) - _FULL_HEAD_LEN < 8 * nblocks:
            raise ContainerError("truncated block tables")
        off = _FULL_HEAD_LEN
        sizes = np.frombuffer(buf[off: off + 4 * nblocks], dtype="<u4")
        off += 4 * nblocks
        adlers = np.frombuffer(buf[off: off + 4 * nblocks], dtype="<u4")
        off += 4 * nblocks
        if int(sizes.sum(dtype=np.int64)) != len(buf) - off:
            raise ContainerError("payload sizes inconsistent with buffer")
        payloads = []
        for i, s in enumerate(sizes):
            p = buf[off: off + int(s)]
            if len(p) != int(s):
                raise ContainerError("truncated block payload")
            if adler32_np(p) != int(adlers[i]):
                raise ContainerError(f"payload checksum mismatch in block {i}")
            payloads.append(p)
            off += int(s)
        return cls(
            codec_id=codec_id, flags=flags, orig_len=orig_len,
            block_size=block_size, comp_sizes=[int(s) for s in sizes],
            payloads=payloads, data_adler=data_adler,
            payload_adlers=[int(a) for a in adlers],
        )

    def block_infos(self) -> list[BlockInfo]:
        infos = []
        off = _FULL_HEAD_LEN + 8 * len(self.payloads)
        remaining = self.orig_len
        for i, s in enumerate(self.comp_sizes):
            raw = min(self.block_size, remaining) if self.block_size else remaining
            infos.append(BlockInfo(i, off, s, raw))
            off += s
            remaining -= raw
        return infos

    def verify_data(self, data: bytes) -> bool:
        return adler32_np(data) == self.data_adler
