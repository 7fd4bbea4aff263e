"""tpulc command-line driver.

The L5 layer of SURVEY.md §1: replaces the six per-project CLIs
(culzss `main.c:149`, bzip2.c, bsc.cpp:130, cuhd demo.cc:33, ...) with
one `compress`/`decompress` pair plus codec selection.

Usage:
    python -m tpulc.cli compress   -c huffman -i IN -o OUT [-b BLOCKSIZE]
    python -m tpulc.cli decompress -i IN -o OUT
"""

from __future__ import annotations

import argparse
import sys
import time

from tpulc.pipeline.container import Container
from tpulc.pipeline.registry import available_codecs, get_codec


def _parse(argv):
    p = argparse.ArgumentParser(prog="tpulc")
    sub = p.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("compress")
    c.add_argument("-c", "--codec", default="huffman",
                   choices=sorted(available_codecs()))
    c.add_argument("-i", "--input", required=True)
    c.add_argument("-o", "--output", required=True)
    c.add_argument("-b", "--block-size", type=int, default=1 << 20)
    c.add_argument("--exact", action="store_true",
                   help="lzss: reference-parity longest-match search")
    c.add_argument("--no-lzp", action="store_true",
                   help="bsc: disable the LZP preprocessor")
    c.add_argument("-m", "--sorter", default="bwt",
                   choices=["bwt", "st3", "st4", "st5", "st6", "st7",
                            "st8", "st8w"],
                   help="bsc: block sorter (BWT or Schindler ST-k; "
                        "st8w wires the next-char stream for a fully "
                        "device-resident inverse at ~2x payload)")
    c.add_argument("--filter", default="none", dest="filter_mode",
                   help="bsc: preprocessing filter "
                        "(none|reverse|reorder:N|auto)")
    c.add_argument("-e", "--coder", type=int, default=1, choices=[1, 2],
                   help="bsc: entropy coder — 1 static context rANS "
                        "(fast), 2 adaptive binary rANS (best ratio)")
    c.add_argument("--level", type=int, default=None,
                   help="bzip2: block level 1-9 (default from block size)")
    c.add_argument("--timings", action="store_true",
                   help="print per-stage timing JSON to stderr")
    d = sub.add_parser("decompress")
    d.add_argument("-i", "--input", required=True)
    d.add_argument("-o", "--output", required=True)
    d.add_argument("--timings", action="store_true",
                   help="print per-stage timing JSON to stderr")
    n = sub.add_parser("info", help="inspect a container without "
                                    "decoding (bsc_block_info role)")
    n.add_argument("-i", "--input", required=True)
    return p.parse_args(argv)


def _info(data: bytes) -> int:
    """Container introspection (libbsc's `bsc_block_info`,
    `libbsc.h:152`): codec, block geometry, per-block compressed sizes
    and checksums — no decode."""
    import json

    from tpulc.pipeline.registry import codec_name_of

    if data[:3] == b"BZh":
        nstreams = data.count(b"BZh")
        print(json.dumps({
            "format": ".bz2", "level": int(chr(data[3])),
            "streams": nstreams,
        }))
        return 0
    c = Container.from_bytes(data)
    blocks = [
        {"index": b.index, "offset": b.offset, "comp_size": b.comp_size,
         "raw_size": b.raw_size,
         "payload_adler": c.payload_adlers[b.index]}
        for b in c.block_infos()
    ]
    print(json.dumps({
        "format": "tplc",
        "codec": codec_name_of(c.codec_id),
        "orig_len": c.orig_len,
        "block_size": c.block_size,
        "nblocks": len(c.payloads),
        "comp_len": len(data),
        "ratio": round(c.orig_len / max(len(data), 1), 3),
        "data_adler": c.data_adler,
        "blocks": blocks,
    }))
    return 0


def main(argv=None):
    args = _parse(argv if argv is not None else sys.argv[1:])
    from tpulc.utils import timing
    timer = timing.enable() if getattr(args, "timings", False) else None
    with open(args.input, "rb") as f:
        data = f.read()
    if args.cmd == "info":
        return _info(data)
    t0 = time.perf_counter()
    if args.cmd == "compress":
        codec = get_codec(args.codec)
        kwargs = {"block_size": args.block_size}
        if args.codec == "lzss" and args.exact:
            kwargs["exact"] = True
        if args.codec == "bzip2" and args.level is not None:
            kwargs["level"] = args.level
        if args.codec == "bsc" and args.no_lzp:
            kwargs["use_lzp"] = False
        if args.codec == "bsc" and args.sorter != "bwt":
            kwargs["sorter"] = args.sorter
        if args.codec == "bsc" and args.filter_mode != "none":
            kwargs["filter_mode"] = args.filter_mode
        if args.codec == "bsc" and args.coder != 1:
            kwargs["coder"] = args.coder
        out = codec.compress(data, **kwargs)
        dt = time.perf_counter() - t0
        ratio = len(data) / max(len(out), 1)
        print(
            f"compressed {len(data)} -> {len(out)} bytes "
            f"(ratio {ratio:.3f}) in {dt:.3f}s "
            f"({len(data) / dt / 1e6:.2f} MB/s)"
        )
    else:
        if data[:3] == b"BZh":
            codec = get_codec("bzip2")
        else:
            codec = get_codec(Container.from_bytes(data).codec_id)
        out = codec.decompress(data)
        dt = time.perf_counter() - t0
        print(
            f"decompressed {len(data)} -> {len(out)} bytes in {dt:.3f}s "
            f"({len(out) / dt / 1e6:.2f} MB/s)"
        )
    with open(args.output, "wb") as f:
        f.write(out)
    if timer is not None:
        print(timer.json(total_bytes=len(data)), file=sys.stderr)
        timing.disable()
    return 0


if __name__ == "__main__":
    sys.exit(main())
