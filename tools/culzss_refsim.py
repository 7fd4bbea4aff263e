"""Faithful simulation of the reference CULZSS encoder.

Reproduces `cuda-lzss-cluster/gpu_compress.cu` semantics exactly:
EncodeKernel's shared-buffer layout (slidingWindow[256] = previous batch
+ current batch, uncodedLookahead[256] = current + next batch), the
per-thread one-pass FindMatch scan (`gpu_compress.cu:104-180`), and the
aftercomp greedy skip + flag-byte packer (`gpu_compress.cu:462-569`).

Purpose: establish what compression ratio the reference's own encoder
semantics actually produce on the bench corpus, and whether its output
decodes correctly under the reference decoder (`gpu_decompress.cu:120`)
— the README's claimed ratio 1.60 is otherwise unreproducible from the
wire format's decodable ceiling.
"""

from __future__ import annotations

import sys

WINDOW_SIZE = 128
MAX_CODED = 128
MAX_UNCODED = 2
PCKT = 4096
BUF = WINDOW_SIZE + MAX_CODED  # 256


def find_match(sw, ul, window_head, uncoded_head, tx, lastcheck):
    """One-pass FindMatch (gpu_compress.cu:104-180)."""
    best_len, best_off = 1, 1
    i = window_head
    j = 0
    matching = False
    maxcheck = MAX_CODED - tx * lastcheck
    loop = 0
    while loop < WINDOW_SIZE:
        if sw[i] == ul[(uncoded_head + j) % BUF]:
            j += 1
            matching = True
        else:
            if matching and j > best_len:
                best_len = j
                best_off = (i - j) % BUF
            j = 0
            matching = False
        i = (i + 1) % BUF
        loop += 1
        if loop >= maxcheck - 1:
            loop = WINDOW_SIZE
    if matching and j > best_len:
        best_len = j
        best_off = (i - j) % BUF
    return best_len, best_off


def encode_packet_pairs(packet: bytes):
    """EncodeKernel for one 4096-byte packet -> 4096 (len, byte) pairs."""
    assert len(packet) == PCKT
    sw = bytearray(b" " * WINDOW_SIZE) + bytearray(BUF - WINDOW_SIZE)
    ul = bytearray(MAX_CODED * 2)
    pairs = [None] * PCKT
    window_head = list(range(MAX_CODED))
    uncoded_head = list(range(MAX_CODED))
    filepoint = 0
    for tx in range(MAX_CODED):
        ul[tx] = packet[tx]
    filepoint += MAX_CODED
    for tx in range(MAX_CODED):
        sw[(window_head[tx] + WINDOW_SIZE) % BUF] = ul[uncoded_head[tx]]
    for tx in range(MAX_CODED):
        ul[MAX_CODED + tx] = packet[filepoint + tx]
    filepoint += MAX_CODED

    matches = [find_match(sw, ul, window_head[tx], uncoded_head[tx], tx, 0)
               for tx in range(MAX_CODED)]
    wrow = 0
    lastcheck = 0
    while filepoint <= PCKT and not lastcheck:
        for tx in range(MAX_CODED):
            ln, off = matches[tx]
            if ln >= MAX_CODED:
                ln = MAX_CODED - 1
            if ln <= MAX_UNCODED:
                pairs[wrow * MAX_CODED + tx] = (1, ul[uncoded_head[tx]])
            else:
                pairs[wrow * MAX_CODED + tx] = (ln, off)
        wrow += 1
        for tx in range(MAX_CODED):
            window_head[tx] = (window_head[tx] + MAX_CODED) % BUF
            uncoded_head[tx] = (uncoded_head[tx] + MAX_CODED) % (MAX_CODED * 2)
        if filepoint < PCKT:
            for tx in range(MAX_CODED):
                ul[(uncoded_head[tx] + MAX_CODED) % (MAX_CODED * 2)] = \
                    packet[filepoint + tx]
            filepoint += MAX_CODED
            for tx in range(MAX_CODED):
                sw[(window_head[tx] + WINDOW_SIZE) % BUF] = ul[uncoded_head[tx]]
        else:
            lastcheck = 1
            for tx in range(MAX_CODED):
                sw[(window_head[tx] + MAX_CODED) % BUF] = ord("^")
        matches = [find_match(sw, ul, window_head[tx], uncoded_head[tx], tx,
                              lastcheck)
                   for tx in range(MAX_CODED)]
    # final tail row (gpu_compress.cu:322-350)
    for tx in range(MAX_CODED):
        ln, off = matches[tx]
        if lastcheck == 1 and ln > (MAX_CODED - tx):
            ln = MAX_CODED - tx
        if ln >= MAX_CODED:
            ln = MAX_CODED - 1
        if ln <= MAX_UNCODED:
            pairs[wrow * MAX_CODED + tx] = (1, ul[uncoded_head[tx]])
        else:
            pairs[wrow * MAX_CODED + tx] = (ln, off)
    return pairs


def aftercomp(pairs):
    """Greedy skip + flag-byte packer (gpu_compress.cu:462-569)."""
    out = bytearray()
    i = 0
    flags = 0
    group = []
    nflag = 0
    while i < len(pairs):
        ln, b = pairs[i]
        if ln == 1:
            flags |= 1 << nflag
            group.append(bytes([b]))
            i += 1
        else:
            group.append(bytes([ln, b]))
            i += ln
        nflag += 1
        if nflag == 8:
            out.append(flags)
            for g in group:
                out.extend(g)
            flags, group, nflag = 0, [], 0
    if nflag:
        out.append(flags)
        for g in group:
            out.extend(g)
    return bytes(out)


def main():
    sys.path.insert(0, "/root/repo")
    from bench import make_corpus
    from tpulc.gold import culzss_gold

    data = make_corpus()
    npack = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    tot_in = tot_out = 0
    mismatch = 0
    for p in range(npack):
        pkt = data[p * PCKT:(p + 1) * PCKT]
        pairs = encode_packet_pairs(pkt)
        enc = aftercomp(pairs)
        dec = culzss_gold.decode_packet(enc)
        ok = dec == pkt
        if not ok:
            mismatch += 1
            nbad = sum(a != b for a, b in zip(dec, pkt)) + abs(
                len(dec) - len(pkt))
            print(f"packet {p}: {len(pkt)} -> {len(enc)}  DECODE MISMATCH "
                  f"({nbad} wrong bytes)")
        else:
            print(f"packet {p}: {len(pkt)} -> {len(enc)}  ok")
        tot_in += len(pkt)
        tot_out += len(enc)
    print(f"ref-sim ratio over {npack} packets: {tot_in / tot_out:.4f}  "
          f"mismatching packets: {mismatch}/{npack}")


if __name__ == "__main__":
    main()
