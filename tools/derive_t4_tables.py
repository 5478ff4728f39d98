"""Derive the ITU-T T.4 Modified-Huffman run-length code tables
empirically from system libtiff (COMPRESSION_CCITTRLE = pure MH,
byte-aligned rows, no EOL), as ground truth for llm/fax_codec.py.

The tables ARE the published ITU standard's constants — this harness
just recovers them from a battle-tested implementation instead of
trusting hand transcription, the same verification posture the LZW
boundary fix used.

Technique: a row's final code is zero-filled to the byte boundary, so
codes can't be peeled off the end — instead each probed code is
ANCHORED by a following run whose two candidate codes differ in their
FIRST bit; the common prefix of the two encodings is then exactly the
probed code (asserted: the streams must diverge strictly before
either ends).  Run: python tools/derive_t4_tables.py
"""

from __future__ import annotations

import ctypes
import struct
import sys

lib = ctypes.CDLL("libtiff.so.6")
lib.TIFFOpen.restype = ctypes.c_void_p
lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
lib.TIFFWriteEncodedStrip.restype = ctypes.c_long
lib.TIFFWriteEncodedStrip.argtypes = [
    ctypes.c_void_p, ctypes.c_uint32, ctypes.c_void_p, ctypes.c_long]
lib.TIFFClose.argtypes = [ctypes.c_void_p]


def rle_encode_row(bits: list[int]) -> bytes:
    """Encode ONE bilevel row (0=white, 1=black) with libtiff MH-RLE
    and return the raw strip bytes."""
    w = len(bits)
    row = bytearray((w + 7) // 8)
    for i, b in enumerate(bits):
        if b:
            row[i // 8] |= 0x80 >> (i % 8)
    path = b"/tmp/_t4probe.tif"
    tif = lib.TIFFOpen(path, b"w")
    assert tif
    T = ctypes.c_void_p(tif)
    for tag, val in [(256, w), (257, 1), (258, 1), (259, 2), (262, 0),
                     (277, 1), (278, 1), (284, 1)]:
        assert lib.TIFFSetField(T, ctypes.c_uint32(tag), val) == 1, tag
    buf = ctypes.create_string_buffer(bytes(row), len(row))
    n = lib.TIFFWriteEncodedStrip(T, 0, buf, len(row))
    assert n > 0
    lib.TIFFClose(T)
    raw = open(path, "rb").read()
    off = struct.unpack("<I", raw[4:8])[0]
    nent = struct.unpack("<H", raw[off:off + 2])[0]
    fields = {}
    for i in range(nent):
        e = raw[off + 2 + 12 * i: off + 14 + 12 * i]
        tag, typ, cnt = struct.unpack("<HHI", e[:8])
        fields[tag] = struct.unpack("<I", e[8:12])[0]
    return raw[fields[273]:fields[273] + fields[279]]


def bits_of(data: bytes) -> str:
    return "".join(f"{b:08b}" for b in data)


def common_prefix(a: str, b: str) -> str:
    i = 0
    while i < min(len(a), len(b)) and a[i] == b[i]:
        i += 1
    assert i < min(len(a), len(b)), "streams never diverged — bad anchors"
    return a[:i]


def probe(prefix_runs: list[tuple[int, int]],
          anchor_color: int, anchors=(1, 2, 3, 4)) -> str:
    """Bits of the code sequence for ``prefix_runs`` ((color, length)
    list): the SHORTEST pairwise common prefix of encodings anchored
    by runs of ``anchor_color`` — anchor pairs whose codes share
    leading bits only lengthen the common prefix, so the minimum over
    pairs with at least one first-bit-differing pair is exact (the
    anchor set spans codes starting with both 0 and 1)."""
    def build(anchor_len):
        row = []
        for color, length in prefix_runs:
            row += [color] * length
        row += [anchor_color] * anchor_len
        return bits_of(rle_encode_row(row))

    streams = [build(a) for a in anchors]
    best = None
    for i in range(len(streams)):
        for j in range(i + 1, len(streams)):
            c = common_prefix(streams[i], streams[j])
            if best is None or len(c) < len(best):
                best = c
    return best


def main():
    # find a black anchor pair whose codes differ at the first bit:
    # try candidate pairs until the derived prefix for [1 white] is
    # stable across two different pairs
    white_term = {}
    black_term = {}
    white_makeup = {}
    black_makeup = {}

    for n in range(0, 64):
        white_term[n] = probe([(0, n)], 1)

    # black run 0 never stands alone (it only terminates exact-64k
    # runs), so probe 1..63 here and recover black_term[0] below
    for n in range(1, 64):
        pre = probe([(0, 2), (1, n)], 0)
        assert pre.startswith(white_term[2]), n
        black_term[n] = pre[len(white_term[2]):]

    for k in range(1, 41):
        m = 64 * k
        pre = probe([(0, m)], 1)
        assert pre.endswith(white_term[0]), m
        white_makeup[m] = pre[: -len(white_term[0])]

        # makeup(m) from body(m+1) = makeup + term1; term0 from
        # body(m) = makeup + term0
        pre1 = probe([(0, 2), (1, m + 1)], 0)
        body1 = pre1[len(white_term[2]):]
        assert body1.endswith(black_term[1]), m
        black_makeup[m] = body1[: -len(black_term[1])]
        pre0 = probe([(0, 2), (1, m)], 0)
        body0 = pre0[len(white_term[2]):]
        assert body0.startswith(black_makeup[m]), m
        t0 = body0[len(black_makeup[m]):]
        assert black_term.setdefault(0, t0) == t0, (m, t0)

    # consistency: composite runs decode as makeup + term
    for m, t in [(64, 13), (128, 1), (1728, 63), (2560, 0)]:
        pre = probe([(0, m + t)], 1)
        assert pre == white_makeup[m] + white_term[t], (m, t)
        pre = probe([(0, 2), (1, m + t)], 0)
        assert pre[len(white_term[2]):] == black_makeup[m] + black_term[t], \
            (m, t)

    # prefix-freeness sanity per color alphabet
    for tab in ({**white_term,
                 **{k + 10000: v for k, v in white_makeup.items()}},
                {**black_term,
                 **{k + 10000: v for k, v in black_makeup.items()}}):
        codes = list(tab.values())
        assert len(set(codes)) == len(codes)
        for i, a in enumerate(codes):
            for b in codes[i + 1:]:
                assert not a.startswith(b) and not b.startswith(a), (a, b)

    def dump(name, tab):
        print(f"{name} = {{")
        for n in sorted(tab):
            print(f"    {n}: \"{tab[n]}\",")
        print("}")

    dump("WHITE_TERM", white_term)
    dump("BLACK_TERM", black_term)
    dump("WHITE_MAKEUP", white_makeup)
    dump("BLACK_MAKEUP", black_makeup)


if __name__ == "__main__":
    sys.exit(main())
