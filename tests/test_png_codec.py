"""Pure-stdlib PNG codec (llm/png_codec.py): golden-byte decodes of
hand-assembled PNGs (each filter type computed by hand), round trips,
and loud refusals for unsupported/corrupt forms."""

from __future__ import annotations

import struct
import zlib

import pytest

from verified_sources_spark.llm.png_codec import (
    PngError,
    decode,
    encode,
    probe,
    resize_nearest,
)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _png(width, height, color_type, raw_scanlines: bytes, extra=b"") -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0))
        + extra
        + _chunk(b"IDAT", zlib.compress(raw_scanlines))
        + _chunk(b"IEND", b"")
    )


def test_golden_filters_decode():
    """2-wide RGB image, one row per filter type, expected pixels worked
    out by hand from the spec's filter definitions."""
    # target pixels per row (RGB pairs):
    # row0 (filter 0 None):    (10,20,30) (40,50,60)
    # row1 (filter 1 Sub):     (15,25,35) (55,75,95)   -> deltas (15,25,35),(40,50,60)
    # row2 (filter 2 Up):      (20,30,40) (60,80,100)  -> diffs vs row1 (5,5,5),(5,5,5)
    # row3 (filter 3 Average): a=(left), b=(up). px (30,40,50): pred=(0+20)//2=10.. see bytes
    # row4 (filter 4 Paeth):   pred = paeth(a,b,c)
    rows = bytearray()
    rows += b"\x00" + bytes((10, 20, 30, 40, 50, 60))
    rows += b"\x01" + bytes((15, 25, 35, 40, 50, 60))
    rows += b"\x02" + bytes((5, 5, 5, 5, 5, 5))
    # row3 via Average: want (30,40,50),(70,90,110)
    #  first px: pred=(0 + up)//2 = (20,30,40)//2 = (10,15,20) -> stored 20,25,30
    #  second:   pred=((30,40,50)+(60,80,100))//2 = (45,60,75) -> stored 25,30,35
    rows += b"\x03" + bytes((20, 25, 30, 25, 30, 35))
    # row4 via Paeth: want (35,45,55),(80,100,120)
    #  first px: a=0,b=(30,40,50),c=0 -> pred=b -> stored (5,5,5)
    #  second:   a=(35,45,55), b=(70,90,110), c=(30,40,50)
    #    p = a+b-c = (75,95,115); pa=|p-a|=(40,50,60), pb=|p-b|=(5,5,5), pc=(45,55,65)
    #    pred=b -> stored (10,10,10)
    rows += b"\x04" + bytes((5, 5, 5, 10, 10, 10))
    im = decode(_png(2, 5, 2, bytes(rows)))
    px = im["pixels"]
    assert im["width"] == 2 and im["height"] == 5 and im["mode"] == "RGB"
    expect = bytes(
        (10, 20, 30, 40, 50, 60)
        + (15, 25, 35, 55, 75, 95)
        + (20, 30, 40, 60, 80, 100)
        + (30, 40, 50, 70, 90, 110)
        + (35, 45, 55, 80, 100, 120)
    )
    assert px == expect


def test_palette_and_trns():
    plte = _chunk(b"PLTE", bytes((255, 0, 0, 0, 255, 0)))
    trns = _chunk(b"tRNS", bytes((128,)))
    raw = b"\x00" + bytes((0, 1)) + b"\x00" + bytes((1, 0))
    im = decode(_png(2, 2, 3, raw, extra=plte + trns))
    assert im["mode"] == "RGBA"
    assert im["pixels"] == bytes(
        (255, 0, 0, 128, 0, 255, 0, 255, 0, 255, 0, 255, 255, 0, 0, 128)
    )


def test_gray_and_gray_alpha_expand():
    im = decode(_png(2, 1, 0, b"\x00" + bytes((7, 200))))
    assert im["mode"] == "RGB" and im["pixels"] == bytes((7, 7, 7, 200, 200, 200))
    im2 = decode(_png(1, 1, 4, b"\x00" + bytes((9, 40))))
    assert im2["mode"] == "RGBA" and im2["pixels"] == bytes((9, 9, 9, 40))


@pytest.mark.parametrize(
    "mode,ch", [("RGB", 3), ("RGBA", 4)]
)
def test_encode_decode_round_trip(mode, ch):
    import random

    rng = random.Random(7)
    w, h = 5, 4
    px = bytes(rng.randrange(256) for _ in range(w * h * ch))
    data = encode(w, h, px, mode)
    assert probe(data) == {
        "width": w, "height": h, "mode": mode, "bit_depth": 8, "interlaced": False,
    }
    im = decode(data)
    assert im["pixels"] == px and im["mode"] == mode


def test_refusals():
    with pytest.raises(PngError, match="signature"):
        probe(b"JFIF not a png")
    # corrupt a CRC
    good = bytearray(encode(1, 1, b"\x01\x02\x03", "RGB"))
    good[-5] ^= 0xFF  # inside IEND CRC
    with pytest.raises(PngError, match="CRC"):
        decode(bytes(good))
    # illegal depth/color combo refused (2-bit truecolor, ISO table 11.1)
    deep = _png(1, 1, 2, b"\x00" + bytes(6))
    deep = bytearray(deep)
    deep[24] = 2  # IHDR bit depth byte
    # fix IHDR CRC
    body = bytes(deep[16:29])
    deep[29:33] = struct.pack(">I", zlib.crc32(b"IHDR" + body) & 0xFFFFFFFF)
    with pytest.raises(PngError, match="illegal for color type"):
        decode(bytes(deep))


def test_resize_nearest():
    # 2x1 RGB red|blue upscaled to 4x2: left half red, right half blue
    px = bytes((255, 0, 0, 0, 0, 255))
    out = resize_nearest(px, 2, 1, 4, 2)
    row = bytes((255, 0, 0, 255, 0, 0, 0, 0, 255, 0, 0, 255))
    assert out == row + row


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("bit_depth", [8, 16])
@pytest.mark.parametrize("mode,ch", [("RGB", 3), ("RGBA", 4)])
def test_adam7_and_16bit_round_trip(interlace, bit_depth, mode, ch):
    """Two-sided: the encoder's Adam7/16-bit layouts decode pixel-exact,
    across dims exercising every empty/partial-pass shape."""
    import random

    rng = random.Random(13)
    for w, h in ((1, 1), (7, 3), (8, 8), (13, 11), (9, 1), (1, 9), (5, 17)):
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        data = encode(w, h, px, mode, interlace=interlace, bit_depth=bit_depth)
        p = probe(data)
        assert p["interlaced"] is interlace and p["bit_depth"] == bit_depth
        im = decode(data)
        assert (im["width"], im["height"], im["mode"]) == (w, h, mode)
        assert im["pixels"] == px


def test_sub_byte_depths():
    # 1-bit gray 8x2 checkerboard rows
    d = _png(8, 2, 0, b"\x00\xaa\x00\x55")
    d = bytearray(d)
    d[24] = 1
    d[29:33] = struct.pack(
        ">I", zlib.crc32(b"IHDR" + bytes(d[16:29])) & 0xFFFFFFFF
    )
    im = decode(bytes(d))
    exp0 = b"".join(bytes((v, v, v)) for v in (255, 0) * 4)
    exp1 = b"".join(bytes((v, v, v)) for v in (0, 255) * 4)
    assert im["pixels"] == exp0 + exp1

    # 2-bit gray 5x1: raw values 0..3,0 scale exactly to 0,85,170,255,0
    d = _png(5, 1, 0, bytes((0, 0b00011011, 0b00000000)))
    d = bytearray(d)
    d[24] = 2
    d[29:33] = struct.pack(
        ">I", zlib.crc32(b"IHDR" + bytes(d[16:29])) & 0xFFFFFFFF
    )
    im = decode(bytes(d))
    assert im["pixels"] == b"".join(
        bytes((v, v, v)) for v in (0, 85, 170, 255, 0)
    )

    # 4-bit palette 3x1: packed indices 0,1,2 resolve through PLTE
    plte = bytes((255, 0, 0, 0, 255, 0, 0, 0, 255))
    d = _png(3, 1, 3, b"\x00\x01\x20", extra=_chunk(b"PLTE", plte))
    d = bytearray(d)
    d[24] = 4
    d[29:33] = struct.pack(
        ">I", zlib.crc32(b"IHDR" + bytes(d[16:29])) & 0xFFFFFFFF
    )
    assert decode(bytes(d))["pixels"] == plte
