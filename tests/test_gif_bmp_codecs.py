"""GIF (LZW) and BMP decoders + the image_io dispatch: roundtrips,
interlace, animation probe, palette handling, refusal contracts, and
cross-format dedup through the shared dHash path."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from verified_sources_spark.llm import bmp_codec, gif_codec
from verified_sources_spark.llm.image_io import decode_image, sniff_image_format


def _pattern(w=32, h=24, seed=3, n_colors=16):
    """Paletted-friendly structured image (<=256 distinct colors)."""
    rng = np.random.default_rng(seed)
    levels = rng.integers(0, 256, size=n_colors).astype(np.uint8)
    coarse = levels[rng.integers(0, n_colors, size=(6, 8))]
    gray = coarse[(np.arange(h) * 6) // h][:, (np.arange(w) * 8) // w]
    return np.stack([gray] * 3, axis=2).astype(np.uint8)


# ------------------------------------------------------------------- GIF

def test_gif_roundtrip_exact():
    img = _pattern()
    data = gif_codec.encode(32, 24, img.tobytes())
    m = gif_codec.probe(data)
    assert (m["width"], m["height"], m["version"]) == (32, 24, "87a")
    assert m["n_frames"] == 1 and not m["animated"]
    d = gif_codec.decode(data)
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(24, 32, 3)
    assert np.array_equal(got, img)  # palette roundtrip is lossless


def test_gif_two_colors_min_code_size():
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    img[::2] = 255
    d = gif_codec.decode(gif_codec.encode(8, 8, img.tobytes()))
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(8, 8, 3)
    assert np.array_equal(got, img)


def test_gif_interlaced_rows_reorder():
    img = _pattern(16, 16, seed=9)
    data = bytearray(gif_codec.encode(16, 16, img.tobytes()))
    # craft an interlaced variant: set the interlace flag and reorder
    # the INDEX rows into pass order, then re-encode by hand
    plain = gif_codec.decode(bytes(data))
    idx_rows = []
    # recover indices by matching pixels to the palette (unique colors)
    colors, inverse = np.unique(
        np.frombuffer(img.tobytes(), dtype=np.uint8).reshape(-1, 3),
        axis=0, return_inverse=True,
    )
    grid = inverse.reshape(16, 16)
    order = [y for start, step in ((0, 8), (4, 8), (2, 4), (1, 2))
             for y in range(start, 16, step)]
    # rebuild a GIF whose pixel stream is in interlace pass order
    reordered = np.concatenate([grid[y] for y in order])
    img2 = colors[reordered].reshape(16, 16, 3).astype(np.uint8)
    data2 = bytearray(gif_codec.encode(16, 16, img2.tobytes()))
    di = bytes(data2).index(b"\x2c")
    data2[di + 9] |= 0x40  # interlace flag
    d = gif_codec.decode(bytes(data2))
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(16, 16, 3)
    assert np.array_equal(got, img)  # de-interlacing restores row order


def test_gif_animated_probe_counts_frames():
    img = _pattern(8, 8, seed=1, n_colors=4)
    one = gif_codec.encode(8, 8, img.tobytes())
    # splice a second image block before the trailer (last byte, 0x3B)
    di = one.index(b"\x2c")
    frame = one[di:-1]  # image descriptor through sub-block terminator
    two = one[:-1] + frame + one[-1:]
    m = gif_codec.probe(two)
    assert m["n_frames"] == 2 and m["animated"]
    d = gif_codec.decode(two)  # first frame only
    assert d["n_frames"] == 2
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(8, 8, 3)
    assert np.array_equal(got, img)


def test_gif_rejects_junk_and_truncation():
    with pytest.raises(gif_codec.GifError, match="not a GIF"):
        gif_codec.probe(b"GIF99a????")
    img = _pattern(16, 16)
    data = gif_codec.encode(16, 16, img.tobytes())
    with pytest.raises(gif_codec.GifError):
        gif_codec.decode(data[: len(data) // 2])
    with pytest.raises(gif_codec.GifError, match="256"):
        rng = np.random.default_rng(0)
        noisy = rng.integers(0, 256, size=(24, 24, 3)).astype(np.uint8)
        gif_codec.encode(24, 24, noisy.tobytes())


# ------------------------------------------------------------------- BMP

def test_bmp_roundtrip_24bit():
    img = _pattern(19, 13, seed=5)  # odd width: stride padding exercised
    data = bmp_codec.encode(19, 13, img.tobytes())
    m = bmp_codec.probe(data)
    assert (m["width"], m["height"], m["bits"]) == (19, 13, 24)
    assert m["compression"] == "BI_RGB" and m["bottom_up"]
    d = bmp_codec.decode(data)
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(13, 19, 3)
    assert np.array_equal(got, img)


def test_bmp_8bit_paletted():
    """Hand-build an 8-bit paletted BMP and decode it."""
    w, h = 6, 4
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (10, 20, 30)]
    idx = np.arange(w * h, dtype=np.uint8).reshape(h, w) % 4
    stride = (w + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :w] = idx[::-1]  # bottom-up
    offset = 14 + 40 + 4 * len(pal)
    body = rows.tobytes()
    data = (
        b"BM" + struct.pack("<IHHI", offset + len(body), 0, 0, offset)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(body), 0, 0,
                      len(pal), 0)
        + b"".join(bytes([b_, g, r, 0]) for r, g, b_ in pal)
        + body
    )
    d = bmp_codec.decode(data)
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(h, w, 3)
    expect = np.array(pal, dtype=np.uint8)[idx]
    assert np.array_equal(got, expect)


def test_bmp_refuses_rle4_and_junk():
    img = _pattern(8, 8)
    data = bytearray(bmp_codec.encode(8, 8, img.tobytes()))
    struct.pack_into("<I", data, 14 + 16, 2)  # compression -> BI_RLE4
    assert bmp_codec.probe(bytes(data))["compression"] == "BI_RLE4"
    with pytest.raises(bmp_codec.BmpError, match="BI_RLE4"):
        bmp_codec.decode(bytes(data))
    with pytest.raises(bmp_codec.BmpError, match="not a BMP"):
        bmp_codec.probe(b"nope")


def test_bmp_rle8_all_escape_modes():
    """Hand-build an RLE8 stream exercising runs, absolute mode (with
    the word-alignment pad), end-of-line, delta skips, end-of-bitmap."""
    w, h = 8, 3
    pal = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255)]
    # bottom row (y=0 in RLE space): run of 5x idx1, abs [2,3,2] (pad), EOL
    # middle row: delta (+2,0) skip, run 3x idx3, EOL
    # top row: run 8x idx2, EOB
    rle = bytes(
        [5, 1, 0, 3, 2, 3, 2, 0, 0, 0]      # row 0: 5-run, abs(3)+pad, EOL
        + [0, 2, 2, 0, 3, 3, 0, 0]          # row 1: delta dx=2, 3-run, EOL
        + [8, 2, 0, 1]                       # row 2: 8-run, EOB
    )
    offset = 14 + 40 + 4 * len(pal)
    data = (
        b"BM" + struct.pack("<IHHI", offset + len(rle), 0, 0, offset)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(rle), 0, 0,
                      len(pal), 0)
        + b"".join(bytes([b_, g, r, 0]) for r, g, b_ in pal)
        + rle
    )
    assert bmp_codec.probe(data)["compression"] == "BI_RLE8"
    d = bmp_codec.decode(data)
    got = np.frombuffer(d["pixels"], dtype=np.uint8).reshape(h, w, 3)
    P = np.array(pal, dtype=np.uint8)
    # bottom-up: RLE row 0 is the BOTTOM row of the top-down output
    assert np.array_equal(got[2], P[[1, 1, 1, 1, 1, 2, 3, 2]])
    assert np.array_equal(got[1], P[[0, 0, 3, 3, 3, 0, 0, 0]])
    assert np.array_equal(got[0], P[[2] * 8])


# ------------------------------------------------- cross-format dispatch

def test_image_io_dispatch_and_cross_format_dhash():
    from verified_sources_spark.llm.image_dedup import _dhash_of_pixels
    from verified_sources_spark.llm.jpeg_codec import encode as jpeg_encode
    from verified_sources_spark.llm.png_codec import encode as png_encode

    img = _pattern(32, 24, seed=11)
    payloads = {
        "png": png_encode(32, 24, img.tobytes(), "RGB"),
        "jpeg": jpeg_encode(32, 24, img.tobytes(), quality=95),
        "gif": gif_codec.encode(32, 24, img.tobytes()),
        "bmp": bmp_codec.encode(32, 24, img.tobytes()),
    }
    hashes = {}
    for fmt, payload in payloads.items():
        assert sniff_image_format(payload) == fmt
        d = decode_image(payload)
        assert d["format"] == fmt and (d["width"], d["height"]) == (32, 24)
        hashes[fmt] = _dhash_of_pixels(d["pixels"], 32, 24, 3, 8)
    base = hashes["png"]
    for fmt, hv in hashes.items():
        assert bin(base ^ hv).count("1") <= 3, fmt  # all four formats dedup
    assert sniff_image_format(b"junk") is None


def test_webp_header_probe_and_honest_refusal():
    """WebP: sniffable, header-probeable (manifest dims for all three
    bitstream layouts), pixel decode refuses by name."""
    import struct as _s

    from verified_sources_spark.llm.image_io import probe_webp

    def riff(fourcc, body):
        payload = fourcc + body
        return b"RIFF" + _s.pack("<I", 4 + len(payload)) + b"WEBP" + payload

    # VP8 lossy key frame: 3-byte tag + start code + 14-bit dims
    vp8 = riff(b"VP8 ", _s.pack("<I", 20) + b"\x00\x00\x00" + b"\x9d\x01\x2a"
               + _s.pack("<HH", 320, 240) + b"\x00" * 8)
    m = probe_webp(vp8)
    assert (m["width"], m["height"]) == (320, 240)
    assert m["variant"].startswith("VP8 ")

    # VP8L lossless: signature 0x2F + packed 14-bit (w-1, h-1)
    bits = (99 | (49 << 14))  # 100 x 50
    vp8l = riff(b"VP8L", _s.pack("<I", 5) + b"\x2f" + _s.pack("<I", bits))
    m = probe_webp(vp8l)
    assert (m["width"], m["height"]) == (100, 50)

    # VP8X extended: 24-bit (w-1, h-1) canvas
    vp8x = riff(b"VP8X", _s.pack("<I", 10) + b"\x00" * 4
                + (639).to_bytes(3, "little") + (479).to_bytes(3, "little"))
    m = probe_webp(vp8x)
    assert (m["width"], m["height"]) == (640, 480)

    assert sniff_image_format(vp8) == "webp"
    with pytest.raises(ValueError, match="WebP"):
        decode_image(vp8)


def test_extract_features_image_mode_probes_webp(spark):
    import struct as _s

    from verified_sources_spark.llm.multimodal import extract_features

    body = _s.pack("<I", 20) + b"\x00\x00\x00" + b"\x9d\x01\x2a" + _s.pack(
        "<HH", 64, 48
    ) + b"\x00" * 8
    payload = b"RIFF" + _s.pack("<I", 4 + 4 + len(body)) + b"WEBP" + b"VP8 " + body
    df = spark.createDataFrame([(1, bytearray(payload))],
                               "doc_id long, asset binary")
    got = extract_features(df, decoder="image").collect()[0]
    assert got.decoded_ok and got.format == "WEBP"
    assert (got.width, got.height) == (64, 48)


def test_resize_images_mixed_formats(spark):
    """resize_images decoder='image': any stdlib-decodable format in,
    normalized PNG out at the target dims."""
    from verified_sources_spark.llm.jpeg_codec import encode as jpeg_encode
    from verified_sources_spark.llm.multimodal import resize_images
    from verified_sources_spark.llm.png_codec import decode as png_decode

    img = _pattern(32, 24, seed=7)
    rows = [
        (1, bytearray(jpeg_encode(32, 24, img.tobytes(), quality=95))),
        (2, bytearray(gif_codec.encode(32, 24, img.tobytes()))),
        (3, bytearray(bmp_codec.encode(32, 24, img.tobytes()))),
        (4, bytearray(b"junk")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    got = {r.doc_id: r for r in
           resize_images(df, width=16, height=12, decoder="image").collect()}
    for i in (1, 2, 3):
        out = png_decode(bytes(got[i].resized))
        assert (out["width"], out["height"]) == (16, 12)
    assert got[4].resized is None  # isolation, not task failure


def test_bmp_rle4_round_trip():
    import numpy as np

    from verified_sources_spark.llm.bmp_codec import (
        decode, encode_rle4, probe,
    )

    rng = np.random.default_rng(3)
    w, h = 23, 9
    idx = rng.integers(0, 16, size=w * h).astype(np.uint8).tobytes()
    pal = [(i * 17, 255 - i * 16, (i * 37) % 256) for i in range(16)]
    d = encode_rle4(w, h, idx, pal)
    m = probe(d)
    assert m["compression"] == "BI_RLE4" and m["bits"] == 4
    want = b"".join(bytes(pal[i]) for i in idx)
    assert decode(d)["pixels"] == want


def test_bmp_bitfields_masks():
    """565, 555 and 888 masks: exact integer quantize/dequantize; the
    888 layout is lossless."""
    import numpy as np

    from verified_sources_spark.llm.bmp_codec import (
        decode, encode_bitfields, probe,
    )

    rng = np.random.default_rng(4)
    w, h = 19, 7
    rgb = rng.integers(0, 256, size=w * h * 3).astype(np.uint8).tobytes()
    for bits, masks in [(16, (0xF800, 0x07E0, 0x001F)),
                        (16, (0x7C00, 0x03E0, 0x001F)),
                        (32, (0xFF0000, 0x00FF00, 0x0000FF))]:
        d = encode_bitfields(w, h, rgb, bits=bits, masks=masks)
        assert probe(d)["compression"] == "BI_BITFIELDS"
        a = np.frombuffer(rgb, np.uint8).reshape(h, w, 3).astype(np.uint32)
        exp = np.zeros_like(a)
        for ch, mask in enumerate(masks):
            shift = (mask & -mask).bit_length() - 1
            maxv = mask >> shift
            q = (a[:, :, ch] * maxv + 127) // 255
            exp[:, :, ch] = (q * 255 + maxv // 2) // maxv
        assert decode(d)["pixels"] == exp.astype(np.uint8).tobytes()
    lossless = encode_bitfields(w, h, rgb, bits=32,
                                masks=(0xFF0000, 0xFF00, 0xFF))
    assert decode(lossless)["pixels"] == rgb


def test_bmp_rle4_absolute_and_delta_hand_assembled():
    """Absolute runs and delta skips — control codes the fixture
    encoder never emits."""
    import struct

    from verified_sources_spark.llm.bmp_codec import decode

    pal = b"".join(bytes([v, v, v, 0]) for v in (0, 128, 255, 64))
    # 6x2 image: row1 (bottom): absolute 5 nibbles [1,2,3,0,1] then
    # 1-run of 2; row0: delta (2,0) then 4-run of 3
    body = (b"\x00\x05" + bytes([0x12, 0x30, 0x10]) + b"\x00"  # abs pad
            + b"\x01\x22" + b"\x00\x00"
            + b"\x00\x02" + bytes([2, 0]) + b"\x04\x33" + b"\x00\x01")
    offset = 14 + 40 + len(pal)
    hdr = b"BM" + struct.pack("<IHHI", offset + len(body), 0, 0, offset)
    dib = struct.pack("<IiiHHIIiiII", 40, 6, 2, 1, 4, 2,
                      len(body), 0, 0, 4, 0)
    out = decode(hdr + dib + pal + body)
    px = out["pixels"]
    rows = [[tuple(px[(r * 6 + c) * 3:(r * 6 + c) * 3 + 3])
             for c in range(6)] for r in range(2)]
    g = lambda v: (v, v, v)  # noqa: E731
    # top-down: row 0 is the SECOND coded row (delta skipped 2 -> idx 0)
    assert rows[0] == [g(0), g(0), g(64), g(64), g(64), g(64)]
    # bottom row: abs [1,2,3,0,1] then a 1-run of index 2
    assert rows[1] == [g(128), g(255), g(64), g(0), g(128), g(255)]
