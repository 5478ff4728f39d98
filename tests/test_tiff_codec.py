"""TIFF codec (llm/tiff_codec.py): strip decode (uncompressed + LZW +
Deflate, both byte orders, multi-strip, horizontal-differencing
predictor), gray→RGB, named refusals, multi-page probe, image_io
dispatch + cross-format dHash membership."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from verified_sources_spark.llm.tiff_codec import (
    TiffError,
    decode,
    encode,
    probe,
)


def _img(w, h, seed=0):
    rng = np.random.default_rng(seed)
    coarse = rng.integers(0, 256, size=(6, 8))
    gray = coarse[(np.arange(h) * 6) // h][:, (np.arange(w) * 8) // w]
    return np.stack([gray] * 3, axis=2).astype(np.uint8)


@pytest.mark.parametrize("kw", [
    dict(),
    dict(byte_order="MM"),
    dict(deflate=True),
    dict(rows_per_strip=7),
    dict(deflate=True, rows_per_strip=4, byte_order="MM"),
    dict(lzw=True),
    dict(lzw=True, byte_order="MM"),
    dict(lzw=True, predictor=True),
    dict(lzw=True, predictor=True, rows_per_strip=6),
    dict(deflate=True, predictor=True),
    dict(packbits=True),
    dict(packbits=True, byte_order="MM"),
    dict(packbits=True, predictor=True, rows_per_strip=6),
])
def test_roundtrip_matrix(kw):
    px = _img(30, 20, seed=4).tobytes()
    data = encode(30, 20, px, **kw)
    m = probe(data)
    assert (m["width"], m["height"], m["n_pages"]) == (30, 20, 1)
    assert decode(data)["pixels"] == px


def test_grayscale_replicates():
    gray = np.random.default_rng(1).integers(0, 256, (10, 8)).astype(np.uint8)
    out = decode(encode(8, 10, gray.tobytes(), mode="L"))
    assert out["pixels"] == np.stack([gray] * 3, axis=2).tobytes()


def test_lzw_early_change_and_table_fill():
    """A payload large enough to push code widths through 10/11/12
    bits and force a mid-stream Clear at table-fill — the early-change
    boundary (510/1022/2046 on the read side vs 511/1023/2047 on the
    write side) is exactly where GIF-style LZW decoders break on real
    scanner TIFFs."""
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, size=(120, 200, 3)).astype(np.uint8).tobytes()
    data = encode(200, 120, px, lzw=True)
    assert decode(data)["pixels"] == px
    flat = bytes([120]) * (200 * 120 * 3)
    comp = encode(200, 120, flat, lzw=True)
    assert decode(comp)["pixels"] == flat
    assert len(comp) < len(flat) // 50  # LZW genuinely compresses


def test_named_refusals():
    px = _img(8, 6).tobytes()
    data = bytearray(encode(8, 6, px))
    # patch the compression SHORT (tag 0x0103) to CCITT G4 (4): CCITT
    # decodes now, but only for genuine 1-bit single-sample layouts —
    # an 8-bit RGB body mislabeled G4 refuses with the layout named
    i = data.index(struct.pack("<HHI", 0x0103, 3, 1))
    data[i + 8 : i + 10] = struct.pack("<H", 4)
    with pytest.raises(TiffError, match="1-bit single-sample"):
        decode(bytes(data))
    data[i + 8 : i + 10] = struct.pack("<H", 7)
    with pytest.raises(TiffError, match="JPEG"):
        decode(bytes(data))


def test_error_paths():
    with pytest.raises(TiffError, match="not a TIFF"):
        probe(b"XX" + b"\x00" * 30)
    with pytest.raises(TiffError, match="truncated IFD"):
        probe(encode(8, 6, _img(8, 6).tobytes())[:40])
    with pytest.raises(TiffError, match="bad TIFF magic"):
        probe(b"II\x2b\x00" + b"\x00" * 20)  # BigTIFF magic 43: not handled


def test_image_io_dispatch_and_cross_format_dhash():
    from verified_sources_spark.llm.image_dedup import _dhash_of_pixels
    from verified_sources_spark.llm.image_io import (
        decode_image,
        sniff_image_format,
    )
    from verified_sources_spark.llm.png_codec import encode as png_encode

    img = _img(64, 48, seed=21)
    px = img.tobytes()
    tif = encode(64, 48, px, deflate=True, rows_per_strip=9)
    assert sniff_image_format(tif) == "tiff"
    out = decode_image(tif)
    assert out["format"] == "tiff" and out["pixels"] == px

    def dh(payload):
        d = decode_image(payload)
        return _dhash_of_pixels(d["pixels"], d["width"], d["height"], 3, 8)

    assert dh(tif) == dh(png_encode(64, 48, px, "RGB"))  # lossless twins


def test_packbits_golden_and_truncation():
    """Hand-computed PackBits streams (TIFF 6.0 §9 worked example
    style) decode exactly; truncated runs refuse."""
    from verified_sources_spark.llm.tiff_codec import (
        _packbits_decode,
        _packbits_encode,
    )

    # literal run of 3, repeat run of 4, no-op, literal run of 1
    stream = bytes([0x02, 0xAA, 0xBB, 0xCC, 257 - 4, 0x11, 0x80, 0x00, 0x5A])
    assert _packbits_decode(stream) == b"\xaa\xbb\xcc" + b"\x11" * 4 + b"\x5a"
    with pytest.raises(TiffError, match="truncated PackBits literal"):
        _packbits_decode(bytes([0x05, 0x01]))
    with pytest.raises(TiffError, match="truncated PackBits repeat"):
        _packbits_decode(bytes([0xFE]))
    # encoder caps runs at 128 and survives the 129-repeat boundary
    for payload in (b"\x07" * 300, b"\x07" * 129, bytes(range(256)) * 2,
                    b"", b"\x01", b"ab" + b"c" * 3 + b"de"):
        assert _packbits_decode(_packbits_encode(payload)) == payload


def test_lzw_early_change_boundary_flush():
    """A stream whose final data code lands exactly on the 510-entry
    early-change boundary: the writer's flush adds no table entry, so
    EOI goes out one bit narrower than the reader's bumped width.
    Pinned against system-libtiff ground truth (the encoder output was
    verified byte-identical to libtiff 6's, which our decoder must
    read without an expected-length escape hatch)."""
    import random

    from verified_sources_spark.llm.tiff_codec import _lzw_decode, _lzw_encode

    random.seed(0)
    base = bytes(random.randrange(33, 127) for _ in range(2000))
    # sweep lengths straddling the first boundary: at least one of
    # these ends at exactly 253 entries (the failing prefix was 416)
    for n in range(380, 460):
        d = base[:n]
        assert _lzw_decode(_lzw_encode(d)) == d
