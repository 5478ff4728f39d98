"""WebP-lossless VP8L codec (llm/vp8l_codec.py): full-transform
roundtrips (predictor x14, cross-color, subtract-green, palette with
every bundling width), color cache, LZ77 runs, a hand-assembled
meta-Huffman stream (a layout the fixture encoder never emits), the
spec's neighbor-distance map pinned by test vectors, image_io dispatch
with PNG-twin dHash membership, and honest error paths."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from verified_sources_spark.llm.vp8l_codec import (
    _DIST_MAP,
    Vp8lError,
    decode,
    encode,
)


def _img(w, h, ncolors=None, seed=0):
    rng = np.random.default_rng(seed)
    if ncolors:
        pal = rng.integers(0, 256, size=(ncolors, 3)).astype(np.uint8)
        return pal[rng.integers(0, ncolors, size=(h, w))]
    return rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)


def test_distance_map_matches_spec_vectors():
    """First rows of the spec's 120-entry neighbor map, verbatim."""
    assert _DIST_MAP[:24] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    ]
    assert len(_DIST_MAP) == 120 and len(set(_DIST_MAP)) == 120


@pytest.mark.parametrize("mode", list(range(14)))
def test_every_predictor_mode_roundtrips(mode):
    px = _img(23, 11, seed=mode).tobytes()
    out = decode(encode(23, 11, px, predictor=mode, subtract_green=False))
    assert out["pixels"] == px


def test_transform_combinations_roundtrip():
    px = _img(40, 28, seed=5).tobytes()
    for kw in (
        dict(subtract_green=False),
        dict(subtract_green=True),
        dict(subtract_green=True, cache_bits=4),
        dict(predictor=11, subtract_green=True, cache_bits=6),
        dict(color_transform=(10, -6, 3), subtract_green=False),
        dict(color_transform=(127, -128, 77), predictor=7,
             subtract_green=True, cache_bits=3),
    ):
        out = decode(encode(40, 28, px, **kw))
        assert out["pixels"] == px, kw
        assert out["mode"] == "RGB"


@pytest.mark.parametrize("ncolors", [2, 4, 13, 60])
def test_palette_every_bundling_width(ncolors):
    """palette sizes 2/4/13/60 hit bundling widths 3/2/1/0 bits."""
    px = _img(21, 10, ncolors=ncolors, seed=ncolors).tobytes()
    out = decode(encode(21, 10, px, palette=True, subtract_green=False))
    assert out["pixels"] == px


def test_lz77_runs_and_rgba_and_1x1():
    flat = np.full((20, 30, 3), 99, np.uint8).tobytes()
    assert decode(encode(30, 20, flat))["pixels"] == flat
    rgba = np.concatenate(
        [_img(30, 20, seed=1), np.full((20, 30, 1), 128, np.uint8)], axis=2
    ).tobytes()
    out = decode(encode(30, 20, rgba, mode="RGBA"))
    assert out["mode"] == "RGBA" and out["pixels"] == rgba
    one = bytes([10, 20, 30])
    assert decode(encode(1, 1, one))["pixels"] == one


def test_meta_huffman_stream_decodes():
    """Hand-assemble a level-0 stream with a meta-Huffman entropy image
    (two groups, different literal codes) — a layout the fixture
    encoder never emits, exercising the group-dispatch path."""
    from verified_sources_spark.llm.vp8l_codec import (
        _BitsW,
        _emit_code,
        _huff_lengths,
        _SymWriter,
    )

    w, h = 8, 2  # meta_bits=2 → 4x4 tiles → entropy image 2x1
    bw = _BitsW()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # no alpha
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(1, 1)  # meta-huffman present
    bw.write(0, 3)  # meta_bits - 2 = 0 → 4x4 tiles

    def emit_subimage(pixels):
        # sub-image stream: cache bit, 5 codes, literals only
        bw.write(0, 1)
        fg, fr, fb, fa = [0] * 280, [0] * 256, [0] * 256, [0] * 256
        fd = [0] * 40
        for p in pixels:
            fg[(p >> 8) & 0xFF] += 1
            fr[(p >> 16) & 0xFF] += 1
            fb[p & 0xFF] += 1
            fa[(p >> 24) & 0xFF] += 1
        fd[0] = 1
        lens = [_huff_lengths(f, 15) for f in (fg, fr, fb, fa, fd)]
        for ln in lens:
            _emit_code(bw, ln)
        wg, wr, wbl, wa, _wd = (_SymWriter(bw, ln) for ln in lens)
        for p in pixels:
            wg.write((p >> 8) & 0xFF)
            wr.write((p >> 16) & 0xFF)
            wbl.write(p & 0xFF)
            wa.write((p >> 24) & 0xFF)

    # entropy image: tile 0 → group 0, tile 1 → group 1 (index in green)
    emit_subimage([0xFF000000 | (0 << 8), 0xFF000000 | (1 << 8)])
    # two groups: group 0 emits solid red pixels, group 1 solid blue
    group_px = [0xFF000000 | (200 << 16) | (30 << 8) | 10,
                0xFF000000 | (20 << 16) | (40 << 8) | 250]
    for px in group_px:
        fg, fr, fb, fa = [0] * 280, [0] * 256, [0] * 256, [0] * 256
        fd = [0] * 40
        fg[(px >> 8) & 0xFF] = 1
        fr[(px >> 16) & 0xFF] = 1
        fb[px & 0xFF] = 1
        fa[0xFF] = 1
        fd[0] = 1
        for f in (fg, fr, fb, fa, fd):
            _emit_code(bw, _huff_lengths(f, 15))
        # single-symbol codes: zero bits per pixel — nothing to write
    payload = bw.flush()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    data = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk

    out = decode(data)
    assert (out["width"], out["height"]) == (8, 2)
    px = np.frombuffer(out["pixels"], np.uint8).reshape(2, 8, 3)
    # left 4 columns from group 0 (red-ish), right 4 from group 1 (blue-ish)
    assert (px[:, :4] == [200, 30, 10]).all()
    assert (px[:, 4:] == [20, 40, 250]).all()


def test_image_io_dispatch_and_png_twin_dhash_group():
    """The VERDICT done-bar: a VP8L re-encode of a photo joins its PNG
    twin's dHash group through the image_io seam."""
    from verified_sources_spark.llm.image_dedup import _dhash_of_pixels
    from verified_sources_spark.llm.image_io import (
        decode_image,
        probe_webp,
        sniff_image_format,
    )
    from verified_sources_spark.llm.png_codec import encode as png_encode

    rng = np.random.default_rng(21)
    coarse = rng.integers(0, 256, size=(6, 8))
    h, w = 48, 64
    gray = coarse[(np.arange(h) * 6) // h][:, (np.arange(w) * 8) // w]
    img = np.stack([gray] * 3, axis=2).astype(np.uint8)
    px = img.tobytes()
    png = png_encode(w, h, px, "RGB")
    webp = encode(w, h, px, predictor=2, cache_bits=5)
    assert sniff_image_format(webp) == "webp"
    assert probe_webp(webp)["variant"] == "VP8L (lossless)"

    def dh(payload):
        d = decode_image(payload)
        ch = 3 if d["mode"] == "RGB" else 4
        return _dhash_of_pixels(d["pixels"], d["width"], d["height"], ch, 8)

    out = decode_image(webp)
    assert out["format"] == "webp" and out["pixels"] == px
    assert dh(webp) == dh(png)  # lossless: EXACT dHash match
    other = png_encode(w, h, np.roll(img, 7, axis=0).tobytes(), "RGB")
    assert dh(webp) != dh(other)


def test_error_paths():
    px = _img(16, 12, seed=1).tobytes()
    data = encode(16, 12, px)
    with pytest.raises(Vp8lError, match="truncated"):
        decode(data[: len(data) - 8])
    with pytest.raises(Vp8lError, match="not a WebP"):
        decode(b"RIFF\x00\x00\x00\x00AVI " + b"\x00" * 32)
    with pytest.raises(Vp8lError, match="signature"):
        bad = bytearray(data)
        bad[20] ^= 0xFF
        decode(bytes(bad))
    # lossy VP8 chunk refuses with the variant named
    vp8 = (b"RIFF" + struct.pack("<I", 24) + b"WEBP"
           + b"VP8 " + struct.pack("<I", 12) + b"\x00" * 12)
    with pytest.raises(Vp8lError, match="lossy WebP VP8"):
        decode(vp8)
    with pytest.raises(Vp8lError, match="at most 256 colors"):
        encode(32, 32, _img(32, 32, seed=3).tobytes(), palette=True,
               subtract_green=False)


def test_vp8x_wrapped_vp8l_decodes():
    """An extended (VP8X) container whose frame is VP8L still
    pixel-decodes through the image_io seam; one with a lossy frame
    refuses naming the variant."""
    from verified_sources_spark.llm.image_io import decode_image, probe_webp

    px = _img(16, 12, seed=4).tobytes()
    plain = encode(16, 12, px)
    chunks = plain[12:]  # the VP8L chunk (+ possible pad)
    vp8x = (b"VP8X" + struct.pack("<I", 10) + b"\x00" * 4
            + (15).to_bytes(3, "little") + (11).to_bytes(3, "little"))
    body = vp8x + chunks
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
    assert probe_webp(data)["variant"] == "VP8X (extended)"
    out = decode_image(data)
    assert out["pixels"] == px and out["format"] == "webp"

    lossy = (b"VP8 " + struct.pack("<I", 12) + b"\x00" * 12)
    body = vp8x + lossy
    data = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
    from verified_sources_spark.llm import webp_system

    if webp_system.available():
        # the system seam takes the lossy path; this stub frame is
        # garbage, so it raises (a VALID lossy frame decodes — see
        # tests/test_webp_system.py)
        with pytest.raises(ValueError, match="could not decode"):
            decode_image(data)
    else:
        with pytest.raises(ValueError, match="VP8X"):
            decode_image(data)
