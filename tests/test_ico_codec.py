"""ICO/CUR codec (llm/ico_codec.py): encoder↔decoder round trips over
DIB and PNG payloads, hand-built palette/mask goldens, AND-mask
semantics (including the XP all-zero-alpha fallback), and image_io
dispatch so favicons join the cross-format dedup path."""

from __future__ import annotations

import struct

import pytest

from verified_sources_spark.llm.ico_codec import (
    IcoError,
    decode,
    encode,
    encode_multi,
    probe,
)


def _img(w, h, seed=0, alpha=False):
    import numpy as np

    rng = np.random.default_rng(seed)
    coarse = rng.integers(0, 256, size=(6, 8))
    gray = coarse[(np.arange(h) * 6) // h][:, (np.arange(w) * 8) // w]
    ch = 4 if alpha else 3
    planes = [gray] * 3 + ([((gray * 7) % 255 + 1)] if alpha else [])
    import numpy as np

    return np.stack(planes, axis=2).astype(np.uint8).tobytes()


@pytest.mark.parametrize("png", [False, True])
@pytest.mark.parametrize("mode,alpha", [("RGB", False), ("RGBA", True)])
def test_round_trip(png, mode, alpha):
    w, h = 24, 16
    px = _img(w, h, seed=3, alpha=alpha)
    data = encode(w, h, px, mode, png=png)
    m = probe(data)
    assert m["format"] == "ico" and m["n_images"] == 1
    assert (m["images"][0]["width"], m["images"][0]["height"]) == (w, h)
    assert m["images"][0]["png"] is png
    im = decode(data)
    assert (im["width"], im["height"], im["mode"]) == (w, h, "RGBA")
    if mode == "RGBA":
        assert im["pixels"] == px
    else:  # RGB widens to opaque RGBA
        assert im["pixels"][0::4] == px[0::3]
        assert im["pixels"][3::4] == b"\xff" * (w * h)


def test_multi_entry_picks_largest():
    small = _img(8, 8, seed=1, alpha=True)
    big = _img(32, 32, seed=2, alpha=True)
    data = encode_multi([(8, 8, small, "RGBA"), (32, 32, big, "RGBA")])
    m = probe(data)
    assert m["n_images"] == 2
    im = decode(data)
    assert (im["width"], im["height"]) == (32, 32) and im["pixels"] == big
    assert decode(data, index=0)["pixels"] == small


def test_hand_built_4bit_palette_with_and_mask():
    """2x2 4-bit icon worked out by hand: palette red/green, AND mask
    knocks out the top-right pixel."""
    w = h = 2
    pal = bytes((0, 0, 255, 0, 0, 255, 0, 0)) + bytes(4 * 14)  # BGRX: red, green
    # XOR rows bottom-up, stride 4: bottom=(1,0), top=(0,1)
    xor = bytes((0x10, 0, 0, 0)) + bytes((0x01, 0, 0, 0))
    # AND rows bottom-up, stride 4: bottom none, top bit for x=1 set
    andm = bytes((0x00, 0, 0, 0)) + bytes((0x40, 0, 0, 0))
    dib = struct.pack("<IiiHHIIiiII", 40, w, h * 2, 1, 4, 0, 0, 0, 0, 0, 0)
    payload = dib + pal + xor + andm
    data = (
        struct.pack("<HHH", 0, 1, 1)
        + struct.pack("<BBBBHHII", w, h, 0, 0, 1, 4, len(payload), 22)
        + payload
    )
    im = decode(data)
    # top row: red opaque, green TRANSPARENT; bottom row: green, red
    assert im["pixels"] == bytes(
        (255, 0, 0, 255, 0, 255, 0, 0, 0, 255, 0, 255, 255, 0, 0, 255)
    )


def test_32bit_zero_alpha_falls_back_to_and_mask():
    """XP-era icons: 32-bit BGRA with an all-zero alpha channel means
    "no alpha" — transparency comes from the AND mask."""
    w = h = 2
    # all four pixels blue with alpha 0
    xor = bytes((255, 0, 0, 0)) * 4
    # AND rows are bottom-up: second stride is the top row; bit x=1 set
    andm = bytes((0x00, 0, 0, 0)) + bytes((0x40, 0, 0, 0))
    dib = struct.pack("<IiiHHIIiiII", 40, w, h * 2, 1, 32, 0, 0, 0, 0, 0, 0)
    payload = dib + xor + andm
    data = (
        struct.pack("<HHH", 0, 1, 1)
        + struct.pack("<BBBBHHII", w, h, 0, 0, 1, 32, len(payload), 22)
        + payload
    )
    im = decode(data)
    alphas = im["pixels"][3::4]
    assert alphas == bytes((255, 0, 255, 255))


def test_cur_type_and_refusals():
    px = _img(8, 8, seed=5, alpha=True)
    data = bytearray(encode(8, 8, px, "RGBA"))
    data[2] = 2  # ICONDIR type: cursor
    m = probe(bytes(data))
    assert m["format"] == "cur" and m["images"][0]["hotspot"] is not None
    with pytest.raises(IcoError, match="bad ICONDIR"):
        probe(b"\x01\x00\x01\x00\x01\x00" + bytes(16))
    with pytest.raises(IcoError, match="outside the payload"):
        probe(bytes(encode(8, 8, px, "RGBA"))[:30])
    bad = bytearray(encode(8, 8, px, "RGBA"))
    # corrupt the DIB compression field (offset 22 is the payload DIB)
    struct.pack_into("<I", bad, 22 + 16, 1)
    with pytest.raises(IcoError, match="compressed ICO DIB"):
        decode(bytes(bad))


def test_image_io_dispatch_and_cross_format_dedup():
    from verified_sources_spark.llm.image_dedup import _dhash_of_pixels
    from verified_sources_spark.llm.image_io import (
        decode_image,
        sniff_image_format,
    )
    from verified_sources_spark.llm.png_codec import encode as png_encode

    w, h = 32, 32
    px = _img(w, h, seed=9)
    ico = encode(w, h, px, "RGB")
    assert sniff_image_format(ico) == "ico"
    # weak-magic guard: 4 zero-ish bytes alone must NOT classify
    assert sniff_image_format(b"\x00\x00\x01\x00" + b"\xff" * 40) is None
    out = decode_image(ico)
    assert out["format"] == "ico" and out["mode"] == "RGBA"

    def dh(payload, ch):
        d = decode_image(payload)
        return _dhash_of_pixels(d["pixels"], d["width"], d["height"], ch, 8)

    # a favicon and its PNG twin land on the same dHash (lossless both)
    assert dh(ico, 4) == dh(png_encode(w, h, px, "RGB"), 3)
