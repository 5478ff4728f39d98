"""HEIF/HEIC/AVIF manifest probe (llm/heif_codec): ipma-associated
primary-item dims (the thumbnail trap), brand/codec facts, named
refusals, and the image_io dispatch posture."""

from __future__ import annotations

import struct

import pytest

from verified_sources_spark.llm.heif_codec import (
    HeifError, encode_stub, probe,
)


@pytest.mark.parametrize("brand,codec", [
    (b"heic", b"hvc1"), (b"avif", b"av01"), (b"mif1", b"hvc1"),
])
@pytest.mark.parametrize("thumb", [True, False], ids=["thumb", "plain"])
def test_probe_primary_item(brand, codec, thumb):
    d = encode_stub(640, 480, codec=codec, brand=brand, thumb=thumb)
    m = probe(d)
    # with thumb=True the half-size ispe is listed FIRST in ipco: a
    # probe that ignored ipma would report 320x240 here
    assert (m["width"], m["height"]) == (640, 480)
    assert m["brand"] == brand.decode() and m["codec"] == codec.decode()
    assert m["n_items"] == (2 if thumb else 1)


def test_probe_fallback_without_ipma():
    """Old files may omit ipma — the probe falls back to the largest
    ispe.  Hand-strip the ipma box from a fixture."""
    d = encode_stub(640, 480, thumb=True)
    i = d.index(b"ipma") - 4
    (size,) = struct.unpack_from(">I", d, i)
    stripped = d[:i] + d[i + size:]
    # fix the enclosing iprp and meta box sizes
    out = bytearray(stripped)
    for fourcc in (b"iprp", b"meta"):
        j = out.index(fourcc) - 4
        (s0,) = struct.unpack_from(">I", out, j)
        struct.pack_into(">I", out, j, s0 - size)
    m = probe(bytes(out))
    assert (m["width"], m["height"]) == (640, 480)  # largest ispe


def test_named_refusals():
    with pytest.raises(HeifError, match="no ftyp"):
        probe(b"not bmff....")
    with pytest.raises(HeifError, match="not a HEIF/AVIF image brand"):
        probe(b"\x00\x00\x00\x18ftypisom" + bytes(12))
    d = encode_stub(8, 8)
    with pytest.raises(HeifError, match="truncated"):
        probe(d[:40])


def test_image_io_dispatch():
    from verified_sources_spark.llm.image_io import (
        decode_image, sniff_image_format,
    )

    d = encode_stub(100, 80, brand=b"avif", codec=b"av01")
    assert sniff_image_format(d) == "heif"
    with pytest.raises(ValueError, match="heif_codec.probe serves"):
        decode_image(d)
