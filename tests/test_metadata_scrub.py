"""PNG text chunks (llm/png_text.py) + ID3 tags (llm/id3.py): the
non-JPEG members of the metadata-compliance trio — inventory across
encodings/chunk kinds, pixel/stream-preserving scrubs, error paths."""

from __future__ import annotations

import pytest

from verified_sources_spark.llm.id3 import (
    Id3Error,
    build_id3v2,
    probe_id3,
    strip_id3,
)
from verified_sources_spark.llm.mp3_codec import encode_stub as mp3_encode
from verified_sources_spark.llm.mp3_codec import probe as mp3_probe
from verified_sources_spark.llm.png_codec import decode as png_decode
from verified_sources_spark.llm.png_codec import encode as png_encode
from verified_sources_spark.llm.png_text import (
    PngTextError,
    add_text,
    probe_text,
    strip_text,
)


def _png():
    return png_encode(16, 12, bytes([7]) * (16 * 12 * 3), "RGB")


def test_png_text_all_chunk_kinds():
    png = _png()
    tagged = add_text(png, [
        ("Author", "someone", "tEXt"),
        ("parameters", "prompt: a cat, steps=30, seed=42", "zTXt"),
        ("Comment", "unicode ☃ comment", "iTXt"),
    ])
    m = probe_text(tagged)
    assert m["has_text"]
    assert ("parameters", "prompt: a cat, steps=30, seed=42",
            "zTXt") in m["entries"]
    assert ("Comment", "unicode ☃ comment", "iTXt") in m["entries"]
    clean = strip_text(tagged)
    assert not probe_text(clean)["has_text"]
    assert png_decode(clean)["pixels"] == png_decode(png)["pixels"]
    assert strip_text(clean) == clean  # idempotent


def test_png_text_errors():
    with pytest.raises(PngTextError, match="not a PNG"):
        probe_text(b"\xff\xd8" + b"\x00" * 30)
    with pytest.raises(PngTextError, match="truncated"):
        probe_text(_png()[:20])
    assert probe_text(_png()) == {
        "has_text": False, "entries": [], "has_exif_chunk": False,
        "has_time_chunk": False}


@pytest.mark.parametrize("major", [3, 4])
@pytest.mark.parametrize("encoding", [0, 1, 3])
def test_id3_version_encoding_matrix(major, encoding):
    mp3 = mp3_encode(n_frames=8)
    title = "Tïtle ☃" if encoding else "Title"
    data = (build_id3v2({"TIT2": title, "TPE1": "Artist", "TALB": "Album"},
                        major=major, encoding=encoding)
            + mp3 + b"TAG" + b"\x00" * 125)
    m = probe_id3(data)
    assert m["version"] == f"2.{major}" and m["has_id3v1"]
    assert m["title"] == title and m["artist"] == "Artist"
    assert m["album"] == "Album"
    clean = strip_id3(data)
    assert clean == mp3  # frame stream byte-identical
    assert mp3_probe(clean)["n_frames"] == 8
    s = probe_id3(clean)
    assert not s["has_id3v2"] and not s["has_id3v1"]


@pytest.mark.parametrize("major", [3, 4])
def test_id3_extended_header_frames_not_dropped(major):
    """Regression (round-10 ADVICE): v2.3's extended-header size field
    excludes its own 4 bytes (v2.4's syncsafe size includes itself);
    skipping both alike landed 4 bytes short on v2.3 and the frame walk
    read the ext header's tail as padding, silently dropping EVERY
    frame (TIT2 'hello' probed as frames=[], title=None)."""
    data = build_id3v2({"TIT2": "hello"}, major=major,
                       extended_header=True) + mp3_encode(n_frames=4)
    m = probe_id3(data)
    assert m["frames"] == ["TIT2"] and m["title"] == "hello"
    assert mp3_probe(strip_id3(data))["n_frames"] == 4


@pytest.mark.parametrize("encoding", [0, 1])
def test_id3v22_three_char_frames(encoding):
    mp3 = mp3_encode(n_frames=5)
    title = "Tïtle ☃" if encoding else "Title"
    data = build_id3v2({"TT2": title, "TP1": "Artist", "TAL": "Album",
                        "TYE": "1999"},
                       major=2, encoding=encoding) + mp3
    m = probe_id3(data)
    assert m["version"] == "2.2"
    assert m["frames"] == ["TT2", "TP1", "TAL", "TYE"]
    assert (m["title"], m["artist"], m["album"], m["year"]) == (
        title, "Artist", "Album", "1999")
    assert strip_id3(data) == mp3
    with pytest.raises(Id3Error, match="only latin-1/UTF-16"):
        build_id3v2({"TT2": "x"}, major=2, encoding=3)
    with pytest.raises(Id3Error, match="compressed tag"):
        bad = bytearray(data)
        bad[5] |= 0x40
        probe_id3(bytes(bad))


@pytest.mark.parametrize("major", [2, 3, 4])
def test_id3_cover_art_dedups_against_standalone_twin(major):
    """An MP3's embedded cover art is an image asset: extraction must
    recover the byte-identical JPEG, so it exact-dedups against its
    standalone twin and decodes through the normal image path."""
    from verified_sources_spark.llm.id3 import extract_pictures
    from verified_sources_spark.llm.image_io import decode_image
    from verified_sources_spark.llm.jpeg_codec import encode as jpg_enc

    twin = jpg_enc(8, 6, bytes([42]) * (8 * 6 * 3), quality=90)
    data = build_id3v2(
        {("TT2" if major == 2 else "TIT2"): "t"}, major=major,
        encoding=0, pictures=[("image/jpeg", 3, "cover", twin)],
    ) + mp3_encode(n_frames=3)
    m = probe_id3(data)
    assert m["n_pictures"] == 1
    (pic,) = extract_pictures(data)
    assert pic["mime"] == "image/jpeg" and pic["pic_type"] == 3
    assert pic["description"] == "cover"
    assert pic["image"] == twin  # byte-identical: exact-dedup joinable
    im = decode_image(pic["image"])
    assert (im["width"], im["height"]) == (8, 6)
    assert extract_pictures(strip_id3(data)) == []


def test_id3_errors_and_untagged():
    m = probe_id3(mp3_encode())
    assert not m["has_id3v2"] and m["title"] is None
    with pytest.raises(Id3Error, match="truncated ID3v2 header"):
        probe_id3(b"ID3\x04\x00")
    with pytest.raises(Id3Error, match="truncated ID3v2 tag"):
        probe_id3(b"ID3\x04\x00\x00" + bytes([0, 0, 0x7F, 0x7F]) + b"\x00" * 5)
    with pytest.raises(Id3Error, match="syncsafe"):
        probe_id3(b"ID3\x04\x00\x00\xff\xff\xff\xff" + b"\x00" * 64)
