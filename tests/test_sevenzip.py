"""7-Zip container (llm/sevenzip): round trips across all three
supported coders × both metadata-header layouts, CRC gates, bomb
gates, named refusals, and the archives-front-door dispatch.

No 7z implementation exists in this environment to cross-check
against, so the compressed payloads ride stdlib ``lzma`` raw streams
(battle-tested) and the container walk is pinned by these fixtures
plus hand-corrupted structures; AES and multi-coder (BCJ) archives
refuse by name rather than risk a silent mis-parse.
"""

from __future__ import annotations

import struct

import pytest

from verified_sources_spark.llm.sevenzip import (
    SevenZipError, encode_7z, iter_7z_members,
)

MEMBERS = {"doc.txt": b"hello seven zip " * 200,
           "nested/dir/file.json": b'{"k": 1}',
           "empty.txt": b"",
           "unié.md": "café content".encode()}


@pytest.mark.parametrize("codec", ["copy", "lzma1", "lzma2"])
@pytest.mark.parametrize("encoded_header", [False, True],
                         ids=["plain-hdr", "lzma-hdr"])
def test_round_trip(codec, encoded_header):
    d = encode_7z(MEMBERS, codec=codec, encoded_header=encoded_header)
    assert dict(iter_7z_members(d)) == MEMBERS


def test_crc_and_guards():
    d = bytearray(encode_7z(MEMBERS, codec="copy"))
    # flip a payload byte: the folder CRC catches it even for Copy
    d[40] ^= 0xFF
    with pytest.raises(SevenZipError, match="CRC"):
        dict(iter_7z_members(bytes(d)))
    d2 = bytearray(encode_7z(MEMBERS))
    d2[-3] ^= 1
    with pytest.raises(SevenZipError, match="header CRC"):
        dict(iter_7z_members(bytes(d2)))
    with pytest.raises(SevenZipError, match="magic"):
        dict(iter_7z_members(b"PK\x03\x04 not 7z....."))
    big = encode_7z({"big": bytes(5_000_000)}, codec="lzma2")
    with pytest.raises(SevenZipError, match="bomb"):
        dict(iter_7z_members(big, max_member_bytes=100_000))


def test_named_refusals_hand_assembled():
    """AES and multi-coder folders refuse by name — assembled by
    patching a good archive's coder records and re-wrapping with
    fresh header CRCs."""
    import zlib

    d = encode_7z({"a": b"x" * 100}, codec="copy")
    nh_off, nh_size = struct.unpack_from("<QQ", d, 12)
    body, header = d[32 : 32 + nh_off], d[32 + nh_off:]
    assert len(header) == nh_size

    def rewrap(hdr: bytes) -> bytes:
        nh = struct.pack("<QQI", len(body), len(hdr), zlib.crc32(hdr))
        return (b"7z\xbc\xaf\x27\x1c\x00\x04"
                + struct.pack("<I", zlib.crc32(nh)) + nh + body + hdr)

    # the copy coder record: kFolder nf ext numCoders flags id
    i = header.index(b"\x0b\x01\x00\x01\x01\x00")
    aes_hdr = header[: i + 4] + b"\x04\x06\xf1\x07\x01" + header[i + 6:]
    with pytest.raises(SevenZipError, match="AES"):
        dict(iter_7z_members(rewrap(aes_hdr)))
    multi_hdr = header[: i + 3] + b"\x02" + header[i + 4:]
    with pytest.raises(SevenZipError, match="multi-coder"):
        dict(iter_7z_members(rewrap(multi_hdr)))


def test_empty_file_vs_directory_entries():
    """kEmptyFile (0x0F) semantics: an empty-stream entry is a FILE
    only when its empty-file bit is set; clear (or the property
    absent) means directory — skipped, like zip/tar dirs, so archive
    member counts don't inflate."""
    import zlib

    d = encode_7z({"f.txt": b"data", "empty.txt": b"", "dir": b""},
                  codec="copy")
    nh_off, nh_size = struct.unpack_from("<QQ", d, 12)
    body, header = d[32 : 32 + nh_off], d[32 + nh_off:]

    def rewrap(hdr: bytes) -> bytes:
        nh = struct.pack("<QQI", len(body), len(hdr), zlib.crc32(hdr))
        return (b"7z\xbc\xaf\x27\x1c\x00\x04"
                + struct.pack("<I", zlib.crc32(nh)) + nh + body + hdr)

    # encoder marks both empty streams as empty files
    assert dict(iter_7z_members(d)) == {
        "f.txt": b"data", "empty.txt": b"", "dir": b""}
    i = header.index(b"\x0f\x01\xc0")  # kEmptyFile, size 1, bits 11
    # clear the second empty entry's bit: 'dir' becomes a directory
    patched = header[:i] + b"\x0f\x01\x80" + header[i + 3:]
    assert dict(iter_7z_members(rewrap(patched))) == {
        "f.txt": b"data", "empty.txt": b""}
    # property absent entirely: all empty streams are directories
    stripped = header[:i] + header[i + 3:]
    assert dict(iter_7z_members(rewrap(stripped))) == {"f.txt": b"data"}


def test_number_encoding_round_trip():
    from verified_sources_spark.llm.sevenzip import _Rd, _wnum

    for v in (0, 1, 0x7F, 0x80, 0xFFFF, 1 << 40, (1 << 63) - 1):
        r = _Rd(_wnum(v))
        assert r.number() == v, v


def test_archives_front_door_dispatch():
    from verified_sources_spark.llm.archives import (
        ArchiveError, iter_members, sniff_archive_format,
    )

    d = encode_7z(MEMBERS, codec="lzma2", encoded_header=True)
    assert sniff_archive_format(d) == "7z"
    assert dict(iter_members(d)) == MEMBERS
    with pytest.raises(ArchiveError, match="7z"):
        list(iter_members(d[:50]))
