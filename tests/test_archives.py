"""Archive ingestion (llm/archives.py): zip/tar/tgz member explosion,
zip-bomb guard, corrupt-archive isolation, and the Spark operator."""

from __future__ import annotations

import pytest

from verified_sources_spark.llm.archives import (
    ArchiveError,
    archive_members,
    encode_tar,
    encode_zip,
    iter_members,
    sniff_archive_format,
)

MEMBERS = {"a.txt": b"alpha", "sub/b.txt": "béta".encode(),
           "c.bin": bytes(range(256))}


@pytest.mark.parametrize("fmt,enc", [
    ("zip", lambda m: encode_zip(m)),
    ("tar", lambda m: encode_tar(m)),
    ("tgz", lambda m: encode_tar(m, gz=True)),
    ("txz", lambda m: encode_tar(m, compression="xz")),
    ("tbz2", lambda m: encode_tar(m, compression="bz2")),
])
def test_member_roundtrip(fmt, enc):
    data = enc(MEMBERS)
    assert sniff_archive_format(data) == fmt
    out = dict(iter_members(data))
    assert out == MEMBERS


def test_zip_bomb_guard():
    data = encode_zip({"big.txt": b"x" * 4096})
    with pytest.raises(ArchiveError, match="cap"):
        list(iter_members(data, max_member_bytes=1024))
    data = encode_tar({"big.txt": b"x" * 4096})
    with pytest.raises(ArchiveError, match="cap"):
        list(iter_members(data, max_member_bytes=1024))


def test_corrupt_archives_raise_with_format():
    with pytest.raises(ArchiveError, match="zip"):
        list(iter_members(encode_zip(MEMBERS)[:30]))
    with pytest.raises(ArchiveError, match="tgz"):
        list(iter_members(encode_tar(MEMBERS, gz=True)[:20]))
    with pytest.raises(ArchiveError, match="unrecognized"):
        list(iter_members(b"plain text, not an archive"))


def test_directories_and_links_skipped():
    import io
    import tarfile

    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w") as tf:
        d = tarfile.TarInfo("dir/")
        d.type = tarfile.DIRTYPE
        tf.addfile(d)
        ln = tarfile.TarInfo("link")
        ln.type = tarfile.SYMTYPE
        ln.linkname = "a.txt"
        tf.addfile(ln)
        fi = tarfile.TarInfo("real.txt")
        fi.size = 4
        tf.addfile(fi, io.BytesIO(b"data"))
    out = dict(iter_members(buf.getvalue()))
    assert out == {"real.txt": b"data"}


def test_spark_operator_explodes_and_isolates(spark):
    rows = [
        (1, bytearray(encode_zip({"x.txt": b"one", "y.txt": b"two"}))),
        (2, bytearray(encode_tar({"z.txt": "café".encode()}, gz=True))),
        (3, bytearray(b"not an archive at all")),
        (4, bytearray(encode_zip({}))),  # valid but empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    got = archive_members(df).collect()
    by_doc: dict = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert {r["member_name"] for r in by_doc[1]} == {"x.txt", "y.txt"}
    assert all(r["archive_format"] == "zip" for r in by_doc[1])
    (r2,) = by_doc[2]
    assert r2["text"] == "café" and r2["n_bytes"] == 5
    (r3,) = by_doc[3]
    assert r3["decoded_ok"] is False
    (r4,) = by_doc[4]
    assert r4["decoded_ok"] is True and r4["member_name"] is None


def test_xz_bz2_corrupt_and_sniff_guards():
    with pytest.raises(ArchiveError, match="txz"):
        list(iter_members(encode_tar(MEMBERS, compression="xz")[:20]))
    with pytest.raises(ArchiveError, match="tbz2"):
        list(iter_members(encode_tar(MEMBERS, compression="bz2")[:20]))
    # 'BZh' needs the 1-9 level digit to sniff as bzip2
    assert sniff_archive_format(b"BZhX" + bytes(64)) is None
