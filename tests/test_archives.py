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

# ------------------------------------------------------- zstd + shards

def _zstd_present():
    from verified_sources_spark.llm.zstd_system import available

    return available()


def test_tar_zst_roundtrip():
    if not _zstd_present():
        pytest.skip("system libzstd not present")
    data = encode_tar(MEMBERS, compression="zst")
    assert sniff_archive_format(data) == "tzst"
    assert dict(iter_members(data)) == MEMBERS
    with pytest.raises(ArchiveError, match="tar.zst"):
        list(iter_members(data[:12]))
    # a zstd stream that is not a tar refuses with the reason named
    from verified_sources_spark.llm.zstd_system import compress

    with pytest.raises(ArchiveError, match="does not contain a tar"):
        list(iter_members(compress(b"flat text, no tar inside")))


def test_zstd_seam_contract():
    if not _zstd_present():
        pytest.skip("system libzstd not present")
    from verified_sources_spark.llm.zstd_system import (
        ZstdError, compress, compress_streamed, decompress, zstd_version,
    )

    assert zstd_version()
    data = b"shard line\n" * 50_000
    known = compress(data, level=5)
    streamed = compress_streamed(data, level=5)
    assert decompress(known) == data
    assert decompress(streamed) == data  # unknown-content-size path
    # multi-frame sequences (parallel writers concatenate frames)
    assert decompress(known + streamed) == data + data
    # bomb gates on both paths
    with pytest.raises(ZstdError, match="bomb"):
        decompress(compress(bytes(2_000_000)), max_out=10_000)
    with pytest.raises(ZstdError, match="bomb"):
        decompress(compress_streamed(bytes(2_000_000)), max_out=10_000)
    # truncation refuses instead of silently returning a prefix
    with pytest.raises(ZstdError, match="truncated"):
        decompress(streamed[: len(streamed) // 2])
    with pytest.raises(ZstdError, match="refusing by name"):
        decompress(b"PK\x03\x04 not zstd")


def test_shard_codecs_roundtrip_and_gates():
    from verified_sources_spark.llm.archives import (
        decompress_shard, encode_shard, sniff_shard_codec,
    )

    text = b"".join(b'{"id": %d}\n' % i for i in range(500))
    codecs = ["gzip", "xz", "bz2"]
    if _zstd_present():
        codecs.append("zstd")
    for codec in codecs:
        sh = encode_shard(text, codec)
        assert sniff_shard_codec(sh) == codec
        assert decompress_shard(sh) == text
        with pytest.raises(ArchiveError):
            decompress_shard(sh[: len(sh) // 2])
        with pytest.raises(ArchiveError, match="bomb"):
            decompress_shard(encode_shard(bytes(3_000_000), codec),
                             max_out=10_000)
    # concatenated members (pigz/pbzip2 shape) inflate as one stream
    assert decompress_shard(encode_shard(b"one\n", "gzip")
                            + encode_shard(b"two\n", "gzip")) == b"one\ntwo\n"
    assert decompress_shard(encode_shard(b"A\n", "bz2")
                            + encode_shard(b"B\n", "bz2")) == b"A\nB\n"
    # trailing zero padding after the last member is ignored
    assert decompress_shard(encode_shard(b"pad\n", "gzip")
                            + b"\x00" * 8) == b"pad\n"
    with pytest.raises(ArchiveError, match="unrecognized"):
        decompress_shard(b"plain text")


def test_shard_lines_spark_operator(spark):
    from verified_sources_spark.llm.archives import encode_shard, shard_lines

    zstd_ok = _zstd_present()
    rows = [
        (1, bytearray(encode_shard(b"l1\nl2\n\nl3\n", "gzip"))),
        (2, bytearray(encode_shard(b"only\n", "xz"))),
        (3, bytearray(b"not compressed")),
        (4, bytearray(encode_shard(b"", "bz2"))),  # valid but empty
    ]
    if zstd_ok:
        rows.append((5, bytearray(encode_shard(b"za\nzb\n", "zstd",
                                               streamed=True))))
    df = spark.createDataFrame(rows, "shard_id long, asset binary")
    got: dict = {}
    for r in shard_lines(df).collect():
        got.setdefault(r["shard_id"], []).append(r)
    assert [(r["line_idx"], r["text"]) for r in got[1]] == [
        (0, "l1"), (1, "l2"), (2, "l3")]  # empty line skipped
    assert all(r["codec"] == "gzip" for r in got[1])
    assert got[2][0]["text"] == "only" and got[2][0]["codec"] == "xz"
    assert got[3][0]["decoded_ok"] is False and got[3][0]["codec"] is None
    (r4,) = got[4]
    assert r4["decoded_ok"] is True and r4["line_idx"] is None
    if zstd_ok:
        assert [r["text"] for r in got[5]] == ["za", "zb"]
        assert all(r["codec"] == "zstd" for r in got[5])


def test_lz4_shards():
    from verified_sources_spark.llm.lz4_system import available

    if not available():
        pytest.skip("system liblz4 not present")
    from verified_sources_spark.llm.archives import (
        decompress_shard, encode_shard, sniff_shard_codec,
    )
    from verified_sources_spark.llm.lz4_system import (
        Lz4Error, compress, decompress,
    )

    text = b"".join(b'{"id": %d}\n' % i for i in range(500))
    sh = encode_shard(text, "lz4")
    assert sniff_shard_codec(sh) == "lz4"
    assert decompress_shard(sh) == text
    with pytest.raises(ArchiveError, match="lz4"):
        decompress_shard(sh[: len(sh) // 2])
    with pytest.raises(ArchiveError, match="bomb"):
        decompress_shard(encode_shard(bytes(3_000_000), "lz4"),
                         max_out=10_000)
    # seam contract: multi-frame + truncation + magic
    assert decompress(compress(b"a\n") + compress(b"b\n")) == b"a\nb\n"
    with pytest.raises(Lz4Error, match="truncated"):
        decompress(compress(b"x" * 100_000)[:50])
    with pytest.raises(Lz4Error, match="refusing by name"):
        decompress(b"\x00\x11garbage.....")


def test_nested_archive_explosion():
    """iter_members_recursive: archives-inside-archives explode in
    place with outer!inner paths, depth- and member-count-capped;
    a corrupt inner archive degrades to its raw bytes."""
    from verified_sources_spark.llm.archives import iter_members_recursive
    from verified_sources_spark.llm.sevenzip import encode_7z

    inner = encode_tar({"deep/a.txt": b"alpha", "b.txt": b"beta"},
                       gz=True)
    mid = encode_zip({"inner.tgz": inner, "plain.txt": b"top"})
    outer = encode_7z({"mid.zip": mid, "readme.md": b"# hi"},
                      codec="lzma2")
    got = dict(iter_members_recursive(outer))
    assert got == {"mid.zip!inner.tgz!deep/a.txt": b"alpha",
                   "mid.zip!inner.tgz!b.txt": b"beta",
                   "mid.zip!plain.txt": b"top",
                   "readme.md": b"# hi"}
    # depth cap: the innermost archive stays raw bytes
    got = dict(iter_members_recursive(outer, max_depth=1))
    assert got["mid.zip!inner.tgz"] == inner
    # corrupt inner falls through as the raw member
    broken = encode_zip({"bad.tgz": inner[:20], "ok.txt": b"x"})
    got = dict(iter_members_recursive(broken))
    assert got["bad.tgz"] == inner[:20] and got["ok.txt"] == b"x"
    # member-count explosion gate
    bomb = encode_zip({f"f{i}": b"x" for i in range(50)})
    with pytest.raises(ArchiveError, match="explosion gate"):
        dict(iter_members_recursive(bomb, max_total_members=10))


def test_nested_archive_all_or_nothing_fallback():
    """A nested archive that dies MID-iteration (early members fine,
    a later one oversized) must fall back all-or-nothing: only the
    raw blob appears, never early inner members + the blob (the
    double-yield would poison dedup).  And the explosion gate firing
    INSIDE a nested archive refuses the whole payload — it is a
    distinct exception the corrupt-inner fallback never swallows."""
    from verified_sources_spark.llm.archives import (
        ArchiveExplosionError, iter_members_recursive,
    )

    cap = 1000
    inner = encode_zip({"f0.txt": b"a", "f1.txt": b"b",
                        "f2.txt": b"c", "huge.bin": b"x" * (cap + 1)})
    outer = encode_zip({"inner.zip": inner, "ok.txt": b"fine"})
    got = dict(iter_members_recursive(outer, max_member_bytes=cap))
    assert got == {"inner.zip": inner, "ok.txt": b"fine"}
    assert not any(k.startswith("inner.zip!") for k in got)

    # gate inside a nested archive: refuse, don't degrade to bytes
    bomb_inner = encode_zip({f"f{i}": b"x" for i in range(30)})
    bomb = encode_zip({"bomb.zip": bomb_inner})
    with pytest.raises(ArchiveExplosionError, match="explosion gate"):
        dict(iter_members_recursive(bomb, max_total_members=10))

    # the discarded inner members must not consume gate budget: 3
    # surviving rows fit a 5-member cap even though the corrupt inner
    # counted 3 before dying
    got = dict(iter_members_recursive(outer, max_member_bytes=cap,
                                      max_total_members=5))
    assert len(got) == 2


def test_zip64_archives():
    """Zip64 (>65535 entries / zip64 extra fields) reads through the
    same front door — at 100 TB the >4 GiB-member and huge-entry-count
    shapes WILL appear, and stdlib zipfile serves both (EOCD64 record,
    zip64 extras); pinned here so a regression to a hand parser can't
    silently drop them."""
    import io
    import zipfile as zf_mod

    from verified_sources_spark.llm.archives import iter_members_recursive

    buf = io.BytesIO()
    with zf_mod.ZipFile(buf, "w", zf_mod.ZIP_STORED) as z:
        for i in range(65600):  # > 0xFFFF forces the Zip64 EOCD
            z.writestr(f"d/f{i:05d}", b"x")
    data = buf.getvalue()
    # the classic EOCD entry count saturates at 0xFFFF: Zip64 is live
    assert data[-22:-18] == b"PK\x05\x06" and data[-12:-10] == b"\xff\xff"
    assert sniff_archive_format(data) == "zip"
    n = sum(1 for _ in iter_members(data))
    assert n == 65600
    # the recursive walk's explosion gate admits a legit Zip64 count
    n = sum(1 for _ in iter_members_recursive(data))
    assert n == 65600

    # zip64 extra field in the local header (force_zip64 = the layout
    # a >4 GiB member carries, without materializing 4 GiB)
    buf = io.BytesIO()
    with zf_mod.ZipFile(buf, "w") as z:
        with z.open("big.bin", "w", force_zip64=True) as f:
            f.write(b"zip64-extra payload")
        z.writestr("small.txt", b"s")
    assert dict(iter_members(buf.getvalue())) == {
        "big.bin": b"zip64-extra payload", "small.txt": b"s"}
