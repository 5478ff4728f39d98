"""EPUB extraction (llm/ebook.py): spine-ordered chapter recovery,
container/OPF walks, refusal isolation, and the Spark operator."""

from __future__ import annotations

import io
import zipfile

import pytest

from verified_sources_spark.llm.ebook import (
    EbookError,
    encode_epub,
    epub_extract,
    extract_epub,
)

CHS = [("Chapter One", "It was a dark and stormy night.\nThe rain fell."),
       ("Chapter Two", "Morning came early.")]


def test_roundtrip_spine_order():
    out = extract_epub(encode_epub(CHS, title="My Book"))
    assert out["title"] == "My Book"
    assert out["n_chapters"] == 2
    assert [c["title"] for c in out["chapters"]] == [
        "Chapter One", "Chapter Two"]
    assert out["chapters"][0]["text"] == (
        "Chapter One It was a dark and stormy night. The rain fell.")
    assert out["chapters"][1]["text"] == "Chapter Two Morning came early."


def test_spine_order_overrides_zip_order():
    # reverse the spine by hand: reading order must follow the spine
    data = encode_epub(CHS)
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        parts = {n: z.read(n) for n in z.namelist()}
    parts["OEBPS/content.opf"] = parts["OEBPS/content.opf"].replace(
        b'<itemref idref="ch1"/><itemref idref="ch2"/>',
        b'<itemref idref="ch2"/><itemref idref="ch1"/>')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        zi = zipfile.ZipInfo("mimetype")
        z.writestr(zi, parts.pop("mimetype"),
                   compress_type=zipfile.ZIP_STORED)
        for n, d in parts.items():
            z.writestr(n, d)
    out = extract_epub(buf.getvalue())
    assert [c["title"] for c in out["chapters"]] == [
        "Chapter Two", "Chapter One"]
    assert [c["idx"] for c in out["chapters"]] == [0, 1]


@pytest.mark.parametrize("bad", [
    b"", b"PK\x03\x04junk", encode_epub(CHS)[:50],
])
def test_refusals(bad):
    with pytest.raises(EbookError):
        extract_epub(bad)


def test_refuses_wrong_mimetype_and_missing_spine_item():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("mimetype", b"application/zip")
        z.writestr("META-INF/container.xml", b"<x/>")
    with pytest.raises(EbookError, match="mimetype"):
        extract_epub(buf.getvalue())

    data = encode_epub(CHS)
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        parts = {n: z.read(n) for n in z.namelist()}
    parts["OEBPS/content.opf"] = parts["OEBPS/content.opf"].replace(
        b'idref="ch2"', b'idref="nope"')
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for n, d in parts.items():
            z.writestr(n, d)
    with pytest.raises(EbookError, match="not in manifest"):
        extract_epub(buf.getvalue())


def test_epub_extract_operator(spark):
    rows = [(0, encode_epub(CHS, title="B0")),
            (1, b"not an epub")]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    got = epub_extract(df).orderBy("doc_id", "chapter_idx").collect()
    assert [(r.doc_id, r.decoded_ok, r.book_title, r.chapter_idx,
             r.n_chapters, r.chapter_title) for r in got] == [
        (0, True, "B0", 0, 2, "Chapter One"),
        (0, True, "B0", 1, 2, "Chapter Two"),
        (1, False, None, None, None, None),
    ]
