"""Magic-byte document routing (llm/docrouter) and the mail→document
attachment chain (llm/email_ingest.email_attachment_texts)."""

from __future__ import annotations

import pytest

from verified_sources_spark.llm.docrouter import (
    DocRouteError,
    extract_document,
    sniff_document,
)
from verified_sources_spark.llm.email_ingest import (
    encode_eml,
    encode_mbox,
    iter_attachments,
    iter_msg_attachments,
)


def test_routes_every_document_family():
    from verified_sources_spark.llm.ebook import encode_epub
    from verified_sources_spark.llm.office import (
        encode_docx, encode_odt, encode_rtf,
    )
    from verified_sources_spark.llm.pdf_codec import encode_pdf
    from verified_sources_spark.llm.worddoc import encode_doc

    cases = [
        (encode_pdf([["pdf text"]]), "pdf", "pdf text"),
        (encode_docx(["docx para"]), "docx", "docx para"),
        (encode_odt(["odt para"]), "odt", "odt para"),
        (encode_rtf(["rtf para"]), "rtf", "rtf para"),
        (encode_doc(["legacy para"]), "doc", "legacy para"),
        (encode_epub([("C1", "chapter body")]), "epub", "C1 chapter body"),
        (b"<!DOCTYPE html><html><body><p>page</p></body></html>",
         "html", "page"),
        (b"# Title\n\na [link](http://x)\n", "markdown", "Title\n\na link"),
        (b"plain text\n", "text", "plain text\n"),
        (b"id,v\n1,x\n2,y\n", "delimited", "id\tv\n1\tx\n2\ty"),
        (b"\\documentclass{article}\\begin{document}"
         b"\\section{S}tex body\\end{document}", "latex",
         "S\ntex body"),
    ]
    for payload, fmt, text in cases:
        out = extract_document(payload)
        assert (out["format"], out["text"]) == (fmt, text), fmt


def test_routing_is_by_magic_not_name():
    # filename lies all the time; sniff must not care
    assert sniff_document(b"%PDF-1.4 junk") == "pdf"
    assert sniff_document(b"{\\rtf1 x}") == "rtf"


def test_named_refusals():
    for payload, name in [
        (b"\x89PNG\r\n\x1a\n" + bytes(8), "png"),
        (b"\xff\xd8\xff\xe0JFIF", "jpeg"),
        (b"ID3\x04\x00" + bytes(16), "mp3"),
        (b"\xfe\xfd\xfc binary junk \x00\x01", "binary"),
    ]:
        with pytest.raises(DocRouteError):
            extract_document(payload)
    # archives route to their own surface, not to str(bytes)
    from verified_sources_spark.llm.archives import encode_zip

    plain_zip = encode_zip({"member.txt": b"x"})
    with pytest.raises(DocRouteError, match="zip"):
        extract_document(plain_zip)
    # ...but OOXML/ODF/EPUB zips DO route (the mimetype/[Content_Types]
    # sniff separates package formats from plain archives)
    from verified_sources_spark.llm.office import encode_docx

    assert sniff_document(encode_docx(["x"])) == "docx"


def test_attachment_chain_operator(spark):
    from verified_sources_spark.llm.email_ingest import (
        email_attachment_texts,
    )
    from verified_sources_spark.llm.msgdoc import encode_msg
    from verified_sources_spark.llm.office import encode_docx
    from verified_sources_spark.llm.pdf_codec import encode_pdf

    pdf = encode_pdf([["attached pdf"]])
    rows = [
        (1, bytearray(encode_eml("S", "b\n", attachments=[
            ("r.pdf", "application/pdf", pdf),
            ("n.docx", "application/octet-stream",
             encode_docx(["attached docx"])),
            ("p.png", "image/png", b"\x89PNG\r\n\x1a\n" + bytes(4)),
        ]))),
        (2, bytearray(encode_eml("S2", "no attachments\n"))),
        (3, bytearray(b"\x00 not a mail")),
        (4, bytearray(encode_msg("S4", "a@e.com", "body",
                                 attachments=[("m.pdf", pdf)]))),
        # mbox: two messages, the second carries the attachment
        (5, bytearray(encode_mbox([
            encode_eml("m0", "x\n"),
            encode_eml("m1", "y\n", attachments=[
                ("t.txt", "text/plain", b"inner text")])]))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    got: dict = {}
    for r in email_attachment_texts(df).collect():
        got.setdefault(r["doc_id"], []).append(r)
    a = sorted(got[1], key=lambda r: r["att_idx"])
    assert [(r["filename"], r["att_format"], r["decoded_ok"], r["text"])
            for r in a] == [
        ("r.pdf", "pdf", True, "attached pdf"),
        ("n.docx", "docx", True, "attached docx"),
        ("p.png", None, False, None)]
    assert a[2]["n_bytes"] == 12  # refused media keeps its inventory
    (r2,) = got[2]
    assert r2["decoded_ok"] is True and r2["att_idx"] is None
    (r3,) = got[3]
    assert r3["decoded_ok"] is False and r3["msg_idx"] is None
    (r4,) = got[4]
    assert (r4["filename"], r4["att_format"], r4["text"]) == (
        "m.pdf", "pdf", "attached pdf")
    (r5,) = got[5]
    assert (r5["msg_idx"], r5["filename"], r5["text"]) == (
        1, "t.txt", "inner text")


def test_msg_attachment_filename_widths():
    from verified_sources_spark.llm.cfb import list_streams
    from verified_sources_spark.llm.msgdoc import encode_msg

    for uni in (True, False):
        m = encode_msg("s", "f@e.com", "b", unicode_props=uni,
                       attachments=[("café.pdf", b"DATA")])
        got = list(iter_msg_attachments(list_streams(m)))
        assert got == [("café.pdf", b"DATA")], uni
    # legacy count form still works, unnamed
    m = encode_msg("s", "f@e.com", "b", attachments=2)
    got = list(iter_msg_attachments(list_streams(m)))
    assert [p for _n, p in got] == [b"attachment payload 0",
                                    b"attachment payload 1"]


def test_archive_document_chain_operator(spark):
    from verified_sources_spark.llm.archives import encode_tar, encode_zip
    from verified_sources_spark.llm.docrouter import (
        archive_document_texts,
    )
    from verified_sources_spark.llm.office import encode_docx
    from verified_sources_spark.llm.pdf_codec import encode_pdf

    # package zips (docx) are documents, NOT exploded; a PLAIN nested
    # zip IS exploded with outer!inner paths; media refuses per member
    inner = encode_zip({"note.txt": b"nested note"})
    members = {
        "a.pdf": encode_pdf([["pdf body"]]),
        "b.docx": encode_docx(["docx body"]),
        "sub.zip": inner,
        "img.png": b"\x89PNG\r\n\x1a\n" + bytes(4),
    }
    rows = [(1, bytearray(encode_zip(members))),
            (2, bytearray(encode_tar({"t.txt": b"tar text"}, gz=True))),
            (3, bytearray(b"not an archive"))]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    got: dict = {}
    for r in archive_document_texts(df).collect():
        got.setdefault(r["doc_id"], {})[r["member_name"]] = r
    d1 = got[1]
    assert d1["a.pdf"]["text"] == "pdf body"
    assert d1["b.docx"]["doc_format"] == "docx"
    assert d1["b.docx"]["text"] == "docx body"
    assert d1["sub.zip!note.txt"]["text"] == "nested note"
    assert "sub.zip" not in d1  # exploded, not routed
    assert d1["img.png"]["decoded_ok"] is False
    assert got[2]["t.txt"]["text"] == "tar text"
    (r3,) = got[3].values()
    assert r3["decoded_ok"] is False and r3["member_name"] is None


def test_routes_round12_formats():
    from verified_sources_spark.llm.jats import encode_jats
    from verified_sources_spark.llm.mhtml import encode_mhtml
    from verified_sources_spark.llm.sedump import encode_posts
    from verified_sources_spark.llm.wikitext import encode_dump

    out = extract_document(encode_mhtml(
        "<html><body><p>saved page</p></body></html>"))
    assert (out["format"], out["text"]) == ("mhtml", "saved page")
    out = extract_document(encode_jats("T", "A", [("S", "p")]))
    assert out["format"] == "jats" and out["text"].startswith("T\nA\nS")
    # multi-document containers refuse toward their own surfaces
    with pytest.raises(DocRouteError, match="wiki_pages"):
        extract_document(encode_dump([{"title": "X", "wikitext": "b"}]))
    with pytest.raises(DocRouteError, match="se_posts"):
        extract_document(encode_posts(
            [{"post_id": 1, "body_html": "<p>q</p>"}]))


def test_routes_columnar_blobs():
    import io

    import pyarrow as pa
    import pyarrow.parquet as pq

    from verified_sources_spark.operators.avro_codec import (
        write_container,
    )

    buf = io.BytesIO()
    pq.write_table(pa.table({"a": [1, 2], "b": ["x", "y"]}), buf)
    out = extract_document(buf.getvalue())
    assert (out["format"], out["text"]) == (
        "parquet", "a\tb\n1\tx\n2\ty")
    schema = {"type": "record", "name": "R", "fields": [
        {"name": "a", "type": "long"}]}
    out = extract_document(write_container(schema, [{"a": 5}]))
    assert (out["format"], out["text"]) == ("avro", "a\n5")


def test_review_findings_regressions(spark):
    """Pinned reproductions of the round-12 review findings."""
    import io
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from verified_sources_spark.llm.archives import encode_zip
    from verified_sources_spark.llm.chatlog import (
        ChatError, parse_conversation,
    )
    from verified_sources_spark.llm.datablob import parquet_rows_blob
    from verified_sources_spark.llm.docrouter import (
        archive_document_texts,
    )
    from verified_sources_spark.llm.sedump import SeDumpError, iter_posts
    from verified_sources_spark.llm.wikitext import (
        WikiError, iter_dump_pages,
    )

    # 1: valid-64KB-head + later binary byte refuses as DocRouteError
    payload = b"clean text " * 8000 + b"\xff tail"
    with pytest.raises(DocRouteError, match="invalid UTF-8"):
        extract_document(payload)
    # ...and inside the operator it isolates as a row, not a crash
    df = spark.createDataFrame(
        [(1, bytearray(encode_zip({"t.txt": payload})))],
        "doc_id long, asset binary")
    (r,) = archive_document_texts(df).collect()
    assert r["decoded_ok"] is False and r["member_name"] == "t.txt"

    # 2: NaN/inf cells render, never raise
    buf = io.BytesIO()
    pq.write_table(pa.table({"x": [float("nan"), float("inf"), 1.0]}),
                   buf)
    out = parquet_rows_blob(buf.getvalue())
    assert out["rows"] == [["nan"], ["inf"], ["1"]]

    # 3: wide zip-of-zips bomb refuses WHOLE under the explosion
    # gate (all-or-nothing: one false row, zero member rows)
    bomb = encode_zip({f"z{i}.zip": encode_zip(
        {f"f{k}": b"x" for k in range(40)}) for i in range(5)})
    df = spark.createDataFrame([(1, bytearray(bomb))],
                               "doc_id long, asset binary")
    rows = archive_document_texts(df).collect()
    assert sum(1 for r in rows if r["decoded_ok"]) == 200  # default gate
    (r,) = archive_document_texts(df, max_total_members=50).collect()
    assert r["decoded_ok"] is False and r["member_name"] is None

    # 4: non-dict message entries refuse by name
    with pytest.raises(ChatError, match="not object"):
        parse_conversation(json.dumps({"messages": ["hi"]}))

    # 5/6: non-numeric attributes refuse through the named errors
    with pytest.raises(SeDumpError, match="non-numeric"):
        list(iter_posts(b'<posts><row Id="abc" Body="x"/></posts>'))
    with pytest.raises(WikiError, match="non-numeric"):
        list(iter_dump_pages(
            b"<mediawiki><page><title>T</title><ns>xx</ns>"
            b"<revision><text>b</text></revision></page></mediawiki>"))

    # 7: multibyte char straddling the 64KB sniff window is TEXT
    long_text = ("a" * 65535 + "é" + " tail text").encode("utf-8")
    out = extract_document(long_text)
    assert out["format"] == "text"


def test_eml_refuses_by_name_as_email():
    """A bare .eml (valid UTF-8) must NOT route as 'text' — its raw
    RFC 5322 headers + base64 attachment blocks would poison the
    dedup/quality surface; it refuses by name toward
    email_attachment_texts."""
    import pytest

    from verified_sources_spark.llm.docrouter import (
        DocRouteError, extract_document, sniff_document,
    )
    from verified_sources_spark.llm.email_ingest import (
        encode_eml, encode_mbox,
    )

    eml = encode_eml("quarterly report", "see attached",
                     attachments=[("r.pdf", "application/pdf",
                                   b"%PDF-1.4 fake")])
    assert sniff_document(eml) == "email"
    with pytest.raises(DocRouteError, match="email"):
        extract_document(eml)
    # mbox carrier sniffs the same way
    assert sniff_document(encode_mbox([eml])) == "email"
    # but header-LOOKING prose without canonical mail headers stays text
    memo = b"Priority: high\nStatus: draft\n\nplain memo body\n"
    assert sniff_document(memo) == "text"
    colons = b"name: value pairs\nbut then ordinary prose follows\n"
    assert sniff_document(colons) == "text"


def test_email_sniff_survives_window_cut_and_bom_ics_routes():
    """(1) A mail whose header block exceeds the 4 KB sniff window
    (Received/DKIM chains) must still sniff as email — the truncated
    tail fragment is dropped, not treated as a non-header line.
    (2) A BOM-prefixed .ics (the Windows/Outlook export shape) routes
    as ics exactly like its BOM-less copy."""
    from verified_sources_spark.llm.docrouter import (
        extract_document, sniff_document,
    )
    from verified_sources_spark.llm.ics_vcf import encode_ics

    received = b"".join(
        b"Received: from relay%d.example.com (relay%d) by mx; "
        b"Sat, 16 Aug 2026 00:00:%02d +0000\r\n" % (i, i, i % 60)
        for i in range(60))  # ~5 KB of plausible header chain
    mail = (b"From: a@example.com\r\nTo: b@example.com\r\n"
            + received + b"Subject: big headers\r\n\r\nbody\r\n")
    assert len(mail) > 4096
    assert sniff_document(mail) == "email"

    ics = encode_ics([{"uid": "u", "summary": "Standup",
                       "dtstart": "20240301T100000Z"}])
    for blob in (b"\xef\xbb\xbf" + ics,
                 ics.decode().encode("utf-16")):
        assert sniff_document(blob) == "ics", blob[:8]
        assert extract_document(blob)["text"] == "Standup"
    vcf = b"\xef\xbb\xbfBEGIN:VCARD\r\nFN:Ada\r\nEND:VCARD\r\n"
    assert sniff_document(vcf) == "vcard"
