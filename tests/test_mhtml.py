"""MHTML web-archive ingestion (llm/mhtml): round trips, root-part
discovery, charset honor, refusals, and the Spark operator."""

from __future__ import annotations

import pytest

from verified_sources_spark.llm.mhtml import (
    MhtmlError,
    encode_mhtml,
    mhtml_extract,
    parse_mhtml,
)

PAGE = ("<html><head><title>T</title></head>"
        "<body><p>saved page body</p></body></html>")


def test_round_trip_with_resources():
    m = encode_mhtml(PAGE, resources=[
        ("http://e/a.png", "image/png", b"\x89PNG1234"),
        ("http://e/s.css", "text/css", b"p{}"),
        ("http://e/b.png", "image/png", b"\x89PNG5678")])
    out = parse_mhtml(m)
    assert out["title"] == "T" and out["text"] == "saved page body"
    assert out["location"] == "http://example.com/saved"
    assert out["n_resources"] == 3
    assert out["resource_types"] == "image/png;text/css"


def test_quoted_printable_actually_decodes():
    # the '=3D' trap: attribute-heavy HTML is QP-dense; decoding it as
    # plain text leaves =3D garble in the corpus
    html = '<html><body><p data-x="1">a=b &amp; c</p></body></html>'
    m = encode_mhtml(html)
    assert b"=3D" in m  # the wire really is QP
    assert parse_mhtml(m)["text"] == "a=b & c"


def test_charset_honored():
    m = encode_mhtml("<html><body><p>café déjà</p></body></html>",
                     charset="iso-8859-1")
    assert parse_mhtml(m)["text"] == "café déjà"


def test_start_parameter_selects_root():
    # hand-assembled: root named by start= Content-ID, NOT first part
    b = "BNDX"
    raw = (
        f'Content-Type: multipart/related; type="text/html"; '
        f'start="<root@x>"; boundary="{b}"\r\nMIME-Version: 1.0'
        f"\r\n\r\n"
        f"--{b}\r\nContent-Type: text/html\r\n"
        f"Content-ID: <decoy@x>\r\n\r\n"
        f"<html><body><p>decoy</p></body></html>\r\n"
        f"--{b}\r\nContent-Type: text/html\r\n"
        f"Content-ID: <root@x>\r\n\r\n"
        f"<html><body><p>the real root</p></body></html>\r\n"
        f"--{b}--\r\n").encode()
    out = parse_mhtml(raw)
    assert out["text"] == "the real root"
    assert out["n_resources"] == 1  # the decoy inventories as resource


def test_refusals():
    with pytest.raises(MhtmlError, match="not MHTML"):
        parse_mhtml(b"plain text payload")
    with pytest.raises(MhtmlError, match="no root"):
        b = "BB"
        parse_mhtml(
            (f'Content-Type: multipart/related; boundary="{b}"\r\n'
             f"MIME-Version: 1.0\r\n\r\n--{b}\r\n"
             f"Content-Type: image/png\r\n\r\nx\r\n--{b}--\r\n"
             ).encode())


def test_spark_operator(spark):
    rows = [(1, bytearray(encode_mhtml(PAGE))),
            (2, bytearray(b"not mhtml"))]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    got = {r["doc_id"]: r for r in mhtml_extract(df).collect()}
    assert got[1]["decoded_ok"] is True
    assert got[1]["text"] == "saved page body"
    assert got[2]["decoded_ok"] is False
