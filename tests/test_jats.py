"""JATS article extraction (llm/jats): inline keep/drop semantics,
section walk, captions, refusals, Spark operator."""

from __future__ import annotations

import pytest

from verified_sources_spark.llm.jats import (
    JatsError,
    encode_jats,
    jats_extract,
    jats_units,
)


def test_round_trip():
    d = encode_jats("A Study", "We study things.",
                    [("Intro", "First prose"), ("Methods", "Second")])
    out = jats_extract(d)
    assert out["title"] == "A Study"
    assert out["abstract"] == "We study things."
    assert out["units"] == [
        ("title", "A Study"), ("abstract", "We study things."),
        ("sec-title", "Intro"), ("p", "First prose as shown."),
        ("caption", "A figure caption."),
        ("sec-title", "Methods"), ("p", "Second")]


def test_inline_keep_drop_semantics():
    # hand-assembled paragraph: xref/formula/sup drop WITH text,
    # italic/ext-link keep text, nested sections walk in order
    xml = (b'<article><front><article-meta><title-group>'
           b'<article-title>T</article-title></title-group>'
           b'</article-meta></front><body>'
           b'<sec><title>S1</title>'
           b'<p>alpha <xref rid="b1">[1]</xref>beta'
           b'<sup>2</sup> <italic>gamma</italic> '
           b'<ext-link>link text</ext-link> end.</p>'
           b'<sec><title>S1.1</title><p>nested prose</p></sec>'
           b'</sec></body></article>')
    out = jats_extract(xml)
    assert out["units"] == [
        ("title", "T"), ("sec-title", "S1"),
        ("p", "alpha beta gamma link text end."),
        ("sec-title", "S1.1"), ("p", "nested prose")]


def test_table_caption_and_refusals():
    xml = (b'<article><body><sec><title>S</title>'
           b'<table-wrap><caption><p>tab cap</p></caption>'
           b'<table><tr><td>cell noise</td></tr></table>'
           b'</table-wrap></sec></body></article>')
    out = jats_extract(xml)
    assert out["units"] == [("sec-title", "S"), ("caption", "tab cap")]
    with pytest.raises(JatsError, match="not XML"):
        jats_extract(b"prose")
    with pytest.raises(JatsError, match="not a JATS article"):
        jats_extract(b"<html><body/></html>")
    with pytest.raises(JatsError, match="no extractable prose"):
        jats_extract(b"<article><front/></article>")


def test_spark_operator(spark):
    rows = [(1, bytearray(encode_jats("T", "A", [("S", "p")]))),
            (2, bytearray(b"junk"))]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    got: dict = {}
    for r in jats_units(df).collect():
        got.setdefault(r["doc_id"], []).append(r)
    assert [r["kind"] for r in sorted(got[1],
                                      key=lambda r: r["unit_idx"])] == [
        "title", "abstract", "sec-title", "p", "caption"]
    (r2,) = got[2]
    assert r2["decoded_ok"] is False
