"""Stack Exchange dump ingestion (llm/sedump)."""

from __future__ import annotations

import pytest

from verified_sources_spark.llm.sedump import (
    SeDumpError,
    encode_posts,
    iter_posts,
    se_posts,
)


def test_round_trip_and_double_decode():
    d = encode_posts([
        {"post_id": 1, "post_type": 1, "title": "How?", "score": 5,
         "tags": ["python", "spark"],
         "body_html": "<p>I want <b>X</b> &amp; Y.</p>"},
        {"post_id": 2, "post_type": 2, "parent_id": 1, "score": -1,
         "body_html": "<p>Use Z.</p>"},
    ])
    assert b"&lt;p&gt;" in d  # attribute-escaped on the wire
    got = list(iter_posts(d))
    assert got[0]["text"] == "I want X & Y."
    assert got[0]["tags"] == "python;spark"
    assert got[1] == {"post_id": 2, "post_type": 2, "parent_id": 1,
                      "title": None, "score": -1, "tags": None,
                      "text": "Use Z."}


def test_refusals():
    with pytest.raises(SeDumpError, match="not XML"):
        list(iter_posts(b"plain"))
    with pytest.raises(SeDumpError, match="not a posts dump"):
        list(iter_posts(b"<rows><row Id='1'/></rows>"))
    with pytest.raises(SeDumpError, match="no <row>"):
        list(iter_posts(b"<posts></posts>"))


def test_spark_operator(spark):
    d = encode_posts([{"post_id": 1, "post_type": 1, "title": "T",
                       "body_html": "<p>q</p>"}])
    rows = [(1, bytearray(d)), (2, bytearray(b"junk"))]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    got = {r["doc_id"]: r for r in se_posts(df).collect()}
    assert got[1]["text"] == "q" and got[1]["title"] == "T"
    assert got[2]["decoded_ok"] is False
