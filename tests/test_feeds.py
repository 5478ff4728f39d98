"""RSS/Atom feed extraction (llm/feeds): dialect walks, the
content-over-description preference, the shared HTML-to-text pass,
XML-bomb refusal, and the Spark operator."""

from __future__ import annotations

import pytest

from verified_sources_spark.llm.feeds import (
    FeedError, encode_atom, encode_rss, feed_entries, sniff_feed,
)


def test_rss_round_trip():
    items = [
        {"title": "Post one", "link": "http://e.com/1",
         "date": "Mon, 01 Jan 2024 00:00:00 GMT",
         "description": "<p>summary <b>one</b></p>",
         "content": "<p>full body one</p> <p>para two</p>"},
        {"title": "Post & two", "link": "http://e.com/2",
         "description": "<p>only summary</p>"},
    ]
    rss = encode_rss(items)
    assert sniff_feed(rss) == "rss"
    es = feed_entries(rss)
    assert [e["title"] for e in es] == ["Post one", "Post & two"]
    assert es[0]["summary"] == "summary one"
    # content:encoded wins over description for the body text
    assert es[0]["text"] == "full body one para two"
    assert es[1]["text"] == "only summary"
    assert es[0]["date"] == "Mon, 01 Jan 2024 00:00:00 GMT"


def test_atom_round_trip():
    atom = encode_atom([
        {"title": "A1", "link": "http://e.com/a1",
         "date": "2024-01-01T00:00:00Z",
         "summary": "<p>sum</p>", "content": "<p>atom body</p>"},
        {"title": "A2", "summary": "<p>just sum</p>"},
    ])
    assert sniff_feed(atom) == "atom"
    es = feed_entries(atom)
    assert es[0]["link"] == "http://e.com/a1"
    assert es[0]["text"] == "atom body" and es[0]["summary"] == "sum"
    assert es[1]["text"] == "just sum"


def test_refusals():
    with pytest.raises(FeedError, match="no <rss or <feed"):
        feed_entries(b"<html></html>")
    bomb = (b'<?xml version="1.0"?><!DOCTYPE rss [<!ENTITY a "b">]>'
            b'<rss version="2.0"><channel>&a;</channel></rss>')
    assert sniff_feed(bomb) == "rss"
    with pytest.raises(FeedError, match="entity"):
        feed_entries(bomb)
    with pytest.raises(FeedError, match="malformed"):
        feed_entries(b'<rss version="2.0"><channel><item>')
    with pytest.raises(FeedError, match="channel"):
        feed_entries(b'<rss version="2.0"></rss>')


def test_spark_operator(spark):
    from verified_sources_spark.llm.feeds import feed_extract

    rows = [
        (1, bytearray(encode_rss([{"title": "T", "link": "L",
                                   "description": "<p>d</p>"}]))),
        (2, bytearray(encode_atom([{"title": "U",
                                    "summary": "<p>s</p>"}]))),
        (3, bytearray(b"not a feed")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    got = {r["doc_id"]: r for r in feed_extract(df).collect()}
    assert got[1]["kind"] == "rss" and got[1]["text"] == "d"
    assert got[2]["kind"] == "atom" and got[2]["text"] == "s"
    assert got[3]["decoded_ok"] is False
