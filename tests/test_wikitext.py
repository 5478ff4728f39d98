"""MediaWiki dump + wikitext stripping (llm/wikitext)."""

from __future__ import annotations

import pytest

from verified_sources_spark.llm.wikitext import (
    WikiError,
    encode_dump,
    iter_dump_pages,
    strip_wikitext,
    wiki_pages,
)


def test_markup_zoo():
    src = (
        "{{Infobox person\n| name = Ada\n"
        "| birth = {{birth date|1815|12|10}}\n}}\n"
        "'''Ada Lovelace''' was an [[England|English]] "
        "[[mathematician]].<ref>Cite</ref><ref name=x/>\n\n"
        "== Early life ==\n"
        "She worked with [[Charles Babbage]].\n"
        "[[File:Ada.jpg|thumb|A [[portrait|painting]] of Ada]]\n"
        "{| class=\"wikitable\"\n|-\n! Year\n|-\n| 1833\n|}\n"
        "* first item\n"
        "* second [http://example.com external label] item\n"
        "<!-- hidden -->__NOTOC__\n"
        "Her ''first'' program.")
    out = strip_wikitext(src)
    assert out["text"] == (
        "Ada Lovelace was an English mathematician.\n"
        "Early life\n"
        "She worked with Charles Babbage.\n"
        "first item\n"
        "second external label item\n"
        "Her first program.")
    assert out["headings"] == ["Early life"]


def test_nested_templates_drop_whole():
    # the classic regex-stripper failure: nesting
    src = "a {{outer|x={{inner|{{deepest}}}}|y=2}} b"
    assert strip_wikitext(src)["text"] == "a b"
    # unbalanced template swallows to end (truncated-dump behavior)
    assert strip_wikitext("keep {{broken\neverything after")[
        "text"] == "keep"


def test_link_forms():
    cases = [
        ("[[plain target]]", "plain target"),
        ("[[target|label]]", "label"),
        ("[[Category:Things]]x", "x"),
        ("[[File:a.png|thumb|cap with [[b|c]]]]tail", "tail"),
        ("[http://e/1 label] and [http://e/2]", "label and"),
    ]
    for src, want in cases:
        assert strip_wikitext(src)["text"] == want, src


def test_dump_walk_and_refusals():
    dump = encode_dump([
        {"title": "A", "wikitext": "body", "page_id": 7},
        {"title": "B", "redirect": "A",
         "wikitext": "#REDIRECT [[A]]"},
    ])
    pages = list(iter_dump_pages(dump))
    assert [(p["title"], p["page_id"], p["redirect"])
            for p in pages] == [("A", 7, False), ("B", 2, True)]
    with pytest.raises(WikiError, match="not XML"):
        list(iter_dump_pages(b"plain text"))
    with pytest.raises(WikiError, match="not a MediaWiki dump"):
        list(iter_dump_pages(b"<html><body/></html>"))
    with pytest.raises(WikiError, match="no <page>"):
        list(iter_dump_pages(
            b'<mediawiki><siteinfo/></mediawiki>'))


def test_spark_operator(spark):
    rows = [
        (1, bytearray(encode_dump(
            [{"title": "T", "wikitext": "== H ==\nprose"}]))),
        (2, bytearray(b"nope")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    got = {r["doc_id"]: r for r in wiki_pages(df).collect()}
    assert got[1]["text"] == "H\nprose" and got[1]["n_headings"] == 1
    assert got[2]["decoded_ok"] is False
