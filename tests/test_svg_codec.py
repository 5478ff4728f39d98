"""SVG probe + text extraction (llm/svg_codec): both dimension
resolution paths, unit conversion, tspan folding, escape round trips,
the XML-bomb refusal, and script flagging."""

from __future__ import annotations

import pytest

from verified_sources_spark.llm.svg_codec import (
    SvgError, encode_svg, extract_text, probe, sniff_svg,
)

NS = b'xmlns="http://www.w3.org/2000/svg"'


def test_round_trip_both_dim_paths():
    texts = ["Chart of revenue", "second line of label text", "més çava"]
    for vb in (False, True):
        d = encode_svg(320, 200, texts, title="Figure 1", viewbox_only=vb)
        assert sniff_svg(d)
        m = probe(d)
        assert (m["width"], m["height"]) == (320, 200)
        assert m["has_scripts"] is False
        assert extract_text(d) == ["Figure 1"] + texts


def test_escapes_round_trip():
    texts = ["a<b & c>d", "&amp; literal <tag>"]
    d = encode_svg(10, 10, texts)
    assert extract_text(d) == texts


def test_units_and_viewbox_fallback():
    d = (b'<svg %s width="72pt" height="36pt"></svg>' % NS)
    m = probe(d)
    assert (m["width"], m["height"]) == (96, 48)  # pt -> px at 96/72
    d = (b'<svg %s width="100%%" height="100%%" '
         b'viewBox="0 0 50 40"></svg>' % NS)
    m = probe(d)
    assert (m["width"], m["height"]) == (50, 40)


def test_scripts_flagged():
    d = (b'<svg %s width="5" height="5"><script>alert(1)</script></svg>'
         % NS)
    assert probe(d)["has_scripts"] is True


def test_named_refusals():
    with pytest.raises(SvgError, match="no <svg root"):
        probe(b"<html></html>")
    with pytest.raises(SvgError, match="no <svg root"):
        probe(b"plain text")
    bomb = (b'<?xml version="1.0"?><!DOCTYPE svg [<!ENTITY a "b">]>'
            b'<svg %s width="1" height="1">&a;</svg>' % NS)
    assert sniff_svg(bomb)  # the doctype subset must not defeat sniff
    with pytest.raises(SvgError, match="entity"):
        probe(bomb)
    with pytest.raises(SvgError, match="dimensions"):
        probe(b"<svg %s></svg>" % NS)
    with pytest.raises(SvgError, match="malformed"):
        probe(b'<svg %s width="1" height="1"><unclosed></svg>' % NS)
