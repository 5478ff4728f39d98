"""Subtitle parsing (llm/subtitles.py): SRT and WebVTT dialects, markup
stripping, NOTE/STYLE blocks, whitespace fidelity, error paths, and the
Spark cue-explosion operator."""

from __future__ import annotations

import pytest

from verified_sources_spark.llm.subtitles import (
    SubtitleError,
    encode_srt,
    encode_vtt,
    parse_subtitles,
    sniff_subtitle_format,
    subtitle_cues,
)

CUES = [(500, 2000, "first cue"), (2500, 4000, "second\ntwo lines")]


def test_srt_roundtrip_and_sniff():
    payload = encode_srt(CUES)
    assert sniff_subtitle_format(payload) == "srt"
    out = parse_subtitles(payload)
    assert [(c["start_ms"], c["end_ms"], c["text"]) for c in out] == CUES
    assert [c["idx"] for c in out] == [1, 2]


def test_vtt_roundtrip_with_notes_and_ids():
    payload = encode_vtt(CUES, notes=True)
    assert sniff_subtitle_format(payload) == "vtt"
    out = parse_subtitles(payload)
    assert [(c["start_ms"], c["end_ms"], c["text"]) for c in out] == CUES
    assert out[0]["cue_id"] == "cue-1"


def test_vtt_wild_layouts():
    """Hand-written VTT the fixture writer never emits: BOM, header
    metadata, hour-less timings, inline markup, STYLE block,
    position settings after the timing."""
    payload = (
        "﻿WEBVTT - with metadata\nKind: captions\n\n"
        "STYLE\n::cue { color: red }\n\n"
        "00:05.000 --> 00:07.250 align:start position:10%\n"
        "<i>styled</i> and <c.yellow>classed</c> "
        "<00:00:06.000>timed\n\n"
        "NOTE a comment block\nspanning lines\n\n"
        "01:00:00.000 --> 01:00:02.000\nsecond\n"
    )
    out = parse_subtitles(payload)
    assert len(out) == 2
    assert out[0]["start_ms"] == 5000 and out[0]["end_ms"] == 7250
    assert out[0]["text"] == "styled and classed timed"
    assert out[1]["start_ms"] == 3_600_000


def test_srt_wild_layouts():
    """Dot-decimal SRT (common sloppy variant), missing index lines,
    CRLF endings, trailing spaces preserved."""
    payload = ("1\r\n00:00:01.000 --> 00:00:02.000\r\nline one \r\n\r\n"
               "00:00:03,000 --> 00:00:04,000\r\nno index line\r\n")
    out = parse_subtitles(payload)
    assert out[0]["text"] == "line one "  # whitespace-faithful
    assert out[1]["idx"] == 2 and out[1]["start_ms"] == 3000


def test_error_paths():
    with pytest.raises(SubtitleError, match="unrecognized"):
        parse_subtitles("just some text without timings")
    with pytest.raises(SubtitleError, match="bad SRT timing"):
        # sniffs as SRT from the valid first cue; the second is broken
        parse_subtitles("1\n00:00:01,000 --> 00:00:02,000\nok\n\n"
                        "2\n00:00:xx,000 --> 00:00:04,000\nboom\n")
    with pytest.raises(SubtitleError, match="bad VTT timing"):
        parse_subtitles("WEBVTT\n\ncue-1\nnot a timing\ntext\n")


def test_spark_operator_explodes_cues(spark):
    rows = [
        (1, encode_srt(CUES)),
        (2, encode_vtt([(0, 1000, "vtt cue")])),
        (3, "garbage, not subtitles"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload string")
    got = subtitle_cues(df, text_col="payload").collect()
    by_doc: dict = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 2 and by_doc[1][0]["format"] == "srt"
    assert by_doc[2][0]["text"] == "vtt cue"
    assert by_doc[3][0]["decoded_ok"] is False


class TestAssTtml:
    def test_ass_round_trip_and_semantics(self):
        from verified_sources_spark.llm.subtitles import (
            encode_ass, parse_subtitles, sniff_subtitle_format,
        )

        a = encode_ass([(1500, 3000, "Hello\nworld"),
                        (4000, 5000, "With, commas, kept")])
        assert sniff_subtitle_format(a) == "ass"
        cues = parse_subtitles(a)
        assert [(c["start_ms"], c["end_ms"], c["text"])
                for c in cues] == [
            (1500, 3000, "Hello\nworld"),
            (4000, 5000, "With, commas, kept")]
        # field order comes from Format:, not position convention
        custom = ("[Script Info]\n[Events]\n"
                  "Format: Start, End, Text\n"
                  "Dialogue: 0:00:01.00,0:00:02.00,custom order\n")
        (c,) = parse_subtitles(custom)
        assert (c["start_ms"], c["text"]) == (1000, "custom order")
        # overrides strip; \h is a space
        s = ("[Script Info]\n[Events]\n"
             "Format: Start, End, Text\n"
             "Dialogue: 0:00:01.00,0:00:02.00,"
             "{\\pos(1,2)}a{\\i1}b{\\i0}\\hc\n")
        (c,) = parse_subtitles(s)
        assert c["text"] == "ab c"

    def test_ttml_round_trip_and_times(self):
        from verified_sources_spark.llm.subtitles import (
            _ttml_ms, encode_ttml, parse_subtitles,
            sniff_subtitle_format,
        )

        t = encode_ttml([(1500, 3000, "Hello\nworld")])
        assert sniff_subtitle_format(t) == "ttml"
        (c,) = parse_subtitles(t)
        assert (c["start_ms"], c["end_ms"], c["text"]) == (
            1500, 3000, "Hello\nworld")
        assert _ttml_ms("1.5s") == 1500
        assert _ttml_ms("1500ms") == 1500
        assert _ttml_ms("00:00:01.5") == 1500

    def test_refusals(self):
        import pytest as _pytest

        from verified_sources_spark.llm.subtitles import (
            SubtitleError, parse_subtitles,
        )

        with _pytest.raises(SubtitleError, match="no Dialogue"):
            parse_subtitles("[Script Info]\nTitle: x\n")
        with _pytest.raises(SubtitleError, match="usable Format"):
            parse_subtitles("[Script Info]\n[Events]\n"
                            "Dialogue: 0:00:01.00,0:00:02.00,x\n")
        with _pytest.raises(SubtitleError, match="no timed"):
            parse_subtitles('<tt xmlns="http://www.w3.org/ns/ttml">'
                            "<body/></tt>")


def test_ttml_cue_id_carries_through_namespaced_xml_id():
    """TTML cue ids live on xml:id (namespaced); parse must carry
    them through as cue_id per the parse_subtitles contract — a bare
    un-namespaced id is honored as a lenient extra."""
    from verified_sources_spark.llm.subtitles import (
        encode_ttml, parse_subtitles,
    )

    t = encode_ttml([(0, 1000, "one"), (2000, 3000, "two")])
    cues = parse_subtitles(t)
    assert [c["cue_id"] for c in cues] == ["c1", "c2"]
    bare = ('<?xml version="1.0"?><tt xmlns="http://www.w3.org/ns/ttml">'
            '<body><div><p id="x7" begin="0.0s" end="1.0s">hi</p>'
            "</div></body></tt>")
    (c,) = parse_subtitles(bare)
    assert c["cue_id"] == "x7"
