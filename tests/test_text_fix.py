"""Encoding-damage repair (llm/text_fix): mojibake inversion across
flavors, fixed-point safety on clean text, canonicalization, and the
Spark operator."""

from __future__ import annotations

import unicodedata

import pytest

from verified_sources_spark.llm.text_fix import (
    canonicalize_text,
    fix_mojibake,
    fix_text,
)

CLEAN = "café déjà vu — naïve №7 中文 🚀"


def _misdecode_cp1252(raw: bytes) -> str:
    out = []
    for b in raw:
        try:
            out.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(b))
    return "".join(out)


def test_latin1_mojibake_single_and_double():
    m1 = CLEAN.encode("utf-8").decode("latin-1")
    m2 = m1.encode("utf-8").decode("latin-1")
    assert "Ã©" in m1  # really damaged on the wire
    assert fix_mojibake(m1) == (CLEAN, 1)
    assert fix_mojibake(m2) == (CLEAN, 2)


def test_cp1252_mojibake_signature():
    s = "it’s “smart” — dash…"
    mc = _misdecode_cp1252(s.encode("utf-8"))
    assert "â€™" in mc  # THE signature
    assert fix_mojibake(mc) == (s, 1)


def test_clean_text_is_a_fixed_point():
    for t in ["plain ascii", CLEAN, "Ã then junk", "€ price — quote",
              "中文 only", "", "résumé façade"]:
        got, rounds = fix_mojibake(t)
        assert (got, rounds) == (t, 0), t


def test_canonicalize():
    nfd = unicodedata.normalize("NFD", "café naïve")
    out, changed = canonicalize_text(
        nfd + " x​y\r\nz\x07w　v")
    assert out == "café naïve x" + "y\nzw v"
    assert changed
    out, changed = canonicalize_text("already clean\n")
    assert out == "already clean\n" and not changed


def test_spark_operator(spark):
    m1 = CLEAN.encode("utf-8").decode("latin-1")
    rows = [(1, m1), (2, "clean text"), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in fix_text(df).collect()}
    assert got[1]["text"] == CLEAN and got[1]["mojibake_rounds"] == 1
    assert got[2]["text"] == "clean text"
    assert got[2]["mojibake_rounds"] == 0
    assert got[3]["text"] is None


class TestBareCharsetDetection:
    """detect_bare_charset / decode_bare_text: the no-transport-
    metadata sibling of warc.decode_body — BOM, strict-probe +
    plausibility scoring over the canonical legacy set, binary
    refusal."""

    def test_boms_beat_everything(self):
        from verified_sources_spark.llm.text_fix import (
            decode_bare_text, detect_bare_charset,
        )

        assert detect_bare_charset(b"\xef\xbb\xbfhi") == (
            "utf-8-sig", "bom")
        assert detect_bare_charset(
            "hi".encode("utf-16"))[0] == "utf-16"
        assert detect_bare_charset(
            "hi".encode("utf-32"))[0] == "utf-32"
        assert decode_bare_text("héllo".encode("utf-16"))[0] == "héllo"

    def test_utf8_is_authoritative(self):
        from verified_sources_spark.llm.text_fix import (
            detect_bare_charset,
        )

        assert detect_bare_charset("plain ascii\n".encode()) == (
            "utf-8", "utf-8")
        assert detect_bare_charset("中文 und ümlaut".encode()) == (
            "utf-8", "utf-8")

    def test_legacy_set_round_trips(self):
        from verified_sources_spark.llm.text_fix import decode_bare_text

        cases = {
            "cp1252": "café, naïve résumé — 90’s “quotes” déjà vu. "
                      "Plain ASCII body follows here.",
            "gb18030": "中文处理是一个常见的需求，编码检测必须正确。",
            "shift_jis": "日本語のテキストです。これはテストです。",
            "euc_jp": "日本語のテキストです。これはテストです。",
            "big5": "繁體中文測試，這是一段範例文字。",
        }
        for codec, text in cases.items():
            got_text, got_codec, clean = decode_bare_text(
                text.encode(codec))
            assert got_codec == codec, (codec, got_codec)
            assert got_text == text and clean

    def test_binary_refuses(self):
        from verified_sources_spark.llm.text_fix import (
            decode_bare_text, detect_bare_charset,
        )

        assert detect_bare_charset(b"") is None
        assert detect_bare_charset(b"\x00\x01\x02 nul means binary") \
            is None
        assert decode_bare_text(bytes(range(1, 255)) * 4) is None

    def test_dirty_tail_flags_not_clean(self):
        from verified_sources_spark.llm.text_fix import decode_bare_text

        data = b"clean ascii head " * 5000 + b"\xff\x00\xfe"
        # NUL sits past the probe window, so detection succeeds on the
        # head and the strict full decode fails -> clean=False
        text, codec, clean = decode_bare_text(data)
        assert codec == "utf-8" and clean is False
        assert text.endswith("�\x00�")

    def test_window_straddle_multibyte(self):
        from verified_sources_spark.llm.text_fix import decode_bare_text

        data = ("x" * 65535 + "中文字 tail").encode("utf-8")
        text, codec, clean = decode_bare_text(data)
        assert codec == "utf-8" and clean and text.endswith("中文字 tail")


def test_docrouter_and_tabular_decode_legacy_charsets():
    """The document router's text/delimited fallback serves
    cp1252/GB18030 legacy files instead of dropping them as binary."""
    from verified_sources_spark.llm.docrouter import (
        extract_document, sniff_document,
    )
    from verified_sources_spark.llm.tabular import parse_delimited

    memo = ("Übergabeprotokoll für das Archiv.\n"
            "Der Text enthält Umlaute: äöüß — sonst reines ASCII.\n")
    out = extract_document(memo.encode("cp1252"))
    assert out["format"] == "text" and out["charset"] == "cp1252"
    assert out["text"] == memo

    zh = "归档说明：这是一个中文文本文件，用于测试编码检测。\n"
    out = extract_document(zh.encode("gb18030"))
    assert out["format"] == "text" and out["charset"] == "gb18030"
    assert out["text"] == zh

    csv_1252 = ("name,city\nRené,Zürich\nFrançois,Genève\n"
                ).encode("cp1252")
    assert sniff_document(csv_1252) == "delimited"
    out = parse_delimited(csv_1252)
    assert out["charset"] == "cp1252"
    assert out["rows"] == [["René", "Zürich"], ["François", "Genève"]]

    csv_gb = ("城市,人口\n北京,2189\n上海,2487\n").encode("gb18030")
    out = parse_delimited(csv_gb)
    assert out["charset"] == "gb18030"
    assert out["rows"] == [["北京", "2189"], ["上海", "2487"]]


def test_undeclared_warc_body_falls_back_to_probe():
    """An HTTP body that declares NOTHING (no header charset, no BOM,
    no meta) probes through detect_bare_charset before the lossy
    replace-decode."""
    from verified_sources_spark.llm.warc import decode_body

    page = ("<html><body><p>归档说明：这是一个中文测试页面。"
            "</p></body></html>")
    text, charset, clean = decode_body({}, page.encode("gb18030"))
    assert charset == "gb18030" and clean and text == page
    # a DECLARED charset still wins over the probe
    text, charset, clean = decode_body(
        {"content-type": "text/html; charset=gb18030"},
        page.encode("gb18030"))
    assert charset == "gb18030" and clean
    # true binary still flags unclean instead of crashing
    text, charset, clean = decode_body({}, b"\xff\xfe\x00garbage\xff")
    assert clean is False


def test_undeclared_dirty_tail_keeps_probed_charset():
    """A probed page with one corrupt tail byte replace-decodes under
    the PROBED charset (near-perfect text, honest charset report),
    never under the utf-8 default (wall-to-wall U+FFFD)."""
    from verified_sources_spark.llm.warc import decode_body

    # clean gb18030 for the whole 64 KB probe window, corruption in
    # the tail BEYOND it — the realistic big-page shape
    page = "归档说明：这是一个中文测试页面，内容较长一些。" * 2000
    body = page.encode("gb18030") + b"\xff\xff"
    assert len(body) > 65536
    text, charset, clean = decode_body({}, body)
    assert charset == "gb18030" and clean is False
    assert text.startswith("归档说明")
    assert text.count("�") <= 4  # near-perfect, not wall-to-wall


def test_korean_russian_greek_legacy_round_trips():
    """Round-13b probe extensions: EUC-KR (common-hangul prior beats
    the euc_jp/gb18030 strict-accept tie), cp1251 Cyrillic and cp1253
    Greek (whole-script classes, cp1253 probing first because Russian
    text carries 0xFF/'я' which cp1253 leaves undefined)."""
    from verified_sources_spark.llm.text_fix import decode_bare_text

    cases = {
        "euc_kr": "서울시의 인구는 구백만 명이 넘습니다. 우리는 "
                  "한국어로 말합니다.",
        "cp1251": "Русский текст для проверки кодировки страницы.",
        "cp1253": "Ελληνικό κείμενο για έλεγχο κωδικοποίησης.",
        # round 14: koi8-r separates from cp1251 via the Cyrillic
        # letter-frequency prior (each reads the other's bytes as a
        # frequency-breaking letter permutation)
        "koi8_r": "Русская страница в кодировке КОИ-8, проверка "
                  "частотного разделения.",
    }
    for codec, text in cases.items():
        got_text, got_codec, clean = decode_bare_text(
            text.encode(codec))
        assert got_codec == codec and got_text == text and clean
    # the same Russian sentence must resolve BOTH ways
    ru = "привет, как дела сегодня? всё хорошо."
    for codec in ("cp1251", "koi8_r"):
        got_text, got_codec, clean = decode_bare_text(ru.encode(codec))
        assert got_codec == codec and got_text == ru and clean
    # ALL-CAPS pages stay genuine (the prior lookup is case-folded)
    caps = "ВНИМАНИЕ ОПАСНОСТЬ НЕ ВХОДИТЬ РЕМОНТ СТАНЦИИ"
    for codec in ("cp1251", "koi8_r"):
        got_text, got_codec, clean = decode_bare_text(
            caps.encode(codec))
        assert got_codec == codec and got_text == caps and clean
