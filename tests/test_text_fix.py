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
