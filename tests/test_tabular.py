"""Blob-borne delimited text (llm/tabular): strict sniffing, RFC 4180
recovery, refusals, and the Spark operator."""

from __future__ import annotations

import pytest

from verified_sources_spark.llm.tabular import (
    TabularError,
    delimited_rows,
    encode_delimited,
    parse_delimited,
    sniff_delimited,
)


@pytest.mark.parametrize("delim", [",", ";", "\t", "|"])
@pytest.mark.parametrize("crlf", [False, True])
def test_round_trip(delim, crlf):
    rows = [["1", "alpha", "note one"], ["2", "beta", "note two"]]
    data = encode_delimited(rows, delimiter=delim,
                            header=["id", "name", "note"], crlf=crlf)
    out = parse_delimited(data)
    assert out["delimiter"] == delim
    assert out["header"] == ["id", "name", "note"]
    assert out["rows"] == rows


def test_rfc4180_quoting_trifecta():
    # embedded delimiter, doubled quote, bare newline — one cell
    rows = [["1", 'He said "hi", then left\nabruptly']]
    data = encode_delimited(rows, header=["id", "note"])
    assert b'"He said ""hi""' in data  # really quoted on the wire
    assert parse_delimited(data)["rows"] == rows


def test_excel_bom_and_numeric_first_row():
    data = b"\xef\xbb\xbf" + encode_delimited([["1", "2"], ["3", "4"]])
    out = parse_delimited(data)
    assert out["header"] is None and out["n_rows"] == 2


def test_prose_does_not_sniff_as_table():
    assert sniff_delimited(
        "A sentence, with commas, here.\nShorter line, now.\n") is None
    with pytest.raises(TabularError, match="no consistent delimiter"):
        parse_delimited(b"prose line one\nprose line two\n")
    with pytest.raises(TabularError, match="not decodable text"):
        parse_delimited(b"\x00\xff\xfe binary")


def test_true_delimiter_beats_incidental_commas():
    # semicolon table whose cells contain commas INCONSISTENTLY (the
    # real-world shape): comma parsing is ragged, semicolon wins
    data = b"name;note\nSmith, John;a, b, c\nLee;plain\n"
    out = parse_delimited(data)
    assert out["delimiter"] == ";"
    assert out["rows"] == [["Smith, John", "a, b, c"],
                           ["Lee", "plain"]]
    # when BOTH are consistent, the one explaining more columns wins
    # (the documented tie-break)
    data = b"a,b;c,d;e,f\ng,h;i,j;k,l\n"
    assert parse_delimited(data)["n_cols"] == 4


def test_spark_operator(spark):
    rows = [
        (1, bytearray(encode_delimited([["1", "x"], ["2", "y"]],
                                       header=["id", "v"]))),
        (2, bytearray(b"\x00 not a table")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    got: dict = {}
    for r in delimited_rows(df).collect():
        got.setdefault(r["doc_id"], []).append(r)
    a = sorted(got[1], key=lambda r: r["row_idx"])
    assert [(r["row_idx"], r["line"], r["header"]) for r in a] == [
        (0, "1\tx", "id\tv"), (1, "2\ty", "id\tv")]
    (r2,) = got[2]
    assert r2["decoded_ok"] is False
