"""Scalar/text function library tests."""

from __future__ import annotations

import pyspark.sql.functions as F

from verified_sources_spark.functions import (
    content_hash,
    epoch_millis_to_timestamp,
    hex_decode,
    lotus_serial_to_date,
    lotus_serial_to_timestamp,
    pg_micros_to_timestamp,
    row_digest,
    snake_case,
    snake_case_columns,
)
from verified_sources_spark.functions.text import (
    fingerprint,
    lang_id,
    quality_score,
    shingles,
    token_count,
    tokens,
)


def test_snake_case():
    assert snake_case("CamelCaseName") == "camel_case_name"
    assert snake_case("My Field (EUR)") == "my_field_eur"
    assert snake_case("already_snake") == "already_snake"
    assert snake_case("  ") == "col"


def test_snake_case_columns(spark):
    df = spark.createDataFrame([(1, 2)], ["UserId", "Total Price"])
    assert snake_case_columns(df).columns == ["user_id", "total_price"]


def test_row_digest_deterministic_and_null_safe(spark):
    df = spark.createDataFrame([(1, None), (1, None)], "a int, b string")
    vals = [r["d"] for r in df.select(row_digest("a", "b").alias("d")).collect()]
    assert vals[0] == vals[1] and len(vals[0]) == 32


def test_lotus_serial(spark):
    df = spark.range(1).select(
        lotus_serial_to_date(F.lit(45292.0)).alias("d"),
        lotus_serial_to_timestamp(F.lit(45292.5)).alias("t"),
    )
    r = df.collect()[0]
    assert str(r["d"]) == "2024-01-01"
    assert str(r["t"]) == "2024-01-01 12:00:00"


def test_epoch_and_pg_time(spark):
    r = spark.range(1).select(
        epoch_millis_to_timestamp(F.lit(1704067200000)).alias("e"),
        pg_micros_to_timestamp(F.lit(0)).alias("p"),
    ).collect()[0]
    assert str(r["e"]) == "2024-01-01 00:00:00"
    assert str(r["p"]) == "2000-01-01 00:00:00"


def test_hex_decode(spark):
    r = spark.range(1).select(hex_decode(F.lit(r"\x68690a")).alias("b")).collect()[0]
    assert bytes(r["b"]) == b"hi\n"


def test_tokens_and_counts(spark):
    df = spark.createDataFrame([("Hello, World 42!",)], "t string")
    r = df.select(tokens("t").alias("tk"), token_count("t").alias("n")).collect()[0]
    assert list(r["tk"]) == ["hello", "world", "42"] and r["n"] == 3


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "t string")
    rows = df.select(shingles("t", 3).alias("s")).collect()
    assert list(rows[0]["s"]) == ["a b c", "b c d"]
    assert list(rows[1]["s"]) == []  # too short


def test_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame([("b a c",), ("c b a",)], "t string")
    vals = [r["f"] for r in df.select(fingerprint("t").alias("f")).collect()]
    assert vals[0] == vals[1]


def test_lang_id_and_quality(spark):
    df = spark.createDataFrame(
        [("the cat of the house and a dog",), ("der hund und die katze und das",), ("zzz qqq",)],
        "t string",
    )
    out = df.select(lang_id("t").alias("g"), quality_score("t").alias("q")).collect()
    assert [r["g"] for r in out] == ["en", "de", "und"]
    assert all(0.0 <= r["q"] <= 1.0 for r in out)


def test_content_hash_matches_md5(spark):
    r = spark.createDataFrame([("abc",)], "t string").select(
        content_hash("t").alias("h")
    ).collect()[0]
    assert r["h"] == "900150983cd24fb0d6963f7d28e17f72"


def test_normalized_text_collapses_variants(spark):
    from verified_sources_spark.functions.text import normalized_text
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "HELLO ... world\n"),
         (4, "a different doc")],
        "id long, text string",
    )
    out = {r["id"]: r["n"] for r in df.select("id", normalized_text(F.col("text")).alias("n")).collect()}
    assert out[1] == out[2] == out[3] == "hello world"
    assert out[4] == "a different doc"


def test_url_quote_roundtrip(spark):
    from verified_sources_spark.functions import url_quote, url_unquote
    import pyspark.sql.functions as F

    vals = ["plain", "a b/c", "x&y=z?", "café + 2%", "100%/50%", "a*b~c", "p/q r"]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], "id long, v string")
    out = df.select("id", "v", url_quote(F.col("v")).alias("q"),
                    url_unquote(url_quote(F.col("v"))).alias("rt")).collect()
    import urllib.parse
    for r in out:
        assert r["rt"] == r["v"], r  # lossless round trip
        assert r["q"] == urllib.parse.quote(r["v"]), r  # exact quote() parity
