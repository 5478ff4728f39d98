"""Quality/conformance operators + report fetchers + query builders."""

from __future__ import annotations

import pyspark.sql.types as T

from verified_sources_spark.operators.quality import (
    check_schema_on_data,
    distinct_counts,
    profile,
    table_counts,
)
from verified_sources_spark.sources.rest import LocalPagesTransport, RestClient
from verified_sources_spark.sources.saas import build_gaql, build_soql, report_to_fact_table


def test_table_and_distinct_counts(spark):
    a = spark.createDataFrame([(1,), (2,), (2,)], "k int")
    b = spark.createDataFrame([(9,)], "k int")
    counts = {r["table"]: r["n_rows"] for r in table_counts(spark, {"a": a, "b": b}).collect()}
    assert counts == {"a": 3, "b": 1}
    dist = {r["table"]: r["n_distinct"] for r in distinct_counts({"a": (a, "k"), "b": (b, "k")}).collect()}
    assert dist == {"a": 2, "b": 1}


def test_check_schema_on_data(spark):
    df = spark.createDataFrame([(1, None), (2, "x")], "k long, v string")
    expected_ok = T.StructType(
        [T.StructField("k", T.LongType(), False), T.StructField("v", T.StringType(), True)]
    )
    rep = check_schema_on_data(df, expected_ok)
    assert rep.ok
    expected_bad = T.StructType(
        [
            T.StructField("k", T.IntegerType(), False),   # type mismatch
            T.StructField("v", T.StringType(), False),    # nullability violated
            T.StructField("missing", T.StringType(), True),
        ]
    )
    rep2 = check_schema_on_data(df, expected_bad)
    assert not rep2.ok
    assert rep2.missing_columns == ["missing"]
    assert any("k:" in m for m in rep2.type_mismatches)
    assert any("v: 1 NULLs" in m for m in rep2.nullability_violations)


def test_profile_single_pass(spark):
    df = spark.createDataFrame([(1, "a"), (2, None), (2, "b")], "k int, v string")
    prof = {r["column"]: r for r in profile(df).collect()}
    assert prof["k"]["n_distinct"] == 2 and prof["k"]["n_nulls"] == 0
    assert prof["v"]["n_nulls"] == 1 and prof["v"]["min_str"] == "a"


def test_soql_gaql_builders():
    q = build_soql(["Id", "Name"], "Account", "SystemModstamp", "2024-01-01T00:00:00Z", limit=100)
    assert q == ("SELECT Id, Name FROM Account WHERE SystemModstamp > 2024-01-01T00:00:00Z "
                 "ORDER BY SystemModstamp ASC LIMIT 100")
    g = build_gaql(["campaign.id", "metrics.clicks"], "campaign", during="LAST_14_DAYS", limit=1000)
    assert g == ("SELECT campaign.id, metrics.clicks FROM campaign "
                 "WHERE segments.date DURING LAST_14_DAYS LIMIT 1000")


def test_report_to_fact_table(spark):
    pages = {
        "https://ga/runReport": [
            ({"rows": [
                {"dimensionValues": [{"value": "2024-01-01"}, {"value": "US"}],
                 "metricValues": [{"value": "12"}, {"value": "3.5"}]},
            ]}, {}),
        ]
    }
    df = report_to_fact_table(
        spark, RestClient(LocalPagesTransport(pages)), "https://ga",
        dimensions=["date", "country"], metrics=["sessions", "revenue"],
    )
    r = df.collect()[0]
    assert r["country"] == "US" and r["sessions"] == 12.0 and r["revenue"] == 3.5
    assert dict(df.dtypes)["revenue"] == "double"
