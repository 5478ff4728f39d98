"""as-of / range join operator tests."""

from __future__ import annotations

from verified_sources_spark.operators.joins import as_of_join, range_join


def test_as_of_join_backward(spark):
    trades = spark.createDataFrame(
        [("A", 10, "t1"), ("A", 25, "t2"), ("B", 5, "t3")], "sym string, t long, trade string"
    )
    quotes = spark.createDataFrame(
        [("A", 5, 100.0), ("A", 10, 101.0), ("A", 20, 102.0), ("B", 9, 50.0)],
        "sym string, t long, px double",
    )
    out = as_of_join(trades, quotes, on="sym", left_time="t", right_time="t", right_payload=["px"])
    rows = {r["trade"]: r["px"] for r in out.collect()}
    # t=10 matches the equal-time quote; t=25 the latest earlier; B t=5 has none yet
    assert rows == {"t1": 101.0, "t2": 102.0, "t3": None}


def test_as_of_join_forward(spark):
    left = spark.createDataFrame([("A", 10, "x")], "k string, t long, v string")
    right = spark.createDataFrame(
        [("A", 8, "early"), ("A", 12, "next"), ("A", 20, "later")], "k string, t long, rv string"
    )
    out = as_of_join(left, right, on="k", left_time="t", right_time="t",
                     right_payload=["rv"], direction="forward")
    assert out.collect()[0]["rv"] == "next"


def test_range_join(spark):
    pts = spark.createDataFrame([(1, 5), (2, 15), (3, 25)], "id int, x int")
    iv = spark.createDataFrame([(0, 10, "lo"), (10, 20, "mid")], "range_start int, range_end int, bucket string")
    out = {r["id"]: r["bucket"] for r in range_join(pts, iv, "x", how="left").collect()}
    assert out == {1: "lo", 2: "mid", 3: None}
