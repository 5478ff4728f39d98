"""Tests: bounded stream replay, LLM extraction surface, grouped pandas,
attribution-lag re-read."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F

from verified_sources_spark.llm.extract import (
    deterministic_fake_llm,
    extract_fields,
    filter_empty_extractions,
)
from verified_sources_spark.operators.grouped import session_stats_pandas
from verified_sources_spark.operators.incremental import CursorStore, lagged_watermark
from verified_sources_spark.sources.streams import (
    OffsetTracker,
    bounded_read,
    timestamp_bounded,
    with_envelope,
)


def _messages(spark):
    rows = []
    for topic in ("t1", "t2"):
        for part in (0, 1):
            for off in range(5):
                rows.append((topic, part, off, dt.datetime(2024, 1, 1, 0, off), f"v-{topic}-{part}-{off}"))
    return spark.createDataFrame(rows, "topic string, partition int, offset long, ts timestamp, value string")


def test_bounded_read_resume(spark, tmp_path):
    msgs = _messages(spark)
    tracker = OffsetTracker(CursorStore(str(tmp_path / "s.json")), "kafka")
    run1 = bounded_read(msgs.filter(F.col("offset") <= 2), tracker)
    assert run1.count() == 12  # no state: everything available
    tracker.commit_from(run1)
    run2 = bounded_read(msgs, tracker)
    assert run2.count() == 8  # offsets 3,4 per (topic,partition)
    assert run2.agg(F.min("offset")).collect()[0][0] == 3


def test_bounded_read_new_partition_from_beginning(spark, tmp_path):
    msgs = _messages(spark)
    tracker = OffsetTracker(CursorStore(str(tmp_path / "s.json")), "k")
    tracker.commit_from(msgs.filter(F.col("topic") == "t1"))
    out = bounded_read(msgs, tracker)
    # t1 exhausted (committed to 4); t2 unknown → full replay
    assert out.filter(F.col("topic") == "t1").count() == 0
    assert out.filter(F.col("topic") == "t2").count() == 10


def test_envelope_and_timestamp_bounds(spark):
    msgs = _messages(spark)
    env = with_envelope(msgs)
    r = env.filter((F.col("topic") == "t1") & (F.col("partition") == 0) & (F.col("offset") == 1)).collect()[0]
    assert r["_meta"]["topic"] == "t1" and len(r["_msg_id"]) == 32
    # same (topic, partition, offset) → same digest id across runs
    assert with_envelope(msgs).filter(
        (F.col("topic") == "t1") & (F.col("partition") == 0) & (F.col("offset") == 1)
    ).collect()[0]["_msg_id"] == r["_msg_id"]
    bounded = timestamp_bounded(msgs, "2024-01-01 00:01:00", "2024-01-01 00:03:00")
    assert bounded.count() == 8  # minutes 1,2 across 4 (topic,partition)


def test_extract_fields_stub_llm(spark):
    docs = spark.createDataFrame(
        [
            (1, "Invoice Total: 42.50; due soon"),
            (2, "completely unstructured prose"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = extract_fields(
        docs,
        "doc_id",
        "text",
        queries={"total": "what is the invoice total amount?", "first_word": "first word of the text"},
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["total"] == "42.50"
    assert rows[1]["first_word"] == "invoice"
    assert rows[2]["total"] is None and rows[2]["first_word"] == "completely"
    assert len(rows[1]["content_hash"]) == 32
    kept = filter_empty_extractions(out, ["total", "first_word"])
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 2]  # doc 3: all-null dropped


def test_session_stats_pandas_matches_window(spark, sf_dir):
    from verified_sources_spark.catalog import load_table
    from verified_sources_spark.plans.queries import sessionize_events

    ev = load_table(spark, sf_dir, "events")
    pandas_out = {r["user_id"]: (r["n_sessions"], r["max_session_events"])
                  for r in session_stats_pandas(ev).collect()}
    window_out = (
        sessionize_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.max("session_id").alias("n_sessions"), F.max("n_events").alias("mx"))
        .collect()
    )
    for r in window_out:
        assert pandas_out[r["user_id"]] == (r["n_sessions"], r["mx"])


def test_lagged_watermark():
    assert lagged_watermark("2024-01-10T00:00:00", 3) == dt.datetime(2024, 1, 7)
    assert lagged_watermark(dt.datetime(2024, 1, 10), 7) == dt.datetime(2024, 1, 3)
