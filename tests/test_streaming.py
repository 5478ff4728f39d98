"""Structured Streaming: bounded AvailableNow runs, checkpoint resume,
foreachBatch keyed merge."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from verified_sources_spark.operators.merge import ParquetSink
from verified_sources_spark.streaming.bounded import (
    bounded_file_stream,
    foreach_batch_merge,
    run_available_now,
)

SCHEMA = "id long, v string, seq long"


def _write_batch(dirpath, name, rows):
    (dirpath / name).write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def test_bounded_run_and_checkpoint_resume(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_batch(src, "b1.json", [{"id": 1, "v": "a", "seq": 1}, {"id": 2, "v": "b", "seq": 1}])

    stream = bounded_file_stream(spark, str(src), SCHEMA)
    run_available_now(stream, str(tmp_path / "ckpt"), str(tmp_path / "out"))
    out1 = spark.read.parquet(str(tmp_path / "out"))
    assert out1.count() == 2

    # new file appears; resume from checkpoint processes ONLY the new file
    _write_batch(src, "b2.json", [{"id": 3, "v": "c", "seq": 2}])
    stream2 = bounded_file_stream(spark, str(src), SCHEMA)
    run_available_now(stream2, str(tmp_path / "ckpt"), str(tmp_path / "out"))
    out2 = spark.read.parquet(str(tmp_path / "out"))
    assert out2.count() == 3  # 2 old + 1 new, no reprocessing


def test_foreach_batch_merge_upserts(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    sink = ParquetSink(spark, str(tmp_path / "table"))
    _write_batch(src, "b1.json", [{"id": 1, "v": "a", "seq": 1}, {"id": 2, "v": "b", "seq": 1}])
    stream = bounded_file_stream(spark, str(src), SCHEMA)
    foreach_batch_merge(stream, str(tmp_path / "ck"), sink, keys=["id"], dedup_sort=["seq"])
    assert sink.read().count() == 2

    # duplicate + update + insert in the next run: keyed merge keeps latest
    _write_batch(
        src,
        "b2.json",
        [{"id": 2, "v": "b2", "seq": 2}, {"id": 2, "v": "b3", "seq": 3}, {"id": 4, "v": "d", "seq": 2}],
    )
    stream2 = bounded_file_stream(spark, str(src), SCHEMA)
    foreach_batch_merge(stream2, str(tmp_path / "ck"), sink, keys=["id"], dedup_sort=["seq"])
    rows = {r["id"]: r["v"] for r in sink.read().collect()}
    assert rows == {1: "a", 2: "b3", 4: "d"}  # within-batch dedup kept max seq


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """Streaming digest-id dedup: duplicate message ids arriving within
    the watermark window are dropped (the reference's at-least-once +
    _kafka_msg_id dedup, SURVEY §2.11)."""
    src = tmp_path / "src"
    src.mkdir()
    _write_batch(src, "b1.json", [
        {"id": 1, "v": "a", "seq": 1}, {"id": 1, "v": "a", "seq": 1},  # dup in batch
        {"id": 2, "v": "b", "seq": 1},
    ])
    stream = (
        bounded_file_stream(spark, str(src), SCHEMA)
        .withColumn("ts", F.current_timestamp())
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["id"])
    )
    q = (
        stream.writeStream.format("parquet")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start(str(tmp_path / "out"))
    )
    q.awaitTermination()
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 2  # in-batch duplicate dropped


def test_streaming_cdc_into_manifest_table_exactly_once(spark, tmp_path):
    """Change-feed files → AvailableNow foreachBatch keyed merge → one
    atomic ManifestTable commit per micro-batch; re-running the bounded
    stream from the same checkpoint applies nothing new; versions stay
    time-travelable."""
    import json

    from verified_sources_spark.operators.table_format import ManifestTable
    from verified_sources_spark.streaming.bounded import (
        bounded_file_stream,
        foreach_batch_merge,
    )

    src = tmp_path / "feed"
    src.mkdir()
    (src / "b1.json").write_text(
        "\n".join(json.dumps(r) for r in [
            {"k": 1, "lsn": 1, "v": "a"},
            {"k": 2, "lsn": 2, "v": "b"},
            {"k": 1, "lsn": 3, "v": "a2"},   # same-batch dup: dedup_sort keeps max lsn
        ]) + "\n"
    )
    table = ManifestTable(spark, str(tmp_path / "t"))
    stream = bounded_file_stream(spark, str(src), "k long, lsn long, v string")
    foreach_batch_merge(stream, str(tmp_path / "ck"), table, keys=["k"], dedup_sort=["lsn"])
    assert {(r["k"], r["v"]) for r in table.read().select("k", "v").collect()} == {
        (1, "a2"), (2, "b"),
    }
    v_after_first = table.latest_version()

    # second file, second bounded run from the SAME checkpoint
    (src / "b2.json").write_text(json.dumps({"k": 2, "lsn": 9, "v": "b9"}) + "\n")
    stream2 = bounded_file_stream(spark, str(src), "k long, lsn long, v string")
    foreach_batch_merge(stream2, str(tmp_path / "ck"), table, keys=["k"], dedup_sort=["lsn"])
    assert {(r["k"], r["v"]) for r in table.read().select("k", "v").collect()} == {
        (1, "a2"), (2, "b9"),
    }
    # time travel to the state after the first batch
    assert {(r["k"], r["v"]) for r in table.read(version=v_after_first).select("k", "v").collect()} == {
        (1, "a2"), (2, "b"),
    }

    # replay with NOTHING new: checkpoint makes the run a no-op commit-wise
    v_before = table.latest_version()
    stream3 = bounded_file_stream(spark, str(src), "k long, lsn long, v string")
    foreach_batch_merge(stream3, str(tmp_path / "ck2_unused"), table, keys=["k"], dedup_sort=["lsn"])
    # (fresh checkpoint re-reads everything — but the keyed merge converges
    # to the same state: effective exactly-once at the TABLE level)
    assert {(r["k"], r["v"]) for r in table.read().select("k", "v").collect()} == {
        (1, "a2"), (2, "b9"),
    }
    assert table.latest_version() > v_before  # new commits, same state


def test_idempotent_streaming_commits_survive_batch_replay(spark, tmp_path):
    """A micro-batch that COMMITTED to the ManifestTable but crashed before
    the checkpoint advanced is replayed by Spark on restart with the same
    batch_id — the (stream_id, batch_id) recorded inside the manifest lets
    the sink skip it: same final table state, exactly one table version per
    unique batch."""
    import pytest
    from pyspark.sql.streaming import StreamingQueryException

    from verified_sources_spark.operators.table_format import ManifestTable

    class CrashAfterCommitTable(ManifestTable):
        crash_armed = True

        def merge(self, *args, **kwargs):
            v = super().merge(*args, **kwargs)
            if CrashAfterCommitTable.crash_armed:
                CrashAfterCommitTable.crash_armed = False
                raise RuntimeError("simulated crash after commit, before checkpoint")
            return v

    src = tmp_path / "src"
    src.mkdir()
    _write_batch(src, "b1.json", [{"id": 1, "v": "a", "seq": 1}, {"id": 2, "v": "b", "seq": 1}])
    _write_batch(src, "b2.json", [{"id": 3, "v": "c", "seq": 1}])

    table = CrashAfterCommitTable(spark, str(tmp_path / "t"))
    # one file per trigger → two micro-batches; the first one commits v1
    # then "crashes" before Spark records batch completion
    stream = bounded_file_stream(spark, str(src), SCHEMA, max_files_per_trigger=1)
    with pytest.raises(StreamingQueryException):
        foreach_batch_merge(
            stream, str(tmp_path / "ck"), table, keys=["id"], dedup_sort=["seq"],
            stream_id="s1",
        )
    assert table.versions() == [1]
    assert table.last_batch_id("s1") == 0

    # restart: Spark replays batch 0 (same data, same id) — skipped — then
    # processes batch 1
    stream2 = bounded_file_stream(spark, str(src), SCHEMA, max_files_per_trigger=1)
    foreach_batch_merge(
        stream2, str(tmp_path / "ck"), table, keys=["id"], dedup_sort=["seq"],
        stream_id="s1",
    )
    rows = {r["id"]: r["v"] for r in table.read().collect()}
    assert rows == {1: "a", 2: "b", 3: "c"}
    # ONE version per unique batch — the replay did not create a duplicate
    assert table.versions() == [1, 2]
    assert table.last_batch_id("s1") == 1
