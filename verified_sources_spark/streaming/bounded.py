"""Structured Streaming helpers: bounded per-run reads + merge sinks.

The reference's stream sources (kafka/kinesis) snapshot end offsets at
start and read up to them only (SURVEY.md §2.11) — exactly Structured
Streaming's ``Trigger.AvailableNow`` contract.  Offset state in the
reference's pipeline state == the streaming checkpoint here; resume is
free and exactly-once-ish under the same at-least-once + keyed-merge
model (reference sources/kafka/helpers.py:84-86 → checkpoint dir).

- ``bounded_file_stream``: readStream over a directory (the local stand-in
  for a broker; the Kafka source swaps in via ``format("kafka")`` with the
  same downstream code).
- ``run_available_now``: run one bounded pass to a sink, blocking.
- ``foreach_batch_merge``: per-micro-batch keyed MERGE into a ParquetSink
  (dedup within the batch by a sort column first) — the reference's
  merge-write disposition applied streamingly (§2.9), and the standard
  Spark pattern for upsert sinks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from verified_sources_spark.operators.merge import ParquetSink


def bounded_file_stream(
    spark: SparkSession,
    path: str,
    schema: str,
    fmt: str = "json",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    r = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger:
        r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return r.load(path)


def run_available_now(
    stream_df: DataFrame,
    checkpoint_dir: str,
    sink_path: str,
    fmt: str = "parquet",
    output_mode: str = "append",
) -> StreamingQuery:
    """One bounded run: process everything available, then stop (the
    reference's bounded-run watermark semantics)."""
    q = (
        stream_df.writeStream.format(fmt)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start(sink_path)
    )
    q.awaitTermination()
    return q


def foreach_batch_merge(
    stream_df: DataFrame,
    checkpoint_dir: str,
    sink,  # anything with .merge(df, keys=..., dedup_sort=...): ParquetSink | ManifestTable
    keys: Sequence[str],
    dedup_sort: Sequence[str] | None = None,
    stream_id: str | None = None,
) -> StreamingQuery:
    """AvailableNow run that MERGEs each micro-batch into the sink by key.
    At-least-once delivery + keyed merge = effective exactly-once for the
    table state (the reference's late/duplicate model, §2.11).  With a
    ManifestTable sink every micro-batch is one atomic manifest commit —
    a crashed batch retries into a NEW version, readers never see a
    half-applied batch.

    Pass ``stream_id`` with a ManifestTable sink for true idempotent
    replay: the (stream_id, batch_id) pair is recorded inside the same
    atomic manifest commit as the data, so a micro-batch that committed
    but crashed before the checkpoint advanced is recognized on restart
    and skipped — one table version per unique batch, no duplicate merge
    (the reference's exactly-once slot contract,
    sources/pg_replication/__init__.py:77-80, applied to the sink side)."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        if stream_id is not None and hasattr(sink, "last_batch_id"):
            last = sink.last_batch_id(stream_id)
            if last is not None and batch_id <= last:
                return  # replayed batch — already in the table, atomically
            sink.merge(
                batch_df, keys=keys, dedup_sort=dedup_sort, stream=(stream_id, batch_id)
            )
        else:
            sink.merge(batch_df, keys=keys, dedup_sort=dedup_sort)

    q = (
        stream_df.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q
