"""Change-data-capture application (SURVEY.md §3.2, pg_replication).

The reference decodes pgoutput into ordered I/U/D rows with LSNs and
applies them with merge semantics (reference:
sources/pg_replication/helpers.py:725-841).  Here the change feed is
already a DataFrame with the engine's canonical CDC schema:

    table string, op string (I|U|D), lsn long, txn_id long,
    <payload columns>, deleted_ts timestamp (set on D rows)

and the engine provides:

- ``txn_aligned_batches``: split a feed into batches of ~target size that
  NEVER split a transaction (reference helpers.py:711-723 stops only at
  Commit) — computed with a window cumsum over txn sizes, no driver loop.
- ``apply_changes``: per-table merge with keep-max-lsn dedup and hard
  deletes (dedup_sort desc + deleted_ts — §2.9), via the same
  merge_dataframes core the sinks use.
- ``replication_origin_progress``: the slot-advance watermark = max lsn
  fully applied; persisting it before the next run is the exactly-once
  contract (flush the slot only up to the previously committed LSN).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from verified_sources_spark.operators.merge import merge_dataframes
from verified_sources_spark.operators.prefix import (
    BUCKET_COL,
    bucketed_lag,
    bucketed_prefix_sum,
    with_range_buckets,
)


def txn_aligned_batches(changes: DataFrame, target_batch_size: int, txn_col: str = "txn_id") -> DataFrame:
    """Assign a ``batch_id`` such that batches have >= target_batch_size
    rows but transactions never straddle batches (they may overshoot —
    same contract as the reference's target_batch_size).

    Running row count at each transaction's *end* position in LSN order,
    integer-divided by the target, numbers the batches; all rows of a txn
    share its end-count → same batch.  The running count is a distributed
    two-pass prefix sum (operators.prefix) — bucket-parallel windows plus
    a broadcast of per-bucket offsets — NOT a global single-partition
    window, so the step scales to a 100 TB change feed."""
    bucketed = with_range_buckets(changes, "lsn")
    running = bucketed_prefix_sum(bucketed, "lsn", F.lit(1), "__rows_so_far")
    txn_end_rows = running.groupBy(txn_col).agg(F.max("__rows_so_far").alias("__txn_end_rows"))
    out = (
        running.join(txn_end_rows, txn_col)
        .withColumn(
            "batch_id",
            (((F.col("__txn_end_rows") - 1) / F.lit(target_batch_size)).cast("long")),
        )
        .drop(BUCKET_COL, "__rows_so_far", "__txn_end_rows")
    )
    return out


def apply_changes(
    target: DataFrame | None,
    changes: DataFrame,
    keys: Sequence[str],
    payload_cols: Sequence[str],
    lsn_col: str = "lsn",
    op_col: str = "op",
) -> DataFrame:
    """Apply an I/U/D feed to a snapshot: keep-latest by lsn per key, then
    merge upserts and execute deletes."""
    src = changes.withColumn(
        "__deleted_ts", F.when(F.col(op_col) == "D", F.col(lsn_col)).cast("long")
    ).select(*keys, *payload_cols, lsn_col, "__deleted_ts")
    merged = merge_dataframes(
        target,
        src,
        keys,
        dedup_sort=[lsn_col],
        hard_delete_col="__deleted_ts",
    )
    return merged.drop(lsn_col)


def split_on_schema_change(
    changes: DataFrame, schema_ver_col: str, lsn_col: str = "lsn"
) -> DataFrame:
    """Schema-drift batch split (reference: a changed Relation message
    aborts the batch so the new schema starts fresh,
    sources/pg_replication/helpers.py:725-736): assign ``schema_epoch``
    that increments at every schema-version change point in LSN order.
    Downstream applies each epoch separately (fresh MERGE with the
    evolved schema).

    Both the global lag (previous row's schema version) and the running
    change-point count are bucket-parallel two-pass scans
    (operators.prefix), not single-partition windows — see
    txn_aligned_batches for the scale rationale."""
    bucketed = with_range_buckets(changes, lsn_col)
    lagged = bucketed_lag(bucketed, lsn_col, schema_ver_col, "__prev_ver")
    flag = (
        F.when(
            F.col("__prev_ver").isNull()
            | (F.col(schema_ver_col) != F.col("__prev_ver")),
            1,
        ).otherwise(0)
    )
    out = bucketed_prefix_sum(lagged, lsn_col, flag, "schema_epoch")
    return out.drop(BUCKET_COL, "__prev_ver")


def snapshot_at_lsn(
    base: DataFrame | None,
    changes: DataFrame,
    slot_lsn: int,
    keys: Sequence[str],
    payload_cols: Sequence[str],
    lsn_col: str = "lsn",
    op_col: str = "op",
) -> DataFrame:
    """The consistent snapshot a replication slot exports: the base table
    with every change at or below ``slot_lsn`` applied (reference
    ``persist_snapshot_table`` copies the table under the slot's exported
    snapshot, sources/pg_replication/helpers.py:394-422 — same state,
    expressed as a bounded replay)."""
    upto = changes.filter(F.col(lsn_col) <= F.lit(slot_lsn))
    return apply_changes(base, upto, keys, payload_cols, lsn_col, op_col)


def snapshot_then_stream(
    snapshot: DataFrame,
    slot_lsn: int,
    changes: DataFrame,
    keys: Sequence[str],
    payload_cols: Sequence[str],
    lsn_col: str = "lsn",
    op_col: str = "op",
) -> DataFrame:
    """Initial-load → replication handoff at a consistent LSN (reference
    ``init_replication`` snapshot resources + subsequent slot reads,
    sources/pg_replication/helpers.py:185-223): changes with
    ``lsn <= slot_lsn`` are already reflected in the snapshot and MUST be
    skipped (re-delivery is expected — the slot re-sends from the last
    confirmed flush); applying the strict tail converges to the live
    table state with no duplicates and no gaps.

    The LSN filter is a pushdown predicate (reaches the parquet/Kafka
    scan), so re-bootstraps don't re-read already-applied history."""
    tail = changes.filter(F.col(lsn_col) > F.lit(slot_lsn))
    return apply_changes(snapshot, tail, keys, payload_cols, lsn_col, op_col)


def replication_origin_progress(changes: DataFrame, lsn_col: str = "lsn") -> int | None:
    """Max LSN in the applied feed — the next run's slot-flush watermark."""
    row = changes.agg(F.max(lsn_col).alias("v")).collect()
    return row[0]["v"] if row else None
