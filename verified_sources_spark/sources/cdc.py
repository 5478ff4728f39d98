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


def txn_aligned_batches(changes: DataFrame, target_batch_size: int, txn_col: str = "txn_id") -> DataFrame:
    """Assign a ``batch_id`` such that batches have >= target_batch_size
    rows but transactions never straddle batches (they may overshoot —
    same contract as the reference's target_batch_size).

    One window pass ordered by lsn: running row count at each
    transaction's *end*, integer-divided by the target, numbers the
    batches.  All rows of a txn share its end-count → same batch."""
    w_txn = Window.partitionBy(txn_col)
    w_run = Window.orderBy("lsn").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    with_end = changes.withColumn("__txn_max_lsn", F.max("lsn").over(w_txn))
    # running count of rows up to each row, then take the txn's value at its max lsn
    running = with_end.withColumn("__rows_so_far", F.count(F.lit(1)).over(w_run))
    txn_end_rows = (
        running.groupBy(txn_col)
        .agg(F.max("__rows_so_far").alias("__txn_end_rows"))
    )
    out = (
        running.join(txn_end_rows, txn_col)
        .withColumn(
            "batch_id",
            (((F.col("__txn_end_rows") - 1) / F.lit(target_batch_size)).cast("long")),
        )
        .drop("__txn_max_lsn", "__rows_so_far", "__txn_end_rows")
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
    evolved schema)."""
    w = Window.orderBy(lsn_col)
    flag = (
        F.when(
            F.lag(F.col(schema_ver_col)).over(w).isNull()
            | (F.col(schema_ver_col) != F.lag(F.col(schema_ver_col)).over(w)),
            1,
        ).otherwise(0)
    )
    return changes.withColumn(
        "schema_epoch",
        F.sum(flag).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )


def replication_origin_progress(changes: DataFrame, lsn_col: str = "lsn") -> int | None:
    """Max LSN in the applied feed — the next run's slot-flush watermark."""
    row = changes.agg(F.max(lsn_col).alias("v")).collect()
    return row[0]["v"] if row else None
