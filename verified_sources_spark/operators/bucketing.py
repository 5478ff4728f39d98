"""Bucketed tables: shuffle-free co-located joins.

The 100 TB answer to "this join shuffles both sides every run": write the
big tables bucketed by the join key (`bucketBy` + `saveAsTable`); joins
between same-bucketed tables read co-located buckets and skip the
exchange entirely (verified in tests: the physical plan contains no
Exchange).  The reference has no equivalent — its joins happen in the
destination warehouse; this is Spark-native capability the engine
exposes for repeated-join workloads (fact-to-fact joins, incremental
merges into a bucketed target).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Save as a bucketed (+optionally sorted) managed table.  Sorting
    within buckets additionally enables merge-join without a sort step."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: Sequence[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables (no exchange when bucket specs match)."""
    return spark.table(left_table).join(spark.table(right_table), list(on), how)


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle exchange (broadcast
    exchanges don't count — they move the small side, not the data)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return any(
        marker in plan
        for marker in ("Exchange hashpartitioning", "Exchange rangepartitioning", "Exchange SinglePartition")
    )
