"""Write-disposition sink algebra (SURVEY.md §2.9).

The reference's four dispositions (append / replace / merge / merge+hard
delete, reference: sources/mongodb/__init__.py:76-77,
sources/pg_replication/helpers.py:758-773) expressed Spark-first:

- ``merge_dataframes`` is the pure relational core:
      target ⟕anti src ∪ dedup(src ∖ deletes)
  i.e. keep target rows whose key is untouched, then union the deduped
  non-deleted source rows.  On a transactional table format (Delta /
  Iceberg) this becomes a real ``MERGE INTO`` with file-level pruning; the
  join formulation here is the format-agnostic fallback and is exactly
  what Delta executes physically (inner-join to find touched files,
  rewrite).  The anti-join shuffles on the key once; with a bucketed
  target the shuffle disappears.

- ``ParquetSink`` materializes the dispositions on plain parquet
  directories with atomic swap (write tmp → rename), the closest we get to
  transactional semantics without a table format dependency.
"""

from __future__ import annotations

import os
import shutil
import uuid
from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from verified_sources_spark.operators.dedup import keep_latest


def merge_dataframes(
    target: DataFrame | None,
    source: DataFrame,
    keys: Sequence[str],
    dedup_sort: Sequence[str] | None = None,
    dedup_descending: bool = True,
    hard_delete_col: str | None = None,
) -> DataFrame:
    """Keyed upsert with optional within-batch dedup and hard deletes.

    - ``dedup_sort``: keep one source row per key ordered by these columns
      (desc by default) — the reference's ``dedup_sort: desc`` on ``lsn``.
    - ``hard_delete_col``: source rows with this column non-NULL delete the
      key instead of upserting (reference:
      sources/pg_replication/helpers.py:768-773).
    """
    keys = list(keys)
    src = source
    if dedup_sort:
        src = keep_latest(src, keys, list(dedup_sort), descending=dedup_descending)
    if hard_delete_col is not None:
        upserts = src.filter(F.col(hard_delete_col).isNull()).drop(hard_delete_col)
    else:
        upserts = src
    if target is None:
        return upserts
    # every source key (including deletes) removes the old target row
    touched = src.select(*keys).distinct()
    survivors = target.join(touched, on=keys, how="left_anti")
    return survivors.unionByName(upserts, allowMissingColumns=True)


class ParquetSink:
    """A named table on a parquet directory with the dlt write dispositions.

    ``merge`` rewrites the table via the join formulation above.  Swap is
    atomic at the directory level.  (Scale path: Delta `MERGE INTO` with
    deletion vectors; this class keeps the same API so callers don't
    change.)
    """

    def __init__(self, spark: SparkSession, path: str, partition_by: Sequence[str] | None = None):
        self.spark = spark
        self.path = path.rstrip("/")
        self.partition_by = list(partition_by or [])

    def exists(self) -> bool:
        return os.path.isdir(self.path) and bool(os.listdir(self.path))

    def read(self) -> DataFrame:
        # mergeSchema: tolerate column drift across appended batches
        # (dlt's schema-evolution contract; new columns read as NULL in
        # old files).  Partition columns come back via directory discovery.
        return self.spark.read.option("mergeSchema", "true").parquet(self.path)

    def _writer(self, df: DataFrame):
        w = df.write
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        return w

    def append(self, df: DataFrame) -> None:
        self._writer(df).mode("append").parquet(self.path)

    def replace(self, df: DataFrame) -> None:
        tmp = f"{self.path}.__tmp_{uuid.uuid4().hex[:8]}"
        self._writer(df).mode("overwrite").parquet(tmp)
        if os.path.isdir(self.path):
            shutil.rmtree(self.path)
        os.replace(tmp, self.path)

    def replace_partitions(self, df: DataFrame) -> None:
        """Dynamic partition overwrite: rewrite ONLY the partitions present
        in *df*, leave others untouched — the scale path for replace-mode
        loads of date-partitioned tables (a full-table replace at 100 TB
        rewrites everything; this rewrites one day)."""
        if not self.partition_by:
            raise ValueError("replace_partitions requires partition_by")
        (
            self._writer(df)
            .mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .parquet(self.path)
        )

    def merge(
        self,
        df: DataFrame,
        keys: Sequence[str],
        dedup_sort: Sequence[str] | None = None,
        hard_delete_col: str | None = None,
    ) -> None:
        target = self.read() if self.exists() else None
        merged = merge_dataframes(
            target, df, keys, dedup_sort=dedup_sort, hard_delete_col=hard_delete_col
        )
        # replace() writes to a tmp dir first, so the lazy plan still reads
        # the old files while producing the new ones; swap happens after.
        self.replace(merged)

    def write(self, df: DataFrame, disposition: str = "append", **kwargs) -> None:
        if disposition == "append":
            self.append(df)
        elif disposition == "replace":
            self.replace(df)
        elif disposition == "merge":
            self.merge(df, **kwargs)
        else:
            raise ValueError(f"unknown write_disposition: {disposition}")
