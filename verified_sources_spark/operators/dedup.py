"""Keyed deduplication operators (SURVEY.md §2.9).

``keep_latest`` is the engine's ``dedup_sort`` (reference:
sources/pg_replication/helpers.py:765-767 — keep max-lsn row per pk before
merge): a window ``row_number() = 1``.  At scale this is one hash shuffle
on the key — the same shuffle the subsequent merge needs, so AQE can reuse
the exchange when keys align.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def keep_latest(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    descending: bool = True,
) -> DataFrame:
    """One row per key: the first under (order_by, descending).  Ties are
    impossible if order_by ends in a unique column — callers should ensure
    that for determinism."""
    order_cols = [F.col(c).desc() if descending else F.col(c).asc() for c in order_by]
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def drop_exact_duplicates(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Set-of-tuples dedup (reference: sources/hubspot/helpers.py:188-191)."""
    return df.dropDuplicates(list(subset) if subset else None)
