"""Exact deduplication by content hash.

Hash-groupBy: one shuffle on a 128-bit md5 of the content — uniformly
distributed, so no skew even at 100 TB (identical documents collapse into
one group; the pathological all-identical corpus is the only skew case and
AQE's skew-join handling covers the downstream join)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def exact_dedup_groups(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """One row per distinct content: canonical (min) id + duplicate count."""
    return (
        df.select(F.col(id_col), F.md5(F.col(content_col)).alias("content_md5"))
        .groupBy("content_md5")
        .agg(
            F.min(F.col(id_col)).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup(df: DataFrame, id_col: str, content_col: str) -> DataFrame:
    """Keep only the canonical (min-id) row per distinct content."""
    canon = exact_dedup_groups(df, id_col, content_col).select(
        F.col("canonical_id").alias(id_col)
    )
    return df.join(canon, id_col, "left_semi")
