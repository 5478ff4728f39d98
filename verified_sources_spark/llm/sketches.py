"""Deterministic cardinality sketches: hash-threshold distinct
sampling.

The classic distinct-sampling / adaptive-sampling estimator (Gibbons,
VLDB 2001 family): hash every value with the engine's frozen 60-bit
md5 family (one md5 per value, the llm/minhash prefix convention),
keep only values hashing below ``2^(60 - sample_log2)``, and scale
the subsample's exact distinct count back up by ``2^sample_log2``.
Because the "sample" is a fixed hash-range cut rather than a random
draw, the estimator is

- DETERMINISTIC: same data → same estimate, bit-for-bit — so the SQL
  oracle replays it exactly and accuracy regressions are pinnable;
- MERGEABLE: the union's subsample is the union of subsamples, so
  per-partition / per-day sketches combine by distinct-union — the
  100 TB shape (relative error ~ 1/sqrt(distinct/2^sample_log2));
- CHEAP at scale: the ``h < threshold`` filter runs inside the scan
  right after the hash, so only ~2^-sample_log2 of the value stream
  ever reaches an exchange.

No HyperLogLog here on purpose: HLL estimates are
implementation-defined (Spark's and DuckDB's disagree), which would
break the oracle-replay posture; this estimator trades a wider error
bar for bit-exactness and mergeability.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hash_sampled_distinct"]


def hash_sampled_distinct(df: DataFrame, group_cols: list[str],
                          value_col: str,
                          sample_log2: int = 8) -> DataFrame:
    """Per-group distinct-count estimates for ``value_col``.

    Returns one row per group: ``n_sampled`` (exact distinct count of
    the hash-range subsample) and ``estimate`` =
    ``n_sampled << sample_log2``.  Groups whose every value hashes
    above the threshold estimate 0 — at ``sample_log2=8`` that only
    happens for groups with ≲ a few hundred distinct values, where
    the caller should use an exact count anyway (the estimator's
    regime is the vocabulary too large to count exactly)."""
    if not 0 <= sample_log2 <= 59:
        raise ValueError("sample_log2 must be in [0, 59]")
    threshold = 1 << (60 - sample_log2)
    hashed = df.select(
        *[F.col(c) for c in group_cols],
        F.col(value_col).alias("_v"),
        F.expr(f"CAST(conv(substring(md5({value_col}), 1, 15), "
               "16, 10) AS BIGINT)").alias("_h"))
    return (
        hashed.filter(F.col("_h") < F.lit(threshold))
        .groupBy(*group_cols)
        .agg(F.countDistinct("_v").alias("n_sampled"))
        .withColumn(
            "estimate",
            F.expr(f"n_sampled * {1 << sample_log2}L")))
