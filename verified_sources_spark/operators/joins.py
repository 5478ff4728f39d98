"""Join operators beyond Spark's built-ins (SURVEY.md §2.6).

The reference has no relational join operator (its "joins" are correlated
API fetches); equi/semi/anti come free with DataFrames.  The genuinely
missing shapes Spark lacks natively:

- ``as_of_join``: for each left row, the latest right row with
  ``right_time <= left_time`` per key (backward; forward symmetric).
  Implemented with the union + last(ignorenulls) window technique: tag
  both sides, union by (key, time), carry the last right payload forward
  within each key partition.  ONE shuffle + sort on (key, time) — no
  join explosion, no per-row subquery; this is the standard scalable
  formulation (a key-equi sort-merge as-of).  Skewed keys fall out the
  same as any window: salt the key or split hot partitions with AQE.

- ``range_join``: interval containment via non-equi join; when one side
  is a small interval table (date chunks, buckets) Spark broadcasts it
  and the scan stays one pass.  Provided as a thin named wrapper so plans
  read declaratively.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_time: str,
    right_time: str,
    right_payload: Sequence[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Backward (default) as-of join: left rows get the most recent right
    payload at-or-before their timestamp.  Ties on time: the right row
    sorts before the left row, so an exactly-equal timestamp matches."""
    keys = [on] if isinstance(on, str) else list(on)
    right_payload = list(right_payload or [c for c in right.columns if c not in keys and c != right_time])

    lt, rt = F.col(left_time), F.col(right_time)
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be backward|forward")

    # both sides project to (keys, __t, __is_left, left extras, right
    # payload) with NULLs for the other side's columns
    extra_left = [c for c in left.columns if c not in keys and c != left_time]
    l_full = left.select(
        *keys,
        lt.alias("__t"),
        F.lit(1).alias("__is_left"),
        *[F.col(c).alias(f"__l_{c}") for c in extra_left],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__r_{c}") for c in right_payload],
    )
    r_full = right.select(
        *keys,
        rt.alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(f"__l_{c}") for c in extra_left],
        *[F.col(c).alias(f"__r_{c}") for c in right_payload],
    )
    unioned = l_full.unionByName(r_full)

    asc = direction == "backward"
    order = [F.col("__t").asc() if asc else F.col("__t").desc(), F.col("__is_left").asc()]
    w = (
        Window.partitionBy(*[F.col(k) for k in keys])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *keys,
        "__t",
        "__is_left",
        *[F.col(f"__l_{c}") for c in extra_left],
        *[F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__rv_{c}") for c in right_payload],
    )
    out = carried.filter(F.col("__is_left") == 1).select(
        *keys,
        F.col("__t").alias(left_time),
        *[F.col(f"__l_{c}").alias(c) for c in extra_left],
        *[F.col(f"__rv_{c}").alias(c) for c in right_payload],
    )
    return out


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigated equi-join: the (large, skewed) left side gets a
    random-free deterministic salt (hash of all columns mod buckets); the
    right side is exploded ``salt_buckets`` times so every (key, salt)
    pair matches.  Hot keys spread across ``salt_buckets`` tasks instead
    of one straggler.  Result set is identical to a plain join — tests
    assert equivalence.  Use when AQE's skew-join split is unavailable
    (e.g. bucketed tables disable AQE reshuffle) or insufficient.

    Only ``inner``/``left``/``left_semi``/``left_anti`` are supported: the
    exploded right side would emit unmatched right rows once per salt
    bucket under right/full joins (plain-join equivalence would break)."""
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi", "left_anti", "leftanti"}
    if how.lower().replace("_", "") not in {h.replace("_", "") for h in allowed}:
        raise ValueError(
            f"salted_join supports {sorted(allowed)} only, got {how!r}: the "
            "salt-exploded right side duplicates unmatched right rows under "
            "right/full joins"
        )
    salt = (F.abs(F.xxhash64(*[F.col(c) for c in left.columns])) % salt_buckets).alias("__salt")
    l_salted = left.withColumn("__salt", salt)
    r_exploded = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(salt_buckets)]))
    )
    out = l_salted.join(r_exploded, [on, "__salt"], how)
    return out.drop("__salt")


def range_join(
    left: DataFrame,
    intervals: DataFrame,
    point: str | Column,
    start: str = "range_start",
    end: str = "range_end",
    how: str = "inner",
    broadcast_intervals: bool = True,
) -> DataFrame:
    """point-in-interval join ([start, end) containment)."""
    p = F.col(point) if isinstance(point, str) else point
    iv = F.broadcast(intervals) if broadcast_intervals else intervals
    return left.join(iv, (p >= F.col(start)) & (p < F.col(end)), how)
