"""Distributed prefix scans over a global ordering — no single-partition window.

A plain ``Window.orderBy(x)`` with no ``partitionBy`` moves the ENTIRE
input through one partition — correct, but a scale-killer on a 100 TB
change feed. These helpers compute the same running aggregates with the
classic two-pass scheme:

1. bucket rows by value range (explicit quantile-derived boundaries, so
   bucketing is deterministic — no reliance on ``repartitionByRange``'s
   sampled, plan-internal boundaries);
2. aggregate per-bucket totals map-side (one row per bucket — a
   metadata-sized collect, like the engine's cursor/centroid collects)
   and turn them into exclusive offsets on the driver;
3. run the window *within* each bucket in parallel and add the bucket's
   offset as a literal.

The final plan contains no SinglePartition exchange at all (asserted in
tests/test_sources.py). Used by ``sources.cdc.txn_aligned_batches`` /
``split_on_schema_change`` (reference:
sources/pg_replication/helpers.py:711-736 consumes the feed strictly in
LSN order; here the order is logical, the compute parallel).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

BUCKET_COL = "__bkt"


def with_range_buckets(
    df: DataFrame, order_col: str, num_buckets: int | None = None
) -> DataFrame:
    """Add a deterministic range-bucket id over ``order_col``.

    Boundaries come from ``approxQuantile`` (driver-side, ``num_buckets - 1``
    doubles — metadata-sized); equal values always share a bucket, so the
    bucket order is a coarsening of the global value order.
    """
    if num_buckets is None:
        num_buckets = max(8, df.sparkSession.sparkContext.defaultParallelism)
    bounds = df.approxQuantile(order_col, [i / num_buckets for i in range(1, num_buckets)], 0.001)
    # strictly increasing boundary list (quantiles can repeat on skewed data)
    uniq: list[float] = []
    for b in bounds:
        if not uniq or b > uniq[-1]:
            uniq.append(b)
    if not uniq:
        return df.withColumn(BUCKET_COL, F.lit(0))
    return df.withColumn(
        BUCKET_COL, _bucket_of(F.col(order_col), uniq).cast("int")
    )


def _bucket_of(col: Column, bounds: list[float]) -> Column:
    """bucket(v) = |{b in bounds : v > b}| via a balanced binary comparison
    tree: O(log B) comparisons per row instead of the flat O(B) CASE chain,
    so bucket counts can track cluster cores into the thousands. The
    branches of each ``when`` are evaluated lazily per row, so only one
    root-to-leaf path runs."""

    def tree(lo: int, hi: int) -> Column:
        # resolves to a bucket id in [lo, hi] using bounds[lo..hi-1]
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi) // 2
        # v > bounds[mid] ⟹ v exceeds every earlier bound too (sorted,
        # strictly increasing) ⟹ bucket >= mid + 1
        return F.when(col > F.lit(bounds[mid]), tree(mid + 1, hi)).otherwise(
            tree(lo, mid)
        )

    return tree(0, len(bounds))


def _bucket_literal_map(pairs: dict[int, object], default=None) -> Column:
    """bucket-id → literal value lookup: a dense literal array indexed by
    bucket id — O(1) per row (the old CASE chain was O(B)). Bucket ids
    absent from ``pairs`` hold ``default``, but are never looked up (an
    absent id means no row carries it)."""
    if not pairs:
        return F.lit(default)
    dense = [default] * (max(pairs) + 1)
    for bkt, val in pairs.items():
        dense[bkt] = val
    arr = F.array(*[F.lit(v) for v in dense])
    return F.element_at(arr, F.col(BUCKET_COL) + 1)


def bucketed_prefix_sum(bdf: DataFrame, order_col: str, value: Column, out_col: str) -> DataFrame:
    """Inclusive running sum of ``value`` over the global ``order_col`` order.

    Expects ``with_range_buckets`` output. Each bucket's window runs in
    parallel; cross-bucket offsets come from a map-side-combinable
    per-bucket aggregate collected to the driver (one row per bucket) and
    re-applied as literals — no SinglePartition exchange anywhere.
    """
    totals = {
        r[BUCKET_COL]: r["__tot"] or 0
        for r in bdf.groupBy(BUCKET_COL).agg(F.sum(value).alias("__tot")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for bkt in sorted(totals):
        offsets[bkt] = acc
        acc += totals[bkt]
    w_local = (
        Window.partitionBy(BUCKET_COL)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return bdf.withColumn(
        out_col,
        (F.sum(value).over(w_local) + _bucket_literal_map(offsets, default=0)).cast("long"),
    )


def bucketed_lag(bdf: DataFrame, order_col: str, val_col: str, out_col: str) -> DataFrame:
    """``lag(val_col)`` over the global ``order_col`` order, bucket-parallel.

    The first row of each bucket takes the last value of the nearest
    non-empty earlier bucket (one row per bucket collected to the driver,
    chained there, re-applied as literals).
    """
    last_rows = (
        bdf.groupBy(BUCKET_COL)
        .agg(F.max_by(F.col(val_col), F.col(order_col)).alias("__last"))
        .collect()
    )
    last_per_bucket = {r[BUCKET_COL]: r["__last"] for r in last_rows}
    prev: dict[int, object] = {}
    carried = None
    for bkt in sorted(last_per_bucket):
        prev[bkt] = carried
        carried = last_per_bucket[bkt]
    w_local = Window.partitionBy(BUCKET_COL).orderBy(order_col)
    return bdf.withColumn(
        out_col,
        F.coalesce(F.lag(F.col(val_col)).over(w_local), _bucket_literal_map(prev)),
    )


def bucketed_row_number(
    bdf: DataFrame, order_cols: list[Column], out_col: str
) -> tuple[DataFrame, int]:
    """Global ``row_number`` over ``order_cols``, bucket-parallel.

    ``order_cols`` must refine the bucket order (first key = the bucketed
    column) and be a TOTAL order (tie-break on a unique key), or ranks are
    nondeterministic. Per-bucket counts collect to the driver (one row per
    bucket) and become exclusive literal offsets; returns the ranked frame
    plus the total row count — free from the same collect, callers need it
    for rank-derived stats (ntile, percentile).
    """
    counts = {
        r[BUCKET_COL]: r["__n"]
        for r in bdf.groupBy(BUCKET_COL).agg(F.count(F.lit(1)).alias("__n")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for bkt in sorted(counts):
        offsets[bkt] = acc
        acc += counts[bkt]
    w_local = Window.partitionBy(BUCKET_COL).orderBy(*order_cols)
    ranked = bdf.withColumn(
        out_col,
        (F.row_number().over(w_local) + _bucket_literal_map(offsets, default=0)).cast(
            "long"
        ),
    )
    return ranked, acc


def ntile_from_rank(rank: Column, n_rows: int, tiles: int) -> Column:
    """SQL ``ntile(tiles)`` derived from a precomputed global rank — pure
    expression, no window.

    Standard ntile fill: with n = tiles*size + rem, the first ``rem``
    tiles hold ``size + 1`` rows, the rest ``size`` (one extra row per
    tile from the front). Exact for n_rows < 2^53 (double-division floor;
    any conceivable table is orders of magnitude below that).
    """
    size, rem = divmod(int(n_rows), tiles)
    big = rem * (size + 1)  # rows living in the size+1 tiles
    if size == 0:
        return rank.cast("int")  # more tiles than rows: tile i = row i
    return (
        F.when(rank <= F.lit(big), F.floor((rank - 1) / F.lit(size + 1)))
        .otherwise(F.lit(rem) + F.floor((rank - 1 - F.lit(big)) / F.lit(size)))
        + F.lit(1)
    ).cast("int")
