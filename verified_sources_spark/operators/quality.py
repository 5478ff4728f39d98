"""Data-quality / schema-conformance operators.

The reference's test suite is built on a small set of assertion helpers
(reference tests/utils.py:230-359: assert_load_info, load_table_counts,
load_table_distinct_counts, assert_schema_on_data).  Here they are engine
features — post-load validation that runs distributed and returns a
report DataFrame instead of asserting in a test harness:

- ``table_counts``: COUNT(1) per table via UNION ALL (tests/utils.py:239-250).
- ``distinct_counts``: COUNT(DISTINCT key) per table (:253-267).
- ``check_schema_on_data``: column set/order, nullability conformance and
  type conformance against an expected StructType (:317-359).
- ``profile``: per-column null rate / distinct count / min / max — the
  generic conformance scan, one pass over the data.

All single-pass aggregates with map-side partials; profile of N columns
is ONE job (no per-column scans).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession


def table_counts(spark: SparkSession, tables: dict[str, DataFrame]) -> DataFrame:
    """One row per table: (table, n_rows) — UNION ALL of counts."""
    out = None
    for name, df in tables.items():
        c = df.agg(F.count(F.lit(1)).alias("n_rows")).select(F.lit(name).alias("table"), "n_rows")
        out = c if out is None else out.unionByName(c)
    return out


def distinct_counts(tables: dict[str, tuple[DataFrame, str]]) -> DataFrame:
    """{name: (df, key_col)} → (table, n_distinct)."""
    out = None
    for name, (df, key) in tables.items():
        c = df.agg(F.countDistinct(F.col(key)).alias("n_distinct")).select(
            F.lit(name).alias("table"), "n_distinct"
        )
        out = c if out is None else out.unionByName(c)
    return out


@dataclass
class SchemaReport:
    ok: bool
    missing_columns: list[str] = field(default_factory=list)
    unexpected_columns: list[str] = field(default_factory=list)
    type_mismatches: list[str] = field(default_factory=list)
    nullability_violations: list[str] = field(default_factory=list)


def check_schema_on_data(df: DataFrame, expected: T.StructType) -> SchemaReport:
    """Schema + data conformance: columns, types, and actual NULL scans
    for not-null columns (one aggregate job for all of them)."""
    actual = {f.name: f for f in df.schema.fields}
    exp = {f.name: f for f in expected.fields}
    rep = SchemaReport(ok=True)
    rep.missing_columns = [n for n in exp if n not in actual]
    rep.unexpected_columns = [n for n in actual if n not in exp]
    for n, f in exp.items():
        if n in actual and actual[n].dataType != f.dataType:
            rep.type_mismatches.append(
                f"{n}: expected {f.dataType.simpleString()}, got {actual[n].dataType.simpleString()}"
            )
    notnull = [n for n, f in exp.items() if not f.nullable and n in actual]
    if notnull:
        counts = df.agg(
            *[F.count(F.when(F.col(n).isNull(), 1)).alias(n) for n in notnull]
        ).collect()[0]
        rep.nullability_violations = [f"{n}: {counts[n]} NULLs" for n in notnull if counts[n] > 0]
    rep.ok = not (
        rep.missing_columns or rep.type_mismatches or rep.nullability_violations
    )
    return rep


def profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Per-column profile in ONE aggregate pass:
    (column, n_rows, n_nulls, n_distinct, min_str, max_str)."""
    columns = columns or df.columns
    aggs = []
    for c in columns:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}"),
            F.countDistinct(F.col(c)).alias(f"__dist_{c}"),
            F.min(F.col(c).cast("string")).alias(f"__min_{c}"),
            F.max(F.col(c).cast("string")).alias(f"__max_{c}"),
        ]
    row = df.agg(F.count(F.lit(1)).alias("__n"), *aggs).collect()[0]
    rows = [
        (c, row["__n"], row[f"__nulls_{c}"], row[f"__dist_{c}"], row[f"__min_{c}"], row[f"__max_{c}"])
        for c in columns
    ]
    return df.sparkSession.createDataFrame(
        rows, "column string, n_rows long, n_nulls long, n_distinct long, min_str string, max_str string"
    )
