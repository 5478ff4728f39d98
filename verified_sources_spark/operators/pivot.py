"""Pivot / unpivot / custom-field reshaping operators (SURVEY.md §2.5).

- ``custom_field_pivot``: the Zendesk ticket custom-field pivot
  (reference: sources/zendesk/helpers/api_helpers.py:20-80): explode the
  (id, value) array, broadcast-join the small fields dimension to map
  field id → title and option id → label, pivot back to one column per
  field.  The dimension join is a broadcast (dims are tiny); the pivot
  groups on the row key — one shuffle.
- ``unpivot``: wide → long melt (reference HubSpot stage-date unpivot,
  sources/hubspot/__init__.py:186-219) via the native ``unpivot``.
- ``rename_from_mapping``: the Pipedrive custom-field hash→name rename
  (reference: sources/pipedrive/helpers/custom_fields_munger.py:84-102)
  driven by a mapping dict with first-seen-wins semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from verified_sources_spark.functions import snake_case


def custom_field_pivot(
    rows: DataFrame,
    fields_dim: DataFrame,
    row_key: str,
    custom_fields_col: str = "custom_fields",
    field_id: str = "id",
    field_value: str = "value",
    dim_id: str = "id",
    dim_title: str = "title",
    dim_options: str | None = "options",
) -> DataFrame:
    """tickets(custom_fields: array<struct<id,value>>) × fields_dim →
    one pivoted column per field title, option ids mapped to labels."""
    exploded = rows.select(
        F.col(row_key),
        F.explode_outer(F.col(custom_fields_col)).alias("cf"),
    ).select(
        F.col(row_key),
        F.col(f"cf.{field_id}").alias("__fid"),
        F.col(f"cf.{field_value}").cast("string").alias("__fval"),
    )
    dim = fields_dim.select(
        F.col(dim_id).alias("__fid"),
        F.col(dim_title).alias("__ftitle"),
        *([F.col(dim_options).alias("__fopts")] if dim_options else []),
    )
    joined = exploded.join(F.broadcast(dim), "__fid", "left")
    if dim_options:
        joined = joined.withColumn(
            "__fval",
            F.coalesce(F.element_at(F.col("__fopts"), F.col("__fval")), F.col("__fval")),
        )
    titles = [r["__ftitle"] for r in dim.select("__ftitle").distinct().collect()]
    pivoted = (
        joined.groupBy(row_key)
        .pivot("__ftitle", titles)
        .agg(F.first("__fval", ignorenulls=True))
    )
    return pivoted.toDF(row_key, *[snake_case(t) for t in titles])


def unpivot(
    df: DataFrame,
    ids: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide → long melt (native unpivot; no shuffle — a generate node)."""
    return df.unpivot(list(ids), list(value_cols), var_name, value_name)


def rename_from_mapping(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """Rename columns hash→human-name, snake_cased, first-seen-wins (a
    later duplicate target name keeps the original column untouched)."""
    seen: set[str] = set(df.columns)
    final: dict[str, str] = {}
    for old, new in mapping.items():
        tgt = snake_case(new)
        if old in df.columns and tgt not in seen:
            final[old] = tgt
            seen.add(tgt)
    return df.withColumnsRenamed(final)
