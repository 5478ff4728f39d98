"""Normalization: nested data → relational tables (dlt's normalizer,
re-expressed on DataFrames).

The reference yields nested dicts and relies on dlt core to (a) snake_case
identifiers, (b) flatten nested objects into ``parent__child`` columns up
to ``max_table_nesting``, (c) split nested lists into child tables with
parent keys.  Here:

- ``flatten_structs``: struct columns → ``parent__child`` flat columns,
  depth-bounded (reference `max_table_nesting`, e.g.
  sources/zendesk/__init__.py:29).  Pure projection — no shuffle.
- ``extract_child_table``: array column → child DataFrame with
  (parent key, _idx, value...) via ``posexplode`` — the `_dlt_list_idx`
  analogue.
- ``parse_json_column``: JSON string column → typed struct via
  ``from_json`` (schema given or sampled).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

from verified_sources_spark.functions import snake_case


def flatten_structs(df: DataFrame, max_nesting: int = 2, sep: str = "__") -> DataFrame:
    """Flatten StructType columns into ``a__b`` scalars up to *max_nesting*
    levels; deeper structs are kept as JSON strings (the reference keeps
    over-deep nesting as a ``json`` column)."""
    for _ in range(max_nesting):
        struct_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, T.StructType)]
        if not struct_cols:
            return df
        cols = []
        for f in df.schema.fields:
            if f.name in struct_cols:
                inner = f.dataType
                # snake_case each path segment separately — snake_case()
                # itself would collapse the `__` nesting separator
                parent = sep.join(snake_case(p) for p in f.name.split(sep))
                cols.extend(
                    F.col(f"`{f.name}`.`{sub.name}`").alias(
                        f"{parent}{sep}{snake_case(sub.name)}"
                    )
                    for sub in inner.fields
                )
            else:
                cols.append(F.col(f"`{f.name}`"))
        df = df.select(*cols)
    # cap reached: stringify any remaining structs
    remaining = [f.name for f in df.schema.fields if isinstance(f.dataType, T.StructType)]
    for name in remaining:
        df = df.withColumn(name, F.to_json(F.col(name)))
    return df


def extract_child_table(
    df: DataFrame, array_col: str, parent_keys: Sequence[str], idx_col: str = "_list_idx"
) -> DataFrame:
    """Nested list → child table rows keyed by parent + position."""
    out = df.select(
        *[F.col(k) for k in parent_keys],
        F.posexplode_outer(F.col(array_col)).alias(idx_col, array_col),
    )
    # if elements are structs, flatten one level into the child table
    elem_type = dict(zip(out.columns, [f.dataType for f in out.schema.fields]))[array_col]
    if isinstance(elem_type, T.StructType):
        out = flatten_structs(out, max_nesting=1)
    return out


def parse_json_column(df: DataFrame, col: str, schema: T.DataType | str | None = None) -> DataFrame:
    """JSON string column → struct.  If no schema given, infer it from the
    data with ``schema_of_json_agg``-style sampling (one extra pass over a
    sample, not the full data)."""
    if schema is None:
        sample = [r[0] for r in df.select(col).dropna().limit(100).collect()]
        if not sample:
            return df
        schema = df.sparkSession.range(1).select(
            F.schema_of_json(F.lit(sample[0])).alias("s")
        ).collect()[0]["s"]
    return df.withColumn(col, F.from_json(F.col(col), schema))


def map_to_columns(df: DataFrame, map_col: str, keys: Sequence[str] | None = None) -> DataFrame:
    """Dynamic attribute map → flat snake_case columns (reference personio
    dynamic attributes, sources/personio/__init__.py:54-68).  If *keys* is
    None they are discovered with one distinct-keys aggregate (metadata-
    sized collect)."""
    if keys is None:
        keys = [
            r["k"]
            for r in df.select(F.explode(F.map_keys(F.col(map_col))).alias("k")).distinct().collect()
        ]
    out = df.select(
        "*", *[F.col(map_col)[k].alias(snake_case(k)) for k in keys]
    ).drop(map_col)
    return out
