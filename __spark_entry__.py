"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``: flagship query (TPC-H Q1 shape) on sf0.001.
- ``queries()``: every declared operator/query from SURVEY.md §2 as
  (spark, sf_dir) -> DataFrame callables.
- ``oracle_sql()``: matching DuckDB SQL for the hash-compare gate; queries
  without an entry here are rows-only checked (non-SQL-expressible ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    from verified_sources_spark.plans.queries import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from verified_sources_spark.plans.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from verified_sources_spark.plans.oracle import ORACLE_SQL

    return dict(ORACLE_SQL)
