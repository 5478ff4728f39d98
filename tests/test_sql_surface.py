"""The SQL surface: register_views + spark.sql as a first-class query path.

A user of the engine can point plain ANSI-ish SQL at the registered
catalog and get the same plans/results as the DataFrame API — Catalyst
compiles both to the same logical algebra, so pushdown/broadcast behave
identically.  These tests pin that contract.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from verified_sources_spark.catalog import register_views

SF = "/root/testdata/sf0.001"


def test_sql_join_agg_matches_dataframe_api(spark):
    register_views(spark, SF)
    sql = spark.sql(
        """
        SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )
    got = {(r["n_name"], r["n_customers"]) for r in sql.collect()}
    dfs = register_views(spark, SF)
    api = (
        dfs["customer"]
        .join(dfs["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).cast("long").alias("n_customers"))
    )
    want = {(r["n_name"], r["n_customers"]) for r in api.collect()}
    assert got == want and got


def test_sql_filter_pushdown_reaches_scan(spark):
    register_views(spark, SF)
    df = spark.sql(
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_totalprice > 100000"
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "o_totalprice" in plan


def test_sql_over_engine_function_views(spark):
    """Engine text functions compose with the SQL surface through a
    registered view of a derived DataFrame."""
    from verified_sources_spark.functions.text import token_count

    dfs = register_views(spark, SF)
    dfs["documents"].select(
        "doc_id", token_count(F.col("text")).alias("n_tokens")
    ).createOrReplaceTempView("doc_tokens")
    out = spark.sql(
        "SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM doc_tokens"
    ).collect()[0]["total"]
    assert out > 0
