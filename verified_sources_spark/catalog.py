"""Star-schema catalog over the driver's parquet test data.

Tables (see /root/repo/TESTDATA.md): region nation customer supplier part
orders lineitem events documents embeddings — one parquet file each under
``{sf_dir}/{name}.parquet``.

Scale note: these are plain ``spark.read.parquet`` scans, so Catalyst gets
predicate pushdown, column pruning and partition-size splitting for free;
at 100 TB the same loader works over a partitioned directory layout
(``.../orders/o_orderdate_month=.../*.parquet``) with partition pruning.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one star-schema table; normalizes physical quirks.

    ``events.ts`` is stored as parquet ``timestamp[ns]`` which Spark's
    reader only exposes as int64 (``nanosAsLong``); convert to a proper
    TIMESTAMP at microsecond precision (floor division — matches DuckDB's
    ``epoch_us`` on the same values).
    """
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer DIV — a double division would lose precision at ns scale
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register all tables as temp views (for the SQL surface)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
