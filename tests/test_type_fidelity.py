"""All-data-types fixture (FIXTURES.md §2, modeled on the reference's
tests/pg_replication/cases.py TABLE_ROW_ALL_DATA_TYPES): every engine type
with a NULL twin and precision variants, round-tripped through the
parquet sink and the merge disposition without loss."""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

import pyspark.sql.functions as F
import pyspark.sql.types as T

from verified_sources_spark.operators.merge import ParquetSink

SCHEMA = T.StructType(
    [
        T.StructField("col1", T.LongType(), False),
        T.StructField("col1_null", T.LongType(), True),
        T.StructField("col2", T.DoubleType(), False),
        T.StructField("col2_null", T.DoubleType(), True),
        T.StructField("col3", T.BooleanType(), False),
        T.StructField("col3_null", T.BooleanType(), True),
        T.StructField("col4", T.TimestampType(), False),
        T.StructField("col4_null", T.TimestampType(), True),
        T.StructField("col5", T.StringType(), False),
        T.StructField("col5_null", T.StringType(), True),
        T.StructField("col6", T.DecimalType(38, 9), False),
        T.StructField("col6_null", T.DecimalType(38, 9), True),
        T.StructField("col6_precision", T.DecimalType(10, 2), True),
        T.StructField("col7", T.BinaryType(), False),
        T.StructField("col7_null", T.BinaryType(), True),
        T.StructField("col9", T.StringType(), False),  # json kept as one column
        T.StructField("col10", T.DateType(), False),
        T.StructField("col10_null", T.DateType(), True),
        # `time` type: Spark has no TimeType → nanos-of-day convention
        T.StructField("col11_nanos", T.LongType(), False),
    ]
)

ROW = (
    989127831,
    None,
    726.23,
    None,
    True,
    None,
    dt.datetime(2021, 1, 9, 3, 55, 18, 651644),
    None,
    "im a deep nested unicode string ✨🦆\nwith newlines\tand tabs",
    None,
    Decimal("2323410.876543219876543210"),  # rounds to scale 9
    None,
    Decimal("87.64"),
    b"binary data \x00\x01\x02",
    None,
    '{"a": [1, 2, 3], "b": {"nested": true}}',
    dt.date(2021, 1, 9),
    None,
    (13 * 3600 + 26 * 60 + 45) * 1_000_000_000 + 176_451_000,
)


def test_all_types_roundtrip_and_merge(spark, tmp_path):
    df = spark.createDataFrame([ROW], SCHEMA)
    sink = ParquetSink(spark, str(tmp_path / "t"))
    sink.replace(df)
    back = sink.read()
    assert back.schema["col6"].dataType == T.DecimalType(38, 9)
    r = back.collect()[0]
    assert r["col1"] == ROW[0] and r["col1_null"] is None
    assert r["col2"] == 726.23
    assert r["col4"] == ROW[6]  # microsecond precision preserved
    assert r["col5"] == ROW[8]  # unicode/newlines/emoji intact
    assert r["col6"] == Decimal("2323410.876543220")  # scale-9 rounding
    assert bytes(r["col7"]) == ROW[13]
    assert r["col9"] == ROW[15]
    assert r["col10"] == ROW[16]
    assert r["col11_nanos"] == ROW[18]

    # merge disposition preserves types: update the row by key
    upd = df.withColumn("col2", F.lit(1000.5))
    sink.merge(upd, keys=["col1"])
    r2 = sink.read().collect()[0]
    assert r2["col2"] == 1000.5 and r2["col6"] == Decimal("2323410.876543220")
    assert sink.read().count() == 1


def test_nullability_conformance(spark, tmp_path):
    """assert_schema_on_data analogue: NOT NULL columns carry no nulls."""
    df = spark.createDataFrame([ROW], SCHEMA)
    for f in SCHEMA.fields:
        if not f.nullable:
            assert df.filter(F.col(f.name).isNull()).count() == 0
