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


# ------------------------------------------------------------- BSON coercion


class _FakeObjectId:
    """bson.ObjectId stand-in: str() is the 24-char hex form."""

    def __init__(self, raw: bytes):
        self.raw = raw

    def __str__(self):
        return self.raw.hex()


_FakeObjectId.__name__ = "ObjectId"


class _FakeDecimal128:
    def __init__(self, s):
        self.s = s

    def __str__(self):
        return self.s


_FakeDecimal128.__name__ = "Decimal128"


class _FakeRegex:
    def __init__(self, pattern):
        self.pattern = pattern

    def try_compile(self):
        import re

        return re.compile(self.pattern)


_FakeRegex.__name__ = "Regex"


class _FakeTimestamp:
    def __init__(self, dt_):
        self._dt = dt_

    def as_datetime(self):
        return self._dt


_FakeTimestamp.__name__ = "Timestamp"


def test_bson_value_coercions_match_reference_map():
    """ObjectId/Decimal128 → str, Regex → pattern, Timestamp → tz-aware
    datetime, naive datetime → UTC; nested docs and arrays recurse
    (reference sources/mongodb/helpers.py:552-570)."""
    import datetime as dt

    from verified_sources_spark.sources.bson_coerce import convert_bson_value

    oid = _FakeObjectId(bytes(range(12)))
    doc = {
        "_id": oid,
        "amount": _FakeDecimal128("12.50"),
        "pat": _FakeRegex("^a.*b$"),
        "ts": _FakeTimestamp(dt.datetime(2024, 3, 1, 12, 0, 0)),
        "created": dt.datetime(2024, 3, 1, 8, 30),  # naive → UTC
        "tags": [_FakeObjectId(b"\xff" * 12), 7],
        "nested": {"inner": _FakeDecimal128("0.1")},
        "plain": "keep",
        "n": 3,
    }
    out = convert_bson_value(doc)
    assert out["_id"] == "000102030405060708090a0b"
    assert out["amount"] == "12.50"
    assert out["pat"] == "^a.*b$"
    assert out["ts"] == dt.datetime(2024, 3, 1, 12, 0, 0, tzinfo=dt.timezone.utc)
    assert out["created"] == dt.datetime(2024, 3, 1, 8, 30, tzinfo=dt.timezone.utc)
    assert out["tags"] == ["ff" * 12, 7]
    assert out["nested"] == {"inner": "0.1"}
    assert out["plain"] == "keep" and out["n"] == 3


def test_bson_arrow_column_coercions(spark):
    """Arrow path: fixed_size_binary[12] → hex string (str(ObjectId)
    parity), decimal128 → string, other fixed binary → plain binary,
    naive timestamp → UTC; coerced table lands in Spark with the right
    schema (reference sources/mongodb/helpers.py:572-618)."""
    import datetime as dt
    import decimal

    import pyarrow as pa

    from verified_sources_spark.sources.arrow_ingest import arrow_table_to_df
    from verified_sources_spark.sources.bson_coerce import convert_arrow_bson_columns

    table = pa.table(
        {
            "_id": pa.array([bytes(range(12)), None, b"\xab" * 12],
                            type=pa.binary(12)),
            "amount": pa.array(
                [decimal.Decimal("12.50"), None, decimal.Decimal("0.10")],
                type=pa.decimal128(10, 2),
            ),
            "blob": pa.array([b"12345", None, b"67890"], type=pa.binary(5)),
            "ts": pa.array(
                [dt.datetime(2024, 3, 1, 12, 0), None, dt.datetime(2024, 3, 2)],
                type=pa.timestamp("us"),
            ),
            "n": pa.array([1, 2, 3], type=pa.int64()),
        }
    )
    out = convert_arrow_bson_columns(table)
    assert out.schema.field("_id").type == pa.string()
    assert out.column("_id").to_pylist() == [
        "000102030405060708090a0b", None, "ab" * 12,
    ]
    assert out.schema.field("amount").type == pa.string()
    assert out.column("amount").to_pylist() == ["12.50", None, "0.10"]
    assert out.schema.field("blob").type == pa.binary()
    assert out.schema.field("ts").type == pa.timestamp("us", tz="UTC")
    assert out.schema.field("n").type == pa.int64()

    df = arrow_table_to_df(spark, out)
    kinds = dict(df.dtypes)
    assert kinds["_id"] == "string"
    assert kinds["amount"] == "string"
    assert kinds["blob"] == "binary"
    assert kinds["ts"] == "timestamp"
    row = df.orderBy("n").first()
    assert row["_id"] == "000102030405060708090a0b"


def test_bson_timestamp_name_collision_with_pandas():
    """pandas.Timestamp shares bson.Timestamp's type NAME but not its
    API; the name-based dispatch must fall through to the datetime branch
    instead of calling .as_datetime()."""
    import datetime as dt

    import pandas as pd

    from verified_sources_spark.sources.bson_coerce import convert_bson_value

    out = convert_bson_value(pd.Timestamp("2024-03-01 12:00:00"))
    assert out.tzinfo == dt.timezone.utc
    assert out.year == 2024 and out.hour == 12
    aware = convert_bson_value(pd.Timestamp("2024-03-01 12:00:00+02:00"))
    assert aware.hour == 10 and aware.tzinfo == dt.timezone.utc
