"""Scalar function library (SURVEY.md §2.10).

All functions return Column expressions built from pyspark.sql.functions —
JVM-side, whole-stage-codegen friendly; no Python row UDFs in any hot path.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column


# ---------------------------------------------------------------- identifiers
_SNAKE_1 = re.compile(r"[^0-9a-zA-Z_]+")
_SNAKE_2 = re.compile(r"([a-z0-9])([A-Z])")


def snake_case(name: str) -> str:
    """Identifier normalization, per the reference's column-name munging
    (reference: sources/pipedrive/helpers/custom_fields_munger.py:78-81,
    sources/personio/__init__.py:60-62): camelCase → snake_case, spaces and
    punctuation → underscore, lowercased, deduped underscores."""
    s = _SNAKE_2.sub(r"\1_\2", _SNAKE_1.sub("_", name.strip()))
    s = re.sub(r"_+", "_", s).strip("_").lower()
    return s or "col"


def snake_case_columns(df):
    """Rename every column of *df* to snake_case."""
    return df.toDF(*[snake_case(c) for c in df.columns])


# ------------------------------------------------------------------- hashing
def row_digest(*cols: str | Column) -> Column:
    """Deterministic 128-bit row id — the engine's analogue of the
    reference's ``digest128`` message ids (sources/kafka/helpers.py:50,
    sources/kinesis/__init__.py:100).  md5 over a '|'-joined rendering."""
    rendered = [F.coalesce(F.col(c).cast("string") if isinstance(c, str) else c.cast("string"), F.lit("\x00")) for c in cols]
    return F.md5(F.concat_ws("|", *rendered))


def content_hash(col: str | Column) -> Column:
    """Content-hash merge key (reference:
    sources/unstructured_data/__init__.py:53 ``metadata__data_hash``)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(c.cast("string"))


# ---------------------------------------------------------------- date/time
LOTUS_EPOCH_OFFSET = 25569  # days between 1899-12-30 (Lotus day 0) and 1970-01-01


def lotus_serial_to_timestamp(col: str | Column) -> Column:
    """Google-Sheets/Excel serial number → timestamp (reference:
    sources/google_sheets/helpers/data_processing.py:208-231).  Serial is
    days since 1899-12-30, fractional part is time-of-day."""
    c = F.col(col) if isinstance(col, str) else col
    secs = (c.cast("double") - F.lit(LOTUS_EPOCH_OFFSET)) * 86400.0
    return F.timestamp_seconds(F.round(secs).cast("long"))


def lotus_serial_to_date(col: str | Column) -> Column:
    return lotus_serial_to_timestamp(col).cast("date")


def epoch_millis_to_timestamp(col: str | Column) -> Column:
    """Salesforce bulk-API epoch millis → timestamp (reference:
    sources/salesforce/helpers/records.py:35-38)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.timestamp_millis(c.cast("long"))


def pg_micros_to_timestamp(col: str | Column) -> Column:
    """Postgres epoch: microseconds since 2000-01-01 (reference:
    sources/pg_replication/decoders.py:18-21)."""
    c = F.col(col) if isinstance(col, str) else col
    pg_epoch_us = 946684800 * 1_000_000
    return F.timestamp_micros(c.cast("long") + F.lit(pg_epoch_us))


# ------------------------------------------------------------------- cursors
def coalesce_cursor(*paths: str) -> Column:
    """Alternate cursor paths 'a|b' — first existing field wins
    (reference: sources/pipedrive/helpers/pages.py:44-46)."""
    return F.coalesce(*[F.col(p) for p in paths])


# ---------------------------------------------------------------------- misc
def hex_decode(col: str | Column) -> Column:
    """``\\x``-prefixed hex text → binary (reference:
    sources/pg_replication/schema_types.py:131-133)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unhex(F.regexp_replace(c, r"^\\x", ""))


def url_quote(col: str | Column) -> Column:
    """Percent-encode matching ``urllib.parse.quote`` with its default
    ``safe='/'`` (reference: sources/hubspot/__init__.py:524-525).

    Spark's ``url_encode`` is java.net.URLEncoder — form encoding, which
    differs from ``quote()`` on exactly four characters; each is remapped:
    space ('+' → %20), '*' (literal → %2A), '~' (%7E → literal), and '/'
    (%2F → literal, quote's default safe set)."""
    c = F.col(col) if isinstance(col, str) else col
    out = F.url_encode(c)
    for old, new in (("+", "%20"), ("*", "%2A"), ("%7E", "~"), ("%2F", "/")):
        out = F.replace(out, F.lit(old), F.lit(new))
    return out


def url_unquote(col: str | Column) -> Column:
    """Inverse of ``url_quote`` (percent-decoding; literal '+' survives)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.url_decode(F.replace(c, F.lit("+"), F.lit("%2B")))


# ------------------------------------------------------------ type mapping
# Canonical engine types for the reference's column-type vocabulary
# (reference sources/pg_replication/schema_types.py:15-27 dummy-value map;
# SURVEY.md §1.2).  `time` has no Spark type → nanos-of-day long;
# `json` stays a string column (parse on demand with from_json);
# `wei` (256-bit-ish integer) → Decimal(38,0), the widest exact integer.
DLT_TYPE_TO_SPARK: dict[str, str] = {
    "bigint": "long",
    "double": "double",
    "bool": "boolean",
    "timestamp": "timestamp",
    "text": "string",
    "decimal": "decimal(38,9)",
    "binary": "binary",
    "json": "string",
    "date": "date",
    "time": "long",  # nanos-of-day convention
    "wei": "decimal(38,0)",
}


def spark_type_for(dlt_type: str) -> str:
    try:
        return DLT_TYPE_TO_SPARK[dlt_type]
    except KeyError:
        raise ValueError(f"unknown dlt column type: {dlt_type!r}") from None
