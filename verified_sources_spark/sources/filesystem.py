"""Filesystem source: parquet/csv/jsonl with schema control and
new-file incremental listing (the reference's core `filesystem` source,
stubbed in-repo but consumed via dlt core; reference
sources/filesystem/__init__.py:1).

Spark-first: ``spark.read`` handles globs, partition discovery, schema
inference/merging and parallel splits natively; the only custom piece is
the *incremental file cursor* — load only files newer than the stored
high-watermark mtime (dlt's ``FileItem`` incremental equivalent)."""

from __future__ import annotations

import glob as _glob
import os

from pyspark.sql import DataFrame, SparkSession

from verified_sources_spark.operators.incremental import CursorStore

_READERS = {"parquet", "json", "csv", "text"}


def read_files(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: str | None = None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    fmt = "json" if fmt == "jsonl" else fmt
    if fmt not in _READERS:
        raise ValueError(f"unsupported format: {fmt}")
    r = spark.read.format(fmt)
    if schema:
        r = r.schema(schema)
    elif fmt == "csv":
        r = r.option("header", "true").option("inferSchema", "true")
    for k, v in (options or {}).items():
        r = r.option(k, v)
    return r.load(path)


def list_new_files(glob_pattern: str, store: CursorStore, resource: str) -> list[str]:
    """Files with mtime strictly greater than the stored watermark.
    ``>=`` boundary files re-list (same as cursor re-reads) — dedup is the
    keyed merge's job downstream; here mtimes are compared with > against
    the *previous* run's max, recorded per run."""
    last = store.get(resource, 0.0) or 0.0
    out = []
    newest = last
    for f in sorted(_glob.glob(glob_pattern)):
        m = os.path.getmtime(f)
        if m > float(last):
            out.append(f)
        newest = max(newest, m)
    if out:
        store.set(resource, newest)
    return out


def read_new_files(
    spark: SparkSession,
    glob_pattern: str,
    store: CursorStore,
    resource: str,
    fmt: str = "parquet",
    schema: str | None = None,
) -> DataFrame | None:
    """Incremental load: DataFrame over only the new files (None if none).
    At scale this is the same pattern as Auto-Loader/file-notification
    sources: the listing is metadata-only; the read stays distributed."""
    files = list_new_files(glob_pattern, store, resource)
    if not files:
        return None
    r = spark.read.format("json" if fmt == "jsonl" else fmt)
    if schema:
        r = r.schema(schema)
    return r.load(files)
