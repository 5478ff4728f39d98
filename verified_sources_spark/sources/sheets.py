"""Spreadsheet-style untyped grid → typed DataFrame.

Models google_sheets's value processing (reference:
sources/google_sheets/__init__.py:126-141,
helpers/data_processing.py:129-349): header detection with ``col_N``
autonaming, duplicate-header disambiguation, empty-row dropping, and
per-column typing sampled from the first data row — including Lotus
serial-number date/timestamp coercion driven by cell-format metadata.

The grid (a list of rows of heterogeneous scalars) is small by nature
(API-fetched); typing decisions happen on the driver, then the typed rows
become a distributed DataFrame immediately."""

from __future__ import annotations

import datetime as dt
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from verified_sources_spark.functions import LOTUS_EPOCH_OFFSET, snake_case


def detect_headers(first_row: list[Any]) -> list[str]:
    """Header names from the first row: strings are snake_cased; blanks or
    non-strings get positional ``col_N`` names; duplicates get suffixes."""
    names: list[str] = []
    seen: dict[str, int] = {}
    for i, cell in enumerate(first_row, start=1):
        name = snake_case(cell) if isinstance(cell, str) and cell.strip() else f"col_{i}"
        if name in seen:
            seen[name] += 1
            name = f"{name}_{seen[name]}"
        else:
            seen[name] = 1
        names.append(name)
    return names


def _serial_to_datetime(v: float) -> dt.datetime:
    secs = round((float(v) - LOTUS_EPOCH_OFFSET) * 86400.0)
    return dt.datetime(1970, 1, 1) + dt.timedelta(seconds=secs)


def coerce_cell(v: Any, is_datelike: bool) -> Any:
    if v is None or (isinstance(v, str) and not v.strip()):
        return None
    if is_datelike and isinstance(v, (int, float)):
        d = _serial_to_datetime(v)
        return d
    return v


def grid_to_dataframe(
    spark: SparkSession,
    grid: list[list[Any]],
    date_columns: set[int] | None = None,
    has_header: bool = True,
) -> DataFrame:
    """Typed DataFrame from a raw value grid.

    ``date_columns``: 0-based indexes whose number cells are Lotus serials
    (in the reference this comes from the cell-format metadata of the
    first data row).  Fully empty rows are dropped (reference
    data_processing.py:282-287)."""
    if not grid:
        raise ValueError("empty grid")
    if has_header:
        headers, data = detect_headers(grid[0]), grid[1:]
    else:
        headers, data = [f"col_{i+1}" for i in range(len(grid[0]))], grid
    date_columns = date_columns or set()
    rows = []
    for raw in data:
        if all(c is None or (isinstance(c, str) and not c.strip()) for c in raw):
            continue  # skip empty rows
        padded = list(raw) + [None] * (len(headers) - len(raw))
        rows.append(tuple(coerce_cell(c, i in date_columns) for i, c in enumerate(padded)))
    return spark.createDataFrame(rows, schema=", ".join(f"`{h}` string" for h in headers)) if not rows else (
        spark.createDataFrame(rows, schema=headers)
    )


def spreadsheet_info(
    spark, sheets: list[dict]
):
    """The reference's ``spreadsheet_info`` metadata catalog table
    (sources/google_sheets/__init__.py:143-152): one row per loaded
    range with its title, A1 range, and grid dimensions — loaded
    replace-mode alongside the data tables."""
    rows = [
        {
            "title": s["title"],
            "range": s.get("range", ""),
            "n_rows": len(s.get("grid", [])),
            "n_cols": max((len(r) for r in s.get("grid", [])), default=0),
            "headers": detect_headers(s["grid"][0]) if s.get("grid") else [],
        }
        for s in sheets
    ]
    return spark.createDataFrame(
        rows, "title string, range string, n_rows int, n_cols int, headers array<string>"
    )
