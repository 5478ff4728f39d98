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


def _col_letters(index: int) -> str:
    """0-based column index → A1 letters (0→A, 25→Z, 26→AA)."""
    out = ""
    i = index + 1
    while i > 0:
        i, rem = divmod(i - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def grid_range_to_a1(sheet_title: str, gr: dict) -> str:
    """Sheets API gridRange (0-based, end-exclusive) → A1 notation.
    Unbounded edges (missing keys) yield open-ended A1 (whole rows or
    columns), like the API's own rendering."""
    start_col = gr.get("startColumnIndex")
    end_col = gr.get("endColumnIndex")
    start_row = gr.get("startRowIndex")
    end_row = gr.get("endRowIndex")
    left = (
        ("" if start_col is None else _col_letters(start_col))
        + ("" if start_row is None else str(start_row + 1))
    )
    right = (
        ("" if end_col is None else _col_letters(end_col - 1))
        + ("" if end_row is None else str(end_row))
    )
    quoted = f"'{sheet_title}'" if any(c in sheet_title for c in " !:'") else sheet_title
    return f"{quoted}!{left}:{right}" if left or right else quoted


def spreadsheet_metadata(metadata: dict) -> dict:
    """Discovery from one ``spreadsheets.get`` response: sheet names AND
    named ranges, each resolved to a loadable A1 range (reference
    sources/google_sheets/helpers/api_calls.py:90-103
    ``get_known_range_names`` — the reference returns just the names;
    here the named range's gridRange is also rendered to A1 so it loads
    as its own table without a second metadata call).

    Returns ``{"title", "sheet_names", "named_ranges": [{name, a1}]}``.
    """
    sheets = metadata.get("sheets") or []
    titles_by_id = {
        s["properties"].get("sheetId"): s["properties"]["title"] for s in sheets
    }
    named = []
    for nr in metadata.get("namedRanges") or []:
        gr = nr.get("range") or {}
        sheet_title = titles_by_id.get(gr.get("sheetId"))
        if sheet_title is None:
            continue  # dangling named range (its sheet was deleted)
        named.append({"name": nr["name"], "a1": grid_range_to_a1(sheet_title, gr)})
    return {
        "title": (metadata.get("properties") or {}).get("title", ""),
        "sheet_names": [s["properties"]["title"] for s in sheets],
        "named_ranges": named,
    }


def ranges_to_load(metadata: dict, include_named_ranges: bool = True) -> list[tuple[str, str]]:
    """(table_name, A1 range) pairs the connector should fetch: one per
    sheet, plus one per named range when enabled — named ranges load as
    their own tables under their own (snake_cased) names, the
    reference's contract."""
    info = spreadsheet_metadata(metadata)
    out = [(snake_case(name), name) for name in info["sheet_names"]]
    if include_named_ranges:
        out.extend((snake_case(nr["name"]), nr["a1"]) for nr in info["named_ranges"])
    return out
