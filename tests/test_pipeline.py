"""Pipeline facade: the dlt.pipeline(...).run(...) user surface."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from verified_sources_spark.pipeline import pipeline


def test_run_append_replace_merge(spark, tmp_path):
    p = pipeline(spark, str(tmp_path / "ds"))
    d1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    info = p.run(d1, "items")
    assert (info.rows_loaded, info.disposition) == (2, "append")
    p.run(spark.createDataFrame([(3, "c")], "id long, v string"), "items")
    assert p.read("items").count() == 3

    p.run(spark.createDataFrame([(9, "z")], "id long, v string"), "items",
          write_disposition="replace")
    assert [tuple(r) for r in p.read("items").collect()] == [(9, "z")]

    p.run(spark.createDataFrame([(9, "z2"), (10, "y")], "id long, v string"),
          "items", write_disposition="merge", primary_key="id")
    rows = {r["id"]: r["v"] for r in p.read("items").collect()}
    assert rows == {9: "z2", 10: "y"}

    with pytest.raises(ValueError):
        p.run(d1, "items", write_disposition="merge")  # merge needs primary_key


def test_incremental_state_advances_only_on_success(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b"), (3, 30, "c")], "id long, updated long, v string"
    )
    p = pipeline(spark, str(tmp_path / "ds"))
    info1 = p.run(src, "t", write_disposition="merge", primary_key="id",
                  incremental="updated")
    assert info1.rows_loaded == 3 and info1.cursor_value == 30

    # a NEW pipeline instance over the same dataset resumes the cursor;
    # >= boundary re-reads the boundary row, merge dedups it
    p2 = pipeline(spark, str(tmp_path / "ds"))
    src2 = spark.createDataFrame(
        [(3, 30, "c-seen"), (4, 40, "d")], "id long, updated long, v string"
    )
    info2 = p2.run(src2, "t", write_disposition="merge", primary_key="id",
                   incremental="updated")
    assert info2.rows_loaded == 2 and info2.cursor_value == 40
    rows = {r["id"]: r["v"] for r in p2.read("t").collect()}
    assert rows == {1: "a", 2: "b", 3: "c-seen", 4: "d"}

    # rows below the cursor are filtered at extract
    stale = spark.createDataFrame([(5, 15, "old")], "id long, updated long, v string")
    info3 = p2.run(stale, "t", write_disposition="merge", primary_key="id",
                   incremental="updated")
    assert info3.rows_loaded == 0 and info3.cursor_value is None
    assert p2.state.get("t") == 40  # failed-to-qualify batch didn't move state


def test_manifest_format_pipeline_time_travels(spark, tmp_path):
    p = pipeline(spark, str(tmp_path / "ds"), table_format="manifest")
    p.run(spark.createDataFrame([(1, "a")], "id long, v string"), "t",
          write_disposition="replace")
    p.run(spark.createDataFrame([(1, "a2")], "id long, v string"), "t",
          write_disposition="merge", primary_key="id")
    sink = p.sink("t")
    assert [r["v"] for r in sink.read(version=1).collect()] == ["a"]
    assert [r["v"] for r in p.read("t").collect()] == ["a2"]


def test_run_source_multi_table(spark, tmp_path):
    """dlt.source analogue: one call loads every resource of a source
    (e.g. ga4_metadata_tables' metrics + dimensions dict)."""
    p = pipeline(spark, str(tmp_path / "ds"))
    tables = {
        "metrics": spark.createDataFrame([("activeUsers",)], "api_name string"),
        "dimensions": spark.createDataFrame([("country",), ("city",)], "api_name string"),
    }
    infos = p.run_source(tables, write_disposition="replace")
    assert [(i.table, i.rows_loaded) for i in infos] == [("metrics", 1), ("dimensions", 2)]
    assert p.read("dimensions").count() == 2


def test_append_boundary_reread_deduped_by_row_identity(spark, tmp_path):
    """ADVICE r2: the >= last_value boundary re-read must not duplicate
    rows under APPEND — identical boundary rows are recognized by the
    hashes stored with the cursor; a NEW row at the same cursor value
    still loads."""
    p = pipeline(spark, str(tmp_path / "ds"))
    src = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "b")], "id long, updated long, v string"
    )
    p.run(src, "t", write_disposition="append", incremental="updated")
    assert p.read("t").count() == 2

    # second run re-reads the boundary row (2, 20, "b") byte-identical,
    # plus a genuinely new row at the SAME cursor value, plus a later row
    src2 = spark.createDataFrame(
        [(2, 20, "b"), (9, 20, "tie"), (3, 30, "c")],
        "id long, updated long, v string",
    )
    info = p.run(src2, "t", write_disposition="append", incremental="updated")
    assert info.rows_loaded == 2  # boundary duplicate dropped, tie + new kept
    rows = sorted((r["id"], r["v"]) for r in p.read("t").collect())
    assert rows == [(1, "a"), (2, "b"), (3, "c"), (9, "tie")]

    # third run re-reads BOTH rows now at the old boundary (updated=30's
    # boundary is 30; re-sending everything ≤ cursor loads nothing new)
    info3 = p.run(src2, "t", write_disposition="append", incremental="updated")
    assert info3.rows_loaded == 0
    assert p.read("t").count() == 4
