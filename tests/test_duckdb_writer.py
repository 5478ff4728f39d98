"""DuckDB write-back sink (sources/duckdb_writer.py): the disposition
matrix of test_pg_writer.py against the reference's DEFAULT destination
(reference sources/mongodb_pipeline.py:22-35), observed through plain
duckdb queries — the ``pipeline.sql_client()`` view of the world
(reference tests/utils.py:209-227)."""

from __future__ import annotations

import datetime
import decimal

import duckdb
import pytest

from verified_sources_spark.sources.duckdb_writer import (
    duckdb_batch_sink,
    write_duckdb,
)


@pytest.fixture()
def db(tmp_path):
    return str(tmp_path / "sink.duckdb")


def _rows(db, sql):
    con = duckdb.connect(db, read_only=True)
    try:
        return set(tuple(r) for r in con.execute(sql).fetchall())
    finally:
        con.close()


def test_append_types_roundtrip(spark, db):
    df = spark.createDataFrame(
        [
            (1, "plain", 1.5, True, datetime.date(2024, 6, 1),
             datetime.datetime(2024, 6, 1, 12, 30, 0, 123456),
             decimal.Decimal("12345.67"), bytearray(b"\x00\xffbin"),
             ["a", "b"]),
            (2, "tab\there\nand newline \\ backslash", None, None, None,
             None, None, None, None),
        ],
        "k long, s string, d double, b boolean, dt date, ts timestamp, "
        "dec decimal(10,2), bin binary, arr array<string>",
    )
    out = write_duckdb(df, db, "t_append", disposition="append")
    assert out == {"staged": 2, "applied": True}
    write_duckdb(df, db, "t_append", disposition="append")
    got = _rows(
        db,
        "SELECT k, s, d, b, dt::text, "
        "strftime(ts AT TIME ZONE 'UTC', '%Y-%m-%d %H:%M:%S.%f'), "
        "dec::text, hex(bin), arr::text FROM t_append",
    )
    assert len(got) == 2 and sum(
        1 for _ in duckdb.connect(db, read_only=True).execute(
            "SELECT 1 FROM t_append"
        ).fetchall()
    ) == 4
    assert (
        1, "plain", 1.5, True, "2024-06-01", "2024-06-01 12:30:00.123456",
        "12345.67", "00FF62696E", "[a, b]",
    ) in got
    assert (
        2, "tab\there\nand newline \\ backslash",
        None, None, None, None, None, None, None,
    ) in got


def test_replace(spark, db):
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    df2 = spark.createDataFrame([(9, "z")], "k long, v string")
    write_duckdb(df1, db, "t_replace", disposition="replace")
    write_duckdb(df2, db, "t_replace", disposition="replace")
    assert _rows(db, "SELECT k, v FROM t_replace") == {(9, "z")}


def test_merge_delete_insert_matches_engine_semantics(spark, db):
    """The DuckDB merge must be value-identical to the engine's
    merge_dataframes on the same inputs: composite keys, dedup_sort
    keep-latest, hard deletes."""
    from verified_sources_spark.operators.merge import merge_dataframes

    target = spark.createDataFrame(
        [(1, "x", "old1", 0), (2, "x", "old2", 0), (3, "y", "old3", 0)],
        "id long, grp string, val string, seq long",
    )
    src = spark.createDataFrame(
        [
            (2, "x", "new2-early", 1, None),
            (2, "x", "new2-late", 5, None),
            (3, "y", None, 9, "gone"),
            (4, "z", "new4", 2, None),
        ],
        "id long, grp string, val string, seq long, __deleted string",
    )
    write_duckdb(target, db, "t_merge", disposition="replace")
    write_duckdb(
        src, db, "t_merge", disposition="merge",
        merge_keys=["id", "grp"], dedup_sort=["seq"],
        hard_delete_col="__deleted",
    )
    got = _rows(db, "SELECT id, grp, val, seq FROM t_merge")
    expected = {
        tuple(r)
        for r in merge_dataframes(
            target, src, ["id", "grp"], dedup_sort=["seq"],
            hard_delete_col="__deleted",
        ).collect()
    }
    assert got == expected
    assert got == {
        (1, "x", "old1", 0),
        (2, "x", "new2-late", 5),
        (4, "z", "new4", 2),
    }


def test_merge_upsert_strategy(spark, db):
    """strategy='upsert': update-in-place with hard-delete matched rows
    deleted and null-safe key matching (the PG15 MERGE semantics,
    emulated on DuckDB 1.0)."""
    t = spark.createDataFrame(
        [(1, "a", "keep"), (2, "b", "upd"), (None, "n", "nullkey"), (3, "c", "del")],
        "id long, v string, note string",
    )
    write_duckdb(t, db, "t_upsert", disposition="replace")
    src = spark.createDataFrame(
        [(2, "B2", "upd2", None), (None, "N2", "nullkey2", None),
         (3, None, None, "x"), (5, "e", "new", None)],
        "id long, v string, note string, __del string",
    )
    write_duckdb(
        src, db, "t_upsert", disposition="merge",
        merge_keys=["id"], hard_delete_col="__del", strategy="upsert",
    )
    got = _rows(db, "SELECT id, v, note FROM t_upsert")
    assert got == {
        (1, "a", "keep"),
        (2, "B2", "upd2"),
        (None, "N2", "nullkey2"),
        (5, "e", "new"),
    }


def test_upsert_nulls_target_columns_absent_from_source(spark, db):
    """Replace-the-row: an upsert whose source lacks a target column
    resets that column to NULL on updated rows (pg_writer MERGE parity)."""
    t = spark.createDataFrame([(1, "v1", "extra1")], "id long, v string, extra string")
    write_duckdb(t, db, "t_null", disposition="replace")
    src = spark.createDataFrame([(1, "v2")], "id long, v string")
    write_duckdb(
        src, db, "t_null", disposition="merge", merge_keys=["id"],
        strategy="upsert",
    )
    assert _rows(db, "SELECT id, v, extra FROM t_null") == {(1, "v2", None)}


def test_merge_without_dedup_keeps_all_source_rows(spark, db):
    t = spark.createDataFrame([(1, "old")], "k long, v string")
    src = spark.createDataFrame([(1, "n1"), (1, "n2")], "k long, v string")
    write_duckdb(t, db, "t_multi", disposition="replace")
    write_duckdb(src, db, "t_multi", disposition="merge", merge_keys=["k"])
    assert _rows(db, "SELECT k, v FROM t_multi") == {(1, "n1"), (1, "n2")}


def test_schema_evolution_adds_columns(spark, db):
    df1 = spark.createDataFrame([(1, "a")], "k long, v string")
    df2 = spark.createDataFrame(
        [(2, "b", 3.5)], "k long, v string, extra double"
    )
    write_duckdb(df1, db, "t_evo", disposition="append")
    write_duckdb(df2, db, "t_evo", disposition="append")
    assert _rows(db, "SELECT k, v, extra FROM t_evo") == {
        (1, "a", None), (2, "b", 3.5),
    }
    # target column missing from a later source stays NULL on its rows
    write_duckdb(df1, db, "t_evo", disposition="append")
    assert (1, "a", None) in _rows(db, "SELECT k, v, extra FROM t_evo")


def test_empty_batch_creates_table_and_applies_cleanly(spark, db):
    df = spark.createDataFrame([], "k long, v string")
    out = write_duckdb(df, db, "t_empty", disposition="merge", merge_keys=["k"])
    assert out["staged"] == 0 and out["applied"]
    assert _rows(db, "SELECT * FROM t_empty") == set()


def test_parallel_staged_partitions(spark, db):
    """Many Spark partitions stage parquet concurrently; one finalize."""
    df = spark.range(0, 5000).withColumnRenamed("id", "k").repartition(8)
    out = write_duckdb(df, db, "t_par", disposition="append")
    assert out["staged"] == 5000
    assert _rows(db, "SELECT count(*), sum(k) FROM t_par") == {
        (5000, sum(range(5000))),
    }


def test_foreach_batch_ledger_idempotence(spark, db, tmp_path):
    """A replayed ledger'd batch is skipped, and a real availableNow
    stream lands each file's rows exactly once across restarts."""
    df = spark.createDataFrame([(1, "a")], "k long, v string")
    r1 = write_duckdb(
        df, db, "t_led", disposition="merge", merge_keys=["k"],
        ledger=("_vss_sink_batches", "t_led", 7),
    )
    r2 = write_duckdb(
        df, db, "t_led", disposition="merge", merge_keys=["k"],
        ledger=("_vss_sink_batches", "t_led", 7),
    )
    assert r1["applied"] and not r2["applied"]
    assert _rows(db, "SELECT k, v FROM t_led") == {(1, "a")}

    src_dir = str(tmp_path / "src")
    spark.createDataFrame([(1, "s1")], "k long, v string").write.parquet(
        src_dir + "/f1"
    )
    stream = (
        spark.readStream.schema("k long, v string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir + "/*")
    )
    sink = duckdb_batch_sink(
        db, "t_stream", disposition="merge", merge_keys=["k"],
        dedup_sort=["k"],
    )
    ckpt = str(tmp_path / "ckpt")

    def run():
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    assert _rows(db, "SELECT k, v FROM t_stream") == {(1, "s1")}
    spark.createDataFrame([(2, "s2")], "k long, v string").write.parquet(
        src_dir + "/f2"
    )
    run()
    assert _rows(db, "SELECT k, v FROM t_stream") == {(1, "s1"), (2, "s2")}


def test_empty_first_batch_preserves_real_types(spark, db):
    """An empty micro-batch 0 must create the target with the
    DataFrame's REAL types, not null-inferred INTEGER — the next
    non-empty batch's strings would otherwise fail to convert."""
    empty = spark.createDataFrame([], "k long, v string, ts timestamp")
    write_duckdb(empty, db, "t_types", disposition="merge", merge_keys=["k"])
    types = dict(
        duckdb.connect(db, read_only=True)
        .execute("SELECT column_name, data_type FROM information_schema.columns "
                 "WHERE table_name='t_types'")
        .fetchall()
    )
    assert types["v"] == "VARCHAR" and types["k"] == "BIGINT"
    assert types["ts"].startswith("TIMESTAMP")
    # and the follow-up batch with actual strings applies cleanly
    df = spark.createDataFrame(
        [(1, "hello", datetime.datetime(2024, 6, 1, 12, 0, 0))],
        "k long, v string, ts timestamp",
    )
    write_duckdb(df, db, "t_types", disposition="merge", merge_keys=["k"])
    assert _rows(db, "SELECT k, v FROM t_types") == {(1, "hello")}


def test_stage_invisible_from_driver_is_refused_not_silently_empty(
    spark, db, tmp_path, monkeypatch
):
    """If the staged parquet never lands on the driver's filesystem
    (multi-node cluster, non-shared staging_dir), the sink must refuse —
    silently applying an empty batch while the ledger commits would
    permanently suppress the replay (data loss)."""
    import verified_sources_spark.sources.duckdb_writer as w

    df = spark.createDataFrame([(1, "a")], "k long, v string")
    real_listdir = w.os.listdir
    stage = str(tmp_path / "stg")

    def fake_listdir(path):
        if path == stage:
            return ["_SUCCESS"]  # what the driver sees with local executor disks
        return real_listdir(path)

    monkeypatch.setattr(w.os, "listdir", fake_listdir)
    with pytest.raises(RuntimeError, match="shared"):
        write_duckdb(df, db, "t_vis", disposition="append", staging_dir=stage)
    # no ledger row was committed either — the batch remains replayable
    con = duckdb.connect(db, read_only=True)
    tables = {r[0] for r in con.execute("SHOW TABLES").fetchall()}
    con.close()
    assert "t_vis" not in tables
