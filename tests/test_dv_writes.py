"""WRITE-side deletion vectors + change data feed (r7): ManifestTable
row-level deletes/merges that mask rows instead of rewriting files, and
their export to a Delta log that external readers (and our own r6 DV
reader) resolve.

Reference analogue: the merge/hard-delete dispositions
(sources/pg_replication/helpers.py:758-773) executed the way modern
lakehouse writers execute them — DV emission, not file rewrites.
"""

from __future__ import annotations

import json
import os

import pytest

from verified_sources_spark.operators.table_format import ManifestTable


@pytest.fixture()
def table(spark, tmp_path):
    t = ManifestTable(spark, str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(i, "even" if i % 2 == 0 else "odd", i * 10) for i in range(8)],
            "id long, par string, val long",
        ).repartition(2)
    )
    return t


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _paths(t, v):
    return {e["path"] for e in t._manifest(v)["files"]}


def test_delete_where_writes_dv_not_files(spark, table):
    t = table
    v1 = t.latest_version()
    v2 = t.delete_where("id IN (1, 3)")
    assert v2 == v1 + 1
    # same data files, no rewrite — only DV descriptors appeared
    assert _paths(t, v2) == _paths(t, v1)
    dvs = [e.get("dv") for e in t._manifest(v2)["files"] if e.get("dv")]
    assert dvs and all(d["storageType"] == "u" for d in dvs)
    assert sum(d["cardinality"] for d in dvs) == 2
    assert {r.id for r in t.read().collect()} == {0, 2, 4, 5, 6, 7}
    # time travel still sees the pre-delete snapshot
    assert {r.id for r in t.read(version=v1).collect()} == set(range(8))
    # file-skipping scan composes with the DV mask
    assert {r.id for r in t.scan([("id", "<=", 3)]).collect()} == {0, 2}
    # second delete on the same file UNIONS into the existing DV
    v3 = t.delete_where("id = 5")
    assert {r.id for r in t.read().collect()} == {0, 2, 4, 6, 7}
    assert _paths(t, v3) == _paths(t, v1)
    # nothing matched → no empty commit
    assert t.delete_where("id = 999") is None


def test_row_level_merge_matches_join_semantics(spark, table):
    from verified_sources_spark.operators.merge import merge_dataframes

    t = table
    v1 = t.latest_version()
    target = t.read(version=v1)
    src = spark.createDataFrame(
        [
            (2, "even", 222, None),
            (2, "even", 223, None),      # same key twice: dedup keeps max val
            (7, "odd", None, "x"),       # hard delete
            (100, "new", 1000, None),    # fresh insert
        ],
        "id long, par string, val long, __del string",
    )
    v2 = t.merge(
        src, ["id"], dedup_sort=["val"], hard_delete_col="__del",
        row_level=True,
    )
    expected = _rows(
        merge_dataframes(
            target, src, ["id"], dedup_sort=["val"], hard_delete_col="__del"
        )
    )
    assert _rows(t.read()) == expected
    # every original file carried over (now possibly DV'd); upserts added
    assert _paths(t, v1) <= _paths(t, v2)
    assert len(_paths(t, v2)) > len(_paths(t, v1))
    dv_total = sum(
        e["dv"]["cardinality"] for e in t._manifest(v2)["files"] if e.get("dv")
    )
    assert dv_total == 2  # keys 2 and 7 masked in place


def test_merge_change_data_feed(spark, table):
    t = table
    src = spark.createDataFrame(
        [(2, "even", 222, None), (7, "odd", None, "x"), (100, "new", 1000, None)],
        "id long, par string, val long, __del string",
    )
    v = t.merge(
        src, ["id"], hard_delete_col="__del", row_level=True, change_data=True,
    )
    ch = t.read_changes(v)
    got = {(r.id, r._change_type) for r in ch.collect()}
    assert got == {
        (2, "update_preimage"), (2, "update_postimage"),
        (7, "delete"),
        (100, "insert"),
    }
    # pre-image carries the OLD value, post-image the new
    vals = {(r._change_type, r.val) for r in ch.collect() if r.id == 2}
    assert vals == {("update_preimage", 20), ("update_postimage", 222)}
    with pytest.raises(FileNotFoundError):
        t.read_changes(1)


def test_delete_where_change_data(spark, table):
    t = table
    v = t.delete_where("id = 4", change_data=True)
    ch = t.read_changes(v)
    assert {(r.id, r._change_type) for r in ch.collect()} == {(4, "delete")}


def test_compact_purges_dvs_without_resurrection(spark, table):
    t = table
    t.delete_where("id IN (0, 2)")
    before = {r.id for r in t.read().collect()}
    v = t.compact(target_file_bytes=1 << 30)
    assert v is not None
    m = t._manifest(v)
    assert not any(e.get("dv") for e in m["files"])  # purged
    assert {r.id for r in t.read().collect()} == before


def test_vacuum_keeps_referenced_dvs_drops_orphans(spark, table):
    t = table
    t.delete_where("id = 1")
    live = {r.id for r in t.read().collect()}
    # vacuum to just the DV'd version: DV file must survive
    t.vacuum(keep_versions=1)
    assert {r.id for r in t.read().collect()} == live
    # purge via compact, vacuum again: the orphaned DV bin goes away
    t.compact(target_file_bytes=1 << 30)
    deleted = t.vacuum(keep_versions=1)
    assert any(p.endswith(".bin") for p in deleted)
    assert {r.id for r in t.read().collect()} == live


def test_no_match_delete_with_change_data_leaves_no_orphan_files(table):
    """delete_where(change_data=True) that matches nothing returns None
    and must NOT have staged _change_data files (they'd be orphans only
    vacuum reclaims) — DVs are computed first, change files only when
    the delete actually commits."""
    t = table
    v0 = t.latest_version()
    assert t.delete_where("id > 1000", change_data=True) is None
    assert t.latest_version() == v0
    cd = os.path.join(t.path, "_change_data")
    assert not os.path.exists(cd) or not os.listdir(cd)
    # and a matching delete still records its change files
    assert t.delete_where("id = 0", change_data=True) is not None
    assert os.listdir(cd)


# ------------------------------------------------------- Delta export


def test_export_dv_table_round_trips_through_delta_reader(spark, table):
    from verified_sources_spark.operators.delta_interop import (
        read_delta_table,
        write_delta_checkpoint,
    )

    t = table
    t.delete_where("id IN (1, 3)")
    out = t.spark  # silence lints
    export = __import__(
        "verified_sources_spark.operators.delta_interop",
        fromlist=["export_manifest_as_delta"],
    ).export_manifest_as_delta
    export(t)
    # protocol upgraded for the DV feature, adds carry descriptors
    log0 = open(os.path.join(t.path, "_delta_log", f"{0:020d}.json")).read()
    actions = [json.loads(ln) for ln in log0.splitlines() if ln.strip()]
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert "deletionVectors" in proto["readerFeatures"]
    assert any(a.get("add", {}).get("deletionVector") for a in actions)
    got = {r.id for r in read_delta_table(spark, t.path).collect()}
    assert got == {r.id for r in t.read().collect()} == {0, 2, 4, 5, 6, 7}

    # widening the DV exports as remove(old DV) + add(new DV)
    t.delete_where("id = 5")
    export(t)
    log1 = open(os.path.join(t.path, "_delta_log", f"{1:020d}.json")).read()
    a1 = [json.loads(ln) for ln in log1.splitlines() if ln.strip()]
    rm = [a["remove"] for a in a1 if "remove" in a]
    ad = [a["add"] for a in a1 if "add" in a]
    assert rm and ad and rm[0]["path"] == ad[0]["path"]
    assert ad[0]["deletionVector"]["cardinality"] > (
        (rm[0].get("deletionVector") or {}).get("cardinality", 0)
    )
    assert {r.id for r in read_delta_table(spark, t.path).collect()} == {
        0, 2, 4, 6, 7,
    }
    # checkpoint carries the widened DVs; reads survive log cleanup
    cp = write_delta_checkpoint(spark, t.path)
    assert cp
    assert {r.id for r in read_delta_table(spark, t.path).collect()} == {
        0, 2, 4, 6, 7,
    }


def test_export_cdf_round_trips_read_delta_changes(spark, tmp_path):
    """A change_data merge exports cdc actions that read_delta_changes
    serves verbatim — the engine-written CDF consumed by the engine's
    own Delta CDF reader, end to end."""
    from verified_sources_spark.operators.delta_interop import (
        export_manifest_as_delta,
        read_delta_changes,
    )

    t = ManifestTable(spark, str(tmp_path / "cdf"))
    t.merge(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        ["id"], row_level=True, change_data=True,
    )
    export_manifest_as_delta(t)
    t.merge(
        spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string"),
        ["id"], row_level=True, change_data=True,
    )
    export_manifest_as_delta(t)

    ch = read_delta_changes(spark, t.path, 0).collect()
    by = lambda v: {(r.id, r.v, r._change_type) for r in ch if r._commit_version == v}
    assert by(0) == {(1, "a", "insert"), (2, "b", "insert")}
    assert by(1) == {
        (2, "b", "update_preimage"), (2, "B", "update_postimage"),
        (3, "c", "insert"),
    }
    # snapshot readers are undisturbed by the cdc actions
    from verified_sources_spark.operators.delta_interop import read_delta_table

    assert {(r.id, r.v) for r in read_delta_table(spark, t.path).collect()} == {
        (1, "a"), (2, "B"), (3, "c"),
    }


def test_export_cdc_commits_declare_the_cdf_feature(spark, tmp_path):
    """A cdc-carrying export must declare changeDataFeed (writerFeatures,
    minWriterVersion 7) and delta.enableChangeDataFeed=true, or external
    CDF readers (delta-spark's CDCReader) refuse the version; the
    property stays on for later cdc-less commits so range reads that
    span both still resolve."""
    from verified_sources_spark.operators.delta_interop import (
        export_manifest_as_delta,
    )

    t = ManifestTable(spark, str(tmp_path / "cdfdecl"))
    t.merge(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        ["id"], row_level=True, change_data=True,
    )
    export_manifest_as_delta(t)

    def acts(v):
        raw = open(os.path.join(t.path, "_delta_log", f"{v:020d}.json")).read()
        return [json.loads(ln) for ln in raw.splitlines() if ln.strip()]

    a0 = acts(0)
    assert any("cdc" in a for a in a0)
    proto = next(a["protocol"] for a in a0 if "protocol" in a)
    assert proto["minWriterVersion"] == 7
    assert "changeDataFeed" in proto["writerFeatures"]
    # changeDataFeed is writer-only: no reader upgrade without DVs
    assert proto["minReaderVersion"] == 1 and "readerFeatures" not in proto
    meta = next(a["metaData"] for a in a0 if "metaData" in a)
    assert meta["configuration"] == {"delta.enableChangeDataFeed": "true"}

    # a later append WITHOUT change_data keeps the property (sticky) and
    # needs no new protocol action (feature already declared)
    t.append(spark.createDataFrame([(9, "z")], "id long, v string"))
    export_manifest_as_delta(t)
    a1 = acts(1)
    assert not any("cdc" in a for a in a1)
    assert not any("protocol" in a for a in a1)
    meta1 = next(a["metaData"] for a in a1 if "metaData" in a)
    assert meta1["configuration"] == {"delta.enableChangeDataFeed": "true"}


# ------------------------------------------------- manifest datasource


def test_manifest_datasource_applies_dvs(spark, table):
    from verified_sources_spark.streaming.datasources import register_all

    register_all(spark)
    t = table
    t.delete_where("id IN (0, 7)")
    got = {
        r.id
        for r in spark.read.format("manifest").option("path", t.path).load().collect()
    }
    assert got == {1, 2, 3, 4, 5, 6}


def test_manifest_stream_refuses_dv_widening(spark, table, tmp_path):
    from verified_sources_spark.streaming.datasources import register_all

    register_all(spark)
    t = table
    first = (
        spark.readStream.format("manifest").option("path", t.path).load()
    )
    ckpt = str(tmp_path / "ck")
    out: list = []
    q = (
        first.writeStream.foreachBatch(
            lambda b, _i: out.extend(r.id for r in b.collect())
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert sorted(out) == list(range(8))
    t.delete_where("id = 0")  # row-level change: not an append
    q2 = (
        first.writeStream.foreachBatch(lambda b, _i: None)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="deletion vectors|StreamingQueryException"):
        q2.awaitTermination(60)
        if q2.exception() is not None:
            raise q2.exception()


def test_partitioned_change_data_refuses_before_writing_dvs(spark, tmp_path):
    """change_data on a partitioned table is unsupported; the refusal
    must fire BEFORE any DV file is materialized (raising after
    _write_dvs would leave orphan DV sidecars only vacuum reclaims)."""
    t = ManifestTable(spark, str(tmp_path / "pt"), partition_by=["par"])
    t.append(
        spark.createDataFrame(
            [(i, "even" if i % 2 == 0 else "odd", i * 10) for i in range(8)],
            "id long, par string, val long",
        )
    )
    v1 = t.latest_version()

    def _dv_files():
        root = os.path.join(str(tmp_path / "pt"), "_deletes")
        if not os.path.isdir(root):
            return []
        return [f for f in os.listdir(root)]

    with pytest.raises(NotImplementedError):
        t.delete_where("id IN (1, 3)", change_data=True)
    assert _dv_files() == []  # no orphan DV from the refused delete
    with pytest.raises(NotImplementedError):
        t.merge(
            spark.createDataFrame([(1, "odd", 99)], "id long, par string, val long"),
            keys=["id"], row_level=True, change_data=True,
        )
    assert _dv_files() == []
    assert t.latest_version() == v1  # nothing committed
    # and without change_data the partitioned row-level delete still works
    v2 = t.delete_where("id IN (1, 3)")
    assert v2 == v1 + 1
    assert {r.id for r in t.read().collect()} == {0, 2, 4, 5, 6, 7}
