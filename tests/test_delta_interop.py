"""Delta log interop (operators/delta_interop.py): reading external
Delta tables and exporting ManifestTable snapshots as Delta logs."""

from __future__ import annotations

import json
import os
import time

import pytest

from verified_sources_spark.operators.delta_interop import (
    DeltaProtocolError,
    export_manifest_as_delta,
    read_delta_log,
    read_delta_table,
)
from verified_sources_spark.operators.table_format import ManifestTable


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _write_commit(table_dir, version, actions):
    log = os.path.join(table_dir, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{version:020d}.json"), "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions))


def _mk_external_delta(spark, tmp_path):
    """Hand-craft a two-commit partitioned Delta table: commit 0 adds two
    files, commit 1 removes one and adds another — replay must apply the
    tombstone."""
    root = str(tmp_path / "ext")
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
            {"name": "day", "type": "date", "nullable": True, "metadata": {}},
        ],
    }

    def data_file(name, rows):
        df = spark.createDataFrame(rows, "k long, v string")
        tmp = str(tmp_path / ("stage_" + name))
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        os.makedirs(os.path.join(root, "d"), exist_ok=True)
        os.replace(os.path.join(tmp, part), os.path.join(root, "d", name))
        return f"d/{name}"

    p1 = data_file("f1.parquet", [(1, "a")])
    p2 = data_file("f2.parquet", [(2, "b")])
    p3 = data_file("f3.parquet", [(3, "c")])
    meta = {
        "metaData": {
            "id": "0000",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": ["day"],
            "configuration": {},
        }
    }
    add = lambda p, day: {
        "add": {
            "path": p,
            "partitionValues": {"day": day},
            "size": 1,
            "modificationTime": 0,
            "dataChange": True,
        }
    }
    _write_commit(root, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        meta, add(p1, "2024-01-01"), add(p2, "2024-01-02"),
    ])
    _write_commit(root, 1, [
        {"remove": {"path": p1, "deletionTimestamp": 0, "dataChange": True}},
        add(p3, "2024-01-01"),
    ])
    return root


def test_read_external_delta_with_removes_and_partitions(spark, tmp_path):
    import datetime as dt

    root = _mk_external_delta(spark, tmp_path)
    df = read_delta_table(spark, root)
    assert set(df.columns) == {"k", "v", "day"}
    assert _rows(df.select("k", "v", "day")) == {
        (2, "b", dt.date(2024, 1, 2)),
        (3, "c", dt.date(2024, 1, 1)),
    }
    # time travel: version 0 still sees f1+f2
    v0 = read_delta_table(spark, root, version=0)
    assert _rows(v0.select("k", "v")) == {(1, "a"), (2, "b")}


def test_reader_refuses_advanced_reader_features(spark, tmp_path):
    meta = {"metaData": {"id": "x", "format": {"provider": "parquet", "options": {}},
                         "schemaString": json.dumps({"type": "struct", "fields": []}),
                         "partitionColumns": [], "configuration": {}}}
    # v3 without readerFeatures is spec-malformed: refuse, don't guess
    root = str(tmp_path / "adv")
    _write_commit(root, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7}}, meta,
    ])
    with pytest.raises(DeltaProtocolError, match="minReaderVersion"):
        read_delta_log(spark, root)
    # v3 with a feature this reader does not implement
    root2 = str(tmp_path / "adv2")
    _write_commit(root2, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["typeWidening"]}}, meta,
    ])
    with pytest.raises(DeltaProtocolError, match="typeWidening"):
        read_delta_log(spark, root2)


def _cm_schema():
    """Column-mapping 'name'-mode schema: logical names k/v/tags/day map
    to uuid-ish physical names, incl. a NESTED struct field."""
    phys = lambda p, i: {"delta.columnMapping.physicalName": p,
                         "delta.columnMapping.id": i}
    return {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": phys("col-aaa", 1)},
            {"name": "v", "type": "string", "nullable": True, "metadata": phys("col-bbb", 2)},
            {"name": "tags", "nullable": True, "metadata": phys("col-ccc", 3),
             "type": {"type": "struct", "fields": [
                 {"name": "lang", "type": "string", "nullable": True,
                  "metadata": phys("col-ddd", 4)}]}},
            {"name": "day", "type": "string", "nullable": True, "metadata": phys("col-eee", 5)},
        ],
    }


def test_read_column_mapping_name_mode(spark, tmp_path):
    """minReaderVersion-2 table in column-mapping 'name' mode: data files
    carry PHYSICAL column names (top-level and nested) and partitionValues
    keys are physical too — the read must surface logical names/values."""
    root = str(tmp_path / "cm")
    os.makedirs(os.path.join(root, "d"))
    stage = str(tmp_path / "cm_stage")
    spark.createDataFrame(
        [(1, "a", ("en",)), (2, "b", ("fr",))],
        "`col-aaa` long, `col-bbb` string, `col-ccc` struct<`col-ddd`: string>",
    ).coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
    os.replace(os.path.join(stage, part), os.path.join(root, "d", "f1.parquet"))

    _write_commit(root, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {"id": "cm", "format": {"provider": "parquet", "options": {}},
                      "schemaString": json.dumps(_cm_schema()),
                      "partitionColumns": ["day"],
                      "configuration": {"delta.columnMapping.mode": "name"}}},
        {"add": {"path": "d/f1.parquet",
                 "partitionValues": {"col-eee": "2024-06-01"},  # physical key
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ])
    df = read_delta_table(spark, root)
    assert df.columns == ["k", "v", "tags", "day"]
    assert df.schema["tags"].dataType.fieldNames() == ["lang"]
    got = {(r.k, r.v, r.tags.lang, r.day) for r in df.collect()}
    assert got == {(1, "a", "en", "2024-06-01"), (2, "b", "fr", "2024-06-01")}


def test_leftover_mapping_metadata_ignored_when_mode_none(spark, tmp_path):
    """physicalName metadata is honored ONLY when columnMapping mode is
    'name' — a mode-'none' table with leftover metadata (cloned schema)
    must read the LOGICAL names actually present in the files."""
    root = str(tmp_path / "cmnone")
    os.makedirs(os.path.join(root, "d"))
    stage = str(tmp_path / "cmnone_stage")
    spark.createDataFrame(
        [(1, "a", ("en",))],
        "k long, v string, tags struct<lang: string>",  # LOGICAL names
    ).coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
    os.replace(os.path.join(stage, part), os.path.join(root, "d", "f1.parquet"))
    _write_commit(root, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "cn", "format": {"provider": "parquet", "options": {}},
                      "schemaString": json.dumps(_cm_schema()),
                      "partitionColumns": ["day"],
                      "configuration": {}}},  # mode none, metadata leftover
        {"add": {"path": "d/f1.parquet", "partitionValues": {"day": "2024-06-01"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ])
    df = read_delta_table(spark, root)
    got = {(r.k, r.v, r.tags.lang, r.day) for r in df.collect()}
    assert got == {(1, "a", "en", "2024-06-01")}


def _arrow_file_with_ids(path, cols, rows):
    """Write a parquet file whose columns carry the given parquet field
    ids — what a column-mapping 'id' writer produces.  *cols* is
    [(name, pa_type, field_id or (field_id, nested_cols))]."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    def field(name, typ, fid):
        meta = (
            None if fid is None else {b"PARQUET:field_id": str(fid).encode()}
        )  # fid None = a literal (never-mapped) column like _change_type
        if isinstance(typ, list):  # nested struct
            inner = [field(n, t, i) for n, t, i in typ]
            return pa.field(name, pa.struct(inner), metadata=meta)
        return pa.field(name, typ, metadata=meta)

    schema = pa.schema([field(n, t, i) for n, t, i in cols])
    pq.write_table(pa.table(rows, schema=schema), path)


def test_read_column_mapping_id_mode(spark, tmp_path):
    """Column-mapping 'id' mode resolves columns by parquet FIELD ID —
    robust to the schema-evolution torture the mode exists for: physical
    names are arbitrary, a dropped-and-re-added column's file field
    carries a NEW id under a reused name and must NOT be matched."""
    import pyarrow as pa

    root = str(tmp_path / "cmid")
    os.makedirs(os.path.join(root, "d"))
    # file 1: ids 1,2,3(4 nested) under arbitrary physical names
    _arrow_file_with_ids(
        os.path.join(root, "d", "f1.parquet"),
        [("zz-1", pa.int64(), 1), ("zz-2", pa.string(), 2),
         ("zz-3", [("zz-4", pa.string(), 4)], 3)],
        {"zz-1": [1, 2], "zz-2": ["a", "b"], "zz-3": [{"zz-4": "en"}, {"zz-4": "fr"}]},
    )
    # file 2: written AFTER v was dropped and a new column re-added with
    # id 99 under v's old physical name — id 2 must read as NULL here,
    # and id-99 data must not leak into any logical column
    _arrow_file_with_ids(
        os.path.join(root, "d", "f2.parquet"),
        [("zz-1", pa.int64(), 1), ("col-bbb", pa.int64(), 99),
         ("zz-3", [("zz-4", pa.string(), 4)], 3)],
        {"zz-1": [3], "col-bbb": [777], "zz-3": [{"zz-4": "de"}]},
    )
    _write_commit(root, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {"id": "cmid", "format": {"provider": "parquet", "options": {}},
                      "schemaString": json.dumps(_cm_schema()),
                      "partitionColumns": ["day"],
                      "configuration": {"delta.columnMapping.mode": "id"}}},
        {"add": {"path": "d/f1.parquet",
                 "partitionValues": {"col-eee": "2024-06-01"},  # physical key
                 "size": 1, "modificationTime": 0, "dataChange": True}},
        {"add": {"path": "d/f2.parquet",
                 "partitionValues": {"col-eee": "2024-06-02"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ])
    df = read_delta_table(spark, root)
    assert df.columns == ["k", "v", "tags", "day"]
    got = {(r.k, r.v, r.tags.lang, r.day) for r in df.collect()}
    assert got == {
        (1, "a", "en", "2024-06-01"),
        (2, "b", "fr", "2024-06-01"),
        (3, None, "de", "2024-06-02"),
    }
    # regression (advisor r6): the id-mode scan must NOT flip the
    # session-level fieldId conf — unrelated later reads whose schemas
    # carry parquet.field.id metadata would silently change resolution.
    # The conf is pinned on a cloned session the relation captures, so
    # the scan still resolves by id even when collected AFTER this check.
    assert (
        spark.conf.get("spark.sql.parquet.fieldId.read.enabled", "false")
        == "false"
    )
    assert {r.k for r in read_delta_table(spark, root).collect()} == {1, 2, 3}


def test_reader_refuses_unknown_mapping_mode(spark, tmp_path):
    root = str(tmp_path / "cmweird")
    _write_commit(root, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {"id": "x", "format": {"provider": "parquet", "options": {}},
                      "schemaString": json.dumps(_cm_schema()), "partitionColumns": [],
                      "configuration": {"delta.columnMapping.mode": "weird"}}},
    ])
    with pytest.raises(DeltaProtocolError, match="'weird'"):
        read_delta_log(spark, root)


def test_checkpoint_short_circuits_log_replay(spark, tmp_path):
    """A parquet checkpoint + _last_checkpoint replaces replaying the
    JSON commits at/below its version."""
    import datetime as dt

    root = _mk_external_delta(spark, tmp_path)
    adds, meta = read_delta_log(spark, root)
    # build a checkpoint parquet describing the post-commit-1 state
    cp_rows = [{"metaData": meta, "add": None, "protocol": None}] + [
        {"metaData": None, "add": a, "protocol": None} for a in adds
    ]
    cp = spark.createDataFrame(
        [json.dumps(r) for r in cp_rows], "string"
    )
    import pyspark.sql.functions as F

    cp_schema = (
        "metaData struct<id string, format struct<provider string>, "
        "schemaString string, partitionColumns array<string>>, "
        "add struct<path string, partitionValues map<string,string>, size long, "
        "modificationTime long, dataChange boolean>, "
        "protocol struct<minReaderVersion int, minWriterVersion int>"
    )
    parsed = cp.select(F.from_json(F.col("value"), cp_schema).alias("a")).select("a.*")
    cp_path = os.path.join(root, "_delta_log", f"{1:020d}.checkpoint.parquet")
    tmp_cp = str(tmp_path / "cpstage")
    parsed.coalesce(1).write.mode("overwrite").parquet(tmp_cp)
    part = next(f for f in os.listdir(tmp_cp) if f.endswith(".parquet"))
    os.replace(os.path.join(tmp_cp, part), cp_path)
    with open(os.path.join(root, "_delta_log", "_last_checkpoint"), "w") as f:
        json.dump({"version": 1, "size": len(cp_rows)}, f)
    # delete the JSON commits the checkpoint covers: replay must not need them
    os.remove(os.path.join(root, "_delta_log", f"{0:020d}.json"))
    os.remove(os.path.join(root, "_delta_log", f"{1:020d}.json"))
    df = read_delta_table(spark, root)
    assert _rows(df.select("k", "v", "day")) == {
        (2, "b", dt.date(2024, 1, 2)),
        (3, "c", dt.date(2024, 1, 1)),
    }


def test_manifest_export_roundtrip(spark, tmp_path, sink_fs):
    """ManifestTable → Delta log → read back via the Delta reader:
    row-identical, partitions re-attached; a second export appends an
    incremental commit with the remove/add diff."""
    t = ManifestTable(spark, str(tmp_path / "t"), partition_by=["day"], fs=sink_fs)
    t.append(spark.createDataFrame(
        [("2024-01-01", 1, "a"), ("2024-01-02", 2, "b")],
        "day string, k long, v string",
    ))
    p0 = export_manifest_as_delta(t)
    assert p0.endswith(f"{0:020d}.json")
    got = read_delta_table(spark, t.path)
    # the exported schema is the COMMITTED schema (day: string);
    # ManifestTable.read() hive-infers partition dirs as dates — cast for
    # the value comparison
    import pyspark.sql.functions as F

    ours = t.read().select(F.col("day").cast("string"), "k", "v")
    assert _rows(got.select("day", "k", "v")) == _rows(ours)

    # replace rewrites the file set; the next export appends ONE diff commit
    t.replace(spark.createDataFrame(
        [("2024-01-03", 3, "c")], "day string, k long, v string"
    ))
    p1 = export_manifest_as_delta(t)
    assert p1.endswith(f"{1:020d}.json")
    got2 = read_delta_table(spark, t.path)
    assert _rows(got2.select("day", "k", "v")) == {("2024-01-03", 3, "c")}
    # idempotent: nothing changed → no empty commit is written
    assert export_manifest_as_delta(t) == p1
    # the v0 reader view still replays (time travel over the export log)
    v0 = read_delta_table(spark, t.path, version=0)
    assert _rows(v0.select("day", "k", "v")) == {
        ("2024-01-01", 1, "a"), ("2024-01-02", 2, "b"),
    }


def test_time_travel_uses_checkpoint_for_cleaned_up_commits(spark, tmp_path):
    """Writers clean up JSON commits once a checkpoint covers them; a
    version=N read must load the checkpoint (≤ N) instead of replaying
    only the surviving jsons into partial state."""
    import datetime as dt

    import pyspark.sql.functions as F

    root = _mk_external_delta(spark, tmp_path)
    adds, meta = read_delta_log(spark, root)
    cp_rows = [{"metaData": meta, "add": None, "protocol": None}] + [
        {"metaData": None, "add": a, "protocol": None} for a in adds
    ]
    cp = spark.createDataFrame([json.dumps(r) for r in cp_rows], "string")
    cp_schema = (
        "metaData struct<id string, format struct<provider string>, "
        "schemaString string, partitionColumns array<string>>, "
        "add struct<path string, partitionValues map<string,string>, size long, "
        "modificationTime long, dataChange boolean>, "
        "protocol struct<minReaderVersion int, minWriterVersion int>"
    )
    parsed = cp.select(F.from_json(F.col("value"), cp_schema).alias("a")).select("a.*")
    tmp_cp = str(tmp_path / "cpstage2")
    parsed.coalesce(1).write.mode("overwrite").parquet(tmp_cp)
    part = next(f for f in os.listdir(tmp_cp) if f.endswith(".parquet"))
    os.replace(os.path.join(tmp_cp, part),
               os.path.join(root, "_delta_log", f"{1:020d}.checkpoint.parquet"))
    with open(os.path.join(root, "_delta_log", "_last_checkpoint"), "w") as f:
        json.dump({"version": 1, "size": len(cp_rows)}, f)
    os.remove(os.path.join(root, "_delta_log", f"{0:020d}.json"))
    os.remove(os.path.join(root, "_delta_log", f"{1:020d}.json"))

    # version=1 equals the checkpoint: full state, no jsons needed
    df = read_delta_table(spark, root, version=1)
    assert _rows(df.select("k", "v", "day")) == {
        (2, "b", dt.date(2024, 1, 2)),
        (3, "c", dt.date(2024, 1, 1)),
    }
    # version=0 predates the checkpoint and its commits are gone:
    # must refuse, never return partial state
    with pytest.raises((DeltaProtocolError, FileNotFoundError)):
        read_delta_table(spark, root, version=0)


def test_write_checkpoint_replaces_json_replay(spark, tmp_path, sink_fs):
    """write_delta_checkpoint produces a spec-shaped V1 checkpoint that
    fully replaces the JSON commits it covers: after deleting them the
    table still reads, and a post-checkpoint commit replays on top."""
    from verified_sources_spark.operators.delta_interop import write_delta_checkpoint

    t = ManifestTable(spark, str(tmp_path / "cp"), partition_by=["day"], fs=sink_fs)
    t.append(spark.createDataFrame(
        [("2024-01-01", 1, "a"), ("2024-01-02", 2, "b")],
        "day string, k long, v string"))
    export_manifest_as_delta(t)
    t.append(spark.createDataFrame(
        [("2024-01-03", 3, "c")], "day string, k long, v string"))
    export_manifest_as_delta(t)

    cp = write_delta_checkpoint(spark, t.path)
    assert cp.endswith(f"{1:020d}.checkpoint.parquet")
    lc = json.loads(open(os.path.join(t.path, "_delta_log", "_last_checkpoint")).read())
    assert lc["version"] == 1
    # checkpoint state alone reconstructs the table: drop the JSONs
    os.remove(os.path.join(t.path, "_delta_log", f"{0:020d}.json"))
    os.remove(os.path.join(t.path, "_delta_log", f"{1:020d}.json"))
    got = read_delta_table(spark, t.path)
    assert _rows(got.select("day", "k", "v")) == {
        ("2024-01-01", 1, "a"), ("2024-01-02", 2, "b"), ("2024-01-03", 3, "c")}

    # a commit AFTER the checkpoint still replays on top of it
    t.replace(spark.createDataFrame(
        [("2024-01-04", 4, "d")], "day string, k long, v string"))
    export_manifest_as_delta(t)
    got2 = read_delta_table(spark, t.path)
    assert _rows(got2.select("day", "k", "v")) == {("2024-01-04", 4, "d")}


def test_checkpoint_writer_refuses_partial_state_and_is_idempotent(
    spark, tmp_path, sink_fs
):
    """write_delta_checkpoint must never persist partial state: a
    version pinned BELOW an existing checkpoint whose covered commits
    were cleaned up raises (same gap validation the readers use), and a
    re-run at the same version is an idempotent no-op."""
    from verified_sources_spark.operators.delta_interop import write_delta_checkpoint

    t = ManifestTable(spark, str(tmp_path / "cpi"), fs=sink_fs)
    t.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    export_manifest_as_delta(t)
    t.append(spark.createDataFrame([(2, "b")], "k long, v string"))
    export_manifest_as_delta(t)
    cp = write_delta_checkpoint(spark, t.path)
    # idempotent: same version, same path, no error, no rewrite
    assert write_delta_checkpoint(spark, t.path) == cp
    os.remove(os.path.join(t.path, "_delta_log", f"{0:020d}.json"))
    os.remove(os.path.join(t.path, "_delta_log", f"{1:020d}.json"))
    # version 0's commits are gone and the checkpoint (v1) can't serve a
    # v0 target: refuse, never write a checkpoint missing commit 0's adds
    with pytest.raises((DeltaProtocolError, FileNotFoundError)):
        write_delta_checkpoint(spark, t.path, version=0)
    # _last_checkpoint untouched by the refused attempt
    lc = json.loads(open(os.path.join(t.path, "_delta_log", "_last_checkpoint")).read())
    assert lc["version"] == 1


def test_clean_delta_log_removes_only_covered_commits(spark, tmp_path, sink_fs):
    """Log cleanup deletes commits <= the checkpoint version, the table
    still reads, post-checkpoint commits survive, and a missing
    checkpoint file refuses cleanup."""
    from verified_sources_spark.operators.delta_interop import (
        clean_delta_log,
        write_delta_checkpoint,
    )

    t = ManifestTable(spark, str(tmp_path / "cl"), fs=sink_fs)
    t.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    export_manifest_as_delta(t)
    t.append(spark.createDataFrame([(2, "b")], "k long, v string"))
    export_manifest_as_delta(t)
    write_delta_checkpoint(spark, t.path)
    t.append(spark.createDataFrame([(3, "c")], "k long, v string"))
    export_manifest_as_delta(t)  # commit 2, AFTER the checkpoint at 1

    assert clean_delta_log(spark, t.path) == [0, 1]
    assert not os.path.exists(os.path.join(t.path, "_delta_log", f"{0:020d}.json"))
    assert os.path.exists(os.path.join(t.path, "_delta_log", f"{2:020d}.json"))
    got = read_delta_table(spark, t.path)
    assert _rows(got.select("k", "v")) == {(1, "a"), (2, "b"), (3, "c")}
    assert clean_delta_log(spark, t.path) == []  # idempotent

    # sabotage: _last_checkpoint names a checkpoint that is gone
    os.remove(os.path.join(t.path, "_delta_log", f"{1:020d}.checkpoint.parquet"))
    with pytest.raises(DeltaProtocolError, match="refusing to delete"):
        clean_delta_log(spark, t.path)


def test_checkpoint_adds_carry_datachange_false(spark, tmp_path, sink_fs):
    """Spec: checkpoint actions describe STATE — dataChange must be
    false or streaming readers bootstrapping from the checkpoint re-emit
    every file as a change event."""
    from verified_sources_spark.operators.delta_interop import write_delta_checkpoint

    t = ManifestTable(spark, str(tmp_path / "cpd"), fs=sink_fs)
    t.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    export_manifest_as_delta(t)
    cp = write_delta_checkpoint(spark, t.path)
    rows = spark.read.parquet(cp).collect()
    adds = [r.add for r in rows if r.add is not None]
    assert adds and all(a.dataChange is False for a in adds)


def test_export_null_partition_value_is_json_null(spark, tmp_path, sink_fs):
    """A null partition value must export as JSON null in partitionValues,
    not the hive sentinel string."""
    t = ManifestTable(spark, str(tmp_path / "np"), partition_by=["p"], fs=sink_fs)
    t.append(spark.createDataFrame([(None, 1), ("x", 2)], "p string, k long"))
    export_manifest_as_delta(t)
    adds, _ = read_delta_log(spark, t.path)
    vals = {a["partitionValues"]["p"] for a in adds}
    assert None in vals and "x" in vals
    assert "__HIVE_DEFAULT_PARTITION__" not in vals
    df = read_delta_table(spark, t.path)
    assert _rows(df.select("k", "p")) == {(1, None), (2, "x")}


def test_checkpoint_retains_unexpired_tombstones(spark, tmp_path, sink_fs):
    """The protocol requires unexpired remove tombstones be carried into
    checkpoints (writers' conflict detection / VACUUM still see them);
    expired ones (older than delta.deletedFileRetentionDuration) are
    dropped.  Neither kind resurrects rows on read."""
    from verified_sources_spark.operators.delta_interop import write_delta_checkpoint

    t = ManifestTable(spark, str(tmp_path / "tomb"), fs=sink_fs)
    t.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    export_manifest_as_delta(t)
    # replace drops the first file → export emits a FRESH remove tombstone
    t.replace(spark.createDataFrame([(2, "b")], "k long, v string"))
    export_manifest_as_delta(t)
    # hand-append a commit carrying an EXPIRED tombstone (8 days old,
    # default retention is 1 week) for a path never in the adds
    old_ms = int(time.time() * 1000) - 8 * 86_400_000
    with open(os.path.join(t.path, "_delta_log", f"{2:020d}.json"), "w") as f:
        f.write(json.dumps({"remove": {
            "path": "part-stale-0000.parquet",
            "deletionTimestamp": old_ms,
            "dataChange": False,
        }}))

    cp = write_delta_checkpoint(spark, t.path)
    rows = spark.read.parquet(cp).collect()
    removes = {r.remove.path for r in rows if r.remove is not None}
    assert removes, "fresh tombstone must be retained in the checkpoint"
    assert "part-stale-0000.parquet" not in removes, "expired tombstone dropped"
    # tombstones never resurrect rows: snapshot reads stay identical
    for v in os.listdir(os.path.join(t.path, "_delta_log")):
        if v.endswith(".json"):
            os.remove(os.path.join(t.path, "_delta_log", v))
    got = read_delta_table(spark, t.path)
    assert _rows(got.select("k", "v")) == {(2, "b")}


def test_checkpoint_last_checkpoint_crash_repair(spark, tmp_path, sink_fs):
    """A crash between the checkpoint rename and the _last_checkpoint
    write must not leave the checkpoint permanently unregistered: the
    idempotent re-run repairs the pointer instead of returning early."""
    from verified_sources_spark.operators.delta_interop import write_delta_checkpoint

    t = ManifestTable(spark, str(tmp_path / "crash"), fs=sink_fs)
    t.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    export_manifest_as_delta(t)
    cp = write_delta_checkpoint(spark, t.path)
    lc_path = os.path.join(t.path, "_delta_log", "_last_checkpoint")
    # simulate the crash: pointer never written
    os.remove(lc_path)
    assert write_delta_checkpoint(spark, t.path) == cp
    lc = json.loads(open(lc_path).read())
    assert lc["version"] == 0
    assert lc["size"] == spark.read.parquet(cp).count()
    # a current pointer is left untouched (no rewrite churn)
    before = os.stat(lc_path).st_mtime_ns
    assert write_delta_checkpoint(spark, t.path) == cp
    assert os.stat(lc_path).st_mtime_ns == before


def _v2_data_file(spark, tmp_path, root, name, rows):
    df = spark.createDataFrame(rows, "k long, v string")
    stage = str(tmp_path / ("v2stage_" + name))
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
    os.makedirs(os.path.join(root, "d"), exist_ok=True)
    os.replace(os.path.join(stage, part), os.path.join(root, "d", name))
    return f"d/{name}"


def _v2_sidecar(spark, root, name, adds, removes=()):
    """Write a sidecar parquet of add/remove actions under _sidecars/."""
    rows = [
        ((p, {}, 1, 0, False), None) for p in adds
    ] + [
        (None, (p, 1000, False)) for p in removes
    ]
    schema = (
        "add struct<path:string, partitionValues:map<string,string>, "
        "size:bigint, modificationTime:bigint, dataChange:boolean>, "
        "remove struct<path:string, deletionTimestamp:bigint, dataChange:boolean>"
    )
    df = spark.createDataFrame(rows, schema)
    stage = os.path.join(root, "_delta_log", ".sc_stage_" + name)
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
    os.makedirs(os.path.join(root, "_delta_log", "_sidecars"), exist_ok=True)
    os.replace(
        os.path.join(stage, part),
        os.path.join(root, "_delta_log", "_sidecars", name),
    )
    import shutil

    shutil.rmtree(stage, ignore_errors=True)
    return name


_V2_SCHEMA_JSON = json.dumps({
    "type": "struct",
    "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "v", "type": "string", "nullable": True, "metadata": {}},
    ],
})


def test_v2_checkpoint_json_with_sidecars(spark, tmp_path):
    """A UUID-named JSON v2 checkpoint whose file actions live in two
    sidecar parquets: the reader must resolve it from _last_checkpoint,
    apply both sidecars (incl. a remove tombstone that must NOT
    resurrect), and replay post-checkpoint commits on top — with every
    covered JSON commit deleted."""
    root = str(tmp_path / "v2cp")
    f1 = _v2_data_file(spark, tmp_path, root, "f1.parquet", [(1, "a")])
    f2 = _v2_data_file(spark, tmp_path, root, "f2.parquet", [(2, "b")])
    f3 = _v2_data_file(spark, tmp_path, root, "f3.parquet", [(3, "c")])
    _v2_sidecar(spark, root, "sc1.parquet", adds=[f1])
    _v2_sidecar(spark, root, "sc2.parquet", adds=[f2], removes=["d/gone.parquet"])

    log = os.path.join(root, "_delta_log")
    uuid_name = f"{1:020d}.checkpoint.2aae1b12-3f9c-4c02-9e4e-7a1f6c111111.json"
    with open(os.path.join(log, uuid_name), "w") as f:
        f.write("\n".join(json.dumps(a) for a in [
            {"checkpointMetadata": {"version": 1}},
            {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                          "readerFeatures": ["v2Checkpoint"],
                          "writerFeatures": ["v2Checkpoint"]}},
            {"metaData": {"id": "v2", "format": {"provider": "parquet", "options": {}},
                          "schemaString": _V2_SCHEMA_JSON,
                          "partitionColumns": [], "configuration": {}}},
            {"sidecar": {"path": "sc1.parquet", "sizeInBytes": 1,
                         "modificationTime": 0}},
            {"sidecar": {"path": "sc2.parquet", "sizeInBytes": 1,
                         "modificationTime": 0}},
        ]))
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        f.write(json.dumps({"version": 1, "size": 5}))
    # a post-checkpoint commit adds f3
    _write_commit(root, 2, [
        {"add": {"path": f3, "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ])

    got = read_delta_table(spark, root)
    assert _rows(got.select("k", "v")) == {(1, "a"), (2, "b"), (3, "c")}


def test_v2_checkpoint_parquet_inline_actions(spark, tmp_path):
    """A UUID-named PARQUET v2 checkpoint with file actions stored
    INLINE (no sidecars) — the other legal v2 layout."""
    import pyspark.sql.types as T

    root = str(tmp_path / "v2cpi")
    f1 = _v2_data_file(spark, tmp_path, root, "g1.parquet", [(7, "x")])
    log = os.path.join(root, "_delta_log")

    schema = T.StructType([
        T.StructField("checkpointMetadata", T.StructType([
            T.StructField("version", T.LongType())])),
        T.StructField("protocol", T.StructType([
            T.StructField("minReaderVersion", T.IntegerType()),
            T.StructField("minWriterVersion", T.IntegerType()),
            T.StructField("readerFeatures", T.ArrayType(T.StringType())),
            T.StructField("writerFeatures", T.ArrayType(T.StringType()))])),
        T.StructField("metaData", T.StructType([
            T.StructField("id", T.StringType()),
            T.StructField("format", T.StructType([
                T.StructField("provider", T.StringType())])),
            T.StructField("schemaString", T.StringType()),
            T.StructField("partitionColumns", T.ArrayType(T.StringType())),
            T.StructField("configuration",
                          T.MapType(T.StringType(), T.StringType()))])),
        T.StructField("add", T.StructType([
            T.StructField("path", T.StringType()),
            T.StructField("partitionValues",
                          T.MapType(T.StringType(), T.StringType())),
            T.StructField("size", T.LongType()),
            T.StructField("modificationTime", T.LongType()),
            T.StructField("dataChange", T.BooleanType())])),
    ])
    rows = [
        ((1,), None, None, None),
        (None, (3, 7, ["v2Checkpoint"], ["v2Checkpoint"]), None, None),
        (None, None, ("v2i", ("parquet",), _V2_SCHEMA_JSON, [], {}), None),
        (None, None, None, (f1, {}, 1, 0, False)),
    ]
    df = spark.createDataFrame(rows, schema)
    stage = os.path.join(log, ".cp_stage")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
    os.makedirs(log, exist_ok=True)
    os.replace(
        os.path.join(stage, part),
        os.path.join(log, f"{0:020d}.checkpoint.5b8e0d44-aaaa-bbbb-cccc-000000000001.parquet"),
    )
    import shutil

    shutil.rmtree(stage, ignore_errors=True)
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        f.write(json.dumps({"version": 0, "size": 4}))

    got = read_delta_table(spark, root)
    assert _rows(got.select("k", "v")) == {(7, "x")}


def test_missing_v2_checkpoint_file_raises(spark, tmp_path):
    root = str(tmp_path / "v2miss")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        f.write(json.dumps({"version": 3, "size": 1}))
    with pytest.raises(DeltaProtocolError, match="no checkpoint file"):
        read_delta_table(spark, root)


def test_checkpoint_retains_set_transactions(spark, tmp_path, sink_fs):
    """SetTransaction (txn) actions are external streaming writers'
    idempotence watermark — the LATEST version per appId must survive
    into checkpoints (spec requirement), or log cleanup would reset
    their exactly-once tracking."""
    from verified_sources_spark.operators.delta_interop import (
        read_delta_log,
        write_delta_checkpoint,
    )

    t = ManifestTable(spark, str(tmp_path / "txn"), fs=sink_fs)
    t.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    export_manifest_as_delta(t)
    # a foreign streaming writer appended txn actions across commits
    with open(os.path.join(t.path, "_delta_log", f"{1:020d}.json"), "w") as f:
        f.write("\n".join(json.dumps(a) for a in [
            {"txn": {"appId": "streamA", "version": 3, "lastUpdated": 111}},
            {"txn": {"appId": "streamB", "version": 9}},
        ]))
    with open(os.path.join(t.path, "_delta_log", f"{2:020d}.json"), "w") as f:
        f.write(json.dumps(
            {"txn": {"appId": "streamA", "version": 5, "lastUpdated": 222}}
        ))
    cp = write_delta_checkpoint(spark, t.path)
    rows = spark.read.parquet(cp).collect()
    txns = {r.txn.appId: r.txn for r in rows if r.txn is not None}
    assert txns["streamA"].version == 5 and txns["streamA"].lastUpdated == 222
    assert txns["streamB"].version == 9 and txns["streamB"].lastUpdated is None
    # and the snapshot still reads after cleanup
    for n in list(os.listdir(os.path.join(t.path, "_delta_log"))):
        if n.endswith(".json") and n[:-5].isdigit():
            os.remove(os.path.join(t.path, "_delta_log", n))
    adds, _ = read_delta_log(spark, t.path)
    assert len(adds) >= 1


def test_clean_delta_log_accepts_v2_checkpoint(spark, tmp_path):
    """clean_delta_log must recognize a UUID-named V2 checkpoint as
    covering its commits (refusing would wedge cleanup forever on
    modern-writer tables)."""
    from verified_sources_spark.operators.delta_interop import clean_delta_log

    root = str(tmp_path / "v2clean")
    f1 = _v2_data_file(spark, tmp_path, root, "c1.parquet", [(1, "a")])
    log = os.path.join(root, "_delta_log")
    _write_commit(root, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "vc", "format": {"provider": "parquet", "options": {}},
                      "schemaString": _V2_SCHEMA_JSON,
                      "partitionColumns": [], "configuration": {}}},
        {"add": {"path": f1, "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ])
    uuid_name = f"{0:020d}.checkpoint.7da00b4c-0000-1111-2222-333333333333.json"
    with open(os.path.join(log, uuid_name), "w") as f:
        f.write("\n".join(json.dumps(a) for a in [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": {"id": "vc", "format": {"provider": "parquet", "options": {}},
                          "schemaString": _V2_SCHEMA_JSON,
                          "partitionColumns": [], "configuration": {}}},
            {"add": {"path": f1, "partitionValues": {}, "size": 1,
                     "modificationTime": 0, "dataChange": False}},
        ]))
    with open(os.path.join(log, "_last_checkpoint"), "w") as f:
        f.write(json.dumps({"version": 0, "size": 3}))
    assert clean_delta_log(spark, root) == [0]
    got = read_delta_table(spark, root)
    assert _rows(got.select("k", "v")) == {(1, "a")}


def test_timestamp_time_travel_mtime_and_ict(spark, tmp_path, sink_fs):
    """resolve_version_at_timestamp: last-commit-at-or-before semantics
    over file mtimes, and the in-commit-timestamp override when the
    table property is on (ICT values WIN over contradicting mtimes)."""
    from verified_sources_spark.operators.delta_interop import (
        resolve_version_at_timestamp,
    )

    t = ManifestTable(spark, str(tmp_path / "tt"), fs=sink_fs)
    t.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    export_manifest_as_delta(t)
    t.append(spark.createDataFrame([(2, "b")], "k long, v string"))
    export_manifest_as_delta(t)
    log = os.path.join(t.path, "_delta_log")
    os.utime(os.path.join(log, f"{0:020d}.json"), (1000, 1000))    # t=1000s
    os.utime(os.path.join(log, f"{1:020d}.json"), (2000, 2000))    # t=2000s

    assert resolve_version_at_timestamp(spark, t.path, 1_500_000) == 0
    assert resolve_version_at_timestamp(spark, t.path, 2_000_000) == 1
    assert resolve_version_at_timestamp(spark, t.path, 9_999_999_000) == 1
    with pytest.raises(DeltaProtocolError, match="precedes"):
        resolve_version_at_timestamp(spark, t.path, 500_000)
    got = read_delta_table(
        spark, t.path, version=resolve_version_at_timestamp(spark, t.path, 1_500_000)
    )
    assert _rows(got.select("k", "v")) == {(1, "a")}

    # ICT table: commitInfo timestamps CONTRADICT the mtimes and must win
    root = str(tmp_path / "ict")
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}}]}
    meta = {"metaData": {"id": "ict", "format": {"provider": "parquet", "options": {}},
                         "schemaString": json.dumps(schema), "partitionColumns": [],
                         "configuration": {"delta.enableInCommitTimestamps": "true"}}}
    _write_commit(root, 0, [
        {"commitInfo": {"inCommitTimestamp": 5_000_000}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}, meta,
    ])
    _write_commit(root, 1, [
        {"commitInfo": {"inCommitTimestamp": 6_000_000}},
    ])
    # mtimes say "ancient" — ICT must override
    os.utime(os.path.join(root, "_delta_log", f"{0:020d}.json"), (1, 1))
    os.utime(os.path.join(root, "_delta_log", f"{1:020d}.json"), (2, 2))
    assert resolve_version_at_timestamp(spark, root, 5_500_000) == 0
    assert resolve_version_at_timestamp(spark, root, 6_000_000) == 1
    with pytest.raises(DeltaProtocolError, match="precedes"):
        resolve_version_at_timestamp(spark, root, 4_000_000)


def test_timestamp_time_travel_mid_history_ict_enablement(spark, tmp_path):
    """A table that turned ICT on MID-history legitimately has ICT-less
    older commits: below delta.inCommitTimestampEnablementVersion the
    resolver must fall back to file mtime, at/above it ICT is required
    (spec: Clock-Based vs In-Commit timestamps switch at the enablement
    version)."""
    from verified_sources_spark.operators.delta_interop import (
        resolve_version_at_timestamp,
    )

    root = str(tmp_path / "ict_mid")
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}}]}
    _write_commit(root, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "im", "format": {"provider": "parquet", "options": {}},
                      "schemaString": json.dumps(schema), "partitionColumns": [],
                      "configuration": {}}},
    ])
    _write_commit(root, 1, [])  # still pre-ICT, no commitInfo at all
    # commit 2 enables the feature and records the enablement properties
    _write_commit(root, 2, [
        {"commitInfo": {"inCommitTimestamp": 5_000_000}},
        {"metaData": {"id": "im", "format": {"provider": "parquet", "options": {}},
                      "schemaString": json.dumps(schema), "partitionColumns": [],
                      "configuration": {
                          "delta.enableInCommitTimestamps": "true",
                          "delta.inCommitTimestampEnablementVersion": "2",
                          "delta.inCommitTimestampEnablementTimestamp": "5000000",
                      }}},
    ])
    log = os.path.join(root, "_delta_log")
    os.utime(os.path.join(log, f"{0:020d}.json"), (1000, 1000))
    os.utime(os.path.join(log, f"{1:020d}.json"), (2000, 2000))
    os.utime(os.path.join(log, f"{2:020d}.json"), (1, 1))  # mtime lies; ICT wins
    assert resolve_version_at_timestamp(spark, root, 1_500_000) == 0
    assert resolve_version_at_timestamp(spark, root, 2_500_000) == 1
    assert resolve_version_at_timestamp(spark, root, 5_000_000) == 2
    # an ICT missing AT/ABOVE the enablement version is still a protocol
    # violation, not a fallback
    _write_commit(root, 3, [])
    with pytest.raises(DeltaProtocolError, match="inCommitTimestamp"):
        resolve_version_at_timestamp(spark, root, 9_000_000)


def test_change_data_feed_read(spark, tmp_path):
    """CDF over three commits: plain-append commit (adds = inserts),
    a cdc-action commit (the _change_data file alone represents the
    commit — its adds/removes must NOT be double counted), and a
    dataChange-remove commit (deletes reconstructed from the removed
    file).  Range and gap semantics included."""
    from verified_sources_spark.operators.delta_interop import read_delta_changes

    root = str(tmp_path / "cdf")
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True, "metadata": {}},
        {"name": "v", "type": "string", "nullable": True, "metadata": {}}]}

    def pfile(dirname, name, rows, ddl):
        df = spark.createDataFrame(rows, ddl)
        stage = str(tmp_path / ("cdfstage_" + name))
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        os.makedirs(os.path.join(root, dirname), exist_ok=True)
        os.replace(os.path.join(stage, part), os.path.join(root, dirname, name))
        return f"{dirname}/{name}"

    f1 = pfile("d", "f1.parquet", [(1, "a"), (2, "b")], "k long, v string")
    # commit 0: create + insert f1
    _write_commit(root, 0, [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 4}},
        {"metaData": {"id": "cdf", "format": {"provider": "parquet", "options": {}},
                      "schemaString": json.dumps(schema), "partitionColumns": [],
                      "configuration": {"delta.enableChangeDataFeed": "true"}}},
        {"add": {"path": f1, "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ])
    # commit 1: an UPDATE expressed with cdc files (rewrite f1 -> f2);
    # the add/remove in this commit must not surface as insert/delete
    f2 = pfile("d", "f2.parquet", [(1, "a"), (2, "B")], "k long, v string")
    c1 = pfile("_change_data", "c1.parquet",
               [(2, "b", "update_preimage"), (2, "B", "update_postimage")],
               "k long, v string, _change_type string")
    _write_commit(root, 1, [
        {"remove": {"path": f1, "deletionTimestamp": 1, "dataChange": True}},
        {"add": {"path": f2, "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
        {"cdc": {"path": c1, "partitionValues": {}, "size": 1,
                 "dataChange": False}},
    ])
    # commit 2: plain delete of f2 (no cdc action): delete rows come
    # from the removed file itself
    _write_commit(root, 2, [
        {"remove": {"path": f2, "deletionTimestamp": 2, "dataChange": True}},
    ])

    ch = read_delta_changes(spark, root, 0)
    got = {(r.k, r.v, r._change_type, r._commit_version) for r in ch.collect()}
    assert got == {
        (1, "a", "insert", 0), (2, "b", "insert", 0),
        (2, "b", "update_preimage", 1), (2, "B", "update_postimage", 1),
        (1, "a", "delete", 2), (2, "B", "delete", 2),
    }
    # sub-range
    ch12 = read_delta_changes(spark, root, 1, 1)
    assert {r._change_type for r in ch12.collect()} == {
        "update_preimage", "update_postimage"}
    # gap refusal
    os.remove(os.path.join(root, "_delta_log", f"{1:020d}.json"))
    with pytest.raises(DeltaProtocolError, match="missing"):
        read_delta_changes(spark, root, 0)


def test_read_delta_table_timestamp_param(spark, tmp_path, sink_fs):
    t = ManifestTable(spark, str(tmp_path / "ttp"), fs=sink_fs)
    t.append(spark.createDataFrame([(1, "a")], "k long, v string"))
    export_manifest_as_delta(t)
    t.append(spark.createDataFrame([(2, "b")], "k long, v string"))
    export_manifest_as_delta(t)
    log = os.path.join(t.path, "_delta_log")
    os.utime(os.path.join(log, f"{0:020d}.json"), (1000, 1000))
    os.utime(os.path.join(log, f"{1:020d}.json"), (2000, 2000))
    got = read_delta_table(spark, t.path, timestamp_ms=1_500_000)
    assert _rows(got.select("k", "v")) == {(1, "a")}
    with pytest.raises(ValueError, match="not both"):
        read_delta_table(spark, t.path, version=0, timestamp_ms=1)


def test_change_feed_over_exported_manifest_log(spark, tmp_path, sink_fs):
    """The manifest→Delta export emits dataChange adds/removes, which IS
    a valid change feed for append/replace workloads: read_delta_changes
    over the exported log reconstructs the row-level history."""
    from verified_sources_spark.operators.delta_interop import read_delta_changes

    t = ManifestTable(spark, str(tmp_path / "cdfexp"), fs=sink_fs)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    export_manifest_as_delta(t)
    t.replace(spark.createDataFrame([(3, "c")], "k long, v string"))
    export_manifest_as_delta(t)

    ch = read_delta_changes(spark, t.path, 0)
    got = {(r.k, r.v, r._change_type, r._commit_version) for r in ch.collect()}
    assert got == {
        (1, "a", "insert", 0), (2, "b", "insert", 0),
        (1, "a", "delete", 1), (2, "b", "delete", 1),
        (3, "c", "insert", 1),
    }


def test_cdf_column_mapping_name_mode(spark, tmp_path):
    """CDF over a column-mapping 'name' table: change/data files carry
    PHYSICAL names (partitionValues keys too), _change_type is stored
    literally, and a mid-range logical RENAME folds to the ENDING
    version's names — physical identity is the join key across time."""
    from verified_sources_spark.operators.delta_interop import read_delta_changes

    root = str(tmp_path / "cdfcm")

    def pfile(dirname, name, rows, ddl):
        df = spark.createDataFrame(rows, ddl)
        stage = str(tmp_path / ("cmstage_" + name))
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
        os.makedirs(os.path.join(root, dirname), exist_ok=True)
        os.replace(os.path.join(stage, part), os.path.join(root, dirname, name))
        return f"{dirname}/{name}"

    phys_ddl = "`col-aaa` long, `col-bbb` string, `col-ccc` struct<`col-ddd`: string>"
    f1 = pfile("d", "f1.parquet", [(1, "a", ("en",)), (2, "b", ("fr",))], phys_ddl)
    meta0 = {"metaData": {"id": "cdfcm", "format": {"provider": "parquet", "options": {}},
                          "schemaString": json.dumps(_cm_schema()),
                          "partitionColumns": ["day"],
                          "configuration": {"delta.columnMapping.mode": "name",
                                            "delta.enableChangeDataFeed": "true"}}}
    _write_commit(root, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        meta0,
        {"add": {"path": f1, "partitionValues": {"col-eee": "2024-06-01"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ])
    # commit 1: update via cdc files — physical data names + literal
    # _change_type; the rewrite's add/remove must not surface
    f2 = pfile("d", "f2.parquet", [(1, "a", ("en",)), (2, "B", ("fr",))], phys_ddl)
    c1 = pfile("_change_data", "c1.parquet",
               [(2, "b", ("fr",), "update_preimage"),
                (2, "B", ("fr",), "update_postimage")],
               phys_ddl + ", _change_type string")
    _write_commit(root, 1, [
        {"remove": {"path": f1, "deletionTimestamp": 1, "dataChange": True,
                    "partitionValues": {"col-eee": "2024-06-01"}}},
        {"add": {"path": f2, "partitionValues": {"col-eee": "2024-06-01"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
        {"cdc": {"path": c1, "partitionValues": {"col-eee": "2024-06-01"},
                 "size": 1, "dataChange": False}},
    ])
    # commit 2: logical rename v -> val (physicalName col-bbb unchanged)
    # + plain delete of f2
    renamed = _cm_schema()
    for fld in renamed["fields"]:
        if fld["name"] == "v":
            fld["name"] = "val"
    meta2 = {"metaData": {"id": "cdfcm", "format": {"provider": "parquet", "options": {}},
                          "schemaString": json.dumps(renamed),
                          "partitionColumns": ["day"],
                          "configuration": {"delta.columnMapping.mode": "name",
                                            "delta.enableChangeDataFeed": "true"}}}
    _write_commit(root, 2, [
        meta2,
        {"remove": {"path": f2, "deletionTimestamp": 2, "dataChange": True,
                    "partitionValues": {"col-eee": "2024-06-01"}}},
    ])

    ch = read_delta_changes(spark, root, 0)
    assert ch.columns == ["k", "val", "tags", "day", "_change_type", "_commit_version"]
    got = {(r.k, r.val, r.tags.lang, r.day, r._change_type, r._commit_version)
           for r in ch.collect()}
    assert got == {
        (1, "a", "en", "2024-06-01", "insert", 0),
        (2, "b", "fr", "2024-06-01", "insert", 0),
        (2, "b", "fr", "2024-06-01", "update_preimage", 1),
        (2, "B", "fr", "2024-06-01", "update_postimage", 1),
        (1, "a", "en", "2024-06-01", "delete", 2),
        (2, "B", "fr", "2024-06-01", "delete", 2),
    }


def test_cdf_column_mapping_id_mode(spark, tmp_path):
    """CDF over a column-mapping 'id' table resolves change rows by
    parquet FIELD ID: a file column squatting on a logical column's old
    physical NAME (but a different id) must not leak into the feed."""
    import pyarrow as pa

    from verified_sources_spark.operators.delta_interop import read_delta_changes

    root = str(tmp_path / "cdfcmid")
    os.makedirs(os.path.join(root, "d"))
    _arrow_file_with_ids(
        os.path.join(root, "d", "f1.parquet"),
        [("zz-1", pa.int64(), 1), ("col-bbb", pa.int64(), 99),
         ("zz-3", [("zz-4", pa.string(), 4)], 3)],
        {"zz-1": [5], "col-bbb": [777], "zz-3": [{"zz-4": "de"}]},
    )
    _write_commit(root, 0, [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {"id": "cdfcmid", "format": {"provider": "parquet", "options": {}},
                      "schemaString": json.dumps(_cm_schema()),
                      "partitionColumns": ["day"],
                      "configuration": {"delta.columnMapping.mode": "id"}}},
        {"add": {"path": "d/f1.parquet",
                 "partitionValues": {"col-eee": "2024-06-02"},
                 "size": 1, "modificationTime": 0, "dataChange": True}},
    ])
    _write_commit(root, 1, [
        {"remove": {"path": "d/f1.parquet", "deletionTimestamp": 1,
                    "dataChange": True,
                    "partitionValues": {"col-eee": "2024-06-02"}}},
    ])
    # commit 2: a cdc-action commit — data columns resolve by field id,
    # _change_type is literal and UN-id'd in the same file (the spec's
    # shape for change files under column mapping)
    os.makedirs(os.path.join(root, "_change_data"), exist_ok=True)
    _arrow_file_with_ids(
        os.path.join(root, "_change_data", "c2.parquet"),
        [("zz-1", pa.int64(), 1), ("zz-2", pa.string(), 2),
         ("zz-3", [("zz-4", pa.string(), 4)], 3),
         ("_change_type", pa.string(), None)],
        {"zz-1": [9], "zz-2": ["q"], "zz-3": [{"zz-4": "nl"}],
         "_change_type": ["insert"]},
    )
    _write_commit(root, 2, [
        {"add": {"path": "d/f1.parquet",
                 "partitionValues": {"col-eee": "2024-06-02"},
                 "size": 1, "modificationTime": 2, "dataChange": True}},
        {"cdc": {"path": "_change_data/c2.parquet",
                 "partitionValues": {"col-eee": "2024-06-03"},
                 "size": 1, "dataChange": False}},
    ])
    ch = read_delta_changes(spark, root, 0)
    got = {(r.k, r.v, r.tags.lang, r.day, r._change_type, r._commit_version)
           for r in ch.collect()}
    # id-99 col-bbb data must NOT appear as v (id 2 is absent -> NULL);
    # the cdc commit's re-add must not surface, only its change file
    assert got == {
        (5, None, "de", "2024-06-02", "insert", 0),
        (5, None, "de", "2024-06-02", "delete", 1),
        (9, "q", "nl", "2024-06-03", "insert", 2),
    }
