"""Delta deletion vectors (operators/deletion_vectors.py): codec
round-trips against the published portable RoaringBitmap format, and
end-to-end reads of hand-crafted DV tables through read_delta_table."""

from __future__ import annotations

import base64
import json
import os
import struct
import zlib

import pytest

from verified_sources_spark.operators.deletion_vectors import (
    MAGIC,
    DeletionVectorError,
    decode_blob,
    dv_absolute_path,
    encode_blob,
    inline_descriptor,
    write_dv_file,
)
from verified_sources_spark.operators.delta_interop import read_delta_table


# ------------------------------------------------------------ codec


@pytest.mark.parametrize(
    "indexes",
    [
        [0],
        [0, 1, 2, 5, 7],
        list(range(10_000)),                       # forces a bitset container
        [3, 70_000, 70_001, 131_072],              # multiple 16-bit keys
        [5, (1 << 32) + 7, (3 << 32) + 9],         # multiple 64-bit keys
        sorted({(i * 2654435761) % 500_000 for i in range(5000)}),
    ],
)
def test_blob_round_trip(indexes):
    assert decode_blob(encode_blob(indexes)) == sorted(set(indexes))


def test_decode_run_containers():
    """The encoder never emits run containers, but external writers do —
    hand-build a cookie-12347 blob with a run container and a dense run
    flag bitmap and check the decode."""
    # one bitmap (key 0) holding two containers: container 0 is a RUN
    # container with runs [10..14] and [100..100]; container 1 (key 3)
    # is a plain array {7, 9}
    n = 2
    cookie = struct.pack("<I", 12347 | ((n - 1) << 16))
    run_flags = bytes([0b01])  # container 0 is a run, container 1 isn't
    desc = struct.pack("<HH", 0, 6 - 1) + struct.pack("<HH", 3, 2 - 1)
    # n=2 < NO_OFFSET_THRESHOLD(4): no offset header
    runs = struct.pack("<H", 2) + struct.pack("<HH", 10, 4) + struct.pack(
        "<HH", 100, 0
    )
    arr = struct.pack("<2H", 7, 9)
    blob = (
        struct.pack("<i", MAGIC)
        + struct.pack("<q", 1)
        + struct.pack("<i", 0)
        + cookie
        + run_flags
        + desc
        + runs
        + arr
    )
    assert decode_blob(blob) == [10, 11, 12, 13, 14, 100, (3 << 16) + 7, (3 << 16) + 9]


def test_decode_rejects_bad_magic_and_trailing_bytes():
    with pytest.raises(DeletionVectorError, match="magic"):
        decode_blob(b"\x00" * 16)
    with pytest.raises(DeletionVectorError, match="trailing"):
        decode_blob(encode_blob([1, 2]) + b"\x00")


def test_file_round_trip_and_validation(tmp_path):
    root = str(tmp_path / "t")
    desc = write_dv_file(root, [2, 5, 9], prefix="ab")
    assert desc["storageType"] == "u"
    assert desc["cardinality"] == 3
    p = dv_absolute_path(root, desc)
    assert os.path.exists(p) and "/ab/deletion_vector_" in p
    from verified_sources_spark.operators.deletion_vectors import dv_row_indexes

    assert dv_row_indexes(root, desc) == [2, 5, 9]
    # corrupt one bitmap byte: CRC must catch it
    raw = bytearray(open(p, "rb").read())
    raw[10] ^= 0xFF
    open(p, "wb").write(bytes(raw))
    with pytest.raises(DeletionVectorError, match="checksum"):
        dv_row_indexes(root, desc)
    # cardinality mismatch in the descriptor is also refused
    desc2 = write_dv_file(root, [1, 2])
    desc2["cardinality"] = 5
    with pytest.raises(DeletionVectorError, match="cardinality"):
        dv_row_indexes(root, desc2)


def test_inline_descriptor_round_trip():
    desc = inline_descriptor([0, 3, 1 << 20])
    assert desc["storageType"] == "i"
    data = base64.b85decode(desc["pathOrInlineDv"])
    assert len(data) == desc["sizeInBytes"]
    assert decode_blob(data) == [0, 3, 1 << 20]


# ------------------------------------------------------- table reads


def _write_commit(table_dir, version, actions):
    log = os.path.join(table_dir, "_delta_log")
    os.makedirs(log, exist_ok=True)
    with open(os.path.join(log, f"{version:020d}.json"), "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions))


def _mk_dv_table(spark, tmp_path, inline: bool):
    """Two data files; file 1 has rows 0 and 2 deleted (of 0..3), file 2
    has row 1 deleted (of 0..2) — one DV per file, 'u' or 'i' storage."""
    root = str(tmp_path / ("dvt_i" if inline else "dvt_u"))
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
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

    p1 = data_file("f1.parquet", [(i, f"a{i}") for i in range(4)])
    p2 = data_file("f2.parquet", [(10 + i, f"b{i}") for i in range(3)])
    dv1 = inline_descriptor([0, 2]) if inline else write_dv_file(root, [0, 2])
    dv2 = inline_descriptor([1]) if inline else write_dv_file(root, [1], prefix="xy")
    meta = {
        "metaData": {
            "id": "dv", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema), "partitionColumns": [],
            "configuration": {},
        }
    }
    _write_commit(root, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        meta,
        {"add": {"path": p1, "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "deletionVector": dv1}},
        {"add": {"path": p2, "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "deletionVector": dv2}},
    ])
    return root


@pytest.mark.parametrize("inline", [False, True])
def test_read_table_with_deletion_vectors(spark, tmp_path, inline):
    root = _mk_dv_table(spark, tmp_path, inline)
    df = read_delta_table(spark, root)
    assert set(df.columns) == {"k", "v"}
    got = {tuple(r) for r in df.collect()}
    # file 1 keeps rows 1,3; file 2 keeps rows 0,2
    assert got == {(1, "a1"), (3, "a3"), (10, "b0"), (12, "b2")}


def test_dv_rewrite_and_removal_across_commits(spark, tmp_path):
    """A later add of the SAME file path with a wider DV replaces the
    old DV (Databricks' DELETE does exactly this); dropping the DV in a
    further rewrite resurrects nothing because the add carries no DV."""
    root = _mk_dv_table(spark, tmp_path, inline=True)
    # commit 1: rewrite f1's add with a DV deleting rows 0..2
    _write_commit(root, 1, [
        {"add": {"path": "d/f1.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": False,
                 "deletionVector": inline_descriptor([0, 1, 2])}},
    ])
    got = {tuple(r) for r in read_delta_table(spark, root).collect()}
    assert got == {(3, "a3"), (10, "b0"), (12, "b2")}
    # commit 2: f2 rewritten with NO dv — all 3 rows visible again
    _write_commit(root, 2, [
        {"add": {"path": "d/f2.parquet", "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": False}},
    ])
    got = {tuple(r) for r in read_delta_table(spark, root).collect()}
    assert got == {(3, "a3"), (10, "b0"), (11, "b1"), (12, "b2")}
    # time travel still sees version-0 deletions only
    v0 = {tuple(r) for r in read_delta_table(spark, root, version=0).collect()}
    assert v0 == {(1, "a1"), (3, "a3"), (10, "b0"), (12, "b2")}


def test_checkpoint_preserves_deletion_vectors(spark, tmp_path):
    """write_delta_checkpoint must carry DV descriptors — a checkpoint
    that dropped them would resurrect deleted rows once the JSON commits
    are cleaned up."""
    from verified_sources_spark.operators.delta_interop import (
        write_delta_checkpoint,
    )

    root = _mk_dv_table(spark, tmp_path, inline=False)
    cp = write_delta_checkpoint(spark, root)
    os.remove(os.path.join(root, "_delta_log", f"{0:020d}.json"))
    got = {tuple(r) for r in read_delta_table(spark, root).collect()}
    assert got == {(1, "a1"), (3, "a3"), (10, "b0"), (12, "b2")}
    cp_df = spark.read.parquet(cp)
    dvs = [r.add.deletionVector for r in cp_df.collect() if r.add is not None]
    assert all(d is not None for d in dvs) and len(dvs) == 2


def test_corrupt_dv_fails_loudly_not_wrong(spark, tmp_path):
    """A DV whose file went missing must fail the read, not silently
    return undeleted rows."""
    root = _mk_dv_table(spark, tmp_path, inline=False)
    # remove the DV files
    for dirpath, _, names in os.walk(root):
        for n in names:
            if n.startswith("deletion_vector_"):
                os.remove(os.path.join(dirpath, n))
    with pytest.raises(Exception):
        read_delta_table(spark, root).collect()


def test_decode_run_containers_with_offset_header():
    """>= 4 containers with run flags set: the offset header IS present
    (NO_OFFSET_THRESHOLD) and must be skipped correctly before the
    container bodies."""
    n = 4
    cookie = struct.pack("<I", 12347 | ((n - 1) << 16))
    run_flags = bytes([0b0101])  # containers 0 and 2 are runs
    desc = (
        struct.pack("<HH", 0, 3 - 1)    # run [5..7]
        + struct.pack("<HH", 1, 2 - 1)  # array {1, 4}
        + struct.pack("<HH", 2, 2 - 1)  # run [9..10]
        + struct.pack("<HH", 5, 1 - 1)  # array {8}
    )
    c0 = struct.pack("<H", 1) + struct.pack("<HH", 5, 2)
    c1 = struct.pack("<2H", 1, 4)
    c2 = struct.pack("<H", 1) + struct.pack("<HH", 9, 1)
    c3 = struct.pack("<1H", 8)
    base = 4 + 1 + len(desc) + 4 * n  # relative layout; values unchecked by decoder
    offs = struct.pack("<4I", base, base + len(c0), base + len(c0) + len(c1),
                       base + len(c0) + len(c1) + len(c2))
    blob = (
        struct.pack("<i", MAGIC)
        + struct.pack("<q", 1)
        + struct.pack("<i", 0)
        + cookie + run_flags + desc + offs + c0 + c1 + c2 + c3
    )
    assert decode_blob(blob) == [
        5, 6, 7,
        (1 << 16) + 1, (1 << 16) + 4,
        (2 << 16) + 9, (2 << 16) + 10,
        (5 << 16) + 8,
    ]


def test_dv_on_partitioned_table(spark, tmp_path):
    """DVs + hive partitions: the (file_path, row_index) anti-join must
    compose with partition-value re-attachment."""
    root = str(tmp_path / "dvp")
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "day", "type": "string", "nullable": True, "metadata": {}},
        ],
    }

    def data_file(name, rows):
        df = spark.createDataFrame(rows, "k long")
        tmp = str(tmp_path / ("pstage_" + name))
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
        os.makedirs(os.path.join(root, "d"), exist_ok=True)
        os.replace(os.path.join(tmp, part), os.path.join(root, "d", name))
        return f"d/{name}"

    p1 = data_file("p1.parquet", [(i,) for i in range(3)])
    p2 = data_file("p2.parquet", [(10 + i,) for i in range(3)])
    _write_commit(root, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        {"metaData": {"id": "dvp", "format": {"provider": "parquet", "options": {}},
                      "schemaString": json.dumps(schema),
                      "partitionColumns": ["day"], "configuration": {}}},
        {"add": {"path": p1, "partitionValues": {"day": "2024-01-01"}, "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "deletionVector": inline_descriptor([1])}},
        {"add": {"path": p2, "partitionValues": {"day": "2024-01-02"}, "size": 1,
                 "modificationTime": 0, "dataChange": True}},
    ])
    got = {tuple(r) for r in read_delta_table(spark, root).select("k", "day").collect()}
    assert got == {
        (0, "2024-01-01"), (2, "2024-01-01"),
        (10, "2024-01-02"), (11, "2024-01-02"), (12, "2024-01-02"),
    }


def test_read_table_dv_relative_path(spark, tmp_path, monkeypatch):
    """Regression: a RELATIVE local table path must still apply DVs.  The
    anti-join compares manifest paths against Spark's ABSOLUTE
    ``_metadata.file_path`` — without absolutizing, the join keys never
    match, the anti-join removes nothing, and deleted rows silently
    resurrect."""
    root = _mk_dv_table(spark, tmp_path, inline=True)
    monkeypatch.chdir(os.path.dirname(root))
    got = {
        tuple(r)
        for r in read_delta_table(spark, os.path.basename(root)).collect()
    }
    assert got == {(1, "a1"), (3, "a3"), (10, "b0"), (12, "b2")}


def _mk_dv_delete_history(spark, tmp_path):
    """The commit pattern Databricks DELETE produces: v0 adds a plain
    file; v1 row-deletes k=1 via remove(no DV)+add(DV {1}); v2 deletes
    k=3 via remove(DV {1})+add(DV {1,3}) — the remove carries the
    PRE-image DV."""
    root = str(tmp_path / "dvcdf")
    schema = {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
    df = spark.createDataFrame([(i, f"a{i}") for i in range(4)], "k long, v string")
    stage = str(tmp_path / "dvcdf_stage")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
    os.makedirs(os.path.join(root, "d"), exist_ok=True)
    os.replace(os.path.join(stage, part), os.path.join(root, "d", "f1.parquet"))
    add = lambda dv: {
        "path": "d/f1.parquet", "partitionValues": {}, "size": 1,
        "modificationTime": 0, "dataChange": True,
        **({"deletionVector": dv} if dv else {}),
    }
    rm = lambda dv: {
        "path": "d/f1.parquet", "deletionTimestamp": 1, "dataChange": True,
        **({"deletionVector": dv} if dv else {}),
    }
    _write_commit(root, 0, [
        {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                      "readerFeatures": ["deletionVectors"],
                      "writerFeatures": ["deletionVectors"]}},
        {"metaData": {"id": "dvcdf", "format": {"provider": "parquet", "options": {}},
                      "schemaString": json.dumps(schema), "partitionColumns": [],
                      "configuration": {}}},
        {"add": add(None)},
    ])
    _write_commit(root, 1, [{"remove": rm(None)},
                            {"add": add(inline_descriptor([1]))}])
    _write_commit(root, 2, [{"remove": rm(inline_descriptor([1]))},
                            {"add": add(inline_descriptor([1, 3]))}])
    return root


def test_cdf_masks_dv_deletes(spark, tmp_path):
    """Regression (advisor r6, high): the CDF fallback must mask DV'd
    actions.  Un-masked, a DV-DELETE commit's remove+add pair cancels out
    and the change feed never reports the deletion; and a remove's
    pre-image DV rows must not re-emit as deletes."""
    from verified_sources_spark.operators.delta_interop import read_delta_changes

    root = _mk_dv_delete_history(spark, tmp_path)
    ch = read_delta_changes(spark, root, 0).collect()
    by = lambda v, t: {r.k for r in ch if r._commit_version == v and r._change_type == t}
    assert by(0, "insert") == {0, 1, 2, 3}      # earlier un-DV'd add untouched
    assert by(1, "delete") == {0, 1, 2, 3}      # pre-image: no DV yet
    assert by(1, "insert") == {0, 2, 3}         # post-image masks k=1
    assert by(2, "delete") == {0, 2, 3}         # pre-image DV {1} masked
    assert by(2, "insert") == {0, 2}            # post-image masks {1,3}
    # net change replay: inserts minus deletes per key leaves exactly the
    # live rows — the deletion of k=1 and k=3 is visible, not cancelled
    net = {}
    for r in ch:
        net[r.k] = net.get(r.k, 0) + (1 if r._change_type == "insert" else -1)
    assert {k for k, n in net.items() if n > 0} == {0, 2}


def test_cdf_stream_masks_remove_preimage_dv(spark, tmp_path):
    """The delta_cdf STREAM reader applies the same pre-image masking on
    dataChange removes."""
    from verified_sources_spark.streaming import datasources as ds

    spark.dataSource.register(ds.DeltaCdfDataSource)
    root = _mk_dv_delete_history(spark, tmp_path)
    out = str(tmp_path / "cdf_out")
    ckpt = str(tmp_path / "cdf_ckpt")
    (
        spark.readStream.format("delta_cdf").option("path", root)
        .load().writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start().awaitTermination(120)
    )
    ch = spark.read.parquet(out).collect()
    by = lambda v, t: {r.k for r in ch if r._commit_version == v and r._change_type == t}
    assert by(1, "delete") == {0, 1, 2, 3}
    assert by(1, "insert") == {0, 2, 3}
    assert by(2, "delete") == {0, 2, 3}
    assert by(2, "insert") == {0, 2}
