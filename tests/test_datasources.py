"""Python Data Source API packaging (streaming/datasources.py): the
wire clients as real spark.readStream sources with offsets in Spark
checkpoints, and ManifestTable as spark.read.format("manifest")."""

from __future__ import annotations

import threading
import time

import pytest

from verified_sources_spark.streaming.datasources import register_all


@pytest.fixture()
def registered(spark):
    register_all(spark)
    return spark


# ------------------------------------------------------------- kafka_wire


def _run_available_now(spark, df, ckpt, sink: list):
    q = (
        df.writeStream.foreachBatch(
            lambda b, _id: sink.extend(
                tuple(r) for r in b.select("partition", "offset", "key").collect()
            )
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    assert not q.isActive


def test_kafka_wire_readstream_checkpoint_resume(registered, tmp_path):
    """End-to-end: readStream.format('kafka_wire') drains the broker
    under Trigger.AvailableNow; offsets live in the SPARK CHECKPOINT, so
    a restarted query reads only records produced after the first run."""
    from test_kafka_wire import _Broker

    spark = registered
    srv = _Broker()
    srv.load("events", 0, 0, [(b"a", b"ev-a", []), (b"b", b"ev-b", [])])
    srv.load("events", 1, 0, [(b"c", b"ev-c", [])])
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        host, port = srv.server_address
        df = (
            spark.readStream.format("kafka_wire")
            .option("host", host)
            .option("port", port)
            .option("topic", "events")
            .load()
        )
        ckpt = str(tmp_path / "ckpt")
        got: list = []
        _run_available_now(spark, df, ckpt, got)
        assert sorted(got) == [(0, 0, "a"), (0, 1, "b"), (1, 0, "c")]

        # produce MORE, restart from the same checkpoint: only new rows
        srv.load("events", 0, 2, [(b"d", b"ev-d", [])])
        got2: list = []
        _run_available_now(spark, df, ckpt, got2)
        assert got2 == [(0, 2, "d")]

        # a FRESH checkpoint starts from earliest again
        got3: list = []
        _run_available_now(spark, df, str(tmp_path / "ckpt2"), got3)
        assert len(got3) == 4
    finally:
        srv.shutdown()
        srv.server_close()


def test_kafka_slice_raises_on_truncated_range(registered):
    """Regression (advisor r6): a checkpointed [start, end) slice that
    the broker can no longer serve (log truncated under the checkpoint)
    must RAISE, not silently under-deliver; and non-UTF-8 keys must not
    fail the task."""
    from test_kafka_wire import _Broker

    from verified_sources_spark.streaming.datasources import (
        _KafkaSlice,
        _KafkaWireStreamReader,
    )

    srv = _Broker()
    srv.load("events", 0, 0, [(b"\xff\xfe", b"ev-a", [])])  # non-UTF-8 key
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        host, port = srv.server_address
        rdr = _KafkaWireStreamReader(
            {"host": host, "port": str(port), "topic": "events"}
        )
        rows = list(rdr.read(_KafkaSlice(host, port, "events", 0, 0, 1)))
        assert len(rows) == 1 and isinstance(rows[0][4], str)  # key replaced
        # end=5 was checkpointed but offsets 1..4 no longer exist
        with pytest.raises(RuntimeError, match="truncated"):
            list(rdr.read(_KafkaSlice(host, port, "events", 0, 0, 5)))
    finally:
        srv.shutdown()
        srv.server_close()


# ----------------------------------------------------------- kinesis_wire


def test_kinesis_wire_readstream_resume(registered, tmp_path):
    from test_kinesis_wire import _Endpoint, _url

    spark = registered
    srv = _Endpoint()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        df = (
            spark.readStream.format("kinesis_wire")
            .option("endpoint", _url(srv))
            .option("stream", "events")
            .load()
        )
        ckpt = str(tmp_path / "kck")
        got: list = []

        def run(sink):
            q = (
                df.writeStream.foreachBatch(
                    lambda b, _id: sink.extend(
                        (r["shard_id"], bytes(r["data"])) for r in b.collect()
                    )
                )
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(60)

        run(got)
        assert ("shardId-000", b"p0-a") in got and len(got) == 5

        # append to an open shard; restart reads ONLY the new record
        srv.records["shardId-002"].append(srv._rec("s2-3", b"p2-c"))
        got2: list = []
        run(got2)
        assert got2 == [("shardId-002", b"p2-c")]
    finally:
        srv.shutdown()
        srv.server_close()


def test_kinesis_full_reader_one_partition_per_shard(registered):
    """The r7 upgrade contract: planning yields ONE executor task per
    shard with (after-sequence start, inclusive end) bounds; unchanged
    shards plan no task."""
    from verified_sources_spark.streaming.datasources import (
        _KinesisWireStreamReader,
    )

    rdr = _KinesisWireStreamReader({"endpoint": "http://x", "stream": "s"})
    start = {"seq": {"shardId-000": "a1", "shardId-001": "b1"}}
    end = {"seq": {"shardId-000": "a9", "shardId-001": "b1", "shardId-002": "c5"}}
    parts = rdr.partitions(start, end)
    assert [(p.shard_id, p.start, p.end) for p in parts] == [
        ("shardId-000", "a1", "a9"),   # resumes AFTER a1
        ("shardId-002", None, "c5"),   # new shard: from TRIM_HORIZON
    ]


# ---------------------------------------------------------------- pg_cdc


def test_pg_cdc_readstream_lsn_offsets(registered, tmp_path):
    from test_pg_wire import LAST_LSN, SCRIPT, _Server

    spark = registered
    srv = _Server()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        host, port = srv.server_address
        df = (
            spark.readStream.format("pg_cdc")
            .option("host", host)
            .option("port", port)
            .option("database", "testdb")
            .option("user", "repl")
            .option("slot", "slot1")
            .option("publication", "pub1")
            .load()
        )
        got: list = []
        q = (
            df.writeStream.foreachBatch(
                lambda b, _id: got.extend((r["lsn"], bytes(r["payload"])) for r in b.collect())
            )
            .option("checkpointLocation", str(tmp_path / "pck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        assert [lsn for lsn, _ in got] == [lsn for lsn, _ in SCRIPT]
        # the stream reported the checkpoint-committed flush position,
        # never past the data it had not yet committed
        assert srv.flushed_lsn <= LAST_LSN

        # planning (r7 full reader): one IDENTIFY_SYSTEM probe defines the
        # WAL slice; exactly one executor task per batch (one walsender
        # stream per slot is the protocol's parallelism limit), and an
        # empty range plans no task
        from verified_sources_spark.streaming.datasources import (
            _PgCdcStreamReader,
        )

        rdr = _PgCdcStreamReader(
            {"host": host, "port": port, "database": "testdb",
             "user": "repl", "slot": "slot1", "publication": "pub1"}
        )
        assert rdr.latestOffset() == {"lsn": LAST_LSN}
        parts = rdr.partitions({"lsn": 0}, {"lsn": LAST_LSN})
        assert len(parts) == 1 and (parts[0].start, parts[0].end) == (0, LAST_LSN)
        assert rdr.partitions({"lsn": LAST_LSN}, {"lsn": LAST_LSN}) == []
    finally:
        srv.shutdown()
        srv.server_close()


def test_pg_cdc_boundary_lsn_frames_all_land_in_lower_batch(monkeypatch):
    """Two XLogData frames sharing one wal_start at the slice boundary:
    the lower batch delivers BOTH (break only on wal_start > end), and
    the next batch's <= start skip is the exact complement — no frame is
    yielded twice or lost (r7 advisor finding: breaking at >= end
    dropped the second boundary frame silently)."""
    import test_pg_wire as tpw

    from verified_sources_spark.streaming.datasources import (
        _PgCdcStreamReader,
        _PgWalSlice,
    )

    script = [(100, b"a"), (110, b"b"), (110, b"c"), (120, b"d")]
    monkeypatch.setattr(tpw, "SCRIPT", script)
    monkeypatch.setattr(tpw, "LAST_LSN", 120)
    srv = tpw._Server()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        host, port = srv.server_address
        rdr = _PgCdcStreamReader(
            {"host": host, "port": port, "database": "testdb",
             "user": "repl", "slot": "slot1", "publication": "pub1"}
        )

        def slice_(lo, hi):
            return list(
                rdr.read(
                    _PgWalSlice(
                        host, port, "testdb", "repl", "slot1", "pub1", lo, hi
                    )
                )
            )

        assert slice_(0, 110) == [(100, b"a"), (110, b"b"), (110, b"c")]
        assert slice_(110, 120) == [(120, b"d")]
    finally:
        srv.shutdown()
        srv.server_close()


# --------------------------------------------------------------- manifest


def test_manifest_datasource_reads_and_prunes(registered, tmp_path):
    import pyspark.sql.functions as F

    from verified_sources_spark.operators.table_format import ManifestTable
    from verified_sources_spark.streaming.datasources import (
        EqualTo,
        _ManifestReader,
    )

    spark = registered
    t = ManifestTable(spark, str(tmp_path / "mt"), partition_by=["day"])
    t.append(
        spark.createDataFrame(
            [("2024-01-01", i, f"v{i}") for i in range(5)]
            + [("2024-01-02", 10 + i, f"w{i}") for i in range(5)],
            "day string, k long, v string",
        )
    )

    df = spark.read.format("manifest").load(str(tmp_path / "mt"))
    assert set(df.columns) == {"day", "k", "v"}
    # the source honors the COMMITTED schema (day string); the native
    # read lets hive partition inference type day as DATE — cast to
    # compare values
    native = {
        tuple(r)
        for r in t.read().select(F.col("day").cast("string"), "k", "v").collect()
    }
    assert {tuple(r) for r in df.select("day", "k", "v").collect()} == native

    # filters stay EXACT through the source (Spark re-applies them)
    sel = df.where((F.col("day") == "2024-01-02") & (F.col("k") >= 13))
    assert {tuple(r) for r in sel.select("k").collect()} == {(13,), (14,)}

    # and the pushed filter actually PRUNES files at the manifest level
    rdr = _ManifestReader({"path": str(tmp_path / "mt")}, t.read().schema)
    total = len(rdr.partitions())
    rdr2 = _ManifestReader({"path": str(tmp_path / "mt")}, t.read().schema)
    rdr2.pushFilters([EqualTo(("day",), "2024-01-02")])
    pruned = len(rdr2.partitions())
    assert 0 < pruned < total


def test_manifest_datasource_sql_surface(registered, tmp_path):
    """Pure-SQL access to a ManifestTable through the data source.

    (CREATE TABLE ... USING a Python data source drops the OPTIONS on
    the catalog read path in this Spark build — the registered-view form
    is the supported SQL surface, with the same pushFilters pruning.)"""
    from verified_sources_spark.operators.table_format import ManifestTable

    spark = registered
    path = str(tmp_path / "sqlmt")
    t = ManifestTable(spark, path)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    spark.read.format("manifest").load(path).createOrReplaceTempView("mt_sql")
    try:
        got = {tuple(r) for r in spark.sql(
            "SELECT k, v FROM mt_sql WHERE k = 2").collect()}
        assert got == {(2, "b")}
        # the scan is the python source (BatchScan manifest), with the
        # residual filter re-applied above it
        plan = spark.sql(
            "SELECT k FROM mt_sql WHERE k = 2"
        )._jdf.queryExecution().executedPlan().toString()
        assert "BatchScan manifest" in plan
    finally:
        spark.catalog.dropTempView("mt_sql")


def test_kafka_wire_readstream_sasl(registered, tmp_path):
    """SASL options flow through to every broker connection the source
    opens (driver offset probes AND executor fetch tasks) — against the
    fake broker with SASL enforcement on."""
    from test_kafka_wire import _Broker

    spark = registered
    srv = _Broker()
    srv.sasl_creds = ("svc", "hunter2")
    srv.load("events", 0, 0, [(b"a", b"ev-a", [])])
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        host, port = srv.server_address
        df = (
            spark.readStream.format("kafka_wire")
            .option("host", host)
            .option("port", port)
            .option("topic", "events")
            .option("sasl_username", "svc")
            .option("sasl_password", "hunter2")
            .load()
        )
        got: list = []
        _run_available_now(spark, df, str(tmp_path / "sck"), got)
        assert got == [(0, 0, "a")]
        # and the broker actually saw SASL traffic (handshake api 17)
        assert any(api == 17 for api, _, _ in srv.seen)
    finally:
        srv.shutdown()
        srv.server_close()


def test_delta_cdf_readstream(registered, tmp_path):
    """The change feed as a STREAM: commit versions are the checkpointed
    offset, each restart picks up only commits made since, DV'd adds
    mask their deleted rows, and cdc-action commits are exclusive."""
    import json as _json
    import os

    from verified_sources_spark.operators.deletion_vectors import (
        inline_descriptor,
    )
    from verified_sources_spark.operators.delta_interop import (
        export_manifest_as_delta,
    )
    from verified_sources_spark.operators.table_format import ManifestTable

    spark = registered
    t = ManifestTable(spark, str(tmp_path / "cdfstream"))
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))
    export_manifest_as_delta(t)

    df = (
        spark.readStream.format("delta_cdf")
        .option("path", t.path)
        .load()
    )
    assert df.schema.fieldNames()[-2:] == ["_change_type", "_commit_version"]
    ckpt = str(tmp_path / "cdfck")
    got: list = []

    def run():
        q = (
            df.writeStream.foreachBatch(
                lambda b, _id: got.extend(
                    (r.k, r.v, r._change_type, r._commit_version)
                    for r in b.collect()
                )
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)

    run()
    assert sorted(got) == [(1, "a", "insert", 0), (2, "b", "insert", 0)]

    # next commit: replace → removes + add; restart reads ONLY commit 1
    t.replace(spark.createDataFrame([(3, "c")], "k long, v string"))
    export_manifest_as_delta(t)
    got.clear()
    run()
    assert sorted(got) == [
        (1, "a", "delete", 1), (2, "b", "delete", 1), (3, "c", "insert", 1),
    ]

    # commit 2: hand-written add WITH a deletion vector masking row 0 of
    # a two-row file — only the surviving row streams as an insert
    stage = str(tmp_path / "dvstage")
    spark.createDataFrame([(7, "x"), (8, "y")], "k long, v string") \
        .coalesce(1).write.mode("overwrite").parquet(stage)
    part = next(f for f in os.listdir(stage) if f.endswith(".parquet"))
    os.makedirs(os.path.join(t.path, "dv"), exist_ok=True)
    os.replace(os.path.join(stage, part), os.path.join(t.path, "dv", "f.parquet"))
    with open(os.path.join(t.path, "_delta_log", f"{2:020d}.json"), "w") as f:
        f.write(_json.dumps({"add": {
            "path": "dv/f.parquet", "partitionValues": {}, "size": 1,
            "modificationTime": 0, "dataChange": True,
            "deletionVector": inline_descriptor([0]),
        }}))
    got.clear()
    run()
    assert got == [(8, "y", "insert", 2)]


def test_kinesis_wire_readstream_sigv4(registered, tmp_path):
    """SigV4 credentials flow through the source options; the fake
    endpoint verifies signatures AWS-style (recompute + compare) and
    rejects unsigned requests."""
    from test_kinesis_wire import _Endpoint, _url

    spark = registered
    srv = _Endpoint()
    srv.sigv4_creds = ("AKTEST", "s3cr3t", "eu-west-1")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        df = (
            spark.readStream.format("kinesis_wire")
            .option("endpoint", _url(srv))
            .option("stream", "events")
            .option("aws_access_key", "AKTEST")
            .option("aws_secret_key", "s3cr3t")
            .option("region", "eu-west-1")
            .load()
        )
        got: list = []
        q = (
            df.writeStream.foreachBatch(
                lambda b, _id: got.extend(bytes(r["data"]) for r in b.collect())
            )
            .option("checkpointLocation", str(tmp_path / "sigck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        assert len(got) == 5 and b"p0-a" in got
    finally:
        srv.shutdown()
        srv.server_close()


def test_manifest_readstream_tails_appends(registered, tmp_path):
    """readStream.format('manifest'): manifest versions are the offset —
    each restart reads exactly the files appended since; a
    replace/merge version refuses by default and passes with
    ignoreChanges (new files only), Delta's contract."""
    from verified_sources_spark.operators.table_format import ManifestTable

    spark = registered
    t = ManifestTable(spark, str(tmp_path / "mst"))
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string"))

    df = spark.readStream.format("manifest").option("path", t.path).load()
    ckpt = str(tmp_path / "msck")
    got: list = []

    def run(stream_df, cp):
        q = (
            stream_df.writeStream.foreachBatch(
                lambda b, _id: got.extend((r.k, r.v) for r in b.collect())
            )
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        return q

    run(df, ckpt)
    assert sorted(got) == [(1, "a"), (2, "b")]

    # append-only increment: only the new rows stream
    t.append(spark.createDataFrame([(3, "c")], "k long, v string"))
    got.clear()
    run(df, ckpt)
    assert got == [(3, "c")]

    # a REPLACE drops files: the stream must fail loudly...
    t.replace(spark.createDataFrame([(9, "z")], "k long, v string"))
    got.clear()
    q = (
        df.writeStream.foreachBatch(lambda b, _id: None)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="append-only|REMOVED"):
        q.awaitTermination(60)
        if q.exception() is not None:
            raise q.exception()
    # ...and pass with ignoreChanges=true (new files only)
    df_ic = (
        spark.readStream.format("manifest")
        .option("path", t.path)
        .option("ignoreChanges", "true")
        .load()
    )
    got.clear()
    run(df_ic, ckpt)
    assert got == [(9, "z")]
