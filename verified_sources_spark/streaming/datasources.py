"""Spark Python Data Source API adapters (Spark 4+).

Packages the engine's wire clients and table format as REAL Spark data
sources, so users drive them through ``spark.readStream.format(...)``
/ ``spark.read.format(...)`` instead of engine helper functions:

- ``kafka_wire``   streaming source over sources/kafka_wire.py — full
  ``DataSourceStreamReader``: offsets live in SPARK CHECKPOINTS (one
  JSON dict of per-partition next-offsets), and each Kafka partition
  becomes one executor task that fetches its ``[start, end)`` slice
  directly from the broker.  This replaces the OffsetTracker control
  table for offset storage, matching the reference consumer's
  snapshot-then-drain loop (reference sources/kafka/__init__.py:104-134)
  under ``Trigger.AvailableNow``.
- ``kinesis_wire`` streaming source over sources/kinesis_wire.py — full
  ``DataSourceStreamReader``: ONE EXECUTOR TASK PER SHARD reading its
  ``AFTER_SEQUENCE_NUMBER(start) .. end`` slice; the driver probes tip
  sequences per batch (Kinesis has no cheap log-end API — see the
  reader docstring for the trade).
- ``pg_cdc``       streaming source over sources/pg_wire.py — full
  ``DataSourceStreamReader``: the driver probes the WAL tip with one
  IDENTIFY_SYSTEM round-trip, one executor task drains the slot's
  ``(start, end]`` LSN slice (one stream per slot is the protocol's
  parallelism limit).  The replication slot is confirmed only up to the
  START offset of each read (data already committed to the Spark
  checkpoint), so the slot trails by one batch and a crash never loses
  WAL — the same deferred-confirm contract the engine's CDC pipeline
  uses.
- ``manifest``     batch source over operators/table_format.py —
  ``spark.read.format("manifest").load(path)`` with manifest-level FILE
  SKIPPING driven by Spark's pushed filters (``pushFilters``): pruning
  uses the per-file min/max + partition values already recorded in the
  manifest, filters are returned to Spark un-absorbed so results stay
  exact.

Register everything with :func:`register_all`.

Scale note: every streaming reader now moves record bytes
EXECUTOR-side (kafka/kinesis per-partition/per-shard tasks, pg_cdc one
task per batch); driver work per batch is offset probing only.  The
manifest reader yields Arrow record batches per file.  For the
large-fact scan path prefer ``ManifestTable.read``/``scan`` (native
parquet scan); the data source exists for SQL-surface access and
engine-tracked pushdown.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
import pyspark.sql.types as T


# ------------------------------------------------------------- kafka_wire

KAFKA_SCHEMA = (
    "topic string, partition int, offset long, ts long, key string, "
    "value binary, headers map<string,binary>"
)


@dataclass
class _KafkaSlice(InputPartition):
    host: str
    port: int
    topic: str
    pid: int
    start: int
    end: int
    tls: bool = False
    sasl: tuple | None = None


def _kafka_client(host, port, tls, sasl):
    """Connect + authenticate per the source options.  ``sasl`` is
    (mechanism, username, password) or None; ``tls`` a bool."""
    from verified_sources_spark.sources.kafka_wire import KafkaWireClient

    c = KafkaWireClient(host, port, tls=tls)
    if sasl is not None:
        mech, user, pw = sasl
        c.sasl_authenticate(user, pw, mechanism=mech)
    return c


class _KafkaWireStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.host = options.get("host", "127.0.0.1")
        self.port = int(options.get("port", 9092))
        self.topic = options["topic"]
        self.starting = options.get("startingoffsets", "earliest").lower()
        self.tls = str(options.get("tls", "false")).lower() == "true"
        user = options.get("sasl_username")
        self.sasl = (
            None
            if user is None
            else (
                options.get("sasl_mechanism", "SCRAM-SHA-256"),
                user,
                options.get("sasl_password", ""),
            )
        )

    def _offsets(self, which: int) -> dict:
        with _kafka_client(self.host, self.port, self.tls, self.sasl) as c:
            pids = c.metadata([self.topic])["topics"].get(self.topic, [])
            got = c.list_offsets(self.topic, pids, which)
        return {str(p): int(o) for p, o in got.items()}

    def initialOffset(self) -> dict:
        from verified_sources_spark.sources.kafka_wire import EARLIEST_TS, LATEST_TS

        return self._offsets(LATEST_TS if self.starting == "latest" else EARLIEST_TS)

    def latestOffset(self) -> dict:
        from verified_sources_spark.sources.kafka_wire import LATEST_TS

        return self._offsets(LATEST_TS)

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        out = []
        for pid, hi in end.items():
            lo = int(start.get(pid, 0))  # new partition: from its beginning
            if int(hi) > lo:
                out.append(
                    _KafkaSlice(
                        self.host, self.port, self.topic, int(pid), lo, int(hi),
                        self.tls, self.sasl,
                    )
                )
        return out

    def read(self, part: _KafkaSlice) -> Iterator[tuple]:
        # executor-side: fetch exactly [start, end) from the broker
        with _kafka_client(part.host, part.port, part.tls, part.sasl) as c:
            pos = part.start
            while pos < part.end:
                recs, _hw = c.fetch(part.topic, part.pid, pos)
                if not recs:
                    # end came from latestOffset() at planning time, so
                    # records below it existed then; an empty fetch here
                    # means the log was truncated underneath the
                    # checkpoint — raise instead of silently
                    # under-delivering the committed [start, end) range
                    raise RuntimeError(
                        f"kafka {part.topic}[{part.pid}]: empty fetch at "
                        f"offset {pos} with checkpointed end {part.end} — "
                        "log truncated past the checkpoint?"
                    )
                in_range = [r for r in recs if r.offset < part.end]
                if not in_range:
                    # records exist but all at/past end: the remainder of
                    # the range was compaction-collapsed — legitimately
                    # empty, not lost
                    break
                for r in in_range:
                    yield (
                        r.topic,
                        r.partition,
                        r.offset,
                        r.timestamp_ms,
                        # keys are not contractually UTF-8 — replace,
                        # don't fail the task
                        r.key.decode(errors="replace")
                        if r.key is not None
                        else None,
                        r.value,
                        {k: v for k, v in r.headers},
                    )
                pos = max(r.offset for r in in_range) + 1

    def commit(self, end: dict) -> None:
        # offsets live in the Spark checkpoint — nothing to persist here
        pass

    def stop(self) -> None:
        pass


class KafkaWireDataSource(DataSource):
    """``spark.readStream.format("kafka_wire").option("host", h)
    .option("port", p).option("topic", t)``."""

    @classmethod
    def name(cls) -> str:
        return "kafka_wire"

    def schema(self) -> str:
        return KAFKA_SCHEMA

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _KafkaWireStreamReader(self.options)


# ----------------------------------------------------------- kinesis_wire

KINESIS_SCHEMA = (
    "shard_id string, sequence_number string, partition_key string, "
    "data binary, arrival_ts double"
)


@dataclass
class _KinesisShardSlice(InputPartition):
    endpoint: str
    stream: str
    shard_id: str
    start: str | None  # resume AFTER this sequence; None = TRIM_HORIZON
    end: str           # inclusive positional cut
    creds: tuple | None = None


def _kinesis_signer(endpoint: str, creds: tuple | None):
    if creds is None:
        return None
    from verified_sources_spark.sources.sigv4 import sigv4_signer

    ak, sk, region, tok = creds
    return sigv4_signer(
        endpoint, ak, sk, region, service="kinesis", session_token=tok
    )


class _KinesisWireStreamReader(DataSourceStreamReader):
    """Full stream reader (r7, upgraded from SimpleDataSourceStreamReader):
    ONE EXECUTOR TASK PER SHARD, each fetching its
    ``AFTER_SEQUENCE_NUMBER(start) .. end`` slice directly from the
    service — shard-parallel throughput like the reference's per-shard
    iterators (reference: sources/kinesis/__init__.py:75-130), with the
    per-shard sequence offsets in the Spark checkpoint.

    Kinesis exposes no tip-sequence probe, so ``latestOffset`` discovers
    each shard's current last sequence by draining record metadata on
    the driver — those bytes transit twice (probe + executor slice).
    That is the price of DETERMINISTIC replay ranges, and it is BOUNDED:
    ``.option("maxRecordsPerBatch", n)`` caps the probe at n records per
    shard per micro-batch (the offset then advances incrementally, like
    Kafka's ``maxOffsetsPerTrigger``), so a backlogged 100 TB stream
    costs O(cap) driver bandwidth per batch, never O(backlog).  For
    sustained high volume, the landing-first recipe (producer →
    manifest-table landing zone → batch reads) remains the preferred
    pattern — see streaming/bounded.py."""

    def __init__(self, options):
        self.endpoint = options["endpoint"]
        self.stream = options["stream"]
        self.creds = None
        if options.get("aws_access_key") is not None:
            self.creds = (
                options["aws_access_key"],
                options.get("aws_secret_key", ""),
                options.get("region", "us-east-1"),
                options.get("session_token"),
            )
        raw_cap = options.get("maxRecordsPerBatch") or options.get(
            "max_records_per_batch"
        )
        self.max_records = int(raw_cap) if raw_cap else None
        if self.max_records is not None and self.max_records <= 0:
            # "0" is truthy as a string: without this guard fetch_stream's
            # limit goes <=0, every probe breaks before reading, and the
            # stream stalls forever with no error
            raise ValueError(
                f"maxRecordsPerBatch must be positive, got {self.max_records}"
            )
        # last probed tip per shard; after a restart the first probe
        # re-walks retained records from the horizon (metadata-sized
        # state, data-sized network) — partitions() still slices exactly
        self._probe: dict[str, str] | None = None

    def initialOffset(self) -> dict:
        return {"seq": {}}

    def latestOffset(self) -> dict:
        from verified_sources_spark.sources.kinesis_wire import fetch_stream

        _rows, state = fetch_stream(
            self.endpoint,
            self.stream,
            dict(self._probe or {}),
            sign=_kinesis_signer(self.endpoint, self.creds),
            max_records_per_shard=self.max_records,
        )
        self._probe = state
        return {"seq": state}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo = start.get("seq") or {}
        hi = end.get("seq") or {}
        return [
            _KinesisShardSlice(
                self.endpoint, self.stream, sid, lo.get(sid), hi_seq, self.creds
            )
            for sid, hi_seq in sorted(hi.items())
            if lo.get(sid) != hi_seq
        ]

    def read(self, part: _KinesisShardSlice) -> Iterator[tuple]:
        import base64

        from verified_sources_spark.sources.kinesis_wire import KinesisClient

        client = KinesisClient(
            part.endpoint, sign=_kinesis_signer(part.endpoint, part.creds)
        )
        params = (
            {
                "ShardIteratorType": "AFTER_SEQUENCE_NUMBER",
                "StartingSequenceNumber": part.start,
            }
            if part.start
            else {"ShardIteratorType": "TRIM_HORIZON"}
        )
        it = client.get_shard_iterator(part.stream, part.shard_id, params)
        done = False
        while it and not done:
            out = client.get_records(it)
            recs = out.get("Records", [])
            for rec in recs:
                yield (
                    part.shard_id,
                    rec["SequenceNumber"],
                    rec.get("PartitionKey"),
                    base64.b64decode(rec["Data"]),
                    None
                    if rec.get("ApproximateArrivalTimestamp") is None
                    else float(rec["ApproximateArrivalTimestamp"]),
                )
                if rec["SequenceNumber"] == part.end:
                    done = True
                    break
            it = out.get("NextShardIterator")
            if not done and not recs and out.get("MillisBehindLatest", 0) == 0:
                break  # tip reached without the bound — fall through to raise
        if not done:
            # the checkpointed end sequence existed at planning time; not
            # reaching it means retention expired (or the shard closed)
            # underneath the checkpoint — surface, don't under-deliver
            raise RuntimeError(
                f"kinesis {part.stream}/{part.shard_id}: slice "
                f"({part.start}, {part.end}] could not be served — records "
                "expired past the checkpoint?"
            )

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass


class KinesisWireDataSource(DataSource):
    """``spark.readStream.format("kinesis_wire").option("endpoint", url)
    .option("stream", name)`` — one executor task per shard."""

    @classmethod
    def name(cls) -> str:
        return "kinesis_wire"

    def schema(self) -> str:
        return KINESIS_SCHEMA

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _KinesisWireStreamReader(self.options)


# ---------------------------------------------------------------- pg_cdc

PG_CDC_SCHEMA = "lsn long, payload binary"


@dataclass
class _PgWalSlice(InputPartition):
    host: str
    port: int
    database: str
    user: str
    slot: str
    publication: str
    start: int  # frames with wal_start <= start are already consumed
    end: int    # inclusive upper bound


class _PgCdcStreamReader(DataSourceStreamReader):
    """Full stream reader (r7, upgraded from SimpleDataSourceStreamReader):
    the driver probes the server's current WAL position with ONE cheap
    ``IDENTIFY_SYSTEM`` round-trip per batch (no data moves at planning
    time), and ONE EXECUTOR TASK drains the slot's ``(start, end]`` LSN
    slice — the walsender protocol allows a single stream per slot, so
    one task is the protocol's own parallelism limit, but the heavy
    decode+transfer now happens executor-side instead of on the driver.

    The slot is confirmed only up to each slice's START (data already in
    the Spark checkpoint) — the slot trails by one batch and a crash
    replays, never loses (the engine's deferred-confirm contract)."""

    def __init__(self, options):
        self.host = options.get("host", "127.0.0.1")
        self.port = int(options.get("port", 5432))
        self.database = options["database"]
        self.user = options["user"]
        self.slot = options["slot"]
        self.publication = options["publication"]

    def initialOffset(self) -> dict:
        return {"lsn": 0}

    def latestOffset(self) -> dict:
        from verified_sources_spark.sources.pg_wire import (
            WalsenderClient,
            parse_lsn,
        )

        with WalsenderClient(self.host, self.port, self.database, self.user) as c:
            pos = c.identify_system()["xlogpos"]
        return {"lsn": parse_lsn(pos)}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        lo, hi = int(start.get("lsn") or 0), int(end.get("lsn") or 0)
        if hi <= lo:
            return []
        return [
            _PgWalSlice(
                self.host, self.port, self.database, self.user,
                self.slot, self.publication, lo, hi,
            )
        ]

    def read(self, part: _PgWalSlice) -> Iterator[tuple]:
        from verified_sources_spark.sources.pg_wire import WalsenderClient

        with WalsenderClient(
            part.host, part.port, part.database, part.user
        ) as c:
            # keepalive replies report start as flushed: the slot
            # advances to exactly what the checkpoint has committed
            c.flushed_lsn = part.start
            for msg in c.start_replication(
                part.slot, part.publication, start_lsn=part.start
            ):
                # slice (start, end] — the ONLY break is on the first
                # frame strictly past end, so multiple frames sharing
                # the boundary LSN (or wal_start 0 against the initial
                # lsn=0 offset) all land in the lower batch, and the
                # next batch's `<= start` skip is its exact complement.
                # Breaking at >= end would drop the second of two frames
                # at the same wal_start.  Bounded walsenders (fakes,
                # endpos streams) end the copy instead, which also
                # terminates the iterator.
                if msg.wal_start <= part.start:
                    continue  # the server re-sends the resume-point frame
                if msg.wal_start > part.end:
                    break  # next batch's data
                yield (msg.wal_start, msg.payload)

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass


class PgCdcDataSource(DataSource):
    """``spark.readStream.format("pg_cdc").option("database", db)
    .option("user", u).option("slot", s).option("publication", p)``.
    Rows are raw (lsn, payload) frames — decode with
    sources/pg_decoders.py operators downstream."""

    @classmethod
    def name(cls) -> str:
        return "pg_cdc"

    def schema(self) -> str:
        return PG_CDC_SCHEMA

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _PgCdcStreamReader(self.options)


# --------------------------------------------------------------- manifest

_HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"


def _local_path(p: str) -> str:
    """SQL surfaces hand the option in URI form (``file:/x`` /
    ``file:///x``) — collapse to the plain path LocalFS expects."""
    if p.startswith("file:"):
        rest = p[len("file:") :]
        return "/" + rest.lstrip("/")
    return p


@dataclass
class _ManifestFile(InputPartition):
    file_path: str
    partition: dict
    table_path: str | None = None
    dv: dict | None = None  # deletion-vector descriptor (row-level deletes)


def _filter_to_tuple(f: Filter):
    """Spark pushed Filter → the (col, op, value) shape
    ManifestTable.candidate_entries understands; None if untranslatable
    (nested column, unsupported op)."""
    attr = getattr(f, "attribute", None)
    if attr is None or len(attr) != 1:
        return None
    col = attr[0]
    if isinstance(f, EqualTo):
        return (col, "=", f.value)
    if isinstance(f, GreaterThan):
        return (col, ">", f.value)
    if isinstance(f, GreaterThanOrEqual):
        return (col, ">=", f.value)
    if isinstance(f, LessThan):
        return (col, "<", f.value)
    if isinstance(f, LessThanOrEqual):
        return (col, "<=", f.value)
    if isinstance(f, In):
        return (col, "in", list(f.value))
    return None


class _ManifestReader(DataSourceReader):
    def __init__(self, options, schema: T.StructType):
        self.path = _local_path(options["path"])
        self.version = (
            int(options["version"]) if options.get("version") is not None else None
        )
        self.schema = schema
        self._filters: list[tuple] = []

    def _table(self):
        from verified_sources_spark.operators.fs import LocalFS
        from verified_sources_spark.operators.table_format import ManifestTable

        # driver-side metadata only (manifest JSON reads) — no Spark
        # session is available inside a data source instance
        return ManifestTable(None, self.path, fs=LocalFS())

    def pushFilters(self, filters: list[Filter]):
        for f in filters:
            t = _filter_to_tuple(f)
            if t is not None:
                self._filters.append(t)
        # file skipping is pruning, not exact evaluation: give every
        # filter back so Spark still applies the residual predicate
        return filters

    def partitions(self) -> Sequence[InputPartition]:
        t = self._table()
        if self._filters:
            entries = t.candidate_entries(self._filters, self.version)
        else:
            v = t.latest_version() if self.version is None else self.version
            if v is None:
                raise FileNotFoundError(f"no committed version in {self.path}")
            entries = t._manifest(v)["files"]
        return [
            _ManifestFile(
                f"{self.path}/{e['path']}", dict(e.get("partition") or {}),
                self.path, e.get("dv"),
            )
            for e in entries
        ]

    def read(self, part: _ManifestFile):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_type

        tbl = pq.read_table(part.file_path)
        if part.dv is not None:
            from verified_sources_spark.operators.deletion_vectors import (
                dv_row_indexes,
            )

            deleted = set(dv_row_indexes(part.table_path or self.path, part.dv))
            tbl = tbl.take([i for i in range(tbl.num_rows) if i not in deleted])
        n = tbl.num_rows
        cols, names = [], []
        for f in self.schema.fields:
            names.append(f.name)
            target = to_arrow_type(f.dataType)
            if f.name in tbl.column_names:
                cols.append(tbl[f.name].combine_chunks().cast(target))
            elif f.name in part.partition:
                raw = part.partition[f.name]
                if raw is None or raw == _HIVE_NULL:
                    cols.append(pa.nulls(n, type=target))
                else:
                    cols.append(pa.array([str(raw)] * n, type=pa.string()).cast(target))
            else:
                cols.append(pa.nulls(n, type=target))
        out = pa.table(dict(zip(names, cols)))
        yield from out.to_batches()


class _ManifestStreamReader(DataSourceStreamReader):
    """ManifestTable as a STREAM — the table-as-a-stream surface Delta
    users get from ``readStream.table(...)``: the checkpointed offset is
    the manifest VERSION, each micro-batch reads exactly the FILES ADDED
    by the versions landed since (file-set diff against the previous
    manifest — data files are immutable, so a path appearing in v but
    not v-1 is precisely v's new data).

    Non-append versions (replace/merge drop files) break stream
    semantics: refused by default — updated rows would re-emit with no
    retraction — or passed through as their NEW files only with
    ``ignorechanges=true``, exactly Delta's ignoreChanges contract."""

    def __init__(self, options, schema):
        self.path = _local_path(options["path"]).rstrip("/")
        self.starting = int(options.get("startingversion", 0))
        self.ignore_changes = (
            str(options.get("ignorechanges", "false")).lower() == "true"
        )
        self.schema = schema

    def _table(self):
        from verified_sources_spark.operators.fs import LocalFS
        from verified_sources_spark.operators.table_format import ManifestTable

        return ManifestTable(None, self.path, fs=LocalFS())

    def initialOffset(self) -> dict:
        return {"version": self.starting}

    def latestOffset(self) -> dict:
        latest = self._table().latest_version()
        return {"version": latest if latest is not None else self.starting}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        t = self._table()
        lo, hi = int(start["version"]), int(end["version"])
        out: list[_ManifestFile] = []

        def sig(e):  # identity incl. deletion vector: a widened DV is a
            # row-level CHANGE, not an append
            return json.dumps(e.get("dv"), sort_keys=True)

        prev = (
            {e["path"]: sig(e) for e in t._manifest(lo)["files"]}
            if lo >= 1
            else {}
        )
        for v in range(lo + 1, hi + 1):
            entries = t._manifest(v)["files"]
            cur = {e["path"]: sig(e) for e in entries}
            removed = set(prev) - set(cur)
            dv_changed = {
                p for p in set(prev) & set(cur) if prev[p] != cur[p]
            }
            if (removed or dv_changed) and not self.ignore_changes:
                raise ValueError(
                    f"manifest version {v} removed files or widened "
                    "deletion vectors (replace/merge/delete) — not an "
                    "append-only stream; restart from a fresh checkpoint "
                    "or set ignoreChanges=true to emit only the new files"
                )
            for e in entries:
                if e["path"] not in prev:
                    out.append(
                        _ManifestFile(
                            f"{self.path}/{e['path']}",
                            dict(e.get("partition") or {}),
                            self.path,
                            e.get("dv"),
                        )
                    )
            prev = cur
        return out

    def read(self, part: _ManifestFile):
        # same arrow per-file read as the batch reader
        rdr = _ManifestReader({"path": self.path}, self.schema)
        yield from rdr.read(part)

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass


class ManifestDataSource(DataSource):
    """``spark.read.format("manifest").load(path)`` — batch reads of the
    engine's transactional ManifestTable with manifest-stat file
    skipping driven by Spark's pushed-down filters; ``readStream`` on
    the same format tails the table's append-only versions with the
    manifest version as the checkpointed offset."""

    @classmethod
    def name(cls) -> str:
        return "manifest"

    def schema(self):
        opts = self.options
        from verified_sources_spark.operators.fs import LocalFS
        from verified_sources_spark.operators.table_format import ManifestTable

        path = _local_path(opts["path"])
        t = ManifestTable(None, path, fs=LocalFS())
        v = (
            int(opts["version"])
            if opts.get("version") is not None
            else t.latest_version()
        )
        if v is None:
            raise FileNotFoundError(f"no committed version in {path}")
        schema_json = t._manifest(v).get("schema")
        if not schema_json:
            raise FileNotFoundError(f"manifest v{v} records no schema")
        return T.StructType.fromJson(json.loads(schema_json))

    def reader(self, schema) -> DataSourceReader:
        return _ManifestReader(self.options, schema)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _ManifestStreamReader(self.options, schema)


def register_all(spark) -> None:
    """Register every engine data source on *spark* (idempotent)."""
    # the manifest reader's pushFilters() requires the engine-side opt-in
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    for cls in (
        KafkaWireDataSource,
        KinesisWireDataSource,
        PgCdcDataSource,
        ManifestDataSource,
        DeltaCdfDataSource,
    ):
        spark.dataSource.register(cls)


# -------------------------------------------------------------- delta_cdf


@dataclass
class _CdfSlice(InputPartition):
    table_path: str
    file_path: str
    version: int
    change_type: str | None  # None = embedded _change_type column
    partition: dict
    dv: dict | None = None


def _delta_log_versions(log_dir: str) -> list[int]:
    import os

    if not os.path.isdir(log_dir):
        return []
    out = []
    for n in os.listdir(log_dir):
        if n.endswith(".json") and n[:-5].isdigit():
            out.append(int(n[:-5]))
    return sorted(out)


def _delta_meta_from_log(path: str) -> dict:
    """Latest metaData action via plain file IO (data source instances
    have no SparkSession — and need none for log metadata)."""
    import os

    log = f"{path}/_delta_log"
    meta = None
    for v in _delta_log_versions(log):
        with open(os.path.join(log, f"{v:020d}.json")) as f:
            for line in f:
                if line.strip():
                    a = json.loads(line)
                    if "metaData" in a:
                        meta = a["metaData"]
    if meta is None:
        raise FileNotFoundError(f"no metaData action under {log}")
    return meta


class _DeltaCdfStreamReader(DataSourceStreamReader):
    """Change-feed stream over a Delta log: the offset is the COMMIT
    VERSION (checkpointed by Spark), each micro-batch covers the commits
    in (start, end], and every change/add/remove file becomes one
    executor task read with pyarrow.  Same per-commit semantics as
    operators.delta_interop.read_delta_changes (cdc actions exclusive
    when present; dataChange adds = inserts, dataChange removes =
    deletes), plus deletion-vector masking on DV'd adds."""

    def __init__(self, options, schema):
        self.path = _local_path(options["path"]).rstrip("/")
        self.starting = int(options.get("startingversion", 0))
        meta = _delta_meta_from_log(self.path)
        mode = (meta.get("configuration") or {}).get(
            "delta.columnMapping.mode", "none"
        )
        if mode != "none":
            raise ValueError(
                f"delta_cdf over column-mapping mode {mode!r} not implemented"
            )
        self.meta = meta
        self.part_cols = list(meta.get("partitionColumns") or [])
        self.schema = schema

    def initialOffset(self) -> dict:
        return {"version": self.starting - 1}

    def latestOffset(self) -> dict:
        vs = _delta_log_versions(f"{self.path}/_delta_log")
        return {"version": vs[-1] if vs else self.starting - 1}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        import os
        from urllib.parse import unquote

        lo, hi = int(start["version"]), int(end["version"])
        out: list[_CdfSlice] = []
        for v in range(lo + 1, hi + 1):
            p = os.path.join(self.path, "_delta_log", f"{v:020d}.json")
            if not os.path.exists(p):
                raise FileNotFoundError(
                    f"commit {v} missing from the log — CDF over a gap "
                    "would silently drop changes"
                )
            with open(p) as f:
                actions = [json.loads(ln) for ln in f if ln.strip()]
            cdcs = [a["cdc"] for a in actions if "cdc" in a]

            def full(rel):
                rel = unquote(rel)
                return rel if "://" in rel or rel.startswith("/") else (
                    f"{self.path}/{rel}"
                )

            if cdcs:
                for c in cdcs:
                    out.append(_CdfSlice(
                        self.path, full(c["path"]), v, None,
                        dict(c.get("partitionValues") or {}),
                    ))
                continue
            for a in actions:
                if "add" in a and a["add"].get("dataChange"):
                    ad = a["add"]
                    out.append(_CdfSlice(
                        self.path, full(ad["path"]), v, "insert",
                        dict(ad.get("partitionValues") or {}),
                        dict(ad["deletionVector"]) if ad.get("deletionVector") else None,
                    ))
                elif "remove" in a and a["remove"].get("dataChange"):
                    rm = a["remove"]
                    if self.part_cols and rm.get("partitionValues") is None:
                        raise ValueError(
                            f"commit {v}: dataChange remove without "
                            "partitionValues on a partitioned table"
                        )
                    out.append(_CdfSlice(
                        self.path, full(rm["path"]), v, "delete",
                        dict(rm.get("partitionValues") or {}),
                        # a remove's DV is the file's PRE-image: those
                        # rows were already deleted in an earlier commit
                        # and must not re-emit as deletes now
                        dict(rm["deletionVector"])
                        if rm.get("deletionVector")
                        else None,
                    ))
        return out

    def read(self, part: _CdfSlice):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from pyspark.sql.pandas.types import to_arrow_type

        tbl = pq.read_table(part.file_path)
        if part.dv is not None:
            from verified_sources_spark.operators.deletion_vectors import (
                dv_row_indexes,
            )

            deleted = set(dv_row_indexes(part.table_path, part.dv))
            keep = [i for i in range(tbl.num_rows) if i not in deleted]
            tbl = tbl.take(keep)
        n = tbl.num_rows
        cols, names = [], []
        for f in self.schema.fields:
            if f.name in ("_change_type", "_commit_version"):
                continue
            names.append(f.name)
            target = to_arrow_type(f.dataType)
            if f.name in part.partition:
                raw = part.partition[f.name]
                if raw is None or raw == _HIVE_NULL:
                    cols.append(pa.nulls(n, type=target))
                else:
                    cols.append(
                        pa.array([str(raw)] * n, type=pa.string()).cast(target)
                    )
            elif f.name in tbl.column_names:
                cols.append(tbl[f.name].combine_chunks().cast(target))
            else:
                cols.append(pa.nulls(n, type=target))
        names.append("_change_type")
        if part.change_type is None:
            cols.append(tbl["_change_type"].combine_chunks().cast(pa.string()))
        else:
            cols.append(pa.array([part.change_type] * n, type=pa.string()))
        names.append("_commit_version")
        cols.append(pa.array([part.version] * n, type=pa.int64()))
        yield from pa.table(dict(zip(names, cols))).to_batches()

    def commit(self, end: dict) -> None:
        pass

    def stop(self) -> None:
        pass


class DeltaCdfDataSource(DataSource):
    """``spark.readStream.format("delta_cdf").option("path", p)
    [.option("startingVersion", n)]`` — the table's change feed as a
    stream with commit-version offsets in the Spark checkpoint."""

    @classmethod
    def name(cls) -> str:
        return "delta_cdf"

    def schema(self):
        path = _local_path(self.options["path"]).rstrip("/")
        meta = _delta_meta_from_log(path)
        base = T.StructType.fromJson(json.loads(meta["schemaString"]))
        return T.StructType(
            list(base.fields)
            + [
                T.StructField("_change_type", T.StringType()),
                T.StructField("_commit_version", T.LongType()),
            ]
        )

    def streamReader(self, schema) -> DataSourceStreamReader:
        return _DeltaCdfStreamReader(self.options, schema)
