"""Destination-parameterized E2E — the reference's signature test
pattern (`@pytest.mark.parametrize("destination_name", ALL_DESTINATIONS)`,
reference tests/utils.py:35-38 with ALL_DESTINATIONS=["duckdb",
"postgres"]): ONE load scenario runs unchanged against every destination
and every destination must agree — with each other AND with the engine's
in-memory merge semantics (the de-facto oracle, like the reference's
assert_load_info / load_table_counts / load_table_distinct_counts /
assert_table_data helpers).

Destinations here: the native ManifestTable format (via Pipeline), the
DuckDB write-back sink, and the PostgreSQL write-back sink against a
real initdb'd cluster (skipped where the server binaries are absent).
Results are compared as text-normalized row sets because the three
clients return different native types (Spark Rows, DuckDB Python
values, PG wire text)."""

from __future__ import annotations

import os
import shutil
import socket
import subprocess
import tempfile

import pytest

ALL_DESTINATIONS = ["manifest", "duckdb", "postgres"]

PG_BIN = "/usr/local/bin"
_HAVE_PG = (
    os.path.exists(f"{PG_BIN}/initdb")
    and shutil.which("runuser") is not None
    and os.geteuid() == 0
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _pg(cmd: list[str]) -> None:
    subprocess.run(
        ["runuser", "-u", "postgres", "--"] + cmd, check=True, capture_output=True
    )


@pytest.fixture(scope="module")
def pg_dsn():
    if not _HAVE_PG:
        yield None
        return
    base = tempfile.mkdtemp(prefix="vss_pgmx_")
    os.chmod(base, 0o777)
    shutil.chown(base, "postgres", "postgres")
    data = os.path.join(base, "data")
    port = _free_port()
    _pg([f"{PG_BIN}/initdb", "-D", data, "-A", "trust", "-U", "pguser"])
    opts = (
        f"-p {port} -c listen_addresses=127.0.0.1 "
        f"-c unix_socket_directories={base} -c fsync=off "
        "-c synchronous_commit=off"
    )
    _pg([
        f"{PG_BIN}/pg_ctl", "-D", data, "-o", opts,
        "-l", os.path.join(base, "log"), "-w", "start",
    ])
    try:
        yield {"host": "127.0.0.1", "port": port, "database": "postgres",
               "user": "pguser"}
    finally:
        _pg([f"{PG_BIN}/pg_ctl", "-D", data, "-m", "immediate", "stop"])
        shutil.rmtree(base, ignore_errors=True)


class _ManifestDest:
    """Native lakehouse destination through the Pipeline facade."""

    def __init__(self, spark, root):
        from verified_sources_spark.pipeline import Pipeline

        self.p = Pipeline(spark, root, table_format="manifest")

    def load(self, df, table, disposition, merge_keys=(), dedup_sort=None,
             hard_delete_col=None):
        self.p.run(
            df, table, write_disposition=disposition,
            primary_key=list(merge_keys) or None, dedup_sort=dedup_sort,
            hard_delete_col=hard_delete_col,
        )

    def rows(self, table, cols):
        out = self.p.read(table).select(*cols).collect()
        return {tuple(None if v is None else str(v) for v in r) for r in out}

    def count(self, table):
        return self.p.read(table).count()

    def columns(self, table):
        return list(self.p.read(table).columns)


class _DuckDest:
    def __init__(self, db_path):
        self.db = db_path

    def load(self, df, table, disposition, merge_keys=(), dedup_sort=None,
             hard_delete_col=None):
        from verified_sources_spark.sources.duckdb_writer import write_duckdb

        write_duckdb(
            df, self.db, table, disposition=disposition,
            merge_keys=list(merge_keys), dedup_sort=dedup_sort,
            hard_delete_col=hard_delete_col,
        )

    def _con(self):
        import duckdb

        return duckdb.connect(self.db)

    def rows(self, table, cols):
        sel = ", ".join(f'CAST("{c}" AS VARCHAR)' for c in cols)
        with self._con() as con:
            return {tuple(r) for r in con.execute(
                f'SELECT {sel} FROM "{table}"').fetchall()}

    def count(self, table):
        with self._con() as con:
            return con.execute(f'SELECT count(*) FROM "{table}"').fetchone()[0]

    def columns(self, table):
        with self._con() as con:
            return [r[1] for r in con.execute(
                f'PRAGMA table_info("{table}")').fetchall()]


class _PgDest:
    def __init__(self, dsn):
        self.dsn = dsn

    def load(self, df, table, disposition, merge_keys=(), dedup_sort=None,
             hard_delete_col=None):
        from verified_sources_spark.sources.pg_writer import write_postgres

        write_postgres(
            df, self.dsn, table, disposition=disposition,
            merge_keys=list(merge_keys), dedup_sort=dedup_sort,
            hard_delete_col=hard_delete_col,
        )

    def _client(self):
        from verified_sources_spark.sources.pg_wire import PgQueryClient

        return PgQueryClient(self.dsn["host"], self.dsn["port"],
                             self.dsn["database"], self.dsn["user"])

    def rows(self, table, cols):
        sel = ", ".join(f'"{c}"::text' for c in cols)
        c = self._client()
        try:
            return {tuple(r) for r in c.execute(f'SELECT {sel} FROM "{table}"')}
        finally:
            c.close()

    def count(self, table):
        c = self._client()
        try:
            return int(c.execute(f'SELECT count(*) FROM "{table}"')[0][0])
        finally:
            c.close()

    def columns(self, table):
        c = self._client()
        try:
            out = c.execute(
                "SELECT column_name FROM information_schema.columns "
                f"WHERE table_name = '{table}' ORDER BY ordinal_position"
            )
            return [r[0] for r in out]
        finally:
            c.close()


@pytest.fixture(params=ALL_DESTINATIONS)
def dest(request, spark, tmp_path, pg_dsn):
    name = request.param
    if name == "manifest":
        return _ManifestDest(spark, str(tmp_path / "ds"))
    if name == "duckdb":
        return _DuckDest(str(tmp_path / "dest.duckdb"))
    if pg_dsn is None:
        pytest.skip("local PostgreSQL binaries not available")
    return _PgDest(pg_dsn)


def _norm(df):
    return {tuple(None if v is None else str(v) for v in r) for r in df.collect()}


def test_same_scenario_every_destination(spark, dest, request):
    """replace → append → composite-key merge with dedup_sort + hard
    delete → schema-evolving append: identical observable state on every
    destination, verified against the engine's merge_dataframes."""
    from verified_sources_spark.operators.merge import merge_dataframes

    table = f"users_{request.node.callspec.id.replace('-', '_')}"
    initial = spark.createDataFrame(
        [(1, "x", "old1", 0), (2, "x", "old2", 0), (3, "y", "old3", 0)],
        "id long, grp string, val string, seq long",
    )
    dest.load(initial, table, "replace")
    assert dest.count(table) == 3

    extra = spark.createDataFrame(
        [(4, "y", "app4", 0), (5, "z", "app5", 0)],
        "id long, grp string, val string, seq long",
    )
    dest.load(extra, table, "append")
    assert dest.count(table) == 5

    src = spark.createDataFrame(
        [
            (2, "x", "new2-early", 1, None),
            (2, "x", "new2-late", 5, None),
            (3, "y", None, 9, "gone"),
            (6, "z", "new6", 2, None),
        ],
        "id long, grp string, val string, seq long, __deleted string",
    )
    dest.load(src, table, "merge", merge_keys=["id", "grp"],
              dedup_sort=["seq"], hard_delete_col="__deleted")
    expected = _norm(
        merge_dataframes(
            initial.unionByName(extra), src, ["id", "grp"],
            dedup_sort=["seq"], hard_delete_col="__deleted",
        ).select("id", "grp", "val", "seq")
    )
    got = dest.rows(table, ["id", "grp", "val", "seq"])
    assert got == expected
    assert got == {
        ("1", "x", "old1", "0"), ("2", "x", "new2-late", "5"),
        ("4", "y", "app4", "0"), ("5", "z", "app5", "0"),
        ("6", "z", "new6", "2"),
    }

    # distinct-count helper parity (reference load_table_distinct_counts)
    grps = {g for (_, g, _, _) in got}
    assert len(grps) == 3

    # schema-evolving append: a new column appears; prior rows read NULL
    drifted = spark.createDataFrame(
        [(7, "z", "app7", 0, "norway")],
        "id long, grp string, val string, seq long, country string",
    )
    dest.load(drifted, table, "append")
    assert dest.columns(table) == ["id", "grp", "val", "seq", "country"]
    got2 = dest.rows(table, ["id", "country"])
    assert ("7", "norway") in got2
    assert ("1", None) in got2 and len(got2) == 6
