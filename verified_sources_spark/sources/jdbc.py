"""JDBC table scans with pushdown + partitioned-read planning
(SURVEY.md §2.1 sql_database; reference sources/sql_database reflects
tables and reads them in cursor-ordered chunks).

Spark's JDBC source already does predicate pushdown and parallel reads —
the engine's job is to BUILD the right reader config from the
connector-level inputs (cursor window, projection, split column) and to
keep the split bounds a metadata-sized driver step. No live database is
needed to plan; ``read_jdbc`` executes the plan on a real session where
a driver jar exists.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JdbcScanPlan:
    """Everything ``spark.read.jdbc`` needs, assembled declaratively."""

    url: str
    table: str
    columns: list[str] | None = None
    predicates: list[str] = field(default_factory=list)  # pushed into the dbtable subquery
    split_column: str | None = None   # numeric/date column for parallel reads
    lower_bound: Any = None
    upper_bound: Any = None
    num_partitions: int = 8
    fetch_size: int = 10_000
    properties: dict[str, str] = field(default_factory=dict)

    def dbtable(self) -> str:
        """Pushdown-bearing subquery: projection and predicates run ON the
        database, so the wire carries only the needed columns/rows."""
        cols = ", ".join(self.columns) if self.columns else "*"
        q = f"SELECT {cols} FROM {self.table}"
        if self.predicates:
            q += " WHERE " + " AND ".join(f"({p})" for p in self.predicates)
        return f"({q}) AS src"

    def reader_options(self) -> dict[str, str]:
        opts: dict[str, str] = {
            "url": self.url,
            "dbtable": self.dbtable(),
            "fetchsize": str(self.fetch_size),
            **self.properties,
        }
        if self.split_column is not None:
            if self.lower_bound is None or self.upper_bound is None:
                raise ValueError("split_column requires lower_bound and upper_bound")
            opts.update(
                partitionColumn=self.split_column,
                lowerBound=str(self.lower_bound),
                upperBound=str(self.upper_bound),
                numPartitions=str(self.num_partitions),
            )
        return opts


def render_sql_literal(value) -> str:
    """Render a cursor value as a typed ANSI-SQL literal for pushdown.

    - int/float/Decimal → unquoted numeric
    - datetime → TIMESTAMP 'YYYY-MM-DD HH:MM:SS[.ffffff]'
    - date → DATE 'YYYY-MM-DD'
    - str → single-quoted with '' escaping (never raw interpolation);
      ISO-looking strings stay plain strings — the caller chose the type
    """
    import datetime as dt
    from decimal import Decimal

    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float, Decimal)):
        return str(value)
    if isinstance(value, dt.datetime):
        return f"TIMESTAMP '{value.strftime('%Y-%m-%d %H:%M:%S')}" + (
            f".{value.microsecond:06d}'" if value.microsecond else "'"
        )
    if isinstance(value, dt.date):
        return f"DATE '{value.isoformat()}'"
    escaped = str(value).replace("'", "''")
    return f"'{escaped}'"


def incremental_scan_plan(
    url: str,
    table: str,
    cursor_col: str,
    last_value,
    end_value=None,
    columns: list[str] | None = None,
    split_column: str | None = None,
    bounds: tuple | None = None,
    num_partitions: int = 8,
) -> JdbcScanPlan:
    """The reference's incremental SQL read as a scan plan: the cursor
    window becomes WHERE predicates evaluated by the DATABASE (the
    engine's `>= last AND < end` half-open contract), and the split
    column parallelizes the read across ``num_partitions`` executors.

    Cursor values render as TYPED SQL literals (`render_sql_literal`):
    numerics unquoted (a quoted '42' makes strict databases string-compare
    and defeats the cursor index), datetimes/dates as TIMESTAMP/DATE
    literals, strings quote-escaped."""
    preds = [f"{cursor_col} >= {render_sql_literal(last_value)}"]
    if end_value is not None:
        preds.append(f"{cursor_col} < {render_sql_literal(end_value)}")
    plan = JdbcScanPlan(
        url=url,
        table=table,
        columns=columns,
        predicates=preds,
        split_column=split_column,
        num_partitions=num_partitions,
    )
    if bounds is not None:
        plan.lower_bound, plan.upper_bound = bounds
    return plan


def read_jdbc(spark: SparkSession, plan: JdbcScanPlan) -> DataFrame:
    """Execute a scan plan (requires a JDBC driver on the session's
    classpath — not present in this container; the plan itself is what
    the tests cover)."""
    return spark.read.format("jdbc").options(**plan.reader_options()).load()


def snapshot_scan_plan(
    url: str, table: str, snapshot_predicate: str | None = None, **kwargs
) -> JdbcScanPlan:
    """Initial-load scan for CDC bootstrap (reference
    sources/pg_replication/helpers.py:194-223: the snapshot read runs in
    the slot's exported-snapshot transaction; over JDBC the equivalent is
    a consistent-read predicate or a snapshot-pinned session)."""
    preds = [snapshot_predicate] if snapshot_predicate else []
    return JdbcScanPlan(url=url, table=table, predicates=preds, **kwargs)
