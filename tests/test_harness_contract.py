"""Driver-harness contract guards — the round-1 failure modes, pinned.

The external harness builds its OWN plain SparkSession and grades the
first 50 registry entries. These tests fail fast if a future change
reintroduces a builder-session dependency, an eager catalog load, or an
ordering mistake.
"""

from __future__ import annotations

import pytest

from verified_sources_spark.plans.oracle import ORACLE_SQL
from verified_sources_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_first_fifty_registry_entries_all_oracle_backed():
    """The driver grades EXACTLY the first 50 entries in dict order —
    every one must have an oracle; rows-only entries belong in the tail."""
    names = list(QUERIES)
    missing = [n for n in names[:50] if n not in ORACLE_SQL]
    assert missing == [], f"graded-window entries without oracle: {missing}"


def test_no_stale_oracle_entries():
    stale = sorted(set(ORACLE_SQL) - set(QUERIES))
    assert stale == [], f"oracle entries without a query: {stale}"


def test_queries_run_on_plain_session(spark):
    """Round-1 root cause: queries must not depend on any conf only
    session.get_spark sets. The pytest fixture session already differs
    from get_spark; additionally clear the nanos conf so load_table's
    defensive set is what makes events readable."""
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    # representative sample: events-reading, star-join, doc, embedding
    for name in (
        "incremental_events_window",   # events (nanos timestamps)
        "q3_shipping_priority",        # star join, no events
        "cdc_txn_batches",             # prefix-scan path
        "token_stats_docs",            # documents
        "cosine_topk_embeddings",      # embeddings
    ):
        df = QUERIES[name](spark, SF)
        assert df.count() >= 0, name


def test_every_query_analyzes_against_real_testdata(spark):
    """Round-3 root cause: the driver regenerated events.parquet with a new
    physical timestamp type (ns→us, i.e. bigint→TIMESTAMP_NTZ under Spark 4
    inference) and 8 queries failed at ANALYSIS time while the test fixtures
    still passed. Analysis is cheap — force it for EVERY registry entry
    against the real testdata files so physical-schema drift fails here
    first, not in the driver's gate."""
    failures = []
    for name, fn in QUERIES.items():
        try:
            df = fn(spark, SF)
            df.schema  # forces analysis (type resolution) without execution
        except Exception as exc:  # noqa: BLE001 — collecting all, not first
            failures.append(f"{name}: {type(exc).__name__}: {str(exc)[:200]}")
    assert failures == [], "\n".join(failures)


def test_lazy_tables_touch_only_whats_used(spark, tmp_path, monkeypatch):
    """VERDICT r1 #2: one unreadable table must not sink queries that
    never use it. load_tables is lazy — accessing 'orders' must not read
    any other table's footer."""
    import shutil

    import verified_sources_spark.catalog as cat

    # a sf dir where every table EXCEPT orders/lineitem is corrupt
    d = tmp_path / "sf"
    d.mkdir()
    for t in ("orders", "lineitem"):
        shutil.copy(f"{SF}/{t}.parquet", d / f"{t}.parquet")
    for t in cat.TABLES:
        if t not in ("orders", "lineitem"):
            (d / f"{t}.parquet").write_bytes(b"not parquet at all")

    tables = cat.load_tables(spark, str(d))
    assert tables["orders"].count() > 0  # works — no eager footer reads
    with pytest.raises(Exception):
        tables["customer"].count()  # the corrupt one fails only when USED
