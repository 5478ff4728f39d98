"""Physical-schema drift fuzzing (VERDICT r4 next-round #8).

Round 3's bench/correctness breakage was a TESTDATA drift: the driver
regenerated ``events.parquet`` with ``timestamp[us]`` (no tz) where prior
generations shipped ``timestamp[ns]``, and Spark 4's inference flipped the
column from bigint-under-nanosAsLong to TIMESTAMP_NTZ, killing 8 queries
at analysis. ``catalog.load_table`` now normalizes both; this test
generalizes that guard to the whole lattice of physical variants a
generator could plausibly emit:

- ts: {us, ns, ms} x {naive, UTC-adjusted}   (parquet TIMESTAMP logical)
- integer ids: int64 -> int32
- floating measures: double -> decimal(12,2) / decimal(18,4)

Every variant is written with pyarrow into a synthetic sf dir (other
tables symlinked to the canonical files) and representative registry
queries must (a) ANALYZE, (b) execute, and (c) for timestamp variants
produce VALUE-IDENTICAL results to the canonical dir — the timestamps
are instants, so physical encoding must be invisible.

The lattice is small and enumerable, so this is exhaustive
parametrization rather than hypothesis sampling — full coverage of the
domain, deterministically, every run.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from verified_sources_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"


def _variant_dir(tmp_path, table: str, arrow_table: pa.Table) -> str:
    d = tmp_path / "sf_variant"
    d.mkdir(parents=True, exist_ok=True)
    for t in os.listdir(SF):
        dst = d / t
        if not dst.exists():
            os.symlink(os.path.join(SF, t), dst)
    dst = d / f"{table}.parquet"
    if dst.is_symlink():
        dst.unlink()
    # version 2.6 keeps ns timestamps physical (older versions coerce)
    pq.write_table(arrow_table, dst, version="2.6")
    return str(d)


def _cast_col(t: pa.Table, name: str, typ: pa.DataType) -> pa.Table:
    i = t.schema.get_field_index(name)
    return t.set_column(i, name, t.column(name).cast(typ))


def _collect_sorted(df):
    cols = df.columns
    return sorted(tuple(r) for r in df.select(cols).collect())


TS_VARIANTS = [
    pytest.param(unit, tz, id=f"ts-{unit}-{tz or 'naive'}")
    for unit in ("us", "ns", "ms")
    for tz in (None, "UTC")
]


@pytest.mark.parametrize("unit,tz", TS_VARIANTS)
def test_events_ts_physical_variants_value_identical(spark, tmp_path, unit, tz):
    """All six TIMESTAMP physical encodings of events.ts load to the same
    instants: representative events queries return byte-identical rows.

    The testdata carries microsecond precision, so a ms encoding is not
    lossless — for the ms variants the reference is the SAME ms-truncated
    instants re-encoded as us (physical form must be invisible; precision
    of the values themselves is the generator's choice)."""
    canonical = pq.read_table(f"{SF}/events.parquet")
    if unit == "ms":
        truncated = canonical.set_column(
            canonical.schema.get_field_index("ts"),
            "ts",
            canonical.column("ts").cast(pa.timestamp("ms"), safe=False),
        )
        variant = _cast_col(truncated, "ts", pa.timestamp("ms", tz=tz))
        reference = _cast_col(truncated, "ts", pa.timestamp("us"))
        ref_dir = _variant_dir(tmp_path / "ref", "events", reference)
    else:
        variant = _cast_col(canonical, "ts", pa.timestamp(unit, tz=tz))
        ref_dir = SF
    d = _variant_dir(tmp_path, "events", variant)
    for name in ("incremental_events_window", "sessionize_events"):
        got = _collect_sorted(QUERIES[name](spark, d))
        want = _collect_sorted(QUERIES[name](spark, ref_dir))
        assert got == want, f"{name} drifted under ts {unit}/{tz}"


@pytest.mark.parametrize(
    "col,typ",
    [
        pytest.param("user_id", pa.int32(), id="user_id-int32"),
        pytest.param("event_id", pa.int32(), id="event_id-int32"),
    ],
)
def test_events_integer_width_variants_analyze_and_run(spark, tmp_path, col, typ):
    """Narrowed integer ids must not break analysis or change row-level
    results (values are small; only the physical width differs)."""
    variant = _cast_col(pq.read_table(f"{SF}/events.parquet"), col, typ)
    d = _variant_dir(tmp_path, "events", variant)
    for name in ("incremental_events_window", "route_counts_events"):
        df = QUERIES[name](spark, d)
        df.schema  # analysis
        got = sorted(tuple(int(v) if isinstance(v, int) else v for v in r) for r in df.collect())
        want = sorted(
            tuple(int(v) if isinstance(v, int) else v for v in r)
            for r in QUERIES[name](spark, SF).collect()
        )
        assert got == want, f"{name} drifted under {col}:{typ}"


@pytest.mark.parametrize(
    "typ",
    [pytest.param(pa.decimal128(12, 2), id="decimal-12-2"),
     pytest.param(pa.decimal128(18, 4), id="decimal-18-4")],
)
def test_orders_totalprice_decimal_variants_analyze_and_run(spark, tmp_path, typ):
    """A generator switching o_totalprice double->decimal must not crash
    any orders query at analysis; aggregates agree to cents."""
    variant = _cast_col(pq.read_table(f"{SF}/orders.parquet"), "o_totalprice", typ)
    d = _variant_dir(tmp_path, "orders", variant)
    for name in ("top_k_orders", "date_chunk_order_counts"):
        df = QUERIES[name](spark, d)
        df.schema
        got = QUERIES[name](spark, d).collect()
        want = QUERIES[name](spark, SF).collect()
        assert len(got) == len(want)
        for g, w in zip(sorted(map(tuple, got)), sorted(map(tuple, want))):
            for gv, wv in zip(g, w):
                if isinstance(wv, float):
                    assert abs(float(gv) - wv) < 0.01
                else:
                    assert gv == wv


def test_orders_int32_keys_full_analysis_sweep(spark, tmp_path):
    """int32 order keys through the star joins: every orders-touching
    graded query still analyzes (the r3 failure mode was analysis-time)."""
    t = pq.read_table(f"{SF}/orders.parquet")
    for col in ("o_orderkey", "o_custkey"):
        t = _cast_col(t, col, pa.int32())
    d = _variant_dir(tmp_path, "orders", t)
    failures = []
    for name in ("q3_shipping_priority", "top_k_orders", "correlated_order_stats",
                 "as_of_latest_order", "date_chunk_order_counts"):
        try:
            QUERIES[name](spark, d).schema
        except Exception as exc:  # noqa: BLE001 — collecting every failure
            failures.append(f"{name}: {type(exc).__name__}: {str(exc)[:160]}")
    assert failures == [], "\n".join(failures)
