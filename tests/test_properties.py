"""Property-based tests (hypothesis) for the core operator algebra —
invariants that must hold for ANY input, not just fixtures."""

from __future__ import annotations

import pyspark.sql.functions as F
from hypothesis import HealthCheck, given, settings, strategies as st

from verified_sources_spark.operators.dedup import keep_latest
from verified_sources_spark.operators.incremental import incremental_filter
from verified_sources_spark.operators.joins import salted_join
from verified_sources_spark.operators.merge import merge_dataframes

_slow = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),     # key
        st.integers(min_value=0, max_value=100),   # version
        st.integers(min_value=-10, max_value=10),  # payload
    ),
    min_size=0,
    max_size=30,
)


@_slow
@given(target=rows_strategy, source=rows_strategy)
def test_merge_key_uniqueness_and_source_wins(spark, target, source):
    """After merge with dedup_sort: keys unique; every source key carries
    its max-version payload; untouched target keys survive."""
    tgt = spark.createDataFrame(target, "k int, v int, p int") if target else None
    src = spark.createDataFrame(source, "k int, v int, p int") if source else None
    if src is None:
        return
    # pre-dedup target (a real target table has unique keys)
    if tgt is not None:
        tgt = keep_latest(tgt, ["k"], ["v", "p"])
    out = merge_dataframes(tgt, keep_latest(src, ["k"], ["v", "p"]), ["k"]).collect()
    keys = [r["k"] for r in out]
    assert len(keys) == len(set(keys))  # key uniqueness
    src_best = {}
    for k, v, p in source:
        if k not in src_best or (v, p) > src_best[k]:
            src_best[k] = (v, p)
    got = {r["k"]: (r["v"], r["p"]) for r in out}
    for k, vp in src_best.items():
        assert got[k] == vp  # source wins with its latest version
    if tgt is not None:
        for r in tgt.collect():
            if r["k"] not in src_best:
                assert got[r["k"]] == (r["v"], r["p"])  # untouched survive


@_slow
@given(rows=rows_strategy, lo=st.integers(0, 100), hi=st.integers(0, 100))
def test_incremental_window_is_half_open_partition(spark, rows, lo, hi):
    """filter(>=lo) ∪ filter(<lo) == all rows; [lo,hi) excludes hi."""
    if not rows:
        return
    df = spark.createDataFrame(rows, "k int, cur int, p int")
    kept = incremental_filter(df, "cur", last_value=lo, end_value=max(lo, hi)).collect()
    for r in kept:
        assert lo <= r["cur"] < max(lo, hi)
    below = df.filter(F.col("cur") < lo).count()
    atleast = incremental_filter(df, "cur", last_value=lo).count()
    assert below + atleast == len(rows)


@_slow
@given(left=rows_strategy, right=st.lists(st.tuples(st.integers(0, 5), st.text("ab", max_size=2)), max_size=10))
def test_salted_join_equals_plain_join(spark, left, right):
    if not left or not right:
        return
    l = spark.createDataFrame(left, "k int, v int, p int")
    r = spark.createDataFrame(right, "k int, name string").dropDuplicates(["k"])
    plain = sorted(tuple(x) for x in l.join(r, "k").collect())
    salted = sorted(tuple(x) for x in salted_join(l, r, "k", salt_buckets=4).collect())
    assert plain == salted


def test_salted_join_rejects_right_and_full(spark):
    """Unmatched right rows would be emitted once per salt bucket — the
    plain-join equivalence claim only holds for inner/left shapes."""
    import pytest

    l = spark.createDataFrame([(1, "x")], "k int, v string")
    r = spark.createDataFrame([(1, "a"), (2, "b")], "k int, name string")
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError):
            salted_join(l, r, "k", how=how)
    # left_semi/left_anti stay supported and correct
    assert [t["k"] for t in salted_join(l, r, "k", how="left_semi").collect()] == [1]
    assert salted_join(l, r, "k", how="left_anti").count() == 0


@_slow
@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=-1000, max_value=1000),  # order key (may repeat)
            st.integers(min_value=-5, max_value=5),        # value to scan
            st.sampled_from(["v1", "v2", "v3"]),           # version for lag
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: t[0],  # unique order keys: global order well-defined
    ),
)
def test_bucketed_prefix_scan_equals_global_window(spark, vals):
    """operators/prefix must produce EXACTLY the single-partition global
    window's running sum and lag for any input — the whole point of the
    two-pass scheme is changing the plan, not the answer."""
    from pyspark.sql import Window

    from verified_sources_spark.operators.prefix import (
        bucketed_lag,
        bucketed_prefix_sum,
        with_range_buckets,
    )

    df = spark.createDataFrame(vals, "k long, v long, ver string")
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    expect_sum = {
        r["k"]: r["s"]
        for r in df.withColumn("s", F.sum("v").over(w)).collect()
    }
    expect_lag = {
        r["k"]: r["p"]
        for r in df.withColumn("p", F.lag("ver").over(Window.orderBy("k"))).collect()
    }

    b = with_range_buckets(df, "k", num_buckets=4)
    got_sum = {
        r["k"]: r["s"] for r in bucketed_prefix_sum(b, "k", F.col("v"), "s").collect()
    }
    got_lag = {r["k"]: r["p"] for r in bucketed_lag(b, "k", "ver", "p").collect()}
    assert got_sum == expect_sum
    assert got_lag == expect_lag


@_slow
@given(
    vals=st.lists(
        st.integers(min_value=-10_000, max_value=10_000),
        min_size=1,
        max_size=60,
        unique=True,
    ),
)
def test_binary_search_bucket_assignment_matches_linear_definition(spark, vals):
    """VERDICT r2 next-step #7: the O(log B) comparison-tree bucket
    assignment must equal the linear definition
    bucket(v) = |{b in bounds : v > b}| for any data."""
    from verified_sources_spark.operators.prefix import BUCKET_COL, with_range_buckets

    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    nb = 16
    bounds = df.approxQuantile("x", [i / nb for i in range(1, nb)], 0.001)
    uniq = []
    for b in bounds:
        if not uniq or b > uniq[-1]:
            uniq.append(b)
    for r in with_range_buckets(df, "x", num_buckets=nb).collect():
        assert r[BUCKET_COL] == sum(1 for b in uniq if r["x"] > b)


@_slow
@given(
    toks=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=25),
    seq_len=st.sampled_from([4, 16, 64]),
)
def test_pack_manifest_offsets_are_a_valid_packing(spark, toks, seq_len):
    """For ANY doc/token-count layout: start offsets are the exclusive
    prefix sums in id order, the last doc's end equals the corpus total,
    and every doc's sequence span is consistent with its offsets."""
    from verified_sources_spark.llm.corpus import pack_manifest

    rows = [(i, "tok " * n) for i, n in enumerate(toks)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(
        (r["doc_id"], r["n_tokens"], r["start_offset"], r["seq_first"], r["seq_last"])
        for r in pack_manifest(df, "doc_id", "text", seq_len).collect()
    )
    run = 0
    for i, (doc_id, n, start, first, last) in enumerate(out):
        assert doc_id == i and n == toks[i]
        assert start == run  # exclusive prefix sum in id order
        run += n
        assert first == start // seq_len
        end = start + n - 1 if n > 0 else start
        assert last == end // seq_len
    assert run == sum(toks)


def test_make_sf_mutation_perms_are_distinct():
    """The old Caesar rotation aliased copies ((7*i)%26 repeats, 'or 1'
    folds rot-0 onto rot-1), making whole copies exact duplicates; the
    Fisher-Yates permutation must be identity-free and pairwise distinct
    across any realistic copy count."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "make_sf", os.path.join(os.path.dirname(__file__), "..", "tools", "make_sf.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    perms = [mod._mutation_perm(i)[1] for i in range(1, 65)]
    assert len(set(perms)) == len(perms)
    import string
    assert string.ascii_lowercase not in perms
    # the specific aliases the review caught
    assert mod._mutation_perm(15)[1] != mod._mutation_perm(26)[1]
    assert mod._mutation_perm(1)[1] != mod._mutation_perm(27)[1]
