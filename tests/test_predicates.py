"""Filter-document DSL + projection rules + as-of join property check."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from verified_sources_spark.operators.joins import as_of_join
from verified_sources_spark.operators.predicates import (
    apply_filter_doc,
    apply_projection,
    filter_doc_to_column,
)


def _df(spark):
    return spark.createDataFrame(
        [
            (1, 25, "active", "A"),
            (2, 70, "active", "B"),
            (3, 30, "inactive", "A"),
            (4, None, "active", "C"),
        ],
        "id long, age int, status string, seg string",
    )


def test_filter_doc_operators(spark):
    df = _df(spark)
    out = df.filter(filter_doc_to_column({"age": {"$gte": 21, "$lt": 65}, "status": "active"}))
    assert [r["id"] for r in out.collect()] == [1]
    out2 = df.filter(filter_doc_to_column({"$or": [{"seg": "A"}, {"seg": "B"}]}))
    assert sorted(r["id"] for r in out2.collect()) == [1, 2, 3]
    out3 = df.filter(filter_doc_to_column({"age": {"$exists": False}}))
    assert [r["id"] for r in out3.collect()] == [4]
    out4 = df.filter(filter_doc_to_column({"status": {"$regex": "^in"}}))
    assert [r["id"] for r in out4.collect()] == [3]
    with pytest.raises(ValueError):
        filter_doc_to_column({"age": {"$near": 1}})


def test_cursor_conflict_rejected(spark):
    df = _df(spark)
    with pytest.raises(ValueError, match="conflicts with incremental"):
        apply_filter_doc(df, {"age": {"$gte": 10}}, cursor_field="age")
    # equality on the cursor field is allowed (the reference allows it)
    assert apply_filter_doc(df, {"age": 25}, cursor_field="age").count() == 1


def test_projection_key_preservation(spark):
    df = _df(spark)
    inc = apply_projection(df, include=["age"], key_cols=["id"])
    assert inc.columns == ["id", "age"]  # key re-added
    exc = apply_projection(df, exclude=["seg"], key_cols=["id"])
    assert "seg" not in exc.columns
    with pytest.raises(ValueError, match="cannot exclude key"):
        apply_projection(df, exclude=["id"], key_cols=["id"])


_slow = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@_slow
@given(
    left=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=15),
    right=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=15),
)
def test_as_of_join_matches_naive(spark, left, right):
    """as_of_join == per-row 'latest right value at-or-before' oracle."""
    l = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "k int, t int, lid int"
    )
    # dedup right on (k, t): keep max payload for determinism of the naive
    # oracle (the window impl keeps the last in sort order)
    best = {}
    for k, t in right:
        best[(k, t)] = max(best.get((k, t), -1), t * 100 + k)
    r = spark.createDataFrame(
        [(k, t, p) for (k, t), p in best.items()], "k int, t int, payload int"
    )
    out = as_of_join(l, r, on="k", left_time="t", right_time="t", right_payload=["payload"])
    got = {r_["lid"]: r_["payload"] for r_ in out.collect()}
    for i, (k, t) in enumerate(left):
        cands = [p for (rk, rt), p in best.items() if rk == k and rt <= t]
        expect = None
        if cands:
            # latest rt wins; best dict has one payload per (k, rt)
            latest_rt = max(rt for (rk, rt) in best if rk == k and rt <= t)
            expect = best[(k, latest_rt)]
        assert got[i] == expect, (i, k, t)
