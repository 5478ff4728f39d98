"""TF-IDF keyword extraction and bigram-LM scoring (llm/relevance.py):
values pinned by hand, tie-break determinism, and degenerate docs."""

from __future__ import annotations

import math

import pytest

from verified_sources_spark.llm.relevance import bigram_lm_scores, tf_idf_top_terms


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry"),
        ],
        "doc_id long, text string",
    )


def test_tfidf_values_and_ranking(docs):
    out = {
        (r.doc_id, r.term): (r.tf, r.df, r.tfidf, r.term_rank)
        for r in tf_idf_top_terms(docs, "doc_id", "text", k=2).collect()
    }
    idf_apple = math.log(4 / 2) + 1  # df=1, N=3
    idf_shared = math.log(4 / 3) + 1  # df=2
    assert out[(1, "apple")] == (2, 1, round(2 * idf_apple, 6), 1)
    assert out[(1, "banana")] == (1, 2, round(idf_shared, 6), 2)
    # doc 2: banana and cherry tie exactly → term asc breaks it
    assert out[(2, "banana")][3] == 1 and out[(2, "cherry")][3] == 2
    assert out[(2, "banana")][2] == out[(2, "cherry")][2] == round(idf_shared, 6)
    assert out[(3, "cherry")] == (3, 2, round(3 * idf_shared, 6), 1)
    assert len(out) == 5  # k=2 but doc 3 has one distinct term


def test_tfidf_k_bounds(docs):
    assert tf_idf_top_terms(docs, "doc_id", "text", k=1).count() == 3


def test_bigram_lm_pinned_values(spark):
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "solo")],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_bigrams, r.avg_nll) for r in bigram_lm_scores(df, "doc_id", "text").collect()}
    # corpus: c2(a,b)=3, c2(b,a)=1; c1(a)=3, c1(b)=3; V=3 (a, b, solo)
    nlp_ab = -round(math.log((3 + 1) / (3 + 3)), 6)
    nlp_ba = -round(math.log((1 + 1) / (3 + 3)), 6)
    from decimal import Decimal

    q = lambda x: Decimal(repr(x))
    assert out[1] == (3, round(float(q(nlp_ab) * 2 + q(nlp_ba)) / 3, 6))
    assert out[2] == (1, round(nlp_ab, 6))
    # "solo" has one token → zero bigrams, NULL score, but stays visible
    assert out[3] == (0, None)


def test_bigram_lm_lower_nll_for_in_distribution_text(spark):
    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    rows.append((99, "zq xv qq zz pq vx"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r.avg_nll for r in bigram_lm_scores(df, "doc_id", "text").collect()}
    assert out[0] < out[99]  # repeated phrasing scores far more likely


def test_relevance_plans_stay_distributed(spark, docs):
    """No CartesianProduct (the only nested-loop join is the ONE-ROW
    corpus-scalar broadcast, which Spark plans as BroadcastNestedLoopJoin)
    and the per-doc window partitions by document id — the plan's only
    SinglePartition exchanges belong to the one-row scalar aggregates."""
    for df in (
        tf_idf_top_terms(docs, "doc_id", "text"),
        bigram_lm_scores(docs, "doc_id", "text"),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        # every row_number/lag window is keyed on the doc id — Spark
        # renders window specs as windowspecdefinition(partExprs...,
        # orderExprs..., frame), so an unkeyed window would lose the
        # leading _id# reference
        specs = [
            ln for ln in plan.splitlines() if "windowspecdefinition(" in ln
        ]
        assert specs, "expected at least one window in the plan"
        for ln in specs:
            spec = ln.split("windowspecdefinition(", 1)[1]
            assert spec.startswith("_id#"), ln
