"""Learned quality classifier (llm/quality_model.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from verified_sources_spark.llm.quality_model import (
    quality_filter_learned,
    score_quality,
    train_quality_classifier,
    weak_labels,
)

GOOD_TMPL = (
    "the committee published a detailed report on the state of the local "
    "river and the many ways the town can protect it for future {} years"
)
BAD_TMPL = "$$$ CLICK NOW {} !!! ### @@@ win win win $$$ !!!! ###"


def _corpus(spark, n=60):
    rows = [(i, GOOD_TMPL.format(i), 1.0) for i in range(n)] + [
        (1000 + i, BAD_TMPL.format(i), 0.0) for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label double")


def test_classifier_separates_planted_classes(spark):
    df = _corpus(spark)
    model = train_quality_classifier(df, "text", num_features=2**12, max_iter=20)
    scored = score_quality(model, df, "text")
    assert set(scored.columns) == {"doc_id", "text", "label", "quality_prob"}
    rows = scored.collect()
    for r in rows:
        if r["label"] == 1.0:
            assert r["quality_prob"] > 0.8, r["doc_id"]
        else:
            assert r["quality_prob"] < 0.2, r["doc_id"]
    # held-out docs in the same style classify correctly
    held = spark.createDataFrame(
        [(1, GOOD_TMPL.format("held")), (2, BAD_TMPL.format("held"))],
        "doc_id long, text string",
    )
    hs = {r["doc_id"]: r["quality_prob"] for r in score_quality(model, held, "text").collect()}
    assert hs[1] > 0.5 > hs[2]
    kept = quality_filter_learned(model, held, "text")
    assert [r["doc_id"] for r in kept.collect()] == [1]


def test_weak_labels_take_only_confident_tails(spark):
    df = _corpus(spark, n=20).drop("label")
    lab = weak_labels(df, "text", pos_min=0.5, neg_max=0.2)
    got = {r["doc_id"]: r["label"] for r in lab.collect()}
    # prose scores high on the heuristic, symbol spam scores low
    assert all(v == 1.0 for k, v in got.items() if k < 1000)
    assert all(v == 0.0 for k, v in got.items() if k >= 1000)
    assert len(got) > 0
    with pytest.raises(ValueError):
        weak_labels(df, "text", pos_min=0.2, neg_max=0.5)


def test_weak_to_model_end_to_end_and_scoring_is_mapside(spark):
    df = _corpus(spark, n=40).drop("label")
    lab = weak_labels(df, "text", pos_min=0.5, neg_max=0.2)
    model = train_quality_classifier(lab, "text", num_features=2**12)
    scored = score_quality(model, df, "text")
    # scoring plan has no shuffle: model broadcasts, pure map-side
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    n_hi = scored.filter(F.col("quality_prob") > 0.5).count()
    assert n_hi == 40  # exactly the good half survives
