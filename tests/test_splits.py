"""Train/eval splitting and deterministic shuffling (llm/splits.py)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from verified_sources_spark.llm.minhash import lsh_candidate_pairs, ngram_jaccard
from verified_sources_spark.llm.splits import (
    leakage_safe_split,
    md5_bucket,
    shuffled_shards,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat naps "
    "under the old oak tree near the quiet river bend every afternoon"
)
OTHER = (
    "deep in the winter harbor an old sailor mends a torn grey sail and "
    "hums a slow tune about distant islands rich with fruit and warm rain"
)


def _docs(spark):
    rows = [
        (1, BASE),
        (2, BASE + " extra"),          # near-dup of 1
        (3, OTHER),
        (4, OTHER.replace("warm", "cold")),  # near-dup of 3
        (5, "completely unrelated short text about gardening tips and soil"),
    ] + [(100 + i, f"unique filler document number {i} " + " ".join(
        f"w{i}x{j}" for j in range(20))) for i in range(40)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_near_dups_never_straddle_the_split(spark):
    d = _docs(spark)
    split = leakage_safe_split(d, "doc_id", "text", eval_frac=0.3, threshold=0.5)
    out = {r["doc_id"]: (r["component"], r["split"]) for r in split.collect()}
    assert set(out) == {r["doc_id"] for r in d.collect()}
    # every verified near-dup pair shares component AND side
    pairs = lsh_candidate_pairs(d, "doc_id", "text")
    verified = ngram_jaccard(d, "doc_id", "text", pairs=pairs, threshold=0.5)
    for r in verified.collect():
        assert out[r["id_a"]][0] == out[r["id_b"]][0]
        assert out[r["id_a"]][1] == out[r["id_b"]][1]
    # the planted pairs specifically
    assert out[1] == out[2]
    assert out[3] == out[4]
    # both sides populated with a 0.3 eval fraction over ~43 components
    sides = {s for _, s in out.values()}
    assert sides == {"train", "eval"}


def test_split_is_deterministic_and_respects_bounds(spark):
    d = _docs(spark)
    a = sorted(map(tuple, leakage_safe_split(d, "doc_id", "text").collect()))
    b = sorted(map(tuple, leakage_safe_split(d, "doc_id", "text").collect()))
    assert a == b
    with pytest.raises(ValueError):
        leakage_safe_split(d, "doc_id", "text", eval_frac=1.5)
    # eval_frac=0 → everything trains; 1 → everything evals
    all_train = leakage_safe_split(d, "doc_id", "text", eval_frac=0.0)
    assert {r["split"] for r in all_train.collect()} == {"train"}
    all_eval = leakage_safe_split(d, "doc_id", "text", eval_frac=1.0)
    assert {r["split"] for r in all_eval.collect()} == {"eval"}


def test_shuffled_shards_is_a_permutation(spark):
    d = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    out = shuffled_shards(d, "doc_id", n_shards=7)
    rows = out.collect()
    assert len(rows) == 500
    assert {r["doc_id"] for r in rows} == set(range(500))
    by_shard: dict[int, list[int]] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(7))
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    # deterministic across invocations
    again = shuffled_shards(d, "doc_id", n_shards=7).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # different salt → different permutation
    other = shuffled_shards(d, "doc_id", n_shards=7, salt="other").collect()
    assert sorted(map(tuple, rows)) != sorted(map(tuple, other))


def test_md5_bucket_matches_duckdb(spark):
    """The portable-hash contract: Spark's conv(md5) equals DuckDB's
    ('0x'||md5)::UBIGINT for the same input — the property the oracle and
    any external auditor rely on."""
    import duckdb

    d = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    got = {
        r["doc_id"]: r["b"]
        for r in d.select("doc_id", md5_bucket(F.col("doc_id"), "s").alias("b")).collect()
    }
    want = dict(
        duckdb.sql(
            "SELECT i, CAST(('0x' || substr(md5(CAST(i AS VARCHAR) || '|s'), 1, 8)) AS UBIGINT) "
            "FROM range(50) t(i)"
        ).fetchall()
    )
    assert got == want


def test_shuffled_shards_payload_without_id(spark):
    """payload_cols omitting id_col must still work — the id column is
    needed internally for the hash key and the window tiebreak, but the
    caller's projection wins in the output."""
    d = spark.createDataFrame(
        [(i, f"text {i}") for i in range(40)], "doc_id long, text string"
    )
    out = shuffled_shards(d, "doc_id", n_shards=5, payload_cols=["text"])
    assert set(out.columns) == {"text", "shard", "pos"}
    rows = out.collect()
    assert len(rows) == 40
    # same permutation as the id-included call
    ref = {
        r["text"]: (r["shard"], r["pos"])
        for r in shuffled_shards(
            d, "doc_id", n_shards=5, payload_cols=["text", "doc_id"]
        ).collect()
    }
    assert {r["text"]: (r["shard"], r["pos"]) for r in rows} == ref
