"""Corpus relevance / language-model statistics: TF-IDF keyword
extraction and bigram-LM document scoring.

Two classic corpus-curation signals the heuristic quality gates
(llm.corpus.quality_filter) and the unigram rarity proxy
(llm.corpus.unigram_rarity) don't cover:

- :func:`tf_idf_top_terms` — the top-k characteristic terms per document
  (tf·idf with smoothed idf), the standard keyword/topic signal for
  corpus browsing, mixture labeling, and near-dup triage;
- :func:`bigram_lm_scores` — per-document mean negative log-likelihood
  under an add-one-smoothed bigram model trained on the corpus itself:
  the CCNet-style "perplexity filter" shape (CCNet scores against a
  KenLM 5-gram; the 2-gram order keeps the model exactly re-derivable
  in the DuckDB oracle while exercising the identical dataflow —
  n-gram extraction, count model, per-token score join, per-doc
  aggregate).

Determinism contract (same rules as the rest of the oracle-backed
surface): every transcendental (``ln``) is computed once per row from
exact integer inputs with the SAME expression shape on both engines,
immediately rounded to 6 decimals, and summed through DECIMAL so the
aggregation order cannot perturb the hash; ranking ties break on the
rounded score then the term text.

Scale shape (100 TB):

- token explode → (doc,term)/(term) hash aggregations are linear
  map-side-combine shuffles;
- the document-frequency / bigram-count model tables are VOCAB-sized,
  not corpus-sized; the score join is term-keyed and left to AQE (a web
  corpus vocabulary has a long tail — forcing broadcast would OOM the
  driver at scale, exactly like unigram_rarity's freq join);
- corpus-level scalars (N docs, vocabulary size) are one-row aggregates
  cross-joined via broadcast — no ``.collect()`` in the plan; their
  final single-partition aggregation step is one row (inherent to any
  global scalar), never row data;
- the per-doc top-k window partitions by document id (never global).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from verified_sources_spark.functions.text import tokens


def tf_idf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-``k`` terms per document by smoothed tf·idf.

    ``score = tf · (ln((N+1)/(df+1)) + 1)`` (the add-one "idf smooth"
    form, so corpus-universal terms still get a positive weight and the
    log argument can never be 0).  Output: one row per (doc, kept term)
    with ``tf``, ``df`` and the rounded score; ties rank
    deterministically by (rounded score desc, term asc).
    """
    toks = df.select(F.col(id_col).alias("_id"), F.explode(tokens(text_col)).alias("term"))
    tf = toks.groupBy("_id", "term").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).cast("long").alias("_n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf").cast("double")
                * (
                    F.log(
                        (F.col("_n_docs") + F.lit(1)).cast("double")
                        / (F.col("df") + F.lit(1))
                    )
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("_id").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(
            F.col("_id").alias(id_col),
            "term",
            "tf",
            "df",
            "tfidf",
            F.col("_rn").cast("long").alias("term_rank"),
        )
    )


def bigram_lm_scores(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Mean negative log-likelihood per document under an add-one bigram
    model trained on the whole corpus.

    ``p(w2|w1) = (c(w1,w2) + 1) / (c(w1) + V)`` with ``c(w1)`` the full
    corpus unigram count and ``V`` the vocabulary size; a document's
    score is the mean of ``-ln p`` over its bigrams (lower = more
    in-distribution — the perplexity-filter decision signal).  Documents
    with fewer than two tokens have no bigrams and are surfaced with
    ``n_bigrams = 0`` and NULL score rather than dropped.
    """
    toks = df.select(
        F.col(id_col).alias("_id"), F.posexplode(tokens(text_col)).alias("pos", "term")
    )
    w_doc = Window.partitionBy("_id").orderBy("pos")
    big = (
        toks.withColumn("w1", F.lag("term").over(w_doc))
        .filter(F.col("w1").isNotNull())
        .select("_id", "w1", F.col("term").alias("w2"))
    )
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).cast("long").alias("c2"))
    c1 = toks.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("c1"))
    vocab = toks.agg(F.count_distinct("term").cast("long").alias("_v"))
    scored = (
        big.join(c2, ["w1", "w2"])
        .join(c1.withColumnRenamed("term", "w1"), "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            # one ln from exact integer inputs, rounded at once: the
            # engines' libm may differ in the last ulp, 6-dp rounding
            # absorbs it; DECIMAL sum makes the aggregation order moot
            "_nlp",
            (
                -F.round(
                    F.log(
                        (F.col("c2") + F.lit(1)).cast("double")
                        / (F.col("c1") + F.col("_v"))
                    ),
                    6,
                )
            ).cast("decimal(18,6)"),
        )
    )
    per_doc = scored.groupBy("_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(
            F.sum("_nlp").cast("double") / F.count(F.lit(1)),
            6,
        ).alias("avg_nll"),
    )
    spine = df.select(F.col(id_col).alias("_id"))
    return (
        spine.join(per_doc, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("long").alias("n_bigrams"),
            F.col("avg_nll"),
        )
    )
