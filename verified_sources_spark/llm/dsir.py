"""DSIR-style data selection: hashed n-gram importance scores.

Data Selection via Importance Resampling (Xie et al., NeurIPS 2023 —
public method) picks pretraining documents whose hashed n-gram
distribution looks more like a small TARGET set than like the raw
corpus: featurize every document into hashed n-gram buckets, estimate
bucket distributions for target and raw, and weight each document by
its target/raw likelihood ratio.

This implementation keeps the arithmetic INTEGER-EXACT so the result
is oracle-replayable bit-for-bit (the repo's float-determinism
posture: no log-sums whose libm rounding could differ between
engines).  Per n-gram occurrence in bucket ``b`` the ratio term is

    ((target_count[b] + 1) * scale) DIV (raw_count[b] + 1)

(+1 Laplace smoothing on both sides, ``DIV`` integer division), and a
document's score is the sum over its occurrences — ``scale`` × the
average smoothed likelihood ratio, a monotone integer surrogate for
the DSIR importance weight.  ``selected`` marks documents whose
average ratio exceeds 1 (score > n_ngrams·scale): more target-like
than raw-like.

100 TB shape: tokenize/shingle/hash run inside the scan (JVM-side
``regexp_extract_all`` / ``zip_with`` / ``md5`` — the same frozen
family llm/minhash uses, one md5 per n-gram, 60-bit prefix); the only
wide exchanges carry (id, bucket-int) pairs — never text.  Bucket
count tables are at most ``n_buckets`` rows and BROADCAST to the
scoring join; the per-document aggregation is a single int-keyed
shuffle.  The corpus's bucket cut is consumed twice (raw counts +
scoring) and persisted so the tokenizer+md5 work runs once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from verified_sources_spark.llm.minhash import _shingles_sql, _tokens_sql

__all__ = ["importance_weights"]


def _bucket_occurrences(df: DataFrame, id_col: str, text_col: str,
                        n: int, n_buckets: int) -> DataFrame:
    """One row per n-gram OCCURRENCE (repeats kept — distributions
    are over occurrences, not types): (id, bucket) with bucket =
    60-bit md5 prefix of the space-joined n-gram, mod n_buckets."""
    toks = df.select(
        F.col(id_col),
        F.expr(_tokens_sql(text_col)).alias("toks"))
    grams = toks.select(
        F.col(id_col), F.expr(_shingles_sql(n)).alias("gs"))
    return grams.select(
        F.col(id_col), F.explode("gs").alias("g")).select(
        F.col(id_col),
        F.expr("CAST(conv(substring(md5(g), 1, 15), 16, 10) "
               f"AS BIGINT) % {n_buckets}L").alias("bucket"))


def importance_weights(df: DataFrame, target_df: DataFrame,
                       id_col: str = "doc_id",
                       text_col: str = "text",
                       n: int = 2,
                       n_buckets: int = 8192,
                       scale: int = 1_000_000) -> DataFrame:
    """Score every ``df`` document's affinity to ``target_df`` by the
    integer-exact hashed n-gram likelihood-ratio sum described in the
    module docstring.

    Returns (id, n_ngrams, score, selected): ``n_ngrams`` the
    document's n-gram occurrence count, ``score`` the summed ratio
    terms (0 for documents under ``n`` tokens), ``selected`` true
    when score > n_ngrams·scale.  Deterministic — no sampling jitter;
    callers wanting DSIR's Gumbel resampling can rank on ``score``
    with any hash jitter downstream."""
    occ = _bucket_occurrences(df, id_col, text_col, n, n_buckets)
    occ.persist()
    target_counts = _bucket_occurrences(
        target_df, id_col, text_col, n, n_buckets).groupBy(
        "bucket").agg(F.count("*").alias("tc"))
    raw_counts = occ.groupBy("bucket").agg(F.count("*").alias("rc"))
    scored = (
        occ.join(F.broadcast(target_counts), "bucket", "left")
        .join(F.broadcast(raw_counts), "bucket", "left")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_ngrams"),
             F.sum(F.expr(
                 f"(coalesce(tc, 0L) + 1L) * {scale}L "
                 "DIV (coalesce(rc, 0L) + 1L)")).alias("score")))
    return (
        df.select(id_col).join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_ngrams", F.lit(0)).alias("n_ngrams"),
            F.coalesce("score", F.lit(0)).alias("score"))
        .withColumn(
            "selected",
            F.col("score") > F.col("n_ngrams") * F.lit(scale)))
