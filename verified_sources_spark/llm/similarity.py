"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot products via ``F.zip_with`` + ``F.aggregate`` in float64 (JVM
  expressions, codegen'd; no Python).  The query side is broadcast (a
  query set is small by definition), so the corpus is scanned once with no
  shuffle of the corpus itself; top-k per query is a window over the
  (queries × corpus) product partitioned by query.
- ``lsh_bucketed_topk``: the scale path — random-hyperplane LSH signs
  bucket the corpus; each query only scores its bucket (and optionally
  multi-probes neighboring buckets).  Hyperplanes are derived
  deterministically from a seed via md5 bits, so results are reproducible
  across runs/engines.  At 100 TB: bucketing is one map pass + a shuffle
  on bucket id; an IVF-style coarse quantizer would follow the same plan
  shape with learned centroids.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    include_self: bool = False,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, neighbor_id, rank, cosine) — cosine rounded to 4dp,
    rank tie-broken by neighbor id for determinism."""
    # norms precomputed per side (N+Q sqrt-folds), NOT per pair (N*Q) —
    # the cross join then evaluates only the dot product per pair
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        _norm(F.col(vec_col)).alias("__qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        _norm(F.col(vec_col)).alias("__cn"),
    )
    prod = c.crossJoin(F.broadcast(q))
    if not include_self:
        prod = prod.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = prod.select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))).alias("__cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("__cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("__cos", 4).alias("cosine"))
    )


def _hyperplane(dim: int, plane_idx: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit-free hyperplane from md5 bytes."""
    import hashlib

    vals: list[float] = []
    counter = 0
    while len(vals) < dim:
        h = hashlib.md5(f"{seed}|{plane_idx}|{counter}".encode()).digest()
        for b in h:
            if len(vals) >= dim:
                break
            vals.append((b - 127.5) / 127.5)
        counter += 1
    return vals


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: sign-LSH bucket join then exact rerank in-bucket.

    Recall grows with fewer planes (bigger buckets); n_planes=8 → 256
    buckets.  Same output schema as cosine_topk."""
    dim = len(corpus.select(vec_col).first()[0])
    planes = [_hyperplane(dim, p, seed) for p in range(n_planes)]

    def bucket_col(vec):
        bits = []
        for p in planes:
            plane_arr = F.array(*[F.lit(x) for x in p])
            bits.append(F.when(_dot(vec, plane_arr) >= 0, F.lit("1")).otherwise(F.lit("0")))
        return F.concat(*bits)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        _norm(F.col(vec_col)).alias("__cn"),
        bucket_col(F.col(vec_col)).alias("__bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        _norm(F.col(vec_col)).alias("__qn"),
        bucket_col(F.col(vec_col)).alias("__bucket"),
    )
    prod = c.join(F.broadcast(q), "__bucket").filter(F.col("neighbor_id") != F.col("query_id"))
    scored = prod.select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))).alias("__cos"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("__cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("__cos", 4).alias("cosine"))
    )
