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

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from verified_sources_spark.cut import cut


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


def cosine_topk_vectorized(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """Brute-force top-k via Arrow-batched numpy matmul (mapInPandas).

    The query matrix (Q x d) is tiny and closure-broadcast to executors;
    each Arrow batch of corpus vectors becomes one (B x d) @ (d x Q)
    GEMM + per-batch partial top-k, so only B_batches x Q x k candidate
    rows reach the final per-query selection.  This is the throughput
    path when d·Q is large enough that the per-pair JVM fold of
    ``cosine_topk`` dominates; same output contract (cosine rounded 4dp,
    id-tie-broken ranks)."""
    import numpy as np
    import pandas as pd

    q_rows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[id_col] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r[vec_col] for r in q_rows], dtype=np.float64)
    q_norm = np.linalg.norm(q_mat, axis=1)

    import pyspark.sql.types as T

    out_schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("__cos", T.DoubleType()),
        ]
    )

    topk_per_batch = max(k + 1, 8)  # +1 covers self-match removal later

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            if mat.size == 0:
                continue
            sims = (mat @ q_mat.T) / (np.linalg.norm(mat, axis=1)[:, None] * q_norm[None, :])
            m = min(topk_per_batch, sims.shape[0])
            # partial top-m per query within this batch
            part = np.argpartition(-sims, m - 1, axis=0)[:m]
            rows = {
                "query_id": np.repeat(q_ids, m),
                "neighbor_id": ids[part].T.ravel(),
                "__cos": np.take_along_axis(sims, part, axis=0).T.ravel(),
            }
            yield pd.DataFrame(rows)

    candidates = corpus.select(id_col, vec_col).mapInPandas(score, out_schema)
    candidates = candidates.filter(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("__cos").desc(), F.col("neighbor_id").asc())
    return (
        candidates.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("__cos", 4).alias("cosine"))
    )


def _gemm_min_rows() -> int:
    """Corpus-size crossover between the JVM fold and the Arrow GEMM path,
    env-tunable (``SPARK_GRAFT_COSINE_GEMM_MIN_ROWS``); malformed values
    fall back to the default rather than failing query construction."""
    import os

    try:
        return int(os.environ.get("SPARK_GRAFT_COSINE_GEMM_MIN_ROWS", "20000"))
    except ValueError:
        return 20000


def cosine_topk_adaptive(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    corpus_rows: int | None = None,
) -> DataFrame:
    """``cosine_topk`` with the implementation picked by corpus size.

    Both paths return identical rows (pinned by
    tests/test_bucketing_vectorized.py); what differs is the cost shape:

    - the JVM ``zip_with``/``aggregate`` fold has no fixed overhead but
      pays interpreted per-element evaluation on every (corpus x query)
      pair — linear in N*Q*d with a large constant;
    - the Arrow GEMM path (``cosine_topk_vectorized``) batches corpus
      vectors through one numpy matmul per Arrow batch, with a fixed
      ~0.2-0.3 s floor (query-side collect job + Python worker
      round-trip) that dominates on small corpora.

    Measured crossover (r16, d=64, Q=10, 32 cores, interleaved A/B at
    1x/10x/100x the graded corpus): the fold wins at 2k rows (0.38 vs
    0.50 s best), ties at 20k (0.73 vs 0.74 s), loses at 200k (1.20 vs
    0.85 s best; 23 vs 3.6 s median under host load — the fold degrades
    far worse under CPU steal).  Default threshold 20k = the measured
    tie, preferring the scale path at the boundary.  The bound comes
    from parquet footers (driver-only, no job); unknowable bounds take
    the GEMM path — at 100 TB the fold is never the right answer.
    Callers that already know the corpus size (e.g. from their own
    footer read) pass ``corpus_rows`` and skip the plan probe entirely.
    """
    bound = corpus_rows if corpus_rows is not None else _adaptive_bound(corpus)
    if bound is not None and bound < _gemm_min_rows():
        return cosine_topk(corpus, queries, id_col, vec_col, k)
    return cosine_topk_vectorized(corpus, queries, id_col, vec_col, k)


# row bounds memoized by (application, file set): the footer probe walks
# the optimized plan (~60 ms/build measured — the dominant cost of the
# dispatch), and repeated invocations in one driver (the bench loops
# entries) should not re-pay it.  Keying on the file set alone can
# mis-dispatch a differently-shaped plan over the same files (e.g. an
# exploded view), but the dispatch is PERF-ONLY — both paths return
# identical rows — so a stale bound can never change results.
_ADAPTIVE_BOUND_MEMO: dict = {}


def _adaptive_bound(corpus: DataFrame):
    from verified_sources_spark.operators.sessionize import _static_row_upper_bound

    try:
        files = tuple(sorted(corpus.inputFiles()))
    except Exception:
        files = None
    if not files:
        return _static_row_upper_bound(corpus)
    key = (corpus.sparkSession.sparkContext.applicationId, files)
    if key not in _ADAPTIVE_BOUND_MEMO:
        _ADAPTIVE_BOUND_MEMO[key] = _static_row_upper_bound(corpus)
    return _ADAPTIVE_BOUND_MEMO[key]


def _centroid_df(spark, centroids: list[list[float]]) -> DataFrame:
    rows = [(i, [float(x) for x in cv]) for i, cv in enumerate(centroids)]
    return spark.createDataFrame(rows, "cluster int, cvec array<double>")


def assign_clusters(
    df: DataFrame, id_name: str, vec_col: str, centroids: list[list[float]]
) -> DataFrame:
    """Nearest-centroid ranking: broadcast cross join against the (tiny)
    centroid table, squared-L2 distance as a zip_with fold, ``__rn`` ranks
    centroids per row (rn=1 is the assignment; rn<=p gives multi-probe)."""
    cd = _centroid_df(df.sparkSession, centroids)
    scored = df.crossJoin(F.broadcast(cd)).withColumn(
        "__dist",
        F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.col("cvec"),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
    )
    w = Window.partitionBy(id_name).orderBy(F.col("__dist").asc(), F.col("cluster").asc())
    return scored.withColumn("__rn", F.row_number().over(w))


def argmin_cluster(
    df: DataFrame, id_name: str, vec_col: str, centroids: list[list[float]]
) -> DataFrame:
    """Nearest-centroid ASSIGNMENT as an Arrow-batched numpy GEMM.

    Round-6 sf10 soak finding: the former broadcast-crossJoin +
    per-element zip_with fold materialized n×k rows of
    Catalyst-interpreted array arithmetic — and because SemDeDup grows k
    with n (k = n/512 keeps cluster sizes bounded for the pair stage),
    assignment cost rose as n² in wall clock (8.2s at sf1 → 192s at
    sf10).  The GEMM form does the same n×k×d FLOPs in BLAS inside each
    Arrow batch — exactly the treatment the SemDeDup PAIR stage got in
    round 5 — with no cross join, no shuffle, and only the (tiny)
    centroid matrix broadcast in the task closure.  sf10: 192s → single
    seconds.  (The asymptotic fix past ~10^6 centroids is a two-level
    coarse/fine quantizer — n×2√k — noted in SCALE.md; at SemDeDup's
    k = n/512 the flat GEMM carries 10^8-vector corpora comfortably.)

    argmin over d² = |x|² − 2x·c + |c|² ≡ argmin over |c|²/2 − x·c
    (the |x|² term is constant per row); numpy argmin takes the FIRST
    minimum, i.e. the lowest cluster id on ties — the same tie-break as
    the window/agg forms.  Returns (id, vec, cluster)."""
    import numpy as np
    import pandas as pd
    import pyspark.sql.types as T

    C = np.asarray(centroids, dtype=np.float64)  # k × d
    half_cn = 0.5 * (C * C).sum(axis=1)

    id_f = df.schema[id_name]
    vec_f = df.schema[vec_col]
    schema = T.StructType(
        [
            T.StructField(id_name, id_f.dataType, id_f.nullable),
            T.StructField(vec_col, vec_f.dataType, vec_f.nullable),
            T.StructField("cluster", T.IntegerType()),
        ]
    )

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(list(pdf[vec_col]), dtype=np.float64)  # B × d
            scores = half_cn[None, :] - X @ C.T
            cl = np.argmin(scores, axis=1).astype("int32")
            yield pd.DataFrame(
                {id_name: pdf[id_name], vec_col: pdf[vec_col], "cluster": cl}
            )

    return df.select(id_name, vec_col).mapInPandas(assign, schema)


def train_kmeans(
    vectors: DataFrame,
    id_name: str,
    vec_col: str,
    n_centroids: int = 16,
    lloyd_iters: int = 2,
) -> list[list[float]]:
    """Deterministic Lloyd k-means over a vector column, as DataFrame ops.

    Initialization is the ``n_centroids`` lowest-id vectors; each iteration
    is one broadcast-assignment pass plus a posexplode → (cluster, dim) avg.
    Only the centroid table (n_centroids × dim doubles — metadata-sized)
    ever reaches the driver; the corpus never collects, so the same loop
    runs unchanged against a 100 TB embedding table."""
    init = vectors.orderBy(id_name).limit(n_centroids).select(vec_col).collect()
    centroids = [list(r[vec_col]) for r in init]
    for _ in range(lloyd_iters):
        assigned = argmin_cluster(vectors, id_name, vec_col, centroids).select(
            vec_col, "cluster"
        )
        new_rows = (
            assigned.select("cluster", F.posexplode(vec_col).alias("dim", "x"))
            .groupBy("cluster", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("dm"))
            .select("cluster", F.col("dm.m").alias("cvec"))
            .collect()
        )
        for r in new_rows:
            centroids[r["cluster"]] = list(r["cvec"])
    return centroids


# scale for the exact-integer quantizer: 1e-7 resolution is far beyond
# float32 embedding precision, and |x| <= ~430 still keeps every
# intermediate (64-dim squared distances, per-cluster coordinate sums)
# inside int64 — one source of truth shared with the DuckDB oracle
KMEANS_SCALE = 10_000_000


def _scaled_int_matrix(col):
    """float32 vectors → exact scaled int64 (floor(x*scale + 0.5): the
    identical IEEE op sequence on both engines, so the quantization is
    bit-reproducible in Spark, numpy and DuckDB)."""
    import numpy as np

    X = np.array(list(col), dtype=np.float64)
    return np.floor(X * KMEANS_SCALE + 0.5).astype(np.int64)


def _round_div(s: int, n: int) -> int:
    """round(s/n) half away from zero with pure integer ops (truncating
    division on magnitudes — DuckDB's ``//`` truncates toward zero, so
    this form replays identically there)."""
    q = (2 * abs(s) + n) // (2 * n)
    return -q if s < 0 else q


def rank_clusters_scaled(
    df: DataFrame,
    id_name: str,
    vec_col: str,
    centroids: list[list[int]],
    n_probe: int | None = None,
    already_scaled: bool = False,
) -> DataFrame:
    """Exact-integer nearest-centroid ranking against integer-scaled
    centroids: squared-L2 in int64 (no float rounding anywhere), ties
    broken by lowest cluster id via a stable argsort.  ``n_probe=None``
    keeps only rn=1 (plain assignment); otherwise rows explode to the
    ``n_probe`` nearest clusters.  Returns (id, vec, cluster, __rn)."""
    import numpy as np
    import pandas as pd
    import pyspark.sql.types as T

    C = np.asarray(centroids, dtype=np.int64)  # k x d
    keep = 1 if n_probe is None else n_probe

    id_f = df.schema[id_name]
    vec_f = df.schema[vec_col]
    schema = T.StructType(
        [
            T.StructField(id_name, id_f.dataType, id_f.nullable),
            T.StructField(vec_col, vec_f.dataType, vec_f.nullable),
            T.StructField("cluster", T.IntegerType()),
            T.StructField("__rn", T.IntegerType()),
        ]
    )

    def rank(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if already_scaled:
                X = np.array(list(pdf[vec_col]), dtype=np.int64)
            else:
                X = _scaled_int_matrix(pdf[vec_col])  # B x d int64
            # d² = |x|² - 2x·c + |c|² — drop the per-row |x|² constant;
            # int64 matmul is exact, so ranking and ties are exact
            scores = (C * C).sum(axis=1)[None, :] - 2 * (X @ C.T)
            order = np.argsort(scores, axis=1, kind="stable")[:, :keep]
            ids = np.repeat(np.arange(len(pdf)), keep)
            yield pd.DataFrame(
                {
                    id_name: pdf[id_name].iloc[ids].values,
                    vec_col: pdf[vec_col].iloc[ids].values,
                    "cluster": order.ravel().astype("int32"),
                    "__rn": np.tile(
                        np.arange(1, keep + 1, dtype="int32"), len(pdf)
                    ),
                }
            )

    return df.select(id_name, vec_col).mapInPandas(rank, schema)


def train_kmeans_quantized(
    vectors: DataFrame,
    id_name: str,
    vec_col: str,
    n_centroids: int = 16,
    lloyd_iters: int = 2,
    already_scaled: bool = False,
) -> list[list[int]]:
    """Lloyd k-means with EXACT integer arithmetic, bit-identical across
    engines and partitionings: vectors quantize to scaled int64
    (``KMEANS_SCALE``), per-cluster coordinate sums are exact long
    aggregations (order-independent, unlike float64 avg — the reason the
    float trainer could never carry a cross-engine value hash), and each
    new centroid coordinate is the half-away-from-zero rounded integer
    average.  The same two unrolled iterations replay in DuckDB SQL
    (plans/oracle.py), putting trained-quantizer ANN on the value-hash
    gate.  Only per-cluster sums (k × d longs) ever reach the driver."""
    if already_scaled:
        # input is already exact scaled int64 (e.g. IVF-PQ residuals)
        sv = vectors.select(
            F.col(id_name).alias("_id"),
            F.transform(F.col(vec_col),
                        lambda x: x.cast("long")).alias("_sx"),
        )
    else:
        sv = vectors.select(
            F.col(id_name).alias("_id"),
            F.transform(
                F.col(vec_col),
                lambda x: F.floor(
                    x.cast("double") * F.lit(float(KMEANS_SCALE))
                    + F.lit(0.5)
                ).cast("long"),
            ).alias("_sx"),
        )
    init = sv.orderBy("_id").limit(n_centroids).select("_sx").collect()
    cents = [list(r["_sx"]) for r in init]
    for _ in range(lloyd_iters):
        assigned = rank_clusters_scaled(
            sv, "_id", "_sx", cents, already_scaled=True
        )
        # exact long sums per (cluster, dim); empty clusters keep their
        # previous centroid (no row → no update)
        rows = (
            assigned.select(
                "cluster", F.posexplode("_sx").alias("dim", "x")
            )
            .groupBy("cluster", "dim")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .groupBy("cluster")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("dim", "s"))
                ).alias("ds"),
                F.first("n").alias("n"),
            )
            .select("cluster", F.col("ds.s").alias("svec"), "n")
            .collect()
        )
        for r in rows:
            cents[r["cluster"]] = [
                _round_div(int(s), int(r["n"])) for s in r["svec"]
            ]
    return cents


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
    n_centroids: int = 16,
    n_probe: int = 4,
    lloyd_iters: int = 2,
    quantizer: str = "float",
) -> DataFrame:
    """IVF approximate top-k: k-means coarse quantizer → inverted lists →
    probe the ``n_probe`` nearest lists per query → exact rerank.

    The quantizer is trained with Lloyd iterations expressed as DataFrame
    ops: assignment is a broadcast cross join against the (tiny) centroid
    set; the update step is posexplode → groupBy(cluster, dim) avg.  Only
    the centroid table (n_centroids x dim floats — metadata-sized) ever
    reaches the driver; corpus vectors never collect.  At 100 TB the same
    plan holds: one narrow assignment pass per iteration plus a
    dim-keyed aggregate, then the probe join shuffles only (bucket, query)
    pairs.  Initialization is deterministic (first n_centroids by id).

    ``quantizer="exact-int"`` trains with ``train_kmeans_quantized``
    (exact integer Lloyd, bit-identical across engines/partitionings)
    and assigns/probes by exact int64 distances — the same plan shape,
    but every training+bucketing decision replays in DuckDB SQL, so the
    TRAINED pipeline carries a full value-hash oracle."""
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv"))
    if quantizer == "exact-int":
        cents = train_kmeans_quantized(
            c, "neighbor_id", "__cv", n_centroids, lloyd_iters
        )
        buckets = rank_clusters_scaled(
            c, "neighbor_id", "__cv", cents
        ).select("neighbor_id", "__cv", "cluster")
        q_probes = rank_clusters_scaled(
            q, "query_id", "__qv", cents, n_probe=n_probe
        ).select("query_id", "__qv", "cluster")
    else:
        centroids = train_kmeans(
            c, "neighbor_id", "__cv", n_centroids, lloyd_iters
        )
        # corpus side: plain assignment — the GEMM form, not the n×k
        # ranking cross join (the query side below genuinely needs the
        # rn<=p ranking, and queries are small)
        buckets = argmin_cluster(c, "neighbor_id", "__cv", centroids).select(
            "neighbor_id", "__cv", "cluster"
        )
        q_probes = (
            assign_clusters(q, "query_id", "__qv", centroids)
            .filter(F.col("__rn") <= n_probe)
            .select("query_id", "__qv", "cluster")
        )
    prod = buckets.join(F.broadcast(q_probes), "cluster").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = prod.select(
        "query_id",
        "neighbor_id",
        (_dot(F.col("__qv"), F.col("__cv")) / (_norm(F.col("__qv")) * _norm(F.col("__cv")))).alias("__cos"),
    ).dropDuplicates(["query_id", "neighbor_id"])
    w = Window.partitionBy("query_id").orderBy(F.col("__cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("__cos", 4).alias("cosine"))
    )


# frozen parameters of the graded ann_lsh_topk_embeddings query: ONE
# source of truth shared by the query wrapper (plans/queries.py) and the
# DuckDB oracle's bucket-constant generation (plans/oracle.py) — change
# here and both sides move together
ANN_LSH_GRADED = {"k": 3, "n_planes": 6, "dim": 64, "seed": 42}


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


def embedding_near_dup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: (a, b) with a < b and
    cosine >= threshold.  The all-pairs self-join is the CORRECTNESS
    baseline (oracle-checkable); at corpus scale use
    ``embedding_near_dups_lsh`` which only compares within sign-LSH
    buckets.  Cosine uses the same sequential JVM fold as ``cosine_topk``
    so results are bit-stable against the DuckDB oracle."""
    a = corpus.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("__va"),
        _norm(F.col(vec_col)).alias("__na"),
    )
    b = corpus.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("__vb"),
        _norm(F.col(vec_col)).alias("__nb"),
    )
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    scored = pairs.select(
        "id_a",
        "id_b",
        (_dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb"))).alias("__cos"),
    )
    return scored.filter(F.col("__cos") >= F.lit(threshold)).select(
        "id_a", "id_b", F.round("__cos", 4).alias("cosine")
    )


def embedding_near_dups_lsh(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 6,
    n_bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Scale path for embedding near-dup detection: candidate pairs form
    only inside sign-LSH buckets (``n_bands`` independent plane sets — a
    pair is a candidate if ANY band agrees), then the exact cosine filter
    verifies.  High-cosine pairs have low angular distance, so the
    probability at least one of ``n_bands`` sign-buckets agrees → 1;
    shuffle volume is bucket-local candidates, never the full cross
    product.  Same output schema as ``embedding_near_dup_pairs``.

    Plan shape: the per-row sign bits (``n_bands * n_planes`` dot
    products — the dominant per-row cost) are projected once into a
    SKINNY (id, buckets) frame and materialized (lazy localCheckpoint)
    before the bucket self-join; without that, the two join sides fork
    the DAG and every dot product runs twice.  Scoring then re-reads the
    corpus exactly once via the explode-pair-sides/regroup shape (same
    as ``ngram_jaccard``): only candidate-matched vectors shuffle."""
    dim = len(corpus.select(vec_col).first()[0])

    def band_bucket(vec, band: int):
        bits = []
        for p in range(n_planes):
            plane = _hyperplane(dim, band * n_planes + p, seed)
            plane_arr = F.array(*[F.lit(x) for x in plane])
            bits.append(F.when(_dot(vec, plane_arr) >= 0, F.lit("1")).otherwise(F.lit("0")))
        return F.concat(F.lit(f"b{band}:"), *bits)

    buckets = corpus.select(
        F.col(id_col).alias("__id"),
        F.array(
            *[band_bucket(F.col(vec_col), band) for band in range(n_bands)]
        ).alias("__buckets"),
    ).transform(cut)
    exploded = buckets.select("__id", F.explode("__buckets").alias("__bucket"))
    cand = (
        exploded.select(F.col("__id").alias("id_a"), "__bucket")
        .join(exploded.select(F.col("__id").alias("id_b"), "__bucket"), ["__bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])  # a pair can agree in several bands
    )
    vecs = corpus.select(
        F.col(id_col).alias("__id"),
        F.struct(
            F.col(vec_col).alias("v"), _norm(F.col(vec_col)).alias("n")
        ).alias("__vn"),
    )
    sides = cand.select("id_a", "id_b", F.explode(F.array("id_a", "id_b")).alias("__id"))
    both = (
        sides.join(vecs, "__id")
        .groupBy("id_a", "id_b")
        .agg(F.collect_list("__vn").alias("vns"))
    )
    a, b = F.col("vns")[0], F.col("vns")[1]
    scored = both.select(
        "id_a", "id_b", (_dot(a["v"], b["v"]) / (a["n"] * b["n"])).alias("__cos")
    )
    return scored.filter(F.col("__cos") >= F.lit(threshold)).select(
        "id_a", "id_b", F.round("__cos", 4).alias("cosine")
    )


def near_dup_keep(corpus: DataFrame, pairs: DataFrame, id_col: str = "vec_id") -> DataFrame:
    """Greedy canonical selection over near-dup pairs: drop every item
    that duplicates a LOWER id (the same keep-min-id rule as
    ``exact_dedup``; transitive chains collapse to their minimum without
    union-find — any non-minimal member matches at least one lower id)."""
    drop = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return corpus.join(drop, id_col, "left_anti")


# ---------------------------------------------------------- two-level IVF


def _local_lloyd(X, ids, k: int, iters: int):
    """Deterministic in-memory Lloyd over one coarse cell (numpy GEMM
    form).  Init is greedy FARTHEST-POINT (start at the lowest id, then
    repeatedly take the vector farthest from its nearest chosen seed,
    lowest id on ties) — deterministic like a lowest-id init but it
    cannot collapse all seeds into one dense blob; empty clusters keep
    their previous centroid.  Returns k' x d (k' = min(k, |cell|))."""
    import numpy as np

    k = min(k, len(X))
    order = np.argsort(ids, kind="stable")
    seeds = [order[0]]
    d2 = ((X - X[seeds[0]]) ** 2).sum(axis=1)
    for _ in range(k - 1):
        # ties → lowest id: scan in id order for the max distance
        best = order[np.argmax(d2[order])]
        seeds.append(best)
        d2 = np.minimum(d2, ((X - X[best]) ** 2).sum(axis=1))
    C = X[seeds].astype(np.float64).copy()
    for _ in range(iters):
        scores = 0.5 * (C * C).sum(axis=1)[None, :] - X @ C.T
        a = np.argmin(scores, axis=1)
        for j in range(k):
            m = a == j
            if m.any():
                C[j] = X[m].mean(axis=0)
    return C


def train_kmeans_two_level(
    vectors: DataFrame,
    id_name: str,
    vec_col: str,
    n_centroids: int,
    lloyd_iters: int = 2,
    coarse_k: int | None = None,
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """Hierarchical coarse/fine quantizer: the asymptotic fix for flat
    k-means when k grows with n (SemDeDup's k = n/512 makes flat
    assignment n x k ∝ n² FLOPs).

    Structure: ``coarse_k`` (default ceil(sqrt(k))) coarse centroids
    trained with the flat GEMM Lloyd (n x sqrt(k) per pass), then each
    coarse CELL trains its own ~k/coarse_k fine centroids IN PARALLEL —
    one ``applyInPandas`` task per cell running a local numpy Lloyd over
    the cell's vectors (cell size ≈ n/sqrt(k): at n=10^8, k=2x10^5
    that is ~220k x d doubles per task — executor-memory sized).  Both
    training and assignment then cost n x O(sqrt(k)) instead of n x k.

    Returns ``(coarse_centroids, fine_centroids_per_cell)``; the global
    fine-cluster id of (cell c, local j) is ``offset[c] + j`` where
    offsets are the running sum of per-cell counts — what
    :func:`assign_two_level` emits.  Deterministic throughout (coarse
    init = lowest-id vectors; per-cell init = the cell's lowest ids)."""
    import numpy as np
    import pandas as pd

    if coarse_k is None:
        coarse_k = max(1, int(math.isqrt(max(1, n_centroids - 1))) + 1)
    coarse = train_kmeans(vectors, id_name, vec_col, coarse_k, lloyd_iters)

    assigned = argmin_cluster(vectors, id_name, vec_col, coarse)
    total_n = max(1, vectors.count())

    out_schema = "cell int, centroids array<array<double>>"

    # NOTE: deliberately un-annotated — partial string annotations make
    # pyspark's group_ops hint inference warn on every run; with no
    # annotations it falls back to the grouped-map eval type silently
    def fit_cell(key, pdf):
        X = np.array(list(pdf[vec_col]), dtype=np.float64)
        ids = pdf[id_name].to_numpy()
        # fine centroids PROPORTIONAL to cell population — a uniform
        # quota starves dense cells (blobs merge) and wastes centroids
        # on sparse ones; proportional sizing is also what bounds
        # cluster SIZE, the property SemDeDup's pair stage needs
        k_cell = max(1, round(n_centroids * len(pdf) / total_n))
        C = _local_lloyd(X, ids, k_cell, lloyd_iters)
        return pd.DataFrame({"cell": [int(key[0])], "centroids": [C.tolist()]})

    rows = (
        assigned.groupBy("cluster")
        .applyInPandas(fit_cell, out_schema)
        .collect()
    )  # centroid tables only — k x d doubles, metadata-sized
    fine: list[list[list[float]]] = [[] for _ in range(len(coarse))]
    for r in rows:
        fine[int(r["cell"])] = [list(c) for c in r["centroids"]]
    # a coarse cell that captured no vectors keeps its coarse centroid as
    # its single fine centroid, so every cell id stays assignable
    for c in range(len(coarse)):
        if not fine[c]:
            fine[c] = [list(coarse[c])]
    return coarse, fine


def assign_two_level(
    df: DataFrame,
    id_name: str,
    vec_col: str,
    coarse: list[list[float]],
    fine: list[list[list[float]]],
) -> DataFrame:
    """Two-stage nearest-centroid assignment: coarse GEMM argmin picks
    the cell, a per-cell fine GEMM argmin picks the cluster — n x
    O(sqrt(k)) total.  Returns (id, vec, cluster) with GLOBAL fine ids
    (offset[cell] + local index), same output shape as
    :func:`argmin_cluster`."""
    import numpy as np
    import pandas as pd
    import pyspark.sql.types as T

    Cc = np.asarray(coarse, dtype=np.float64)
    half_cc = 0.5 * (Cc * Cc).sum(axis=1)
    Fs = [np.asarray(f, dtype=np.float64) for f in fine]
    half_fs = [0.5 * (Fm * Fm).sum(axis=1) for Fm in Fs]
    offsets = np.zeros(len(Fs) + 1, dtype=np.int64)
    for i, Fm in enumerate(Fs):
        offsets[i + 1] = offsets[i] + len(Fm)

    id_f = df.schema[id_name]
    vec_f = df.schema[vec_col]
    schema = T.StructType(
        [
            T.StructField(id_name, id_f.dataType, id_f.nullable),
            T.StructField(vec_col, vec_f.dataType, vec_f.nullable),
            T.StructField("cluster", T.IntegerType()),
        ]
    )

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.array(list(pdf[vec_col]), dtype=np.float64)
            cells = np.argmin(half_cc[None, :] - X @ Cc.T, axis=1)
            out = np.empty(len(X), dtype=np.int64)
            for cell in np.unique(cells):
                m = cells == cell
                Fm, hf = Fs[cell], half_fs[cell]
                local = np.argmin(hf[None, :] - X[m] @ Fm.T, axis=1)
                out[m] = offsets[cell] + local
            yield pd.DataFrame(
                {
                    id_name: pdf[id_name],
                    vec_col: pdf[vec_col],
                    "cluster": out.astype("int32"),
                }
            )

    return df.select(id_name, vec_col).mapInPandas(assign, schema)


# --------------------------------------------------------------- PQ ANN

def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 4,
    n_codes: int = 16,
    k: int = 3,
    train_iters: int = 0,
) -> DataFrame:
    """Product-quantization ANN (the Jégou/FAISS recipe) in EXACT
    integer arithmetic: vectors quantize to scaled int64
    (``KMEANS_SCALE``), split into ``m`` subspaces; each subspace gets
    an ``n_codes``-entry codebook (``train_iters=0`` pins codebooks to
    the lowest-id vectors' sub-slices — the SQL-witness form, like
    ivf_topk_fixed; ``train_iters>0`` runs the exact-integer Lloyd
    trainer per subspace); every corpus vector compresses to ``m``
    one-byte codes; queries score by Asymmetric Distance Computation
    over a per-query distance TABLE (m × n_codes exact-int L2² cells),
    so the scan touches codes, never raw vectors.

    100 TB shape: codes are m bytes/vector (64-dim float32 → 4 bytes:
    a 64× compression of the scan side); the codebooks and the query
    distance tables are the only collected state (codebook-sized and
    query-sized); candidate pruning happens per PARTITION inside the
    scoring mapInPandas (≤ n_queries × k rows leave each partition),
    so the final rank shuffle moves candidates, not the corpus.
    All distances are exact BIGINTs — ties break on the lowest
    neighbor id, bit-identical in DuckDB SQL."""
    import numpy as np

    dim_row = corpus.select(F.size(vec_col)).first()
    dim = int(dim_row[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m

    # ---- codebooks (collected: n_codes rows, codebook-sized)
    base = corpus.orderBy(id_col).limit(n_codes).select(vec_col).collect()
    X0 = _scaled_int_matrix([r[0] for r in base])
    books = [X0[:, s * sub : (s + 1) * sub].copy() for s in range(m)]
    if train_iters > 0:
        for s in range(m):
            sliced = corpus.select(
                F.col(id_col),
                F.slice(F.col(vec_col), s * sub + 1, sub).alias("_v"))
            cents = train_kmeans_quantized(
                sliced, id_col, "_v", n_centroids=n_codes,
                lloyd_iters=train_iters)
            books[s] = np.array(cents, dtype=np.int64)

    # ---- query distance tables (queries collected: query-sized)
    qrows = queries.select(id_col, vec_col).orderBy(id_col).collect()
    qids = [int(r[0]) for r in qrows]
    Q = _scaled_int_matrix([r[1] for r in qrows])
    # dtab[qi, s, c] = exact L2^2 between query sub-vector and code c
    dtab = np.empty((len(qids), m, n_codes), dtype=np.int64)
    for s in range(m):
        qs = Q[:, s * sub : (s + 1) * sub]
        d = qs[:, None, :] - books[s][None, :, :]
        dtab[:, s, :] = (d * d).sum(axis=2)

    spark = corpus.sparkSession
    b_books = spark.sparkContext.broadcast([b.copy() for b in books])
    b_dtab = spark.sparkContext.broadcast(dtab)
    b_qids = spark.sparkContext.broadcast(qids)

    out_schema = ("query_id long, neighbor_id long, adist long")

    def score(batches):
        import pandas as pd

        bb = b_books.value
        dt = b_dtab.value
        qi = np.array(b_qids.value, dtype=np.int64)
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            X = _scaled_int_matrix(pdf[vec_col])
            # encode: per subspace argmin (numpy argmin = first min,
            # the lowest-code tie-break the oracle replays)
            codes = np.empty((len(ids), m), dtype=np.int64)
            for s in range(m):
                xs = X[:, s * sub : (s + 1) * sub]
                d = xs[:, None, :] - bb[s][None, :, :]
                codes[:, s] = (d * d).sum(axis=2).argmin(axis=1)
            # ADC: adist[q, v] = sum_s dtab[q, s, codes[v, s]]
            ad = np.zeros((len(qi), len(ids)), dtype=np.int64)
            for s in range(m):
                ad += dt[:, s, :][:, codes[:, s]]
            rows = []
            for q in range(len(qi)):
                mask = ids != qi[q]
                cand = np.where(mask)[0]
                if not len(cand):
                    continue
                # per-partition prune: k smallest (adist, id) leave
                order = np.lexsort((ids[cand], ad[q][cand]))[:k]
                for j in cand[order]:
                    rows.append({"query_id": int(qi[q]),
                                 "neighbor_id": int(ids[j]),
                                 "adist": int(ad[q][j])})
            yield pd.DataFrame(
                rows, columns=["query_id", "neighbor_id", "adist"])

    from pyspark.sql import Window

    cands = corpus.select(id_col, vec_col).mapInPandas(score, out_schema)
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("adist").asc(), F.col("neighbor_id").asc()))
    return (cands.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.col("rank").cast("int").alias("rank"), "adist"))


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 4,
    n_codes: int = 16,
    k: int = 3,
    train_iters: int = 0,
) -> DataFrame:
    """IVF-PQ — the canonical at-scale ANN index (FAISS IVFPQ): a
    coarse quantizer partitions the corpus into cells, every vector
    stores only its cell id + the PQ codes of its RESIDUAL
    (vector − cell centroid), and a query probes its ``n_probe``
    nearest cells scoring candidates by per-cell ADC tables (the
    query residualizes against each probed centroid, so one query
    carries ``n_probe`` distance tables).

    Exact-integer end to end: scaled-int64 vectors, pinned coarse
    centroids and residual codebooks (the lowest-id vectors — the SQL
    witness form the graded oracle replays bit-for-bit).
    ``train_iters > 0`` instead trains BOTH quantizers with the
    exact-integer Lloyd trainer — coarse cells over the raw vectors,
    then per-subspace residual codebooks over the distributed
    residual frame (assignment via rank_clusters_scaled, residual =
    zip_with subtraction, all DataFrame ops; only centroid-sized
    state collects) — the FAISS-recipe trained index, still
    bit-deterministic across partitionings.  100 TB shape: the scan side is
    (cell_id, m bytes) per vector; only centroids, codebooks and the
    query tables are collected/broadcast; candidates prune per
    partition before the final rank shuffle."""
    import numpy as np

    dim = int(corpus.select(F.size(vec_col)).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m

    if train_iters == 0:
        # pinned SQL-witness form: coarse centroids and residual
        # codebooks from the lowest-id vectors
        base = corpus.orderBy(id_col).limit(max(n_cells, n_codes)) \
            .select(id_col, vec_col).collect()
        Xb = _scaled_int_matrix([r[1] for r in base])
        cents = Xb[:n_cells]                   # coarse centroids

        def _assign(X):
            d = X[:, None, :] - cents[None, :, :]
            return (d * d).sum(axis=2).argmin(axis=1)

        cb_base = Xb[:n_codes]
        rb = cb_base - cents[_assign(cb_base)]
        books = [rb[:, s * sub : (s + 1) * sub].copy()
                 for s in range(m)]
    else:
        cents = np.array(
            train_kmeans_quantized(corpus, id_col, vec_col,
                                   n_centroids=n_cells,
                                   lloyd_iters=train_iters),
            dtype=np.int64)
        books = [None] * m
        # distributed residual frame: exact-int assignment + zip_with
        # subtraction, then the exact-int Lloyd trainer per subspace
        spark_ = corpus.sparkSession
        sv = corpus.select(
            F.col(id_col).alias("_id"),
            F.transform(
                F.col(vec_col),
                lambda x: F.floor(
                    x.cast("double") * F.lit(float(KMEANS_SCALE))
                    + F.lit(0.5)).cast("long")).alias("_sx"))
        assigned = rank_clusters_scaled(
            sv, "_id", "_sx", cents.tolist(), already_scaled=True)
        cent_df = spark_.createDataFrame(
            [(int(c), [int(v) for v in cents[c]])
             for c in range(n_cells)], "cluster int, _cv array<long>")
        resid = (assigned.join(F.broadcast(cent_df), "cluster")
                 .select("_id", F.zip_with(
                     "_sx", "_cv", lambda x, c: x - c).alias("_r")))
        # localCheckpoint, not cache: the residual frame sits under a
        # lambda-bearing plan (transform/zip_with), where cache-lookup
        # canonicalization fails (llm/minhash r15 finding) — a cache()
        # was never read and every sub-quantizer slice re-ran the
        # assignment chain; checkpoint shares by RDD identity
        resid = resid.transform(cut)
        for s in range(m):
            sliced = resid.select(
                "_id",
                F.slice(F.col("_r"), s * sub + 1, sub).alias("_v"))
            books[s] = np.array(
                train_kmeans_quantized(sliced, "_id", "_v",
                                       n_centroids=n_codes,
                                       lloyd_iters=train_iters,
                                       already_scaled=True),
                dtype=np.int64)


    qrows = queries.select(id_col, vec_col).orderBy(id_col).collect()
    qids = np.array([int(r[0]) for r in qrows], dtype=np.int64)
    Q = _scaled_int_matrix([r[1] for r in qrows])
    # probe lists + per-(query, probed-cell) ADC tables
    dq = Q[:, None, :] - cents[None, :, :]
    cell_d = (dq * dq).sum(axis=2)             # (nq, n_cells)
    probe = np.argsort(cell_d, kind="stable", axis=1)[:, :n_probe]
    # dtabs[qi][p][s][c]
    dtabs = np.empty((len(qids), n_probe, m, n_codes), dtype=np.int64)
    for qi in range(len(qids)):
        for p in range(n_probe):
            qr = Q[qi] - cents[probe[qi, p]]
            for s in range(m):
                d = qr[s * sub : (s + 1) * sub][None, :] - books[s]
                dtabs[qi, p, s] = (d * d).sum(axis=1)

    spark = corpus.sparkSession
    b_cents = spark.sparkContext.broadcast(cents.copy())
    b_books = spark.sparkContext.broadcast([b.copy() for b in books])
    b_probe = spark.sparkContext.broadcast(probe.copy())
    b_dtabs = spark.sparkContext.broadcast(dtabs.copy())
    b_qids = spark.sparkContext.broadcast(qids.copy())

    out_schema = "query_id long, neighbor_id long, adist long"

    def score(batches):
        import pandas as pd

        C = b_cents.value
        bb = b_books.value
        pr = b_probe.value
        dt = b_dtabs.value
        qi_all = b_qids.value
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            X = _scaled_int_matrix(pdf[vec_col])
            d = X[:, None, :] - C[None, :, :]
            cell = (d * d).sum(axis=2).argmin(axis=1)
            R = X - C[cell]
            codes = np.empty((len(ids), m), dtype=np.int64)
            for s in range(m):
                rs = R[:, s * sub : (s + 1) * sub]
                dd = rs[:, None, :] - bb[s][None, :, :]
                codes[:, s] = (dd * dd).sum(axis=2).argmin(axis=1)
            rows = []
            for qi in range(len(qi_all)):
                for p in range(pr.shape[1]):
                    c = pr[qi, p]
                    sel = np.where((cell == c)
                                   & (ids != qi_all[qi]))[0]
                    if not len(sel):
                        continue
                    ad = np.zeros(len(sel), dtype=np.int64)
                    for s in range(m):
                        ad += dt[qi, p, s][codes[sel, s]]
                    order = np.lexsort((ids[sel], ad))[:k]
                    for j in order:
                        rows.append({
                            "query_id": int(qi_all[qi]),
                            "neighbor_id": int(ids[sel[j]]),
                            "adist": int(ad[j])})
            yield pd.DataFrame(
                rows, columns=["query_id", "neighbor_id", "adist"])

    cands = corpus.select(id_col, vec_col).mapInPandas(score, out_schema)
    w = (Window.partitionBy("query_id")
         .orderBy(F.col("adist").asc(), F.col("neighbor_id").asc()))
    return (cands.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.col("rank").cast("int").alias("rank"), "adist"))


def ivfpq_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    n_probe: int = 4,
    m: int = 4,
    n_codes: int = 16,
    candidates: int = 20,
    k: int = 3,
    train_iters: int = 0,
) -> DataFrame:
    """The full production ANN serving stack: IVF-PQ generates
    ``candidates`` approximate neighbors per query (codes-only scan),
    then the EXACT cosine reranks just those candidates against their
    raw vectors — the two-stage shape every FAISS deployment runs,
    where the expensive float math touches ``candidates × queries``
    vectors instead of the corpus.

    The candidate join is an equi-join on the corpus id (broadcast of
    the candidate list — query-sized × candidates); output is
    (query_id, neighbor_id, rank, cosine) with the same rounding and
    tie-break contract as cosine_topk, so swapping brute force for
    this stack is a drop-in."""
    cands = ivfpq_topk(corpus, queries, id_col, vec_col,
                       n_cells=n_cells, n_probe=n_probe, m=m,
                       n_codes=n_codes, k=candidates,
                       train_iters=train_iters)
    cvec = corpus.select(F.col(id_col).alias("neighbor_id"),
                         F.col(vec_col).alias("__cv"),
                         _norm(F.col(vec_col)).alias("__cn"))
    qvec = queries.select(F.col(id_col).alias("query_id"),
                          F.col(vec_col).alias("__qv"),
                          _norm(F.col(vec_col)).alias("__qn"))
    scored = (cands.select("query_id", "neighbor_id")
              .join(cvec, "neighbor_id")
              .join(F.broadcast(qvec), "query_id")
              .select("query_id", "neighbor_id",
                      (_dot(F.col("__qv"), F.col("__cv"))
                       / (F.col("__qn") * F.col("__cn"))).alias("__cos")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("__cos").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id",
                    F.col("rank").cast("int").alias("rank"),
                    F.round("__cos", 4).alias("cosine")))


def ann_recall(ann: DataFrame, exact: DataFrame, k: int = 3) -> DataFrame:
    """Per-query recall@k of an ANN result against the exact top-k —
    the metric that says whether an index FINDS things, not just
    whether its arithmetic replays.  Both inputs carry the
    (query_id, neighbor_id, rank) contract every top-k operator here
    emits; rows with rank > k are ignored so a ``candidates``-sized
    ANN result can be scored at any k ≤ its depth.

    Returns (query_id, n_hits, n_exact, recall).  Both frames are
    query-sized (queries × k rows), so the join is broadcast-trivial
    at any corpus scale — recall measurement never touches the
    corpus."""
    a = (ann.filter(F.col("rank") <= k)
         .select("query_id", "neighbor_id"))
    e = (exact.filter(F.col("rank") <= k)
         .select("query_id", "neighbor_id"))
    base = e.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    hits = (e.join(a, ["query_id", "neighbor_id"])
            .groupBy("query_id").agg(F.count("*").alias("n_hits")))
    return (base.join(hits, "query_id", "left")
            .na.fill(0, ["n_hits"])
            .select("query_id",
                    F.col("n_hits").cast("int").alias("n_hits"),
                    F.col("n_exact").cast("int").alias("n_exact"),
                    F.round(F.col("n_hits") / F.col("n_exact"), 4)
                     .alias("recall")))


def ann_recall_summary(ann: DataFrame, exact: DataFrame,
                       k: int = 3) -> DataFrame:
    """One-row macro-average of :func:`ann_recall`:
    (n_queries, mean_recall) — the number a SCALE.md table or an
    index-tuning sweep records per (index, n_probe) setting."""
    per_q = ann_recall(ann, exact, k=k)
    return per_q.agg(
        F.count("*").cast("int").alias("n_queries"),
        F.round(F.avg("recall"), 4).alias("mean_recall"))
