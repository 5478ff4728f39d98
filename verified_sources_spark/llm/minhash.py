"""MinHash + LSH near-duplicate detection.

shingle → k seeded min-hashes → band → bucket-join:

- Signatures are pure Column expressions (array_min over md5(seed|shingle))
  — JVM-side, no UDFs.  md5 is used (not xxhash64) so the DuckDB oracle
  can reproduce signatures bit-for-bit; swap ``_hash_fn`` for xxhash64 in
  production for ~4x hash throughput.
- Candidate generation groups by (band_idx, band_hash): documents agreeing
  on any band meet in one bucket.  The self-join shuffles only
  (band_hash, doc_id) pairs — signature-sized, not document-sized — and
  the bucket join is an equi-join Catalyst executes as a hash join.
  All-pairs comparison never happens; cost is O(n·k + candidate pairs).
- Exact verification (``ngram_jaccard``) runs only on candidates.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from verified_sources_spark.functions.text import shingles, tokens


def _minhash_col(shingle_col, seed: int):
    return F.array_min(
        F.transform(shingle_col, lambda s: F.md5(F.concat(F.lit(f"{seed}|"), s)))
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 8, shingle_n: int = 3
) -> DataFrame:
    """(id, mh_0..mh_{k-1}) — k independent min-hashes over word shingles.
    Documents too short to shingle get NULL signatures (excluded from LSH)."""
    sh = shingles(text_col, shingle_n)
    out = df.select(
        F.col(id_col),
        *[_minhash_col(sh, i).alias(f"mh_{i}") for i in range(k)],
    )
    return out


def _shingleable(text_col: str, shingle_n: int):
    from verified_sources_spark.functions.text import tokens

    return F.size(tokens(text_col)) >= shingle_n


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket_size: int = 1024,
    sub_buckets: int = 32,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing at least one LSH band.

    Per-bucket work is bounded by ``max_bucket_size``: web-scale corpora are
    boilerplate-heavy (cookie banners, templated pages), so one hot band hash
    can hold millions of near-identical docs — quadratic pair expansion there
    would serialize the job into one multi-GB straggler task.  Buckets at or
    under the cap expand all pairs (the precise LSH contract); buckets over
    the cap degrade to a star around the bucket's minimum id — O(n) pairs
    that keep the cluster connected, which is what dedup grouping consumes.

    The cap is enforced with a two-level salted aggregation so no over-cap
    bucket is ever collected into one array:

    1. level 1 groups by (band, salt = xxhash64(id) % sub_buckets).  A
       sub-bucket over the cap *proves* the whole bucket is hot (n >= cnt_s),
       so its members star-link to the sub-bucket minimum right here and its
       array never leaves level 1.
    2. level 2 merges sub-buckets per band hash: exact size/min from count/min
       aggregates, member lists only from sub-buckets at or under the cap —
       every collected row is <= sub_buckets * max_bucket_size elements.
       Buckets <= cap are provably complete there (each sub-bucket <= n <= cap)
       and expand exactly as before; hot buckets star their surviving members
       and all sub-bucket minima to the global minimum, which stitches the
       level-1 stars into one connected component.

    Residual skew: a level-1 sub-bucket of a hot cluster still buffers
    ~n/sub_buckets ids in its aggregation buffer — 32x smaller than the
    unsalted collect and linear, not quadratic, in task time.  The single
    band-key shuffle also means a hot bucket's banded rows land in one
    partition; every per-partition step there is linear (salted buffers,
    star expansion), so the straggler degrades to a linear scan of skinny
    (id, band) rows instead of a quadratic pair blow-up.
    """
    assert k % bands == 0, "k must divide into equal bands"
    rows_per_band = k // bands
    # pre-filter un-shingleable docs on the cheap token count BEFORE the
    # signature projection: an na.drop() after it would push a Filter that
    # duplicates all k signature expressions (2x the hash work)
    sig = minhash_signatures(
        df.filter(_shingleable(text_col, shingle_n)), id_col, text_col, k, shingle_n
    )
    band_cols = []
    for b in range(bands):
        parts = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band_idx"), F.md5(F.concat_ws("|", *parts)).alias("band_hash"))
        )
    banded = sig.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("band")
    ).select(id_col, "band.band_idx", "band.band_hash")
    # bucket-grouped pair expansion instead of a self-join: signatures are
    # computed once (a self-join would re-derive them for both sides)
    cap = F.lit(max_bucket_size)
    # one explicit shuffle on the band keys serves every stage downstream:
    # hash partitioning on (band_idx, band_hash) satisfies the clustering
    # requirement of BOTH the salted level-1 groupBy (subset rule) and the
    # level-2 groupBy, so neither adds an exchange, and the sub-star branch
    # reuses the same exchange.  This keeps the capped plan at the exact
    # two-shuffle shape of the uncapped one (band shuffle + final distinct).
    banded = banded.repartition("band_idx", "band_hash")
    l1 = banded.groupBy(
        "band_idx",
        "band_hash",
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(sub_buckets)).alias("salt"),
    ).agg(
        F.count(F.lit(1)).alias("cnt_s"),
        F.min(F.col(id_col)).alias("min_s"),
        F.collect_list(F.col(id_col)).alias("ids_s"),
    )
    sub_star = (
        l1.filter(F.col("cnt_s") > cap)
        .select(F.col("min_s").alias("id_a"), F.explode("ids_s").alias("id_b"))
        .filter(F.col("id_a") != F.col("id_b"))
    )
    kept = F.when(F.col("cnt_s") <= cap, F.col("ids_s")).otherwise(
        F.slice(F.col("ids_s"), 1, 0)
    )
    l2 = l1.groupBy("band_idx", "band_hash").agg(
        F.sum("cnt_s").alias("bucket_n"),
        F.min("min_s").alias("bucket_rep"),
        F.flatten(F.collect_list(kept)).alias("ids"),
        F.collect_list("min_s").alias("sub_reps"),
    )
    tail = lambda ids, i: F.slice(  # noqa: E731 — ids[i+2:], the combos tail
        ids, i + 2, F.greatest(F.size(ids) - i - 1, F.lit(0))
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                tail(F.col("ids"), i),
                lambda y: F.struct(
                    F.least(x, y).alias("id_a"), F.greatest(x, y).alias("id_b")
                ),
            ),
        )
    )
    small_pairs = (
        l2.filter((F.col("bucket_n") >= 2) & (F.col("bucket_n") <= cap))
        .select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b")
    )
    # hot bucket star: rep = global minimum, so rep < member always and the
    # (id_a < id_b) ordering holds without least/greatest
    hot_star = (
        l2.filter(F.col("bucket_n") > cap)
        .select(
            F.col("bucket_rep"),
            F.explode(F.concat("ids", "sub_reps")).alias("member"),
        )
        .filter(F.col("member") != F.col("bucket_rep"))
        .select(F.col("bucket_rep").alias("id_a"), F.col("member").alias("id_b"))
    )
    return small_pairs.unionByName(hot_star).unionByName(sub_star).distinct()


def ngram_jaccard(
    df: DataFrame,
    id_col: str,
    text_col: str,
    pairs: DataFrame | None = None,
    shingle_n: int = 3,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact shingle-set Jaccard for given candidate pairs (or LSH pairs if
    none given): |A∩B| / |A∪B| on distinct shingles.

    The shingle arrays are joined to the (small) pair list — at scale the
    pair side is the result of LSH so it is orders of magnitude smaller
    than the corpus; broadcast when it fits."""
    if pairs is None:
        pairs = lsh_candidate_pairs(df, id_col, text_col, shingle_n=shingle_n)
    sets = df.select(
        F.col(id_col), F.array_distinct(shingles(text_col, shingle_n)).alias("sh")
    )
    out = (
        pairs.join(sets.withColumnsRenamed({id_col: "id_a", "sh": "sh_a"}), "id_a")
        .join(sets.withColumnsRenamed({id_col: "id_b", "sh": "sh_b"}), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
