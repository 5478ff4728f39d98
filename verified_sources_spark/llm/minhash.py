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
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing at least one LSH band."""
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
    # computed once (a self-join would re-derive them for both sides), and
    # the only shuffle is the groupBy on the band hash.  Bucket sizes are
    # small by LSH construction; a pathologically hot bucket means an
    # exact-dup cluster that exact_dedup should have collapsed first.
    buckets = banded.groupBy("band_idx", "band_hash").agg(
        F.collect_list(F.col(id_col)).alias("ids")
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
    pairs = (
        buckets.filter(F.size("ids") >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )
    return pairs


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
