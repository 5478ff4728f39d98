"""Scale-up generator for soak testing: replicate an existing sf dir N×
with key-space shifts so referential integrity holds, per-copy text
mutation so duplicate/near-duplicate RATES stay constant (a naive N×
union would give every document N-1 exact copies and blow candidate
generation up quadratically, testing a distribution no real corpus has),
and per-copy embedding perturbation for the same reason.

    python tools/make_sf.py SRC_DIR DST_DIR N_COPIES [only_tables] [--skew]

``--skew`` injects HOSTILE zipfian skew after scaling — the
distributions a real crawl has and uniform replication hides:

- mega-user: 30% of events collapse onto ONE user_id (stresses
  per-user windows, keep-latest, sessionization);
- mega-domain: 30% of documents collapse onto ONE source (stresses
  domain_cap's salted top-N);
- boilerplate cluster: 5% of documents become the SAME ~70-word
  boilerplate plus a per-doc id tail (stresses the LSH hot-bucket cap
  and near-dup connected components with one giant cluster);
- hot order key: 10% of lineitem rows point at ONE l_orderkey
  (stresses the fact-side join skew AQE must split).

The driver's testdata is read-only and its generator is not shipped, so
soak inputs are derived from sf0.1: identical schemas and value
distributions, N× the rows.  Output tables are DIRECTORIES named
``{name}.parquet`` (multi-part) — spark.read.parquet handles both forms,
and multi-part is what a real 100 TB table looks like anyway.
"""

from __future__ import annotations

import os
import string
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import DataFrame  # noqa: E402

from verified_sources_spark.catalog import TABLES, load_table  # noqa: E402
from verified_sources_spark.session import get_spark  # noqa: E402

# key columns to shift per table: (column, keyspace-of table)
KEY_SHIFTS: dict[str, list[tuple[str, str]]] = {
    "customer": [("c_custkey", "customer")],
    "supplier": [("s_suppkey", "supplier")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "orders"), ("o_custkey", "customer")],
    "lineitem": [
        ("l_orderkey", "orders"),
        ("l_partkey", "part"),
        ("l_suppkey", "supplier"),
    ],
    "events": [("event_id", "events"), ("user_id", "users")],
    "documents": [("doc_id", "documents")],
    "embeddings": [("vec_id", "embeddings")],
}

# dimension tables replicated as-is (copy 0 only)
STATIC = ("region", "nation")

LETTERS = string.ascii_lowercase


def _mutation_perm(i: int) -> tuple[str, str]:
    """Per-copy character substitution: a deterministic Fisher-Yates
    permutation of the lowercase alphabet keyed on the copy index.
    Length- and token-structure-preserving; duplicate structure WITHIN a
    copy is preserved exactly, and across copies the substituted texts
    differ (26! permutation space — the old Caesar rotation had only 25
    distinct values and ``(7*i)%26`` aliased copies 15/26 etc., making
    whole copies exact duplicates, the blow-up this tool exists to avoid)."""
    mask = (1 << 64) - 1
    state = (i * 0x9E3779B97F4A7C15) & mask

    def rnd(n: int) -> int:  # splitmix64 stream
        nonlocal state
        state = (state + 0x9E3779B97F4A7C15) & mask
        z = state
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & mask
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & mask
        return (z ^ (z >> 31)) % n

    letters = list(LETTERS)
    for j in range(len(letters) - 1, 0, -1):
        k = rnd(j + 1)
        letters[j], letters[k] = letters[k], letters[j]
    out = "".join(letters)
    if out == LETTERS:  # identity would re-create an exact copy
        out = LETTERS[1:] + LETTERS[:1]
    return LETTERS, out


BOILERPLATE = (
    "subscribe to our newsletter for updates terms of service apply "
    "privacy policy cookie settings all rights reserved contact us about "
    "careers press sitemap help center community guidelines do not sell "
    "my information copyright twenty twenty four the company inc this "
    "site uses cookies to improve your experience by continuing you "
    "agree to the use of cookies read more accept decline manage "
    "preferences follow us on social media download our app available "
    "on all platforms sign in register forgot password"
)


def apply_skew(name: str, df: DataFrame) -> DataFrame:
    """Post-scale hostile skew (deterministic via xxhash64 on the row
    key, so reruns produce the same dataset)."""
    if name == "events":
        return df.withColumn(
            "user_id",
            F.when(F.pmod(F.xxhash64("event_id"), F.lit(10)) < 3, F.lit(1))
            .otherwise(F.col("user_id")).cast("long"),
        )
    if name == "documents":
        df = df.withColumn(
            "source",
            F.when(
                F.pmod(F.xxhash64("doc_id"), F.lit(10)) < 3,
                F.lit("megadomain.example"),
            ).otherwise(F.col("source")),
        )
        return df.withColumn(
            "text",
            F.when(
                F.pmod(F.xxhash64("doc_id"), F.lit(20)) == 0,
                F.concat(F.lit(BOILERPLATE + " id"), F.col("doc_id").cast("string")),
            ).otherwise(F.col("text")),
        )
    if name == "lineitem":
        return df.withColumn(
            "l_orderkey",
            F.when(
                F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(10)) == 0,
                F.lit(1),
            ).otherwise(F.col("l_orderkey")).cast("long"),
        )
    return df


def scale_table(spark, src: str, name: str, n_copies: int, spans: dict[str, int]) -> DataFrame:
    base = load_table(spark, src, name)
    if name in STATIC:
        return base
    copies = []
    for i in range(n_copies):
        c = base
        for col, space in KEY_SHIFTS.get(name, []):
            c = c.withColumn(col, (F.col(col) + F.lit(i * spans[space])).cast("long"))
        if i > 0 and name == "documents":
            frm, to = _mutation_perm(i)
            c = c.withColumn("text", F.translate(F.col("text"), frm, to))
        if i > 0 and name == "embeddings":
            # deterministic per-copy sign mask from a hash of (copy, dim):
            # norms preserved; masks of two copies agree on ~half the dims,
            # so cross-copy cosine collapses toward 0 — no artificial dups
            # (a periodic mask here once made copies 3 apart IDENTICAL and
            # inflated the corpus dup rate to 60%)
            c = c.withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x, j: F.when(
                        F.pmod(
                            F.xxhash64(F.concat_ws(":", F.lit(str(i)), j.cast("string"))),
                            F.lit(2),
                        )
                        == 0,
                        -x,
                    ).otherwise(x),
                ),
            )
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--skew"]
    skew = "--skew" in sys.argv[1:]
    src, dst, n = args[0], args[1], int(args[2])
    spark = get_spark("make-sf")
    spark.sparkContext.setLogLevel("ERROR")
    # keyspace spans (max+1) from the source so shifted copies never collide
    spans = {
        "customer": load_table(spark, src, "customer").agg(F.max("c_custkey")).first()[0] + 1,
        "supplier": load_table(spark, src, "supplier").agg(F.max("s_suppkey")).first()[0] + 1,
        "part": load_table(spark, src, "part").agg(F.max("p_partkey")).first()[0] + 1,
        "orders": load_table(spark, src, "orders").agg(F.max("o_orderkey")).first()[0] + 1,
        "events": load_table(spark, src, "events").agg(F.max("event_id")).first()[0] + 1,
        "users": load_table(spark, src, "events").agg(F.max("user_id")).first()[0] + 1,
        "documents": load_table(spark, src, "documents").agg(F.max("doc_id")).first()[0] + 1,
        "embeddings": load_table(spark, src, "embeddings").agg(F.max("vec_id")).first()[0] + 1,
    }
    only = set(args[3].split(",")) if len(args) > 3 and args[3] else None
    os.makedirs(dst, exist_ok=True)
    for name in TABLES:
        if only is not None and name not in only:
            continue
        out = scale_table(spark, src, name, n, spans)
        if skew:
            out = apply_skew(name, out)
        out.write.mode("overwrite").parquet(f"{dst}/{name}.parquet")
        print(f"{name}: {out.count()} rows", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
