"""Round-15 soaks: crawl_corpus_docs at volume — the heaviest r14
composed chain (frontier expansion + WARC parse + HTML extraction +
cross-host dedup window) and the one graded entry with no SCALE.md
volume/skew row — plus the r15 WET/WAT doors at volume.

1. crawl_corpus at N uniform hosts: the shared-page groups
   (`/shared/{doc_id%5}`) each cover ~N/5 hosts — already a
   hot-key test at 100k (each group ≈20k rows in one dedup window
   partition).
2. crawl_corpus SKEWED: ids chosen so doc_id%5==0 on ~50% of hosts —
   ONE shared page duplicated across half the corpus, the shape the
   r15 md5+null-salt window key fix must absorb (nulls salt across
   1024 partitions; the hot md5 group is a count/min aggregation,
   not a collect).
3. wet_text / wat_metadata at N docs (mint + record walk + charset
   decode / JSON envelope per doc).

Each shape writes its doc_id spine to a temp parquet and drives the
GRADED query function unmodified.

Usage: python tools/soak_r15.py [n_docs]
"""

from __future__ import annotations

import shutil
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000

    from pyspark.sql import functions as F

    from verified_sources_spark.plans.queries import QUERIES
    from verified_sources_spark.session import get_spark

    spark = get_spark("soak-r15")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    def spine(path: str, ids_df) -> str:
        shutil.rmtree(path, ignore_errors=True)
        ids_df.write.mode("overwrite").parquet(
            f"{path}/documents.parquet")
        return path

    def run(label: str, qname: str, sf_dir: str, docs: int) -> None:
        t0 = time.time()
        rows = QUERIES[qname](spark, sf_dir).count()
        dt = time.time() - t0
        rate = docs / dt / cores
        print(f"  {label}: {dt:.1f}s, {rows} rows, "
              f"{rate:.0f} hosts/s/core", flush=True)

    uni = spine("/tmp/soak_r15_uniform",
                spark.range(n).withColumnRenamed("id", "doc_id"))
    run(f"crawl_corpus @ {n} uniform hosts", "crawl_corpus_docs",
        uni, n)

    # skew: ~50% of hosts carry the SAME shared page (doc_id%5 == 0)
    half = n // 2
    skew_ids = (
        spark.range(half).select((F.col("id") * 5).alias("doc_id"))
        .unionAll(
            spark.range((n - half) // 4).select(
                F.explode(F.array(*[F.col("id") * 5 + F.lit(r)
                                    for r in range(1, 5)]))
                .alias("doc_id"))))
    n_skew = half + 4 * ((n - half) // 4)
    skew = spine("/tmp/soak_r15_skew", skew_ids)
    run(f"crawl_corpus @ {n_skew} hosts, shared page on 50%",
        "crawl_corpus_docs", skew, n_skew)

    # the WET mint embeds the doc text — give the spine one
    texted = spine(
        "/tmp/soak_r15_texted",
        spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("soak body text for doc "),
                     F.col("id")).alias("text")))
    run(f"wet_text @ {n}", "wet_text_docs", texted, n)
    run(f"wat_metadata @ {n}", "wat_metadata_docs", texted, n)


if __name__ == "__main__":
    main()
