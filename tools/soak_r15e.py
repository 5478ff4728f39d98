"""Round-15e soaks: link_rank / budget_apportionment /
fetch_schedule at volume, with each op's worst skew shape.

Shapes (all Column-expr synthetic, no driver data):

- link_rank: 100k-node graph, ~3 edges/node (id -> id*7%N, id*13%N,
  id+1%N); SKEW: a celebrity dst — half of all edges point at node 0
  (the dst-keyed contribution sum's hot key, absorbed by partial
  aggregation).
- budget_apportionment: 100k weight rows into G groups; G=7 (the
  real regime) and G=10k (stress the one-partition ranking window —
  still trivially small post-aggregation).
- fetch_schedule: 100k URLs over 1k hosts; SKEW: one host owns 50%
  of the frontier (the politeness window's inherent serialization —
  the partition is processed by one task, which is the semantics).

Usage: python tools/soak_r15e.py [n]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000

    from pyspark.sql import functions as F

    from verified_sources_spark.llm.corpus import budget_apportionment
    from verified_sources_spark.llm.crawlgov import fetch_schedule
    from verified_sources_spark.llm.linkgraph import link_rank
    from verified_sources_spark.session import get_spark

    spark = get_spark("soak-r15e")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    ids = spark.range(n).withColumnRenamed("id", "doc_id")
    ids = ids.repartition(cores).persist()
    ids.count()

    def run(label, fn):
        t0 = time.time()
        rows = fn()
        dt = time.time() - t0
        print(f"  {label} n={n}: {dt:.1f}s, {rows} rows, "
              f"{n / dt / cores:.0f} rows/s/core", flush=True)

    def edges(skew: bool):
        e1 = ids.select((F.col("doc_id")).alias("src"),
                        ((F.col("doc_id") * 7) % n).alias("dst"))
        e2 = ids.select((F.col("doc_id")).alias("src"),
                        ((F.col("doc_id") * 13) % n).alias("dst"))
        e3 = ids.select(
            (F.col("doc_id")).alias("src"),
            (F.lit(0) if skew
             else ((F.col("doc_id") + 1) % n)).alias("dst"))
        return e1.union(e2).union(e3)

    for skew in (False, True):
        tag = "celebrity-dst" if skew else "uniform"

        def _lr(skew=skew):
            out = link_rank(edges(skew), "src", "dst", iterations=2)
            r = out.count()
            out.release_edges()
            return r

        run(f"link_rank[{tag}]", _lr)

    for g in (7, 10_000):
        def _ba(g=g):
            w = ids.select(
                (F.col("doc_id") % g).cast("string").alias("grp"),
                (F.col("doc_id") % 997 + 1).alias("w"))
            return budget_apportionment(
                w, "grp", "w", 10**12).count()

        run(f"budget_apportionment[G={g}]", _ba)

    for skew in (False, True):
        tag = "one-hot-host" if skew else "uniform"

        def _fs(skew=skew):
            host_id = (F.when(F.col("doc_id") % 2 == 0, 0)
                       .otherwise(F.col("doc_id") % 1000)
                       if skew else F.col("doc_id") % 1000)
            fr = ids.select(
                F.concat(F.lit("h"), host_id.cast("string"),
                         F.lit(".example")).alias("host"),
                F.concat(F.lit("https://x/p/"),
                         F.col("doc_id").cast("string")).alias("url"),
                F.when(F.col("doc_id") % 3 == 0, 500)
                .otherwise(1000).cast("long")
                .alias("crawl_delay_ms"))
            return fetch_schedule(fr).count()

        run(f"fetch_schedule[{tag}]", _fs)

    spark.stop()


if __name__ == "__main__":
    main()
