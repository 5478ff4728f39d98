"""Round-15b soak: dsir_importance_docs at volume.

Drives the UNMODIFIED graded query function over synthetic documents
spines (doc_id + generated text, built by Spark expressions — no
driver-side data) at N docs:

1. UNIFORM: 40-token docs over a 5000-word vocabulary; the benchmark
   spine (doc_id % 50 == 0) draws from a narrower 500-word slice so a
   genuine target/raw ratio structure exists.
2. CONCENTRATED: half of every doc's tokens are ONE word — a single
   hashed bucket holds ~50% of all occurrences.  The op is
   skew-resistant by construction (count tables are map-side-combined
   aggregates, the scoring join is broadcast, the per-doc groupBy is
   keyed by doc_id), so the rate should hold; this shape proves it.

Usage: python tools/soak_r15b.py [n_docs]
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

    spark = get_spark("soak-r15b")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    def text_expr(concentrated: bool):
        """Ring vocabularies give UNAMBIGUOUS planted ground truth:
        every ring-A document (the target spine %50==0 plus the 10%
        corpus plant %10==1) shares the same 97 bigram TYPES
        regardless of its start offset (consecutive tokens walk the
        ring), and ring-B documents share a disjoint 997-type ring —
        so selection fidelity is measurable as exact precision/recall
        against the plant."""
        is_a = (F.col("doc_id") % 50 == 0) | (F.col("doc_id") % 10 == 1)
        terms = []
        for i in range(40):
            if concentrated and i % 2 == 0:
                terms.append(F.lit("hotword"))
            else:
                terms.append(F.when(
                    is_a,
                    F.concat(F.lit("a"), ((F.col("doc_id") + i) % 97)
                             .cast("string")))
                    .otherwise(F.concat(
                        F.lit("b"), ((F.col("doc_id") + i) % 997)
                        .cast("string"))))
        return F.concat_ws(" ", *terms)

    for label, concentrated in (("uniform", False),
                                ("concentrated", True)):
        path = f"/tmp/soak_r15b_{label}"
        shutil.rmtree(path, ignore_errors=True)
        (spark.range(n).withColumnRenamed("id", "doc_id")
         .withColumn("text", text_expr(concentrated))
         .write.mode("overwrite").parquet(f"{path}/documents.parquet"))
        t0 = time.time()
        df = QUERIES["dsir_importance_docs"](spark, path)
        rows = df.count()
        dt = time.time() - t0
        sel = df.filter("selected")
        n_sel = sel.count()
        tp = sel.filter("doc_id % 10 = 1").count()
        n_pos = rows and df.filter("doc_id % 10 = 1").count()
        prec = tp / n_sel if n_sel else float("nan")
        rec = tp / n_pos if n_pos else float("nan")
        print(f"  dsir {label} n={n}: {dt:.1f}s, {rows} rows, "
              f"{n_sel} selected, precision {prec:.4f}, "
              f"recall {rec:.4f}, {n / dt / cores:.0f} docs/s/core",
              flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
