"""Round-14 soaks: the curation capstone at 100k docs — the heaviest
composed chain (six front doors → fix_text → quality gate → exact +
near dedup → salted domain_cap → mixture_sample) had no volume/skew
row in SCALE.md — plus a genre-skew shape and the round-14 front
doors at volume.

1. curation_pipeline_docs at 100k UNIFORM docs (genres balanced by
   ``doc_id % 6``) — flat per-core rate expected.
2. curation at 100k with genre 0 ~50x over-represented (ids chosen so
   ``doc_id % 6 == 0`` dominates) — exercises the salted two-stage
   domain_cap under exactly the skew it exists for.
3. frontier_build composition at 100k hosts (robots + index + 2
   children each, one gzip).
4. wds_multimodal at 100k docs (PNG mint+export+readback+dhash).
5. ics_tzid (VTIMEZONE resolution) at 100k docs.

Each shape writes its doc_id spine to a temp parquet and drives the
GRADED query function unmodified.

Usage: python tools/soak_r14.py [n_docs]
"""

from __future__ import annotations

import shutil
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000

    from verified_sources_spark.plans.queries import QUERIES
    from verified_sources_spark.session import get_spark

    spark = get_spark("soak-r14")
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
              f"{rate:.0f} docs/s/core", flush=True)

    # 1. uniform capstone
    uni = spine("/tmp/soak_r14_uniform",
                spark.range(n).withColumnRenamed("id", "doc_id"))
    run(f"curation @ {n} uniform", "curation_pipeline_docs", uni, n)

    # 2. genre-skewed capstone: ~50x over-representation of genre 0
    g = max(1, n // 55)
    from pyspark.sql import functions as F

    skew_ids = (
        spark.range(50 * g).select((F.col("id") * 6).alias("doc_id"))
        .unionAll(
            spark.range(g).select(
                F.explode(F.array(*[F.col("id") * 6 + F.lit(r)
                                    for r in range(1, 6)]))
                .alias("doc_id"))))
    n_skew = 55 * g
    skew = spine("/tmp/soak_r14_skew", skew_ids)
    run(f"curation @ {n_skew} genre-0 x50 skew",
        "curation_pipeline_docs", skew, n_skew)

    # 3-5. round-14 front doors at volume (uniform spine)
    run(f"frontier_build @ {n} hosts", "frontier_build_docs", uni, n)
    run(f"wds_multimodal @ {n}", "wds_multimodal_docs", uni, n)
    run(f"ics_tzid @ {n}", "ics_tzid_events_docs", uni, n)
    # 6. the four-backend JBIG2 rotation (arith/MMR/symbol-text/
    # halftone) inside the full PDF cross-modal chain
    run(f"pdf_image_matches @ {n}", "pdf_image_matches_docs", uni, n)

    spark.stop()


if __name__ == "__main__":
    main()
