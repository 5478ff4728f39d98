"""Interleaved A/B: cosine_topk (JVM fold) vs cosine_topk_vectorized
(Arrow GEMM) on the graded embeddings table, timed with the bench's own
methodology (xxhash64 aggregate over every output column, noop-equivalent
full evaluation).  Interleaving makes the comparison robust to the host
drift that corrupted the r15/r16 whole-suite bench runs.

Usage: python tools/probe_r16_cosine.py [sf_dir] [reps]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from verified_sources_spark.catalog import load_table  # noqa: E402
from verified_sources_spark.llm.similarity import (  # noqa: E402
    cosine_topk,
    cosine_topk_vectorized,
)
from verified_sources_spark.plans.queries import _spread  # noqa: E402
from verified_sources_spark.session import get_spark  # noqa: E402


def timed(df) -> float:
    # bench.py's _force_eval methodology: try_sum of xxhash64 over all
    # columns so every projected expression actually runs
    t0 = time.time()
    df.agg(
        F.count(F.lit(1)).alias("n"),
        F.try_sum(F.xxhash64(*df.columns)).alias("h"),
    ).collect()
    return time.time() - t0


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    spark = get_spark("probe-cosine", master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")

    def build_jvm():
        e = load_table(spark, sf_dir, "embeddings")
        corpus = _spread(spark, e)
        queries = e.filter(F.col("vec_id") < 10)
        return cosine_topk(corpus, queries, k=3)

    def build_vec():
        e = load_table(spark, sf_dir, "embeddings")
        corpus = _spread(spark, e)
        queries = e.filter(F.col("vec_id") < 10)
        return cosine_topk_vectorized(corpus, queries, k=3)

    # warmup both paths (JIT, python workers)
    timed(build_jvm())
    timed(build_vec())

    jvm_t, vec_t = [], []
    for i in range(reps):
        jvm_t.append(timed(build_jvm()))
        vec_t.append(timed(build_vec()))
        print(f"rep{i}: jvm={jvm_t[-1]:.3f}s vec={vec_t[-1]:.3f}s", flush=True)
    print(f"jvm: best={min(jvm_t):.3f} median={statistics.median(jvm_t):.3f}")
    print(f"vec: best={min(vec_t):.3f} median={statistics.median(vec_t):.3f}")

    # equivalence on this data
    a = sorted(map(tuple, build_jvm().collect()))
    b = sorted(map(tuple, build_vec().collect()))
    print("identical results:", a == b, f"({len(a)} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
