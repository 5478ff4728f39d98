"""Corpus-pipeline benchmark: times the training-data curation operators
at $SPARK_GRAFT_SF_DIR (default sf0.1) with full output evaluation.

    python tools/bench_corpus.py

Not part of the driver's bench contract (bench.py's HEADLINE set and its
baseline are frozen for comparability) — this is the evidence artifact
for the corpus/LLM pillar: one JSON line with per-op seconds, recorded
in SCALE.md per round.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, _force_eval  # noqa: E402,F401
from verified_sources_spark.plans.queries import QUERIES  # noqa: E402
from verified_sources_spark.session import get_spark  # noqa: E402

CORPUS_OPS = [
    "dedup_exact_docs",
    "minhash_signatures_docs",
    "lsh_candidate_pairs_docs",
    "ngram_jaccard_docs",
    "near_dedup_docs_keep",
    "line_dedup_docs",
    "repetition_signals_docs",
    "pii_scrub_docs",
    "token_chunks_docs",
    "decontaminate_docs",
    "hash_sample_docs",
    "domain_cap_docs",
    "unigram_rarity_docs",
    "pack_manifest_docs",
    "incremental_dedup_docs",
    "quality_filter_docs",
    "mixture_sample_docs",
    "corpus_report_docs",
    "dedup_normalized_docs",
    "curated_corpus_docs",
    "semantic_dedup_embeddings",
    "simhash_near_pairs_docs",
    "simhash_dedup_groups_docs",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench-corpus")
    spark.sparkContext.setLogLevel("ERROR")

    for name in CORPUS_OPS:  # warmup at the smallest sf
        try:
            _force_eval(QUERIES[name](spark, "/root/testdata/sf0.001"))
        except Exception:
            pass

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in CORPUS_OPS:
        runs, n = [], 0
        for _ in range(reps):
            t0 = time.time()
            n = _force_eval(QUERIES[name](spark, sf_dir))
            runs.append(time.time() - t0)
        timings[name] = round(min(runs), 3)
        rows[name] = n
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "corpus_ops_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "rows": rows,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
