"""End-to-end example 3: the training-data corpus pipeline at full width.

    python examples/corpus_pipeline.py [workdir]

The curation flow a 100 TB corpus build runs, on the driver test data:

1. quality_filter     — C4/Gopher multi-signal gate (length, heuristic
                        quality, repetition flags)
2. line_dedup         — CCNet-style corpus-level boilerplate scrub
3. near_dedup         — MinHash-LSH → Jaccard verify → connected
                        components → keep one doc per cluster
4. domain_cap +
   mixture_sample     — source balancing, then mixture weights to a
                        token budget (deterministic hash sample)
5. pack_manifest      — global token-offset packing for fixed-length
                        training sequences (bucketed prefix scan)
6. CorpusIngest       — stream a second day of documents in, dedup
                        against the standing fingerprint table, commit
                        idempotently to a ManifestTable
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from verified_sources_spark import get_spark
from verified_sources_spark.catalog import load_table
from verified_sources_spark.llm.corpus import (
    domain_cap,
    mixture_sample,
    pack_manifest,
    quality_filter,
)
from verified_sources_spark.llm.neardup import near_dedup_docs
from verified_sources_spark.operators.table_format import ManifestTable
from verified_sources_spark.streaming.bounded import bounded_file_stream
from verified_sources_spark.streaming.corpus_ingest import CorpusIngest

SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="corpus_")
    spark = get_spark("corpus-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    n0 = docs.count()

    # 1. quality gate
    verdicts = quality_filter(docs, "doc_id", "text")
    good = docs.join(verdicts.filter(F.col("passes") == 1).select("doc_id"), "doc_id")
    n1 = good.count()
    print(f"quality gate: {n0} -> {n1}")

    # 2+3. near-dup dedup (exact dedup is subsumed: identical docs share bands)
    deduped = near_dedup_docs(good, "doc_id", "text")
    n2 = deduped.count()
    print(f"near-dup dedup: {n1} -> {n2}")

    # 4. source balancing + mixture weights
    capped = domain_cap(
        deduped, "source", 20, [F.col("n_chars").desc(), F.col("doc_id").asc()]
    )
    sampled = mixture_sample(
        capped,
        "doc_id",
        "text",
        "source",
        weights={f"src{i}": 1 / 8 for i in range(8)},
        token_budget=20_000,
    )
    n3 = sampled.count()
    toks = sampled.agg(F.sum("n_tokens")).collect()[0][0]
    print(f"balance+mixture: {n2} -> {n3} docs, {toks} tokens")

    # 5. packing manifest over the sampled corpus
    manifest = pack_manifest(
        capped.join(sampled.select("doc_id"), "doc_id"), "doc_id", "text", 256
    )
    n_seqs = manifest.agg(F.max("seq_last")).collect()[0][0]
    print(f"pack manifest: {n3} docs -> {n_seqs + 1} sequences of 256 tokens")

    # 6. stream a "second day" in, dedup against the standing corpus
    docs_table = ManifestTable(spark, f"{work}/docs")
    fp_table = ManifestTable(spark, f"{work}/fps")
    # one stream_id per stream: the bootstrap load and the landing stream
    # are different streams sharing the same tables (reusing an id would
    # make the landing stream's batch 0 look like a bootstrap replay)
    bootstrap = CorpusIngest(docs_table, fp_table, quality_min=0.2, stream_id="bootstrap")
    day1 = capped.select("doc_id", "text", "source")
    bootstrap.apply_batch(day1, 0)
    ingest = CorpusIngest(docs_table, fp_table, quality_min=0.2, stream_id="day2-landing")

    landing = f"{work}/landing"
    os.makedirs(landing, exist_ok=True)
    day2 = [
        {"doc_id": 900001, "text": day1.first()["text"], "source": "day2"},  # dup
        {
            "doc_id": 900002,
            "text": "a genuinely fresh document about the catalyst optimizer "
            "and how adaptive query execution replans shuffles at runtime "
            "for the joins of the day",
            "source": "day2",
        },
    ]
    with open(f"{landing}/day2.json", "w") as f:
        f.write("\n".join(json.dumps(r) for r in day2))
    stream = bounded_file_stream(
        spark, landing, "doc_id long, text string, source string"
    )
    ingest.run(stream, f"{work}/ckpt")
    final = docs_table.read()
    accepted_day2 = final.filter(F.col("source") == "day2").count()
    print(
        f"streaming ingest: day2 offered 2 docs, accepted {accepted_day2} "
        f"(dup rejected by the fingerprint table); table at v{docs_table.latest_version()}"
    )
    print(f"workdir: {work}")
    spark.stop()


if __name__ == "__main__":
    main()
