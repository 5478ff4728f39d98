"""End-to-end example 2: CDC bootstrap into a transactional table, then
training-data prep on top.

    python examples/cdc_lakehouse_pipeline.py [workdir]

Flow (round-2 components):

1. snapshot_at_lsn — consistent initial load at a replication-slot LSN
2. ManifestTable — transactional commit of the snapshot (v1)
3. snapshot_then_stream — apply the strictly-later change tail (the
   re-delivered below-slot rows are skipped) and commit (v2)
4. time travel — read v1 back while v2 is live
5. exact + embedding near-dup dedup over a documents table — the
   LLM-pipeline step that would follow ingestion at 100 TB
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from verified_sources_spark import get_spark
from verified_sources_spark.llm.exact_dedup import exact_dedup
from verified_sources_spark.llm.similarity import embedding_near_dup_pairs, near_dup_keep
from verified_sources_spark.operators.table_format import ManifestTable
from verified_sources_spark.sources.cdc import snapshot_at_lsn, snapshot_then_stream


def main(workdir: str) -> None:
    spark = get_spark("cdc-lakehouse-example")
    spark.sparkContext.setLogLevel("ERROR")

    # --- a change feed (I/U/D rows with LSNs) and an empty base table
    changes = spark.createDataFrame(
        [
            ("accounts", "I", 1, 100, 1, "alice v1"),
            ("accounts", "I", 2, 100, 2, "bob v1"),
            ("accounts", "U", 3, 101, 1, "alice v2"),
            ("accounts", "I", 4, 102, 3, "carol v1"),
            ("accounts", "D", 5, 103, 2, None),          # bob deleted
            ("accounts", "U", 6, 104, 3, "carol v2"),
        ],
        "table string, op string, lsn long, txn_id long, k long, v string",
    )

    # 1. slot created at LSN 3: the exported snapshot reflects lsn <= 3
    SLOT_LSN = 3
    snap = snapshot_at_lsn(None, changes, SLOT_LSN, keys=["k"], payload_cols=["v"])

    # 2. commit the snapshot transactionally (version 1)
    table = ManifestTable(spark, os.path.join(workdir, "accounts"))
    v1 = table.replace(snap)
    print(f"v{v1} snapshot:", sorted(tuple(r) for r in table.read().collect()))

    # 3. replication delivers from lsn 1 again — the handoff skips <= SLOT_LSN
    final = snapshot_then_stream(
        table.read(), SLOT_LSN, changes, keys=["k"], payload_cols=["v"]
    )
    v2 = table.replace(final)
    print(f"v{v2} after stream:", sorted(tuple(r) for r in table.read().collect()))

    # 4. time travel: v1 still readable (bob existed before his delete)
    print("time travel v1:", sorted(tuple(r) for r in table.read(version=v1).collect()))

    # 5. training-data prep: dedup a documents table exactly + by embedding
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox", [1.0, 0.0, 0.2]),
            (2, "the quick brown fox", [0.9, 0.1, 0.2]),   # exact text dup of 1
            (3, "a completely different doc", [0.0, 1.0, 0.0]),
            (4, "near dup by embedding", [0.99, 0.01, 0.21]),  # ~parallel to 1
        ],
        "doc_id long, text string, embedding array<double>",
    )
    exact = exact_dedup(docs, "doc_id", "text")
    pairs = embedding_near_dup_pairs(exact, id_col="doc_id", threshold=0.98)
    kept = near_dup_keep(exact, pairs, id_col="doc_id")
    print("docs after exact+near dedup:", sorted(r["doc_id"] for r in kept.collect()))

    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="cdc_lakehouse_"))
