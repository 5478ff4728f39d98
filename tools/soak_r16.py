"""r16 one-hot-key soak (VERDICT r15 item 2): the window-flag dedup
shapes (`text_prep._span_occurrences`, `line_dedup.line_dedup`) flag
duplicates with aggregates over an UNBOUNDED window partitioned by the
unit hash.  A groupBy key gets map-side partial aggregation, but a
window partition buffers every occurrence row in the reducer
(ExternalAppendOnlyUnsafeRowArray -> spill) before the aggregate is
attached.  This soak plants ONE span/line shared by every document and
measures the window form against the groupBy+join-back form (sharing
the exploded cut via localCheckpoint so the corpus pass is not doubled).

Usage: python tools/soak_r16.py [n_docs]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from verified_sources_spark.session import get_spark  # noqa: E402


def spill_metrics(spark):
    """(memory_spill, disk_spill) summed over completed stages (UI REST)."""
    import json
    import urllib.request

    sc = spark.sparkContext
    url = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}/stages?status=complete"
    with urllib.request.urlopen(url) as r:
        stages = json.loads(r.read())
    mem = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    disk = sum(s.get("diskBytesSpilled", 0) for s in stages)
    return mem, disk


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("soak-r16", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")

    # one 8-token boilerplate span in EVERY doc + a unique tail so docs
    # are distinct; window=8 makes the boilerplate span itself the hot key
    hot = "alpha bravo charlie delta echo foxtrot golf hotel"
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit(hot + " "), F.lit("tail"), F.col("id").cast("string"),
                 F.lit(" omega"), F.col("id").cast("string")).alias("text"),
    ).localCheckpoint(eager=True)  # fixture cost out of the timed region

    from verified_sources_spark.functions.text import shingles

    def occurrences(df):
        return df.select(
            F.col("doc_id").alias("_id"),
            F.posexplode(
                F.transform(shingles("text", 8), lambda s: F.md5(s))
            ).alias("spos", "_h"),
        )

    def window_form(df):
        from pyspark.sql import Window

        sp = occurrences(df)
        w = Window.partitionBy("_h")
        return sp.withColumn(
            "_dup", F.min("_id").over(w) != F.max("_id").over(w))

    def groupjoin_form(df):
        sp = occurrences(df).localCheckpoint(eager=False)
        stats = sp.groupBy("_h").agg(
            (F.min("_id") != F.max("_id")).alias("_dup"))
        return sp.join(stats, "_h")

    def digest(df):
        r = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64(F.col("_id").cast("string"),
                             F.col("spos").cast("string"),
                             F.col("_h"),
                             F.col("_dup").cast("string"))
                  .cast("decimal(38,0)")).alias("s"),
        ).first()
        return (r["n"], r["s"])

    print("digest window  :", digest(window_form(docs)), flush=True)
    print("digest groupjoin:", digest(groupjoin_form(docs)), flush=True)

    for rep in range(4):
        for name, form in (("window", window_form), ("groupjoin", groupjoin_form)):
            m0, d0 = spill_metrics(spark)
            t0 = time.time()
            form(docs).write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            m1, d1 = spill_metrics(spark)
            print(f"rep{rep} {name:9s} wall {wall:7.3f}s  spill mem {(m1-m0)/2**20:8.1f} MiB  "
                  f"disk {(d1-d0)/2**20:8.1f} MiB", flush=True)


if __name__ == "__main__":
    main()
