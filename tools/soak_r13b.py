"""Round-13 new-front-door throughput: every operator the round added,
at 10k docs (20x the sf0.1 gate count), mint+decode fused — the same
protocol as the r11/r12 throughput tables in SCALE.md.

Usage: python tools/soak_r13b.py [n_docs]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from verified_sources_spark.session import get_spark  # noqa: E402


def main() -> None:
    import pandas as pd  # noqa: F401

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    spark = get_spark("soak-r13b")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    ids = spark.range(n).withColumnRenamed("id", "doc_id") \
        .repartition(cores * 2)

    def timed(label, fn):
        t0 = time.time()
        cnt = fn()
        dt = time.time() - t0
        print(f"  {label}: {dt:.1f}s ({cnt} rows, "
              f"{n / dt / cores:.0f} docs/s/core)", flush=True)

    def over(mint_fn, op, schema="doc_id long, asset binary"):
        def run():
            assets = ids.mapInPandas(mint_fn, schema)
            return op(assets).count()
        return run

    # --- iCalendar
    def mint_ics(batches):
        import pandas as pd

        from verified_sources_spark.llm.ics_vcf import encode_ics

        for pdf in batches:
            yield pd.DataFrame([
                {"doc_id": int(d), "asset": encode_ics([
                    {"uid": f"e{d}-{k}@x",
                     "summary": f"event {k} of doc {d}, with; marks",
                     "description": "line one\nline two",
                     "location": f"Room {k}",
                     "dtstart": f"20240301T{k:02d}0000Z",
                     "dtend": f"20240301T{k + 1:02d}0000Z"}
                    for k in range(3)])}
                for d in pdf["doc_id"]], columns=["doc_id", "asset"])

    from verified_sources_spark.llm.ics_vcf import ics_events, vcf_cards
    timed("ics_events x3 events", over(mint_ics, ics_events))

    # --- vCard
    def mint_vcf(batches):
        import pandas as pd

        from verified_sources_spark.llm.ics_vcf import encode_vcf

        for pdf in batches:
            yield pd.DataFrame([
                {"doc_id": int(d), "asset": encode_vcf([
                    {"fn": f"Person {d}-{k}", "org": "Org; Unit",
                     "title": "title " * 10,
                     "emails": [f"p{k}@e.com"], "tels": ["+1"]}
                    for k in range(2)])}
                for d in pdf["doc_id"]], columns=["doc_id", "asset"])

    timed("vcf_cards x2 cards", over(mint_vcf, vcf_cards))

    # --- robots + sitemap + frontier
    def mint_gov(batches):
        import pandas as pd

        from verified_sources_spark.llm.crawlgov import (
            encode_robots, encode_sitemap,
        )

        for pdf in batches:
            rows = []
            for d in pdf["doc_id"]:
                d = int(d)
                rb = encode_robots([
                    {"agents": ["*"],
                     "rules": [("disallow", f"/b{d % 5}/"),
                               ("allow", f"/b{d % 5}/open/")],
                     "crawl_delay": 1.0},
                    {"agents": ["enginebot"],
                     "rules": [("disallow", "/p/*.pdf$")]}])
                sm = encode_sitemap(
                    [{"loc": f"https://h{d}.com/page/{k}"}
                     for k in range(10)], gz=d % 3 == 0)
                rows.append({"doc_id": d, "robots": rb,
                             "sitemap": sm})
            yield pd.DataFrame(
                rows, columns=["doc_id", "robots", "sitemap"])

    from verified_sources_spark.llm.crawlgov import frontier_audit

    def frontier():
        assets = ids.mapInPandas(
            mint_gov, "doc_id long, robots binary, sitemap binary")
        return frontier_audit(assets, agent="enginebot/1.0").count()

    timed("frontier_audit x10 urls", frontier)

    # --- TFRecord + WebDataset export->readback
    from verified_sources_spark.llm.tfrecord import (
        tfrecord_rows, tfrecord_shards,
    )
    from verified_sources_spark.llm.webdataset import (
        wds_samples, wds_shards,
    )
    from pyspark.sql import functions as F

    docs = ids.withColumn(
        "text", F.concat(F.lit("document body " * 20),
                         F.col("doc_id").cast("string")))

    def tf_round():
        shards = tfrecord_shards(docs, n_shards=256)
        return tfrecord_rows(shards.selectExpr(
            "shard_id as doc_id", "asset")).count()

    timed("tfrecord export+readback", tf_round)

    def wds_round():
        shards = wds_shards(docs, n_shards=256)
        return wds_samples(shards.selectExpr(
            "shard_id as doc_id", "asset")).count()

    timed("webdataset export+readback", wds_round)

    # --- arithmetic JBIG2 (MQ) decode-only rate, standalone blob
    def mint_jb(batches):
        import pandas as pd

        from verified_sources_spark.llm.jbig2 import encode_jbig2_arith

        w, h = 96, 64
        base = [bytes(1 if (y % 5 == 0 and x % 3 == 0) else 0
                      for x in range(w)) for y in range(h)]
        blob = encode_jbig2_arith(base, tpgdon=True)
        for pdf in batches:
            yield pd.DataFrame(
                [{"doc_id": int(d), "asset": blob}
                 for d in pdf["doc_id"]], columns=["doc_id", "asset"])

    def jb():
        from verified_sources_spark.llm.jbig2 import (
            decode_jbig2_embedded,
        )
        import pandas as pd

        def run(batches):
            for pdf in batches:
                rows = [{"doc_id": int(d),
                         "h": len(decode_jbig2_embedded(
                             bytes(a))["rows"])}
                        for d, a in zip(pdf["doc_id"], pdf["asset"])]
                yield pd.DataFrame(rows, columns=["doc_id", "h"])

        assets = ids.mapInPandas(mint_jb, "doc_id long, asset binary")
        return assets.mapInPandas(run, "doc_id long, h int").count()

    timed("jbig2 MQ-arith 96x64 page decode", jb)

    spark.stop()


if __name__ == "__main__":
    main()
