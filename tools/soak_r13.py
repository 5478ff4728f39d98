"""Round-13 soaks: the two heaviest front doors at 20x the sf1 doc
count, plus the adversarial skew shapes a real corpus will contain,
plus the new MQ-arithmetic JBIG2 path under volume.

1. email_attachment_pipeline at 100k mails (PDF/docx/RTF/HTML
   attachment mix, the graded fixture's shape) — flat per-core rate
   expected.
2. ONE mail carrying 5k attachments — the straggler shape for
   per-payload explosion (a single task decodes all 5k).
3. scan_dedup-style decode at 100k single-page documents split
   between encrypted-PDF/CCITT and JBIG2 (MMR + arithmetic) — the
   heaviest per-doc CPU chain.
4. ONE PDF carrying 500 JBIG2 pages (alternating MMR/arithmetic) —
   the single-document straggler.

Usage: python tools/soak_r13.py [n_docs]     (prints secs per shape)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from verified_sources_spark.session import get_spark  # noqa: E402


def timed(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"  {label}: {dt:.1f}s ({out})", flush=True)
    return dt


def main():
    from pyspark.sql import functions as F  # noqa: F401

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    spark = get_spark("soak-r13")
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    ids = spark.range(n_docs).withColumnRenamed("id", "doc_id") \
        .repartition(cores * 2)

    # ---- 1. email_attachment_pipeline at n_docs mails
    def mint_mail(batches):
        import pandas as pd

        from verified_sources_spark.llm.email_ingest import encode_eml
        from verified_sources_spark.llm.office import (
            encode_docx, encode_rtf,
        )
        from verified_sources_spark.llm.pdf_codec import encode_pdf

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                did = int(did)
                t = f"attachment prose for doc {did} " * 3
                fmt = did % 4
                if fmt == 0:
                    att = (f"d{did}.pdf", "application/pdf",
                           encode_pdf([[t]]))
                elif fmt == 1:
                    att = (f"d{did}.docx", "application/x",
                           encode_docx([t]))
                elif fmt == 2:
                    att = (f"d{did}.rtf", "application/rtf",
                           encode_rtf([t]))
                else:
                    att = (f"d{did}.html", "text/html",
                           f"<html><body><p>{t}</p></body></html>"
                           .encode())
                rows.append({"doc_id": did,
                             "asset": encode_eml(f"Doc {did}", "b\n",
                                                 attachments=[att])})
            yield pd.DataFrame(rows, columns=["doc_id", "asset"])

    def mail_volume():
        from verified_sources_spark.llm.email_ingest import (
            email_attachment_texts,
        )

        assets = ids.mapInPandas(mint_mail, "doc_id long, asset binary")
        return email_attachment_texts(assets) \
            .filter("decoded_ok").count()

    dt = timed(f"email_attachment_pipeline x{n_docs}", mail_volume)
    print(f"    -> {n_docs / dt / cores:.0f} mails/s/core")

    # ---- 2. ONE mail with 5k attachments (straggler shape)
    def fat_mail():
        import pandas as pd

        from verified_sources_spark.llm.email_ingest import (
            email_attachment_texts, encode_eml,
        )

        def mint(batches):
            from verified_sources_spark.llm.email_ingest import (
                encode_eml as _enc,
            )

            for pdf in batches:
                atts = [(f"n{k}.txt", "text/plain",
                         f"note {k} body text".encode())
                        for k in range(5000)]
                yield pd.DataFrame(
                    [{"doc_id": 1,
                      "asset": _enc("fat", "b\n", attachments=atts)}],
                    columns=["doc_id", "asset"])

        one = spark.createDataFrame([(1,)], "doc_id long") \
            .mapInPandas(mint, "doc_id long, asset binary")
        return email_attachment_texts(one).count()

    timed("one mail, 5k attachments", fat_mail)

    # ---- 3. scan decode at n_docs (CCITT / JBIG2-MMR / JBIG2-arith)
    def mint_scan(batches):
        import pandas as pd

        from verified_sources_spark.llm import fax_codec
        from verified_sources_spark.llm.jbig2 import (
            encode_jbig2_arith, encode_jbig2_mmr,
        )
        from verified_sources_spark.llm.pdf_codec import encode_pdf

        w, h = 96, 64
        base = [bytes(1 if (y % 5 == 0 and x % 3 == 0) else 0
                      for x in range(w)) for y in range(h)]
        blobs = {
            "ccitt": encode_pdf([["x"]], image={
                "width": w, "height": h, "bpc": 1,
                "colorspace": "DeviceGray",
                "pdf_filter": "CCITTFaxDecode",
                "decode_parms": f"<< /K -1 /Columns {w} /Rows {h} >>",
                "data": fax_codec.encode_g4(base)}),
            "mmr": encode_pdf([["x"]], image={
                "width": w, "height": h, "bpc": 1,
                "colorspace": "DeviceGray",
                "pdf_filter": "JBIG2Decode",
                "data": encode_jbig2_mmr(base)}),
            "arith": encode_pdf([["x"]], image={
                "width": w, "height": h, "bpc": 1,
                "colorspace": "DeviceGray",
                "pdf_filter": "JBIG2Decode",
                "data": encode_jbig2_arith(base, tpgdon=True)}),
        }
        keys = ("ccitt", "mmr", "arith")
        for pdf in batches:
            rows = [{"doc_id": int(did),
                     "asset": blobs[keys[int(did) % 3]]}
                    for did in pdf["doc_id"]]
            yield pd.DataFrame(rows, columns=["doc_id", "asset"])

    def scan_volume():
        from verified_sources_spark.llm.pdf_codec import pdf_images

        assets = ids.mapInPandas(mint_scan, "doc_id long, asset binary")
        return pdf_images(assets).filter("decoded_ok").count()

    dt = timed(f"scan decode (ccitt/mmr/arith) x{n_docs}", scan_volume)
    print(f"    -> {n_docs / dt / cores:.0f} pages/s/core")

    # ---- 4. ONE PDF whose JBIG2 stream carries 500 stacked regions
    # (the PDF writer embeds one image per document, so the
    # single-task straggler is a 500-region striped mega-page —
    # the same one-doc decode burden)
    def fat_pdf():
        import pandas as pd

        def mint(batches):
            from verified_sources_spark.llm.jbig2 import (
                encode_jbig2_arith,
            )
            from verified_sources_spark.llm.pdf_codec import encode_pdf

            w, h = 96, 64
            base = [bytes(1 if (y % 5 == 0 and x % 3 == 0) else 0
                          for x in range(w)) for y in range(h)]
            regions = [(0, k * h, base, 0) for k in range(500)]
            blob = encode_jbig2_arith(
                regions=regions, page_size=(w, 500 * h), tpgdon=True)
            asset = encode_pdf([["x"]], image={
                "width": w, "height": 500 * h, "bpc": 1,
                "colorspace": "DeviceGray",
                "pdf_filter": "JBIG2Decode", "data": blob})
            for pdf in batches:
                yield pd.DataFrame([{"doc_id": 1, "asset": asset}],
                                   columns=["doc_id", "asset"])

        from verified_sources_spark.llm.pdf_codec import pdf_images

        one = spark.createDataFrame([(1,)], "doc_id long") \
            .mapInPandas(mint, "doc_id long, asset binary")
        return pdf_images(one).filter("decoded_ok").count()

    timed("one PDF, 500 stacked JBIG2 regions", fat_pdf)
    spark.stop()


if __name__ == "__main__":
    main()
