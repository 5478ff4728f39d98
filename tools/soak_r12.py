"""Round-12 adversarial skew soaks for the composition front doors.

Three deliberately skewed shapes a 100 TB corpus will contain:

1. crawl_dedup with a 100k-duplicate page: 100k WARC records whose
   extracted text is IDENTICAL (one mega-group) plus a long tail of
   uniques — the hot-key shape for the exact-dedup groupBy.
2. nested_archive with one 10k-member zip exploding inside a single
   task — the straggler shape for per-row explosion (bounded by the
   member-count gate at default 100k).
3. scan_dedup with one page duplicated across 10k PDFs + 10k TIFFs —
   the hot dhash bucket for the cross-format dedup groupBy.

Usage: python tools/soak_r12.py            (prints secs per shape)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from verified_sources_spark.session import get_spark  # noqa: E402


def timed(label, fn):
    t0 = time.time()
    out = fn()
    print(f"  {label}: {time.time() - t0:.1f}s ({out})", flush=True)


def main():
    import pandas as pd  # noqa: F401

    from pyspark.sql import functions as F

    spark = get_spark("soak-r12")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- 1. crawl_dedup: 100k duplicates of ONE page + 20k uniques
    def mint_warc(batches):
        import pandas as pd

        from verified_sources_spark.llm.warc import (
            encode_record, encode_warc, http_response_block,
        )

        for pdf in batches:
            rows = []
            for did in pdf["id"]:
                did = int(did)
                text = ("the hot duplicated page" if did < 100_000
                        else f"unique page {did}")
                body = (f"<html><body><p>{text}</p></body></html>"
                        ).encode()
                rec = encode_record(uri=f"http://e/{did}",
                                    block=http_response_block(body))
                rows.append({"doc_id": did,
                             "asset": encode_warc([rec])})
            yield pd.DataFrame(rows, columns=["doc_id", "asset"])

    def crawl_hot_key():
        from verified_sources_spark.llm.exact_dedup import (
            exact_dedup_groups,
        )
        from verified_sources_spark.llm.warc import warc_extract

        assets = (spark.range(120_000).repartition(32)
                  .mapInPandas(mint_warc, "doc_id long, asset binary"))
        pages = (warc_extract(assets).filter(F.col("decoded_ok"))
                 .select("doc_id", "text"))
        groups = exact_dedup_groups(pages, "doc_id", "text")
        top = groups.orderBy(F.desc("n_copies")).first()
        n = groups.count()
        assert top["n_copies"] == 100_000, top
        return f"{n} groups, hot group n_copies={top['n_copies']}"

    # ---- 2. nested_archive: one 10k-member zip in ONE row
    def explode_10k_archive():
        from verified_sources_spark.llm.archives import (
            encode_zip, iter_members_recursive,
        )

        big = encode_zip({f"f{i:05d}.txt": b"x%d" % i
                          for i in range(10_000)})
        inner = encode_zip({"pad.txt": b"p"})
        outer = encode_zip({"big.zip": big, "inner.zip": inner})

        def run(batches):
            import pandas as pd

            for pdf in batches:
                rows = []
                for did, asset in zip(pdf["doc_id"], pdf["asset"]):
                    n = sum(1 for _ in iter_members_recursive(
                        bytes(asset)))
                    rows.append({"doc_id": int(did), "n_members": n})
                yield pd.DataFrame(rows,
                                   columns=["doc_id", "n_members"])

        df = spark.createDataFrame(
            [(i, bytearray(outer)) for i in range(64)],
            "doc_id long, asset binary").repartition(32)
        got = df.mapInPandas(run, "doc_id long, n_members long")
        total = got.agg(F.sum("n_members")).first()[0]
        assert total == 64 * 10_001, total  # 10k big + 1 nested pad
        return f"64 rows x 10001 members = {total}"

    # ---- 3. scan_dedup: one page in 10k PDFs + 10k TIFF twins
    def scan_hot_bucket():
        import numpy as np

        from verified_sources_spark.llm.image_dedup import tiff_pages
        from verified_sources_spark.llm.pdf_codec import pdf_images

        rng = np.random.default_rng(1)
        w, h = 32, 24
        bits = (rng.integers(0, 256, size=(h, w)) < 128).astype(np.uint8)
        rows_ = [bits[y].tobytes() for y in range(h)]

        def mint(batches):
            import pandas as pd

            from verified_sources_spark.llm.jbig2 import encode_jbig2_mmr
            from verified_sources_spark.llm.pdf_codec import encode_pdf
            from verified_sources_spark.llm.tiff_codec import (
                encode_multipage_bilevel,
            )

            pdfb = encode_pdf([["p"]], image={
                "width": w, "height": h, "bpc": 1,
                "colorspace": "DeviceGray",
                "pdf_filter": "JBIG2Decode",
                "data": encode_jbig2_mmr(rows_)})
            tifb = encode_multipage_bilevel(
                [(w, h, bits.tobytes())], compression="g4")
            for pdf in batches:
                out = []
                for did in pdf["id"]:
                    did = int(did)
                    out.append({"doc_id": did,
                                "asset": pdfb if did % 2 else tifb,
                                "is_pdf": did % 2})
                yield pd.DataFrame(
                    out, columns=["doc_id", "asset", "is_pdf"])

        assets = (spark.range(20_000).repartition(32)
                  .mapInPandas(
                      mint,
                      "doc_id long, asset binary, is_pdf int"))
        pdf_side = (pdf_images(assets.filter("is_pdf = 1"))
                    .filter(F.col("dhash").isNotNull())
                    .select("doc_id", "dhash"))
        tif_side = (tiff_pages(assets.filter("is_pdf = 0"))
                    .filter(F.col("dhash").isNotNull())
                    .select("doc_id", "dhash"))
        grp = (pdf_side.unionByName(tif_side).groupBy("dhash")
               .agg(F.count("*").alias("n")))
        top = grp.orderBy(F.desc("n")).first()
        assert top["n"] == 20_000, top
        return f"hot dhash bucket n={top['n']}"

    print("round-12 skew soaks (local[32]):", flush=True)
    timed("crawl_dedup 100k-duplicate page (120k docs)", crawl_hot_key)
    timed("nested_archive 10k-member zip x 64 rows", explode_10k_archive)
    timed("scan_dedup 20k-copy hot dhash bucket", scan_hot_bucket)
    spark.stop()


if __name__ == "__main__":
    main()


def throughput():
    """10k-asset throughput for the round-12 front doors (attachment
    chain, MHTML, LaTeX, delimited) on local[32]."""
    import pandas as pd  # noqa: F401

    from verified_sources_spark.session import get_spark

    spark = get_spark("soak-r12-tp")
    spark.sparkContext.setLogLevel("ERROR")
    N = 10_000

    def over(mint, op):
        df = (spark.range(N).repartition(32)
              .mapInPandas(mint, "doc_id long, asset binary"))
        return op(df).count()

    def mint_mail(batches):
        import pandas as pd

        from verified_sources_spark.llm.email_ingest import encode_eml
        from verified_sources_spark.llm.pdf_codec import encode_pdf

        for pdf in batches:
            rows = []
            for did in pdf["id"]:
                did = int(did)
                p = encode_pdf([[f"attached doc {did} body text"]])
                rows.append({"doc_id": did, "asset": encode_eml(
                    f"S{did}", "b\n",
                    attachments=[(f"d{did}.pdf", "application/pdf", p)])})
            yield pd.DataFrame(rows, columns=["doc_id", "asset"])

    def mint_mht(batches):
        import pandas as pd

        from verified_sources_spark.llm.mhtml import encode_mhtml

        for pdf in batches:
            rows = []
            for did in pdf["id"]:
                did = int(did)
                rows.append({"doc_id": did, "asset": encode_mhtml(
                    f"<html><head><title>t{did}</title></head><body>"
                    + f"<p>page {did} prose </p>" * 40 + "</body></html>",
                    resources=[("http://e/a.png", "image/png",
                                bytes(256))])})
            yield pd.DataFrame(rows, columns=["doc_id", "asset"])

    def mint_tex(batches):
        import pandas as pd

        from verified_sources_spark.llm.latex import encode_latex

        for pdf in batches:
            rows = []
            for did in pdf["id"]:
                did = int(did)
                rows.append({"doc_id": did, "asset": encode_latex(
                    f"Paper {did}",
                    [(f"Sec {k}", f"prose of section {k} in {did} "
                      * 30) for k in range(3)])})
            yield pd.DataFrame(rows, columns=["doc_id", "asset"])

    def mint_csv(batches):
        import pandas as pd

        from verified_sources_spark.llm.tabular import encode_delimited

        for pdf in batches:
            rows = []
            for did in pdf["id"]:
                did = int(did)
                rows.append({"doc_id": did, "asset": encode_delimited(
                    [[str(did * 10 + k), f"item {k}",
                      f'note, "q"\n{k}'] for k in range(20)],
                    header=["id", "name", "note"])})
            yield pd.DataFrame(rows, columns=["doc_id", "asset"])

    from verified_sources_spark.llm.email_ingest import (
        email_attachment_texts,
    )
    from verified_sources_spark.llm.latex import latex_extract_op
    from verified_sources_spark.llm.mhtml import mhtml_extract
    from verified_sources_spark.llm.tabular import delimited_rows

    print("round-12 front-door throughput (10k assets, local[32]):",
          flush=True)
    timed("email attachment chain (PDF per mail)",
          lambda: over(mint_mail, email_attachment_texts))
    timed("mhtml extract", lambda: over(mint_mht, mhtml_extract))
    timed("latex strip", lambda: over(mint_tex, latex_extract_op))
    timed("delimited explode (20 rows/file)",
          lambda: over(mint_csv, delimited_rows))
    spark.stop()


def throughput2():
    """10k-asset throughput, round-12 wave 2: wiki dumps, JATS,
    SE posts, chat records, code signals, text repair."""
    import pandas as pd  # noqa: F401

    from verified_sources_spark.session import get_spark

    spark = get_spark("soak-r12-tp2")
    spark.sparkContext.setLogLevel("ERROR")
    N = 10_000

    def over(mint, op, schema="doc_id long, asset binary"):
        df = spark.range(N).repartition(32).mapInPandas(mint, schema)
        return op(df).count()

    def mint_wiki(batches):
        import pandas as pd

        from verified_sources_spark.llm.wikitext import encode_dump

        for pdf in batches:
            rows = []
            for did in pdf["id"]:
                did = int(did)
                wt = ("{{Infobox|x=%d}}\n'''Page %d''' intro.\n"
                      "== Sec ==\n[[A|B]] prose %d. " % (did, did, did)
                      + "more [[words]] here. " * 20)
                rows.append({"doc_id": did, "asset": encode_dump(
                    [{"title": f"P{did}", "wikitext": wt}])})
            yield pd.DataFrame(rows, columns=["doc_id", "asset"])

    def mint_jats(batches):
        import pandas as pd

        from verified_sources_spark.llm.jats import encode_jats

        for pdf in batches:
            rows = []
            for did in pdf["id"]:
                did = int(did)
                rows.append({"doc_id": did, "asset": encode_jats(
                    f"Article {did}", "abstract prose " * 10,
                    [(f"S{k}", f"section {k} prose of {did} " * 15)
                     for k in range(3)])})
            yield pd.DataFrame(rows, columns=["doc_id", "asset"])

    def mint_se(batches):
        import pandas as pd

        from verified_sources_spark.llm.sedump import encode_posts

        for pdf in batches:
            rows = []
            for did in pdf["id"]:
                did = int(did)
                posts = [{"post_id": 1, "post_type": 1,
                          "title": f"Q{did}",
                          "tags": ["a", "b"],
                          "body_html": f"<p>question {did} body</p>"}]
                posts += [{"post_id": k + 2, "post_type": 2,
                           "parent_id": 1,
                           "body_html": f"<p>answer {k} text "
                                        f"{'x' * 200}</p>"}
                          for k in range(3)]
                rows.append({"doc_id": did,
                             "asset": encode_posts(posts)})
            yield pd.DataFrame(rows, columns=["doc_id", "asset"])

    def mint_chat(batches):
        import json

        import pandas as pd

        for pdf in batches:
            rows = []
            for did in pdf["id"]:
                did = int(did)
                rec = {"messages": (
                    [{"role": "system", "content": "be brief"}]
                    + [m for k in range(4) for m in (
                        {"role": "user",
                         "content": f"turn {k} q {did} " * 10},
                        {"role": "assistant",
                         "content": f"turn {k} a {did} " * 10})])}
                rows.append({"doc_id": did, "line": json.dumps(rec)})
            yield pd.DataFrame(rows, columns=["doc_id", "line"])

    def mint_code(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for did in pdf["id"]:
                did = int(did)
                t = ("#!/usr/bin/env python3\n# header\n"
                     + "".join(f"def f{k}():\n    return {k}\n"
                               for k in range(40)))
                rows.append({"doc_id": did, "text": t})
            yield pd.DataFrame(rows, columns=["doc_id", "text"])

    def mint_dirty(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for did in pdf["id"]:
                did = int(did)
                clean = f"café №{did} — damaged prose " * 20
                rows.append({"doc_id": did,
                             "text": clean.encode("utf-8")
                             .decode("latin-1")})
            yield pd.DataFrame(rows, columns=["doc_id", "text"])

    from verified_sources_spark.llm.chatlog import chat_turns
    from verified_sources_spark.llm.codefile import code_signals
    from verified_sources_spark.llm.jats import jats_units
    from verified_sources_spark.llm.sedump import se_posts
    from verified_sources_spark.llm.text_fix import fix_text
    from verified_sources_spark.llm.wikitext import wiki_pages

    print("round-12 wave-2 throughput (10k assets, local[32]):",
          flush=True)
    timed("wiki dump strip", lambda: over(mint_wiki, wiki_pages))
    timed("jats explode", lambda: over(mint_jats, jats_units))
    timed("se posts (4 posts/dump)", lambda: over(mint_se, se_posts))
    timed("chat turns (9 turns/rec)",
          lambda: over(mint_chat, chat_turns,
                       "doc_id long, line string"))
    timed("code signals (82-line files)",
          lambda: over(mint_code, code_signals,
                       "doc_id long, text string"))
    timed("mojibake repair (1x latin-1)",
          lambda: over(mint_dirty, fix_text,
                       "doc_id long, text string"))
    spark.stop()
