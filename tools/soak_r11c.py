"""Round-11 wave-2 scale probes: the new ingestion front doors at
3k/10k assets on local[32] — compressed line-shards (6 codecs), 7z
archives, legacy binary Office, encrypted PDFs, Outlook .msg.

Usage: python tools/soak_r11c.py
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
    print(f"  {label}: {dt:.1f}s ({out} rows)", flush=True)
    return dt


def main():
    spark = get_spark("soak-r11c")
    spark.sparkContext.setLogLevel("ERROR")
    import pandas as pd  # noqa: F401

    def over(n, mint_fn, schema="doc_id long, asset binary"):
        return (spark.range(n).repartition(32)
                .mapInPandas(mint_fn, schema))

    # 1. compressed line-shards: ~30 lines each, codec by id % 6
    def mint_shards(batches):
        import pandas as pd

        from verified_sources_spark.llm.archives import encode_shard

        for pdf in batches:
            rows = []
            for did in pdf["id"]:
                did = int(did)
                text = b"".join(b'{"id": %d, "text": "line %d of shard %d"}\n'
                                % (i, i, did) for i in range(30))
                codec = ("gzip", "xz", "bz2", "zstd", "zstd",
                         "lz4")[did % 6]
                rows.append({"doc_id": did,
                             "asset": encode_shard(text, codec,
                                                   streamed=did % 6 == 4)})
            yield pd.DataFrame(rows, columns=["doc_id", "asset"])

    from verified_sources_spark.llm.archives import (
        archive_members, shard_lines,
    )

    print("1. shard_lines (30-line shards, 6 codecs)", flush=True)
    s3 = timed("3k shards", lambda: shard_lines(
        over(3_000, mint_shards), id_col="doc_id").count())
    s10 = timed("10k shards", lambda: shard_lines(
        over(10_000, mint_shards), id_col="doc_id").count())
    print(f"  scaling 3k->10k: {s10 / s3:.2f}x (ideal 3.33x)", flush=True)

    # 2. 7z archives: 3 members each, mixed coders + header layouts
    def mint_7z(batches):
        import pandas as pd

        from verified_sources_spark.llm.sevenzip import encode_7z

        for pdf in batches:
            rows = []
            for did in pdf["id"]:
                did = int(did)
                members = {f"doc_{did}_{k}.txt":
                           (b"payload %d/%d " % (did, k)) * 40
                           for k in range(3)}
                rows.append({"doc_id": did, "asset": encode_7z(
                    members, codec=("lzma2", "lzma1", "copy")[did % 3],
                    encoded_header=did % 2 == 0)})
            yield pd.DataFrame(rows, columns=["doc_id", "asset"])

    print("2. 7z member explosion", flush=True)
    timed("10k archives x3 members",
          lambda: archive_members(over(10_000, mint_7z)).count())

    # 3. legacy binary Office: doc/xls/ppt cycling
    def mint_office(batches):
        import pandas as pd

        from verified_sources_spark.llm.pptdoc import encode_ppt
        from verified_sources_spark.llm.worddoc import encode_doc
        from verified_sources_spark.llm.xlsdoc import encode_xls

        for pdf in batches:
            rows = []
            for did in pdf["id"]:
                did = int(did)
                units = [f"unit {k} of document {did} " * 4
                         for k in range(3)]
                if did % 3 == 0:
                    asset = encode_doc(units)
                elif did % 3 == 1:
                    asset = encode_xls({"S": [[u] for u in units]})
                else:
                    asset = encode_ppt(units)
                rows.append({"doc_id": did, "asset": asset})
            yield pd.DataFrame(rows, columns=["doc_id", "asset"])

    from verified_sources_spark.llm.office import office_extract

    print("3. binary Office extraction (doc/xls/ppt)", flush=True)
    timed("10k documents",
          lambda: office_extract(over(10_000, mint_office)).count())

    # 4. encrypted PDFs: all four standard-handler modes
    def mint_encpdf(batches):
        import pandas as pd

        from verified_sources_spark.llm.pdf_codec import encode_pdf

        for pdf in batches:
            rows = []
            for did in pdf["id"]:
                did = int(did)
                mode = ("rc4-40", "rc4-128", "aesv2", "aes256")[did % 4]
                rows.append({"doc_id": did, "asset": encode_pdf(
                    [[f"encrypted document {did} " * 6]],
                    compress=True, encrypt=mode)})
            yield pd.DataFrame(rows, columns=["doc_id", "asset"])

    from verified_sources_spark.llm.pdf_codec import pdf_extract

    print("4. encrypted-PDF extraction (RC4-40/128, AESV2, AES-256)",
          flush=True)
    timed("5k documents",
          lambda: pdf_extract(over(5_000, mint_encpdf)).count())
    spark.stop()


if __name__ == "__main__":
    main()
