"""Round-10 second-wave soaks: the new ingestion front doors at ~20x
test size — PDF extraction, WARC extraction, archive explosion and the
EXIF scrub must scale linearly (each is mapInPandas over payloads that
never shuffle, so linearity per core is the property to pin).

Run: python tools/soak_r10b.py   (local[32], one line per probe).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from verified_sources_spark.session import get_spark  # noqa: E402


def timed(label, fn):
    t0 = time.time()
    out = fn()
    dt = time.time() - t0
    print(f"{label}: {dt:.2f}s {out if out is not None else ''}", flush=True)
    return dt


def main():
    spark = get_spark("soak_r10b")
    spark.sparkContext.setLogLevel("ERROR")

    def minted(n, mint_fn, schema="doc_id long, asset binary"):
        import pandas as pd

        def run(batches):
            for pdf in batches:
                rows = [mint_fn(int(did)) for did in pdf["id"]]
                yield pd.DataFrame(rows, columns=[c.split()[0] for c in
                                                  schema.split(", ")])

        return spark.range(n).repartition(32).mapInPandas(run, schema)

    # ---- PDF extraction
    from verified_sources_spark.llm.pdf_codec import pdf_extract

    def mint_pdf(did):
        from verified_sources_spark.llm.pdf_codec import encode_pdf

        text = f"document {did} " + "token " * (20 + did % 50)
        return {"doc_id": did,
                "asset": encode_pdf([[text]], compress=did % 2 == 1,
                                    xref_stream=did % 3 == 0)}

    t3 = timed("pdf_extract 3k", lambda: pdf_extract(
        minted(3_000, mint_pdf)).filter("decoded_ok").count())
    t10 = timed("pdf_extract 10k", lambda: pdf_extract(
        minted(10_000, mint_pdf)).filter("decoded_ok").count())

    # ---- WARC extraction
    from verified_sources_spark.llm.warc import warc_extract

    def mint_warc(did):
        import html as H

        from verified_sources_spark.llm.warc import (
            encode_record,
            encode_warc,
            http_response_block,
        )

        text = f"page {did} " + "content " * (30 + did % 60)
        body = (f"<html><head><title>d{did}</title></head>"
                f"<body><p>{H.escape(text)}</p></body></html>").encode()
        rec = encode_record(uri=f"http://x/{did}",
                            block=http_response_block(
                                body, chunked=did % 5 == 0,
                                gzip_body=did % 7 == 0))
        return {"doc_id": did,
                "asset": encode_warc([rec], gzip_members=did % 2 == 1)}

    u3 = timed("warc_extract 3k", lambda: warc_extract(
        minted(3_000, mint_warc)).filter("decoded_ok").count())
    u10 = timed("warc_extract 10k", lambda: warc_extract(
        minted(10_000, mint_warc)).filter("decoded_ok").count())

    # ---- archive explosion (3 members per archive)
    from verified_sources_spark.llm.archives import archive_members

    def mint_zip(did):
        from verified_sources_spark.llm.archives import encode_tar, encode_zip

        members = {f"doc_{did}_{k}.txt": (f"text {did} {k} " * 30).encode()
                   for k in range(3)}
        data = (encode_zip(members) if did % 2 == 0
                else encode_tar(members, gz=True))
        return {"doc_id": did, "asset": data}

    v3 = timed("archive_members 3k x3", lambda: archive_members(
        minted(3_000, mint_zip)).count())
    v10 = timed("archive_members 10k x3", lambda: archive_members(
        minted(10_000, mint_zip)).count())

    # ---- EXIF inventory + scrub
    from verified_sources_spark.llm.exif import exif_inventory

    def mint_exif(did):
        import numpy as np

        from verified_sources_spark.llm.exif import (
            build_exif_app1,
            inject_app1,
        )
        from verified_sources_spark.llm.jpeg_codec import encode

        rng = np.random.default_rng(did)
        coarse = rng.integers(0, 256, size=(6, 8))
        h, w = 24, 32
        gray = coarse[(np.arange(h) * 6) // h][:, (np.arange(w) * 8) // w]
        jpg = encode(w, h, np.stack([gray] * 3, 2).astype(np.uint8).tobytes(),
                     quality=85)
        if did % 2 == 0:
            jpg = inject_app1(jpg, build_exif_app1(
                gps=((did % 90) + 0.5, -((did % 180) + 0.25))))
        return {"doc_id": did, "asset": jpg}

    w3 = timed("exif_inventory 3k", lambda: exif_inventory(
        minted(3_000, mint_exif)).filter("clean_after_scrub").count())
    w10 = timed("exif_inventory 10k", lambda: exif_inventory(
        minted(10_000, mint_exif)).filter("clean_after_scrub").count())

    print(f"  linearity (ideal 3.33x): pdf {t10/t3:.2f}x, warc {u10/u3:.2f}x, "
          f"archive {v10/v3:.2f}x, exif {w10/w3:.2f}x", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
