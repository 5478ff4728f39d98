"""Round-11 scale probes:

1. progressive-JPEG decode linearity re-run (3k/10k assets inside
   image_dhash) after the list-conversion fix for the per-coefficient
   numpy-scalar hot path (round-10 measured 3.19x scaling at ~3x
   baseline-JPEG unit cost; the fix targets the unit cost).
2. new-decoder throughput at 10k assets: full FLAC frame decode,
   TIFF-LZW strips, lossy VP8 via the system-libwebp seam.

Usage: python tools/soak_r11.py
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
    spark = get_spark("soak-r11")
    spark.sparkContext.setLogLevel("ERROR")

    from verified_sources_spark.llm.image_dedup import image_dhash

    def minted_images(n, codec):
        import pandas as pd

        def mint(batches):
            import numpy as np

            for pdf in batches:
                rows = []
                for did in pdf["id"]:
                    did = int(did)
                    rng = np.random.default_rng(did)
                    coarse = rng.integers(0, 256, size=(6, 8))
                    h, w = 24, 32
                    gray = coarse[(np.arange(h) * 6) // h][
                        :, (np.arange(w) * 8) // w]
                    px = np.stack([gray] * 3, axis=2).astype(
                        np.uint8).tobytes()
                    if codec == "progressive":
                        from verified_sources_spark.llm.jpeg_progressive \
                            import encode_progressive

                        asset = encode_progressive(
                            w, h, px, quality=85, subsampling="4:2:0")
                    elif codec == "baseline":
                        from verified_sources_spark.llm.jpeg_codec import (
                            encode,
                        )

                        asset = encode(w, h, px, quality=85,
                                       subsampling="4:2:0")
                    elif codec == "tiff-lzw":
                        from verified_sources_spark.llm.tiff_codec import (
                            encode,
                        )

                        asset = encode(w, h, px, lzw=True, predictor=True,
                                       rows_per_strip=8)
                    else:  # webp-lossy
                        from verified_sources_spark.llm.webp_system import (
                            encode_rgb,
                        )

                        asset = encode_rgb(w, h, px, quality=90)
                    rows.append({"doc_id": did, "asset": asset})
                yield pd.DataFrame(rows, columns=["doc_id", "asset"])

        return (spark.range(n).repartition(32)
                .mapInPandas(mint, "doc_id long, asset binary"))

    print("1. progressive JPEG decode linearity (post-fix)", flush=True)
    tb = timed("baseline jpeg dhash 10k",
               lambda: image_dhash(minted_images(10_000, "baseline"))
               .filter("decoded_ok").count())
    t3 = timed("progressive jpeg dhash 3k",
               lambda: image_dhash(minted_images(3_000, "progressive"))
               .filter("decoded_ok").count())
    t10 = timed("progressive jpeg dhash 10k",
                lambda: image_dhash(minted_images(10_000, "progressive"))
                .filter("decoded_ok").count())
    print(f"  scaling 3k->10k: {t10 / t3:.2f}x (ideal 3.33x); "
          f"unit cost vs baseline: {t10 / tb:.2f}x", flush=True)

    print("2. new decoders at 10k assets", flush=True)
    timed("tiff-lzw+predictor dhash 10k",
          lambda: image_dhash(minted_images(10_000, "tiff-lzw"))
          .filter("decoded_ok").count())
    from verified_sources_spark.llm.webp_system import available
    if available():
        timed("webp lossy (libwebp seam) dhash 10k",
              lambda: image_dhash(minted_images(10_000, "webp-lossy"))
              .filter("decoded_ok").count())

    def flac_assets(n):
        import pandas as pd

        def mint(batches):
            from verified_sources_spark.llm.flac_codec import encode

            for pdf in batches:
                rows = []
                for did in pdf["id"]:
                    did = int(did)
                    m = 400 + did % 300
                    l = [((did * 31 + i * 7) % 2000) - 1000
                         for i in range(m)]
                    r = [((did * 17 + i * 11) % 2000) - 1000
                         for i in range(m)]
                    mode = ["independent", "left_side", "mid_side"][did % 3]
                    rows.append({"doc_id": did,
                                 "asset": encode([l, r], stereo_mode=mode,
                                                 blocksize=256)})
                yield pd.DataFrame(rows, columns=["doc_id", "asset"])

        return (spark.range(n).repartition(32)
                .mapInPandas(mint, "doc_id long, asset binary"))

    def flac_decode_count(df):
        import pandas as pd

        def run(batches):
            from verified_sources_spark.llm.flac_codec import decode

            for pdf in batches:
                ok = 0
                for payload in pdf["asset"]:
                    try:
                        decode(bytes(payload))
                        ok += 1
                    except Exception:
                        pass
                yield pd.DataFrame({"ok": [ok]})

        return df.mapInPandas(run, "ok long")

    f3 = timed("flac full decode 3k",
               lambda: flac_decode_count(flac_assets(3_000))
               .groupBy().sum("ok").collect()[0][0])
    f10 = timed("flac full decode 10k",
                lambda: flac_decode_count(flac_assets(10_000))
                .groupBy().sum("ok").collect()[0][0])
    print(f"  flac scaling 3k->10k: {f10 / f3:.2f}x (ideal 3.33x)",
          flush=True)

    def fax_assets(n, flavor):
        import pandas as pd

        def mint(batches):
            import numpy as np

            from verified_sources_spark.llm.tiff_codec import encode_bilevel

            for pdf in batches:
                rows = []
                for did in pdf["id"]:
                    did = int(did)
                    # text-like page tile: sparse black glyph runs on
                    # white, the real statistics of scanned documents
                    w, h = 864, 96
                    rng = np.random.default_rng(did)
                    bits = np.zeros((h, w), dtype=np.uint8)
                    for y in range(4, h, 9):
                        starts = rng.integers(20, w - 40, size=18)
                        for x in starts:
                            bits[y:y + 6, x:x + rng.integers(4, 22)] = 1
                    rows.append({"doc_id": did,
                                 "asset": encode_bilevel(
                                     w, h, bits.tobytes(), flavor,
                                     rows_per_strip=32)})
                yield pd.DataFrame(rows, columns=["doc_id", "asset"])

        return (spark.range(n).repartition(32)
                .mapInPandas(mint, "doc_id long, asset binary"))

    print("3. CCITT fax decode (864x96 text-like page tiles, via "
          "image_dhash)", flush=True)
    x3 = timed("g4 fax dhash 3k",
               lambda: image_dhash(fax_assets(3_000, "g4"))
               .filter("decoded_ok").count())
    x10 = timed("g4 fax dhash 10k",
                lambda: image_dhash(fax_assets(10_000, "g4"))
                .filter("decoded_ok").count())
    print(f"  g4 scaling 3k->10k: {x10 / x3:.2f}x (ideal 3.33x)",
          flush=True)
    timed("g3-2d fax dhash 10k",
          lambda: image_dhash(fax_assets(10_000, "g3-2d"))
          .filter("decoded_ok").count())
    spark.stop()


if __name__ == "__main__":
    main()
