"""Round-10 scale soaks.

1. media-ingest ledger to >=100k STANDING assets (the round-8/9 soak
   stopped at 6-8k): 6 batches of 20k mixed-format assets (PNG/JPEG
   near-dup members, MP4 + MP3 exact-only members), asserting the
   per-batch increment cost stays flat as the standing band tables
   grow — the property that makes the ledger viable at 100 TB.
2. progressive-JPEG and VP8L decode linearity probes (10k assets each):
   the round's new decode surfaces at ~20x test size.

Run: python tools/soak_r10.py   (local[32]; prints one line per probe,
then a PASS/FAIL flatness verdict).  Results are recorded in SCALE.md.
"""
import os
import sys
import tempfile
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
    spark = get_spark("soak_r10")
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp(prefix="soak_r10_")

    # ---------------- 1. media-ingest ledger to >=100k standing assets
    from verified_sources_spark.operators.table_format import ManifestTable
    from verified_sources_spark.streaming.media_ingest import MediaIngest

    BATCH = 20_000
    N_BATCHES = 6  # -> 120k minted, ~106k standing after dup rejection

    def minted(lo, hi):
        import pandas as pd

        def mint(batches):
            import numpy as np

            from verified_sources_spark.llm.jpeg_codec import encode as jpg
            from verified_sources_spark.llm.mp3_codec import (
                encode_stub as mp3,
            )
            from verified_sources_spark.llm.mp4_codec import (
                encode_stub as mp4,
            )
            from verified_sources_spark.llm.png_codec import encode as png

            for pdf in batches:
                rows = []
                for did in pdf["id"]:
                    did = int(did)
                    r = did % 25
                    if r == 7:  # exact-only MP4 (unique bytes per id)
                        asset = mp4(width=64, height=48,
                                    n_frames=10 + did % 20, fps=10.0)
                    elif r == 8:  # exact-only MP3
                        asset = mp3(n_frames=10 + did % 20,
                                    sample_rate=[32000, 44100, 48000][did % 3])
                    else:
                        # every 10th image near-dups a batch-0 asset (its
                        # seed pattern is guaranteed standing)
                        seed = (did % BATCH
                                if (did % 10 == 0 and did >= BATCH) else did)
                        rng = np.random.default_rng(seed)
                        coarse = rng.integers(0, 256, size=(6, 8))
                        h, w = 24, 32
                        gray = coarse[(np.arange(h) * 6) // h][
                            :, (np.arange(w) * 8) // w]
                        rgb = np.stack([gray] * 3, axis=2).copy()
                        rgb[did % h, did % w] = [255, 0, 0]
                        px = rgb.astype(np.uint8).tobytes()
                        asset = (png(w, h, px, "RGB") if did % 2 == 0
                                 else jpg(w, h, px, quality=90))
                    rows.append({"doc_id": did, "asset": asset})
                yield pd.DataFrame(rows, columns=["doc_id", "asset"])

        return (spark.range(lo, hi).repartition(32)
                .mapInPandas(mint, "doc_id long, asset binary"))

    ing = MediaIngest(ManifestTable(spark, os.path.join(d, "media")),
                      ManifestTable(spark, os.path.join(d, "fps")))
    costs = []
    for b in range(N_BATCHES):
        lo, hi = b * BATCH, (b + 1) * BATCH
        costs.append(timed(
            f"media_ingest batch {b} (+{BATCH//1000}k, standing~{lo//1000}k)",
            lambda: ing.apply_batch(minted(lo, hi), b)))
    n_acc = ing.docs_table.read().count()
    n_fp = ing.fp_table.read().count()
    print(f"  accepted {n_acc}/{BATCH*N_BATCHES} standing "
          f"(fp rows {n_fp})", flush=True)
    # flatness: the last batch (standing ~100k) must cost < 2x the
    # second batch (standing 20k).  Batch 0 is excluded (warmup).
    flat = costs[-1] < 2.0 * costs[1]
    print(f"  increment flatness: batch1={costs[1]:.2f}s "
          f"batch{N_BATCHES-1}={costs[-1]:.2f}s -> "
          f"{'PASS' if flat else 'FAIL'}", flush=True)

    # ---------------- 2. progressive JPEG decode linearity (10k)
    from verified_sources_spark.llm.image_dedup import image_dhash

    def prog_jpegs(n):
        import pandas as pd

        def mint(batches):
            import numpy as np

            from verified_sources_spark.llm.jpeg_progressive import (
                encode_progressive,
            )

            for pdf in batches:
                rows = []
                for did in pdf["id"]:
                    did = int(did)
                    rng = np.random.default_rng(did)
                    coarse = rng.integers(0, 256, size=(6, 8))
                    h, w = 24, 32
                    gray = coarse[(np.arange(h) * 6) // h][
                        :, (np.arange(w) * 8) // w]
                    px = np.stack([gray] * 3, axis=2).astype(np.uint8).tobytes()
                    rows.append({"doc_id": did,
                                 "asset": encode_progressive(
                                     w, h, px, quality=85,
                                     subsampling="4:2:0")})
                yield pd.DataFrame(rows, columns=["doc_id", "asset"])

        return (spark.range(n).repartition(32)
                .mapInPandas(mint, "doc_id long, asset binary"))

    t3 = timed("progressive jpeg dhash 3k",
               lambda: image_dhash(prog_jpegs(3_000))
               .filter("decoded_ok").count())
    t10 = timed("progressive jpeg dhash 10k",
                lambda: image_dhash(prog_jpegs(10_000))
                .filter("decoded_ok").count())

    # ---------------- 3. VP8L decode linearity (10k)
    def webps(n):
        import pandas as pd

        def mint(batches):
            import numpy as np

            from verified_sources_spark.llm.vp8l_codec import encode

            for pdf in batches:
                rows = []
                for did in pdf["id"]:
                    did = int(did)
                    rng = np.random.default_rng(did)
                    coarse = rng.integers(0, 256, size=(6, 8))
                    h, w = 24, 32
                    gray = coarse[(np.arange(h) * 6) // h][
                        :, (np.arange(w) * 8) // w]
                    px = np.stack([gray] * 3, axis=2).astype(np.uint8).tobytes()
                    rows.append({"doc_id": did,
                                 "asset": encode(w, h, px, cache_bits=4,
                                                 predictor=2 if did % 2
                                                 else None)})
                yield pd.DataFrame(rows, columns=["doc_id", "asset"])

        return (spark.range(n).repartition(32)
                .mapInPandas(mint, "doc_id long, asset binary"))

    u3 = timed("vp8l dhash 3k",
               lambda: image_dhash(webps(3_000)).filter("decoded_ok").count())
    u10 = timed("vp8l dhash 10k",
                lambda: image_dhash(webps(10_000)).filter("decoded_ok").count())
    print(f"  linearity: jpeg-prog 10k/3k={t10/t3:.2f}x (ideal 3.33), "
          f"vp8l {u10/u3:.2f}x", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
