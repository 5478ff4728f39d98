"""Round-8 scale soaks: the round's new surfaces at 10-50x test size.

Run: python tools/soak_r08.py  (local[32], prints one line per probe)
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
    print(f"{label}: {time.time()-t0:.2f}s {out if out is not None else ''}",
          flush=True)
    return out


def main():
    spark = get_spark("soak_r08")
    spark.sparkContext.setLogLevel("ERROR")
    d = tempfile.mkdtemp(prefix="soak_r08_")

    # ---- image dedup: 30k synthetic PNGs, linearity vs 10k
    from verified_sources_spark.llm.image_dedup import image_dedup_groups

    def minted(n):
        import pandas as pd

        def mint(batches):
            import numpy as np
            from verified_sources_spark.llm.png_codec import encode
            for pdf in batches:
                rows = []
                for did in pdf["id"]:
                    did = int(did)
                    w, h = 32, 24
                    # ~n/50 clusters: a seeded low-res random pattern per
                    # cluster, light per-image edits.  Structured content
                    # matters — dHash of a UNIFORM image is all-zero bits
                    # whatever the base color, which collapses the whole
                    # corpus into ONE hamming component (a chain CC then
                    # grinds for minutes; that's a fixture bug, not an
                    # operator bug — same pitfall as the test fixture).
                    rng = np.random.default_rng(did // 50)
                    coarse = rng.integers(0, 256, size=(6, 8))
                    gray = np.kron(
                        coarse, np.ones((h // 6 + 1, w // 8 + 1))
                    )[:h, :w].astype(np.uint8)
                    rgb = np.stack([gray, gray, gray], axis=2).copy()
                    rgb[did % h, did % w] = [255, 0, 0]  # light edit
                    # alternate formats WITHIN each planted cluster: the
                    # groups must form ACROSS the PNG/JPEG boundary
                    if did % 2 == 0:
                        asset = encode(w, h, rgb.tobytes(), "RGB")
                    else:
                        from verified_sources_spark.llm.jpeg_codec import (
                            encode as jenc,
                        )

                        asset = jenc(w, h, rgb.tobytes(), quality=92,
                                     subsampling="4:2:0")
                    rows.append({"doc_id": did, "asset": asset})
                yield pd.DataFrame(rows, columns=["doc_id", "asset"])

        return (spark.range(n).repartition(32)
                .mapInPandas(mint, "doc_id long, asset binary"))

    for n in (10_000, 30_000):
        df = minted(n)
        groups = timed(
            f"image_dedup_groups n={n}",
            lambda: image_dedup_groups(df).groupBy("group").count().count(),
        )
        print(f"  distinct groups: {groups} (expect ~{n//50})", flush=True)

    # ---- audio dedup: 20k synthetic WAVs (~0.5s @ 8kHz), cluster of 40
    from verified_sources_spark.llm.audio_dedup import audio_dedup_groups

    def minted_wavs(n):
        import pandas as pd

        def mint(batches):
            import numpy as np
            from verified_sources_spark.llm.wav_codec import encode
            for pdf in batches:
                rows = []
                for did in pdf["id"]:
                    did = int(did)
                    rng = np.random.default_rng(did // 40)
                    t = np.arange(4000) / 8000.0
                    freqs = rng.uniform(150, 3500, size=4)
                    env = np.interp(t, np.linspace(0, 0.5, 8),
                                    rng.uniform(0.2, 1.0, 8))
                    x = env * sum(np.sin(2 * np.pi * f * t) for f in freqs)
                    x = x / np.abs(x).max() * 0.8
                    # 0.002: calibrated so within-cluster hamming stays
                    # well under max_hamming=6 (at 0.005 the worst pairs
                    # sit exactly at the threshold and clusters split)
                    x = x + np.random.default_rng(did).normal(0, 0.002, x.shape)
                    rows.append({"doc_id": did,
                                 "asset": encode(np.clip(x, -1, 1), 8000)})
                yield pd.DataFrame(rows, columns=["doc_id", "asset"])

        return (spark.range(n).repartition(32)
                .mapInPandas(mint, "doc_id long, asset binary"))

    for n in (7_000, 20_000):
        df = minted_wavs(n)
        groups = timed(
            f"audio_dedup_groups n={n}",
            lambda: audio_dedup_groups(df).groupBy("group").count().count(),
        )
        print(f"  distinct groups: {groups} (expect ~{n//40})", flush=True)

    # ---- video dedup: 4k clips (10 frames 32x24), cluster of 20
    from verified_sources_spark.llm.video_dedup import video_dedup_groups

    def minted_avis(n):
        import pandas as pd

        def mint(batches):
            import numpy as np
            from verified_sources_spark.llm.avi_codec import encode
            for pdf in batches:
                rows = []
                for did in pdf["id"]:
                    did = int(did)
                    rng = np.random.default_rng(did // 20)
                    coarse = rng.integers(0, 256, size=(6, 8))
                    h, w = 24, 32
                    gray = coarse[(np.arange(h) * 6) // h][
                        :, (np.arange(w) * 8) // w]
                    frames = []
                    for k in range(10):
                        f = np.stack([gray] * 3, axis=2).astype(np.int64)
                        f[(k * 3) % h, :, :] = 255
                        f[did % h, did % w] = 0  # light per-clip edit
                        frames.append(f.astype(np.uint8))
                    rows.append({"doc_id": did,
                                 "asset": encode(frames, 10.0, w, h)})
                yield pd.DataFrame(rows, columns=["doc_id", "asset"])

        return (spark.range(n).repartition(32)
                .mapInPandas(mint, "doc_id long, asset binary"))

    for n in (1_500, 4_000):
        df = minted_avis(n)
        groups = timed(
            f"video_dedup_groups n={n}",
            lambda: video_dedup_groups(df).groupBy("group").count().count(),
        )
        print(f"  distinct groups: {groups} (expect ~{n//20})", flush=True)

    # ---- media ingest: growing standing ledger, flat increment cost
    from verified_sources_spark.operators.table_format import ManifestTable as _MT
    from verified_sources_spark.streaming.media_ingest import MediaIngest

    def minted_pngs(lo, hi, dup_every=10):
        import pandas as pd

        def mint(batches):
            import numpy as np
            from verified_sources_spark.llm.png_codec import encode
            for pdf in batches:
                rows = []
                for did in pdf["id"]:
                    did = int(did)
                    # every dup_every-th asset near-dups a BATCH-0 asset
                    # (did % 2000 — itself always a unique pattern, so the
                    # reference is guaranteed standing)
                    seed = did % 2000 if (did % dup_every == 0 and did >= 2000) else did
                    rng = np.random.default_rng(seed)
                    coarse = rng.integers(0, 256, size=(6, 8))
                    h, w = 24, 32
                    gray = coarse[(np.arange(h) * 6) // h][:, (np.arange(w) * 8) // w]
                    rgb = np.stack([gray] * 3, axis=2).copy()
                    rgb[did % h, did % w] = [255, 0, 0]  # light per-asset edit
                    rows.append({"doc_id": did,
                                 "asset": encode(w, h, rgb.astype(np.uint8).tobytes(), "RGB")})
                yield pd.DataFrame(rows, columns=["doc_id", "asset"])

        return (spark.range(lo, hi).repartition(32)
                .mapInPandas(mint, "doc_id long, asset binary"))

    ing = MediaIngest(_MT(spark, os.path.join(d, "media")),
                      _MT(spark, os.path.join(d, "media_fps")))
    for b in range(4):
        lo, hi = b * 2000, (b + 1) * 2000
        timed(f"media_ingest batch {b} (+2k assets, standing={lo})",
              lambda: ing.apply_batch(minted_pngs(lo, hi), b))
    n_acc = ing.docs_table.read().count()
    print(f"  accepted {n_acc}/8000 (dups rejected: {8000 - n_acc})", flush=True)

    # ---- scene pairs at 5k two-scene clips, 2% planted containment
    from verified_sources_spark.llm.video_dedup import video_scene_pairs

    def minted_clips(n):
        import pandas as pd

        def mint(batches):
            import numpy as np
            from verified_sources_spark.llm.avi_codec import encode
            def scene(seed, w=32, h=24):
                rng = np.random.default_rng(seed)
                coarse = rng.integers(0, 256, size=(6, 8))
                gray = coarse[(np.arange(h) * 6) // h][:, (np.arange(w) * 8) // w]
                return np.stack([gray] * 3, axis=2).astype(np.uint8)
            for pdf in batches:
                rows = []
                for did in pdf["id"]:
                    did = int(did)
                    s0 = scene(3 * did)
                    s1 = (scene(3 * (did - 1)) if (did % 50 == 4 and did > 0)
                          else scene(3 * did + 1))
                    rows.append({"doc_id": did,
                                 "asset": encode([s0] * 3 + [s1] * 3, 10.0, 32, 24)})
                yield pd.DataFrame(rows, columns=["doc_id", "asset"])

        return (spark.range(n).repartition(32)
                .mapInPandas(mint, "doc_id long, asset binary"))

    for n in (2_000, 5_000):
        pairs = timed(
            f"video_scene_pairs n={n}",
            lambda: video_scene_pairs(
                minted_clips(n), every_ms=100, threshold=8, max_hamming=0
            ).count(),
        )
        print(f"  pairs: {pairs} (expect ~{n//50})", flush=True)

    # ---- iceberg v2 export: 400k rows / 32 files, 100k-row DV
    from verified_sources_spark.operators.iceberg_interop import (
        export_manifest_as_iceberg, read_iceberg_table,
    )
    from verified_sources_spark.operators.table_format import ManifestTable

    t = ManifestTable(spark, os.path.join(d, "ice"))
    t.append(spark.range(400_000).selectExpr(
        "id", "id % 1000 as k", "cast(id * 1.5 as double) as v"
    ).repartition(32))
    timed("delete_where 25% (DV write)", lambda: t.delete_where("id % 4 = 0"))
    mp = timed("export_manifest_as_iceberg (100k-pos delete file)",
               lambda: export_manifest_as_iceberg(t))
    import json
    meta = json.load(open(mp))
    assert meta["format-version"] == 2
    n = timed("read_iceberg_table count",
              lambda: read_iceberg_table(spark, t.path).count())
    assert n == 300_000, n

    # ---- stats_aggregate over many files: driver-only latency
    t2 = ManifestTable(spark, os.path.join(d, "stats"))
    t2.append(spark.range(500_000).selectExpr(
        "id", "cast(id as double) v").repartition(600))
    n_files = len(t2._manifest(t2.latest_version())["files"])
    got = timed(f"stats_aggregate over {n_files} files",
                lambda: t2.stats_aggregate(
                    {"n": ("count", "*"), "lo": ("min", "id"),
                     "hi": ("max", "v")}))
    assert got == {"n": 500_000, "lo": 0, "hi": 499_999.0}, got

    # ---- zorder at 2M rows x 2 dims
    import random
    t3 = ManifestTable(spark, os.path.join(d, "zo"))
    t3.append(spark.range(2_000_000).selectExpr(
        "id", "cast(hash(id, 1) % 100000 as long) as x",
        "cast(hash(id, 2) % 100000 as long) as y").repartition(32))
    timed("compact zorder 2M rows",
          lambda: t3.compact(target_file_bytes=2_000_000,
                             cluster_by=["x", "y"], layout="zorder"))
    nf = len(t3._manifest(t3.latest_version())["files"])
    tx = len(t3.candidate_entries([("x", ">", 0), ("x", "<", 5000)], None))
    ty = len(t3.candidate_entries([("y", ">", 0), ("y", "<", 5000)], None))
    print(f"  zorder skipping: {tx}/{nf} files for x-slice, {ty}/{nf} for y-slice",
          flush=True)

    spark.stop()
    print("SOAK OK")


if __name__ == "__main__":
    main()
