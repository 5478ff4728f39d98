"""End-to-end example 5: the multimodal media-curation pipeline.

    python examples/media_pipeline.py [workdir]

The flow a 100 TB media corpus build runs, demonstrated on synthetic
assets minted with the engine's own pure-stdlib codecs (PNG, baseline
JPEG, GIF, BMP, WAV incl. G.711, AVI incl. MJPG, animated GIF):

1. streaming ingestion — two micro-batches through MediaIngest: the
   standing perceptual ledger (sha-exact + banded hamming) rejects
   re-encodes ACROSS formats/containers, idempotent two-table commits
2. manifest building — header-only probes (extract_features
   decoder='image', video_probe) over the accepted assets: dims,
   format, frame counts without pixel work
3. per-modality dedup groups — image dHash / audio spectral / video
   time-pooled fingerprints through the shared banded machinery
4. video structure — shot boundaries + per-shot keyframes, and
   scene-level containment pairs (what whole-clip pooling cannot see)
5. audio structure — energy-gate VAD segments

Everything is mapInPandas + hash-sized joins: payload bytes never
shuffle, so the same plan holds at 1000 executors.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pyspark.sql.functions as F  # noqa: E402

from verified_sources_spark.llm.avi_codec import encode as avi_encode  # noqa: E402
from verified_sources_spark.llm.gif_codec import encode_animated  # noqa: E402
from verified_sources_spark.llm.jpeg_codec import encode as jpeg_encode  # noqa: E402
from verified_sources_spark.llm.multimodal import extract_features  # noqa: E402
from verified_sources_spark.llm.png_codec import encode as png_encode  # noqa: E402
from verified_sources_spark.llm.audio_dedup import audio_segments  # noqa: E402
from verified_sources_spark.llm.video_dedup import (  # noqa: E402
    video_probe,
    video_scene_pairs,
    video_shots,
)
from verified_sources_spark.llm.wav_codec import encode as wav_encode  # noqa: E402
from verified_sources_spark.operators.table_format import ManifestTable  # noqa: E402
from verified_sources_spark.session import get_spark  # noqa: E402
from verified_sources_spark.streaming.media_ingest import MediaIngest  # noqa: E402


def _img(seed, w=32, h=24):
    rng = np.random.default_rng(seed)
    coarse = rng.integers(0, 8, size=(6, 8)) * 32
    gray = coarse[(np.arange(h) * 6) // h][:, (np.arange(w) * 8) // w]
    return np.stack([gray] * 3, axis=2).astype(np.uint8)


def _tone(seed, bursts):
    rate = 8000
    w = rate * 25 // 1000
    t = np.arange(w) / rate
    rng = np.random.default_rng(seed)
    f = rng.uniform(200, 3000)
    tone = 0.5 * np.sin(2 * np.pi * f * t)
    sil = np.zeros(w)
    parts = [sil, sil]
    for n_on, n_off in bursts:
        parts += [tone] * n_on + [sil] * n_off
    return np.concatenate(parts)


def main(workdir: str) -> None:
    spark = get_spark("media-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")

    print("== 1. streaming ingestion with a standing perceptual ledger")
    ing = MediaIngest(
        ManifestTable(spark, os.path.join(workdir, "media")),
        ManifestTable(spark, os.path.join(workdir, "media_fps")),
        every_ms=200,
    )
    clip = [_img(40)] * 5 + [_img(41)] * 5
    batch0 = spark.createDataFrame(
        [
            (1, bytearray(png_encode(32, 24, _img(1).tobytes(), "RGB"))),
            (2, bytearray(wav_encode(_tone(2, [(3, 2), (4, 1)]), 8000))),
            (3, bytearray(avi_encode(clip, 10.0, 32, 24))),
            (4, bytearray(b"corrupt bytes we still keep exactly once")),
        ],
        "doc_id long, asset binary",
    )
    ing.apply_batch(batch0, 0)
    batch1 = spark.createDataFrame(
        [
            # the same photo, re-encoded as JPEG: rejected cross-format
            (10, bytearray(jpeg_encode(32, 24, _img(1).tobytes(), quality=95))),
            # the same recording, G.711 mu-law telephony copy: rejected
            (11, bytearray(wav_encode(_tone(2, [(3, 2), (4, 1)]), 8000,
                                      encoding="ulaw"))),
            # the same clip re-posted as an animated GIF: rejected
            (12, bytearray(encode_animated(32, 24, clip, 100))),
            # fresh content: accepted
            (13, bytearray(png_encode(32, 24, _img(99).tobytes(), "RGB"))),
        ],
        "doc_id long, asset binary",
    )
    ing.apply_batch(batch1, 1)
    accepted = ing.docs_table.read()
    print("   accepted ids:", sorted(r.doc_id for r in accepted.collect()))

    print("== 2. header-only manifests (no pixel work)")
    imgs = accepted.filter(F.col("doc_id").isin(1, 13))
    extract_features(imgs, decoder="image").show()
    video_probe(accepted.filter(F.col("doc_id") == 3)).show()

    print("== 3. video structure: shots + keyframes, scene containment")
    vids = spark.createDataFrame(
        [
            (3, bytearray(avi_encode(clip, 10.0, 32, 24))),
            # a compilation CONTAINING scene 41 — whole-clip pooling
            # misses this; scene pairs catch it
            (30, bytearray(avi_encode([_img(41)] * 5 + [_img(77)] * 5,
                                      10.0, 32, 24))),
        ],
        "doc_id long, asset binary",
    )
    video_shots(vids, every_ms=100, threshold=8).orderBy(
        "doc_id", "shot_idx"
    ).show()
    video_scene_pairs(vids, every_ms=100, threshold=8, max_hamming=0).show()

    print("== 4. audio structure: VAD segments")
    auds = accepted.filter(F.col("doc_id") == 2)
    audio_segments(auds).orderBy("seg_idx").show()

    spark.stop()
    print("OK")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="media_ex_"))
