"""Streaming media ingestion (streaming/media_ingest.py): mixed-modality
perceptual dedup ledger under the two-commit replay protocol."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F
import pytest

from verified_sources_spark.llm.avi_codec import encode as avi_encode
from verified_sources_spark.llm.png_codec import encode as png_encode
from verified_sources_spark.llm.wav_codec import encode as wav_encode
from verified_sources_spark.operators.table_format import ManifestTable
from verified_sources_spark.streaming.media_ingest import (
    MediaIngest,
    perceptual_fingerprint,
)

SCHEMA = "doc_id long, asset binary"


def _png(seed, w=32, h=24, flip=None):
    rng = np.random.default_rng(seed)
    coarse = rng.integers(0, 256, size=(6, 8))
    gray = coarse[(np.arange(h) * 6) // h][:, (np.arange(w) * 8) // w]
    rgb = np.stack([gray, gray, gray], axis=2).astype(np.uint8)
    if flip is not None:
        rgb[flip % h, flip % w] = [255, 0, 0]
    return png_encode(w, h, rgb.tobytes(), "RGB")


def _wav(seed, gain=1.0):
    rng = np.random.default_rng(seed)
    t = np.arange(4000) / 8000.0
    freqs = rng.uniform(150, 3500, size=4)
    env = np.interp(t, np.linspace(0, 0.5, 8), rng.uniform(0.2, 1.0, 8))
    x = env * sum(np.sin(2 * np.pi * f * t) for f in freqs)
    return wav_encode(np.clip(x / np.abs(x).max() * 0.8 * gain, -1, 1), 8000)


def _avi(seed, fps=10.0):
    rng = np.random.default_rng(seed)
    coarse = rng.integers(0, 256, size=(6, 8))
    h, w = 24, 32
    gray = coarse[(np.arange(h) * 6) // h][:, (np.arange(w) * 8) // w]
    frames = []
    n = int(round(fps * 1.0))
    for k in range(n):
        t = k / fps
        f = np.stack([gray] * 3, axis=2).astype(np.int64)
        f[(int(t * 4) % 4) * (h // 4), :, :] = 255
        frames.append(f.astype(np.uint8))
    return avi_encode(frames, fps=fps, width=w, height=h)


def _mk(spark, tmp_path, **kw):
    media = ManifestTable(spark, str(tmp_path / "media"))
    fps = ManifestTable(spark, str(tmp_path / "fps"))
    return MediaIngest(media, fps, **kw)


def test_perceptual_fingerprint_sniffs_all_modalities():
    assert perceptual_fingerprint(_png(1))[0] == "image"
    assert perceptual_fingerprint(_wav(1))[0] == "audio"
    assert perceptual_fingerprint(_avi(1))[0] == "video"
    with pytest.raises(ValueError, match="unrecognized"):
        perceptual_fingerprint(b"not media at all")
    # near-dup variants land within a few bits; distinct content is far
    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    assert ham(perceptual_fingerprint(_png(1))[1],
               perceptual_fingerprint(_png(1, flip=5))[1]) <= 3
    assert ham(perceptual_fingerprint(_wav(1))[1],
               perceptual_fingerprint(_wav(1, gain=0.5))[1]) == 0
    assert ham(perceptual_fingerprint(_avi(1))[1],
               perceptual_fingerprint(_avi(1, fps=20.0))[1]) <= 3
    assert ham(perceptual_fingerprint(_png(1))[1],
               perceptual_fingerprint(_png(99))[1]) > 10


def test_ingest_dedups_within_and_across_batches(spark, tmp_path):
    ing = _mk(spark, tmp_path)
    # batch 0: one asset per modality, plus an in-batch exact dup, an
    # in-batch perceptual near-dup (flipped pixel), and a corrupt payload
    b0 = spark.createDataFrame(
        [
            (1, bytearray(_png(1))),
            (2, bytearray(_wav(2))),
            (3, bytearray(_avi(3))),
            (4, bytearray(_png(1))),          # exact dup of 1
            (5, bytearray(_png(1, flip=7))),  # near dup of 1
            (6, bytearray(b"corrupt bytes")), # undecodable: accepted
        ],
        SCHEMA,
    )
    ing.apply_batch(b0, 0)
    got = {r["doc_id"] for r in ing.docs_table.read().collect()}
    assert got == {1, 2, 3, 6}

    # batch 1: exact dup of standing image, perceptual dups of the
    # standing audio (gain change) and video (frame-rate change),
    # an exact replay of the corrupt payload, and two fresh assets
    b1 = spark.createDataFrame(
        [
            (10, bytearray(_png(1))),           # exact dup of standing 1
            (11, bytearray(_wav(2, gain=0.5))), # near dup of standing 2
            (12, bytearray(_avi(3, fps=20.0))), # near dup of standing 3
            (13, bytearray(b"corrupt bytes")),  # exact dup of standing 6
            (14, bytearray(_png(40))),          # fresh
            (15, bytearray(b"other junk")),     # fresh corrupt
        ],
        SCHEMA,
    )
    ing.apply_batch(b1, 1)
    got = {r["doc_id"] for r in ing.docs_table.read().collect()}
    assert got == {1, 2, 3, 6, 14, 15}

    # fingerprint table: sha for every accepted asset; pfp + 4 bands for
    # each DECODABLE accepted asset, none for corrupt ones
    fp = [(r["doc_id"], r["kind"]) for r in ing.fp_table.read().collect()]
    kinds = {}
    for d, k in fp:
        kinds.setdefault(d, set()).add(k)
    assert kinds[1] == {"sha", "pfp:image", "image:pb0", "image:pb1",
                        "image:pb2", "image:pb3"}
    assert kinds[2] == {"sha", "pfp:audio", "audio:pb0", "audio:pb1",
                        "audio:pb2", "audio:pb3"}
    assert "pfp:video" in kinds[3]
    assert kinds[6] == {"sha"} and kinds[15] == {"sha"}


def test_cross_modality_never_collides(spark, tmp_path):
    """An image and an audio clip with the SAME fingerprint long must not
    reject each other: modality scopes every join."""
    ing = _mk(spark, tmp_path)
    # craft batch where dedup relies only on modality scoping: all-zero
    # pfps collide on every band value across modalities
    png0 = png_encode(16, 12, bytes(16 * 12 * 3), "RGB")   # uniform -> dhash 0
    wav0 = wav_encode(np.zeros(4000), 8000)                 # silent
    b0 = spark.createDataFrame(
        [(1, bytearray(png0)), (2, bytearray(wav0))], SCHEMA
    )
    ing.apply_batch(b0, 0)
    got = {r["doc_id"] for r in ing.docs_table.read().collect()}
    assert got == {1, 2}


def test_replay_after_crash_between_commits_is_idempotent(spark, tmp_path):
    ing = _mk(spark, tmp_path)
    batch = spark.createDataFrame(
        [(1, bytearray(_png(1))), (2, bytearray(_wav(2)))], SCHEMA
    )
    acc = ing.accepted(batch).localCheckpoint(eager=True)
    tagged = acc.withColumn("_ingest_stream", F.lit(ing.stream_id)).withColumn(
        "_ingest_batch", F.lit(0)
    )
    ing.docs_table.append(tagged, stream=(ing.stream_id, 0))
    assert ing.fp_table.last_batch_id(ing.stream_id) is None

    v_docs_before = ing.docs_table.latest_version()
    ing.apply_batch(batch, 0)
    assert ing.docs_table.latest_version() == v_docs_before
    assert ing.fp_table.last_batch_id(ing.stream_id) == 0
    assert ing.fp_table.read().filter(F.col("kind") == "sha").count() == 2

    # full replay: both tables untouched
    v_fp = ing.fp_table.latest_version()
    ing.apply_batch(batch, 0)
    assert ing.docs_table.latest_version() == v_docs_before
    assert ing.fp_table.latest_version() == v_fp

    # a near-dup-only batch appends versions but zero rows
    batch2 = spark.createDataFrame([(3, bytearray(_png(1, flip=9)))], SCHEMA)
    ing.apply_batch(batch2, 1)
    assert ing.docs_table.read().count() == 2
    assert ing.docs_table.last_batch_id(ing.stream_id) == 1


def test_exact_only_mode(spark, tmp_path):
    ing = _mk(spark, tmp_path, near_dedup=False)
    b0 = spark.createDataFrame(
        [(1, bytearray(_png(1))), (2, bytearray(_png(1, flip=7)))], SCHEMA
    )
    ing.apply_batch(b0, 0)
    # near dup ACCEPTED in exact-only mode
    assert {r["doc_id"] for r in ing.docs_table.read().collect()} == {1, 2}
    assert {r["kind"] for r in ing.fp_table.read().collect()} == {"sha"}


def test_param_guards(spark, tmp_path):
    with pytest.raises(ValueError, match="pigeonhole"):
        _mk(spark, tmp_path, max_hamming=4, n_bands=4)
    with pytest.raises(ValueError, match="divide"):
        _mk(spark, tmp_path, n_bands=5, max_hamming=3)


def test_run_streams_parquet_landing_files(spark, tmp_path):
    """E2E through Structured Streaming: two parquet landing files arrive
    as separate micro-batches (maxFilesPerTrigger=1) across two bounded
    runs; the second file's near-dup is rejected against the STANDING
    ledger built by the first."""
    import pandas as pd

    from verified_sources_spark.streaming.bounded import bounded_file_stream

    land = tmp_path / "landing"
    land.mkdir()
    pd.DataFrame(
        [{"doc_id": 1, "asset": _png(1)}, {"doc_id": 2, "asset": _wav(2)}]
    ).to_parquet(land / "a.parquet")
    ing = _mk(spark, tmp_path)
    stream = bounded_file_stream(
        spark, str(land), SCHEMA, fmt="parquet", max_files_per_trigger=1
    )
    ing.run(stream, str(tmp_path / "ckpt"))
    assert {r["doc_id"] for r in ing.docs_table.read().collect()} == {1, 2}

    pd.DataFrame(
        [{"doc_id": 10, "asset": _png(1, flip=3)},  # near-dup of standing 1
         {"doc_id": 11, "asset": _png(50)}]         # fresh
    ).to_parquet(land / "b.parquet")
    stream = bounded_file_stream(
        spark, str(land), SCHEMA, fmt="parquet", max_files_per_trigger=1
    )
    ing.run(stream, str(tmp_path / "ckpt"))
    assert {r["doc_id"] for r in ing.docs_table.read().collect()} == {1, 2, 11}


def test_cross_format_image_rejected_by_ledger(spark, tmp_path):
    """A standing PNG rejects later GIF/BMP/JPEG copies of the same
    photo — the ledger dedups across all four image formats."""
    from verified_sources_spark.llm.bmp_codec import encode as bmp_enc
    from verified_sources_spark.llm.gif_codec import encode as gif_enc
    from verified_sources_spark.llm.jpeg_codec import encode as jpg_enc

    rng = np.random.default_rng(8)
    levels = rng.integers(0, 256, size=16).astype(np.uint8)
    coarse = levels[rng.integers(0, 16, size=(6, 8))]
    h, w = 24, 32
    gray = coarse[(np.arange(h) * 6) // h][:, (np.arange(w) * 8) // w]
    rgb = np.stack([gray] * 3, axis=2).astype(np.uint8).tobytes()

    ing = _mk(spark, tmp_path)
    ing.apply_batch(
        spark.createDataFrame([(1, bytearray(_png(1))),
                               (2, bytearray(png_encode(w, h, rgb, "RGB")))],
                              SCHEMA), 0)
    b1 = spark.createDataFrame(
        [
            (10, bytearray(jpg_enc(w, h, rgb, quality=95))),
            (11, bytearray(gif_enc(w, h, rgb))),
            (12, bytearray(bmp_enc(w, h, rgb))),
            (13, bytearray(_png(40))),  # fresh
        ],
        SCHEMA,
    )
    ing.apply_batch(b1, 1)
    got = {r["doc_id"] for r in ing.docs_table.read().collect()}
    assert got == {1, 2, 13}


def test_animated_gif_routes_to_video_modality(spark, tmp_path):
    """A standing AVI rejects a later animated-GIF re-post of the same
    clip (both land in the video modality); a STILL GIF of one frame
    stays in the image modality and dedups against a PNG of the same
    picture."""
    from verified_sources_spark.llm.avi_codec import encode as avi_enc
    from verified_sources_spark.llm.gif_codec import encode_animated
    from verified_sources_spark.streaming.media_ingest import (
        perceptual_fingerprint,
    )

    def scene(seed, w=32, h=24):
        rng = np.random.default_rng(seed)
        coarse = rng.integers(0, 8, size=(6, 8)) * 32
        gray = coarse[(np.arange(h) * 6) // h][:, (np.arange(w) * 8) // w]
        return np.stack([gray] * 3, axis=2).astype(np.uint8)

    frames = [scene(4)] * 5 + [scene(5)] * 5
    avi = avi_enc(frames, 10.0, 32, 24)
    gif = encode_animated(32, 24, frames, 100)
    assert perceptual_fingerprint(avi)[0] == "video"
    assert perceptual_fingerprint(gif)[0] == "video"

    from verified_sources_spark.llm.gif_codec import encode as gif_still
    still = gif_still(32, 24, scene(4).tobytes())
    assert perceptual_fingerprint(still)[0] == "image"

    ing = _mk(spark, tmp_path, every_ms=200)
    ing.apply_batch(spark.createDataFrame([(1, bytearray(avi))], SCHEMA), 0)
    ing.apply_batch(spark.createDataFrame([(2, bytearray(gif))], SCHEMA), 1)
    got = {r["doc_id"] for r in ing.docs_table.read().collect()}
    assert got == {1}  # GIF re-post rejected against the standing AVI


def test_mp4_ingests_exact_only_with_probed_manifest(spark, tmp_path):
    """Mixed AVI/GIF/MP4 batch: MP4s are accepted EXACT-DEDUP-ONLY
    (pixel decode refuses with the codec named, so no perceptual rows)
    while their container manifests still probe to real facts; an exact
    MP4 re-post is rejected by the sha path; a re-encode (different
    timescale → different bytes) is accepted — the honest limit of
    exact-only dedup until a real decoder is registered."""
    from verified_sources_spark.llm.mp4_codec import encode_stub
    from verified_sources_spark.llm.video_io import probe_video

    mp4 = encode_stub(width=64, height=48, n_frames=20, fps=10.0)
    mp4_reenc = encode_stub(width=64, height=48, n_frames=20, fps=10.0,
                            timescale=1200)
    assert mp4 != mp4_reenc

    ing = _mk(spark, tmp_path)
    b0 = spark.createDataFrame(
        [
            (1, bytearray(_avi(3))),
            (2, bytearray(mp4)),
        ],
        SCHEMA,
    )
    ing.apply_batch(b0, 0)
    b1 = spark.createDataFrame(
        [
            (10, bytearray(mp4)),        # exact dup → rejected by sha
            (11, bytearray(mp4_reenc)),  # re-encode → accepted (exact-only)
        ],
        SCHEMA,
    )
    ing.apply_batch(b1, 1)
    got = {r["doc_id"] for r in ing.docs_table.read().collect()}
    assert got == {1, 2, 11}

    # MP4 fingerprint rows: sha ONLY (no pfp/band rows); the AVI has all
    kinds = {}
    for r in ing.fp_table.read().collect():
        kinds.setdefault(r["doc_id"], set()).add(r["kind"])
    assert kinds[2] == {"sha"} and kinds[11] == {"sha"}
    assert "pfp:video" in kinds[1]

    # the standing MP4 bytes still probe to a full manifest
    for r in ing.docs_table.read().collect():
        if r["doc_id"] == 2:
            m = probe_video(bytes(r["asset"]))
            assert m["container"] == "mp4" and m["codec"] == "avc1"
            assert (m["width"], m["height"], m["n_frames"]) == (64, 48, 20)
            assert m["duration_ms"] == 2000


def test_cross_format_audio_wav_aiff_dedup(spark, tmp_path):
    """The SAME recording stored as WAV and as AIFF (either endianness)
    lands on one spectral fingerprint: a standing WAV rejects AIFF
    re-posts cross-format — the audio mirror of PNG/JPEG image dedup."""
    import numpy as np

    from verified_sources_spark.llm.aiff_codec import encode as aiff_enc
    from verified_sources_spark.streaming.media_ingest import (
        perceptual_fingerprint,
    )

    rng = np.random.default_rng(5)
    t = np.arange(4000) / 8000.0
    freqs = rng.uniform(150, 3500, size=4)
    env = np.interp(t, np.linspace(0, 0.5, 8), rng.uniform(0.2, 1.0, 8))
    x = env * sum(np.sin(2 * np.pi * f * t) for f in freqs)
    x = np.clip(x / np.abs(x).max() * 0.8, -1, 1)
    wav = wav_encode(x, 8000)
    aiff_be = aiff_enc(x, 8000)
    aiff_le = aiff_enc(x, 8000, sowt=True)

    def ham(a, b):
        return bin((a ^ b) & ((1 << 64) - 1)).count("1")

    mw, fw = perceptual_fingerprint(wav)
    for other in (aiff_be, aiff_le):
        m2, f2 = perceptual_fingerprint(other)
        assert (mw, m2) == ("audio", "audio")
        assert ham(fw, f2) <= 3

    ing = _mk(spark, tmp_path)
    ing.apply_batch(spark.createDataFrame([(1, bytearray(wav))], SCHEMA), 0)
    b1 = spark.createDataFrame(
        [(2, bytearray(aiff_be)), (3, bytearray(aiff_le))], SCHEMA)
    ing.apply_batch(b1, 1)
    got = {r["doc_id"] for r in ing.docs_table.read().collect()}
    assert got == {1}  # both AIFF re-posts rejected against the WAV
