"""Perceptual video near-dup (llm/video_dedup.py): header-only probe,
time-pooled fingerprint invariances (frame rate, resolution, light
edits), banded hamming grouping with corrupt-clip isolation."""

from __future__ import annotations

import numpy as np
import pytest

from verified_sources_spark.llm.avi_codec import encode
from verified_sources_spark.llm.video_dedup import (
    video_dedup_groups,
    video_dedup_keep,
    video_fingerprint,
    video_probe,
)


def _clip(seed, fps=10.0, dur=1.0, w=32, h=24, noise=0.0):
    """Content is a function of WALL TIME, not frame index: a seeded
    coarse pattern whose bright band moves with t — so two encodes of
    the same seed at different fps/resolution show the same thing at
    the same instant (what time-based sampling + dHash must match)."""
    rng = np.random.default_rng(seed)
    coarse = rng.integers(0, 256, size=(6, 8))
    # nearest-resample the SAME 6x8 logical image to (h, w): a true
    # rescale (kron+crop would shift cell boundaries between sizes)
    gray = coarse[(np.arange(h) * 6) // h][:, (np.arange(w) * 8) // w]
    n = int(round(fps * dur))
    frames = []
    for k in range(n):
        t = k / fps
        f = np.stack([gray, gray, gray], axis=2).astype(np.float64)
        band = int(t * 4) % 4  # moves every 250 ms
        f[band * (h // 4) : (band + 1) * (h // 4), :, :] = 255.0
        if noise:
            f = f + rng.normal(0, noise * 255, f.shape)
        frames.append(np.clip(f, 0, 255).astype(np.uint8))
    return encode(frames, fps=fps, width=w, height=h)


def _hamming(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_video_probe_spark(spark):
    rows = [
        (1, bytearray(_clip(1))),
        (2, bytearray(b"not a video")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    got = {r.doc_id: r for r in video_probe(df).collect()}
    assert got[1].decoded_ok and (got[1].width, got[1].height) == (32, 24)
    assert got[1].n_frames == 10 and got[1].codec == "BI_RGB"
    assert got[1].duration_ms == 1000
    assert not got[2].decoded_ok and got[2].codec is None


def test_fingerprint_invariances(spark):
    rows = [
        (1, bytearray(_clip(5))),
        (2, bytearray(_clip(5, fps=20.0))),          # frame-rate doubled
        (3, bytearray(_clip(5, w=64, h=48))),        # upscaled 2x
        (4, bytearray(_clip(5, noise=0.01))),        # light dither
        (5, bytearray(_clip(77))),                   # unrelated content
    ]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    got = {r.doc_id: r for r in video_fingerprint(df, every_ms=250).collect()}
    f1 = got[1].vfp
    assert got[1].decoded_ok and got[1].n_sampled == 5  # ts 0..1000 incl.
    assert len(got[1].frame_hashes) == 5
    assert _hamming(f1, got[2].vfp) <= 4   # fps change: same instants sampled
    assert _hamming(f1, got[3].vfp) <= 4   # resolution: area-pooled dHash
    assert _hamming(f1, got[4].vfp) <= 6   # noise flips only near-tie bits
    assert _hamming(f1, got[5].vfp) > 12   # different content is far


def test_fingerprint_param_guards():
    with pytest.raises(ValueError, match="64-bit"):
        video_fingerprint(None, hash_size=9)
    with pytest.raises(ValueError, match="positive"):
        video_fingerprint(None, every_ms=0)


def test_video_dedup_groups_and_keep(spark):
    rows = [
        (1, bytearray(_clip(3))),
        (2, bytearray(_clip(3, fps=20.0))),
        (3, bytearray(_clip(3, w=64, h=48))),
        (4, bytearray(_clip(99))),
        (5, bytearray(b"corrupt")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    groups = {r.doc_id: (r.group, r.group_size)
              for r in video_dedup_groups(df, every_ms=250).collect()}
    assert len(groups) == 5  # every id labeled, corrupt included
    g1 = groups[1][0]
    assert groups[2][0] == g1 and groups[3][0] == g1
    assert groups[1][1] == 3
    assert groups[4][0] != g1 and groups[4][1] == 1
    assert groups[5][0] != g1 and groups[5][1] == 1  # singleton, not dropped

    kept = {r.doc_id for r in video_dedup_keep(df, every_ms=250).collect()}
    assert kept == {1, 4, 5}


def test_video_shots_detects_hard_cuts(spark):
    import numpy as np

    from verified_sources_spark.llm.avi_codec import encode
    from verified_sources_spark.llm.video_dedup import video_shots

    def scene(seed, w=32, h=24):
        rng = np.random.default_rng(seed)
        coarse = rng.integers(0, 256, size=(6, 8))
        gray = coarse[(np.arange(h) * 6) // h][:, (np.arange(w) * 8) // w]
        return np.stack([gray] * 3, axis=2).astype(np.uint8)

    # doc 1: scenes A (4 frames) then B (6 frames); doc 2: one scene;
    # doc 3: corrupt
    a, b = scene(1), scene(2)
    clip1 = encode([a] * 4 + [b] * 6, fps=10.0, width=32, height=24)
    clip2 = encode([a] * 5, fps=10.0, width=32, height=24)
    df = spark.createDataFrame(
        [(1, bytearray(clip1)), (2, bytearray(clip2)), (3, bytearray(b"junk"))],
        "doc_id long, asset binary",
    )
    # every_ms=100 at 10 fps samples every frame
    rows = video_shots(df, every_ms=100).collect()
    got = {(r.doc_id, r.shot_idx): r for r in rows}
    assert got[(1, 0)].start_frame == 0 and got[(1, 0)].end_frame == 4
    assert got[(1, 0)].keyframe == 1  # middle of frames 0..3
    assert got[(1, 1)].start_frame == 4 and got[(1, 1)].end_frame == 10
    assert got[(1, 1)].keyframe == 6  # middle of frames 4..9
    assert got[(2, 0)].start_frame == 0 and got[(2, 0)].end_frame == 5
    assert (3, None) in got and not got[(3, None)].decoded_ok


def test_video_shots_param_guards():
    from verified_sources_spark.llm.video_dedup import video_shots

    with pytest.raises(ValueError, match="positive"):
        video_shots(None, every_ms=0)
    with pytest.raises(ValueError, match="width"):
        video_shots(None, threshold=64)


def test_video_scene_pairs_containment(spark):
    import numpy as np

    from verified_sources_spark.llm.avi_codec import encode
    from verified_sources_spark.llm.video_dedup import video_scene_pairs

    def scene(seed, w=32, h=24):
        rng = np.random.default_rng(seed)
        coarse = rng.integers(0, 256, size=(6, 8))
        gray = coarse[(np.arange(h) * 6) // h][:, (np.arange(w) * 8) // w]
        return np.stack([gray] * 3, axis=2).astype(np.uint8)

    A, B, C, D = scene(1), scene(2), scene(3), scene(4)
    mk = lambda scenes: encode(
        [f for s in scenes for f in [s] * 3], fps=10.0, width=32, height=24
    )
    df = spark.createDataFrame(
        [
            (1, bytearray(mk([A, B]))),       # shares A with 2, B with 3
            (2, bytearray(mk([C, A]))),       # compilation containing A
            (3, bytearray(mk([B, D]))),
            (4, bytearray(mk([scene(9)]))),   # unrelated
            (5, bytearray(b"junk")),          # corrupt: never pairs
        ],
        "doc_id long, asset binary",
    )
    pairs = {
        (r.id_a, r.id_b): r.n_shared_scenes
        for r in video_scene_pairs(df, every_ms=100).collect()
    }
    assert pairs == {(1, 2): 1, (1, 3): 1}

    # whole-clip pooled fingerprints MISS this containment: 1 vs 2 pool
    # different scene sets
    from verified_sources_spark.llm.video_dedup import video_fingerprint

    fps_ = {r.doc_id: r.vfp for r in
            video_fingerprint(df, every_ms=100).collect() if r.decoded_ok}
    assert bin(fps_[1] ^ fps_[2]).count("1") > 6


def test_video_scene_pairs_stop_scene_guard(spark):
    """A scene shared by MORE than max_bucket_docs clips (title card) is
    excluded from candidate discovery; genuine pairs still form through
    their other scenes."""
    import numpy as np

    from verified_sources_spark.llm.avi_codec import encode
    from verified_sources_spark.llm.video_dedup import video_scene_pairs

    def scene(seed, w=32, h=24):
        rng = np.random.default_rng(seed)
        coarse = rng.integers(0, 256, size=(6, 8))
        gray = coarse[(np.arange(h) * 6) // h][:, (np.arange(w) * 8) // w]
        return np.stack([gray] * 3, axis=2).astype(np.uint8)

    intro = scene(100)
    mk = lambda scenes: encode(
        [f for s in scenes for f in [s] * 3], fps=10.0, width=32, height=24
    )
    rows = [(i, bytearray(mk([intro, scene(i)]))) for i in range(1, 7)]
    # docs 10 and 11 also share a REAL scene besides the intro
    rows += [(10, bytearray(mk([intro, scene(50)]))),
             (11, bytearray(mk([intro, scene(50)])))]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    pairs = {
        (r.id_a, r.id_b): r.n_shared_scenes
        for r in video_scene_pairs(df, every_ms=100, max_bucket_docs=4).collect()
    }
    assert pairs == {(10, 11): 1}


def test_cross_codec_video_dedup(spark):
    """The same clip stored as BI_RGB and as MJPG (the dominant real
    AVI codec) lands in ONE perceptual group — cross-CODEC video dedup,
    the video analogue of PNG/JPEG image dedup."""
    import numpy as np

    from verified_sources_spark.llm.avi_codec import encode as avi_enc

    def scene(seed, w=32, h=24):
        rng = np.random.default_rng(seed)
        coarse = rng.integers(0, 256, size=(6, 8))
        gray = coarse[(np.arange(h) * 6) // h][:, (np.arange(w) * 8) // w]
        return np.stack([gray] * 3, axis=2).astype(np.uint8)

    frames = [scene(4)] * 3 + [scene(5)] * 3
    rows = [
        (1, bytearray(avi_enc(frames, 10.0, 32, 24))),
        (2, bytearray(avi_enc(frames, 10.0, 32, 24, codec="MJPG",
                              quality=95))),
        (3, bytearray(avi_enc([scene(77)] * 6, 10.0, 32, 24))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    groups = {r.doc_id: r.group
              for r in video_dedup_groups(df, every_ms=100).collect()}
    assert groups[1] == groups[2]
    assert groups[3] != groups[1]


def test_cross_container_avi_gif_dedup(spark):
    """The same clip as an AVI and as an animated GIF (web corpora are
    full of GIF re-posts of video content) lands in ONE group."""
    import numpy as np

    from verified_sources_spark.llm.avi_codec import encode as avi_enc
    from verified_sources_spark.llm.gif_codec import encode_animated

    def scene(seed, w=32, h=24):
        rng = np.random.default_rng(seed)
        coarse = rng.integers(0, 8, size=(6, 8)) * 32
        gray = coarse[(np.arange(h) * 6) // h][:, (np.arange(w) * 8) // w]
        return np.stack([gray] * 3, axis=2).astype(np.uint8)

    frames = [scene(4)] * 5 + [scene(5)] * 5
    rows = [
        (1, bytearray(avi_enc(frames, 10.0, 32, 24))),           # 100ms/frame
        (2, bytearray(encode_animated(32, 24, frames, 100))),    # same timing
        (3, bytearray(encode_animated(32, 24, [scene(77)] * 10, 100))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    groups = {r.doc_id: r.group
              for r in video_dedup_groups(df, every_ms=200).collect()}
    assert groups[1] == groups[2]
    assert groups[3] != groups[1]

    # probe surfaces the container-normalized header for both
    probes = {r.doc_id: r for r in video_probe(df).collect()}
    assert probes[1].codec == "BI_RGB" and probes[2].codec == "GIF"
    assert probes[1].n_frames == probes[2].n_frames == 10
    assert probes[2].duration_ms == 1000


def test_gif_shot_detection(spark):
    """Shot boundaries work on animated GIFs through the same seam."""
    import numpy as np

    from verified_sources_spark.llm.gif_codec import encode_animated
    from verified_sources_spark.llm.video_dedup import video_shots

    def scene(seed, w=16, h=12):
        rng = np.random.default_rng(seed)
        coarse = rng.integers(0, 8, size=(3, 4)) * 32
        gray = coarse[(np.arange(h) * 3) // h][:, (np.arange(w) * 4) // w]
        return np.stack([gray] * 3, axis=2).astype(np.uint8)

    data = encode_animated(16, 12, [scene(1)] * 4 + [scene(2)] * 6, 100)
    df = spark.createDataFrame([(1, bytearray(data))],
                               "doc_id long, asset binary")
    got = {r.shot_idx: r for r in
           video_shots(df, every_ms=100, threshold=8).collect()}
    assert got[0].start_frame == 0 and got[0].end_frame == 4
    assert got[1].start_frame == 4 and got[1].end_frame == 10


def test_video_keyframes_export_to_image_surface(spark):
    """Keyframes export as PNGs — the hand-off to the image operators:
    a clip's scene keyframe dedups against a standalone image of that
    scene through the ordinary image path."""
    import numpy as np

    from verified_sources_spark.llm.avi_codec import encode as avi_enc
    from verified_sources_spark.llm.image_dedup import image_dhash
    from verified_sources_spark.llm.png_codec import decode as png_decode
    from verified_sources_spark.llm.png_codec import encode as png_enc
    from verified_sources_spark.llm.video_dedup import video_keyframes

    def scene(seed, w=32, h=24):
        rng = np.random.default_rng(seed)
        coarse = rng.integers(0, 8, size=(6, 8)) * 32
        gray = coarse[(np.arange(h) * 6) // h][:, (np.arange(w) * 8) // w]
        return np.stack([gray] * 3, axis=2).astype(np.uint8)

    a, b = scene(1), scene(2)
    clip = avi_enc([a] * 4 + [b] * 6, 10.0, 32, 24)
    df = spark.createDataFrame(
        [(1, bytearray(clip)), (2, bytearray(b"junk"))],
        "doc_id long, asset binary",
    )
    kf = video_keyframes(df, every_ms=100, threshold=8)
    rows = {r.shot_idx: r for r in kf.collect()}
    assert set(rows) == {0, 1}  # junk produces no keyframes
    assert rows[0].keyframe == 1 and rows[0].ts_ms == 100
    assert rows[1].keyframe == 6
    # the exported PNG is a REAL decodable image of the scene
    im = png_decode(bytes(rows[1].image))
    assert (im["width"], im["height"]) == (32, 24)
    assert im["pixels"] == b.tobytes()

    # hand-off: keyframe PNG groups with a standalone photo of scene B
    imgs = spark.createDataFrame(
        [(100, bytearray(bytes(rows[1].image))),
         (200, bytearray(png_enc(32, 24, b.tobytes(), "RGB")))],
        "doc_id long, asset binary",
    )
    hs = {r.doc_id: r.dhash for r in image_dhash(imgs).collect()}
    assert hs[100] == hs[200]


def test_video_image_matches_cross_modal(spark):
    """Still images that appear as video scenes are found; unrelated
    images are not — thumbnail-to-source lookup across modalities."""
    import numpy as np

    from verified_sources_spark.llm.avi_codec import encode as avi_enc
    from verified_sources_spark.llm.jpeg_codec import encode as jpeg_enc
    from verified_sources_spark.llm.png_codec import encode as png_enc
    from verified_sources_spark.llm.video_dedup import video_image_matches

    def scene(seed, w=32, h=24):
        rng = np.random.default_rng(seed)
        coarse = rng.integers(0, 8, size=(6, 8)) * 32
        gray = coarse[(np.arange(h) * 6) // h][:, (np.arange(w) * 8) // w]
        return np.stack([gray] * 3, axis=2).astype(np.uint8)

    a, b, c = scene(1), scene(2), scene(3)
    videos = spark.createDataFrame(
        [
            (10, bytearray(avi_enc([a] * 4 + [b] * 6, 10.0, 32, 24))),
            (20, bytearray(avi_enc([c] * 5, 10.0, 32, 24))),
            (30, bytearray(b"junk")),
        ],
        "doc_id long, asset binary",
    )
    images = spark.createDataFrame(
        [
            (100, bytearray(png_enc(32, 24, b.tobytes(), "RGB"))),  # scene of 10
            (101, bytearray(jpeg_enc(32, 24, c.tobytes(), quality=95))),  # of 20
            (102, bytearray(png_enc(32, 24, scene(99).tobytes(), "RGB"))),
            (103, bytearray(b"broken")),
        ],
        "doc_id long, asset binary",
    )
    got = {(r.video_id, r.image_id): (r.shot_idx, r.hamming)
           for r in video_image_matches(videos, images, every_ms=100,
                                        threshold=8).collect()}
    assert set(got) == {(10, 100), (20, 101)}
    assert got[(10, 100)][0] == 1  # scene B is shot 1 of video 10
    assert got[(20, 101)][1] <= 3  # JPEG re-encode still matches
