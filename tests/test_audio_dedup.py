"""Perceptual audio near-dup (llm/audio_dedup.py): spectral fingerprint
over the stdlib WAV codec + banded hamming grouping.  Fixtures are
synthetic WAVs minted by llm/wav_codec.encode — real decode, zero
optional deps."""

from __future__ import annotations

import numpy as np
import pytest

from verified_sources_spark.llm.audio_dedup import (
    _audio_fingerprint_of_samples,
    audio_dedup_groups,
    audio_dedup_keep,
    audio_fingerprint,
)
from verified_sources_spark.llm.wav_codec import encode


def _clip(seed, rate=8000, dur=1.0, gain=1.0, noise=0.0):
    """Deterministic structured clip: seeded sinusoid mix under a
    seeded amplitude envelope — spectral content a band-energy hash can
    actually distinguish, with time variation so adjacent-slice
    comparisons carry signal."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(rate * dur)) / rate
    freqs = rng.uniform(150, 3500, size=5)
    amps = rng.uniform(0.3, 1.0, size=5)
    env = rng.uniform(0.2, 1.0, size=10)
    envt = np.interp(t, np.linspace(0, dur, 10), env)
    x = envt * sum(a * np.sin(2 * np.pi * f * t) for f, a in zip(freqs, amps))
    x = x / np.abs(x).max() * 0.8 * gain
    if noise:
        x = x + rng.normal(0, noise, x.shape)
    return np.clip(x, -1, 1)


def _hamming(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_fingerprint_invariances():
    f0 = _audio_fingerprint_of_samples(_clip(1), 8000)
    # deterministic
    assert f0 == _audio_fingerprint_of_samples(_clip(1), 8000)
    # global gain: comparisons are within-band, so exactly invariant
    assert _hamming(f0, _audio_fingerprint_of_samples(_clip(1, gain=0.5), 8000)) == 0
    # light additive noise flips only near-tie bits
    assert _hamming(f0, _audio_fingerprint_of_samples(_clip(1, noise=0.01), 8000)) <= 4
    # same content sampled at 2x the rate: absolute-Hz bands keep it close
    f16 = _audio_fingerprint_of_samples(_clip(1, rate=16000), 16000)
    assert _hamming(f0, f16) <= 4
    # different content is far
    assert _hamming(f0, _audio_fingerprint_of_samples(_clip(42), 8000)) > 10


def test_fingerprint_survives_16bit_wav_roundtrip():
    from verified_sources_spark.llm.wav_codec import decode

    x = _clip(7)
    f0 = _audio_fingerprint_of_samples(x, 8000)
    m = decode(encode(x, 8000, bits=16))
    assert _audio_fingerprint_of_samples(m["samples"], m["sample_rate"]) == f0


def test_too_short_clip_raises():
    with pytest.raises(ValueError, match="too short"):
        _audio_fingerprint_of_samples(np.zeros(5), 8000)


def test_bits_guard():
    with pytest.raises(ValueError, match="64 bits"):
        audio_fingerprint(None, time_slices=10, freq_bands=8)


def test_audio_fingerprint_spark_and_corrupt_isolation(spark):
    rows = [
        (1, bytearray(encode(_clip(1), 8000))),
        (2, bytearray(b"not a wav at all")),
        (3, bytearray(encode(np.zeros(4), 8000))),  # decodes but too short
    ]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    got = {r.doc_id: r for r in audio_fingerprint(df).collect()}
    assert got[1].decoded_ok and got[1].afp is not None
    assert got[1].sample_rate == 8000 and got[1].n_frames == 8000
    assert not got[2].decoded_ok and got[2].afp is None
    assert not got[3].decoded_ok and got[3].afp is None


def test_audio_dedup_groups_and_keep(spark):
    base = _clip(3)
    rows = [
        (1, bytearray(encode(base, 8000))),
        (2, bytearray(encode(_clip(3, noise=0.01), 8000))),  # dithered
        (3, bytearray(encode(_clip(3, rate=16000), 16000))),  # resampled
        (4, bytearray(encode(_clip(99), 8000))),  # unrelated
        (5, bytearray(b"corrupt")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    groups = {r.doc_id: (r.group, r.group_size)
              for r in audio_dedup_groups(df).collect()}
    assert len(groups) == 5  # every id labeled, corrupt included
    g1 = groups[1][0]
    assert groups[2][0] == g1 and groups[3][0] == g1
    assert groups[1][1] == 3
    assert groups[4][0] != g1 and groups[4][1] == 1
    assert groups[5][0] != g1 and groups[5][1] == 1  # singleton, not dropped

    kept = {r.doc_id for r in audio_dedup_keep(df).collect()}
    assert kept == {1, 4, 5}  # lowest id per group; corrupt clip kept


def test_audio_segments_energy_gate(spark):
    from verified_sources_spark.llm.audio_dedup import audio_segments

    rate = 8000
    w = rate * 25 // 1000  # 200 samples per 25 ms window
    t = np.arange(w) / rate
    tone = 0.5 * np.sin(2 * np.pi * 440 * t)
    sil = np.zeros(w)
    # doc 1: [sil, tone*2, sil, tone*3, sil] -> segments at windows
    # [1,3) and [4,7); doc 2: all silence; doc 3: corrupt
    x1 = np.concatenate([sil, tone, tone, sil, tone, tone, tone, sil])
    x2 = np.zeros(5 * w)
    df = spark.createDataFrame(
        [
            (1, bytearray(encode(x1, rate))),
            (2, bytearray(encode(x2, rate))),
            (3, bytearray(b"junk")),
        ],
        "doc_id long, asset binary",
    )
    got = {}
    for r in audio_segments(df).collect():
        got.setdefault(r.doc_id, []).append(r)
    segs1 = sorted(
        [(r.seg_idx, r.start_ms, r.end_ms) for r in got[1]]
    )
    assert segs1 == [(0, 25, 75), (1, 100, 175)]
    assert len(got[2]) == 1 and got[2][0].decoded_ok
    assert got[2][0].seg_idx is None  # silent, not broken
    assert not got[3][0].decoded_ok


def test_audio_segments_param_guards():
    from verified_sources_spark.llm.audio_dedup import audio_segments

    with pytest.raises(ValueError, match="positive"):
        audio_segments(None, frame_ms=0)
    with pytest.raises(ValueError, match="non-negative"):
        audio_segments(None, threshold=-1.0)
