"""Pure-stdlib WAV codec (llm/wav_codec.py) + the Spark audio feature
path (llm/multimodal.audio_features): real RIFF/PCM decode on executors,
per-object corruption isolation, and bit-exact round trips."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from verified_sources_spark.llm.wav_codec import WavError, decode, encode, probe


def _sine(n, rate=8000, hz=440.0, amp=0.5):
    return amp * np.sin(2 * math.pi * hz * np.arange(n) / rate)


def test_round_trip_16bit_mono():
    x = _sine(800)
    blob = encode(x, 8000)
    meta = probe(blob)
    assert (meta["sample_rate"], meta["channels"], meta["bits_per_sample"]) == (
        8000, 1, 16,
    )
    assert meta["n_frames"] == 800 and meta["duration_ms"] == 100
    d = decode(blob)
    assert d["samples"].shape == (800, 1)
    # 16-bit quantization error bound: 1/32767 per sample
    assert float(np.max(np.abs(d["samples"][:, 0] - x))) < 1.0 / 32000


def test_round_trip_8bit_stereo():
    left, right = _sine(100, amp=0.9), _sine(100, amp=0.2)
    blob = encode(np.stack([left, right], axis=1), 16000, bits=8)
    d = decode(blob)
    assert d["channels"] == 2 and d["samples"].shape == (100, 2)
    # 8-bit convention mismatch is inherent: encode scales by 127,
    # decode (per spec) by 128 — worst case ~|x|/128 + half-step
    assert float(np.max(np.abs(d["samples"][:, 0] - left))) < 1.0 / 64
    assert float(np.max(np.abs(d["samples"][:, 1] - right))) < 1.0 / 64


def test_24bit_and_float32_decode():
    # hand-build a 3-frame 24-bit mono file: values -2^23, 0, 2^23-1
    frames = [(-(1 << 23)), 0, (1 << 23) - 1]
    pcm = b"".join(v.to_bytes(3, "little", signed=True) for v in frames)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000 * 3, 3, 24)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    blob = b"RIFF" + struct.pack("<I", len(body)) + body
    d = decode(blob)
    got = d["samples"][:, 0]
    assert got[0] == pytest.approx(-1.0) and got[1] == 0.0
    assert got[2] == pytest.approx(1.0, abs=2e-7)

    # IEEE float32 (format code 3) passes through unscaled
    f32 = np.array([-0.25, 0.5, 1.0], dtype="<f4").tobytes()
    fmt3 = struct.pack("<HHIIHH", 3, 1, 44100, 44100 * 4, 4, 32)
    body3 = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt3)) + fmt3
             + b"data" + struct.pack("<I", len(f32)) + f32)
    d3 = decode(b"RIFF" + struct.pack("<I", len(body3)) + body3)
    assert list(d3["samples"][:, 0]) == [-0.25, 0.5, 1.0]


def test_refusals_are_loud():
    with pytest.raises(WavError, match="RIFF"):
        probe(b"\x89PNG not audio at all")
    blob = bytearray(encode(_sine(10), 8000))
    blob[20:22] = struct.pack("<H", 2)  # format 2 = ADPCM: unsupported
    with pytest.raises(WavError, match="format code 2"):
        probe(bytes(blob))
    trunc = encode(_sine(10), 8000)[:30]  # cut inside the fmt chunk
    with pytest.raises(WavError):
        probe(trunc)


def test_audio_features_spark(spark):
    """Arrow-batched real decode over a binary column: features computed
    per object, one corrupt payload isolated to its own row."""
    from verified_sources_spark.llm.multimodal import audio_features

    tone = encode(_sine(8000, rate=8000, hz=440, amp=0.5), 8000)  # 1 s
    silence = encode(np.zeros(400), 8000)
    stereo = encode(np.stack([_sine(200), _sine(200)], axis=1), 16000, bits=8)
    rows = [(1, bytearray(tone)), (2, bytearray(silence)),
            (3, bytearray(stereo)), (4, bytearray(b"not a wav"))]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    got = {r["doc_id"]: r for r in audio_features(df).collect()}

    t = got[1]
    assert t["decoded_ok"] and t["duration_ms"] == 1000 and t["channels"] == 1
    # RMS of a 0.5-amplitude sine is 0.5/sqrt(2)
    assert t["rms"] == pytest.approx(0.5 / math.sqrt(2), rel=1e-3)
    assert t["peak"] == pytest.approx(0.5, rel=1e-3)
    # a 440 Hz tone at 8 kHz crosses zero ~2*440 times per second
    assert t["zero_crossing_rate"] == pytest.approx(880 / 8000, rel=0.02)

    s = got[2]
    assert s["decoded_ok"] and s["rms"] == 0.0 and s["zero_crossing_rate"] == 0.0

    st = got[3]
    assert st["channels"] == 2 and st["sample_rate"] == 16000
    assert st["bits_per_sample"] == 8

    bad = got[4]
    assert bad["decoded_ok"] is False and bad["rms"] is None
    assert bad["n_bytes"] == len(b"not a wav")


def test_odd_data_chunk_gets_riff_pad_byte():
    """RIFF word alignment: 8-bit mono with an odd frame count emits a
    pad byte after the data chunk (excluded from the chunk size,
    included in the RIFF size) and still round-trips."""
    import struct

    samples = [0.0, 0.5, -0.5]  # 3 frames x 1 byte = odd data chunk
    blob = encode(samples, 8000, bits=8)
    riff_size = struct.unpack_from("<I", blob, 4)[0]
    assert riff_size == len(blob) - 8  # pad byte counted in RIFF size
    assert len(blob) % 2 == 0 and blob[-1:] == b"\x00"
    meta = decode(blob)
    assert meta["samples"].shape == (3, 1)


def test_g711_ulaw_alaw_roundtrip():
    """G.711 companding (format 7 mu-law / 6 A-law, the telephony WAVs
    call-recording corpora carry) roundtrips at the textbook ~37 dB SNR;
    mu-law keeps an exact zero, A-law's smallest magnitude is 8/32768."""
    rng = np.random.default_rng(5)
    x = np.clip(rng.normal(0, 0.3, 2000), -1, 1)
    for enc, code in (("ulaw", 7), ("alaw", 6)):
        data = encode(x, 8000, encoding=enc)
        m = probe(data)
        assert m["format"] == code and m["bits_per_sample"] == 8
        y = decode(data)["samples"].ravel()
        snr = 10 * np.log10((x ** 2).mean() / ((y - x) ** 2).mean())
        assert snr > 35, (enc, snr)
        assert np.abs(y - x).max() < 0.02
    assert np.all(decode(encode(np.zeros(8), 8000, encoding="ulaw"))["samples"] == 0)


def test_g711_cross_coding_fingerprint_stable():
    """The same recording as 16-bit PCM and as mu-law lands within the
    dedup threshold — telephony re-encodes dedup against originals."""
    from verified_sources_spark.llm.audio_dedup import (
        _audio_fingerprint_of_samples,
    )

    t = np.arange(4000) / 8000.0
    tone = 0.5 * np.sin(2 * np.pi * 440 * t) * np.interp(
        t, [0, 0.25, 0.5], [0.3, 1.0, 0.5]
    )
    f_pcm = _audio_fingerprint_of_samples(
        decode(encode(tone, 8000))["samples"], 8000
    )
    f_ulaw = _audio_fingerprint_of_samples(
        decode(encode(tone, 8000, encoding="ulaw"))["samples"], 8000
    )
    assert bin(f_pcm ^ f_ulaw).count("1") <= 6


def test_g711_guards():
    with pytest.raises(WavError, match="pcm/ulaw/alaw"):
        encode(np.zeros(4), 8000, encoding="gsm")
    # a 16-bit fmt chunk claiming A-law is malformed
    data = bytearray(encode(np.zeros(4), 8000, encoding="alaw"))
    i = bytes(data).index(b"fmt ")
    import struct as _s
    _s.pack_into("<H", data, i + 8 + 14, 16)  # bits_per_sample -> 16
    with pytest.raises(WavError, match="8-bit"):
        probe(bytes(data))


def test_ima_adpcm_roundtrip_mono_stereo():
    """IMA ADPCM (format 17): block headers carry the predictor/step
    state, nibble groups interleave per channel; the encoder tracks the
    decoder's predictor exactly so blocks never drift."""
    t = np.arange(3000) / 8000.0
    x = 0.6 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(2 * np.pi * 997 * t)
    for sig in (x, np.stack([x, np.roll(x, 100)], axis=1)):
        data = encode(sig, 8000, encoding="ima")
        m = probe(data)
        assert m["format"] == 17 and m["bits_per_sample"] == 4
        assert m["samples_per_block"] == 505
        y = decode(data)["samples"][:3000]
        ref = sig if sig.ndim == 2 else sig[:, None]
        snr = 10 * np.log10((ref ** 2).mean() / ((y - ref) ** 2).mean())
        assert snr > 20, snr  # 4-bit ADPCM's textbook band


def test_ima_adpcm_cross_coding_fingerprint_stable():
    from verified_sources_spark.llm.audio_dedup import (
        _audio_fingerprint_of_samples,
    )

    t = np.arange(4000) / 8000.0
    tone = 0.5 * np.sin(2 * np.pi * 440 * t) * np.interp(
        t, [0, 0.25, 0.5], [0.3, 1.0, 0.5]
    )
    f_pcm = _audio_fingerprint_of_samples(
        decode(encode(tone, 8000))["samples"], 8000
    )
    f_ima = _audio_fingerprint_of_samples(
        decode(encode(tone, 8000, encoding="ima"))["samples"][:4000], 8000
    )
    assert bin(f_pcm ^ f_ima).count("1") <= 6


def test_ima_adpcm_malformed_headers():
    data = bytearray(encode(np.zeros(600), 8000, encoding="ima"))
    i = bytes(data).index(b"fmt ")
    # inconsistent block_align vs samplesPerBlock must refuse
    struct.pack_into("<H", data, i + 8 + 12, 100)
    with pytest.raises(WavError, match="inconsistent"):
        probe(bytes(data))
