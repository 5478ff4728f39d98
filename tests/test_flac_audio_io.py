"""FLAC codec (llm/flac_codec.py) + the audio_io sniffing seam
(llm/audio_io.py): STREAMINFO block walks over layouts the stub does
not emit, FULL frame decode (all subframe types, stereo decorrelation
modes, wasted bits, Rice escapes, CRC/MD5 verification) against the
independent fixture encoder, bounds-checked error paths,
cross-container normalized probes, and the decode/refuse split (the
WAV family + FLAC decode; Ogg/MP3 refuse by name)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from verified_sources_spark.llm.audio_io import (
    decode_samples,
    probe_audio,
    sniff_audio_format,
)
from verified_sources_spark.llm.flac_codec import (
    FlacError,
    decode,
    encode,
    encode_stub,
    probe,
)


def _pcm(n=2500, seed=3, amp=9000):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    l = (amp * np.sin(2 * np.pi * 440 * t / 44100)
         + rng.normal(0, 250, n)).astype(np.int64)
    r = (amp * 0.7 * np.sin(2 * np.pi * 660 * t / 44100)
         + rng.normal(0, 250, n)).astype(np.int64)
    return l, r


def test_streaminfo_roundtrip_matrix():
    for rate in (8000, 44100, 96000):
        for ch in (1, 2, 6):
            for bits in (16, 24):
                m = probe(encode_stub(sample_rate=rate, channels=ch,
                                      bits=bits, total_samples=rate * 3))
                assert m["sample_rate"] == rate and m["channels"] == ch
                assert m["bits_per_sample"] == bits
                assert m["total_samples"] == rate * 3
                assert m["duration_ms"] == 3000


def test_block_inventory_and_comments():
    m = probe(encode_stub(vorbis_comments=["artist=x", "title=y", "k=v"],
                          padding=64, seektable_points=3))
    assert m["blocks"] == ["STREAMINFO", "SEEKTABLE", "VORBIS_COMMENT",
                           "PADDING"]
    assert m["n_comments"] == 3
    # frames_offset points past the metadata chain
    data = encode_stub(vorbis_comments=["a=1"], padding=8)
    assert probe(data)["frames_offset"] < len(data)


def test_layouts_the_stub_never_emits():
    """Hand-built chains: APPLICATION + PICTURE blocks, 36-byte
    (extended) STREAMINFO, a large 36-bit total_samples value."""
    def blk(t, body, last=False):
        return bytes([t | (0x80 if last else 0)]) + len(body).to_bytes(3, "big") + body

    total = (1 << 35) + 12345  # needs the full 36-bit field
    packed = (44100 << 44) | (1 << 41) | (15 << 36) | total
    si = (struct.pack(">HH", 1024, 4096) + (9).to_bytes(3, "big")
          + (99).to_bytes(3, "big") + packed.to_bytes(8, "big")
          + bytes(range(16)))
    data = (b"fLaC" + blk(0, si + b"\x00\x00")  # 36-byte STREAMINFO: legal
            + blk(2, b"APPL" + b"\x00" * 8)
            + blk(6, b"\x00" * 40, last=True)
            + b"\xff\xf8" + b"\x00" * 30)
    m = probe(data)
    assert m["channels"] == 2 and m["bits_per_sample"] == 16
    assert m["total_samples"] == total
    assert m["min_framesize"] == 9 and m["max_framesize"] == 99
    assert m["md5"] == bytes(range(16)).hex()
    assert m["blocks"] == ["STREAMINFO", "APPLICATION", "PICTURE"]


def test_error_paths():
    with pytest.raises(FlacError, match="fLaC magic"):
        probe(b"ID3\x03" + b"\x00" * 40)
    with pytest.raises(FlacError, match="truncated STREAMINFO"):
        probe(encode_stub()[:20])
    with pytest.raises(FlacError, match="truncated metadata block header"):
        probe(b"fLaC")
    # STREAMINFO must be first
    def blk(t, body, last=False):
        return bytes([t | (0x80 if last else 0)]) + len(body).to_bytes(3, "big") + body
    with pytest.raises(FlacError, match="not the first"):
        probe(b"fLaC" + blk(1, b"\x00" * 4)
              + blk(0, encode_stub()[8:8 + 34], last=True))
    with pytest.raises(FlacError, match="type 127"):
        probe(b"fLaC" + blk(127, b""))
    with pytest.raises(FlacError, match="sample rate 0"):
        bad = (0 << 44) | (1 << 41) | (15 << 36) | 100
        si = struct.pack(">HH", 0, 0) + b"\x00" * 6 + bad.to_bytes(8, "big") + bytes(16)
        probe(b"fLaC" + blk(0, si, last=True))


def test_sniff_and_normalized_probe_all_containers():
    from verified_sources_spark.llm.mp3_codec import encode_stub as mp3_enc
    from verified_sources_spark.llm.wav_codec import encode as wav_enc

    wav = wav_enc(np.zeros(800), 16000)
    mp3 = mp3_enc(n_frames=20, sample_rate=44100, channels=2)
    mp3_id3 = mp3_enc(n_frames=20, id3v2_bytes=50)
    flac = encode_stub(sample_rate=22050, total_samples=22050)
    assert sniff_audio_format(wav) == "wav"
    assert sniff_audio_format(mp3) == "mp3"
    assert sniff_audio_format(mp3_id3) == "mp3"
    assert sniff_audio_format(flac) == "flac"
    assert sniff_audio_format(b"\x00" * 16) is None

    w = probe_audio(wav)
    assert (w["container"], w["codec"], w["n_samples"]) == ("wav", "PCM", 800)
    assert w["duration_ms"] == 50
    m = probe_audio(mp3)
    assert m["container"] == "mp3" and m["codec"] == "MPEG-1-LIII"
    assert m["n_samples"] == 20 * 1152
    f = probe_audio(flac)
    assert f["container"] == "flac" and f["duration_ms"] == 1000
    with pytest.raises(ValueError, match="unrecognized audio"):
        probe_audio(b"MThd" + b"\x00" * 40)  # MIDI: not a sniffed format


def test_decode_split_wav_and_flac_decode_compressed_refuse():
    from verified_sources_spark.llm.mp3_codec import encode_stub as mp3_enc
    from verified_sources_spark.llm.wav_codec import encode as wav_enc

    x = 0.5 * np.sin(2 * np.pi * 440 * np.arange(400) / 8000)
    out = decode_samples(wav_enc(x, 8000))
    assert out["n_frames"] == 400  # WAV: real samples back
    l, _r = _pcm(600)
    fout = decode_samples(encode(l.tolist(), sample_rate=8000))
    assert fout["samples"].shape == (600, 1)  # FLAC: real samples back
    with pytest.raises(NotImplementedError, match="Layer III"):
        decode_samples(mp3_enc())


@pytest.mark.parametrize("mode", ["independent", "left_side",
                                  "right_side", "mid_side"])
def test_flac_roundtrip_stereo_modes(mode):
    """The independent encoder's output decodes to the EXACT input ints
    in every stereo decorrelation mode — and the decoder's CRC-8/16 and
    STREAMINFO-MD5 checks all passed along the way."""
    l, r = _pcm()
    data = encode([l.tolist(), r.tolist()], stereo_mode=mode,
                  blocksize=512)
    out = decode(data)
    got = np.round(out["samples"] * 32768).astype(np.int64)
    assert np.array_equal(got[:, 0], l) and np.array_equal(got[:, 1], r)
    assert out["sample_rate"] == 44100 and out["channels"] == 2


def test_flac_roundtrip_special_layouts():
    l, _ = _pcm(900)
    # constant (silence), wasted bits, Rice-escape raw partitions
    assert np.all(decode(encode([0] * 500))["samples"] == 0)
    w = (l & ~7).tolist()
    got = decode(encode(w, wasted_bits=3))["samples"][:, 0]
    assert np.array_equal(np.round(got * 32768).astype(np.int64), l & ~7)
    got = decode(encode(l.tolist(), escape_raw=16))["samples"][:, 0]
    assert np.array_equal(np.round(got * 32768).astype(np.int64), l)
    # 24-bit depth
    big = (l * 200).tolist()
    got = decode(encode(big, bits=24))["samples"][:, 0]
    assert np.array_equal(
        np.round(got * (1 << 23)).astype(np.int64), np.array(big))


def test_flac_decode_errors_are_loud():
    l, r = _pcm(1200)
    data = bytearray(encode([l.tolist(), r.tolist()]))
    m = probe(bytes(data))
    # flip one bit in the frame payload: CRC-16 (or MD5) must object
    data[m["frames_offset"] + 40] ^= 0x10
    with pytest.raises(FlacError):
        decode(bytes(data))
    with pytest.raises(FlacError):
        decode(encode(l.tolist())[:-30])  # truncated frame section
    # opaque stub frames are not a valid frame stream
    with pytest.raises(FlacError):
        decode(encode_stub())


def test_media_ingest_flac_joins_wav_spectral_group():
    """The same recording stored as WAV and FLAC lands on ONE spectral
    fingerprint — lossless audio dedups cross-format in the media
    ledger, like AIFF before it."""
    from verified_sources_spark.llm.wav_codec import encode as wav_enc
    from verified_sources_spark.streaming.media_ingest import (
        perceptual_fingerprint,
    )

    l, _ = _pcm(4000, amp=12000)
    wav = wav_enc(l.astype(np.float64) / 32768.0, 44100)
    flac = encode(l.tolist(), sample_rate=44100)
    mw, fpw = perceptual_fingerprint(wav)
    mf, fpf = perceptual_fingerprint(flac)
    assert (mw, mf) == ("audio", "audio")
    assert fpw == fpf
