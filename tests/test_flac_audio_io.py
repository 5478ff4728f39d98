"""FLAC STREAMINFO probe (llm/flac_codec.py) + the audio_io sniffing
seam (llm/audio_io.py): block walks over layouts the stub does not
emit, bounds-checked error paths, cross-container normalized probes,
and the decode/refuse split (WAV decodes; FLAC/MP3 refuse by name)."""

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
    encode_stub,
    probe,
)


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


def test_decode_split_wav_decodes_compressed_refuse():
    from verified_sources_spark.llm.mp3_codec import encode_stub as mp3_enc
    from verified_sources_spark.llm.wav_codec import encode as wav_enc

    x = 0.5 * np.sin(2 * np.pi * 440 * np.arange(400) / 8000)
    out = decode_samples(wav_enc(x, 8000))
    assert out["n_frames"] == 400  # WAV: real samples back
    with pytest.raises(NotImplementedError, match="FLAC"):
        decode_samples(encode_stub())
    with pytest.raises(NotImplementedError, match="Layer III"):
        decode_samples(mp3_enc())


def test_media_ingest_flac_is_exact_only():
    from verified_sources_spark.streaming.media_ingest import (
        perceptual_fingerprint,
    )

    with pytest.raises(ValueError):
        perceptual_fingerprint(encode_stub())
