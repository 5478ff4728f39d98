"""Pure-stdlib MP3 frame-header probe (llm/mp3_codec.py): frame walks
over layouts the fixture encoder does NOT emit (VBR streams, trailing
ID3v1, padding bits, Layer II, MPEG-2.5), ID3v2/Xing handling, honest
truncation errors, and the exact-only media-ingest posture."""

from __future__ import annotations

import struct

import pytest

from verified_sources_spark.llm.mp3_codec import (
    Mp3Error,
    decode_samples,
    encode_stub,
    probe,
)

_RATE_IDX_V1 = {44100: 0, 48000: 1, 32000: 2}
_KBPS_IDX_V1 = {32: 1, 40: 2, 48: 3, 56: 4, 64: 5, 80: 6, 96: 7, 112: 8,
                128: 9, 160: 10, 192: 11, 224: 12, 256: 13, 320: 14}


def _frame_v1_l3(kbps, rate, mono=False, padding=0):
    """One hand-built MPEG-1 Layer III frame (zero payload)."""
    b1 = 0xFB  # MPEG-1, Layer III, no CRC
    b2 = (_KBPS_IDX_V1[kbps] << 4) | (_RATE_IDX_V1[rate] << 2) | (padding << 1)
    b3 = 0xC0 if mono else 0x00
    n = 144000 * kbps // rate + padding
    return bytes([0xFF, b1, b2, b3]) + b"\x00" * (n - 4)


# ------------------------------------------------------------- roundtrips
def test_stub_roundtrip_matrix():
    for rate in (32000, 44100, 48000):
        for ch in (1, 2):
            m = probe(encode_stub(n_frames=12, sample_rate=rate,
                                  bitrate_kbps=128, channels=ch))
            assert m["sample_rate"] == rate and m["channels"] == ch
            assert m["n_frames"] == 12 and m["bitrate_kbps"] == 128
            assert m["duration_ms"] == 12 * 1152 * 1000 // rate
            assert m["version"] == "MPEG-1" and m["layer"] == "III"


def test_mpeg2_and_xing_and_id3():
    m = probe(encode_stub(n_frames=9, sample_rate=22050, bitrate_kbps=64))
    assert m["version"] == "MPEG-2" and m["sample_rate"] == 22050
    assert m["duration_ms"] == 9 * 576 * 1000 // 22050  # 576 samples/frame

    m = probe(encode_stub(n_frames=40, xing=True))
    assert m["has_xing"] and not m["vbr"] and m["n_frames"] == 40

    m = probe(encode_stub(n_frames=7, id3v2_bytes=500))
    assert m["n_frames"] == 7  # ID3v2 prefix skipped, not miscounted


# ------------------------------------------ layouts the stub never emits
def test_vbr_stream_has_null_bitrate():
    """Frames at different bitrates + a 'Xing' tag: bitrate_kbps must be
    None (no single number is honest), frame count from the walk."""
    frames = (_frame_v1_l3(128, 44100) + _frame_v1_l3(192, 44100)
              + _frame_v1_l3(64, 44100) + _frame_v1_l3(128, 44100))
    m = probe(frames)
    assert m["bitrate_kbps"] is None
    assert m["n_frames"] == 4
    # with an explicit Xing VBR header carrying the count
    first = bytearray(_frame_v1_l3(128, 44100))
    xo = 4 + 32  # MPEG-1 stereo side info
    first[xo:xo + 4] = b"Xing"
    first[xo + 4:xo + 8] = struct.pack(">I", 1)
    first[xo + 8:xo + 12] = struct.pack(">I", 3)
    m = probe(bytes(first) + frames[:0] + _frame_v1_l3(192, 44100) * 3)
    assert m["vbr"] and m["n_frames"] == 3 and m["bitrate_kbps"] is None


def test_padding_bit_and_trailing_id3v1():
    data = (_frame_v1_l3(128, 44100, padding=1) * 3
            + b"TAG" + b"\x00" * 125)
    m = probe(data)
    assert m["n_frames"] == 3  # padded frame length honored, TAG stops walk


def test_mono_and_mpeg25():
    m = probe(_frame_v1_l3(128, 44100, mono=True) * 2)
    assert m["channels"] == 1
    # MPEG-2.5 (version bits 00), Layer III, 11025 Hz, 64 kbps (idx 8)
    b1 = 0xE0 | (0 << 3) | (1 << 1) | 1
    n = 72000 * 64 // 11025
    frame = bytes([0xFF, b1, (8 << 4) | (0 << 2), 0x00]) + b"\x00" * (n - 4)
    m = probe(frame * 5)
    assert m["version"] == "MPEG-2.5" and m["sample_rate"] == 11025
    assert m["n_frames"] == 5


def test_layer2_probes():
    # Layer II: layer bits 10; 1152 samples/frame; ITS OWN bitrate table
    # (index 8 = 128 kbps — Layer III's index 8 means 112, so a decoder
    # reusing the L3 table desyncs on the very next frame)
    b1 = 0xE0 | (3 << 3) | (2 << 1) | 1
    n = 144000 * 128 // 44100
    frame = bytes([0xFF, b1, (8 << 4) | (0 << 2), 0x00]) + b"\x00" * (n - 4)
    m = probe(frame * 2)
    assert m["layer"] == "II" and m["n_frames"] == 2
    assert m["bitrate_kbps"] == 128
    assert m["duration_ms"] == 2 * 1152 * 1000 // 44100


def test_layer1_probes():
    # Layer I: 384 samples/frame, 4-byte slots (frame length formula has
    # the x4), its own table (index 5 = 160 kbps)
    b1 = 0xE0 | (3 << 3) | (3 << 1) | 1
    n = (12000 * 160 // 44100) * 4
    frame = bytes([0xFF, b1, (5 << 4) | (0 << 2), 0x00]) + b"\x00" * (n - 4)
    m = probe(frame * 3)
    assert m["layer"] == "I" and m["n_frames"] == 3
    assert m["bitrate_kbps"] == 160
    assert m["duration_ms"] == 3 * 384 * 1000 // 44100


# ------------------------------------------------------------ error paths
def test_error_paths():
    with pytest.raises(Mp3Error, match="no MPEG frame sync"):
        probe(b"\x00" * 64)
    with pytest.raises(Mp3Error, match="truncated final frame"):
        probe(encode_stub()[:100])
    with pytest.raises(Mp3Error, match="no audio data"):
        probe(b"ID3\x04\x00\x00\x00\x00\x00\x05" + b"\x00" * 5)
    with pytest.raises(Mp3Error, match="sync lost"):
        probe(_frame_v1_l3(128, 44100) + b"junk" + b"\x00" * 64)
    with pytest.raises(Mp3Error, match="malformed ID3v2"):
        probe(b"ID3\x04\x00\x00\xff\xff\xff\xff" + b"\x00" * 64)
    with pytest.raises(Mp3Error, match="reserved"):
        # version bits 01 (reserved)
        probe(bytes([0xFF, 0xE0 | (1 << 3) | (1 << 1) | 1, 0x92, 0]) + b"\x00" * 64)


def test_decode_refusal_names_codec_but_broken_says_broken():
    with pytest.raises(NotImplementedError, match="MPEG-1 Layer III"):
        decode_samples(encode_stub())
    # a broken payload must say "broken", not "refused"
    with pytest.raises(Mp3Error):
        decode_samples(b"\x00" * 64)


def test_media_ingest_mp3_is_exact_only():
    from verified_sources_spark.streaming.media_ingest import (
        perceptual_fingerprint,
    )

    with pytest.raises(ValueError):
        perceptual_fingerprint(encode_stub())
