"""WebM/Matroska EBML probe (llm/webm_codec.py): element walks over
layouts the stub does not emit (matroska doctype, unknown-size live
Segments, multi-byte varints, audio-only files), bounds-checked error
paths, and the video_io sniff/probe/refusal integration."""

from __future__ import annotations

import struct

import pytest

from verified_sources_spark.llm.webm_codec import (
    WebmError,
    encode_stub,
    probe,
)


def test_stub_roundtrip():
    m = probe(encode_stub(width=640, height=360, n_frames=30, fps=15.0))
    assert m["doctype"] == "webm"
    assert (m["width"], m["height"], m["n_frames"]) == (640, 360, 30)
    assert m["fps"] == pytest.approx(15.0, rel=1e-6)
    assert m["duration_ms"] == 2000 and m["codec"] == "V_VP9"
    assert m["has_audio"] is False


def test_matroska_with_audio_track():
    m = probe(encode_stub(width=320, height=240, n_frames=24, fps=24.0,
                          codec="V_VP8", audio=True, doctype="matroska"))
    assert m["doctype"] == "matroska" and m["codec"] == "V_VP8"
    assert m["has_audio"] and m["audio_channels"] == 2
    assert m["audio_sample_rate"] == 48000
    assert len(m["tracks"]) == 2
    assert {t["type"] for t in m["tracks"]} == {1, 2}


def test_unknown_size_segment_live_stream_layout():
    """Live/streamed WebM writes an all-ones (unknown) Segment size —
    the element then extends to end-of-buffer.  The stub never emits
    this; rewrite its Segment size on the wire."""
    data = encode_stub(n_frames=12, fps=10.0)
    seg = bytes.fromhex("18538067")
    i = data.index(seg)
    b0 = data[i + 4]
    n = 8 - b0.bit_length() + 1
    live = data[: i + 4] + b"\xff" + data[i + 4 + n :]
    m = probe(live)
    assert m["n_frames"] == 12 and m["duration_ms"] == 1200


def test_nondefault_timecode_scale():
    """A 100µs TimecodeScale (the stub always writes 1ms): duration
    math must follow the declared scale."""
    data = encode_stub(n_frames=10, fps=10.0)
    # stub writes TimecodeScale element 2AD7B1 size=3 value=0x0F4240 (1e6)
    i = data.index(bytes.fromhex("2AD7B1"))
    assert data[i + 4 : i + 7] == (1_000_000).to_bytes(3, "big")
    patched = (data[: i + 4] + (100_000).to_bytes(3, "big") + data[i + 7 :])
    m = probe(patched)
    assert m["timecode_scale"] == 100_000
    # same duration_tc ticks, 10x finer scale → 10x shorter wall time
    assert m["duration_ms"] == 100


def test_error_paths():
    data = encode_stub()
    with pytest.raises(WebmError, match="not an EBML payload"):
        probe(b"\x00" * 32)
    with pytest.raises(WebmError, match="truncated"):
        probe(data[:10])
    with pytest.raises(WebmError, match="truncated"):
        probe(data[:60])
    with pytest.raises(WebmError, match="no Segment"):
        probe(data[: data.index(bytes.fromhex("18538067"))])
    # EBML ID byte 0x00 is malformed (would claim a >8-byte ID)
    hdr = bytes.fromhex("1A45DFA3") + b"\x84" + b"\x00\x00\x00\x00"
    with pytest.raises(WebmError):
        probe(hdr + b"\x00" * 8)


def test_video_io_integration_and_refusal():
    from verified_sources_spark.llm.video_io import (
        VideoDecodeRefusal,
        probe_video,
        sample_frames,
        sniff_video_format,
    )

    data = encode_stub(width=64, height=48, n_frames=20, fps=10.0)
    assert sniff_video_format(data) == "webm"
    m = probe_video(data)
    assert m["container"] == "webm" and m["codec"] == "V_VP9"
    assert (m["width"], m["height"], m["n_frames"]) == (64, 48, 20)
    assert m["duration_ms"] == 2000
    with pytest.raises(VideoDecodeRefusal, match="V_VP9"):
        sample_frames(data, m, every_ms=500)
    # the shared decoder seam serves webm too
    from verified_sources_spark.llm import video_io

    video_io.register_mp4_decoder(
        "fake-webm", lambda p, meta, ms: [(0, 0, bytes(64 * 48 * 3))]
    )
    try:
        out = sample_frames(data, m, every_ms=500, decoder="fake-webm")
        assert len(out) == 1
    finally:
        video_io._MP4_DECODERS.pop("fake-webm", None)


def test_media_ingest_webm_is_exact_only():
    from verified_sources_spark.streaming.media_ingest import (
        perceptual_fingerprint,
    )

    with pytest.raises(NotImplementedError, match="V_VP9"):
        perceptual_fingerprint(encode_stub())
