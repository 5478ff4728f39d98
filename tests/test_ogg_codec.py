"""Ogg container probe (llm/ogg_codec.py): page walks, Opus vs Vorbis
identification, 48kHz-granule vs native-rate duration math, lacing
edge cases, error paths, and the audio_io integration."""

from __future__ import annotations

import struct

import pytest

from verified_sources_spark.llm.ogg_codec import (
    OggError,
    decode_samples,
    encode_stub,
    probe,
)


def test_opus_probe_and_preskip():
    m = probe(encode_stub(codec="opus", channels=2, sample_rate=16000,
                          granule=96000, pre_skip=312))
    assert m["codec"] == "opus" and m["channels"] == 2
    assert m["sample_rate"] == 16000  # input rate, informational
    # Opus granules tick at 48kHz regardless of input rate; pre-skip
    # samples don't count toward duration
    assert m["n_samples"] == 96000 - 312
    assert m["duration_ms"] == (96000 - 312) * 1000 // 48000
    assert m["n_pages"] == 3


def test_vorbis_probe_uses_native_rate():
    m = probe(encode_stub(codec="vorbis", channels=1, sample_rate=22050,
                          granule=44100))
    assert m["codec"] == "vorbis"
    assert m["duration_ms"] == 2000  # granule / native rate


def test_large_payload_multi_lace_page():
    """A >255-byte packet needs multiple lacing values — the stub emits
    them; the walk must honor the full laced size."""
    m = probe(encode_stub(frame_bytes=b"\x00" * 700, granule=4800))
    assert m["duration_ms"] == 100 and m["n_pages"] == 3


def test_error_paths():
    data = encode_stub()
    with pytest.raises(OggError, match="no OggS magic"):
        probe(b"\x00" * 32)
    with pytest.raises(OggError):
        probe(data[:30])
    with pytest.raises(OggError, match="sync lost"):
        probe(data + b"JUNKJUNK" + b"\x00" * 30)
    with pytest.raises(OggError, match="unrecognized BOS"):
        # a BOS page whose first packet is neither OpusHead nor vorbis
        bad = bytearray(data)
        i = bad.index(b"OpusHead")
        bad[i : i + 8] = b"XXXXXXXX"
        probe(bytes(bad))
    with pytest.raises(OggError, match="unknown Ogg version"):
        bad = bytearray(data)
        bad[4] = 9
        probe(bytes(bad))


def test_refusals_name_the_codec():
    with pytest.raises(NotImplementedError, match="opus"):
        decode_samples(encode_stub(codec="opus"))
    with pytest.raises(NotImplementedError, match="vorbis"):
        decode_samples(encode_stub(codec="vorbis"))


def test_audio_io_integration():
    from verified_sources_spark.llm.audio_io import (
        decode_samples as any_decode,
        probe_audio,
        sniff_audio_format,
    )

    data = encode_stub(codec="opus", granule=48000)
    assert sniff_audio_format(data) == "ogg"
    m = probe_audio(data)
    assert m["container"] == "ogg" and m["codec"] == "OPUS"
    assert m["duration_ms"] == 1000
    with pytest.raises(NotImplementedError, match="opus"):
        any_decode(data)
    # media ingestion: exact-only
    from verified_sources_spark.streaming.media_ingest import (
        perceptual_fingerprint,
    )

    with pytest.raises(ValueError):
        perceptual_fingerprint(data)
