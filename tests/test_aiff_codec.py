"""AIFF codec (llm/aiff_codec.py): 80-bit extended-float sample rates,
big-endian + sowt PCM decode, SSND offsets, named AIFC refusals, and
the audio_io integration."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from verified_sources_spark.llm.aiff_codec import (
    AiffError,
    _read_extended,
    _write_extended,
    decode,
    encode,
    probe,
)


def _tone(n=800, rate=8000):
    return 0.5 * np.sin(2 * np.pi * 440 * np.arange(n) / rate)


def test_extended_float_roundtrip_and_vectors():
    for rate in (8000, 11025, 22050, 44100, 48000, 96000):
        assert _read_extended(_write_extended(rate)) == rate
    # the canonical 44100 vector: 0x400E AC44...
    assert _write_extended(44100)[:4] == bytes.fromhex("400eac44")


@pytest.mark.parametrize("sowt", [False, True])
def test_pcm_roundtrip(sowt):
    x = _tone()
    data = encode(x, 8000, sowt=sowt)
    m = probe(data)
    assert (m["sample_rate"], m["n_frames"], m["channels"]) == (8000, 800, 1)
    assert m["duration_ms"] == 100
    assert m["compression"] == ("sowt" if sowt else "NONE")
    out = decode(data)
    assert np.abs(out["samples"][:, 0] - x).max() < 1e-3


def test_stereo_and_ssnd_offset():
    st = np.stack([_tone(), -_tone()], axis=1)
    data = encode(st, 8000)
    # splice 4 junk bytes into SSND with a matching offset field — the
    # decoder must honor it (a layout the fixture writer never emits)
    i = data.index(b"SSND")
    (size,) = struct.unpack_from(">I", data, i + 4)
    body = data[i + 8 : i + 8 + size]
    new_body = struct.pack(">II", 4, 0) + b"\xde\xad\xbe\xef" + body[8:]
    patched = (data[:i] + b"SSND" + struct.pack(">I", len(new_body))
               + new_body + data[i + 8 + size :])
    out = decode(patched)
    assert out["samples"].shape == (800, 2)
    assert np.abs(out["samples"] - st).max() < 1e-3


def test_named_refusal_and_errors():
    data = bytearray(encode(_tone(), 8000, sowt=True))
    i = data.index(b"sowt")
    data[i : i + 4] = b"ima4"
    with pytest.raises(AiffError, match="ima4"):
        decode(bytes(data))
    with pytest.raises(AiffError, match="not an AIFF"):
        probe(b"RIFF" + b"\x00" * 20)
    with pytest.raises(AiffError, match="truncated"):
        probe(encode(_tone(), 8000)[:30])
    with pytest.raises(AiffError, match="truncated"):
        decode(encode(_tone(), 8000)[:-100])


def test_audio_io_integration():
    from verified_sources_spark.llm.audio_io import (
        decode_samples,
        probe_audio,
        sniff_audio_format,
    )

    data = encode(_tone(), 16000)
    assert sniff_audio_format(data) == "aiff"
    m = probe_audio(data)
    assert m["container"] == "aiff" and m["codec"] == "PCM_BE"
    assert m["duration_ms"] == 50
    assert decode_samples(data)["n_frames"] == 800
    m = probe_audio(encode(_tone(), 16000, sowt=True))
    assert m["codec"] == "PCM_LE"
