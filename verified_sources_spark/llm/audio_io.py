"""Format-sniffing audio access: ONE entry point over the stdlib
containers — the audio mirror of llm/video_io.

``probe_audio`` dispatches on magic bytes — RIFF/WAVE → llm/wav_codec
(PCM, IEEE float, G.711, IMA ADPCM — all sample-decodable), fLaC →
llm/flac_codec (STREAMINFO manifest; subframe decode refuses by name),
ID3v2 prefix or MPEG frame sync → llm/mp3_codec (frame-walk manifest;
PCM synthesis refuses by name) — and returns a normalized header dict.
``decode_samples`` decodes where a pure-Python decoder exists (WAV +
AIFF PCM, and full FLAC frame decode with CRC/MD5 verification) and
refuses WITH THE CODEC NAMED where it can't, so media ingestion
degrades to exact-dedup-only with full probed manifests for the
compressed formats — the same honest posture as the video seam.
"""

from __future__ import annotations

__all__ = ["sniff_audio_format", "probe_audio", "decode_samples"]


def sniff_audio_format(payload: bytes) -> str | None:
    """'wav' / 'flac' / 'ogg' / 'mp3' / None — magic bytes only, no
    decode.  MP3 matches an ID3v2 prefix or a leading MPEG frame sync
    (the format has no stronger magic — inherent to the container)."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"fLaC":
        return "flac"
    if payload[:4] == b"FORM" and payload[8:12] in (b"AIFF", b"AIFC"):
        return "aiff"
    if payload[:4] == b"OggS":
        return "ogg"
    if payload[:3] == b"ID3":
        return "mp3"
    if len(payload) >= 2 and payload[0] == 0xFF and (payload[1] & 0xE0) == 0xE0:
        return "mp3"
    return None


def probe_audio(payload: bytes) -> dict:
    """Normalized header metadata for any container: container,
    sample_rate, channels, n_samples (total frames), duration_ms,
    codec, plus the raw container-specific probe under ``raw``.
    Header-only — samples are never materialized."""
    fmt = sniff_audio_format(payload)
    if fmt == "wav":
        from verified_sources_spark.llm.wav_codec import probe

        m = probe(payload)
        codec = {1: "PCM", 3: "IEEE_FLOAT", 6: "G711_ALAW",
                 7: "G711_MULAW", 17: "IMA_ADPCM"}.get(
            m["format"], f"WAV_{m['format']}"
        )
        return {
            "container": "wav",
            "sample_rate": m["sample_rate"],
            "channels": m["channels"],
            "n_samples": m["n_frames"],
            "duration_ms": m["duration_ms"],
            "codec": codec,
            "raw": m,
        }
    if fmt == "flac":
        from verified_sources_spark.llm.flac_codec import probe

        m = probe(payload)
        return {
            "container": "flac",
            "sample_rate": m["sample_rate"],
            "channels": m["channels"],
            "n_samples": m["total_samples"],
            "duration_ms": m["duration_ms"],
            "codec": "FLAC",
            "raw": m,
        }
    if fmt == "aiff":
        from verified_sources_spark.llm.aiff_codec import probe

        m = probe(payload)
        return {
            "container": "aiff",
            "sample_rate": m["sample_rate"],
            "channels": m["channels"],
            "n_samples": m["n_frames"],
            "duration_ms": m["duration_ms"],
            "codec": ("PCM_BE" if m["compression"] == "NONE"
                      else "PCM_LE" if m["compression"] == "sowt"
                      else f"AIFC_{m['compression']}"),
            "raw": m,
        }
    if fmt == "ogg":
        from verified_sources_spark.llm.ogg_codec import probe

        m = probe(payload)
        return {
            "container": "ogg",
            "sample_rate": m["sample_rate"],
            "channels": m["channels"],
            "n_samples": m["n_samples"],
            "duration_ms": m["duration_ms"],
            "codec": m["codec"].upper(),
            "raw": m,
        }
    if fmt == "mp3":
        from verified_sources_spark.llm.mp3_codec import probe

        m = probe(payload)
        spf = {"I": 384}.get(m["layer"], 1152 if m["version"] == "MPEG-1"
                             else 576 if m["layer"] == "III" else 1152)
        return {
            "container": "mp3",
            "sample_rate": m["sample_rate"],
            "channels": m["channels"],
            "n_samples": m["n_frames"] * spf,
            "duration_ms": m["duration_ms"],
            "codec": f"{m['version']}-L{m['layer']}",
            "raw": m,
        }
    raise ValueError(
        "unrecognized audio payload (not WAV, AIFF, FLAC, Ogg or MP3)"
    )


def decode_samples(payload: bytes) -> dict:
    """Full sample decode where a pure-Python decoder exists (the WAV
    family + FLAC); Ogg and MP3 refuse with the codec named — callers
    treat that as 'manifest-only, exact-dedup-only'."""
    fmt = sniff_audio_format(payload)
    if fmt == "wav":
        from verified_sources_spark.llm.wav_codec import decode

        return decode(payload)
    if fmt == "aiff":
        from verified_sources_spark.llm.aiff_codec import decode

        return decode(payload)  # PCM decodes; AIFC types refuse by name
    if fmt == "flac":
        from verified_sources_spark.llm.flac_codec import (
            decode as flac_decode,
        )

        # full frame decode (CRC + STREAMINFO-MD5 verified): lossless
        # audio joins the same spectral-fingerprint path as WAV/AIFF
        return flac_decode(payload)
    if fmt == "ogg":
        from verified_sources_spark.llm.ogg_codec import (
            decode_samples as ogg_decode,
        )

        ogg_decode(payload)  # raises NotImplementedError naming opus/vorbis
    if fmt == "mp3":
        from verified_sources_spark.llm.mp3_codec import (
            decode_samples as mp3_decode,
        )

        mp3_decode(payload)  # raises NotImplementedError naming the layer
    raise ValueError(
        "unrecognized audio payload (not WAV, AIFF, FLAC, Ogg or MP3)"
    )
