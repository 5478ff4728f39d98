"""Pure-stdlib WAV (RIFF/PCM) codec — the audio analogue of png_codec.

Makes the multimodal AUDIO decode path REAL with zero dependencies
(stdlib struct only, numpy for sample math): parse the RIFF container,
locate ``fmt `` / ``data`` chunks, and expose integer PCM samples for
feature extraction on executors.  Like png_codec, this exists so the
Spark-side plumbing (mapInPandas batch shapes, schema, per-object error
isolation) is exercised end-to-end against genuine media bytes, not a
byte-sum fake — the reference's unstructured/filesystem sources treat
media as opaque payloads plus typed metadata (SURVEY.md §2.1 #31/#32);
the decode itself is the part their container also outsources.

Supports the overwhelmingly common on-disk shapes: PCM (format 1) and
IEEE float (format 3), 8/16/24/32-bit, any channel count/rate, plus the
G.711 telephony codings A-law (format 6) and μ-law (format 7) — call
recordings and voicemail corpora are full of them.  Everything else
raises ``WavError`` — per-object isolation in ``audio_features`` maps a
poisoned payload to an error row, never a failed task.
"""

from __future__ import annotations

import struct

__all__ = ["WavError", "probe", "decode", "encode"]


class WavError(ValueError):
    pass


def _chunks(data: bytes):
    """Yield (chunk_id, payload) over a RIFF body; tolerant of the odd
    trailing pad byte chunks carry when their size is odd."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE payload")
    pos = 12
    while pos + 8 <= len(data):
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise WavError(f"truncated {cid!r} chunk: {len(body)} < {size}")
        yield cid, body
        pos += 8 + size + (size & 1)


def probe(data: bytes) -> dict:
    """Header-only metadata — no sample materialization (the cheap path
    for manifest building over 100 TB of audio)."""
    fmt = None
    data_len = None
    for cid, body in _chunks(data):
        if cid == b"fmt " and fmt is None:
            if len(body) < 16:
                raise WavError("fmt chunk too short")
            (audio_format, channels, rate, _br, block_align, bits) = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            fmt = {
                "format": audio_format,
                "channels": channels,
                "sample_rate": rate,
                "block_align": block_align,
                "bits_per_sample": bits,
            }
        elif cid == b"data" and data_len is None:
            data_len = len(body)
    if fmt is None or data_len is None:
        raise WavError("missing fmt/data chunk")
    if fmt["format"] not in (1, 3, 6, 7):
        raise WavError(f"unsupported WAV format code {fmt['format']}")
    if fmt["format"] == 3 and fmt["bits_per_sample"] not in (32, 64):
        raise WavError("IEEE-float WAV must be 32- or 64-bit")
    if fmt["format"] == 1 and fmt["bits_per_sample"] not in (8, 16, 24, 32):
        raise WavError(f"unsupported PCM depth {fmt['bits_per_sample']}")
    if fmt["format"] in (6, 7) and fmt["bits_per_sample"] != 8:
        raise WavError("G.711 A-law/mu-law WAV must be 8-bit")
    if fmt["block_align"] == 0 or fmt["channels"] == 0 or fmt["sample_rate"] == 0:
        raise WavError("degenerate fmt chunk")
    n_frames = data_len // fmt["block_align"]
    fmt["n_frames"] = n_frames
    fmt["duration_ms"] = int(n_frames * 1000 // fmt["sample_rate"])
    return fmt


def decode(data: bytes) -> dict:
    """Full decode → probe fields plus ``samples``: a float64 numpy array
    of shape (n_frames, channels), normalized to [-1, 1] for integer PCM
    (8-bit unsigned is centered first, per spec)."""
    import numpy as np

    meta = probe(data)
    body = next(b for cid, b in _chunks(data) if cid == b"data")
    bits, ch = meta["bits_per_sample"], meta["channels"]
    usable = meta["n_frames"] * meta["block_align"]
    body = body[:usable]
    if meta["format"] == 3:
        arr = np.frombuffer(body, dtype="<f4" if bits == 32 else "<f8").astype(
            np.float64
        )
    elif meta["format"] == 7:  # G.711 mu-law
        u = (~np.frombuffer(body, dtype=np.uint8).astype(np.int32)) & 0xFF
        mag = ((((u & 0x0F) << 3) + 0x84) << ((u >> 4) & 7)) - 0x84
        arr = np.where(u & 0x80, -mag, mag).astype(np.float64) / 32768.0
    elif meta["format"] == 6:  # G.711 A-law
        a = np.frombuffer(body, dtype=np.uint8).astype(np.int32) ^ 0x55
        seg = (a >> 4) & 7
        mant = a & 0x0F
        mag = np.where(
            seg == 0,
            (mant << 4) + 8,
            ((mant << 4) + 0x108) << np.maximum(seg - 1, 0),
        )
        # A-law sign convention: bit 7 SET means positive
        arr = np.where(a & 0x80, mag, -mag).astype(np.float64) / 32768.0
    elif bits == 8:
        arr = (np.frombuffer(body, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    elif bits == 16:
        arr = np.frombuffer(body, dtype="<i2").astype(np.float64) / 32768.0
    elif bits == 32:
        arr = np.frombuffer(body, dtype="<i4").astype(np.float64) / 2147483648.0
    else:  # 24-bit: no native dtype — widen via a zero-padded int32 view
        raw = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        padded = np.zeros((raw.shape[0], 4), dtype=np.uint8)
        padded[:, 1:] = raw  # little-endian: pad the LOW byte, then >> 8
        arr = (padded.view("<i4").ravel() >> 8).astype(np.float64) / 8388608.0
    meta["samples"] = arr.reshape(-1, ch)
    return meta


def encode(
    samples, sample_rate: int, bits: int = 16, encoding: str = "pcm"
) -> bytes:
    """float samples in [-1, 1] (array-like, 1-D mono or (frames,
    channels)) → WAV bytes.  ``encoding``: 'pcm' (8/16-bit), 'ulaw' or
    'alaw' (G.711 companding, 8-bit).  Deterministic: fixture generator
    for tests and the executor-side round-trip check."""
    import numpy as np

    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    if encoding == "ulaw":
        lin = np.clip(np.round(arr * 32767.0), -32635, 32635).astype(np.int64)
        sign = np.where(lin < 0, 0x80, 0)
        x = np.abs(lin) + 0x84
        # exponent = bit position of the leading 1 above bit 7
        exp = np.maximum(
            np.int64(np.floor(np.log2(np.maximum(x, 1)))) - 7, 0
        )
        mant = (x >> (exp + 3)) & 0x0F
        pcm = ((~(sign | (exp << 4) | mant)) & 0xFF).astype(np.uint8).tobytes()
        fmt_code, bits = 7, 8
    elif encoding == "alaw":
        lin = np.clip(np.round(arr * 32767.0), -32767, 32767).astype(np.int64)
        sign = np.where(lin >= 0, 0x80, 0)
        x = np.abs(lin)
        bl = np.int64(np.floor(np.log2(np.maximum(x, 1)))) + 1
        seg = np.maximum(bl - 8, 0)
        a = np.where(seg == 0, x >> 4, ((x >> (seg + 3)) & 0x0F) | (seg << 4))
        pcm = ((a | sign) ^ 0x55).astype(np.uint8).tobytes()
        fmt_code, bits = 6, 8
    elif encoding != "pcm":
        raise WavError(f"encode supports pcm/ulaw/alaw, not {encoding!r}")
    elif bits == 16:
        pcm = np.clip(np.round(arr * 32767.0), -32768, 32767).astype("<i2").tobytes()
        fmt_code = 1
    elif bits == 8:
        pcm = (
            np.clip(np.round(arr * 127.0) + 128, 0, 255).astype(np.uint8).tobytes()
        )
        fmt_code = 1
    else:
        raise WavError("encode supports 8- or 16-bit PCM")
    channels = arr.shape[1]
    block_align = channels * bits // 8
    fmt = struct.pack(
        "<HHIIHH", fmt_code, channels, sample_rate, sample_rate * block_align,
        block_align, bits,
    )
    # RIFF chunks are word-aligned: an odd-sized data chunk carries a
    # trailing pad byte EXCLUDED from the chunk size but included in the
    # RIFF size (8-bit mono with an odd frame count hits this)
    pad = b"\x00" if len(pcm) % 2 else b""
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm + pad
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body
