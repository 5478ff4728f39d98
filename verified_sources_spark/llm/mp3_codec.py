"""Pure-stdlib MP3 (MPEG-1/2/2.5 audio) frame-header probe.

Compressed audio in web corpora is overwhelmingly MP3; full sample
decode (polyphase subband synthesis + Huffman) is out of pure-stdlib
reach, but the FRAME STREAM is a walkable sequence of 4-byte headers
whose fields carry everything a 100 TB curation manifest needs:
sample rate, channel mode, bitrate, frame count, duration.  ``probe``
skips an ID3v2 prefix, syncs on the first frame, reads a Xing/Info
VBR header when present (frame count without walking), else walks
every frame header — validating each sync and length against the
buffer, so truncation raises ``Mp3Error`` (never a bare struct.error,
never a garbage count).  ``decode_samples`` refuses loudly WITH THE
CODEC NAMED — the honest-refusal contract shared by every codec here;
media_ingest therefore treats MP3s exact-dedup-only while their
manifests stay first-class.

``encode_stub`` emits structurally valid silent CBR frames (optional
ID3v2 prefix, optional Xing first frame, MPEG-1 or MPEG-2, mono or
stereo) for fixtures; tests probe layouts the stub does NOT emit
byte-for-byte plus every error path.

Reference analogue: the mux source serves audio/video as playback
manifests, not samples (/root/reference/sources/mux/__init__.py:15-28).
"""

from __future__ import annotations

import struct

__all__ = ["Mp3Error", "probe", "encode_stub", "decode_samples"]


class Mp3Error(ValueError):
    pass


# bitrate (kbps) tables by the 4-bit index; 0 = "free", 15 bad.
# MPEG-1 has one table per layer; MPEG-2/2.5 share one for Layers II+III.
_BITRATES_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                   224, 256, 320]
_BITRATES_V1_L2 = [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                   256, 320, 384]
_BITRATES_V1_L1 = [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320,
                   352, 384, 416, 448]
_BITRATES_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112,
                   128, 144, 160]
_BITRATES_V2_L1 = [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176,
                   192, 224, 256]
_RATES = {
    3: [44100, 48000, 32000],   # MPEG-1
    2: [22050, 24000, 16000],   # MPEG-2
    0: [11025, 12000, 8000],    # MPEG-2.5
}
_VERSION_NAME = {3: "MPEG-1", 2: "MPEG-2", 0: "MPEG-2.5"}
_LAYER_NAME = {3: "I", 2: "II", 1: "III"}


def _parse_header(data: bytes, pos: int) -> dict:
    """Decode one 4-byte frame header at ``pos`` (sync already checked)."""
    b1, b2, b3 = data[pos + 1], data[pos + 2], data[pos + 3]
    version = (b1 >> 3) & 0x3          # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=bad
    layer = (b1 >> 1) & 0x3            # 1=III, 2=II, 3=I, 0=bad
    if version == 1 or layer == 0:
        raise Mp3Error(f"reserved MPEG version/layer bits at offset {pos}")
    bitrate_idx = (b2 >> 4) & 0xF
    rate_idx = (b2 >> 2) & 0x3
    if bitrate_idx in (0, 15) or rate_idx == 3:
        raise Mp3Error(
            f"free/bad bitrate or reserved sample-rate index at offset {pos}"
        )
    padding = (b2 >> 1) & 0x1
    channel_mode = (b3 >> 6) & 0x3     # 0 stereo, 1 joint, 2 dual, 3 mono
    rate = _RATES[version][rate_idx]
    if layer == 1:  # Layer III
        kbps = (_BITRATES_V1_L3 if version == 3 else _BITRATES_V2_L3)[bitrate_idx]
        spf = 1152 if version == 3 else 576
        frame_len = (144000 if version == 3 else 72000) * kbps // rate + padding
    elif layer == 2:  # Layer II (1152 samples at every MPEG version)
        kbps = (_BITRATES_V1_L2 if version == 3 else _BITRATES_V2_L3)[bitrate_idx]
        spf = 1152
        frame_len = 144000 * kbps // rate + padding
    else:  # Layer I: 384 samples, 4-byte slots, padding adds one SLOT
        kbps = (_BITRATES_V1_L1 if version == 3 else _BITRATES_V2_L1)[bitrate_idx]
        spf = 384
        frame_len = (12000 * kbps // rate + padding) * 4
    return {
        "version": version,
        "layer": layer,
        "kbps": kbps,
        "rate": rate,
        "spf": spf,
        "channels": 1 if channel_mode == 3 else 2,
        "frame_len": frame_len,
    }


def _id3v2_end(data: bytes) -> int:
    """Byte offset past an ID3v2 prefix (0 if none): 'ID3' + ver(2) +
    flags(1) + 28-bit syncsafe size."""
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    size = 0
    for b in data[6:10]:
        if b & 0x80:
            raise Mp3Error("malformed ID3v2 syncsafe size")
        size = (size << 7) | b
    return 10 + size


def _xing_offset(h: dict) -> int:
    """Xing/Info tag offset inside the first frame: past the header (4)
    and the Layer III side info (MPEG-1: 32 stereo / 17 mono;
    MPEG-2/2.5: 17 stereo / 9 mono)."""
    if h["version"] == 3:
        return 4 + (17 if h["channels"] == 1 else 32)
    return 4 + (9 if h["channels"] == 1 else 17)


def probe(data: bytes) -> dict:
    """Header-only manifest: version, layer, sample_rate, channels,
    bitrate_kbps (None when VBR), n_frames, duration_ms, has_xing,
    vbr.  No sample synthesis — frame payloads are never interpreted."""
    pos = _id3v2_end(data)
    if pos + 4 > len(data):
        raise Mp3Error("no audio data after ID3v2 tag")
    if not (data[pos] == 0xFF and (data[pos + 1] & 0xE0) == 0xE0):
        raise Mp3Error(f"no MPEG frame sync at offset {pos}")
    first = _parse_header(data, pos)

    # Xing/Info VBR header in the first frame?
    has_xing = False
    vbr = False
    xing_frames = None
    xo = pos + _xing_offset(first)
    if xo + 8 <= len(data) and data[xo : xo + 4] in (b"Xing", b"Info"):
        has_xing = True
        vbr = data[xo : xo + 4] == b"Xing"
        (flags,) = struct.unpack_from(">I", data, xo + 4)
        if flags & 0x1:  # frames field present
            if xo + 12 > len(data):
                raise Mp3Error("truncated Xing header")
            (xing_frames,) = struct.unpack_from(">I", data, xo + 8)

    # walk the frame stream (also validates every header when no Xing)
    n_frames = 0
    kbps_seen: set[int] = set()
    p = pos
    while p + 4 <= len(data):
        if not (data[p] == 0xFF and (data[p + 1] & 0xE0) == 0xE0):
            if data[p : p + 3] == b"TAG":  # trailing ID3v1: done
                break
            raise Mp3Error(f"frame sync lost at offset {p}")
        h = _parse_header(data, p)
        if p + h["frame_len"] > len(data):
            raise Mp3Error(
                f"truncated final frame at offset {p}: "
                f"{len(data) - p} bytes < {h['frame_len']}"
            )
        kbps_seen.add(h["kbps"])
        n_frames += 1
        p += h["frame_len"]

    counted = n_frames
    if has_xing:
        # the Xing frame itself carries no audio
        counted = max(0, n_frames - 1)
        if xing_frames is not None:
            counted = xing_frames
    duration_ms = counted * first["spf"] * 1000 // first["rate"]
    cbr = len(kbps_seen) == 1 and not vbr
    return {
        "version": _VERSION_NAME[first["version"]],
        "layer": _LAYER_NAME[first["layer"]],
        "sample_rate": first["rate"],
        "channels": first["channels"],
        "bitrate_kbps": first["kbps"] if cbr else None,
        "n_frames": counted,
        "duration_ms": duration_ms,
        "has_xing": has_xing,
        "vbr": vbr,
    }


def decode_samples(data: bytes):
    """Honest refusal: PCM synthesis for MPEG Layer III needs Huffman
    entropy decode + IMDCT + polyphase filterbank — out of pure-stdlib
    reach.  The container probe (``probe``) serves manifests; exact
    dedup still applies to the bytes."""
    m = probe(data)  # a broken payload should say "broken", not "refused"
    raise NotImplementedError(
        f"cannot decode {m['version']} Layer {m['layer']} audio to PCM in "
        f"pure stdlib (Huffman + IMDCT + polyphase synthesis); probe() "
        f"serves header manifests"
    )


# --------------------------------------------------------------- fixtures
def encode_stub(
    n_frames: int = 20,
    sample_rate: int = 44100,
    bitrate_kbps: int = 128,
    channels: int = 2,
    xing: bool = False,
    id3v2_bytes: int = 0,
) -> bytes:
    """Structurally valid silent CBR MP3: ``n_frames`` MPEG-1/2 Layer
    III frames (version picked by the sample rate), optional ID3v2
    prefix and Xing first frame.  Frame payloads are zeros — the probe
    never interprets them."""
    for version, rates in ((3, _RATES[3]), (2, _RATES[2]), (0, _RATES[0])):
        if sample_rate in rates:
            rate_idx = rates.index(sample_rate)
            break
    else:
        raise Mp3Error(f"unsupported sample rate {sample_rate}")
    table = _BITRATES_V1_L3 if version == 3 else _BITRATES_V2_L3
    if bitrate_kbps not in table[1:]:
        raise Mp3Error(f"unsupported bitrate {bitrate_kbps} for this version")
    bitrate_idx = table.index(bitrate_kbps)
    frame_len = (144000 if version == 3 else 72000) * bitrate_kbps // sample_rate
    b1 = 0xE0 | (version << 3) | (1 << 1) | 1  # sync low bits+ver+LayerIII+noCRC
    b2 = (bitrate_idx << 4) | (rate_idx << 2)
    b3 = (0x3 << 6) if channels == 1 else 0x0  # mono / stereo
    header = bytes([0xFF, b1, b2, b3])
    frame = header + b"\x00" * (frame_len - 4)
    out = bytearray()
    if id3v2_bytes:
        size = id3v2_bytes
        ss = bytes([(size >> 21) & 0x7F, (size >> 14) & 0x7F,
                    (size >> 7) & 0x7F, size & 0x7F])
        out += b"ID3\x04\x00\x00" + ss + b"\x00" * size
    if xing:
        xf = bytearray(frame)
        xo = _xing_offset(
            {"version": version, "channels": channels}
        )
        xf[xo : xo + 4] = b"Info"  # CBR stream with a frame-count header
        xf[xo + 4 : xo + 8] = struct.pack(">I", 0x1)
        xf[xo + 8 : xo + 12] = struct.pack(">I", n_frames)
        out += bytes(xf)
    out += frame * n_frames
    return bytes(out)
