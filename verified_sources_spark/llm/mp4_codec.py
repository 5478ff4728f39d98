"""Pure-stdlib ISO-BMFF (MP4/MOV/M4A) box parser — header-only probe.

Real web video corpora are overwhelmingly MP4/H.264; full pixel decode
of those codecs is out of pure-stdlib reach (entropy coding + motion
compensation), but the CONTAINER is a simple length-prefixed box tree
readable with ``struct`` alone.  ``probe`` walks
ftyp / moov / mvhd / trak / tkhd / mdia / mdhd / hdlr / minf / stbl /
(stsd, stsz, stts) and returns the manifest facts a 100 TB curation
pipeline needs BEFORE it ever decodes a pixel: dims, fps, duration,
sample count, codec fourcc, per-track layout.  Pixel decode refuses
loudly **with the codec named** (``avc1``/``hev1``/…) — the honest-
refusal contract shared by the table-format readers and every other
codec here: "not decodable in this environment" must never be confused
with "broken payload".  An optional real decoder plugs in through
llm/video_io's ``decoder=`` seam without touching this module.

``encode_stub`` builds a structurally valid minimal MP4 (ftyp + moov
with one video trak + mdat) for fixtures — the probe is tested against
files this encoder did NOT produce byte-for-byte (box order and
version variants are exercised in tests).

Reference analogue: mux video assets are served as playback manifests,
not pixels (/root/reference/sources/mux/__init__.py:15-28) — the same
"metadata first, bytes opaque" posture this probe implements.
"""

from __future__ import annotations

import struct

__all__ = ["Mp4Error", "probe", "encode_stub"]


class Mp4Error(ValueError):
    pass


def _boxes(data: bytes, pos: int, end: int):
    """Yield (fourcc, body_start, body_end) over one box run.

    Handles 32-bit sizes, 64-bit largesize (size==1) and
    to-end-of-file (size==0, last box only)."""
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        fourcc = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if body + 8 > end:
                raise Mp4Error("truncated largesize box header")
            (size,) = struct.unpack_from(">Q", data, body)
            body += 8
            if size < 16:
                raise Mp4Error(f"bad largesize {size} for {fourcc!r}")
            box_end = pos + size
        elif size == 0:  # to end of enclosing container
            box_end = end
        else:
            if size < 8:
                raise Mp4Error(f"bad size {size} for {fourcc!r}")
            box_end = pos + size
        if box_end > end:
            raise Mp4Error(
                f"truncated {fourcc!r} box: {end - pos} bytes < {box_end - pos}"
            )
        yield fourcc, body, box_end
        pos = box_end


def _child(data: bytes, start: int, end: int, fourcc: bytes):
    for fcc, b, e in _boxes(data, start, end):
        if fcc == fourcc:
            return b, e
    return None


def _fullbox(data: bytes, pos: int) -> tuple[int, int]:
    """(version, body_start_after_version_flags)."""
    return data[pos], pos + 4


def _parse_mvhd(data: bytes, b: int) -> tuple[int, int]:
    """(timescale, duration) — version 0 (32-bit) or 1 (64-bit)."""
    ver, p = _fullbox(data, b)
    if ver == 1:
        ts, dur = struct.unpack_from(">IQ", data, p + 16)
    else:
        ts, dur = struct.unpack_from(">II", data, p + 8)
    return ts, dur


def _parse_mdhd(data: bytes, b: int) -> tuple[int, int]:
    return _parse_mvhd(data, b)  # same creation/modification prefix layout


def _parse_tkhd(data: bytes, b: int, e: int) -> tuple[float, float]:
    """(width, height) as 16.16 fixed-point — last 8 bytes of tkhd."""
    w_fixed, h_fixed = struct.unpack_from(">II", data, e - 8)
    return w_fixed / 65536.0, h_fixed / 65536.0


def _parse_trak(data: bytes, b: int, e: int) -> dict:
    tk = {"handler": None, "codec": None, "timescale": 0, "duration": 0,
          "n_samples": 0, "width": 0.0, "height": 0.0,
          "channels": None, "sample_rate": None, "stts": []}
    r = _child(data, b, e, b"tkhd")
    if r:
        tk["width"], tk["height"] = _parse_tkhd(data, r[0], r[1])
    r = _child(data, b, e, b"mdia")
    if not r:
        return tk
    mb, me = r
    r = _child(data, mb, me, b"mdhd")
    if r:
        tk["timescale"], tk["duration"] = _parse_mdhd(data, r[0])
    r = _child(data, mb, me, b"hdlr")
    if r:
        _ver, p = _fullbox(data, r[0])
        tk["handler"] = data[p + 4 : p + 8].decode("ascii", errors="replace")
    r = _child(data, mb, me, b"minf")
    if not r:
        return tk
    r = _child(data, r[0], r[1], b"stbl")
    if not r:
        return tk
    sb, se = r
    r = _child(data, sb, se, b"stsd")
    if r:
        _ver, p = _fullbox(data, r[0])
        (n_entries,) = struct.unpack_from(">I", data, p)
        if n_entries >= 1:
            # first sample entry: 4-byte size + 4-byte format fourcc
            tk["codec"] = data[p + 8 : p + 12].decode("ascii", errors="replace")
            if tk["handler"] == "soun":
                # AudioSampleEntry body (after 8-byte size+fourcc at p+4):
                # 6 reserved + 2 dref + 2 version + 2 revision + 4 vendor
                # = 16 bytes, then channelcount(2) ... samplerate(16.16)
                ent = p + 12
                tk["channels"] = struct.unpack_from(">H", data, ent + 16)[0]
                tk["sample_rate"] = struct.unpack_from(">I", data, ent + 24)[0] >> 16
    r = _child(data, sb, se, b"stsz")
    if r:
        _ver, p = _fullbox(data, r[0])
        _uniform, count = struct.unpack_from(">II", data, p)
        tk["n_samples"] = count
    r = _child(data, sb, se, b"stts")
    if r:
        _ver, p = _fullbox(data, r[0])
        (n_entries,) = struct.unpack_from(">I", data, p)
        tk["stts"] = [
            struct.unpack_from(">II", data, p + 4 + 8 * i) for i in range(n_entries)
        ]
    return tk


def probe(data: bytes) -> dict:
    """Header-only manifest for an ISO-BMFF payload: brand, dims, fps,
    n_frames, duration_ms, codec fourcc, plus the full per-track list.
    No sample materialization — mdat is never touched."""
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise Mp4Error("not an ISO-BMFF payload (no ftyp)")
    brand = data[8:12].decode("ascii", errors="replace")
    mvhd_ts = mvhd_dur = 0
    tracks: list[dict] = []
    saw_moov = False
    for fcc, b, e in _boxes(data, 0, len(data)):
        if fcc == b"moov":
            saw_moov = True
            for f2, b2, e2 in _boxes(data, b, e):
                if f2 == b"mvhd":
                    mvhd_ts, mvhd_dur = _parse_mvhd(data, b2)
                elif f2 == b"trak":
                    tracks.append(_parse_trak(data, b2, e2))
    if not saw_moov:
        raise Mp4Error("no moov box (streaming-fragmented or truncated MP4)")
    vid = next((t for t in tracks if t["handler"] == "vide"), None)
    aud = next((t for t in tracks if t["handler"] == "soun"), None)
    duration_ms = int(mvhd_dur * 1000 / mvhd_ts) if mvhd_ts else 0
    fps = 0.0
    n_frames = 0
    if vid is not None:
        n_frames = vid["n_samples"]
        if vid["stts"] and vid["timescale"]:
            total = sum(c * d for c, d in vid["stts"])
            cnt = sum(c for c, _d in vid["stts"])
            if total:
                fps = cnt * vid["timescale"] / total
        elif vid["duration"] and vid["timescale"] and n_frames:
            fps = n_frames * vid["timescale"] / vid["duration"]
    return {
        "brand": brand,
        "width": int(vid["width"]) if vid else 0,
        "height": int(vid["height"]) if vid else 0,
        "n_frames": n_frames,
        "fps": fps,
        "duration_ms": duration_ms,
        "codec": (vid or aud or {"codec": None})["codec"],
        "has_audio": aud is not None,
        "audio_channels": aud["channels"] if aud else None,
        "audio_sample_rate": aud["sample_rate"] if aud else None,
        "tracks": tracks,
    }


# --------------------------------------------------------------- fixtures
def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _fullb(fourcc: bytes, ver: int, body: bytes) -> bytes:
    return _box(fourcc, bytes([ver, 0, 0, 0]) + body)


def encode_stub(
    width: int = 64,
    height: int = 48,
    n_frames: int = 30,
    fps: float = 15.0,
    codec: bytes = b"avc1",
    timescale: int = 600,
    version: int = 0,
    mdat_bytes: bytes = b"\x00" * 16,
) -> bytes:
    """Structurally valid minimal MP4 for fixtures: ftyp + moov (mvhd +
    one video trak with tkhd/mdhd/hdlr/minf/stbl) + mdat.  ``version``
    selects 32- vs 64-bit mvhd/mdhd fields so both probe paths are
    exercised."""
    sample_delta = int(round(timescale / fps))
    duration = n_frames * sample_delta
    if version == 1:
        mvhd = _fullb(b"mvhd", 1, struct.pack(">QQIQ", 0, 0, timescale, duration)
                      + b"\x00" * 80)
        mdhd = _fullb(b"mdhd", 1, struct.pack(">QQIQ", 0, 0, timescale, duration)
                      + b"\x00" * 4)
    else:
        mvhd = _fullb(b"mvhd", 0, struct.pack(">IIII", 0, 0, timescale, duration)
                      + b"\x00" * 80)
        mdhd = _fullb(b"mdhd", 0, struct.pack(">IIII", 0, 0, timescale, duration)
                      + b"\x00" * 4)
    tkhd = _fullb(
        b"tkhd", 0,
        struct.pack(">IIIII", 0, 0, 1, 0, duration) + b"\x00" * 52
        + struct.pack(">II", width << 16, height << 16),
    )
    hdlr = _fullb(b"hdlr", 0, b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"probe\x00")
    # VisualSampleEntry: 6 reserved + 2 dref index + 70 bytes of fields
    entry = _box(codec, b"\x00" * 6 + struct.pack(">H", 1) + b"\x00" * 16
                 + struct.pack(">HH", width, height) + b"\x00" * 50)
    stsd = _fullb(b"stsd", 0, struct.pack(">I", 1) + entry)
    stts = _fullb(b"stts", 0, struct.pack(">III", 1, n_frames, sample_delta))
    stsz = _fullb(b"stsz", 0, struct.pack(">III", 0, n_frames, 0)
                  + b"".join(struct.pack(">I", 1) for _ in range(n_frames)))
    stsc = _fullb(b"stsc", 0, struct.pack(">I", 0))
    stco = _fullb(b"stco", 0, struct.pack(">I", 0))
    stbl = _box(b"stbl", stsd + stts + stsz + stsc + stco)
    minf = _box(b"minf", _box(b"vmhd", b"\x00" * 12) + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    trak = _box(b"trak", tkhd + mdia)
    moov = _box(b"moov", mvhd + trak)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2avc1mp41")
    return ftyp + moov + _box(b"mdat", mdat_bytes)
