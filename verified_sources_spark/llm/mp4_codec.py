"""Pure-stdlib ISO-BMFF (MP4/MOV/M4A) box parser — header-only probe.

Real web video corpora are overwhelmingly MP4/H.264; full pixel decode
of those codecs is out of pure-stdlib reach (entropy coding + motion
compensation), but the CONTAINER is a simple length-prefixed box tree
readable with ``struct`` alone.  ``probe`` walks
ftyp / moov / mvhd / trak / tkhd / mdia / mdhd / hdlr / minf / stbl /
(stsd, stsz, stts) and returns the manifest facts a 100 TB curation
pipeline needs BEFORE it ever decodes a pixel: dims, fps, duration,
sample count, codec fourcc, per-track layout.  Every inner read is
bounds-checked against its enclosing box, so a truncated or malformed
payload raises ``Mp4Error`` (never a bare ``struct.error``, never a
silent read into the adjacent box).  Pixel decode refuses loudly
**with the codec named** (``avc1``/``hev1``/…) through llm/video_io's
``decoder=`` seam — the honest-refusal contract shared by the
table-format readers and every other codec here: "not decodable in
this environment" must never be confused with "broken payload".

``probe`` accepts any top-level box run — ftyp-first web MP4s, and
legacy QuickTime layouts where a ``skip``/``wide``/``free`` box (or
nothing at all) precedes ``moov`` — as long as a ``moov`` is present.

``encode_stub`` builds a structurally valid minimal MP4 (ftyp + moov
with one video trak + mdat) for fixtures; tests/test_mp4_codec.py
probes files this encoder did NOT produce byte-for-byte (reordered
boxes, version-1 64-bit fields, largesize, audio tracks, size-0
boxes) plus the truncation/garbage error paths.

Reference analogue: mux video assets are served as playback manifests,
not pixels (/root/reference/sources/mux/__init__.py:15-28) — the same
"metadata first, bytes opaque" posture this probe implements.
"""

from __future__ import annotations

import struct

__all__ = ["Mp4Error", "probe", "encode_stub"]


class Mp4Error(ValueError):
    pass


def _need(data: bytes, pos: int, n: int, end: int, what: str) -> None:
    """Bounds gate: the next ``n`` bytes at ``pos`` must lie inside the
    enclosing box (``end``) AND the buffer — else the payload is
    truncated/malformed and the honest answer is Mp4Error, not a bare
    struct.error or a silent read of the neighbouring box's bytes."""
    if pos + n > end or pos + n > len(data):
        raise Mp4Error(f"truncated {what}: need {n} bytes at {pos}")


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


def _fullbox(data: bytes, pos: int, end: int, what: str) -> tuple[int, int]:
    """(version, body_start_after_version_flags)."""
    _need(data, pos, 4, end, f"{what} fullbox header")
    return data[pos], pos + 4


def _parse_mvhd(data: bytes, b: int, e: int, what: str = "mvhd") -> tuple[int, int]:
    """(timescale, duration) — version 0 (32-bit) or 1 (64-bit)."""
    ver, p = _fullbox(data, b, e, what)
    if ver == 1:
        _need(data, p + 16, 12, e, f"{what} v1 fields")
        ts, dur = struct.unpack_from(">IQ", data, p + 16)
    else:
        _need(data, p + 8, 8, e, f"{what} v0 fields")
        ts, dur = struct.unpack_from(">II", data, p + 8)
    return ts, dur


def _parse_mdhd(data: bytes, b: int, e: int) -> tuple[int, int]:
    return _parse_mvhd(data, b, e, "mdhd")  # same creation/modification prefix


def _parse_tkhd(data: bytes, b: int, e: int) -> tuple[float, float]:
    """(width, height) as 16.16 fixed-point — last 8 bytes of tkhd."""
    if e - 8 < b + 4:  # must lie past the version/flags, inside the box
        raise Mp4Error("truncated tkhd: no width/height fields")
    _need(data, e - 8, 8, e, "tkhd width/height")
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
        tk["timescale"], tk["duration"] = _parse_mdhd(data, r[0], r[1])
    r = _child(data, mb, me, b"hdlr")
    if r:
        _ver, p = _fullbox(data, r[0], r[1], "hdlr")
        _need(data, p + 4, 4, r[1], "hdlr handler_type")
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
        _ver, p = _fullbox(data, r[0], r[1], "stsd")
        _need(data, p, 4, r[1], "stsd entry_count")
        (n_entries,) = struct.unpack_from(">I", data, p)
        if n_entries >= 1:
            # first sample entry: 4-byte size + 4-byte format fourcc
            _need(data, p + 8, 4, r[1], "stsd sample-entry fourcc")
            tk["codec"] = data[p + 8 : p + 12].decode("ascii", errors="replace")
            if tk["handler"] == "soun":
                # AudioSampleEntry body (after 8-byte size+fourcc at p+4):
                # 6 reserved + 2 dref + 2 version + 2 revision + 4 vendor
                # = 16 bytes, then channelcount(2) ... samplerate(16.16)
                ent = p + 12
                _need(data, ent + 24, 4, r[1], "stsd AudioSampleEntry")
                tk["channels"] = struct.unpack_from(">H", data, ent + 16)[0]
                tk["sample_rate"] = struct.unpack_from(">I", data, ent + 24)[0] >> 16
    r = _child(data, sb, se, b"stsz")
    if r:
        _ver, p = _fullbox(data, r[0], r[1], "stsz")
        _need(data, p, 8, r[1], "stsz header")
        _uniform, count = struct.unpack_from(">II", data, p)
        tk["n_samples"] = count
    r = _child(data, sb, se, b"stts")
    if r:
        _ver, p = _fullbox(data, r[0], r[1], "stts")
        _need(data, p, 4, r[1], "stts entry_count")
        (n_entries,) = struct.unpack_from(">I", data, p)
        _need(data, p + 4, 8 * n_entries, r[1], "stts entries")
        tk["stts"] = [
            struct.unpack_from(">II", data, p + 4 + 8 * i) for i in range(n_entries)
        ]
    return tk


# top-level box types that legitimately start an ISO-BMFF / QuickTime
# file — used to tell "legacy MOV without ftyp" apart from garbage
_TOP_LEVEL = frozenset(
    [b"ftyp", b"styp", b"moov", b"mdat", b"free", b"skip", b"wide",
     b"pdin", b"moof", b"sidx", b"meta", b"uuid", b"pnot"]
)


def probe(data: bytes) -> dict:
    """Header-only manifest for an ISO-BMFF payload: brand, dims, fps,
    n_frames, duration_ms, codec fourcc, plus the full per-track list.
    No sample materialization — mdat is never touched.

    Accepts any top-level box run whose first box is a known ISO-BMFF
    type: web MP4s lead with ftyp, but legacy QuickTime .mov files may
    lead with skip/wide/mdat/moov and carry no ftyp at all — those
    probe fine with ``brand=None``."""
    if len(data) < 12 or data[4:8] not in _TOP_LEVEL:
        raise Mp4Error("not an ISO-BMFF payload (no recognized top-level box)")
    brand = None
    mvhd_ts = mvhd_dur = 0
    tracks: list[dict] = []
    saw_moov = False
    try:
        for fcc, b, e in _boxes(data, 0, len(data)):
            if fcc == b"ftyp" and brand is None:
                _need(data, b, 4, e, "ftyp major_brand")
                brand = data[b : b + 4].decode("ascii", errors="replace")
            elif fcc == b"moov":
                saw_moov = True
                for f2, b2, e2 in _boxes(data, b, e):
                    if f2 == b"mvhd":
                        mvhd_ts, mvhd_dur = _parse_mvhd(data, b2, e2)
                    elif f2 == b"trak":
                        tracks.append(_parse_trak(data, b2, e2))
    except struct.error as exc:  # residual short-buffer unpack anywhere
        raise Mp4Error(f"truncated ISO-BMFF payload: {exc}") from exc
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
    # stsz fullbox body: sample_size(=0 → per-sample table) + sample_count,
    # then exactly sample_count entry sizes (no extra fields — spec layout)
    stsz = _fullb(b"stsz", 0, struct.pack(">II", 0, n_frames)
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
