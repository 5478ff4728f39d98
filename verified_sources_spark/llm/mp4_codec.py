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

``probe`` accepts any top-level box run — ftyp-first web MP4s, legacy
QuickTime layouts where a ``skip``/``wide``/``free`` box (or nothing
at all) precedes ``moov``, and FRAGMENTED (CMAF/DASH) layouts: both
init+segments files (moov with mvex/trex defaults + moof runs) and
moov-less media segments (styp + sidx + moof/mdat), where sample
counts come from trun entries and durations resolve through trun
per-sample values → tfhd default → trex default → sidx subsegment
durations.  Only a payload with neither moov nor any fragment
structure refuses.

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

__all__ = ["Mp4Error", "probe", "encode_stub", "encode_fragmented_stub"]


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


def _parse_tkhd_id(data: bytes, b: int, e: int) -> int:
    ver, p = _fullbox(data, b, e, "tkhd")
    off = p + (16 if ver == 1 else 8)
    _need(data, off, 4, e, "tkhd track_ID")
    return struct.unpack_from(">I", data, off)[0]


def _parse_trak(data: bytes, b: int, e: int) -> dict:
    tk = {"handler": None, "codec": None, "timescale": 0, "duration": 0,
          "n_samples": 0, "width": 0.0, "height": 0.0,
          "channels": None, "sample_rate": None, "stts": [],
          "track_id": None}
    r = _child(data, b, e, b"tkhd")
    if r:
        tk["width"], tk["height"] = _parse_tkhd(data, r[0], r[1])
        tk["track_id"] = _parse_tkhd_id(data, r[0], r[1])
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


def _parse_sidx(data: bytes, b: int, e: int) -> dict:
    """Segment index: (timescale, total subsegment duration in units)."""
    ver, p = _fullbox(data, b, e, "sidx")
    _need(data, p, 8, e, "sidx reference_ID/timescale")
    _ref_id, timescale = struct.unpack_from(">II", data, p)
    p += 8
    if ver == 1:
        _need(data, p, 16, e, "sidx v1 time/offset")
        p += 16
    else:
        _need(data, p, 8, e, "sidx v0 time/offset")
        p += 8
    _need(data, p, 4, e, "sidx reference_count")
    (_res, n_refs) = struct.unpack_from(">HH", data, p)
    p += 4
    _need(data, p, 12 * n_refs, e, "sidx references")
    total = 0
    for i in range(n_refs):
        (_sz, dur, _sap) = struct.unpack_from(">III", data, p + 12 * i)
        total += dur
    if timescale == 0:
        raise Mp4Error("sidx timescale 0")
    return {"timescale": timescale, "duration_units": total,
            "n_refs": n_refs}


def _parse_moof(data: bytes, b: int, e: int, trex_defaults: dict) -> list[dict]:
    """Per-traf fragment facts: track id, sample count, summed sample
    duration in track-timescale units (trun per-sample durations win,
    then tfhd default, then the moov/mvex/trex default)."""
    out = []
    for fcc, tb, te in _boxes(data, b, e):
        if fcc != b"traf":
            continue
        track_id = None
        default_dur = None
        n_samples = 0
        dur_units = 0
        for f2, b2, e2 in _boxes(data, tb, te):
            if f2 == b"tfhd":
                _ver, p = _fullbox(data, b2, e2, "tfhd")
                flags = int.from_bytes(data[b2 + 1 : b2 + 4], "big")
                _need(data, p, 4, e2, "tfhd track_ID")
                (track_id,) = struct.unpack_from(">I", data, p)
                p += 4
                if flags & 0x000001:  # base-data-offset
                    _need(data, p, 8, e2, "tfhd base_data_offset")
                    p += 8
                if flags & 0x000002:  # sample-description-index
                    _need(data, p, 4, e2, "tfhd sample_description_index")
                    p += 4
                if flags & 0x000008:  # default-sample-duration
                    _need(data, p, 4, e2, "tfhd default_sample_duration")
                    (default_dur,) = struct.unpack_from(">I", data, p)
                    p += 4
            elif f2 == b"trun":
                _ver, p = _fullbox(data, b2, e2, "trun")
                flags = int.from_bytes(data[b2 + 1 : b2 + 4], "big")
                _need(data, p, 4, e2, "trun sample_count")
                (count,) = struct.unpack_from(">I", data, p)
                p += 4
                if flags & 0x000001:  # data-offset
                    _need(data, p, 4, e2, "trun data_offset")
                    p += 4
                if flags & 0x000004:  # first-sample-flags
                    _need(data, p, 4, e2, "trun first_sample_flags")
                    p += 4
                per = ((4 if flags & 0x000100 else 0)
                       + (4 if flags & 0x000200 else 0)
                       + (4 if flags & 0x000400 else 0)
                       + (4 if flags & 0x000800 else 0))
                _need(data, p, per * count, e2, "trun sample table")
                n_samples += count
                if flags & 0x000100:  # per-sample durations
                    for i in range(count):
                        (d,) = struct.unpack_from(">I", data, p + per * i)
                        dur_units += d
                else:
                    d = default_dur
                    if d is None:
                        d = trex_defaults.get(track_id, 0)
                    dur_units += d * count
        if track_id is not None:
            out.append({"track_id": track_id, "n_samples": n_samples,
                        "dur_units": dur_units})
    return out


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
    sidx = None
    trex_defaults: dict[int, int] = {}
    moof_spans: list[tuple[int, int]] = []
    try:
        for fcc, b, e in _boxes(data, 0, len(data)):
            if fcc in (b"ftyp", b"styp") and brand is None:
                _need(data, b, 4, e, "ftyp major_brand")
                brand = data[b : b + 4].decode("ascii", errors="replace")
            elif fcc == b"moov":
                saw_moov = True
                for f2, b2, e2 in _boxes(data, b, e):
                    if f2 == b"mvhd":
                        mvhd_ts, mvhd_dur = _parse_mvhd(data, b2, e2)
                    elif f2 == b"trak":
                        tracks.append(_parse_trak(data, b2, e2))
                    elif f2 == b"mvex":
                        for f3, b3, e3 in _boxes(data, b2, e2):
                            if f3 == b"trex":
                                _ver, p = _fullbox(data, b3, e3, "trex")
                                _need(data, p, 12, e3, "trex defaults")
                                tid, _sdi, ddur = struct.unpack_from(
                                    ">III", data, p)
                                trex_defaults[tid] = ddur
            elif fcc == b"sidx" and sidx is None:
                sidx = _parse_sidx(data, b, e)
            elif fcc == b"moof":
                moof_spans.append((b, e))
    except struct.error as exc:  # residual short-buffer unpack anywhere
        raise Mp4Error(f"truncated ISO-BMFF payload: {exc}") from exc
    # moof parse needs the trex defaults collected above (moov-first
    # layout), so fragments resolve in a second pass over their spans
    frag: dict[int, dict] = {}
    for b, e in moof_spans:
        for t in _parse_moof(data, b, e, trex_defaults):
            agg = frag.setdefault(
                t["track_id"], {"n_samples": 0, "dur_units": 0})
            agg["n_samples"] += t["n_samples"]
            agg["dur_units"] += t["dur_units"]
    fragmented = bool(moof_spans) or sidx is not None
    if not saw_moov and not fragmented:
        raise Mp4Error("no moov box (truncated or not a playable MP4)")
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
        vfrag = frag.get(vid["track_id"])
        if vfrag:
            n_frames += vfrag["n_samples"]
            if duration_ms == 0 and vid["timescale"]:
                duration_ms = (
                    vfrag["dur_units"] * 1000 // vid["timescale"])
            if fps == 0.0 and vfrag["dur_units"] and vid["timescale"]:
                fps = (vfrag["n_samples"] * vid["timescale"]
                       / vfrag["dur_units"])
    elif frag:
        # moov-less media segment (styp+sidx+moof+mdat): manifest facts
        # come from the fragment run itself
        n_frames = sum(a["n_samples"] for a in frag.values())
    if duration_ms == 0 and sidx is not None:
        duration_ms = sidx["duration_units"] * 1000 // sidx["timescale"]
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
        "fragmented": fragmented,
        "n_fragments": len(moof_spans),
        "tracks": tracks,
    }


# --------------------------------------------------------------- fixtures
def _box(fourcc: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + fourcc + body


def _fullb(fourcc: bytes, ver: int, body: bytes) -> bytes:
    return _box(fourcc, bytes([ver, 0, 0, 0]) + body)


def _fullbf(fourcc: bytes, ver: int, flags: int, body: bytes) -> bytes:
    return _box(fourcc, bytes([ver]) + flags.to_bytes(3, "big") + body)


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


def encode_fragmented_stub(
    n_fragments: int = 3,
    samples_per_fragment: int = 10,
    sample_duration: int = 100,
    timescale: int = 1000,
    with_sidx: bool = True,
    per_sample_durations: bool = False,
    init_moov: bool = False,
    width: int = 64,
    height: int = 48,
    codec: bytes = b"avc1",
) -> bytes:
    """Structurally valid fragmented (CMAF/DASH-shaped) fixtures.

    Two layouts:

    - ``init_moov=False``: a media segment — styp [+ sidx] + N moof/mdat
      pairs.  Durations come from tfhd default-sample-duration (or
      per-sample trun entries when ``per_sample_durations``).
    - ``init_moov=True``: init+segments combined — ftyp + moov carrying
      an EMPTY sample table plus mvex/trex defaults + N moof/mdat pairs
      whose tfhd omits the default, so durations resolve through trex.
    """
    frag_dur = samples_per_fragment * sample_duration
    out = bytearray()
    if init_moov:
        mvhd = _fullb(b"mvhd", 0,
                      struct.pack(">IIII", 0, 0, timescale, 0) + b"\x00" * 80)
        mdhd = _fullb(b"mdhd", 0,
                      struct.pack(">IIII", 0, 0, timescale, 0) + b"\x00" * 4)
        tkhd = _fullb(
            b"tkhd", 0,
            struct.pack(">IIIII", 0, 0, 1, 0, 0) + b"\x00" * 52
            + struct.pack(">II", width << 16, height << 16),
        )
        hdlr = _fullb(b"hdlr", 0,
                      b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"probe\x00")
        entry = _box(codec, b"\x00" * 6 + struct.pack(">H", 1)
                     + b"\x00" * 16 + struct.pack(">HH", width, height)
                     + b"\x00" * 50)
        stsd = _fullb(b"stsd", 0, struct.pack(">I", 1) + entry)
        stts = _fullb(b"stts", 0, struct.pack(">I", 0))
        stsz = _fullb(b"stsz", 0, struct.pack(">II", 0, 0))
        stsc = _fullb(b"stsc", 0, struct.pack(">I", 0))
        stco = _fullb(b"stco", 0, struct.pack(">I", 0))
        stbl = _box(b"stbl", stsd + stts + stsz + stsc + stco)
        minf = _box(b"minf", _box(b"vmhd", b"\x00" * 12) + stbl)
        trak = _box(b"trak", tkhd + _box(b"mdia", mdhd + hdlr + minf))
        trex = _fullbf(b"trex", 0, 0,
                       struct.pack(">IIIII", 1, 1, sample_duration, 0, 0))
        mvex = _box(b"mvex", trex)
        out += _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"iso6cmfc")
        out += _box(b"moov", mvhd + trak + mvex)
    else:
        out += _box(b"styp", b"msdh" + struct.pack(">I", 0) + b"msdhmsix")
    if with_sidx:
        body = struct.pack(">II", 1, timescale)
        body += struct.pack(">II", 0, 0)  # v0: earliest_pt, first_offset
        body += struct.pack(">HH", 0, n_fragments)
        for _ in range(n_fragments):
            body += struct.pack(">III", 64, frag_dur, 0)
        out += _fullb(b"sidx", 0, body)
    for i in range(n_fragments):
        mfhd = _fullb(b"mfhd", 0, struct.pack(">I", i + 1))
        if init_moov:
            # no tfhd default: durations resolve through mvex/trex
            tfhd = _fullbf(b"tfhd", 0, 0x020000, struct.pack(">I", 1))
        else:
            tfhd = _fullbf(b"tfhd", 0, 0x020008,
                           struct.pack(">II", 1, sample_duration))
        if per_sample_durations:
            tr = struct.pack(">I", samples_per_fragment)
            tr += b"".join(struct.pack(">I", sample_duration)
                           for _ in range(samples_per_fragment))
            trun = _fullbf(b"trun", 0, 0x000100, tr)
            tfhd = _fullbf(b"tfhd", 0, 0x020000, struct.pack(">I", 1))
        else:
            trun = _fullbf(b"trun", 0, 0,
                           struct.pack(">I", samples_per_fragment))
        out += _box(b"moof", mfhd + _box(b"traf", tfhd + trun))
        out += _box(b"mdat", b"\x00" * 8)
    return bytes(out)
