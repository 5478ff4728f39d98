"""Pure-stdlib WebM / Matroska (EBML) header probe.

WebM is the other half of web video (MP4 being the first — together
they cover essentially every scraped clip).  The container is an EBML
tree: length-prefixed elements with variable-length IDs and sizes —
entirely stdlib-walkable.  ``probe`` parses the EBML header (DocType),
then Segment → Info (TimecodeScale, Duration) and Segment → Tracks
(codec IDs, pixel dims, DefaultDuration → fps, audio rate/channels),
bounds-checking every read: truncation and malformed varints raise
``WebmError``, never a bare struct.error.  Unknown-size elements (live
/ streamed Segments write all-ones sizes) are handled for Segment
itself.  Clusters (the pixel payload) are never touched — VP8/VP9/AV1
pixel decode refuses WITH THE CODEC NAMED through llm/video_io's
shared ``decoder=`` seam, so WebM degrades to exact-dedup-only with
full probed manifests, same as MP4.

``encode_stub`` emits structurally valid minimal WebM (EBML header +
Segment with Info and one video ± one audio track + a stub Cluster)
for fixtures; tests probe layouts the stub does not emit plus the
error paths.

Reference analogue: mux assets are served as playback manifests, not
pixels (/root/reference/sources/mux/__init__.py:15-28).
"""

from __future__ import annotations

import struct

__all__ = ["WebmError", "probe", "encode_stub"]


class WebmError(ValueError):
    pass


# EBML element IDs (with their marker bits, as they appear on the wire)
_EBML = 0x1A45DFA3
_DOCTYPE = 0x4282
_SEGMENT = 0x18538067
_INFO = 0x1549A966
_TIMECODE_SCALE = 0x2AD7B1
_DURATION = 0x4489
_TRACKS = 0x1654AE6B
_TRACK_ENTRY = 0xAE
_TRACK_TYPE = 0x83
_CODEC_ID = 0x86
_DEFAULT_DURATION = 0x23E383
_VIDEO = 0xE0
_PIXEL_W = 0xB0
_PIXEL_H = 0xBA
_AUDIO = 0xE1
_SAMPLE_FREQ = 0xB5
_CHANNELS = 0x9F
_CLUSTER = 0x1F43B675


def _read_id(data: bytes, pos: int, end: int) -> tuple[int, int]:
    if pos >= end:
        raise WebmError(f"truncated EBML ID at {pos}")
    b0 = data[pos]
    if b0 == 0:
        raise WebmError(f"invalid EBML ID byte 0x00 at {pos}")
    n = 8 - b0.bit_length() + 1  # leading zeros + 1
    if n > 4 or pos + n > end:
        raise WebmError(f"bad EBML ID length at {pos}")
    v = 0
    for i in range(n):
        v = (v << 8) | data[pos + i]
    return v, pos + n


def _read_size(data: bytes, pos: int, end: int) -> tuple[int | None, int]:
    """(size, next_pos); size None = 'unknown' (all value bits set)."""
    if pos >= end:
        raise WebmError(f"truncated EBML size at {pos}")
    b0 = data[pos]
    if b0 == 0:
        raise WebmError(f"invalid EBML size byte 0x00 at {pos}")
    n = 8 - b0.bit_length() + 1
    if n > 8 or pos + n > end:
        raise WebmError(f"bad EBML size length at {pos}")
    v = b0 & (0xFF >> n)
    for i in range(1, n):
        v = (v << 8) | data[pos + i]
    if v == (1 << (7 * n)) - 1:  # all ones: unknown size
        return None, pos + n
    return v, pos + n


def _children(data: bytes, pos: int, end: int):
    """Yield (element_id, body_start, body_end) over one element run."""
    while pos < end:
        eid, p = _read_id(data, pos, end)
        size, p = _read_size(data, p, end)
        if size is None:
            # unknown-size element: extends to the container's end
            yield eid, p, end
            return
        if p + size > end:
            raise WebmError(
                f"truncated element 0x{eid:X}: {end - p} bytes < {size}"
            )
        yield eid, p, p + size
        pos = p + size


def _uint(data: bytes, b: int, e: int) -> int:
    v = 0
    for i in range(b, e):
        v = (v << 8) | data[i]
    return v


def _float(data: bytes, b: int, e: int) -> float:
    n = e - b
    if n == 4:
        return struct.unpack(">f", data[b:e])[0]
    if n == 8:
        return struct.unpack(">d", data[b:e])[0]
    if n == 0:
        return 0.0
    raise WebmError(f"float element of width {n}")


def _parse_track(data: bytes, b: int, e: int) -> dict:
    tk = {"type": None, "codec": None, "width": 0, "height": 0,
          "default_duration_ns": 0, "sample_rate": None, "channels": None}
    for eid, cb, ce in _children(data, b, e):
        if eid == _TRACK_TYPE:
            tk["type"] = _uint(data, cb, ce)
        elif eid == _CODEC_ID:
            tk["codec"] = data[cb:ce].decode("ascii", errors="replace")
        elif eid == _DEFAULT_DURATION:
            tk["default_duration_ns"] = _uint(data, cb, ce)
        elif eid == _VIDEO:
            for vid, vb, ve in _children(data, cb, ce):
                if vid == _PIXEL_W:
                    tk["width"] = _uint(data, vb, ve)
                elif vid == _PIXEL_H:
                    tk["height"] = _uint(data, vb, ve)
        elif eid == _AUDIO:
            for aid, ab, ae in _children(data, cb, ce):
                if aid == _SAMPLE_FREQ:
                    tk["sample_rate"] = int(_float(data, ab, ae))
                elif aid == _CHANNELS:
                    tk["channels"] = _uint(data, ab, ae)
    return tk


def probe(data: bytes) -> dict:
    """Header-only manifest: doctype, dims, fps (from the video track's
    DefaultDuration when present), n_frames (duration/frame-duration),
    duration_ms, codec IDs, audio facts, per-track list.  Clusters are
    never read."""
    if len(data) < 4 or _uint(data, 0, 4) != _EBML:
        raise WebmError("not an EBML payload (no 0x1A45DFA3 magic)")
    doctype = None
    tc_scale = 1_000_000  # ns per timecode unit (Matroska default)
    duration_tc = 0.0
    tracks: list[dict] = []
    saw_segment = False
    for eid, b, e in _children(data, 0, len(data)):
        if eid == _EBML:
            for hid, hb, he in _children(data, b, e):
                if hid == _DOCTYPE:
                    doctype = data[hb:he].split(b"\x00")[0].decode(
                        "ascii", errors="replace"
                    )
        elif eid == _SEGMENT:
            saw_segment = True
            for sid, sb, se in _children(data, b, e):
                if sid == _INFO:
                    for iid, ib, ie in _children(data, sb, se):
                        if iid == _TIMECODE_SCALE:
                            tc_scale = _uint(data, ib, ie)
                        elif iid == _DURATION:
                            duration_tc = _float(data, ib, ie)
                elif sid == _TRACKS:
                    for tid, tb, te in _children(data, sb, se):
                        if tid == _TRACK_ENTRY:
                            tracks.append(_parse_track(data, tb, te))
                elif sid == _CLUSTER:
                    break  # payload region: headers are done
    if not saw_segment:
        raise WebmError("no Segment element")
    vid = next((t for t in tracks if t["type"] == 1), None)
    aud = next((t for t in tracks if t["type"] == 2), None)
    duration_ms = int(duration_tc * tc_scale / 1e6)
    fps = 0.0
    n_frames = 0
    if vid and vid["default_duration_ns"]:
        fps = 1e9 / vid["default_duration_ns"]
        if duration_ms:
            n_frames = round(duration_ms * 1e6 / vid["default_duration_ns"])
    return {
        "doctype": doctype,
        "width": vid["width"] if vid else 0,
        "height": vid["height"] if vid else 0,
        "n_frames": n_frames,
        "fps": fps,
        "duration_ms": duration_ms,
        "codec": (vid or aud or {"codec": None})["codec"],
        "has_audio": aud is not None,
        "audio_channels": aud["channels"] if aud else None,
        "audio_sample_rate": aud["sample_rate"] if aud else None,
        "timecode_scale": tc_scale,
        "tracks": tracks,
    }


# --------------------------------------------------------------- fixtures
def _vint_size(v: int) -> bytes:
    for n in range(1, 9):
        if v < (1 << (7 * n)) - 1:
            out = v | (1 << (7 * n))
            return out.to_bytes(n, "big")
    raise WebmError("size too large")


def _elem(eid: int, body: bytes) -> bytes:
    nid = (eid.bit_length() + 7) // 8
    return eid.to_bytes(nid, "big") + _vint_size(len(body)) + body


def _uint_body(v: int) -> bytes:
    n = max(1, (v.bit_length() + 7) // 8)
    return v.to_bytes(n, "big")


def encode_stub(
    width: int = 640,
    height: int = 360,
    n_frames: int = 30,
    fps: float = 15.0,
    codec: str = "V_VP9",
    audio: bool = False,
    doctype: str = "webm",
    cluster_bytes: bytes = b"\x00" * 16,
) -> bytes:
    """Structurally valid minimal WebM: EBML header + Segment (Info with
    TimecodeScale/Duration, Tracks with one video ± one audio entry) +
    a stub Cluster.  DefaultDuration carries the frame rate so the
    probe can derive fps / n_frames without clusters."""
    header = _elem(_EBML, _elem(_DOCTYPE, doctype.encode()))
    dd_ns = int(round(1e9 / fps))
    duration_tc = n_frames * dd_ns / 1e6  # at the default 1ms scale
    info = _elem(_INFO,
                 _elem(_TIMECODE_SCALE, _uint_body(1_000_000))
                 + _elem(_DURATION, struct.pack(">d", duration_tc)))
    vtrack = _elem(_TRACK_ENTRY,
                   _elem(_TRACK_TYPE, b"\x01")
                   + _elem(_CODEC_ID, codec.encode())
                   + _elem(_DEFAULT_DURATION, _uint_body(dd_ns))
                   + _elem(_VIDEO, _elem(_PIXEL_W, _uint_body(width))
                           + _elem(_PIXEL_H, _uint_body(height))))
    tracks = vtrack
    if audio:
        tracks += _elem(_TRACK_ENTRY,
                        _elem(_TRACK_TYPE, b"\x02")
                        + _elem(_CODEC_ID, b"A_OPUS")
                        + _elem(_AUDIO,
                                _elem(_SAMPLE_FREQ, struct.pack(">f", 48000.0))
                                + _elem(_CHANNELS, b"\x02")))
    segment = _elem(_SEGMENT, info + _elem(_TRACKS, tracks)
                    + _elem(_CLUSTER, cluster_bytes))
    return header + segment
