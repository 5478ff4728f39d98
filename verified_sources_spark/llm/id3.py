"""ID3 tag inventory + scrub for MP3 payloads — the audio member of
the metadata-compliance trio (JPEG EXIF, PNG text chunks, MP3 ID3).

ID3v2 prefixes carry text frames (TIT2 title, TPE1 artist, TALB album,
COMM comments, TXXX user fields — often uploader handles and URLs);
ID3v1 is a fixed 128-byte trailer.  Both are frame/field surgery:

- ``probe_id3``: version, declared frames, decoded text values for the
  common frames (latin-1, UTF-16 w/ BOM, UTF-16BE and UTF-8 encodings
  per the spec's encoding byte).
- ``strip_id3``: the MP3 minus the ID3v2 prefix and any ID3v1 trailer;
  the MPEG frame stream passes through byte-identical (verified by the
  frame-walk probe in tests).

``build_id3v2`` writes real v2.3/v2.4 tags (syncsafe sizes, encoding
bytes) for fixtures.
"""

from __future__ import annotations

__all__ = ["Id3Error", "probe_id3", "strip_id3", "build_id3v2"]

_TEXT_FRAMES = {"TIT2": "title", "TPE1": "artist", "TALB": "album",
                "TYER": "year", "TDRC": "year"}


class Id3Error(ValueError):
    pass


def _syncsafe(b: bytes) -> int:
    v = 0
    for x in b:
        if x & 0x80:
            raise Id3Error("malformed syncsafe integer")
        v = (v << 7) | x
    return v


def _decode_text(body: bytes) -> str:
    if not body:
        return ""
    enc, payload = body[0], body[1:]
    if enc == 0:
        return payload.split(b"\x00")[0].decode("latin-1")
    if enc == 1:
        return payload.decode("utf-16", errors="replace").split("\x00")[0]
    if enc == 2:
        return payload.decode("utf-16-be", errors="replace").split("\x00")[0]
    if enc == 3:
        return payload.split(b"\x00")[0].decode("utf-8", errors="replace")
    raise Id3Error(f"unknown ID3 text encoding {enc}")


def probe_id3(data: bytes) -> dict:
    """{has_id3v2, version, frames: [ids], title, artist, album, year,
    has_id3v1} — audio frames are never touched."""
    out = {"has_id3v2": False, "version": None, "frames": [],
           "title": None, "artist": None, "album": None, "year": None,
           "has_id3v1": len(data) >= 128 and data[-128:-125] == b"TAG"}
    if data[:3] != b"ID3":
        return out
    if len(data) < 10:
        raise Id3Error("truncated ID3v2 header")
    major, _rev, flags = data[3], data[4], data[5]
    size = _syncsafe(data[6:10])
    if 10 + size > len(data):
        raise Id3Error(f"truncated ID3v2 tag: {len(data) - 10} < {size}")
    out["has_id3v2"] = True
    out["version"] = f"2.{major}"
    pos = 10
    if flags & 0x40:  # extended header: skip by its declared size
        ext = (_syncsafe(data[10:14]) if major == 4
               else int.from_bytes(data[10:14], "big"))
        pos += ext
    end = 10 + size
    while pos + 10 <= end:
        fid = data[pos : pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # padding
        raw_sz = data[pos + 4 : pos + 8]
        fsize = _syncsafe(raw_sz) if major == 4 else int.from_bytes(
            raw_sz, "big")
        body = data[pos + 10 : pos + 10 + fsize]
        if pos + 10 + fsize > end:
            raise Id3Error(f"frame {fid!r} overruns the tag")
        fid_s = fid.decode("latin-1")
        out["frames"].append(fid_s)
        if fid_s in _TEXT_FRAMES:
            out[_TEXT_FRAMES[fid_s]] = _decode_text(body)
        pos += 10 + fsize
    return out


def strip_id3(data: bytes) -> bytes:
    """The payload minus any ID3v2 prefix and ID3v1 trailer; the MPEG
    frame stream in between is byte-identical."""
    start = 0
    if data[:3] == b"ID3":
        if len(data) < 10:
            raise Id3Error("truncated ID3v2 header")
        start = 10 + _syncsafe(data[6:10])
        if start > len(data):
            raise Id3Error("ID3v2 size overruns the payload")
    end = len(data)
    if end - start >= 128 and data[-128:-125] == b"TAG":
        end -= 128
    return data[start:end]


def _ss(v: int) -> bytes:
    return bytes([(v >> 21) & 0x7F, (v >> 14) & 0x7F,
                  (v >> 7) & 0x7F, v & 0x7F])


def build_id3v2(fields: dict[str, str], major: int = 4,
                padding: int = 16, encoding: int = 3) -> bytes:
    """A real ID3v2.3/2.4 tag from {frame_id: text}: proper syncsafe
    (v4) or plain (v3) frame sizes and the chosen text encoding."""
    body = bytearray()
    for fid, text in fields.items():
        if encoding == 0:
            payload = bytes([0]) + text.encode("latin-1")
        elif encoding == 1:
            payload = bytes([1]) + text.encode("utf-16")
        else:
            payload = bytes([3]) + text.encode("utf-8")
        sz = _ss(len(payload)) if major == 4 else len(payload).to_bytes(
            4, "big")
        body += fid.encode("latin-1") + sz + b"\x00\x00" + payload
    body += b"\x00" * padding
    return (b"ID3" + bytes([major, 0, 0]) + _ss(len(body)) + bytes(body))
