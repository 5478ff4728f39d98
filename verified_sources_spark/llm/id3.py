"""ID3 tag inventory + scrub for MP3 payloads — the audio member of
the metadata-compliance trio (JPEG EXIF, PNG text chunks, MP3 ID3).

ID3v2 prefixes carry text frames (TIT2 title, TPE1 artist, TALB album,
COMM comments, TXXX user fields — often uploader handles and URLs) and
APIC embedded cover art; ID3v1 is a fixed 128-byte trailer.  All three
major versions in the wild are parsed: v2.2 (6-byte frame headers,
3-char IDs: TT2/TP1/TAL/TYE, PIC), v2.3 (plain 32-bit frame sizes,
extended header whose size field EXCLUDES its own 4 bytes) and v2.4
(syncsafe frame sizes, extended header size INCLUDES itself).

- ``probe_id3``: version, declared frames, decoded text values for the
  common frames (latin-1, UTF-16 w/ BOM, UTF-16BE and UTF-8 encodings
  per the spec's encoding byte), picture count.
- ``extract_pictures``: APIC (v2.3/2.4) / PIC (v2.2) payloads as
  (mime, pic_type, description, image-bytes) — cover art is itself an
  image asset that feeds the image-dedup path (an MP3's embedded cover
  dedups against its standalone twin; cross-modal, like
  video_image_matches).
- ``strip_id3``: the MP3 minus the ID3v2 prefix and any ID3v1 trailer;
  the MPEG frame stream passes through byte-identical (verified by the
  frame-walk probe in tests).

``build_id3v2`` writes real v2.2/v2.3/v2.4 tags (syncsafe sizes,
encoding bytes, optional extended header and embedded pictures) for
fixtures.
"""

from __future__ import annotations

__all__ = ["Id3Error", "probe_id3", "extract_pictures", "strip_id3",
           "build_id3v2"]

_TEXT_FRAMES = {"TIT2": "title", "TPE1": "artist", "TALB": "album",
                "TYER": "year", "TDRC": "year",
                # ID3v2.2 three-char equivalents
                "TT2": "title", "TP1": "artist", "TAL": "album",
                "TYE": "year"}
_PIC_FRAMES = {"APIC", "PIC"}
# v2.2 PIC stores a 3-char format instead of a MIME string
_PIC_FORMATS = {"JPG": "image/jpeg", "PNG": "image/png",
                "GIF": "image/gif", "BMP": "image/bmp"}


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


def _iter_frames(data: bytes):
    """Yield (frame_id: str, body: bytes) for an ID3v2 tag prefix,
    handling the per-version frame-header and extended-header layouts.
    The caller guarantees ``data[:3] == b'ID3'``."""
    if len(data) < 10:
        raise Id3Error("truncated ID3v2 header")
    major, flags = data[3], data[5]
    size = _syncsafe(data[6:10])
    if 10 + size > len(data):
        raise Id3Error(f"truncated ID3v2 tag: {len(data) - 10} < {size}")
    pos, end = 10, 10 + size
    if major == 2:
        if flags & 0x40:  # v2.2 bit 6 = compression: spec says skip tag
            raise Id3Error("ID3v2.2 compressed tag")
        while pos + 6 <= end:
            fid = data[pos : pos + 3]
            if fid == b"\x00\x00\x00":
                break  # padding
            fsize = int.from_bytes(data[pos + 3 : pos + 6], "big")
            if pos + 6 + fsize > end:
                raise Id3Error(f"frame {fid!r} overruns the tag")
            yield fid.decode("latin-1"), data[pos + 6 : pos + 6 + fsize]
            pos += 6 + fsize
        return
    if flags & 0x40:  # extended header
        ext = (_syncsafe(data[10:14]) if major == 4
               else int.from_bytes(data[10:14], "big"))
        # v2.4: syncsafe size INCLUDES the 4-byte size field; v2.3:
        # plain size EXCLUDES it (10.1 vs 3.2 of the specs) — treating
        # them alike lands 4 bytes short and the walk reads the ext
        # header's tail as padding, silently dropping every frame.
        pos += ext if major == 4 else 4 + ext
    while pos + 10 <= end:
        fid = data[pos : pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # padding
        raw_sz = data[pos + 4 : pos + 8]
        fsize = _syncsafe(raw_sz) if major == 4 else int.from_bytes(
            raw_sz, "big")
        if pos + 10 + fsize > end:
            raise Id3Error(f"frame {fid!r} overruns the tag")
        yield fid.decode("latin-1"), data[pos + 10 : pos + 10 + fsize]
        pos += 10 + fsize


def probe_id3(data: bytes) -> dict:
    """{has_id3v2, version, frames: [ids], title, artist, album, year,
    n_pictures, has_id3v1} — audio frames are never touched."""
    out = {"has_id3v2": False, "version": None, "frames": [],
           "title": None, "artist": None, "album": None, "year": None,
           "n_pictures": 0,
           "has_id3v1": len(data) >= 128 and data[-128:-125] == b"TAG"}
    if data[:3] != b"ID3":
        return out
    out["has_id3v2"] = True
    out["version"] = f"2.{data[3]}"
    for fid, body in _iter_frames(data):
        out["frames"].append(fid)
        if fid in _TEXT_FRAMES:
            out[_TEXT_FRAMES[fid]] = _decode_text(body)
        elif fid in _PIC_FRAMES:
            out["n_pictures"] += 1
    return out


def _split_described(payload: bytes, enc: int) -> tuple[str, bytes]:
    """(description, rest) across the encoding-dependent terminator:
    one NUL for latin-1/UTF-8, an even-aligned double NUL for UTF-16."""
    if enc in (0, 3):
        i = payload.find(b"\x00")
        if i < 0:
            raise Id3Error("unterminated picture description")
        codec = "latin-1" if enc == 0 else "utf-8"
        return payload[:i].decode(codec, errors="replace"), payload[i + 1:]
    i = 0
    while True:
        i = payload.find(b"\x00\x00", i)
        if i < 0:
            raise Id3Error("unterminated picture description")
        if i % 2 == 0:
            break
        i += 1
    codec = "utf-16" if enc == 1 else "utf-16-be"
    return (payload[:i].decode(codec, errors="replace"), payload[i + 2:])


def extract_pictures(data: bytes) -> list[dict]:
    """Embedded cover art as [{mime, pic_type, description, image}]:
    APIC (v2.3/2.4: encoding byte, NUL-terminated MIME, picture type,
    encoded description, image bytes) and PIC (v2.2: 3-char format in
    place of the MIME string).  The image bytes are the verbatim
    JPEG/PNG payload — dedup-joinable against standalone image assets."""
    if data[:3] != b"ID3":
        return []
    out = []
    for fid, body in _iter_frames(data):
        if fid not in _PIC_FRAMES or not body:
            continue
        enc = body[0]
        if fid == "PIC":
            if len(body) < 5:
                raise Id3Error("truncated PIC frame")
            fmt = body[1:4].decode("latin-1")
            mime = _PIC_FORMATS.get(fmt.upper(), f"image/{fmt.lower()}")
            pic_type = body[4]
            desc, image = _split_described(body[5:], enc)
        else:
            i = body.find(b"\x00", 1)
            if i < 0 or i + 1 >= len(body):
                raise Id3Error("truncated APIC frame")
            mime = body[1:i].decode("latin-1")
            pic_type = body[i + 1]
            desc, image = _split_described(body[i + 2 :], enc)
        out.append({"mime": mime, "pic_type": pic_type,
                    "description": desc, "image": image})
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
                padding: int = 16, encoding: int = 3,
                pictures: list[tuple[str, int, str, bytes]] | None = None,
                extended_header: bool = False) -> bytes:
    """A real ID3v2.2/2.3/2.4 tag from {frame_id: text}: proper
    syncsafe (v4), plain-32-bit (v3) or 3-byte (v2) frame sizes and the
    chosen text encoding.  ``pictures`` embeds APIC/PIC frames from
    (mime, pic_type, description, image_bytes); ``extended_header``
    writes the version-correct extended header (v2.3's size excludes
    its own size field, v2.4's includes it) for parser fixtures."""
    if major == 2 and encoding > 1:
        raise Id3Error("ID3v2.2 defines only latin-1/UTF-16 encodings")

    def frame(fid: str, payload: bytes) -> bytes:
        if major == 2:
            return fid.encode("latin-1") + len(payload).to_bytes(3, "big") \
                + payload
        sz = _ss(len(payload)) if major == 4 else len(payload).to_bytes(
            4, "big")
        return fid.encode("latin-1") + sz + b"\x00\x00" + payload

    body = bytearray()
    for fid, text in fields.items():
        if encoding == 0:
            payload = bytes([0]) + text.encode("latin-1")
        elif encoding == 1:
            payload = bytes([1]) + text.encode("utf-16")
        else:
            payload = bytes([3]) + text.encode("utf-8")
        body += frame(fid, payload)
    for mime, pic_type, desc, image in pictures or []:
        if major == 2:
            fmt = {v: k for k, v in _PIC_FORMATS.items()}.get(mime, "JPG")
            payload = (bytes([0]) + fmt.encode("latin-1")
                       + bytes([pic_type]) + desc.encode("latin-1")
                       + b"\x00" + image)
            body += frame("PIC", payload)
        else:
            payload = (bytes([0]) + mime.encode("latin-1") + b"\x00"
                       + bytes([pic_type]) + desc.encode("latin-1")
                       + b"\x00" + image)
            body += frame("APIC", payload)
    body += b"\x00" * padding
    flags = 0
    ext = b""
    if extended_header:
        if major == 2:
            raise Id3Error("ID3v2.2 has no extended header")
        flags |= 0x40
        if major == 4:
            ext = _ss(6) + b"\x01\x00"  # whole-header size, 1 flag byte
        else:
            ext = (6).to_bytes(4, "big") + b"\x00\x00\x00\x00\x00\x00"
    body = ext + bytes(body)
    return (b"ID3" + bytes([major, 0, flags]) + _ss(len(body)) + body)
