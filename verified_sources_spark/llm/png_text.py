"""PNG textual-metadata inventory + scrub.

PNG carries arbitrary text in tEXt / zTXt (deflated) / iTXt
(international, optionally deflated) chunks — author names, capture
software, and increasingly AI-generation parameters ("prompt",
"parameters" from image generators): provenance/PII a released corpus
must inventory and usually remove.  Chunks are length+type+CRC framed,
so both passes are pure chunk surgery:

- ``probe_text``: every text chunk as (keyword, text, kind), plus
  eXIf/tIME presence.
- ``strip_text``: re-emit the PNG with tEXt/zTXt/iTXt/eXIf/tIME
  dropped; every remaining chunk is copied verbatim (CRCs untouched),
  so the image decodes byte-identically.

``add_text`` injects real tEXt/zTXt/iTXt chunks (with correct CRCs)
for fixtures.
"""

from __future__ import annotations

import struct
import zlib

__all__ = ["PngTextError", "probe_text", "strip_text", "add_text"]

_SIG = b"\x89PNG\r\n\x1a\n"
_TEXT_TYPES = (b"tEXt", b"zTXt", b"iTXt")
_DROP_TYPES = _TEXT_TYPES + (b"eXIf", b"tIME")


class PngTextError(ValueError):
    pass


def _chunks(data: bytes):
    if data[:8] != _SIG:
        raise PngTextError("not a PNG payload")
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        end = pos + 8 + length + 4
        if end > n:
            raise PngTextError(f"truncated {ctype!r} chunk")
        yield ctype, data[pos + 8 : pos + 8 + length], data[pos:end]
        pos = end
        if ctype == b"IEND":
            return


def probe_text(data: bytes) -> dict:
    """{has_text, entries: [(keyword, text, kind)], has_exif_chunk,
    has_time_chunk} — IDAT is never inflated."""
    entries = []
    has_exif = has_time = False
    for ctype, body, _raw in _chunks(data):
        if ctype == b"tEXt":
            k, _, v = body.partition(b"\x00")
            entries.append((k.decode("latin-1"),
                            v.decode("latin-1"), "tEXt"))
        elif ctype == b"zTXt":
            k, _, rest = body.partition(b"\x00")
            if not rest or rest[0] != 0:
                raise PngTextError("zTXt with unknown compression method")
            try:
                v = zlib.decompress(rest[1:])
            except zlib.error as e:
                raise PngTextError(f"bad zTXt stream: {e}") from None
            entries.append((k.decode("latin-1"),
                            v.decode("latin-1"), "zTXt"))
        elif ctype == b"iTXt":
            k, _, rest = body.partition(b"\x00")
            if len(rest) < 2:
                raise PngTextError("truncated iTXt header")
            comp_flag, comp_method = rest[0], rest[1]
            rest = rest[2:]
            _lang, _, rest = rest.partition(b"\x00")
            _tkey, _, v = rest.partition(b"\x00")
            if comp_flag:
                if comp_method != 0:
                    raise PngTextError("iTXt with unknown compression method")
                try:
                    v = zlib.decompress(v)
                except zlib.error as e:
                    raise PngTextError(f"bad iTXt stream: {e}") from None
            entries.append((k.decode("latin-1"),
                            v.decode("utf-8", errors="replace"), "iTXt"))
        elif ctype == b"eXIf":
            has_exif = True
        elif ctype == b"tIME":
            has_time = True
    return {"has_text": bool(entries) or has_exif or has_time,
            "entries": entries, "has_exif_chunk": has_exif,
            "has_time_chunk": has_time}


def strip_text(data: bytes) -> bytes:
    """The PNG minus every metadata chunk; pixel chunks byte-identical."""
    out = bytearray(_SIG)
    for ctype, _body, raw in _chunks(data):
        if ctype not in _DROP_TYPES:
            out += raw
    return bytes(out)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body)))


def add_text(data: bytes, entries: list[tuple[str, str, str]]) -> bytes:
    """Inject text chunks (kind 'tEXt'/'zTXt'/'iTXt') before IDAT."""
    if data[:8] != _SIG:
        raise PngTextError("not a PNG payload")
    extra = bytearray()
    for keyword, text, kind in entries:
        k = keyword.encode("latin-1")
        if kind == "tEXt":
            extra += _chunk(b"tEXt", k + b"\x00" + text.encode("latin-1"))
        elif kind == "zTXt":
            extra += _chunk(b"zTXt", k + b"\x00\x00"
                            + zlib.compress(text.encode("latin-1")))
        elif kind == "iTXt":
            extra += _chunk(b"iTXt", k + b"\x00\x00\x00" + b"en\x00"
                            + b"\x00" + text.encode("utf-8"))
        else:
            raise PngTextError(f"unknown text chunk kind {kind!r}")
    out = bytearray(_SIG)
    inserted = False
    for ctype, _body, raw in _chunks(data):
        if ctype == b"IDAT" and not inserted:
            out += extra
            inserted = True
        out += raw
    return bytes(out)
