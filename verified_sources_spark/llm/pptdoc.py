"""Pure-stdlib legacy PowerPoint (.ppt, PowerPoint 97-2003 / MS-PPT)
text extraction + fixture encoder — the third leg of the binary
Office set (llm/worddoc, llm/xlsdoc).

The format: a CFB container (llm/cfb) whose ``PowerPoint Document``
stream is a tree of 8-byte-headed records — recVerAndInstance (2),
recType (2), recLen (4); a record whose version nibble is 0xF is a
CONTAINER holding child records in its payload.  Slide text lives in
``TextCharsAtom`` (UTF-16LE) and ``TextBytesAtom`` (Latin-1) atoms,
grouped under ``SlideListWithText``: each ``SlidePersistAtom`` starts
a new slide, and the text atoms that follow belong to it — mirroring
the pptx path (one unit per slide, text runs joined by newlines).

Scope (refusals name what they hit): unencrypted files only (a
``CryptSession10Container`` / ``UserEditAtom`` pointing at an
encrypted persist refuses by name via the DocumentEncryptionAtom);
text outside SlideListWithText (notes, masters) is ignored, matching
what the pptx extractor reads.  ``encode_ppt`` writes a real record
tree (Document > SlideListWithText > per-slide persist + text atoms,
both atom flavors) for fixtures; record shapes are pinned to MS-PPT
type ids by tests.
"""

from __future__ import annotations

import struct

__all__ = ["PptError", "ppt_units", "encode_ppt"]


class PptError(ValueError):
    """Named refusal: not a .ppt this extractor can serve honestly."""


_RT_DOCUMENT = 0x03E8
_RT_SLIDE_LIST_WITH_TEXT = 0x0FF0
_RT_SLIDE_PERSIST_ATOM = 0x03F3
_RT_TEXT_HEADER_ATOM = 0x0F9F
_RT_TEXT_CHARS_ATOM = 0x0FA0
_RT_TEXT_BYTES_ATOM = 0x0FA8
_RT_DOC_ENCRYPTION_ATOM = 0x2F14


def _walk(data: bytes, pos: int, end: int, depth: int = 0):
    """Yield (rec_type, is_container, payload) in stream order."""
    if depth > 32:
        raise PptError("record tree too deep")
    while pos + 8 <= end:
        ver_inst, rtype, ln = struct.unpack_from("<HHI", data, pos)
        body_end = pos + 8 + ln
        if body_end > end:
            raise PptError(
                f"truncated PPT record 0x{rtype:04X} at {pos}")
        is_container = (ver_inst & 0x000F) == 0x000F
        yield rtype, is_container, data[pos + 8 : body_end]
        if is_container:
            yield from _walk(data, pos + 8, body_end, depth + 1)
        pos = body_end


def ppt_units(data: bytes) -> list[str]:
    """One unit per slide: that slide's text runs joined by newlines —
    the same rendering as the pptx path in llm/office."""
    from verified_sources_spark.llm.cfb import CfbError, list_streams

    try:
        streams = list_streams(data)
    except CfbError as e:
        raise PptError(f"not an OLE2 container: {e}") from None
    ppt = streams.get("PowerPoint Document")
    if ppt is None:
        raise PptError(
            "no 'PowerPoint Document' stream — not a PowerPoint binary")
    slides: list[list[str]] = []
    for rtype, is_container, payload in _walk(ppt, 0, len(ppt)):
        if rtype == _RT_DOC_ENCRYPTION_ATOM:
            raise PptError("encrypted .ppt — refusing by name")
        if rtype != _RT_SLIDE_LIST_WITH_TEXT or not is_container:
            continue
        # group strictly WITHIN this SlideListWithText: notes/master
        # text elsewhere in the tree stays out, matching the pptx path
        for rt, is_c, p in _walk(payload, 0, len(payload)):
            if is_c:
                continue
            if rt == _RT_SLIDE_PERSIST_ATOM:
                slides.append([])
            elif rt == _RT_TEXT_CHARS_ATOM and slides:
                slides[-1].append(p.decode("utf-16-le", errors="replace"))
            elif rt == _RT_TEXT_BYTES_ATOM and slides:
                slides[-1].append(p.decode("latin-1"))
    return ["\n".join(runs) for runs in slides]


def _rec(ver_inst: int, rtype: int, payload: bytes) -> bytes:
    return struct.pack("<HHI", ver_inst, rtype, len(payload)) + payload


def encode_ppt(slides: list[str]) -> bytes:
    """Real .ppt fixture: Document > SlideListWithText with one
    SlidePersistAtom + TextHeaderAtom + text atom per slide — UTF-16
    ``TextCharsAtom`` when the text needs it, Latin-1
    ``TextBytesAtom`` otherwise, so both flavors appear in any
    mixed-content corpus."""
    body = bytearray()
    for i, text in enumerate(slides):
        body += _rec(0x0000, _RT_SLIDE_PERSIST_ATOM,
                     struct.pack("<IIiII", 0, 0, 1, 256 + i, 0))
        body += _rec(0x0000, _RT_TEXT_HEADER_ATOM, struct.pack("<I", 0))
        try:
            raw = text.encode("latin-1")
            body += _rec(0x0000, _RT_TEXT_BYTES_ATOM, raw)
        except UnicodeEncodeError:
            body += _rec(0x0000, _RT_TEXT_CHARS_ATOM,
                         text.encode("utf-16-le"))
    slwt = _rec(0x000F, _RT_SLIDE_LIST_WITH_TEXT, bytes(body))
    doc = _rec(0x000F, _RT_DOCUMENT, slwt)

    from verified_sources_spark.llm.cfb import encode_cfb

    return encode_cfb({"PowerPoint Document": doc,
                       "Current User": b"\x00" * 20})
