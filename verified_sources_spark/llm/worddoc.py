"""Pure-stdlib legacy Word (.doc, Word 97-2003 / MS-DOC) text
extraction + fixture encoder.

Older corpora are full of binary .doc files; the reference's
unstructured_data source routes them into text via partitioning
libraries (/root/reference/sources/unstructured_data/helpers.py:13-18)
— this is the same reading half, from scratch.  The format: a CFB
container (llm/cfb) holding a ``WordDocument`` stream (FIB header +
raw text) and a table stream (``1Table``/``0Table`` per a FIB flag)
holding the CLX/piece table that maps character positions to text
runs — each PIECE either 16-bit Unicode or "compressed" 8-bit CP1252
(the fc dword's bit 30), at an fc-encoded stream offset.

Scope (everything else refuses by name): FIB nFib >= 0x00C1 (Word
97+; Word 95 and earlier lay the FIB out differently), unencrypted
(``fEncrypted`` refuses), main-document text (``ccpText`` — headers
and footnotes live at higher CPs and are out of scope).  Control
characters map per MS-DOC: CR/VT to newline, cell/row marks (0x07)
to tab; field begin/separator/end (0x13/0x14/0x15) and anchor/picture
placeholders drop.

No OLE2/Word implementation exists in this environment to cross-check
against, so ``encode_doc`` keeps the fixture side honest by being a
REAL FIB+CLX writer (both piece flavors, both table-stream names)
whose byte layout tests pin to the MS-DOC spec offsets (fcClx at FIB
offset 0x01A2, ccpText at 0x004C), and the extractor is additionally
exercised on hand-assembled pieces the encoder does not emit.
"""

from __future__ import annotations

import struct

__all__ = ["DocError", "doc_units", "encode_doc"]


class DocError(ValueError):
    """Named refusal: not a .doc this extractor can serve honestly."""


_FIB_SIZE = 32 + 2 + 28 + 2 + 88 + 2 + 93 * 8  # base..fibRgFcLcb97 = 898
_OFF_CCP_TEXT = 32 + 2 + 28 + 2 + 3 * 4        # fibRgLw97.ccpText = 0x4C
_OFF_FC_CLX = 32 + 2 + 28 + 2 + 88 + 2 + 33 * 8  # 0x01A2


def _clean(text: str) -> list[str]:
    """Raw piece text → paragraph list per MS-DOC control characters."""
    out = []
    para = []
    for ch in text:
        if ch in "\r\x0b":          # paragraph mark / hard line break
            out.append("".join(para))
            para = []
        elif ch == "\x07":          # cell / row mark
            para.append("\t")
        elif ch in "\x13\x14\x15\x00\x01\x02\x05\x08":
            continue                # field chars, pictures, anchors
        elif ch == "\x0c":          # page break / section mark
            out.append("".join(para))
            para = []
        else:
            para.append(ch)
    if para:
        out.append("".join(para))
    return out


def doc_units(data: bytes) -> list[str]:
    """Paragraphs of the main document text."""
    from verified_sources_spark.llm.cfb import CfbError, list_streams

    try:
        streams = list_streams(data)
    except CfbError as e:
        raise DocError(f"not an OLE2 container: {e}") from None
    wd = streams.get("WordDocument")
    if wd is None:
        raise DocError("no WordDocument stream — not a Word binary file")
    if len(wd) < _FIB_SIZE:
        raise DocError(f"WordDocument stream too short for a FIB "
                       f"({len(wd)} bytes)")
    (ident, nfib) = struct.unpack_from("<HH", wd, 0)
    if ident != 0xA5EC:
        raise DocError(f"bad FIB wIdent 0x{ident:04X}")
    if nfib < 0x00C1:
        raise DocError(
            f"Word 95-era FIB (nFib 0x{nfib:04X}) — refusing by name")
    (flags,) = struct.unpack_from("<H", wd, 0x0A)
    if flags & 0x0100:
        raise DocError("encrypted .doc (fEncrypted) — refusing by name")
    table_name = "1Table" if flags & 0x0200 else "0Table"
    table = streams.get(table_name)
    if table is None:
        raise DocError(f"missing {table_name} stream")
    (ccp_text,) = struct.unpack_from("<i", wd, _OFF_CCP_TEXT)
    fc_clx, lcb_clx = struct.unpack_from("<II", wd, _OFF_FC_CLX)
    if lcb_clx == 0 or fc_clx + lcb_clx > len(table):
        raise DocError(
            f"CLX out of range: {fc_clx}+{lcb_clx} > {len(table)}")
    clx = table[fc_clx : fc_clx + lcb_clx]

    # CLX = Prc* (clxt=1: grpprl, skipped) then Pcdt (clxt=2: PlcPcd)
    pos = 0
    plc = None
    while pos < len(clx):
        t = clx[pos]
        if t == 1:
            if pos + 3 > len(clx):
                raise DocError("truncated Prc in CLX")
            (cb,) = struct.unpack_from("<H", clx, pos + 1)
            pos += 3 + cb
        elif t == 2:
            if pos + 5 > len(clx):
                raise DocError("truncated Pcdt in CLX")
            (lcb,) = struct.unpack_from("<I", clx, pos + 1)
            plc = clx[pos + 5 : pos + 5 + lcb]
            if len(plc) < lcb:
                raise DocError("truncated PlcPcd")
            break
        else:
            raise DocError(f"unknown CLX element type {t}")
    if plc is None:
        raise DocError("CLX has no piece table (Pcdt)")
    if (len(plc) - 4) % 12:
        raise DocError(f"PlcPcd size {len(plc)} is not 4 + 12n")
    n = (len(plc) - 4) // 12
    cps = struct.unpack_from(f"<{n + 1}i", plc, 0)
    parts: list[str] = []
    got = 0
    for i in range(n):
        cp0, cp1 = cps[i], cps[i + 1]
        if cp1 < cp0:
            raise DocError(f"piece {i} has descending CPs")
        (fc,) = struct.unpack_from("<I", plc, 4 * (n + 1) + 8 * i + 2)
        count = cp1 - cp0
        if got >= ccp_text:
            break
        count = min(count, ccp_text - got)
        if fc & 0x40000000:  # compressed: 8-bit CP1252
            off = (fc & 0x3FFFFFFF) // 2
            raw = wd[off : off + count]
            if len(raw) < count:
                raise DocError(f"piece {i} text beyond WordDocument stream")
            parts.append(raw.decode("cp1252", errors="replace"))
        else:
            off = fc & 0x3FFFFFFF
            raw = wd[off : off + 2 * count]
            if len(raw) < 2 * count:
                raise DocError(f"piece {i} text beyond WordDocument stream")
            parts.append(raw.decode("utf-16-le", errors="replace"))
        got += count
    if got < ccp_text:
        raise DocError(
            f"piece table covers {got} of {ccp_text} main-text chars")
    return _clean("".join(parts))


def encode_doc(paragraphs: list[str], which_table: int = 1) -> bytes:
    """Real Word-97 fixture: FIB + text pieces in the WordDocument
    stream, CLX piece table in the 1Table/0Table stream, wrapped in a
    real CFB container.  Each paragraph becomes its own piece —
    CP1252-compressed when it fits, 16-bit Unicode otherwise, so both
    piece flavors land on every mixed-content fixture."""
    texts = [p + "\r" for p in paragraphs]
    wd = bytearray(_FIB_SIZE)
    struct.pack_into("<HH", wd, 0, 0xA5EC, 0x00C1)
    flags = 0x0200 if which_table else 0
    struct.pack_into("<H", wd, 0x0A, flags)
    struct.pack_into("<H", wd, 0x0C, 0x00BF)  # nFibBack
    # csw / cslw / cbRgFcLcb structure sizes for nFib 0x00C1
    struct.pack_into("<H", wd, 32, 14)
    struct.pack_into("<H", wd, 62, 22)
    struct.pack_into("<H", wd, 152, 93)
    wd += b"\x00" * (1024 - len(wd))  # text begins at a round offset

    cps = [0]
    pcds = []
    total = 0
    for t in texts:
        try:
            enc = t.encode("cp1252")
            compressed = True
        except UnicodeEncodeError:
            enc = t.encode("utf-16-le")
            compressed = False
        off = len(wd)
        wd += enc
        total += len(t)
        cps.append(total)
        fc = (off * 2) | 0x40000000 if compressed else off
        pcds.append(struct.pack("<HIH", 0, fc, 0))
    struct.pack_into("<i", wd, _OFF_CCP_TEXT, total)

    n = len(texts)
    plc = struct.pack(f"<{n + 1}i", *cps) + b"".join(pcds)
    # a Prc ahead of the Pcdt exercises the CLX walk's skip path
    clx = b"\x01" + struct.pack("<H", 2) + b"\x00\x00"
    clx += b"\x02" + struct.pack("<I", len(plc)) + plc
    table = b"\x00" * 64 + clx  # non-zero fcClx
    struct.pack_into("<II", wd, _OFF_FC_CLX, 64, len(clx))

    from verified_sources_spark.llm.cfb import encode_cfb

    name = "1Table" if which_table else "0Table"
    return encode_cfb({"WordDocument": bytes(wd), name: table})
