"""Pure-stdlib legacy Excel (.xls, BIFF8 / MS-XLS) text extraction +
fixture encoder.

The spreadsheet sibling of llm/worddoc: a CFB container (llm/cfb)
with a ``Workbook`` stream of BIFF records.  Extraction mirrors the
xlsx path in llm/office — one unit per sheet, rows as lines, cells
tab-joined in column order, numbers through the same ``_num_repr`` —
so a corpus mixing .xls and .xlsx lands on identical downstream text.

Scope (refusals name what they hit): BIFF8 only (BOF version 0x0600;
BIFF5-era files refuse), SST shared strings including CONTINUE-record
splits mid-string (each continuation re-states its own option byte —
the notorious BIFF quirk), LABELSST / NUMBER / RK / MULRK / BOOLERR
cells, FORMULA cached numeric and cached-string (via the following
STRING record) values.  Encrypted workbooks (FILEPASS) refuse by
name.  ``encode_xls`` writes real BIFF8 fixtures — including
deliberately CONTINUE-split SSTs — since no Excel implementation
exists in this environment to cross-check against; byte layouts are
pinned to MS-XLS record shapes by tests.
"""

from __future__ import annotations

import struct

__all__ = ["XlsError", "xls_units", "encode_xls"]

from verified_sources_spark.llm.office import _num_repr

_BOF = 0x0809
_EOF = 0x000A
_SST = 0x00FC
_CONTINUE = 0x003C
_BOUNDSHEET = 0x0085
_LABELSST = 0x00FD
_NUMBER = 0x0203
_RK = 0x027E
_MULRK = 0x00BD
_BOOLERR = 0x0205
_FORMULA = 0x0006
_STRING = 0x0207
_FILEPASS = 0x002F


class XlsError(ValueError):
    """Named refusal: not a .xls this extractor can serve honestly."""


def _records(data: bytes, start: int = 0):
    pos = start
    n = len(data)
    while pos + 4 <= n:
        rtype, ln = struct.unpack_from("<HH", data, pos)
        if pos + 4 + ln > n:
            raise XlsError(f"truncated BIFF record 0x{rtype:04X} at {pos}")
        yield rtype, data[pos + 4 : pos + 4 + ln], pos
        pos += 4 + ln
        if rtype == _EOF and start:
            return


def _rk_value(rk: int) -> float:
    v = rk >> 2
    if rk & 2:  # signed integer
        if v >= 1 << 29:
            v -= 1 << 30
        out = float(v)
    else:       # top 30 bits of an IEEE double
        out = struct.unpack("<d", struct.pack("<q", v << 34))[0]
    if rk & 1:
        out /= 100
    return out


def _parse_sst(payload: bytes, continues: list[bytes]) -> list[str]:
    """XLUnicodeRichExtendedString array spanning CONTINUE records.
    Each continuation that lands MID-string re-states the option byte
    for its remainder (characters may flip 8/16-bit at the seam)."""
    (_total, unique) = struct.unpack_from("<ii", payload, 0)
    chunks = [payload[8:]] + continues
    ci = 0
    pos = 0
    out: list[str] = []

    def remaining() -> int:
        return len(chunks[ci]) - pos

    def advance():
        nonlocal ci, pos
        while ci < len(chunks) and pos >= len(chunks[ci]):
            ci += 1
            pos = 0

    def take(n: int) -> bytes:
        nonlocal pos
        got = bytearray()
        while n:
            advance()
            if ci >= len(chunks):
                raise XlsError("SST exhausted mid-field")
            piece = chunks[ci][pos : pos + n]
            got += piece
            pos += len(piece)
            n -= len(piece)
        return bytes(got)

    for _ in range(unique):
        (cch,) = struct.unpack("<H", take(2))
        (grbit,) = struct.unpack("<B", take(1))
        crun = struct.unpack("<H", take(2))[0] if grbit & 0x08 else 0
        cbext = struct.unpack("<i", take(4))[0] if grbit & 0x04 else 0
        parts: list[str] = []
        left = cch
        while left:
            advance()
            if ci >= len(chunks):
                raise XlsError("SST exhausted mid-string")
            if remaining() == 0:
                continue
            wide = grbit & 0x01
            if parts and pos == 0:
                # continuation seam mid-string: new option byte
                (grbit2,) = struct.unpack("<B", take(1))
                wide = grbit2 & 0x01
            width = 2 if wide else 1
            n_here = min(left, remaining() // width)
            if n_here == 0:
                raise XlsError("SST continuation too small for one char")
            raw = take(n_here * width)
            parts.append(raw.decode("utf-16-le" if wide else "latin-1",
                                    errors="replace"))
            left -= n_here
        take(4 * crun + max(cbext, 0))
        out.append("".join(parts))
    return out


def xls_units(data: bytes) -> list[str]:
    """One unit per sheet: rows as lines, cells tab-joined in column
    order — the same rendering as the xlsx path in llm/office."""
    try:
        return _xls_units(data)
    except (struct.error, IndexError) as e:
        # a malformed record body shorter than its type implies must
        # surface as the format error, never a raw struct failure
        # that would escape the Spark operators' isolation
        raise XlsError(f"malformed BIFF record body: {e}") from None


def _xls_units(data: bytes) -> list[str]:
    from verified_sources_spark.llm.cfb import CfbError, list_streams

    try:
        streams = list_streams(data)
    except CfbError as e:
        raise XlsError(f"not an OLE2 container: {e}") from None
    wb = streams.get("Workbook") or streams.get("Book")
    if wb is None:
        raise XlsError("no Workbook stream — not an Excel binary file")
    if len(wb) < 8:
        raise XlsError("Workbook stream too short for a BOF")
    rtype, ver = struct.unpack_from("<HxxH", wb, 0)
    if rtype != _BOF:
        raise XlsError(f"Workbook stream does not start with BOF "
                       f"(0x{rtype:04X})")
    if ver != 0x0600:
        raise XlsError(f"BIFF version 0x{ver:04X} (not BIFF8) "
                       f"— refusing by name")

    # pass 1: globals — SST (+ its CONTINUEs) and BOUNDSHEET offsets
    sst: list[str] = []
    sheets: list[tuple[int, str]] = []
    pending_sst: bytes | None = None
    pending_cont: list[bytes] = []
    for rt, payload, _pos in _records(wb):
        if rt == _FILEPASS:
            raise XlsError("encrypted .xls (FILEPASS) — refusing by name")
        if rt == _SST:
            pending_sst = payload
            pending_cont = []
        elif rt == _CONTINUE and pending_sst is not None:
            pending_cont.append(payload)
        elif rt == _BOUNDSHEET:
            (lb,) = struct.unpack_from("<I", payload, 0)
            cch = payload[6]
            grbit = payload[7]
            raw = payload[8 : 8 + cch * (2 if grbit & 1 else 1)]
            name = raw.decode("utf-16-le" if grbit & 1 else "latin-1",
                              errors="replace")
            sheets.append((lb, name))
        elif rt == _EOF:
            break
        elif pending_sst is not None and rt != _CONTINUE:
            sst = _parse_sst(pending_sst, pending_cont)
            pending_sst = None
    if pending_sst is not None:
        sst = _parse_sst(pending_sst, pending_cont)

    units: list[str] = []
    for lb, _name in sheets:
        if lb >= len(wb):
            raise XlsError(f"BOUNDSHEET offset {lb} beyond stream")
        cells: dict[tuple[int, int], str] = {}
        last_formula: tuple[int, int] | None = None
        for rt, payload, _pos in _records(wb, lb):
            if rt == _LABELSST:
                row, col, _ixfe, isst = struct.unpack_from("<HHHI", payload)
                if isst >= len(sst):
                    raise XlsError(f"LABELSST index {isst} outside SST")
                cells[(row, col)] = sst[isst]
            elif rt == _NUMBER:
                row, col = struct.unpack_from("<HH", payload)
                (v,) = struct.unpack_from("<d", payload, 6)
                cells[(row, col)] = _num_repr(v)
            elif rt == _RK:
                row, col, _ixfe, rk = struct.unpack_from("<HHHI", payload)
                cells[(row, col)] = _num_repr(_rk_value(rk))
            elif rt == _MULRK:
                row, first = struct.unpack_from("<HH", payload)
                (last,) = struct.unpack_from("<H", payload, len(payload) - 2)
                for k in range(last - first + 1):
                    (rk,) = struct.unpack_from("<I", payload, 4 + 6 * k + 2)
                    cells[(row, first + k)] = _num_repr(_rk_value(rk))
            elif rt == _BOOLERR:
                row, col, _ixfe, val, is_err = struct.unpack_from(
                    "<HHHBB", payload)
                cells[(row, col)] = ("#ERR" if is_err
                                     else ("TRUE" if val else "FALSE"))
            elif rt == _FORMULA:
                row, col = struct.unpack_from("<HH", payload)
                cached = payload[6:14]
                if cached[6:8] == b"\xff\xff":
                    if cached[0] == 0:          # cached string follows
                        last_formula = (row, col)
                    elif cached[0] == 1:        # cached boolean
                        cells[(row, col)] = ("TRUE" if cached[2]
                                             else "FALSE")
                    else:                       # error / blank
                        cells[(row, col)] = "#ERR" if cached[0] == 2 else ""
                else:
                    (v,) = struct.unpack("<d", cached)
                    cells[(row, col)] = _num_repr(v)
            elif rt == _STRING and last_formula is not None:
                (cch,) = struct.unpack_from("<H", payload, 0)
                wide = payload[2] & 1
                raw = payload[3 : 3 + cch * (2 if wide else 1)]
                cells[last_formula] = raw.decode(
                    "utf-16-le" if wide else "latin-1", errors="replace")
                last_formula = None
            elif rt == _EOF:
                break
        rows: dict[int, list[tuple[int, str]]] = {}
        for (r, c), v in cells.items():
            rows.setdefault(r, []).append((c, v))
        lines = []
        for r in sorted(rows):
            lines.append("\t".join(v for _, v in sorted(rows[r])))
        units.append("\n".join(lines))
    return units


def _rec(rtype: int, payload: bytes) -> bytes:
    return struct.pack("<HH", rtype, len(payload)) + payload


def _sst_string(s: str) -> bytes:
    try:
        raw = s.encode("latin-1")
        grbit = 0
    except UnicodeEncodeError:
        raw = s.encode("utf-16-le")
        grbit = 1
    return struct.pack("<HB", len(s), grbit) + raw


def encode_xls(sheets: dict[str, list[list]], split_sst: bool = False,
               rk_ints: bool = True) -> bytes:
    """Real BIFF8 fixture: globals (BOF, optional CONTINUE-split SST,
    BOUNDSHEETs) + one substream per sheet.  Cell values: str →
    LABELSST, bool → BOOLERR, int → RK (when exactly representable and
    ``rk_ints``) else NUMBER.  ``split_sst=True`` forces a CONTINUE
    seam MID-string with a re-stated option byte — the quirk real SSTs
    hit constantly."""
    strings: list[str] = []
    index: dict[str, int] = {}
    total_refs = 0
    for rows in sheets.values():
        for row in rows:
            for v in row:
                if isinstance(v, str):
                    total_refs += 1
                    if v not in index:
                        index[v] = len(strings)
                        strings.append(v)

    sheet_bodies: list[bytes] = []
    for rows in sheets.values():
        body = bytearray(_rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0010,
                                                0, 0, 0, 0)))
        for r, row in enumerate(rows):
            for c, v in enumerate(row):
                if isinstance(v, str):
                    body += _rec(_LABELSST, struct.pack(
                        "<HHHI", r, c, 0, index[v]))
                elif isinstance(v, bool):
                    body += _rec(_BOOLERR, struct.pack(
                        "<HHHBB", r, c, 0, int(v), 0))
                elif (isinstance(v, int) and rk_ints
                      and -(1 << 29) <= v < (1 << 29)):
                    rk = ((v & ((1 << 30) - 1)) << 2) | 2
                    body += _rec(_RK, struct.pack("<HHHI", r, c, 0, rk))
                else:
                    body += _rec(_NUMBER, struct.pack(
                        "<HHH", r, c, 0) + struct.pack("<d", float(v)))
        body += _rec(_EOF, b"")
        sheet_bodies.append(bytes(body))

    globals_ = bytearray(_rec(_BOF, struct.pack("<HHHHII", 0x0600, 0x0005,
                                                0, 0, 0, 0)))
    if strings:
        sst = struct.pack("<ii", total_refs, len(strings))
        encoded = [_sst_string(s) for s in strings]
        if split_sst and len(encoded[-1]) > 5:
            # seam mid-way through the LAST string's characters: the
            # continuation restates its own option byte
            last = strings[-1]
            head = encoded[-1][:3]  # cch + grbit
            wide = head[2] & 1
            cut = max(1, len(last) // 2)
            w = 2 if wide else 1
            part1 = head + encoded[-1][3 : 3 + cut * w]
            part2 = bytes([head[2]]) + encoded[-1][3 + cut * w:]
            sst_payload = sst + b"".join(encoded[:-1]) + part1
            globals_ += _rec(_SST, sst_payload)
            globals_ += _rec(_CONTINUE, part2)
        else:
            globals_ += _rec(_SST, sst + b"".join(encoded))
    bs_pos = len(globals_)
    for name in sheets:
        raw = name.encode("latin-1")
        globals_ += _rec(_BOUNDSHEET,
                         struct.pack("<IBBB", 0, 0, 0, len(raw))
                         + b"\x00" + raw)
    globals_ += _rec(_EOF, b"")
    # patch BOUNDSHEET lbPlyPos now that the globals length is known
    offsets = []
    acc = len(globals_)
    for body in sheet_bodies:
        offsets.append(acc)
        acc += len(body)
    pos = bs_pos
    for off in offsets:
        struct.pack_into("<I", globals_, pos + 4, off)
        ln = struct.unpack_from("<H", globals_, pos + 2)[0]
        pos += 4 + ln

    from verified_sources_spark.llm.cfb import encode_cfb

    return encode_cfb({"Workbook": bytes(globals_)
                       + b"".join(sheet_bodies)})
