"""JBIG2 (ITU-T T.88) embedded streams — MMR and MQ-arithmetic
generic regions.

Post-2005 scanned PDFs predominantly carry /JBIG2Decode images.  The
standard has two coding backends, both served here: **MMR=1 generic
regions are T.4/T.6 coded** (T.88 §6.2.5.7 delegates region data to
the MMR coder), decoded by this repo's libtiff-verified fax codec
(llm/fax_codec); **MMR=0 regions use the MQ arithmetic coder**
(llm/mq_coder, implemented from the published T.88/T.800 flowcharts)
with the template-0 context model — the default every mainstream
encoder emits — including TPGDON typical-prediction rows and
non-nominal AT pixels.  Verification posture for the arithmetic
layer: no external JBIG2 implementation exists in this environment,
so the gate is encoder↔decoder independence at the bitmap level (the
fixture encoder drives its own context walk into the MQ encoder; the
decoder reconstructs through its own walk — they meet only at the
published template definition and coder tables) plus the MQ coder's
own randomized round-trip/invariant battery.  Generic-region
templates 1-3, EXTTEMPLATE, and symbol-dictionary/text/halftone/
refinement segments still refuse BY NAME (the silent-garble risk the
two-sided method exists to prevent).

Implements the PDF "embedded organization" (T.88 Annex; no file
header): a stream of segments, each a segment header (§7.2) plus data.
Supported segment types:

- 48 page information (§7.4.8) — page size + default pixel value;
  unknown height (0xFFFFFFFF, striped pages) grows to the region
  extents, as real readers do
- 36/38/39 (intermediate / immediate / immediate-lossless) generic
  region (§7.4.6) with MMR=1 — region bitmap decoded by
  fax_codec.decode_g4 and composited onto the page with the external
  combination operator (OR/AND/XOR/XNOR/REPLACE, §6.8.2);
  intermediate regions (36) also composite here (no refinement
  support — a later refinement segment would refuse by type anyway)
- 49/50/51 end-of-page / end-of-stripe / end-of-file — frame no-ops
- 62 extension — skipped (spec: decoders may ignore)

A /JBIG2Globals stream parses with the same reader first; its
segments (page association 0) obey the same type gate.

Fixture encoder ``encode_jbig2_mmr`` writes the same embedded
organization with byte layouts pinned to the spec section numbers
above, so reader and writer are cross-checked by hand-assembled
structures in tests/test_jbig2.py (the same posture as llm/cfb and
llm/sevenzip: no system JBIG2 library exists here, so the container
walk is spec-pinned and the payload coding rides the libtiff-verified
T.6 tables).

Reference analogue: scanned documents enter the reference pipeline via
file routing in sources/unstructured_data/helpers.py:30-63; this module
is the decode step that makes /JBIG2Decode pages servable rows instead
of refusals.
"""

from __future__ import annotations

import struct

from verified_sources_spark.llm.fax_codec import (
    FaxError,
    decode_g4,
    encode_g4,
)

__all__ = [
    "Jbig2Error",
    "decode_jbig2_embedded",
    "encode_jbig2_mmr",
    "encode_jbig2_arith",
]

# --------------------------------------------------- arithmetic layer
# Generic region, GBTEMPLATE=0 (T.88 §6.2.5.7): 16-pixel context —
# 12 fixed positions plus four adaptive (AT) pixels, nominal
# A1=(+3,-1) A2=(-3,-1) A3=(+2,-2) A4=(-2,-2).  The context value
# takes the template pixels in raster order (sorted by (y, x)), MSB
# first.  TPGDON rows decode one SLTP bit in the pseudo-context
# 0x9B25 and, while LTP holds, copy the row above.
_T0_FIXED = ((-1, -2), (0, -2), (1, -2),
             (-2, -1), (-1, -1), (0, -1), (1, -1), (2, -1),
             (-4, 0), (-3, 0), (-2, 0), (-1, 0))
_T0_NOMINAL_AT = ((3, -1), (-3, -1), (2, -2), (-2, -2))
_TPGDON_CTX0 = 0x9B25
_PAD = 8  # row padding so template reads never bounds-check


def _template0(at: tuple[tuple[int, int], ...]):
    if len(at) != 4:
        raise Jbig2Error("template 0 needs exactly 4 AT pixels")
    for ax, ay in at:
        if ay > 0 or (ay == 0 and ax >= 0) or abs(ax) > _PAD \
                or ay < -2:
            raise Jbig2Error(
                f"AT pixel ({ax},{ay}) outside the causal template "
                "window")
    return sorted(_T0_FIXED + tuple(at), key=lambda p: (p[1], p[0]))


def _decode_generic_region_arith(
    data: bytes, w: int, h: int,
    at: tuple[tuple[int, int], ...], tpgdon: bool,
) -> list[bytes]:
    """MMR=0 generic region, template 0 → rows of 0/1 bytes."""
    from verified_sources_spark.llm.mq_coder import MQDecoder

    tmpl = _template0(at)
    dec = MQDecoder(data, 1 << 16)
    zero = [0] * (w + 2 * _PAD)
    rows: list[list[int]] = []
    ltp = 0
    for y in range(h):
        if tpgdon:
            ltp ^= dec.decode(_TPGDON_CTX0)
            if ltp:
                rows.append(list(rows[y - 1]) if y else list(zero))
                continue
        r2 = rows[y - 2] if y >= 2 else zero
        r1 = rows[y - 1] if y >= 1 else zero
        row = list(zero)
        if at == _T0_NOMINAL_AT:
            # nominal ATs make all three template rows CONTIGUOUS
            # (y-2: x-2..x+2, y-1: x-3..x+3, y: x-4..x-1), so the
            # context slides incrementally: 3 reads per pixel, not 16
            decode = dec.decode
            g2 = (r2[_PAD - 2] << 4 | r2[_PAD - 1] << 3
                  | r2[_PAD] << 2 | r2[_PAD + 1] << 1 | r2[_PAD + 2])
            g1 = (r1[_PAD - 3] << 6 | r1[_PAD - 2] << 5
                  | r1[_PAD - 1] << 4 | r1[_PAD] << 3
                  | r1[_PAD + 1] << 2 | r1[_PAD + 2] << 1
                  | r1[_PAD + 3])
            g0 = 0
            for x in range(w):
                p = decode((g2 << 11) | (g1 << 4) | g0)
                row[x + _PAD] = p
                g2 = ((g2 << 1) | r2[x + 3 + _PAD]) & 0x1F
                g1 = ((g1 << 1) | r1[x + 4 + _PAD]) & 0x7F
                g0 = ((g0 << 1) | p) & 0x0F
        else:
            rs = (r2, r1, row)
            for x in range(w):
                ctx = 0
                for dx, dy in tmpl:
                    ctx = (ctx << 1) | rs[dy + 2][x + dx + _PAD]
                row[x + _PAD] = dec.decode(ctx)
        rows.append(row)
    return [bytes(r[_PAD : _PAD + w]) for r in rows]


def _encode_generic_region_arith(
    rows: list[bytes], at: tuple[tuple[int, int], ...], tpgdon: bool,
) -> bytes:
    """Fixture encoder: the same context model driving the MQ encoder
    (independent of the decoder's walk; the two meet only at the
    published template/coder definitions)."""
    from verified_sources_spark.llm.mq_coder import MQEncoder

    tmpl = _template0(at)
    w = len(rows[0])
    enc = MQEncoder(1 << 16)
    zero = [0] * (w + 2 * _PAD)
    padded: list[list[int]] = []
    ltp = 0
    for y, raw in enumerate(rows):
        row = list(zero)
        row[_PAD : _PAD + w] = [p & 1 for p in raw]
        if tpgdon:
            # decoder applies ltp ^= SLTP, so SLTP = typical XOR ltp
            prev = padded[y - 1] if y else zero
            typical = 1 if row == prev else 0
            enc.encode(_TPGDON_CTX0, typical ^ ltp)
            ltp = typical
            if ltp:
                padded.append(row)
                continue
        r2 = padded[y - 2] if y >= 2 else zero
        r1 = padded[y - 1] if y >= 1 else zero
        rs = (r2, r1, row)
        for x in range(w):
            ctx = 0
            for dx, dy in tmpl:
                ctx = (ctx << 1) | rs[dy + 2][x + dx + _PAD]
            enc.encode(ctx, row[x + _PAD])
        padded.append(row)
    return enc.flush()

# T.88 §7.3 segment type numbers
_PAGE_INFO = 48
_END_OF_PAGE = 49
_END_OF_STRIPE = 50
_END_OF_FILE = 51
_EXTENSION = 62
_GENERIC_REGIONS = (36, 38, 39)

_TYPE_NAMES = {
    0: "symbol dictionary", 4: "intermediate text region",
    6: "immediate text region", 7: "immediate lossless text region",
    16: "pattern dictionary", 20: "intermediate halftone region",
    22: "immediate halftone region",
    23: "immediate lossless halftone region",
    40: "intermediate refinement region",
    42: "immediate refinement region",
    43: "immediate lossless refinement region",
    52: "profiles", 53: "tables", 54: "color palette",
}

_MAX_PIXELS = 1 << 26  # 64M page pixels: the decompression-bomb gate


class Jbig2Error(ValueError):
    pass


def _u32(data: bytes, pos: int) -> int:
    if pos + 4 > len(data):
        raise Jbig2Error("truncated JBIG2 segment data")
    return struct.unpack_from(">I", data, pos)[0]


def _parse_segment_header(data: bytes, pos: int) -> tuple[dict, int]:
    """One segment header (T.88 §7.2) → (segment dict, data offset).
    The dict carries number/type/page/data_length; referred-to segment
    numbers are parsed (for sizing) but unused — the MMR path has no
    cross-segment references."""
    if pos + 11 > len(data):
        raise Jbig2Error("truncated JBIG2 segment header")
    num = _u32(data, pos)
    flags = data[pos + 4]
    seg_type = flags & 0x3F
    page_assoc_4 = bool(flags & 0x40)
    p = pos + 5
    rts = data[p]
    count = rts >> 5
    if count == 7:  # long form: 29-bit count + retain-bit bytes
        count = _u32(data, p) & 0x1FFFFFFF
        p += 4 + (count + 8) // 8
    else:
        p += 1
    # referred-to segment numbers size by THIS segment's number (§7.2.5)
    ref_size = 1 if num <= 256 else (2 if num <= 65536 else 4)
    p += count * ref_size
    if page_assoc_4:
        page = _u32(data, p)
        p += 4
    else:
        if p >= len(data):
            raise Jbig2Error("truncated JBIG2 segment header")
        page = data[p]
        p += 1
    length = _u32(data, p)
    p += 4
    if length == 0xFFFFFFFF:
        raise Jbig2Error(
            "JBIG2 segment with unknown data length — refusing by name")
    if p + length > len(data):
        raise Jbig2Error(
            f"JBIG2 segment {num} data overruns stream "
            f"({length} bytes declared)")
    return ({"number": num, "type": seg_type, "page": page,
             "data_length": length}, p)


def _iter_segments(data: bytes):
    pos = 0
    while pos < len(data):
        seg, dstart = _parse_segment_header(data, pos)
        seg["data"] = data[dstart : dstart + seg["data_length"]]
        yield seg
        pos = dstart + seg["data_length"]


def _region_info(d: bytes) -> tuple[int, int, int, int, int]:
    """Region segment information field (§7.4.1): w, h, x, y, comb op."""
    if len(d) < 17:
        raise Jbig2Error("truncated JBIG2 region segment info")
    w, h, x, y = struct.unpack_from(">IIII", d, 0)
    op = d[16] & 0x07
    return w, h, x, y, op


def _check_supported(seg: dict) -> None:
    t = seg["type"]
    if t in _GENERIC_REGIONS or t in (
            _PAGE_INFO, _END_OF_PAGE, _END_OF_STRIPE, _END_OF_FILE,
            _EXTENSION):
        return
    name = _TYPE_NAMES.get(t, f"type {t}")
    raise Jbig2Error(
        f"JBIG2 {name} segment — refusing by name "
        "(arithmetic/Huffman-coded structure, no verifier here)")


def decode_jbig2_embedded(
    data: bytes,
    globals_data: bytes = b"",
    max_pixels: int = _MAX_PIXELS,
) -> dict:
    """PDF-embedded JBIG2 → one page bitmap:
    ``{"width", "height", "rows"}`` with rows as bytes of 0/1 per pixel
    (1 = black, the fax row convention, so the caller's gray translate
    is shared with the CCITT path).  MMR=1 generic regions decode via
    the libtiff-verified T.6 decoder and composite with the external
    combination operator; anything arithmetic-coded refuses by name."""
    import numpy as np

    for seg in _iter_segments(globals_data):
        # globals hold dictionaries/tables for the arithmetic/text
        # layers — the same type gate applies (frame no-ops pass)
        _check_supported(seg)
        if seg["type"] in _GENERIC_REGIONS:
            raise Jbig2Error(
                "JBIG2 generic region in the globals stream — "
                "regions are page-associated (T.88 §8.2)")

    segments = list(_iter_segments(data))
    page = None          # np.uint8 (H, W)
    page_w = page_h = 0
    height_unknown = False
    default_pixel = 0

    # pre-scan region extents: striped pages declare height 0xFFFFFFFF
    # and real readers size the page from its regions
    max_extent = 0
    for seg in segments:
        if seg["type"] in _GENERIC_REGIONS:
            _w, h, _x, y, _op = _region_info(seg["data"])
            max_extent = max(max_extent, y + h)

    for seg in segments:
        _check_supported(seg)
        t = seg["type"]
        if t == _PAGE_INFO:
            d = seg["data"]
            if len(d) < 19:
                raise Jbig2Error("truncated JBIG2 page info segment")
            page_w, page_h = struct.unpack_from(">II", d, 0)
            flags = d[16]
            default_pixel = (flags >> 2) & 1
            if page_h == 0xFFFFFFFF:
                height_unknown = True
                page_h = max_extent
            if page_w <= 0 or page_h <= 0:
                raise Jbig2Error("JBIG2 page with empty dimensions")
            if page_w * page_h > max_pixels:
                raise Jbig2Error(
                    f"JBIG2 page {page_w}x{page_h} exceeds "
                    f"{max_pixels}-pixel gate")
            page = np.full((page_h, page_w), default_pixel, np.uint8)
        elif t in _GENERIC_REGIONS:
            if page is None:
                raise Jbig2Error(
                    "JBIG2 region before any page info segment")
            d = seg["data"]
            w, h, x, y, op = _region_info(d)
            if len(d) < 18:
                raise Jbig2Error("truncated JBIG2 generic region")
            gflags = d[17]
            mmr = gflags & 0x01
            template = (gflags >> 1) & 0x03
            tpgdon = bool(gflags & 0x08)
            if gflags & 0x10:
                raise Jbig2Error(
                    "JBIG2 EXTTEMPLATE generic region — refusing by "
                    "name (12-AT extension, no verifier here)")
            if w * h > max_pixels:
                raise Jbig2Error(
                    f"JBIG2 region {w}x{h} exceeds {max_pixels}-pixel "
                    "gate")
            if x + w > page_w or y + h > page_h:
                raise Jbig2Error(
                    f"JBIG2 region {w}x{h}@({x},{y}) exceeds page "
                    f"{page_w}x{page_h}")
            if mmr:
                try:
                    rows = decode_g4(d[18:], w, h)
                except FaxError as e:
                    raise Jbig2Error(
                        f"bad MMR region data: {e}") from None
            else:
                # MQ-arithmetic generic region (template 0 — the
                # default every mainstream encoder emits; templates
                # 1-3 keep refusing by name)
                if template != 0:
                    raise Jbig2Error(
                        f"JBIG2 generic region template {template} — "
                        "refusing by name (only template 0 served)")
                if len(d) < 26:
                    raise Jbig2Error(
                        "truncated JBIG2 arithmetic region (AT bytes)")
                at = tuple(
                    (struct.unpack_from("b", d, 18 + 2 * i)[0],
                     struct.unpack_from("b", d, 19 + 2 * i)[0])
                    for i in range(4))
                rows = _decode_generic_region_arith(
                    d[26:], w, h, at, tpgdon)
            reg = np.frombuffer(b"".join(rows), np.uint8).reshape(h, w)
            sub = page[y : y + h, x : x + w]
            if op == 0:
                sub |= reg
            elif op == 1:
                sub &= reg
            elif op == 2:
                sub ^= reg
            elif op == 3:
                sub ^= reg ^ 1  # XNOR on 0/1 pixels
            elif op == 4:
                sub[:] = reg
            else:
                raise Jbig2Error(
                    f"JBIG2 combination operator {op} — reserved value")
        # 49/50/51/62: frame no-ops / skipped

    if page is None:
        raise Jbig2Error("JBIG2 stream without a page info segment")
    if height_unknown and max_extent == 0:
        raise Jbig2Error(
            "JBIG2 striped page with no regions — height unresolvable")
    raw = page.tobytes()
    return {"width": page_w, "height": page_h,
            "rows": [raw[r * page_w : (r + 1) * page_w]
                     for r in range(page_h)]}


# ------------------------------------------------------------- fixtures

def _segment_header(num: int, seg_type: int, page: int,
                    data_length: int) -> bytes:
    """Embedded-organization segment header, short forms throughout
    (≤4 referred segments — here always 0; 1-byte page association)."""
    return (struct.pack(">I", num) + bytes([seg_type & 0x3F])
            + b"\x00"                       # 0 referred-to segments
            + bytes([page & 0xFF])
            + struct.pack(">I", data_length))


def encode_jbig2_mmr(
    rows: list[bytes] | None = None,
    *,
    regions: list[tuple[int, int, list[bytes], int]] | None = None,
    page_size: tuple[int, int] | None = None,
    page_default: int = 0,
    lossless: bool = True,
    end_of_page: bool = True,
) -> bytes:
    """PDF-embeddable JBIG2 with MMR-coded generic regions.  Either a
    full-page bitmap (``rows``: bytes of 0/1, 1 = black) becoming one
    region at (0,0), or explicit ``regions`` as (x, y, rows, comb_op)
    over ``page_size`` — the multi-region compositing fixture.  Region
    payloads are :func:`fax_codec.encode_g4` output, i.e. the
    libtiff-pinned T.6 writer."""
    if regions is None:
        if not rows:
            raise Jbig2Error("fixture needs rows or regions")
        regions = [(0, 0, rows, 0)]
        page_size = (len(rows[0]), len(rows))
    if page_size is None:
        raise Jbig2Error("explicit regions need page_size")
    pw, ph = page_size

    out = bytearray()
    # page information segment (§7.4.8)
    page_info = (struct.pack(">IIII", pw, ph, 0, 0)
                 + bytes([(page_default & 1) << 2])
                 + struct.pack(">H", 0))
    out += _segment_header(0, _PAGE_INFO, 1, len(page_info)) + page_info
    seg_num = 1
    rtype = 39 if lossless else 38
    for x, y, rrows, op in regions:
        w, h = len(rrows[0]), len(rrows)
        payload = encode_g4(rrows)
        body = (struct.pack(">IIII", w, h, x, y)
                + bytes([op & 0x07])
                + b"\x01"                   # generic flags: MMR=1
                + payload)
        out += _segment_header(seg_num, rtype, 1, len(body)) + body
        seg_num += 1
    if end_of_page:
        out += _segment_header(seg_num, _END_OF_PAGE, 1, 0)
    return bytes(out)


def encode_jbig2_arith(
    rows: list[bytes] | None = None,
    *,
    regions: list[tuple[int, int, list[bytes], int]] | None = None,
    page_size: tuple[int, int] | None = None,
    page_default: int = 0,
    at: tuple[tuple[int, int], ...] = _T0_NOMINAL_AT,
    tpgdon: bool = False,
    lossless: bool = True,
    end_of_page: bool = True,
) -> bytes:
    """PDF-embeddable JBIG2 with MQ-ARITHMETIC generic regions
    (template 0, optional TPGDON, configurable AT pixels) — the
    post-2005 scanned-PDF default.  Same shapes as
    :func:`encode_jbig2_mmr`; region payloads come from the repo's
    own MQ encoder (llm/mq_coder), so encoder and decoder cross-check
    the context model and coder at the bitmap level."""
    if regions is None:
        if not rows:
            raise Jbig2Error("fixture needs rows or regions")
        regions = [(0, 0, rows, 0)]
        page_size = (len(rows[0]), len(rows))
    if page_size is None:
        raise Jbig2Error("explicit regions need page_size")
    pw, ph = page_size

    out = bytearray()
    page_info = (struct.pack(">IIII", pw, ph, 0, 0)
                 + bytes([(page_default & 1) << 2])
                 + struct.pack(">H", 0))
    out += _segment_header(0, _PAGE_INFO, 1, len(page_info)) + page_info
    seg_num = 1
    rtype = 39 if lossless else 38
    gflags = 0x08 if tpgdon else 0x00  # MMR=0, template 0
    at_bytes = b"".join(struct.pack("bb", ax, ay) for ax, ay in at)
    for x, y, rrows, op in regions:
        w, h = len(rrows[0]), len(rrows)
        payload = _encode_generic_region_arith(rrows, at, tpgdon)
        body = (struct.pack(">IIII", w, h, x, y)
                + bytes([op & 0x07])
                + bytes([gflags])
                + at_bytes
                + payload)
        out += _segment_header(seg_num, rtype, 1, len(body)) + body
        seg_num += 1
    if end_of_page:
        out += _segment_header(seg_num, _END_OF_PAGE, 1, 0)
    return bytes(out)
