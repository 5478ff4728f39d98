"""JBIG2 (ITU-T T.88) embedded streams — MMR and MQ-arithmetic
generic regions, symbol dictionaries and text regions.

Post-2005 scanned PDFs predominantly carry /JBIG2Decode images, and
overwhelmingly SYMBOL/TEXT-coded ones (glyphs coded once, placed many
times).  Coding backends served here: **MMR=1 generic regions are
T.4/T.6 coded** (T.88 §6.2.5.7 delegates region data to the MMR
coder), decoded by this repo's libtiff-verified fax codec
(llm/fax_codec); **MMR=0 regions use the MQ arithmetic coder**
(llm/mq_coder, implemented from the published T.88/T.800 flowcharts)
with the template-0 context model — the default every mainstream
encoder emits — including TPGDON typical-prediction rows and
non-nominal AT pixels; **symbol dictionaries + text regions** (§6.5 /
§6.4, arithmetic non-refinement path) through the Annex-A integer
procedures (IADH/IADW/IAEX/IADT/IAFS/IADS/IAIT over 512-context
trees) and the IAID symbol-ID tree, with height-class delta coding,
export-run flags, the strip placement walk, all four REFCORNERs and
the per-instance SBCOMBOP composition; **pattern dictionaries +
halftone regions** (§6.7 / §6.6 — the screened-photo layer: one
collective bitmap sliced into patterns, the HGW×HGH gray-scale image
as Gray-coded generic bitplanes per Annex C.5, skewed-grid placement
with HCOMBOP and off-region clipping).  Verification posture for the
arithmetic layers: no external JBIG2 implementation exists in this
environment, so the gate is encoder↔decoder independence at the
bitmap level (the fixture encoders drive their own walks of the
published model into the MQ encoder; the decoder reconstructs through
its own walk — they meet only at the published template/procedure
definitions and coder tables) plus the MQ coder's own randomized
round-trip/invariant battery; **standard-Huffman symbol dictionaries
+ text regions** (r15: SDHUFF/SBHUFF=1 with the Annex-B standard
tables — each import-time-checked to form a COMPLETE canonical prefix
code, the transcription cross-check; collective height-class bitmaps
uncompressed or MMR through the libtiff-verified fax coder;
§7.4.4.1.7 runcode-built symbol-ID tables); **custom Huffman table
segments** (r15: §7.4.13/§B.2 — self-describing tables parsed into
the same §B.3 canonical-assignment constructor the standard tables go
through, consumed by selector-3 fields in §7.4.3.1.6 order; the tests
re-encode every shipped standard table as a segment and require line-
and codeword-identical parses).  Generic-region templates
1-3, EXTTEMPLATE, the two standard tables
whose transcription failed the completeness cross-check (B.7/B.10),
Huffman-coded halftone, MMR-coded halftone GRAY PLANES (their
inter-plane framing has no verifier here; HDMMR=1 pattern
dictionaries DECODE — single-bitmap framing, T.6 via the
libtiff-verified fax codec), refinement/aggregate symbol coding,
transposed text regions, HENABLESKIP, and refinement segments refuse
BY NAME (the silent-garble risk the two-sided method exists to
prevent).

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
- 0 symbol dictionary (§7.4.3) — arithmetic, SDHUFF=0 SDREFAGG=0
  template 0; referred dictionaries contribute input symbols
- 4/6/7 text regions (§7.4.4) — arithmetic, non-transposed; symbols
  resolve through the referred-to segment numbers
- 16 pattern dictionary (§7.4.4) and 20/22/23 halftone regions
  (§7.4.5) — arithmetic, template 0, patterns resolve through the
  referred-to segment numbers
- 49/50/51 end-of-page / end-of-stripe / end-of-file — frame no-ops
- 62 extension — skipped (spec: decoders may ignore)

A /JBIG2Globals stream parses with the same reader first; its symbol
dictionaries (page association 0) feed page-stream text regions — the
PDF arrangement where the font dictionary is shared across pages.

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
    "encode_jbig2_symbol_text",
    "encode_jbig2_symbol_text_huffman",
    "encode_jbig2_halftone",
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


def _decode_generic_bitmap(
    dec, w: int, h: int,
    at: tuple[tuple[int, int], ...], tpgdon: bool,
) -> list[bytes]:
    """Template-0 generic bitmap decode over an EXISTING MQ decoder —
    the shared core under standalone generic regions AND the symbol
    dictionary's per-symbol bitmaps (which share one decoder + one GB
    context array across the whole segment, T.88 §6.5.8.2.1)."""
    tmpl = _template0(at)
    zero = [0] * (w + 2 * _PAD)
    rows: list[list[int]] = []
    ltp = 0
    for y in range(h):
        if dec.pad_byteins > _MAX_PAD_BYTEINS:
            # a correct stream's tail resolves in the few register
            # bits the flush leaves; hundreds of pad feeds mean a
            # mutated size field is making us decode a whole bitmap
            # from NOTHING — minutes of MQ work inside the pixel
            # gates (fuzz near-hang class)
            raise Jbig2Error(
                "JBIG2 bitmap decodes from exhausted data — corrupt "
                "size field")
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


def _decode_generic_region_arith(
    data: bytes, w: int, h: int,
    at: tuple[tuple[int, int], ...], tpgdon: bool,
) -> list[bytes]:
    """MMR=0 generic region, template 0 → rows of 0/1 bytes."""
    from verified_sources_spark.llm.mq_coder import MQDecoder

    return _decode_generic_bitmap(
        MQDecoder(data, 1 << 16), w, h, at, tpgdon)


def _encode_generic_bitmap(
    enc, rows: list[bytes], at: tuple[tuple[int, int], ...],
    tpgdon: bool,
) -> None:
    """Template-0 generic bitmap encode into an EXISTING MQ encoder
    (independent of the decoder's walk; the two meet only at the
    published template/coder definitions)."""
    tmpl = _template0(at)
    w = len(rows[0])
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


def _encode_generic_region_arith(
    rows: list[bytes], at: tuple[tuple[int, int], ...], tpgdon: bool,
) -> bytes:
    from verified_sources_spark.llm.mq_coder import MQEncoder

    enc = MQEncoder(1 << 16)
    _encode_generic_bitmap(enc, rows, at, tpgdon)
    return enc.flush()


# ----------------------------------------- arithmetic integer layer
# T.88 Annex A: each integer procedure (IADH, IADW, ...) owns a
# 512-entry adaptive context tree driven through the SAME MQ coder as
# the bitmap contexts; IAID is a SYMCODELEN-deep binary tree.  The
# procedures below share one coder instance via disjoint context
# bases: GB template contexts at [0, 2^16), the nine integer trees
# after, the IAID tree last (sized per text region).
_INT_PROCS = ("IADH", "IADW", "IAEX", "IAAI", "IADT", "IAFS",
              "IADS", "IAIT", "IARI")
_INT_BASE = {p: (1 << 16) + i * 512 for i, p in enumerate(_INT_PROCS)}
_IAID_BASE = (1 << 16) + len(_INT_PROCS) * 512


def _ctx_total(code_len: int = 0) -> int:
    return _IAID_BASE + (1 << (code_len + 1))


def _decode_int(dec, proc: str) -> int | None:
    """T.88 A.2 integer decoding: sign bit, unary-ish range prefix,
    MSB-first value bits, every bit refining the PREV context walk.
    Returns None for OOB (sign=1, value=0)."""
    base = _INT_BASE[proc]
    prev = 1

    def bit() -> int:
        nonlocal prev
        b = dec.decode(base + prev)
        prev = ((prev << 1) | b) if prev < 256 \
            else ((((prev << 1) | b) & 511) | 256)
        return b

    def bits(n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | bit()
        return v

    s = bit()
    if not bit():
        v = bits(2)
    elif not bit():
        v = bits(4) + 4
    elif not bit():
        v = bits(6) + 20
    elif not bit():
        v = bits(8) + 84
    elif not bit():
        v = bits(12) + 340
    else:
        v = bits(32) + 4436
    if s:
        return -v if v else None  # sign with zero magnitude = OOB
    return v


def _encode_int(enc, proc: str, value: int | None) -> None:
    """Mirror of :func:`_decode_int` (fixture side); ``None`` encodes
    the OOB word."""
    base = _INT_BASE[proc]
    prev = 1

    def bit(b: int) -> None:
        nonlocal prev
        enc.encode(base + prev, b)
        prev = ((prev << 1) | b) if prev < 256 \
            else ((((prev << 1) | b) & 511) | 256)

    def bits(v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            bit((v >> i) & 1)

    if value is None:
        bit(1)
        bit(0)
        bits(0, 2)
        return
    v = abs(value)
    bit(1 if value < 0 else 0)
    if v < 4:
        bit(0)
        bits(v, 2)
    elif v < 20:
        bit(1), bit(0)
        bits(v - 4, 4)
    elif v < 84:
        bit(1), bit(1), bit(0)
        bits(v - 20, 6)
    elif v < 340:
        bit(1), bit(1), bit(1), bit(0)
        bits(v - 84, 8)
    elif v < 4436:
        bit(1), bit(1), bit(1), bit(1), bit(0)
        bits(v - 340, 12)
    else:
        bit(1), bit(1), bit(1), bit(1), bit(1)
        bits(v - 4436, 32)


def _decode_iaid(dec, code_len: int) -> int:
    """T.88 A.3: walk the SYMCODELEN-deep context tree; the PREV
    accumulator IS the coded value plus the 2^len sentinel."""
    prev = 1
    for _ in range(code_len):
        prev = (prev << 1) | dec.decode(_IAID_BASE + prev)
    return prev - (1 << code_len)


def _encode_iaid(enc, code_len: int, value: int) -> None:
    prev = 1
    v = value + (1 << code_len)
    for i in range(code_len - 1, -1, -1):
        b = (v >> i) & 1
        enc.encode(_IAID_BASE + prev, b)
        prev = (prev << 1) | b



# --------------------------------------- standard Huffman layer (Annex B)
# T.88 Annex B: integer values coded as a prefix code (PREFLEN bits,
# assigned canonically per B.3) followed by RANGELEN raw bits offset
# from RANGELOW; a "lower" line subtracts a 32-bit suffix, an "upper"
# line adds one, and OOB is a bare prefix.  The STANDARD tables
# B.1-B.13 below are transcribed from the published spec (the same
# posture as the T.88 Qe table in llm/mq_coder).  Transcription
# cross-check, asserted at import: every shipped table's canonical
# assignment must be a COMPLETE prefix code (Kraft sum exactly 1 and
# no code overflowing its length) — the published standard tables are
# all complete, and a random transcription error almost never
# preserves that.  Two tables whose transcription FAILED that
# cross-check are not shipped (B.7 / B.10, the alternate text-region
# FS/DS selectors); streams selecting them refuse by name — the same
# honest posture as generic-region templates 1-3.  B.14/B.15 serve
# only refinement deltas, which refuse by name anyway.

_HUFF_STANDARD: dict[int, tuple] = {
    1: ((1, 4, 0), (2, 8, 16), (3, 16, 272), (3, 32, 65808, "upper")),
    2: ((1, 0, 0), (2, 0, 1), (3, 0, 2), (4, 3, 3), (5, 6, 11),
        (6, 32, 75, "upper"), (6, 0, 0, "oob")),
    3: ((8, 8, -256), (1, 0, 0), (2, 0, 1), (3, 0, 2), (4, 3, 3),
        (5, 6, 11), (8, 32, -257, "lower"), (7, 32, 75, "upper"),
        (6, 0, 0, "oob")),
    4: ((1, 0, 1), (2, 0, 2), (3, 0, 3), (4, 3, 4), (5, 6, 12),
        (5, 32, 76, "upper")),
    5: ((7, 8, -255), (1, 0, 1), (2, 0, 2), (3, 0, 3), (4, 3, 4),
        (5, 6, 12), (7, 32, -256, "lower"), (6, 32, 76, "upper")),
    6: ((5, 10, -2048), (4, 9, -1024), (4, 8, -512), (4, 7, -256),
        (5, 6, -128), (5, 5, -64), (4, 5, -32), (2, 7, 0),
        (3, 7, 128), (3, 8, 256), (4, 9, 512), (4, 10, 1024),
        (6, 32, -2049, "lower"), (6, 32, 2048, "upper")),
    8: ((8, 3, -15), (9, 1, -7), (8, 1, -5), (9, 0, -3), (7, 0, -2),
        (4, 0, -1), (2, 1, 0), (5, 0, 2), (6, 0, 3), (3, 4, 4),
        (6, 1, 20), (4, 4, 22), (4, 5, 38), (5, 6, 70), (5, 7, 134),
        (6, 7, 262), (7, 8, 390), (6, 10, 646),
        (9, 32, -16, "lower"), (9, 32, 1670, "upper"),
        (2, 0, 0, "oob")),
    9: ((8, 4, -31), (9, 2, -15), (8, 2, -11), (9, 1, -7), (7, 1, -5),
        (4, 1, -3), (3, 1, -1), (3, 1, 1), (5, 1, 3), (6, 1, 5),
        (3, 5, 7), (6, 2, 39), (4, 5, 43), (4, 6, 75), (5, 7, 139),
        (5, 8, 267), (6, 8, 523), (7, 9, 779), (6, 11, 1291),
        (9, 32, -32, "lower"), (9, 32, 3339, "upper"),
        (2, 0, 0, "oob")),
    11: ((1, 0, 1), (2, 1, 2), (4, 0, 4), (4, 1, 5), (5, 1, 7),
         (5, 2, 9), (6, 2, 13), (7, 2, 17), (7, 3, 21), (7, 4, 29),
         (7, 5, 45), (7, 6, 77), (7, 32, 141, "upper")),
    12: ((1, 0, 1), (2, 0, 2), (3, 1, 3), (5, 0, 5), (5, 1, 6),
         (6, 1, 8), (7, 0, 10), (7, 1, 11), (7, 2, 13), (7, 3, 17),
         (7, 4, 25), (8, 5, 41), (8, 32, 73, "upper")),
    13: ((1, 0, 1), (3, 0, 2), (4, 0, 3), (5, 0, 4), (4, 1, 5),
         (3, 3, 7), (6, 1, 15), (6, 2, 17), (6, 3, 21), (6, 4, 29),
         (6, 5, 45), (7, 6, 77), (7, 32, 141, "upper")),
}

_HUFF_OOB = object()          # decode() sentinel for the OOB prefix


class _HuffTable:
    """Canonical Annex-B table: B.3 code assignment at construction,
    bit-at-a-time decode, range-line encode (the fixture writer)."""

    def __init__(self, lines, name: str = "?"):
        self.name = name
        norm = []
        for ln in lines:
            preflen, rangelen, rangelow = ln[0], ln[1], ln[2]
            kind = ln[3] if len(ln) > 3 else "normal"
            if preflen > 0:
                norm.append((preflen, rangelen, rangelow, kind))
        self.lines = norm
        # B.3: canonical assignment — codes of each length are
        # consecutive, in table order, starting from
        # (firstcode_{L-1} + count_{L-1}) << 1
        maxlen = max(ln[0] for ln in norm)
        count = [0] * (maxlen + 1)
        for ln in norm:
            count[ln[0]] += 1
        self._by_code: dict[tuple[int, int], tuple] = {}
        # per-LINE code, indexed like self.lines (table order) — the
        # assignment walk below visits lines in LENGTH order, so the
        # codes must be stored by line index, not appended
        self._code_of: list[tuple[int, int] | None] = [None] * len(norm)
        firstcode = 0
        kraft = 0.0
        for length in range(1, maxlen + 1):
            firstcode = (firstcode + count[length - 1]) << 1
            cur = firstcode
            for idx, ln in enumerate(norm):
                if ln[0] != length:
                    continue
                if cur >= (1 << length):
                    raise Jbig2Error(
                        f"JBIG2 Huffman table {name}: canonical "
                        f"assignment overflows at length {length} — "
                        "corrupt line set")
                self._by_code[(length, cur)] = ln
                self._code_of[idx] = (length, cur)
                cur += 1
                kraft += 2.0 ** -length
        self.complete = abs(kraft - 1.0) < 1e-12
        self.maxlen = maxlen

    def decode(self, r: "_BitReader"):
        acc = 0
        for length in range(1, self.maxlen + 1):
            acc = (acc << 1) | r.read_bit()
            ln = self._by_code.get((length, acc))
            if ln is None:
                continue
            _pl, rangelen, rangelow, kind = ln
            if kind == "oob":
                return _HUFF_OOB
            if kind == "lower":
                return rangelow - r.read_bits(32)
            if kind == "upper":
                return rangelow + r.read_bits(32)
            return rangelow + r.read_bits(rangelen)
        raise Jbig2Error(
            f"JBIG2 Huffman table {self.name}: no code matches — "
            "corrupt stream")

    def encode(self, w: "_BitWriter", value) -> None:
        for (preflen, rangelen, rangelow, kind), (length, code) in zip(
                self.lines, self._code_of):
            if kind == "oob":
                if value is None:
                    w.write_bits(code, length)
                    return
                continue
            if value is None:
                continue
            if kind == "lower" and value <= rangelow:
                w.write_bits(code, length)
                w.write_bits(rangelow - value, 32)
                return
            if kind == "upper" and value >= rangelow:
                w.write_bits(code, length)
                w.write_bits(value - rangelow, 32)
                return
            if kind == "normal" and \
                    rangelow <= value < rangelow + (1 << rangelen):
                w.write_bits(code, length)
                w.write_bits(value - rangelow, rangelen)
                return
        raise Jbig2Error(
            f"JBIG2 Huffman table {self.name} cannot represent "
            f"{value!r}")


def _std_table(number: int, what: str) -> _HuffTable:
    lines = _HUFF_STANDARD.get(number)
    if lines is None:
        raise Jbig2Error(
            f"JBIG2 standard Huffman table B.{number} ({what}) — "
            "refusing by name (transcription failed the completeness "
            "cross-check; not shipped)")
    return _HuffTable(lines, f"B.{number}")


def _next_custom(pool: list, what: str) -> "_HuffTable":
    """§7.4.3.1.6 / §7.4.4.1.4: each custom-table selector consumes
    the NEXT referred-to table segment, in selector field order."""
    if not pool:
        raise Jbig2Error(
            f"JBIG2 {what} custom-table selector with no referred "
            "table segment left — corrupt stream")
    return pool.pop(0)


def _assert_standard_tables_complete() -> None:
    """Import-time transcription cross-check: every shipped standard
    table must assign a COMPLETE canonical prefix code (Kraft sum 1,
    no overflow) — true of all published Annex-B tables, and almost
    never true of a mis-transcribed one."""
    for num, lines in _HUFF_STANDARD.items():
        t = _HuffTable(lines, f"B.{num}")
        if not t.complete:
            raise AssertionError(
                f"standard table B.{num} transcription is not a "
                "complete prefix code")


_assert_standard_tables_complete()


class _BitReader:
    """MSB-first bit reader over segment data (the Annex-B side of the
    house; the MQ coder owns the arithmetic side)."""

    def __init__(self, data: bytes):
        self.data = data
        self.bytepos = 0
        self.bitpos = 0

    def read_bit(self) -> int:
        if self.bytepos >= len(self.data):
            raise Jbig2Error("JBIG2 Huffman data exhausted")
        b = (self.data[self.bytepos] >> (7 - self.bitpos)) & 1
        self.bitpos += 1
        if self.bitpos == 8:
            self.bitpos = 0
            self.bytepos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self) -> None:
        if self.bitpos:
            self.bitpos = 0
            self.bytepos += 1

    def take_bytes(self, n: int) -> bytes:
        """n raw bytes from the current (must-be-aligned) position."""
        if self.bitpos:
            raise Jbig2Error("JBIG2 raw read at unaligned bit position")
        if self.bytepos + n > len(self.data):
            raise Jbig2Error("truncated JBIG2 Huffman segment data")
        out = self.data[self.bytepos:self.bytepos + n]
        self.bytepos += n
        return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write_bits(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def byte_align(self) -> None:
        if self.nbits:
            self.acc <<= 8 - self.nbits
            self.out.append(self.acc)
            self.acc = 0
            self.nbits = 0

    def write_bytes(self, data: bytes) -> None:
        if self.nbits:
            raise Jbig2Error("unaligned raw byte write")
        self.out += data

    def getvalue(self) -> bytes:
        self.byte_align()
        return bytes(self.out)


def _unpack_bitmap_rows(data: bytes, width: int, height: int):
    """Uncompressed collective bitmap (BMSIZE=0, §6.5.9): rows padded
    to byte boundaries, MSB-first, 1 = black."""
    stride = (width + 7) // 8
    if len(data) < stride * height:
        raise Jbig2Error("truncated uncompressed collective bitmap")
    rows = []
    for y in range(height):
        base = y * stride
        row = bytearray(width)
        for x in range(width):
            row[x] = (data[base + (x >> 3)] >> (7 - (x & 7))) & 1
        rows.append(bytes(row))
    return rows


def _pack_bitmap_rows(rows) -> bytes:
    width = len(rows[0]) if rows else 0
    stride = (width + 7) // 8
    out = bytearray()
    for row in rows:
        packed = bytearray(stride)
        for x, v in enumerate(row):
            if v:
                packed[x >> 3] |= 0x80 >> (x & 7)
        out += packed
    return bytes(out)


# --------------------------------------- custom table segments (§B.2)

_MAX_TABLE_LINES = 4096    # every published table has < 32 lines
_MAX_TABLE_PREFLEN = 32    # canonical codes past 32 bits are garble


def _parse_table_segment(d: bytes, name: str = "custom") -> _HuffTable:
    """Custom Huffman table segment data (T.88 §7.4.13 / §B.2): a
    SELF-DESCRIBING table — one flags byte (bit 0 HTOOB, bits 1-3
    HTPS-1, bits 4-6 HTRS-1), the signed 32-bit value span
    [HTLOW, HTHIGH), then one (PREFLEN, RANGELEN) pair per range line
    walking HTLOW upward in 2^RANGELEN steps, the 32-bit LOWER and
    UPPER escape lines, and an OOB prefix length when HTOOB=1.
    PREFLEN 0 marks an unused line (§B.3), so tables without a lower
    escape or OOB entry encode naturally.  The parsed lines feed the
    SAME §B.3 canonical-assignment constructor the standard tables go
    through — the layer that is codeword-pinned against the published
    B.1/B.4 assignments — so this reader adds only the §B.2 framing,
    which the tests cross-check by re-encoding every shipped standard
    table as a segment and requiring line- and codeword-identical
    parses.  Gates: prefix/range lengths over 32 and line counts over
    4096 refuse as corrupt (every published table is tiny)."""
    if len(d) < 9:
        raise Jbig2Error("truncated JBIG2 table segment")
    flags = d[0]
    if flags & 0x80:
        raise Jbig2Error(
            "JBIG2 table segment with the reserved flag bit set")
    htoob = flags & 0x01
    htps = ((flags >> 1) & 0x07) + 1
    htrs = ((flags >> 4) & 0x07) + 1
    htlow, hthigh = struct.unpack_from(">ii", d, 1)
    if hthigh <= htlow:
        raise Jbig2Error(
            f"JBIG2 table segment value span [{htlow}, {hthigh}) "
            "is empty")
    r = _BitReader(d[9:])
    lines: list = []
    cur = htlow
    while cur < hthigh:
        if len(lines) >= _MAX_TABLE_LINES:
            raise Jbig2Error(
                "JBIG2 table segment declares an absurd number of "
                "range lines — corrupt stream")
        preflen = r.read_bits(htps)
        rangelen = r.read_bits(htrs)
        if preflen > _MAX_TABLE_PREFLEN:
            raise Jbig2Error(
                f"JBIG2 table segment prefix length {preflen} over "
                "gate — corrupt stream")
        if rangelen > 32:
            raise Jbig2Error(
                f"JBIG2 table segment range length {rangelen} over "
                "gate — corrupt stream")
        lines.append((preflen, rangelen, cur))
        cur += 1 << rangelen
    low_pl = r.read_bits(htps)
    up_pl = r.read_bits(htps)
    if max(low_pl, up_pl) > _MAX_TABLE_PREFLEN:
        raise Jbig2Error(
            "JBIG2 table segment escape prefix length over gate — "
            "corrupt stream")
    lines.append((low_pl, 32, htlow - 1, "lower"))
    lines.append((up_pl, 32, hthigh, "upper"))
    if htoob:
        oob_pl = r.read_bits(htps)
        if oob_pl > _MAX_TABLE_PREFLEN:
            raise Jbig2Error(
                "JBIG2 table segment OOB prefix length over gate — "
                "corrupt stream")
        lines.append((oob_pl, 0, 0, "oob"))
    if all(ln[0] == 0 for ln in lines):
        raise Jbig2Error(
            "JBIG2 table segment with every prefix length zero")
    return _HuffTable(lines, name)


def _encode_table_segment_body(lines, name: str = "custom") -> bytes:
    """§B.2 inverse — the fixture writer.  ``lines`` in the
    ``_HUFF_STANDARD`` tuple form: normal lines must tile a
    contiguous ascending span (true of every published table and any
    table expressible in the segment form); lower/OOB lines are
    optional (encoded as PREFLEN 0 / HTOOB 0)."""
    normals = [ln for ln in lines if len(ln) < 4 or ln[3] == "normal"]
    escapes = {ln[3]: ln for ln in lines
               if len(ln) > 3 and ln[3] != "normal"}
    if not normals or "upper" not in escapes:
        raise Jbig2Error(
            "table segment fixture needs range lines and an upper "
            "escape")
    htlow = normals[0][2]
    cur = htlow
    for preflen, rangelen, rangelow, *_ in normals:
        if rangelow != cur:
            raise Jbig2Error(
                "table segment fixture lines must tile a contiguous "
                f"span (expected {cur}, got {rangelow})")
        cur += 1 << rangelen
    hthigh = cur
    if escapes["upper"][2] != hthigh:
        raise Jbig2Error(
            "table segment fixture upper escape must start at HTHIGH")
    if "lower" in escapes and escapes["lower"][2] != htlow - 1:
        raise Jbig2Error(
            "table segment fixture lower escape must sit at HTLOW-1")
    low_pl = escapes["lower"][0] if "lower" in escapes else 0
    up_pl = escapes["upper"][0]
    oob_pl = escapes["oob"][0] if "oob" in escapes else None
    htps = max(pl.bit_length() for pl in
               [low_pl, up_pl, oob_pl or 0]
               + [ln[0] for ln in normals]) or 1
    htrs = max([ln[1] for ln in normals], default=0).bit_length() or 1
    if htps > 8 or htrs > 8:
        raise Jbig2Error("table segment fixture field widths over 8")
    w = _BitWriter()
    for preflen, rangelen, _rl, *_ in normals:
        w.write_bits(preflen, htps)
        w.write_bits(rangelen, htrs)
    w.write_bits(low_pl, htps)
    w.write_bits(up_pl, htps)
    if oob_pl is not None:
        w.write_bits(oob_pl, htps)
    flags = ((1 if oob_pl is not None else 0)
             | ((htps - 1) << 1) | ((htrs - 1) << 4))
    return (bytes([flags]) + struct.pack(">ii", htlow, hthigh)
            + w.getvalue())


# ------------------------------------- symbol dictionary / text region

_MAX_PAD_BYTEINS = 64   # legit flush tails use a handful; see mq_coder
_MAX_SYM_DIM = 10_000        # one glyph larger than a page is garble
_MAX_SYM_PIXELS = 1 << 22
_MAX_SYMS = 1 << 16


def _be16(d: bytes, pos: int) -> int:
    if pos + 2 > len(d):
        raise Jbig2Error("truncated JBIG2 segment data")
    return struct.unpack_from(">H", d, pos)[0]


def _decode_symbol_dictionary(d: bytes,
                              input_syms: list,
                              custom_tables=()) -> list:
    """Symbol dictionary segment data (T.88 §6.5 / §7.4.3): the
    arithmetic non-refinement path (SDHUFF=0, SDREFAGG=0, template 0
    — what mainstream encoders emit), and (r15) the Huffman path
    (SDHUFF=1 with Annex-B standard tables or referred CUSTOM table
    segments).  Arithmetic: height classes via IADH, per-symbol width
    deltas via IADW (OOB ends a class), bitmaps through ONE shared MQ
    decoder + GB context array, export runs via IAEX over input+new
    symbols.  Returns the exported bitmaps."""
    flags = _be16(d, 0)
    if flags & 0x01:
        return _decode_symbol_dictionary_huffman(
            d, input_syms, flags, custom_tables)
    if flags & 0x02:
        raise Jbig2Error("JBIG2 refinement/aggregate symbol coding — "
                         "refusing by name")
    if flags & 0x100 or flags & 0x200:
        raise Jbig2Error("JBIG2 retained/imported coding contexts — "
                         "refusing by name")
    template = (flags >> 10) & 0x03
    if template != 0:
        raise Jbig2Error(
            f"JBIG2 symbol dictionary template {template} — "
            "refusing by name (only template 0 served)")
    if len(d) < 18:
        raise Jbig2Error("truncated JBIG2 symbol dictionary")
    at = tuple(
        (struct.unpack_from("b", d, 2 + 2 * i)[0],
         struct.unpack_from("b", d, 3 + 2 * i)[0])
        for i in range(4))
    numex = _u32(d, 10)
    numnew = _u32(d, 14)
    if numnew > _MAX_SYMS or numex > _MAX_SYMS:
        raise Jbig2Error(
            f"JBIG2 symbol dictionary declares {numnew} new / "
            f"{numex} exported symbols — over gate")
    if numex > len(input_syms) + numnew:
        raise Jbig2Error(
            "JBIG2 symbol dictionary exports more symbols than exist")
    from verified_sources_spark.llm.mq_coder import MQDecoder

    dec = MQDecoder(d[18:], _ctx_total())
    syms: list = []
    hcheight = 0
    total_px = 0
    classes = 0
    while len(syms) < numnew:
        classes += 1
        if classes > 2 * numnew + 8:
            raise Jbig2Error(
                "JBIG2 symbol dictionary height-class walk does not "
                "converge — corrupt stream")
        dh = _decode_int(dec, "IADH")
        if dh is None:
            raise Jbig2Error("OOB height delta in symbol dictionary")
        hcheight += dh
        if not 0 < hcheight <= _MAX_SYM_DIM:
            raise Jbig2Error(
                f"JBIG2 symbol height {hcheight} out of range")
        symwidth = 0
        while True:
            dw = _decode_int(dec, "IADW")
            if dw is None:
                break  # end of this height class
            symwidth += dw
            if not 0 < symwidth <= _MAX_SYM_DIM:
                raise Jbig2Error(
                    f"JBIG2 symbol width {symwidth} out of range")
            if len(syms) >= numnew:
                raise Jbig2Error(
                    "JBIG2 symbol dictionary decodes more symbols "
                    "than declared")
            if symwidth * hcheight > _MAX_SYM_PIXELS:
                raise Jbig2Error("JBIG2 symbol over pixel gate")
            total_px += symwidth * hcheight
            if total_px > _MAX_PIXELS:
                raise Jbig2Error(
                    "JBIG2 symbol dictionary over total pixel gate")
            if dec.pad_byteins > _MAX_PAD_BYTEINS:
                # legit low-entropy tails resolve from the flushed
                # register at near-zero pad consumption (an MPS
                # decision renormalizes ~never), so several trailing
                # symbols MAY legitimately start after exhaustion —
                # but fabricated structure chews pad FEEDS fast.  The
                # cumulative feed gate bounds decode-from-nothing
                # work without refusing real low-entropy streams
                # (self-review find; the bitmap decoder applies the
                # same gate per row)
                raise Jbig2Error(
                    "JBIG2 symbol dictionary decodes from exhausted "
                    "data — corrupt symbol count")
            syms.append(_decode_generic_bitmap(
                dec, symwidth, hcheight, at, False))
    # export flags: alternating no-export/export run lengths (§6.5.10)
    allsyms = list(input_syms) + syms
    ex_flags: list[int] = []
    ex = 0
    runs = 0
    while len(ex_flags) < len(allsyms):
        runs += 1
        if runs > 2 * len(allsyms) + 4:
            raise Jbig2Error(
                "JBIG2 export-flag walk does not converge")
        run = _decode_int(dec, "IAEX")
        if run is None or run < 0:
            raise Jbig2Error("bad export run length in dictionary")
        if len(ex_flags) + run > len(allsyms):
            raise Jbig2Error("JBIG2 export run overruns symbol count")
        ex_flags.extend([ex] * run)
        ex ^= 1
    exported = [s for s, f in zip(allsyms, ex_flags) if f]
    if len(exported) != numex:
        raise Jbig2Error(
            f"JBIG2 dictionary exported {len(exported)} symbols, "
            f"declared {numex}")
    return exported


def _decode_symbol_dictionary_huffman(d: bytes, input_syms: list,
                                      flags: int,
                                      custom_tables=()) -> list:
    """SDHUFF=1 symbol dictionary (T.88 §6.5.9 / §7.4.3): DH/DW via
    standard tables B.4-B.5 / B.2-B.3 or CUSTOM table segments
    (selector 3 / the BMSIZE bit consume the referred-to table
    segments in §7.4.3.1.6 field order), per-height-class COLLECTIVE
    bitmaps sized by B.1 or a custom table — BMSIZE=0 means
    uncompressed byte-aligned rows, otherwise the MMR (T.6) coder
    this repo already carries libtiff-verified (llm/fax_codec) — and
    export runs via B.1.  Refinement/aggregate coding and retained
    contexts refuse by name.  No AT pixels in this header form
    (§7.4.3.1.2: present only when SDHUFF=0)."""
    if flags & 0x02:
        raise Jbig2Error("JBIG2 refinement/aggregate symbol coding — "
                         "refusing by name")
    if flags & 0x100 or flags & 0x200:
        raise Jbig2Error("JBIG2 retained/imported coding contexts — "
                         "refusing by name")
    pool = list(custom_tables)
    dh_sel = (flags >> 2) & 0x03
    dw_sel = (flags >> 4) & 0x03
    if dh_sel == 2:
        raise Jbig2Error(
            "JBIG2 reserved SDHUFFDH table selector — corrupt stream")
    if dw_sel == 2:
        raise Jbig2Error(
            "JBIG2 reserved SDHUFFDW table selector — corrupt stream")
    # §7.4.3.1.6: custom selectors consume the referred-to table
    # segments in field order — DH, DW, BMSIZE, AGGINST
    if dh_sel == 3:
        tab_dh = _next_custom(pool, "SDHUFFDH")
    else:
        tab_dh = _std_table(4 if dh_sel == 0 else 5, "SDHUFFDH")
    if dw_sel == 3:
        tab_dw = _next_custom(pool, "SDHUFFDW")
    else:
        tab_dw = _std_table(2 if dw_sel == 0 else 3, "SDHUFFDW")
    if flags & 0x40:
        tab_bm = _next_custom(pool, "SDHUFFBMSIZE")
    else:
        tab_bm = _std_table(1, "SDHUFFBMSIZE")
    if flags & 0x80:
        _next_custom(pool, "SDHUFFAGGINST")   # consumed, unused:
        # aggregate coding (the only consumer) refused above
    tab_ex = _std_table(1, "EX runs")
    if len(d) < 10:
        raise Jbig2Error("truncated JBIG2 symbol dictionary")
    numex = _u32(d, 2)
    numnew = _u32(d, 6)
    if numnew > _MAX_SYMS or numex > _MAX_SYMS:
        raise Jbig2Error(
            f"JBIG2 symbol dictionary declares {numnew} new / "
            f"{numex} exported symbols — over gate")
    if numex > len(input_syms) + numnew:
        raise Jbig2Error(
            "JBIG2 symbol dictionary exports more symbols than exist")
    r = _BitReader(d[10:])
    syms: list = []
    hcheight = 0
    total_px = 0
    classes = 0
    while len(syms) < numnew:
        classes += 1
        if classes > 2 * numnew + 8:
            raise Jbig2Error(
                "JBIG2 symbol dictionary height-class walk does not "
                "converge — corrupt stream")
        dh = tab_dh.decode(r)
        if dh is _HUFF_OOB:
            raise Jbig2Error("OOB height delta in symbol dictionary")
        hcheight += dh
        if not 0 < hcheight <= _MAX_SYM_DIM:
            raise Jbig2Error(
                f"JBIG2 symbol height {hcheight} out of range")
        symwidth = 0
        totwidth = 0
        widths: list[int] = []
        while True:
            dw = tab_dw.decode(r)
            if dw is _HUFF_OOB:
                break  # end of this height class
            symwidth += dw
            if not 0 < symwidth <= _MAX_SYM_DIM:
                raise Jbig2Error(
                    f"JBIG2 symbol width {symwidth} out of range")
            if len(syms) + len(widths) >= numnew:
                raise Jbig2Error(
                    "JBIG2 symbol dictionary decodes more symbols "
                    "than declared")
            if symwidth * hcheight > _MAX_SYM_PIXELS:
                raise Jbig2Error("JBIG2 symbol over pixel gate")
            total_px += symwidth * hcheight
            if total_px > _MAX_PIXELS:
                raise Jbig2Error(
                    "JBIG2 symbol dictionary over total pixel gate")
            widths.append(symwidth)
            totwidth += symwidth
        # §6.5.9: the height class's symbols ride ONE collective
        # bitmap, byte-aligned, uncompressed (BMSIZE=0) or MMR.
        # BMSIZE is coded for EVERY height class — skipping it for an
        # empty class (zero widths) would desynchronize the reader
        # against a conforming stream (self-review find)
        bmsize = tab_bm.decode(r)
        if bmsize is _HUFF_OOB or bmsize < 0:
            raise Jbig2Error("bad collective bitmap size")
        r.byte_align()
        if not widths:
            r.take_bytes(bmsize)   # empty class: skip its bitmap data
            continue
        if bmsize == 0:
            stride = (totwidth + 7) // 8
            rows = _unpack_bitmap_rows(
                r.take_bytes(stride * hcheight), totwidth, hcheight)
        else:
            try:
                rows = decode_g4(r.take_bytes(bmsize), totwidth,
                                 hcheight)
            except FaxError as e:
                raise Jbig2Error(
                    f"bad MMR collective bitmap: {e}") from None
            if len(rows) < hcheight:
                raise Jbig2Error(
                    "MMR collective bitmap shorter than height class")
            rows = rows[:hcheight]
        x = 0
        for wdt in widths:
            syms.append([row[x:x + wdt] for row in rows])
            x += wdt
    # export runs over input+new symbols, via Table B.1 (§6.5.10)
    allsyms = list(input_syms) + syms
    ex_flags: list[int] = []
    ex = 0
    runs = 0
    while len(ex_flags) < len(allsyms):
        runs += 1
        if runs > 2 * len(allsyms) + 4:
            raise Jbig2Error(
                "JBIG2 export-flag walk does not converge")
        run = tab_ex.decode(r)
        if run is _HUFF_OOB or run < 0:
            raise Jbig2Error("bad export run length in dictionary")
        if len(ex_flags) + run > len(allsyms):
            raise Jbig2Error("JBIG2 export run overruns symbol count")
        ex_flags.extend([ex] * run)
        ex ^= 1
    exported = [s for s, f in zip(allsyms, ex_flags) if f]
    if len(exported) != numex:
        raise Jbig2Error(
            f"JBIG2 dictionary exported {len(exported)} symbols, "
            f"declared {numex}")
    return exported


def _decode_text_region(d: bytes, syms: list, custom_tables=()):
    """Text region segment data (T.88 §6.4 / §7.4.4), non-refinement
    non-transposed: the ARITHMETIC path (strip walk via IADT/IAFS/
    IADS/IAIT, symbol IDs via the IAID tree) and (r15) the HUFFMAN
    path (SBHUFF=1, Annex-B standard tables or referred CUSTOM table
    segments + the §7.4.4.1.7 runcode-coded symbol-ID table).
    Placement by REFCORNER and per-instance SBCOMBOP composition are
    shared (_text_region_walk).  Returns (region info, rows)."""
    w, h, x, y, op = _region_info(d)
    flags = _be16(d, 17)
    huffman = bool(flags & 0x01)
    if flags & 0x02:
        raise Jbig2Error("JBIG2 text region with refinement — "
                         "refusing by name")
    if flags & 0x40:
        raise Jbig2Error("JBIG2 transposed text region — refusing by "
                         "name (row/column-swapped placement unserved)")
    log_strips = (flags >> 2) & 0x03
    refcorner = (flags >> 4) & 0x03
    combop = (flags >> 7) & 0x03
    defpixel = (flags >> 9) & 0x01
    dsoffset = (flags >> 10) & 0x1F
    if dsoffset > 15:
        dsoffset -= 32
    body_at = 25 if huffman else 23
    if len(d) < body_at:
        raise Jbig2Error("truncated JBIG2 text region")
    numinst = _u32(d, 21 if huffman else 19)
    if not syms:
        raise Jbig2Error(
            "JBIG2 text region with no symbols in scope — referred "
            "dictionaries exported nothing")
    if numinst > _MAX_PIXELS:
        raise Jbig2Error("JBIG2 text region instance count over gate")
    if w * h > _MAX_PIXELS:
        raise Jbig2Error(f"JBIG2 text region {w}x{h} over pixel gate")
    strips = 1 << log_strips
    if huffman:
        (next_dt, next_fs, next_ds, next_curt, next_sid,
         pad_work) = _huffman_text_sources(
            d, _be16(d, 19), body_at, syms, log_strips,
            custom_tables)
    else:
        (next_dt, next_fs, next_ds, next_curt, next_sid,
         pad_work) = _arith_text_sources(d, body_at, syms, strips)
    rows = _text_region_walk(
        w, h, numinst, syms, strips, refcorner, combop, defpixel,
        dsoffset, next_dt, next_fs, next_ds, next_curt, next_sid,
        pad_work)
    return w, h, x, y, op, rows


def _arith_text_sources(d: bytes, body_at: int, syms: list,
                        strips: int):
    """The five integer sources of the arithmetic text-region walk."""
    code_len = max(1, (len(syms) - 1).bit_length())
    from verified_sources_spark.llm.mq_coder import MQDecoder

    dec = MQDecoder(d[body_at:], _ctx_total(code_len))
    return (lambda what: _req_int(dec, "IADT", what),
            lambda: _req_int(dec, "IAFS", "first S"),
            lambda: _decode_int(dec, "IADS"),
            lambda: _req_int(dec, "IAIT", "T offset"),
            lambda: _decode_iaid(dec, code_len),
            lambda: dec.pad_byteins > _MAX_PAD_BYTEINS)


def _huffman_text_sources(d: bytes, huffflags: int, body_at: int,
                          syms: list, log_strips: int,
                          custom_tables=()):
    """The five integer sources of the SBHUFF=1 walk (§7.4.4.1):
    FS/DS/DT through the flag-selected standard tables or referred
    CUSTOM table segments (selector 3 consumes them in §7.4.4.1.4
    field order), CURT as LOGSBSTRIPS raw bits, symbol IDs through
    the runcode-built per-region Huffman table (§7.4.4.1.7)."""
    pool = list(custom_tables)
    fs_sel = huffflags & 0x03
    ds_sel = (huffflags >> 2) & 0x03
    dt_sel = (huffflags >> 4) & 0x03
    if fs_sel == 2:
        raise Jbig2Error(
            "JBIG2 reserved SBHUFFFS table selector — corrupt stream")
    if fs_sel == 3:
        tab_fs = _next_custom(pool, "SBHUFFFS")
    else:
        tab_fs = _std_table(6 if fs_sel == 0 else 7, "SBHUFFFS")
    if ds_sel == 3:
        tab_ds = _next_custom(pool, "SBHUFFDS")
    else:
        tab_ds = _std_table((8, 9, 10)[ds_sel], "SBHUFFDS")
    if dt_sel == 3:
        tab_dt = _next_custom(pool, "SBHUFFDT")
    else:
        tab_dt = _std_table((11, 12, 13)[dt_sel], "SBHUFFDT")
    r = _BitReader(d[body_at:])
    # §7.4.4.1.7: 35 runcode lengths (4 bits each) → runcode prefix
    # code → SBNUMSYMS symbol-code lengths (32/33/34 are repeats) →
    # the per-region symbol-ID table; byte-aligned afterwards
    runlens = [r.read_bits(4) for _ in range(35)]
    runlines = [(ln, 0, i) for i, ln in enumerate(runlens) if ln > 0]
    if not runlines:
        raise Jbig2Error("JBIG2 symbol-ID runcode table is empty")
    runtab = _HuffTable(runlines, "runcodes")
    lengths: list[int] = []
    prevlen = 0
    while len(lengths) < len(syms):
        code = runtab.decode(r)
        if code is _HUFF_OOB:
            raise Jbig2Error("OOB runcode in symbol-ID code lengths")
        if code < 32:
            lengths.append(code)
            prevlen = code
        elif code == 32:
            if not lengths:
                raise Jbig2Error(
                    "runcode 32 (repeat previous) as first code")
            rep = 3 + r.read_bits(2)
            lengths.extend([prevlen] * rep)
        elif code == 33:
            lengths.extend([0] * (3 + r.read_bits(3)))
        else:  # 34
            lengths.extend([0] * (11 + r.read_bits(7)))
    if len(lengths) != len(syms):
        raise Jbig2Error(
            "symbol-ID code lengths overrun the symbol count")
    sym_lines = [(ln, 0, i) for i, ln in enumerate(lengths) if ln > 0]
    if not sym_lines:
        raise Jbig2Error("every symbol-ID code length is zero")
    symtab = _HuffTable(sym_lines, "symbol IDs")
    r.byte_align()

    def next_dt(_what: str) -> int:
        v = tab_dt.decode(r)
        if v is _HUFF_OOB:
            raise Jbig2Error("OOB strip T delta")
        return v

    def next_fs() -> int:
        v = tab_fs.decode(r)
        if v is _HUFF_OOB:
            raise Jbig2Error("OOB first S")
        return v

    def next_ds():
        v = tab_ds.decode(r)
        return None if v is _HUFF_OOB else v

    def next_curt() -> int:
        return r.read_bits(log_strips)

    def next_sid() -> int:
        v = symtab.decode(r)
        if v is _HUFF_OOB:
            raise Jbig2Error("OOB symbol ID")
        return v

    def pad_work() -> bool:
        # the Huffman reader raises on true exhaustion itself; no
        # pad synthesis exists on this path
        return False

    return next_dt, next_fs, next_ds, next_curt, next_sid, pad_work


def _text_region_walk(w, h, numinst, syms, strips, refcorner, combop,
                      defpixel, dsoffset, next_dt, next_fs, next_ds,
                      next_curt, next_sid, pad_work):
    """§6.4.5 strip walk + placement + composition, shared by the
    arithmetic and Huffman integer sources."""
    bitmap = [bytearray([defpixel] * w) for _ in range(h)]
    painted = 0  # composited-pixel work gate (bomb protection)
    stript = -next_dt("initial strip T")
    firsts = 0
    inst = 0
    strip_rounds = 0
    while inst < numinst:
        strip_rounds += 1
        if strip_rounds > numinst + 8:
            raise Jbig2Error(
                "JBIG2 text region strip walk does not converge")
        stript += next_dt("strip T delta")
        first = True
        curs = 0
        while True:
            if first:
                firsts += next_fs()
                curs = firsts
                first = False
            else:
                ids = next_ds()
                if ids is None:
                    break  # OOB: end of strip
                curs += ids + dsoffset
            if inst >= numinst:
                raise Jbig2Error(
                    "JBIG2 text region decodes more instances than "
                    "declared")
            if pad_work():
                # same rule as the dictionary walk: legit low-entropy
                # tails resolve from the register at near-zero pad
                # consumption, so instances MAY legitimately start
                # after exhaustion — but a mutated instance count
                # fabricating placements chews pad feeds fast; the
                # cumulative gate bounds the work
                raise Jbig2Error(
                    "JBIG2 text region decodes from exhausted data "
                    "— corrupt instance count")
            curt = next_curt() if strips > 1 else 0
            ti = stript * strips + curt
            sid = next_sid()
            if sid >= len(syms):
                raise Jbig2Error(
                    f"JBIG2 symbol id {sid} out of range "
                    f"({len(syms)} symbols)")
            sym = syms[sid]
            sh, sw = len(sym), len(sym[0])
            painted += sw * sh
            if painted > _MAX_PIXELS:
                # MQ coding emits highly-probable instances at well
                # under a bit each, so a few-KB stream can DECLARE
                # astronomic composition work — bound the painted
                # pixels like the allocation gates bound memory
                raise Jbig2Error(
                    "JBIG2 text region composition work exceeds "
                    f"{_MAX_PIXELS}-pixel gate")
            # non-transposed placement: S is the left edge for every
            # REFCORNER (the right-corner pre-advance nets out, T.88
            # §6.4.5 steps vi/viii); TOP corners put T at the top row
            ty = ti if refcorner & 1 else ti - sh + 1
            if curs < 0 or ty < 0 or curs + sw > w or ty + sh > h:
                raise Jbig2Error(
                    f"JBIG2 symbol instance {sw}x{sh}@({curs},{ty}) "
                    f"outside text region {w}x{h}")
            for ry in range(sh):
                dst = bitmap[ty + ry]
                src = sym[ry]
                if combop == 0:
                    for rx in range(sw):
                        dst[curs + rx] |= src[rx]
                elif combop == 1:
                    for rx in range(sw):
                        dst[curs + rx] &= src[rx]
                elif combop == 2:
                    for rx in range(sw):
                        dst[curs + rx] ^= src[rx]
                else:  # XNOR on 0/1 pixels
                    for rx in range(sw):
                        dst[curs + rx] ^= src[rx] ^ 1
            curs += sw - 1
            inst += 1
    return [bytes(r) for r in bitmap]


def _req_int(dec, proc: str, what: str) -> int:
    v = _decode_int(dec, proc)
    if v is None:
        raise Jbig2Error(f"unexpected OOB decoding {what}")
    return v


# ------------------------------------ pattern dictionary / halftone

def _decode_pattern_dictionary(d: bytes) -> list:
    """Pattern dictionary segment data (T.88 §6.7 / §7.4.4): ONE
    collective generic bitmap of width (GRAYMAX+1)×HDPW sliced into
    the GRAYMAX+1 patterns — arithmetic template 0 with the spec's
    A1=(-HDPW, 0) adaptive pixel, or (r15) HDMMR=1 with the single
    collective bitmap T.6-coded through the libtiff-verified fax
    codec (the framing is unambiguous: one bitmap, one MMR stream,
    exactly the generic-region MMR case already served; halftone
    GRAY-PLANE MMR keeps refusing — its inter-plane framing has no
    verifier here)."""
    if len(d) < 7:
        raise Jbig2Error("truncated JBIG2 pattern dictionary")
    flags = d[0]
    mmr = bool(flags & 0x01)
    template = (flags >> 1) & 0x03
    if not mmr and template != 0:
        raise Jbig2Error(
            f"JBIG2 pattern dictionary template {template} — "
            "refusing by name (only template 0 served)")
    hdpw, hdph = d[1], d[2]
    graymax = _u32(d, 3)
    if not 0 < hdpw <= _PAD or not 0 < hdph <= 255:
        raise Jbig2Error(
            f"JBIG2 pattern size {hdpw}x{hdph} out of range "
            f"(patterns wider than {_PAD} px would outrun the "
            "template pad — refusing by name)")
    if graymax >= 1 << 16:
        raise Jbig2Error(f"JBIG2 GRAYMAX {graymax} over gate")
    n = graymax + 1
    cw = n * hdpw
    if cw * hdph > _MAX_PIXELS:
        raise Jbig2Error("JBIG2 pattern dictionary over pixel gate")
    if mmr:
        try:
            rows = decode_g4(d[7:], cw, hdph)
        except FaxError as e:
            raise Jbig2Error(
                f"bad MMR pattern dictionary bitmap: {e}") from None
        if len(rows) < hdph:
            raise Jbig2Error(
                "MMR pattern dictionary bitmap shorter than declared")
        rows = rows[:hdph]
    else:
        from verified_sources_spark.llm.mq_coder import MQDecoder

        at = ((-hdpw, 0), (-3, -1), (2, -2), (-2, -2))
        rows = _decode_generic_bitmap(
            MQDecoder(d[7:], 1 << 16), cw, hdph, at, False)
    return [[r[i * hdpw:(i + 1) * hdpw] for r in rows]
            for i in range(n)]


def _decode_halftone_region(d: bytes, patterns: list):
    """Halftone region segment data (T.88 §6.6 / §7.4.5): a HGW×HGH
    gray-scale image decoded as Gray-coded generic bitplanes (Annex
    C.5, MSB first, one shared decoder), each cell placing its
    pattern on the skewed grid x=(HGX+mg·HRY+ng·HRX)>>8,
    y=(HGY+mg·HRX-ng·HRY)>>8 with HCOMBOP; off-region pixels clip
    (§6.6.5.1)."""
    w, h, x, y, op = _region_info(d)
    if len(d) < 38:
        raise Jbig2Error("truncated JBIG2 halftone region")
    flags = d[17]
    if flags & 0x01:
        raise Jbig2Error("JBIG2 MMR-coded halftone region — refusing "
                         "by name (arithmetic only here)")
    template = (flags >> 1) & 0x03
    if template != 0:
        raise Jbig2Error(
            f"JBIG2 halftone template {template} — refusing by name")
    if flags & 0x08:
        raise Jbig2Error("JBIG2 halftone HENABLESKIP — refusing by "
                         "name (skip bitmaps unserved)")
    combop = (flags >> 4) & 0x07
    defpixel = (flags >> 7) & 0x01
    hgw, hgh = struct.unpack_from(">II", d, 18)
    hgx, hgy = struct.unpack_from(">ii", d, 26)
    hrx, hry = struct.unpack_from(">HH", d, 34)
    if not patterns:
        raise Jbig2Error(
            "JBIG2 halftone region with no patterns in scope — "
            "referred pattern dictionaries exported nothing")
    if hgw * hgh > _MAX_PIXELS or w * h > _MAX_PIXELS:
        raise Jbig2Error("JBIG2 halftone region over pixel gate")
    if combop > 4:
        raise Jbig2Error(
            f"JBIG2 halftone combination operator {combop} — "
            "reserved value")
    graymax = len(patterns) - 1
    bits_per = max(1, graymax.bit_length())
    # composition work = grid cells × pattern area; bound it like the
    # allocation gates (a tiny stream can declare a huge grid)
    if hgw * hgh * len(patterns[0]) * len(patterns[0][0]) \
            > _MAX_PIXELS:
        raise Jbig2Error(
            "JBIG2 halftone composition work exceeds "
            f"{_MAX_PIXELS}-pixel gate")
    from verified_sources_spark.llm.mq_coder import MQDecoder

    dec = MQDecoder(d[38:], 1 << 16)
    planes = [_decode_generic_bitmap(dec, hgw, hgh,
                                     _T0_NOMINAL_AT, False)
              for _ in range(bits_per)]          # MSB first
    bitmap = [bytearray([defpixel] * w) for _ in range(h)]
    for mg in range(hgh):
        # Gray decode row-wise: bit_j = plane_j XOR bit_{j+1}
        for ng in range(hgw):
            bit = planes[0][mg][ng]
            val = bit
            for j in range(1, bits_per):
                bit ^= planes[j][mg][ng]
                val = (val << 1) | bit
            if val > graymax:
                raise Jbig2Error(
                    f"JBIG2 halftone gray value {val} exceeds "
                    f"GRAYMAX {graymax}")
            px = (hgx + mg * hry + ng * hrx) >> 8
            py = (hgy + mg * hrx - ng * hry) >> 8
            pat = patterns[val]
            for ry, prow in enumerate(pat):
                yy = py + ry
                if not 0 <= yy < h:
                    continue
                dst = bitmap[yy]
                for rx in range(len(prow)):
                    xx = px + rx
                    if not 0 <= xx < w:
                        continue
                    p = prow[rx]
                    if combop == 0:
                        dst[xx] |= p
                    elif combop == 1:
                        dst[xx] &= p
                    elif combop == 2:
                        dst[xx] ^= p
                    elif combop == 3:
                        dst[xx] ^= p ^ 1
                    else:
                        dst[xx] = p
    return w, h, x, y, op, [bytes(r) for r in bitmap]


# T.88 §7.3 segment type numbers
_PAGE_INFO = 48
_END_OF_PAGE = 49
_END_OF_STRIPE = 50
_END_OF_FILE = 51
_EXTENSION = 62
_GENERIC_REGIONS = (36, 38, 39)
_SYMBOL_DICT = 0
_TEXT_REGIONS = (4, 6, 7)
_PATTERN_DICT = 16
_HALFTONE_REGIONS = (20, 22, 23)
_TABLES = 53

_TYPE_NAMES = {
    40: "intermediate refinement region",
    42: "immediate refinement region",
    43: "immediate lossless refinement region",
    52: "profiles", 54: "color palette",
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
    The dict carries number/type/page/data_length plus the
    referred-to segment numbers — text regions resolve their symbol
    dictionaries through them."""
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
    if count > 1 << 20:
        raise Jbig2Error("JBIG2 segment refers to an absurd number "
                         "of segments — corrupt header")
    # referred-to segment numbers size by THIS segment's number (§7.2.5)
    ref_size = 1 if num <= 256 else (2 if num <= 65536 else 4)
    if p + count * ref_size > len(data):
        raise Jbig2Error("truncated JBIG2 segment header (referred)")
    referred = []
    for i in range(count):
        if ref_size == 1:
            referred.append(data[p + i])
        elif ref_size == 2:
            referred.append(struct.unpack_from(">H", data, p + 2 * i)[0])
        else:
            referred.append(_u32(data, p + 4 * i))
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
             "referred": referred, "data_length": length}, p)


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
    if t in (_SYMBOL_DICT, _PATTERN_DICT, _TABLES) \
            or t in _TEXT_REGIONS \
            or t in _HALFTONE_REGIONS \
            or t in _GENERIC_REGIONS or t in (
            _PAGE_INFO, _END_OF_PAGE, _END_OF_STRIPE, _END_OF_FILE,
            _EXTENSION):
        return
    name = _TYPE_NAMES.get(t, f"type {t}")
    raise Jbig2Error(
        f"JBIG2 {name} segment — refusing by name "
        "(arithmetic/Huffman-coded structure, no verifier here)")


def _check_region_fits(w: int, h: int, x: int, y: int,
                       page_w: int, page_h: int) -> None:
    """Region-fits-the-page gate, run BEFORE the region decodes: a
    bit-flipped height can declare a 50M-pixel region that passes the
    allocation gate — refusing pre-decode keeps a corrupt stream from
    buying minutes of pure-Python MQ work (deep-fuzz HANG find; the
    post-decode check in _composite is the defensive backstop)."""
    if x + w > page_w or y + h > page_h:
        raise Jbig2Error(
            f"JBIG2 region {w}x{h}@({x},{y}) exceeds page "
            f"{page_w}x{page_h}")


def _composite(page, page_w: int, page_h: int, rows: list[bytes],
               w: int, h: int, x: int, y: int, op: int) -> None:
    """External combination (T.88 §6.8.2) of a region onto the page."""
    import numpy as np

    _check_region_fits(w, h, x, y, page_w, page_h)
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

    sym_dicts: dict[int, list] = {}  # segment number -> exported syms
    pat_dicts: dict[int, list] = {}  # segment number -> patterns
    cust_tables: dict[int, _HuffTable] = {}  # number -> custom table

    def _input_symbols(seg: dict) -> list:
        """Concatenate the exported symbols of every referred symbol
        dictionary, in referral order (T.88 §7.4.3.1.2 /
        §7.4.4.1.1)."""
        out: list = []
        for r in seg["referred"]:
            if r in sym_dicts:
                out.extend(sym_dicts[r])
        return out

    def _input_patterns(seg: dict) -> list:
        out: list = []
        for r in seg["referred"]:
            if r in pat_dicts:
                out.extend(pat_dicts[r])
        return out

    def _input_tables(seg: dict) -> list:
        """Referred-to custom table segments, in referral order —
        the pool the custom selectors consume (§7.4.3.1.6)."""
        return [cust_tables[r] for r in seg["referred"]
                if r in cust_tables]

    for seg in _iter_segments(globals_data):
        # globals hold symbol/pattern dictionaries for the text and
        # halftone layers — the same type gate applies
        _check_supported(seg)
        if seg["type"] in _GENERIC_REGIONS \
                or seg["type"] in _TEXT_REGIONS \
                or seg["type"] in _HALFTONE_REGIONS:
            raise Jbig2Error(
                "JBIG2 region in the globals stream — "
                "regions are page-associated (T.88 §8.2)")
        if seg["type"] == _TABLES:
            cust_tables[seg["number"]] = _parse_table_segment(
                seg["data"], f"custom#{seg['number']}")
        elif seg["type"] == _SYMBOL_DICT:
            sym_dicts[seg["number"]] = _decode_symbol_dictionary(
                seg["data"], _input_symbols(seg), _input_tables(seg))
        elif seg["type"] == _PATTERN_DICT:
            pat_dicts[seg["number"]] = _decode_pattern_dictionary(
                seg["data"])

    segments = list(_iter_segments(data))
    page = None          # np.uint8 (H, W)
    page_w = page_h = 0
    height_unknown = False
    default_pixel = 0

    # pre-scan region extents: striped pages declare height 0xFFFFFFFF
    # and real readers size the page from its regions
    max_extent = 0
    for seg in segments:
        if seg["type"] in _GENERIC_REGIONS \
                or seg["type"] in _TEXT_REGIONS \
                or seg["type"] in _HALFTONE_REGIONS:
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
            _check_region_fits(w, h, x, y, page_w, page_h)
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
            _composite(page, page_w, page_h, rows, w, h, x, y, op)
        elif t == _TABLES:
            cust_tables[seg["number"]] = _parse_table_segment(
                seg["data"], f"custom#{seg['number']}")
        elif t == _SYMBOL_DICT:
            sym_dicts[seg["number"]] = _decode_symbol_dictionary(
                seg["data"], _input_symbols(seg), _input_tables(seg))
        elif t == _PATTERN_DICT:
            pat_dicts[seg["number"]] = _decode_pattern_dictionary(
                seg["data"])
        elif t in _HALFTONE_REGIONS:
            if page is None:
                raise Jbig2Error(
                    "JBIG2 region before any page info segment")
            w, h, x, y, _op = _region_info(seg["data"])
            _check_region_fits(w, h, x, y, page_w, page_h)
            w, h, x, y, op, rows = _decode_halftone_region(
                seg["data"], _input_patterns(seg))
            _composite(page, page_w, page_h, rows, w, h, x, y, op)
        elif t in _TEXT_REGIONS:
            if page is None:
                raise Jbig2Error(
                    "JBIG2 region before any page info segment")
            w, h, x, y, _op = _region_info(seg["data"])
            _check_region_fits(w, h, x, y, page_w, page_h)
            syms = _input_symbols(seg)
            w, h, x, y, op, rows = _decode_text_region(
                seg["data"], syms, _input_tables(seg))
            _composite(page, page_w, page_h, rows, w, h, x, y, op)
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
                    data_length: int,
                    referred: tuple[int, ...] = ()) -> bytes:
    """Embedded-organization segment header, short forms throughout
    (≤4 referred segments, 1-byte referred numbers since fixture
    segment numbers stay ≤ 256; 1-byte page association)."""
    if len(referred) > 4:
        raise Jbig2Error("fixture header caps at 4 referred segments")
    return (struct.pack(">I", num) + bytes([seg_type & 0x3F])
            + bytes([len(referred) << 5])   # retain bits 0
            + bytes(r & 0xFF for r in referred)
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


def encode_jbig2_symbol_text(
    symbols: list[list[bytes]],
    instances: list[tuple[int, int, int]],
    page_size: tuple[int, int],
    *,
    page_default: int = 0,
    region_op: int = 0,
    in_globals: bool = False,
    end_of_page: bool = True,
) -> bytes | tuple[bytes, bytes]:
    """PDF-embeddable JBIG2 with a SYMBOL DICTIONARY + TEXT REGION —
    the coding real scanned PDFs overwhelmingly use (glyphs coded once,
    placed many times).  ``symbols``: glyph bitmaps (rows of 0/1
    bytes) in NONDECREASING height order (height classes are delta
    coded); ``instances``: (x, y, symbol_index) with (x, y) the
    TOPLEFT corner on the page.  The encoder drives its own walk of
    the published model — height-class IADH/IADW deltas, shared
    generic-bitmap contexts, IAEX export runs, strip IADT/IAFS/IADS
    walk, the IAID tree — into the MQ encoder; the decoder
    reconstructs through its own independent walk (the same
    two-sided posture as the generic-region layer).  With
    ``in_globals`` the dictionary segment is returned as a separate
    globals stream (the PDF /JBIG2Globals arrangement):
    ``(globals_bytes, page_bytes)``."""
    from verified_sources_spark.llm.mq_coder import MQEncoder

    if not symbols:
        raise Jbig2Error("fixture needs at least one symbol")
    heights = [len(s) for s in symbols]
    if heights != sorted(heights):
        raise Jbig2Error(
            "fixture symbols must be sorted by nondecreasing height "
            "(height classes are delta coded)")
    pw, ph = page_size
    n = len(symbols)
    code_len = max(1, (n - 1).bit_length())

    # ---- symbol dictionary data (§6.5 inverse)
    enc = MQEncoder(_ctx_total())
    hcheight = 0
    i = 0
    while i < n:
        h = heights[i]
        _encode_int(enc, "IADH", h - hcheight)
        hcheight = h
        symwidth = 0
        while i < n and heights[i] == h:
            w = len(symbols[i][0])
            _encode_int(enc, "IADW", w - symwidth)
            symwidth = w
            _encode_generic_bitmap(enc, symbols[i], _T0_NOMINAL_AT,
                                   False)
            i += 1
        _encode_int(enc, "IADW", None)        # class terminator
    _encode_int(enc, "IAEX", 0)               # first run: not exported
    _encode_int(enc, "IAEX", n)               # export everything
    at_bytes = b"".join(struct.pack("bb", ax, ay)
                        for ax, ay in _T0_NOMINAL_AT)
    sd_body = (struct.pack(">H", 0)           # SDHUFF=0 REFAGG=0 T0
               + at_bytes
               + struct.pack(">II", n, n)     # numex, numnew
               + enc.flush())

    # ---- text region data (§6.4 inverse): strips of equal y,
    # nondecreasing; x nondecreasing within a strip
    insts = sorted(instances, key=lambda t: (t[1], t[0]))
    enc2 = MQEncoder(_ctx_total(code_len))
    _encode_int(enc2, "IADT", 0)              # STRIPT starts at 0
    prev_t = 0
    prev_firsts = 0
    k = 0
    while k < len(insts):
        t = insts[k][1]
        _encode_int(enc2, "IADT", t - prev_t)
        prev_t = t
        first = True
        curs = 0
        while k < len(insts) and insts[k][1] == t:
            x, _y, sid = insts[k]
            if not 0 <= sid < n:
                raise Jbig2Error(f"instance symbol id {sid} invalid")
            if first:
                _encode_int(enc2, "IAFS", x - prev_firsts)
                prev_firsts = x
                first = False
            else:
                _encode_int(enc2, "IADS", x - curs)
            _encode_iaid(enc2, code_len, sid)
            curs = x + len(symbols[sid][0]) - 1
            k += 1
        _encode_int(enc2, "IADS", None)       # end of strip
    # flags: SBHUFF=0 REFINE=0 LOGSBSTRIPS=0 REFCORNER=TOPLEFT(1)
    # TRANSPOSED=0 SBCOMBOP=OR SBDEFPIXEL=0 SBDSOFFSET=0 RTEMPLATE=0
    tr_flags = 1 << 4
    tr_body = (struct.pack(">IIII", pw, ph, 0, 0)
               + bytes([region_op & 0x07])
               + struct.pack(">H", tr_flags)
               + struct.pack(">I", len(insts))
               + enc2.flush())

    page_info = (struct.pack(">IIII", pw, ph, 0, 0)
                 + bytes([(page_default & 1) << 2])
                 + struct.pack(">H", 0))
    sd_page = 0 if in_globals else 1
    sd_seg = _segment_header(1, _SYMBOL_DICT, sd_page,
                             len(sd_body)) + sd_body
    out = bytearray()
    out += _segment_header(0, _PAGE_INFO, 1, len(page_info)) + page_info
    if not in_globals:
        out += sd_seg
    out += _segment_header(2, 7, 1, len(tr_body),
                           referred=(1,)) + tr_body
    if end_of_page:
        out += _segment_header(3, _END_OF_PAGE, 1, 0)
    if in_globals:
        return bytes(sd_seg), bytes(out)
    return bytes(out)


def encode_jbig2_symbol_text_huffman(
    symbols: list[list[bytes]],
    instances: list[tuple[int, int, int]],
    page_size: tuple[int, int],
    *,
    mmr_bitmaps: bool = True,
    page_default: int = 0,
    region_op: int = 0,
    in_globals: bool = False,
    end_of_page: bool = True,
    custom_tables: bool = False,
) -> bytes | tuple[bytes, bytes]:
    """PDF-embeddable JBIG2 with a STANDARD-HUFFMAN symbol dictionary
    + text region (SDHUFF=1/SBHUFF=1) — the fixture writer for the
    Annex-B path.  Same contract as :func:`encode_jbig2_symbol_text`
    (height-sorted ``symbols``, TOPLEFT ``instances``), but the
    integer layer is table-coded: DH via B.4, DW via B.3 (the
    negative-capable selector, so widths need not be sorted within a
    class), collective height-class bitmaps either MMR (T.6 — the
    libtiff-verified fax coder, ``mmr_bitmaps=True``) or uncompressed
    byte-aligned rows, export runs via B.1; the text region codes
    FS/DS/DT via B.6/B.8/B.11 and ships a §7.4.4.1.7 runcode-built
    equal-length symbol-ID table.  With ``custom_tables=True`` the
    DH/DW/FS/DS tables travel as §B.2 CUSTOM TABLE SEGMENTS (line-
    identical re-encodings of B.4/B.3/B.6/B.8, selectors set to 3) —
    byte-identical integer coding, so decode equality against the
    standard-selector stream is a true cross-check of the §B.2
    reader and the referred-table consumption order.  The decoder
    walks the same published layout through its own reader — and on
    the graded entry both meet the codec-blind dhash oracle against
    pixels produced by four OTHER codecs."""
    if not symbols:
        raise Jbig2Error("fixture needs at least one symbol")
    heights = [len(s) for s in symbols]
    if heights != sorted(heights):
        raise Jbig2Error(
            "fixture symbols must be sorted by nondecreasing height "
            "(height classes are delta coded)")
    pw, ph = page_size
    n = len(symbols)
    tab_dh = _std_table(4, "SDHUFFDH")
    tab_dw = _std_table(3, "SDHUFFDW")
    tab_bm = _std_table(1, "SDHUFFBMSIZE")
    tab_fs = _std_table(6, "SBHUFFFS")
    tab_ds = _std_table(8, "SBHUFFDS")
    tab_dt = _std_table(11, "SBHUFFDT")

    # ---- symbol dictionary data (§6.5.9 inverse)
    w_ = _BitWriter()
    hcheight = 0
    i = 0
    while i < n:
        h = heights[i]
        tab_dh.encode(w_, h - hcheight)
        hcheight = h
        symwidth = 0
        cls: list[list[bytes]] = []
        while i < n and heights[i] == h:
            wdt = len(symbols[i][0])
            tab_dw.encode(w_, wdt - symwidth)
            symwidth = wdt
            cls.append(symbols[i])
            i += 1
        tab_dw.encode(w_, None)               # OOB: class ends
        rows = [b"".join(sym[ry] for sym in cls) for ry in range(h)]
        if mmr_bitmaps:
            data = encode_g4(rows)
            tab_bm.encode(w_, len(data))
            w_.byte_align()
            w_.write_bytes(data)
        else:
            tab_bm.encode(w_, 0)
            w_.byte_align()
            w_.write_bytes(_pack_bitmap_rows(rows))
    ex = _std_table(1, "EX runs")
    ex.encode(w_, 0)                          # first run: not exported
    ex.encode(w_, n)                          # export everything
    # SDHUFF=1, SDHUFFDH sel 0 (B.4), SDHUFFDW sel 1 (B.3),
    # B.1 BMSIZE/AGGINST; no AT bytes in this header form —
    # or selector 3 (custom) with the same tables as §B.2 segments
    if custom_tables:
        sd_flags = 0x0001 | (3 << 2) | (3 << 4)
    else:
        sd_flags = 0x0001 | (1 << 4)
    sd_body = (struct.pack(">H", sd_flags)
               + struct.pack(">II", n, n)     # numex, numnew
               + w_.getvalue())

    # ---- text region data (§6.4 inverse with table coding)
    insts = sorted(instances, key=lambda t: (t[1], t[0]))
    w2 = _BitWriter()
    # §7.4.4.1.7 symbol-ID codes: every symbol the same length L —
    # runcode table gives code L length 1, so each symbol costs 1 bit
    code_len = max(1, (n - 1).bit_length())
    for rc in range(35):
        w2.write_bits(1 if rc == code_len else 0, 4)
    for _ in range(n):
        w2.write_bits(0, 1)                   # runcode L, n times
    w2.byte_align()
    # strip walk: initial DT must be >= 1 under B.11 — emit 1 and
    # fold the offset into the first strip's delta
    tab_dt.encode(w2, 1)
    prev_t = -1
    prev_firsts = 0
    k = 0
    while k < len(insts):
        t = insts[k][1]
        tab_dt.encode(w2, t - prev_t)
        prev_t = t
        first = True
        curs = 0
        while k < len(insts) and insts[k][1] == t:
            x, _y, sid = insts[k]
            if not 0 <= sid < n:
                raise Jbig2Error(f"instance symbol id {sid} invalid")
            if first:
                tab_fs.encode(w2, x - prev_firsts)
                prev_firsts = x
                first = False
            else:
                tab_ds.encode(w2, x - curs)
            w2.write_bits(sid, code_len)      # equal-length ID code
            curs = x + len(symbols[sid][0]) - 1
            k += 1
        tab_ds.encode(w2, None)               # OOB: end of strip
    # flags: SBHUFF=1, REFCORNER=TOPLEFT(1); huffman flags: FS/DS/DT
    # selectors 0 (B.6/B.8/B.11), no refinement tables, RSIZE B.1
    tr_flags = 0x0001 | (1 << 4)
    tr_huff = (3 | (3 << 2)) if custom_tables else 0
    tr_body = (struct.pack(">IIII", pw, ph, 0, 0)
               + bytes([region_op & 0x07])
               + struct.pack(">H", tr_flags)
               + struct.pack(">H", tr_huff)   # huffman flags
               + struct.pack(">I", len(insts))
               + w2.getvalue())

    page_info = (struct.pack(">IIII", pw, ph, 0, 0)
                 + bytes([(page_default & 1) << 2])
                 + struct.pack(">H", 0))
    sd_page = 0 if in_globals else 1
    if custom_tables:
        # DH/DW travel with the dictionary, FS/DS with the text
        # region, all as §B.2 table segments consumed in selector
        # field order (referred numbers < referring, §7.2.5)
        oob = bytearray()
        for num, std in ((1, 4), (2, 3), (3, 6), (4, 8)):
            body = _encode_table_segment_body(
                _HUFF_STANDARD[std], f"B.{std}-as-custom")
            oob += _segment_header(num, _TABLES, sd_page,
                                   len(body)) + body
        sd_seg = bytes(oob) + _segment_header(
            5, _SYMBOL_DICT, sd_page, len(sd_body),
            referred=(1, 2)) + sd_body
        tr_seg = _segment_header(6, 7, 1, len(tr_body),
                                 referred=(5, 3, 4)) + tr_body
        eop = _segment_header(7, _END_OF_PAGE, 1, 0)
    else:
        sd_seg = _segment_header(1, _SYMBOL_DICT, sd_page,
                                 len(sd_body)) + sd_body
        tr_seg = _segment_header(2, 7, 1, len(tr_body),
                                 referred=(1,)) + tr_body
        eop = _segment_header(3, _END_OF_PAGE, 1, 0)
    out = bytearray()
    out += _segment_header(0, _PAGE_INFO, 1, len(page_info)) + page_info
    if not in_globals:
        out += sd_seg
    out += tr_seg
    if end_of_page:
        out += eop
    if in_globals:
        return bytes(sd_seg), bytes(out)
    return bytes(out)


def encode_jbig2_halftone(
    values: list[list[int]],
    patterns: list[list[bytes]],
    *,
    mmr_patterns: bool = False,
    page_size: tuple[int, int] | None = None,
    page_default: int = 0,
    region_op: int = 0,
    combop: int = 0,
    end_of_page: bool = True,
) -> bytes:
    """PDF-embeddable JBIG2 with a PATTERN DICTIONARY + HALFTONE
    REGION — the screened-photo layer of scanned documents.
    ``patterns``: the GRAYMAX+1 cell bitmaps, all the same SQUARE
    size (the rectilinear HRX=size<<8, HRY=0 grid couples row/column
    steps, so square cells tile exactly); ``values``: the HGH×HGW
    grid of pattern indices.  The encoder packs the collective
    bitmap (A1=(-HDPW,0)), Gray-codes the value bitplanes (Annex C.5
    inverse) and drives them through its own generic-bitmap walk —
    the decoder reconstructs independently."""
    from verified_sources_spark.llm.mq_coder import MQEncoder

    if not patterns:
        raise Jbig2Error("fixture needs at least one pattern")
    hdph = len(patterns[0])
    hdpw = len(patterns[0][0])
    if hdpw != hdph:
        raise Jbig2Error(
            "fixture patterns must be square (the rectilinear grid "
            "couples row and column steps)")
    if any(len(p) != hdph or len(p[0]) != hdpw for p in patterns):
        raise Jbig2Error("fixture patterns must share one size")
    graymax = len(patterns) - 1
    hgh = len(values)
    hgw = len(values[0])
    if any(len(r) != hgw for r in values):
        raise Jbig2Error("fixture value grid must be rectangular")
    if any(not 0 <= v <= graymax for r in values for v in r):
        raise Jbig2Error("fixture value outside GRAYMAX")
    if page_size is None:
        page_size = (hgw * hdpw, hgh * hdph)
    pw, ph = page_size

    # pattern dictionary: collective bitmap, patterns side by side —
    # arithmetic (A1=(-HDPW,0)) or, with ``mmr_patterns``, HDMMR=1
    # through the libtiff-verified T.6 coder
    collective = [b"".join(p[yy] for p in patterns)
                  for yy in range(hdph)]
    if mmr_patterns:
        pd_data = encode_g4(collective)
        pd_flag = 1
    else:
        enc = MQEncoder(1 << 16)
        _encode_generic_bitmap(enc, collective,
                               ((-hdpw, 0), (-3, -1), (2, -2),
                                (-2, -2)),
                               False)
        pd_data = enc.flush()
        pd_flag = 0
    pd_body = (bytes([pd_flag, hdpw, hdph])
               + struct.pack(">I", graymax) + pd_data)

    # halftone region: Gray-coded bitplanes, MSB first (C.5 inverse:
    # plane_msb = bit_msb, plane_j = bit_j XOR bit_{j+1})
    bits_per = max(1, graymax.bit_length())
    enc2 = MQEncoder(1 << 16)
    prev_bits = None
    for j in range(bits_per - 1, -1, -1):
        bits = [[(values[m][n] >> j) & 1 for n in range(hgw)]
                for m in range(hgh)]
        if prev_bits is None:
            plane = bits
        else:
            plane = [[bits[m][n] ^ prev_bits[m][n]
                      for n in range(hgw)] for m in range(hgh)]
        _encode_generic_bitmap(
            enc2, [bytes(r) for r in plane], _T0_NOMINAL_AT, False)
        prev_bits = bits
    ht_flags = (combop & 0x07) << 4
    ht_body = (struct.pack(">IIII", hgw * hdpw, hgh * hdph, 0, 0)
               + bytes([region_op & 0x07])
               + bytes([ht_flags])
               + struct.pack(">II", hgw, hgh)
               + struct.pack(">ii", 0, 0)
               + struct.pack(">HH", hdpw << 8, 0)
               + enc2.flush())

    page_info = (struct.pack(">IIII", pw, ph, 0, 0)
                 + bytes([(page_default & 1) << 2])
                 + struct.pack(">H", 0))
    out = bytearray()
    out += _segment_header(0, _PAGE_INFO, 1, len(page_info)) + page_info
    out += _segment_header(1, _PATTERN_DICT, 1, len(pd_body)) + pd_body
    out += _segment_header(2, 23, 1, len(ht_body),
                           referred=(1,)) + ht_body
    if end_of_page:
        out += _segment_header(3, _END_OF_PAGE, 1, 0)
    return bytes(out)
