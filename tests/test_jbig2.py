"""JBIG2 embedded streams (llm/jbig2): MMR and MQ-arithmetic generic
regions.

No JBIG2 implementation exists in this environment to cross-check
against, so the segment layer is pinned two ways (the llm/cfb and
llm/sevenzip posture): (a) the encoder's byte layout is asserted
against ITU-T T.88 section values, and (b) the decoder is exercised on
hand-assembled structures the encoder does not emit (long-form
referred-segment counts, 4-byte page associations, striped pages).
MMR region payloads ride the repo's libtiff-verified T.6 codec, so
their pixel correctness inherits the fax suite's two-sided
verification; MQ-arithmetic regions (template 0, llm/mq_coder) are
gated by bitmap-level encoder↔decoder independence here plus the MQ
coder's own battery in test_mq_coder.py.
"""

from __future__ import annotations

import random
import struct

import pytest

from verified_sources_spark.llm.jbig2 import (
    Jbig2Error,
    decode_jbig2_embedded,
    encode_jbig2_mmr,
)


def _bitmap(w: int, h: int, seed: int = 3) -> list[bytes]:
    """Scan-like bilevel rows (runs, not salt-and-pepper noise)."""
    rng = random.Random(seed)
    rows = []
    for _ in range(h):
        row = bytearray()
        color = rng.randrange(2)
        while len(row) < w:
            run = min(rng.randrange(1, 17), w - len(row))
            row += bytes([color]) * run
            color ^= 1
        rows.append(bytes(row))
    return rows


def test_round_trip_single_region():
    for w, h in [(64, 40), (37, 11), (8, 1)]:
        rows = _bitmap(w, h, seed=w)
        out = decode_jbig2_embedded(encode_jbig2_mmr(rows))
        assert (out["width"], out["height"]) == (w, h)
        assert out["rows"] == rows


def test_page_default_pixel_and_lossy_type():
    rows = _bitmap(20, 10)
    # type 38 (immediate, not lossless) decodes identically
    out = decode_jbig2_embedded(encode_jbig2_mmr(rows, lossless=False))
    assert out["rows"] == rows
    # default pixel 1: uncovered page area is black
    reg = _bitmap(4, 4, seed=9)
    d = encode_jbig2_mmr(regions=[(2, 3, reg, 4)], page_size=(10, 10),
                         page_default=1)
    out = decode_jbig2_embedded(d)
    assert out["rows"][0] == b"\x01" * 10
    assert out["rows"][3][2:6] == reg[0]


@pytest.mark.parametrize("op", [0, 1, 2, 3, 4])
def test_combination_operators(op):
    """Two overlapping regions composite with OR/AND/XOR/XNOR/REPLACE —
    checked against an independent per-pixel computation."""
    a = _bitmap(12, 12, seed=1)
    b = _bitmap(8, 8, seed=2)
    d = encode_jbig2_mmr(regions=[(0, 0, a, 0), (2, 2, b, op)],
                         page_size=(12, 12))
    out = decode_jbig2_embedded(d)
    for y in range(12):
        for x in range(12):
            pa = a[y][x]
            if 2 <= x < 10 and 2 <= y < 10:
                pb = b[y - 2][x - 2]
                exp = [pa | pb, pa & pb, pa ^ pb, 1 - (pa ^ pb), pb][op]
            else:
                exp = pa
            assert out["rows"][y][x] == exp, (x, y, op)


def test_spec_layout_pins():
    """Encoder bytes against T.88 §7.2 (segment header) and §7.4
    (page info / generic region) layouts."""
    rows = [b"\x01\x00\x01\x00"] * 2
    d = encode_jbig2_mmr(rows)
    # segment 0: number=0, type 48 (page info), 0 referred, page 1
    assert d[:4] == b"\x00\x00\x00\x00"
    assert d[4] == 48
    assert d[5] == 0x00 and d[6] == 1
    (plen,) = struct.unpack_from(">I", d, 7)
    assert plen == 19  # §7.4.8: 4+4+4+4+1+2
    pw, ph = struct.unpack_from(">II", d, 11)
    assert (pw, ph) == (4, 2)
    # segment 1: immediate lossless generic region (39)
    p = 11 + plen
    (num,) = struct.unpack_from(">I", d, p)
    assert num == 1 and d[p + 4] == 39
    w, h, x, y = struct.unpack_from(">IIII", d, p + 11)
    assert (w, h, x, y) == (4, 2, 0, 0)
    assert d[p + 11 + 16] == 0       # external comb op OR
    assert d[p + 11 + 17] == 0x01    # generic flags: MMR=1
    # final segment: end of page (49), zero-length data
    assert d[-7] == 49 and d[-4:] == b"\x00\x00\x00\x00"


def test_hand_assembled_header_variants():
    """Decoder on layouts the encoder never writes: long-form
    referred-segment count and 4-byte page association (§7.2.4-7.2.6)."""
    rows = _bitmap(16, 6)
    base = encode_jbig2_mmr(rows, end_of_page=False)
    plen = struct.unpack_from(">I", base, 7)[0]
    seg1 = base[11 + plen:]
    body = seg1[11:]

    # rebuild segment 1 with a long-form count of 0 referred segments
    # (0b111 escape + 29-bit count 0 + 1 retain byte) and page assoc 4B
    hdr = (struct.pack(">I", 1) + bytes([39 | 0x40])
           + struct.pack(">I", 0xE0000000) + b"\x00"
           + struct.pack(">I", 1) + struct.pack(">I", len(body)))
    out = decode_jbig2_embedded(base[: 11 + plen] + hdr + body)
    assert out["rows"] == rows


def test_striped_page_unknown_height():
    """Page info may declare height 0xFFFFFFFF (striped pages); the
    page sizes itself from region extents like real readers."""
    rows = _bitmap(10, 7)
    d = bytearray(encode_jbig2_mmr(rows, end_of_page=False))
    struct.pack_into(">I", d, 11 + 4, 0xFFFFFFFF)
    out = decode_jbig2_embedded(bytes(d))
    assert out["height"] == 7 and out["rows"] == rows


def test_refusals_by_name():
    rows = _bitmap(8, 4)
    good = encode_jbig2_mmr(rows, end_of_page=False)
    plen = struct.unpack_from(">I", good, 7)[0]
    seg1_at = 11 + plen

    # arithmetic template 1-3 and EXTTEMPLATE refuse by name (the
    # MMR=0 template-0 share DECODES now via llm/mq_coder)
    from verified_sources_spark.llm.jbig2 import encode_jbig2_arith

    arith = encode_jbig2_arith(rows, end_of_page=False)
    aplen = struct.unpack_from(">I", arith, 7)[0]
    aseg1 = 11 + aplen
    bad = bytearray(arith)
    bad[aseg1 + 11 + 17] = 0x02  # MMR=0, GBTEMPLATE=1
    with pytest.raises(Jbig2Error, match="template 1"):
        decode_jbig2_embedded(bytes(bad))
    bad = bytearray(arith)
    bad[aseg1 + 11 + 17] = 0x10  # EXTTEMPLATE
    with pytest.raises(Jbig2Error, match="EXTTEMPLATE"):
        decode_jbig2_embedded(bytes(bad))
    # halftone region segment type (symbol dictionary + text regions
    # DECODE as of round 14 — halftone/refinement keep refusing)
    bad = bytearray(good)
    bad[seg1_at + 4] = 22
    with pytest.raises(Jbig2Error, match="halftone"):
        decode_jbig2_embedded(bytes(bad))
    bad = bytearray(good)
    bad[seg1_at + 4] = 42
    with pytest.raises(Jbig2Error, match="refinement"):
        decode_jbig2_embedded(bytes(bad))
    # unknown data length sentinel
    bad = bytearray(good)
    struct.pack_into(">I", bad, seg1_at + 7, 0xFFFFFFFF)
    with pytest.raises(Jbig2Error, match="unknown data length"):
        decode_jbig2_embedded(bytes(bad))
    # region before page info
    with pytest.raises(Jbig2Error, match="before any page"):
        decode_jbig2_embedded(good[seg1_at:])
    # region outside the page
    with pytest.raises(Jbig2Error, match="exceeds page"):
        decode_jbig2_embedded(
            encode_jbig2_mmr(regions=[(6, 0, rows, 0)], page_size=(8, 4)))
    # bomb gate
    with pytest.raises(Jbig2Error, match="pixel gate"):
        big = bytearray(good)
        struct.pack_into(">II", big, 11, 1 << 16, 1 << 16)
        decode_jbig2_embedded(bytes(big))
    # a region inside the globals stream
    with pytest.raises(Jbig2Error, match="globals"):
        decode_jbig2_embedded(good, globals_data=good[seg1_at:])
    # globals with a profiles segment (symbol/pattern dictionaries in
    # the globals stream decode as of round 14; profiles/tables keep
    # refusing by name)
    gbad = bytearray(good[seg1_at:])
    gbad[4] = 52
    with pytest.raises(Jbig2Error, match="profiles"):
        decode_jbig2_embedded(good, globals_data=bytes(gbad))
    # garbled symbol dictionary bytes in globals refuse, not garble
    gbad = bytearray(good[seg1_at:])
    gbad[4] = 0
    with pytest.raises(Jbig2Error):
        decode_jbig2_embedded(good, globals_data=bytes(gbad))


def test_pdf_embedded_jbig2_image():
    """A /JBIG2Decode image XObject decodes to the same pixels as its
    CCITTFaxDecode twin — the cross-codec consistency check — and
    lands in pdf_images' dhash surface."""
    from verified_sources_spark.llm.fax_codec import encode_g4
    from verified_sources_spark.llm.pdf_codec import (
        encode_pdf, extract_pdf_images,
    )

    rows = _bitmap(48, 32, seed=5)
    jb = encode_pdf([["scan page"]], image={
        "width": 48, "height": 32, "bpc": 1,
        "colorspace": "DeviceGray", "pdf_filter": "JBIG2Decode",
        "data": encode_jbig2_mmr(rows)})
    cc = encode_pdf([["scan page"]], image={
        "width": 48, "height": 32, "bpc": 1,
        "colorspace": "DeviceGray", "pdf_filter": "CCITTFaxDecode",
        "decode_parms": "<< /K -1 /Columns 48 /Rows 32 /BlackIs1 true >>",
        "data": encode_g4(rows)})
    (im_j,) = extract_pdf_images(jb)
    (im_c,) = extract_pdf_images(cc)
    assert im_j["codec"] == "jbig2" and im_c["codec"] == "ccitt"
    assert im_j["pixels"] == im_c["pixels"]
    assert (im_j["width"], im_j["height"]) == (48, 32)
    # dimension disagreement with /Width /Height refuses
    from verified_sources_spark.llm.pdf_codec import PdfError
    bad = encode_pdf([["x"]], image={
        "width": 47, "height": 32, "bpc": 1,
        "colorspace": "DeviceGray", "pdf_filter": "JBIG2Decode",
        "data": encode_jbig2_mmr(rows)})
    with pytest.raises(PdfError, match="disagrees"):
        extract_pdf_images(bad)


class TestArithmeticGenericRegion:
    """MQ-arithmetic generic regions (template 0): encoder and
    decoder walk the context model independently and meet only at the
    published template definition + coder tables — bitmap equality
    across shapes is the two-sided gate available in this
    environment."""

    def _glyphs(self, w, h, seed):
        import random

        r = random.Random(seed)
        return [bytes(1 if (r.random() < 0.3 or
                            (y % 5 == 0 and x % 3 == 0)) else 0
                      for x in range(w)) for y in range(h)]

    def test_round_trip_nominal(self):
        from verified_sources_spark.llm.jbig2 import (
            decode_jbig2_embedded, encode_jbig2_arith,
        )

        rows = self._glyphs(61, 40, 1)
        out = decode_jbig2_embedded(encode_jbig2_arith(rows))
        assert out["rows"] == rows

    def test_tpgdon_repeated_rows_compress_and_round_trip(self):
        from verified_sources_spark.llm.jbig2 import (
            decode_jbig2_embedded, encode_jbig2_arith,
        )

        rows = self._glyphs(48, 8, 2)
        rep = [rows[0]] * 12 + rows + [rows[3]] * 12
        with_tp = encode_jbig2_arith(rep, tpgdon=True)
        without = encode_jbig2_arith(rep, tpgdon=False)
        assert decode_jbig2_embedded(with_tp)["rows"] == rep
        assert decode_jbig2_embedded(without)["rows"] == rep
        assert len(with_tp) < len(without)  # typical rows are ~free

    def test_non_nominal_at_pixels(self):
        from verified_sources_spark.llm.jbig2 import (
            decode_jbig2_embedded, encode_jbig2_arith,
        )

        rows = self._glyphs(33, 21, 3)
        blob = encode_jbig2_arith(
            rows, at=((1, -1), (-2, -1), (2, -2), (-1, -2)))
        assert decode_jbig2_embedded(blob)["rows"] == rows

    def test_multi_region_composite_ops(self):
        import numpy as np

        from verified_sources_spark.llm.jbig2 import (
            decode_jbig2_embedded, encode_jbig2_arith,
        )

        r1 = self._glyphs(20, 15, 4)
        r2 = self._glyphs(16, 12, 5)
        blob = encode_jbig2_arith(
            regions=[(2, 2, r1, 0), (10, 8, r2, 2)],
            page_size=(40, 30), page_default=1)
        out = decode_jbig2_embedded(blob)
        page = np.ones((30, 40), np.uint8)
        a = np.frombuffer(b"".join(r1), np.uint8).reshape(15, 20)
        page[2:17, 2:22] |= a
        b = np.frombuffer(b"".join(r2), np.uint8).reshape(12, 16)
        page[8:20, 10:26] ^= b
        assert b"".join(out["rows"]) == page.tobytes()

    def test_degenerate_fills(self):
        from verified_sources_spark.llm.jbig2 import (
            decode_jbig2_embedded, encode_jbig2_arith,
        )

        for fill in (0, 1):
            rows = [bytes([fill] * 33)] * 25
            out = decode_jbig2_embedded(encode_jbig2_arith(rows))
            assert out["rows"] == rows

    def test_bad_at_pixels_refuse(self):
        import pytest as _pytest

        from verified_sources_spark.llm.jbig2 import (
            Jbig2Error, encode_jbig2_arith,
        )

        with _pytest.raises(Jbig2Error, match="causal"):
            encode_jbig2_arith([b"\x01" * 8] * 4,
                               at=((0, 0), (-3, -1), (2, -2), (-2, -2)))
        with _pytest.raises(Jbig2Error, match="causal"):
            encode_jbig2_arith([b"\x01" * 8] * 4,
                               at=((1, 1), (-3, -1), (2, -2), (-2, -2)))


# ------------------------------------ symbol dictionary + text region

def _glyphs(seed: int = 11, n: int = 6):
    """Glyph bitmaps sorted by nondecreasing height (the encoder's
    height-class contract), varied sizes."""
    rng = random.Random(seed)
    out = []
    for k in range(n):
        h = 3 + k // 2            # two glyphs per height class
        w = 3 + rng.randrange(4)
        out.append([bytes(rng.randrange(2) for _ in range(w))
                    for _ in range(h)])
    return out


def _compose(syms, insts, pw, ph):
    page = [[0] * pw for _ in range(ph)]
    for x, y, sid in insts:
        for ry, row in enumerate(syms[sid]):
            for rx, p in enumerate(row):
                page[y + ry][x + rx] |= p
    return [bytes(r) for r in page]


def test_symbol_text_round_trip():
    """Symbol dictionary + text region: height classes, width deltas,
    IAID tree, multi-strip placement — decode must reproduce the
    composed page exactly (encoder and decoder walk the published
    model independently)."""
    from verified_sources_spark.llm.jbig2 import (
        encode_jbig2_symbol_text,
    )

    syms = _glyphs()
    insts = [(1, 0, 0), (7, 0, 3), (14, 0, 5),
             (0, 8, 2), (6, 8, 1), (13, 8, 4),
             (3, 16, 5), (11, 16, 0)]
    pw, ph = 24, 24
    blob = encode_jbig2_symbol_text(syms, insts, (pw, ph))
    out = decode_jbig2_embedded(blob)
    assert out["rows"] == _compose(syms, insts, pw, ph)


def test_symbol_text_globals_arrangement():
    """The PDF /JBIG2Globals split: dictionary in the globals stream,
    text region in the page stream, resolved by referred number."""
    from verified_sources_spark.llm.jbig2 import (
        encode_jbig2_symbol_text,
    )

    syms = _glyphs(seed=5, n=3)
    insts = [(0, 0, 0), (5, 0, 2), (2, 6, 1)]
    g, p = encode_jbig2_symbol_text(syms, insts, (16, 12),
                                    in_globals=True)
    out = decode_jbig2_embedded(p, globals_data=g)
    assert out["rows"] == _compose(syms, insts, 16, 12)
    # without the globals the text region has no symbols in scope
    with pytest.raises(Jbig2Error, match="no symbols in scope"):
        decode_jbig2_embedded(p)


def test_symbol_text_single_symbol_and_overlap():
    """code_len floor (1 symbol -> 1-bit IAID tree) and overlapping
    instances (negative IADS) both decode."""
    from verified_sources_spark.llm.jbig2 import (
        encode_jbig2_symbol_text,
    )

    sym = [bytes([1, 1, 1]), bytes([1, 0, 1]), bytes([1, 1, 1])]
    insts = [(0, 0, 0), (2, 0, 0), (1, 1, 0)]  # overlapping ORs
    blob = encode_jbig2_symbol_text([sym], insts, (8, 6))
    out = decode_jbig2_embedded(blob)
    assert out["rows"] == _compose([sym], insts, 8, 6)


def test_symbol_text_refusals_by_name():
    """Huffman / refinement / transposed / retained-context bits and
    structural garble all refuse by name, never garble."""
    from verified_sources_spark.llm.jbig2 import (
        encode_jbig2_symbol_text,
    )

    syms = _glyphs(seed=9, n=2)
    insts = [(0, 0, 0), (6, 0, 1)]
    good = encode_jbig2_symbol_text(syms, insts, (16, 8),
                                    end_of_page=False)
    # layout: page info seg (11+19), then symbol dict seg at:
    sd_at = 11 + 19
    sd_len = struct.unpack_from(">I", good, sd_at + 7)[0]
    tr_at = sd_at + 11 + sd_len           # text region header start
    # text region header has 1 referred segment -> data at +12
    # r15: the SDHUFF/SBHUFF bit no longer refuses (standard-Huffman
    # path served) — flipping it on an ARITHMETIC stream now parses
    # the MQ bytes as Huffman data and must still fail CLOSED as a
    # Jbig2Error (any message), never escape or garble
    for bitpos, pattern in ((0x01, None), (0x02, "refinement"),
                            (0x100, "retained|imported")):
        bad = bytearray(good)
        flags = struct.unpack_from(">H", bad, sd_at + 11)[0] | bitpos
        struct.pack_into(">H", bad, sd_at + 11, flags)
        with pytest.raises(Jbig2Error, match=pattern):
            decode_jbig2_embedded(bytes(bad))
    for bitpos, pattern in ((0x01, None), (0x02, "refinement"),
                            (0x40, "transposed")):
        bad = bytearray(good)
        flags = struct.unpack_from(">H", bad, tr_at + 12 + 17)[0] | bitpos
        struct.pack_into(">H", bad, tr_at + 12 + 17, flags)
        with pytest.raises(Jbig2Error, match=pattern):
            decode_jbig2_embedded(bytes(bad))
    # declared instance count overrun: fewer declared than coded
    bad = bytearray(good)
    struct.pack_into(">I", bad, tr_at + 12 + 19, 1)
    with pytest.raises(Jbig2Error, match="more instances"):
        decode_jbig2_embedded(bytes(bad))


def test_symbol_text_mutation_battery():
    """Every byte flip in the symbol/text stream either decodes to
    SOME page (arithmetic self-healing is acceptable) or refuses as
    Jbig2Error — never a raw exception escape."""
    from verified_sources_spark.llm.jbig2 import (
        encode_jbig2_symbol_text,
    )

    syms = _glyphs(seed=21, n=4)
    insts = [(0, 0, 0), (5, 0, 2), (10, 0, 3), (2, 7, 1)]
    good = encode_jbig2_symbol_text(syms, insts, (18, 14))
    rng = random.Random(77)
    for _ in range(300):
        i = rng.randrange(len(good))
        bad = bytearray(good)
        bad[i] ^= 1 << rng.randrange(8)
        try:
            decode_jbig2_embedded(bytes(bad))
        except Jbig2Error:
            pass


def test_integer_procedure_round_trip():
    """The Annex-A integer codec across every range bucket and OOB,
    through a real MQ coder pair."""
    from verified_sources_spark.llm.jbig2 import (
        _ctx_total,
        _decode_int,
        _encode_int,
    )
    from verified_sources_spark.llm.mq_coder import MQDecoder, MQEncoder

    vals = [0, 1, 3, 4, 19, 20, 83, 84, 339, 340, 4435, 4436,
            100000, -1, -5, -20, -84, -340, -4436, -99999, None, 7,
            None, -2]
    enc = MQEncoder(_ctx_total())
    for v in vals:
        _encode_int(enc, "IADH", v)
        _encode_int(enc, "IADS", v if v is None or v >= 0 else -v)
    data = enc.flush()
    dec = MQDecoder(data, _ctx_total())
    for v in vals:
        assert _decode_int(dec, "IADH") == v
        assert _decode_int(dec, "IADS") == (
            v if v is None or v >= 0 else -v)


def test_iaid_round_trip():
    from verified_sources_spark.llm.jbig2 import (
        _ctx_total,
        _decode_iaid,
        _encode_iaid,
    )
    from verified_sources_spark.llm.mq_coder import MQDecoder, MQEncoder

    for code_len in (1, 3, 6):
        ids = [i % (1 << code_len) for i in range(40)]
        enc = MQEncoder(_ctx_total(code_len))
        for i in ids:
            _encode_iaid(enc, code_len, i)
        dec = MQDecoder(enc.flush(), _ctx_total(code_len))
        assert [_decode_iaid(dec, code_len) for _ in ids] == ids


# ------------------------------------ pattern dictionary + halftone

def _density_patterns(size: int = 4, levels: int = 4):
    return [[bytes(1 if (x + y * size) % size < lvl else 0
                   for x in range(size)) for y in range(size)]
            for lvl in range(levels)]


def test_halftone_round_trip():
    """Pattern dictionary + halftone region: collective-bitmap slice,
    Gray-coded bitplanes, rectilinear grid placement — decode must
    reproduce the per-cell pattern composition exactly."""
    from verified_sources_spark.llm.jbig2 import (
        encode_jbig2_halftone,
    )

    pats = _density_patterns()
    vals = [[0, 1, 2, 3], [3, 2, 1, 0], [1, 3, 0, 2]]
    out = decode_jbig2_embedded(encode_jbig2_halftone(vals, pats))
    assert (out["width"], out["height"]) == (16, 12)
    for m in range(3):
        for n in range(4):
            p = pats[vals[m][n]]
            for ry in range(4):
                got = out["rows"][m * 4 + ry][n * 4: n * 4 + 4]
                assert got == p[ry], (m, n, ry)


def test_halftone_non_power_of_two_levels():
    """GRAYMAX+1 not a power of two: 5 levels code in 3 bitplanes;
    decoded values above GRAYMAX refuse rather than index garbage."""
    from verified_sources_spark.llm.jbig2 import (
        encode_jbig2_halftone,
    )

    pats = _density_patterns(size=3, levels=5)
    vals = [[4, 0, 2], [1, 3, 4]]
    out = decode_jbig2_embedded(encode_jbig2_halftone(vals, pats))
    assert (out["width"], out["height"]) == (9, 6)
    for m in range(2):
        for n in range(3):
            p = pats[vals[m][n]]
            for ry in range(3):
                assert out["rows"][m * 3 + ry][n * 3: n * 3 + 3] \
                    == p[ry]


def test_halftone_refusals_by_name():
    from verified_sources_spark.llm.jbig2 import (
        encode_jbig2_halftone,
    )

    pats = _density_patterns()
    good = encode_jbig2_halftone([[0, 3], [2, 1]], pats,
                                 end_of_page=False)
    pd_at = 11 + 19
    pd_len = struct.unpack_from(">I", good, pd_at + 7)[0]
    ht_at = pd_at + 11 + pd_len
    # r15: HDMMR=1 pattern dictionaries DECODE now — flipping the bit
    # on an arithmetic stream parses MQ bytes as T.6, which (like any
    # flipped coding-mode bit in a checksum-free format) either
    # refuses or garble-decodes to SOME page; only a raw exception
    # escape would be a bug
    bad = bytearray(good)
    bad[pd_at + 11] |= 0x01
    try:
        decode_jbig2_embedded(bytes(bad))
    except Jbig2Error:
        pass
    # template != 0
    bad = bytearray(good)
    bad[pd_at + 11] |= 0x02
    with pytest.raises(Jbig2Error, match="template 1"):
        decode_jbig2_embedded(bytes(bad))
    # halftone flags: MMR / skip (header = 12 bytes incl 1 referred)
    for bit, pattern in ((0x01, "MMR-coded halftone"),
                         (0x08, "HENABLESKIP")):
        bad = bytearray(good)
        bad[ht_at + 12 + 17] |= bit
        with pytest.raises(Jbig2Error, match=pattern):
            decode_jbig2_embedded(bytes(bad))
    # halftone region with no referred pattern dictionary
    bad = bytearray(good)
    bad[ht_at + 6] = 99  # referred segment number -> unknown
    with pytest.raises(Jbig2Error, match="no patterns in scope"):
        decode_jbig2_embedded(bytes(bad))


def test_halftone_mutation_battery():
    from verified_sources_spark.llm.jbig2 import (
        encode_jbig2_halftone,
    )

    pats = _density_patterns(size=3, levels=4)
    good = encode_jbig2_halftone([[0, 1, 2], [3, 2, 0]], pats)
    rng = random.Random(99)
    for _ in range(300):
        i = rng.randrange(len(good))
        bad = bytearray(good)
        bad[i] ^= 1 << rng.randrange(8)
        try:
            decode_jbig2_embedded(bytes(bad))
        except Jbig2Error:
            pass


def test_text_region_composition_work_gate():
    """A small stream can DECLARE astronomic composition work (many
    instances of one big symbol); the painted-pixel gate must refuse
    instead of running for days (self-review)."""
    from verified_sources_spark.llm.jbig2 import (
        encode_jbig2_symbol_text,
    )

    sym = [bytes([1] * 64)] * 64              # 4096 px per instance
    n = (1 << 26) // 4096 + 2                 # just over the gate
    insts = [(0, 0, 0)] * n
    blob = encode_jbig2_symbol_text([sym], insts, (128, 128))
    with pytest.raises(Jbig2Error, match="composition work"):
        decode_jbig2_embedded(blob)


def test_halftone_composition_work_gate():
    from verified_sources_spark.llm.jbig2 import (
        encode_jbig2_halftone,
    )

    pats = [[bytes([lvl % 2] * 8)] * 8 for lvl in range(2)]
    good = encode_jbig2_halftone([[0, 1], [1, 0]], pats,
                                 end_of_page=False)
    pd_at = 11 + 19
    pd_len = struct.unpack_from(">I", good, pd_at + 7)[0]
    ht_at = pd_at + 11 + pd_len
    bad = bytearray(good)
    # declare a giant grid: cells x pattern area over the gate
    struct.pack_into(">II", bad, ht_at + 12 + 18, 1 << 13, 1 << 13)
    with pytest.raises(Jbig2Error, match="composition work|pixel gate"):
        decode_jbig2_embedded(bytes(bad))


# --- r15: standard-Huffman symbol dictionaries + text regions --------------


def test_standard_tables_canonical_codes_pinned():
    """Annex-B transcription pins: B.1's canonical assignment is the
    published 0 / 10 / 110 / 111, B.4's is 0 / 10 / 110 / 1110 /
    11110 / 11111, and every shipped table forms a COMPLETE prefix
    code (Kraft sum 1) — the cross-check that a mis-transcribed line
    set almost never survives."""
    from verified_sources_spark.llm.jbig2 import (
        _HUFF_STANDARD,
        _HuffTable,
    )

    b1 = _HuffTable(_HUFF_STANDARD[1], "B.1")
    assert b1._code_of == [(1, 0), (2, 2), (3, 6), (3, 7)]
    b4 = _HuffTable(_HUFF_STANDARD[4], "B.4")
    assert b4._code_of == [(1, 0), (2, 2), (3, 6), (4, 14), (5, 30),
                           (5, 31)]
    for num, lines in _HUFF_STANDARD.items():
        assert _HuffTable(lines, f"B.{num}").complete, num


def test_huffman_symbol_text_pixels_match_arithmetic():
    """The SDHUFF/SBHUFF path must reconstruct the SAME page as the
    arithmetic path from the same glyphs/placements — MMR collective
    bitmaps (through the libtiff-verified fax coder), uncompressed
    collective bitmaps, and the /JBIG2Globals split all agree."""
    from verified_sources_spark.llm.jbig2 import (
        encode_jbig2_symbol_text,
        encode_jbig2_symbol_text_huffman,
    )

    syms = _glyphs(seed=21, n=4)
    insts = [(0, 0, 0), (5, 0, 2), (10, 0, 3), (2, 7, 1)]
    want = decode_jbig2_embedded(
        encode_jbig2_symbol_text(syms, insts, (18, 14)))["rows"]
    for mmr in (True, False):
        got = decode_jbig2_embedded(encode_jbig2_symbol_text_huffman(
            syms, insts, (18, 14), mmr_bitmaps=mmr))
        assert got["rows"] == want, f"mmr={mmr}"
    g, page = encode_jbig2_symbol_text_huffman(
        syms, insts, (18, 14), in_globals=True)
    assert decode_jbig2_embedded(page, globals_data=g)["rows"] == want


def test_huffman_refusals_by_name():
    """Custom-table selectors, the two NOT-SHIPPED standard tables
    (B.7 / B.10 — transcription failed the completeness cross-check),
    and a repeat-previous runcode with no previous all refuse by
    name."""
    from verified_sources_spark.llm.jbig2 import (
        encode_jbig2_symbol_text_huffman,
    )

    syms = _glyphs(seed=9, n=2)
    insts = [(0, 0, 0), (6, 0, 1)]
    good = encode_jbig2_symbol_text_huffman(syms, insts, (16, 8),
                                            end_of_page=False)
    sd_at = 11 + 19
    sd_len = struct.unpack_from(">I", good, sd_at + 7)[0]
    tr_at = sd_at + 11 + sd_len
    # SD flags: force custom/reserved DH (bits 2-3 = 3), custom
    # BMSIZE (bit 6), refinement (bit 1)
    for mask, pattern in ((0x0C, "SDHUFFDH"), (0x40, "SDHUFFBMSIZE"),
                          (0x02, "refinement")):
        bad = bytearray(good)
        flags = struct.unpack_from(">H", bad, sd_at + 11)[0] | mask
        struct.pack_into(">H", bad, sd_at + 11, flags)
        with pytest.raises(Jbig2Error, match=pattern):
            decode_jbig2_embedded(bytes(bad))
    # SD: selector 1 for DH = table B.5 (shipped) but DW selector
    # composed to 2 = reserved — refuse
    bad = bytearray(good)
    flags = struct.unpack_from(">H", bad, sd_at + 11)[0]
    struct.pack_into(">H", bad, sd_at + 11, (flags & ~0x30) | 0x20)
    with pytest.raises(Jbig2Error, match="SDHUFFDW"):
        decode_jbig2_embedded(bytes(bad))
    # TR huffman flags at +12(header)+17(region info)+2(flags):
    # FS selector 1 = B.7 (not shipped: refuses by NAME), 3 = custom
    hf_at = tr_at + 12 + 19
    for sel, pattern in ((0x0001, "B.7"), (0x0003, "custom")):
        bad = bytearray(good)
        struct.pack_into(">H", bad, hf_at, sel)
        with pytest.raises(Jbig2Error, match=pattern):
            decode_jbig2_embedded(bytes(bad))
    # DS selector 2 = B.10 (not shipped)
    bad = bytearray(good)
    struct.pack_into(">H", bad, hf_at, 0x0008)
    with pytest.raises(Jbig2Error, match="B.10"):
        decode_jbig2_embedded(bytes(bad))


def test_huffman_symbol_text_mutation_battery():
    """Every bit flip in the Huffman symbol/text stream either decodes
    to SOME page or refuses as Jbig2Error — never an escape, never a
    near-hang (the pad-feed gate bounds decode-from-nothing work)."""
    import time

    from verified_sources_spark.llm.jbig2 import (
        encode_jbig2_symbol_text_huffman,
    )

    syms = _glyphs(seed=21, n=4)
    insts = [(0, 0, 0), (5, 0, 2), (10, 0, 3), (2, 7, 1)]
    for mmr in (True, False):
        good = encode_jbig2_symbol_text_huffman(
            syms, insts, (18, 14), mmr_bitmaps=mmr)
        rng = random.Random(78)
        for _ in range(250):
            i = rng.randrange(len(good))
            bad = bytearray(good)
            bad[i] ^= 1 << rng.randrange(8)
            t0 = time.time()
            try:
                decode_jbig2_embedded(bytes(bad))
            except Jbig2Error:
                pass
            assert time.time() - t0 < 5, (mmr, i)


def test_huffman_empty_height_class_stays_synchronized():
    """T.88 §6.5.9 codes BMSIZE for EVERY height class — a conforming
    stream with an empty class (immediate DW OOB) still carries one,
    and skipping it would desynchronize everything after (self-review
    find).  Hand-assembled, since the fixture encoder never emits
    empty classes."""
    import struct as S

    from verified_sources_spark.llm.jbig2 import (
        _BitWriter,
        _decode_symbol_dictionary_huffman,
        _pack_bitmap_rows,
        _std_table,
    )

    tab_dh = _std_table(4, "DH")
    tab_dw = _std_table(3, "DW")
    tab_bm = _std_table(1, "BM")
    tab_ex = _std_table(1, "EX")
    w = _BitWriter()
    # class 1: height 1, EMPTY (immediate OOB) — but BMSIZE is coded
    tab_dh.encode(w, 1)
    tab_dw.encode(w, None)
    tab_bm.encode(w, 0)
    w.byte_align()
    # class 2: height 3 (delta 2), one 4-wide symbol, uncompressed
    sym = [b"\x01\x00\x01\x00", b"\x00\x01\x00\x01", b"\x01\x01\x00\x00"]
    tab_dh.encode(w, 2)
    tab_dw.encode(w, 4)
    tab_dw.encode(w, None)
    tab_bm.encode(w, 0)
    w.byte_align()
    w.write_bytes(_pack_bitmap_rows(sym))
    tab_ex.encode(w, 0)
    tab_ex.encode(w, 1)
    flags = 0x0001 | (1 << 4)          # SDHUFF, DW table B.3
    body = S.pack(">H", flags) + S.pack(">II", 1, 1) + w.getvalue()
    (got,) = _decode_symbol_dictionary_huffman(body, [], flags)
    assert [bytes(r) for r in got] == sym


def test_mmr_pattern_dictionary_matches_arithmetic():
    """r15: HDMMR=1 pattern dictionaries ride the libtiff-verified T.6
    coder and must reconstruct the SAME halftone page as the
    arithmetic collective bitmap.  Halftone GRAY-PLANE MMR keeps
    refusing (its inter-plane framing has no verifier here) — only
    the single-bitmap pattern-dictionary case is served."""
    from verified_sources_spark.llm.jbig2 import encode_jbig2_halftone

    pats = _density_patterns()
    vals = [[0, 3, 1], [2, 1, 0], [3, 0, 2]]
    want = decode_jbig2_embedded(encode_jbig2_halftone(vals, pats))
    got = decode_jbig2_embedded(
        encode_jbig2_halftone(vals, pats, mmr_patterns=True))
    assert got["rows"] == want["rows"]


def test_custom_table_segment_round_trips_standard_tables():
    """r15 §B.2 custom table segments: re-encoding every SHIPPED
    standard table as a table segment must parse back line- and
    CODEWORD-identical (the parsed lines feed the same §B.3 canonical
    constructor that is codeword-pinned against the published B.1/B.4
    assignments).  Covers signed HTLOW (B.3/B.5/B.6/B.8), OOB
    prefixes (B.2/B.3/B.8/B.9) and tables without a lower escape
    (B.1/B.2/B.4/B.11-13)."""
    from verified_sources_spark.llm.jbig2 import (
        _HUFF_STANDARD,
        _HuffTable,
        _encode_table_segment_body,
        _parse_table_segment,
    )

    for num, lines in _HUFF_STANDARD.items():
        t0 = _HuffTable(lines, f"B.{num}")
        t1 = _parse_table_segment(
            _encode_table_segment_body(lines), f"rt{num}")
        assert t0.lines == t1.lines, f"B.{num} lines differ"
        assert t0._code_of == t1._code_of, f"B.{num} codes differ"
        assert t1.complete, f"B.{num} lost completeness"


def test_custom_table_stream_decodes_pixel_identical():
    """A stream whose DH/DW/FS/DS travel as selector-3 CUSTOM table
    segments (line-identical re-encodings of B.4/B.3/B.6/B.8) must
    decode to the SAME pixels as the standard-selector stream — a
    true cross-check of the §B.2 reader and the §7.4.3.1.6 referral
    consumption order, since the integer coding is byte-identical."""
    from verified_sources_spark.llm.jbig2 import (
        _TABLES,
        _iter_segments,
        encode_jbig2_symbol_text_huffman,
    )

    syms = _glyphs(seed=21, n=4)
    insts = [(0, 0, 0), (5, 0, 2), (10, 0, 3), (2, 7, 1)]
    for mmr in (True, False):
        std = encode_jbig2_symbol_text_huffman(
            syms, insts, (18, 14), mmr_bitmaps=mmr)
        cus = encode_jbig2_symbol_text_huffman(
            syms, insts, (18, 14), mmr_bitmaps=mmr,
            custom_tables=True)
        kinds = [s["type"] for s in _iter_segments(cus)]
        assert kinds.count(_TABLES) == 4
        assert decode_jbig2_embedded(cus)["rows"] == \
            decode_jbig2_embedded(std)["rows"], f"mmr={mmr}"
    g, page = encode_jbig2_symbol_text_huffman(
        syms, insts, (18, 14), in_globals=True, custom_tables=True)
    want = decode_jbig2_embedded(
        encode_jbig2_symbol_text_huffman(syms, insts, (18, 14)))
    assert decode_jbig2_embedded(page, globals_data=g)["rows"] == \
        want["rows"]


def test_custom_table_nonstandard_value_round_trip():
    """A hand-built table that matches NO standard one (negative
    span, uneven range widths, lower+upper+OOB escapes) survives the
    segment round trip and codes every value in and beyond its span
    identically before and after."""
    from verified_sources_spark.llm.jbig2 import (
        _HUFF_OOB,
        _BitReader,
        _BitWriter,
        _HuffTable,
        _encode_table_segment_body,
        _parse_table_segment,
    )

    lines = ((3, 2, -7), (1, 0, -3), (3, 1, -2), (3, 3, 0),
             (4, 32, -8, "lower"), (5, 32, 8, "upper"),
             (5, 0, 0, "oob"))
    t0 = _HuffTable(lines, "hand")
    t1 = _parse_table_segment(_encode_table_segment_body(lines), "rt")
    assert t0.lines == t1.lines and t0._code_of == t1._code_of
    w = _BitWriter()
    values = [-7, -4, -3, -2, -1, 0, 7, None, -100, 5000, None]
    for v in values:
        t0.encode(w, v)
    r = _BitReader(w.getvalue())
    got = [t1.decode(r) for _ in values]
    assert got == [v if v is not None else _HUFF_OOB for v in values]


def test_custom_table_segment_refusals():
    """§B.2 corrupt-structure gates refuse: truncation, the reserved
    flag bit, an empty value span, prefix/range lengths over gate,
    absurd line counts, and an all-zero-prefix table."""
    import struct as S

    from verified_sources_spark.llm.jbig2 import (
        _BitWriter,
        _parse_table_segment,
    )

    with pytest.raises(Jbig2Error, match="truncated"):
        _parse_table_segment(b"\x00" * 8)
    with pytest.raises(Jbig2Error, match="reserved flag"):
        _parse_table_segment(b"\x80" + b"\x00" * 12)
    empty = bytes([0x00]) + S.pack(">ii", 5, 5) + b"\x00" * 4
    with pytest.raises(Jbig2Error, match="empty"):
        _parse_table_segment(empty)
    # htps=6: one line with preflen 33 (over the 32 gate)
    w = _BitWriter()
    w.write_bits(33, 6)
    w.write_bits(0, 1)
    over = bytes([(6 - 1) << 1]) + S.pack(">ii", 0, 1) + w.getvalue()
    with pytest.raises(Jbig2Error, match="prefix length 33"):
        _parse_table_segment(over)
    # htrs=7: one line with rangelen 40 (over the 32 gate)
    w = _BitWriter()
    w.write_bits(1, 1)
    w.write_bits(40, 7)
    over = (bytes([((7 - 1) << 4)]) + S.pack(">ii", 0, 1)
            + w.getvalue())
    with pytest.raises(Jbig2Error, match="range length 40"):
        _parse_table_segment(over)
    # rangelen-0 lines marching a huge span: the 4096-line gate
    march = (bytes([0x00]) + S.pack(">ii", 0, 1 << 20)
             + b"\xaa" * 2048)
    with pytest.raises(Jbig2Error, match="absurd number"):
        _parse_table_segment(march)
    # every prefix length zero: nothing decodable
    w = _BitWriter()
    for _ in range(2):            # one range line + nothing usable
        w.write_bits(0, 1)
        w.write_bits(0, 1)
    w.write_bits(0, 1)            # lower
    w.write_bits(0, 1)            # upper
    zero = bytes([0x00]) + S.pack(">ii", 0, 2) + w.getvalue()
    with pytest.raises(Jbig2Error, match="prefix length zero"):
        _parse_table_segment(zero)


def test_custom_table_stream_mutation_battery():
    """Every mutated byte of the custom-table stream either decodes
    to SOME page or refuses as Jbig2Error — never an escape (the
    §B.2 reader sits in front of the same work gates as the rest of
    the Huffman path)."""
    import time

    from verified_sources_spark.llm.jbig2 import (
        encode_jbig2_symbol_text_huffman,
    )

    syms = _glyphs(seed=21, n=4)
    insts = [(0, 0, 0), (5, 0, 2), (10, 0, 3), (2, 7, 1)]
    good = encode_jbig2_symbol_text_huffman(
        syms, insts, (18, 14), custom_tables=True)
    rng = random.Random(151)
    t0 = time.monotonic()
    for _ in range(400):
        bad = bytearray(good)
        for _ in range(rng.choice((1, 1, 1, 3))):
            bad[rng.randrange(len(bad))] = rng.randrange(256)
        try:
            decode_jbig2_embedded(bytes(bad))
        except Jbig2Error:
            pass
    assert time.monotonic() - t0 < 60
