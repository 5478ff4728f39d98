"""Legacy binary Office: the CFB/OLE2 container walk (llm/cfb), Word
97-2003 piece-table text extraction (llm/worddoc), BIFF8 Excel
extraction (llm/xlsdoc), and their dispatch through
llm/office.extract_office.

No OLE2/Word/Excel implementation exists in this environment to
cross-check against, so these tests (a) pin the encoders' byte
layouts to the MS-CFB / MS-DOC / MS-XLS spec values, and (b) exercise
the extractors on hand-assembled structures the encoders do not emit
(split pieces, FORMULA cached strings) so reader and writer cannot
share a hidden wrong assumption.
"""

from __future__ import annotations

import random
import struct

import pytest

from verified_sources_spark.llm.cfb import CfbError, encode_cfb, list_streams
from verified_sources_spark.llm.worddoc import DocError, doc_units, encode_doc
from verified_sources_spark.llm.xlsdoc import XlsError, encode_xls, xls_units


# ---------------------------------------------------------------- CFB

def test_cfb_round_trips():
    rng = random.Random(8)
    cases = [
        {"WordDocument": bytes(rng.randrange(256) for _ in range(10000)),
         "1Table": bytes(rng.randrange(256) for _ in range(500)),
         "\x05SummaryInformation": b"small meta"},
        {"a": b"", "b": b"x"},
        {"Storage1/inner": b"nested " * 100,
         "Storage1/deep/deeper": b"d" * 5000, "top": b"t" * 4096},
        {"big": bytes(rng.randrange(256) for _ in range(200000))},
    ]
    for streams in cases:
        assert list_streams(encode_cfb(streams)) == streams


def test_cfb_long_sibling_chains():
    """Sibling chains are degenerate right-linked lists in encode_cfb's
    own output (and in real legacy files with many streams); the walk
    must be iterative — 80+ siblings at one level round-trip, and a
    sibling CYCLE raises instead of hanging."""
    many = {f"s{i:03d}": b"payload %d" % i for i in range(80)}
    data = encode_cfb(many)
    assert list_streams(data) == many
    # 80 streams inside one storage: long chain under a nested prefix
    nested = {f"Store/s{i:03d}": b"n%d" % i for i in range(80)}
    assert list_streams(encode_cfb(nested)) == nested
    # sibling cycle: point the first stream entry's right-sibling at
    # itself — must raise CfbError, not loop forever
    bad = bytearray(data)
    (first_dir,) = struct.unpack_from("<I", bad, 48)
    dir_off = 512 * (first_dir + 1)
    for k in range(4):  # find a stream entry in the first dir sector
        e = dir_off + 128 * k
        if bad[e + 66] == 2:
            struct.pack_into("<I", bad, e + 72, k)  # right -> self
            break
    with pytest.raises(CfbError, match="bad directory reference"):
        list_streams(bytes(bad))


def test_cfb_spec_layout_pins():
    data = encode_cfb({"S": b"payload"})
    assert data[:8] == b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
    minor, major, order, sshift, mshift = struct.unpack_from(
        "<HHHHH", data, 24)
    assert (major, order, sshift, mshift) == (3, 0xFFFE, 9, 6)
    (cutoff,) = struct.unpack_from("<I", data, 56)
    assert cutoff == 4096
    # root directory entry: type 5, named "Root Entry"
    (first_dir,) = struct.unpack_from("<I", data, 48)
    root = data[512 * (first_dir + 1) : 512 * (first_dir + 1) + 128]
    assert root[66] == 5
    assert root[:20].decode("utf-16-le") == "Root Entry"


def test_cfb_guards():
    data = encode_cfb({"W": b"x" * 9000})
    with pytest.raises(CfbError, match="magic"):
        list_streams(b"PK\x03\x04" + data[4:])
    with pytest.raises(CfbError, match="beyond end"):
        list_streams(data[:600])
    bad = bytearray(data)
    struct.pack_into("<I", bad, 512 + 4, 1)  # fat[1] -> 1: self-loop
    with pytest.raises(CfbError, match="cycle"):
        list_streams(bytes(bad))


# ---------------------------------------------------------------- .doc

PARAS = ["Hello legacy Word", "café déjà vu — cp1252 fits",
         "こんにちは unicode piece", "tab\tcell text", "final ¶ paragraph"]


def test_doc_round_trip_both_table_streams():
    for wt in (0, 1):
        assert doc_units(encode_doc(PARAS, which_table=wt)) == PARAS
    assert doc_units(encode_doc([])) == []
    assert doc_units(encode_doc(["Ω" * 5000])) == ["Ω" * 5000]
    assert doc_units(encode_doc(["a", "", "b"])) == ["a", "", "b"]


def test_doc_fib_spec_offsets():
    """fcClx at 0x01A2 and ccpText at 0x004C — the MS-DOC fibRgFcLcb97
    / fibRgLw97 offsets the extractor depends on."""
    streams = list_streams(encode_doc(["xyz"]))
    wd = streams["WordDocument"]
    assert struct.unpack_from("<HH", wd, 0)[0] == 0xA5EC
    (ccp,) = struct.unpack_from("<i", wd, 0x4C)
    assert ccp == 4  # "xyz" + paragraph mark
    fc_clx, lcb = struct.unpack_from("<II", wd, 0x1A2)
    clx = streams["1Table"][fc_clx : fc_clx + lcb]
    assert clx[0] == 1 and clx[5] == 2  # Prc then Pcdt


def test_doc_hand_assembled_split_piece():
    """A paragraph split across two Unicode pieces (Word does this on
    every edit) — a layout the fixture encoder never emits."""
    streams = list_streams(encode_doc(["seed"]))
    wd = bytearray(streams["WordDocument"][:1024])
    t1, t2 = "split ".encode("utf-16-le"), "piece".encode("utf-16-le")
    o1 = len(wd)
    wd += t1
    o2 = len(wd)
    wd += t2
    struct.pack_into("<i", wd, 0x4C, 11)
    plc = (struct.pack("<3i", 0, 6, 11)
           + struct.pack("<HIH", 0, o1, 0)
           + struct.pack("<HIH", 0, o2, 0))
    clx = b"\x02" + struct.pack("<I", len(plc)) + plc
    struct.pack_into("<II", wd, 0x1A2, 0, len(clx))
    got = doc_units(encode_cfb({"WordDocument": bytes(wd), "1Table": clx}))
    assert got == ["split piece"]


def test_doc_refusals():
    streams = list_streams(encode_doc(PARAS))
    wd = bytearray(streams["WordDocument"])
    f = struct.unpack_from("<H", wd, 0x0A)[0]
    struct.pack_into("<H", wd, 0x0A, f | 0x0100)
    with pytest.raises(DocError, match="encrypted"):
        doc_units(encode_cfb({"WordDocument": bytes(wd),
                              "1Table": streams["1Table"]}))
    wd2 = bytearray(streams["WordDocument"])
    struct.pack_into("<H", wd2, 2, 0x0068)
    with pytest.raises(DocError, match="Word 95"):
        doc_units(encode_cfb({"WordDocument": bytes(wd2),
                              "1Table": streams["1Table"]}))
    with pytest.raises(DocError, match="missing 1Table"):
        doc_units(encode_cfb({"WordDocument": streams["WordDocument"]}))
    with pytest.raises(DocError, match="no WordDocument"):
        doc_units(encode_cfb({"Workbook": b"x" * 2000}))
    with pytest.raises(DocError, match="OLE2"):
        doc_units(b"plain bytes")


# ---------------------------------------------------------------- .xls

SHEETS = {
    "Data": [["name", "qty", "price"],
             ["alpha", 3, 2.5],
             ["béta", -17, 0.125],
             ["wide→unicode", 536870000, True]],
    "Empty": [],
    "Misc": [[1000000000000, "x"]],
}
WANT0 = ("name\tqty\tprice\n"
         "alpha\t3\t2.5\n"
         "béta\t-17\t0.125\n"
         "wide→unicode\t536870000\tTRUE")


@pytest.mark.parametrize("split", [False, True])
def test_xls_round_trip(split):
    units = xls_units(encode_xls(SHEETS, split_sst=split))
    assert units == [WANT0, "", "1000000000000\tx"]


def test_xls_continue_split_mid_unicode():
    text = "ascii prefix " + "Ω" * 40
    assert xls_units(encode_xls({"S": [[text]]}, split_sst=True)) == [text]


def test_xls_formula_cached_values_hand_assembled():
    def rec(t, p):
        return struct.pack("<HH", t, len(p)) + p

    g = rec(0x0809, struct.pack("<HHHHII", 0x600, 5, 0, 0, 0, 0))
    bs_pos = len(g)
    g += rec(0x0085, struct.pack("<IBBB", 0, 0, 0, 1) + b"\x00" + b"F")
    g += rec(0x000A, b"")
    body = rec(0x0809, struct.pack("<HHHHII", 0x600, 0x10, 0, 0, 0, 0))
    body += rec(0x0006, struct.pack("<HHH", 0, 0, 0)
                + struct.pack("<d", 42.5) + b"\x00" * 6)
    body += rec(0x0006, struct.pack("<HHH", 0, 1, 0)
                + b"\x00" * 6 + b"\xff\xff" + b"\x00" * 6)
    body += rec(0x0207, struct.pack("<HB", 5, 0) + b"hello")
    body += rec(0x000A, b"")
    g2 = bytearray(g)
    struct.pack_into("<I", g2, bs_pos + 4, len(g))
    assert xls_units(encode_cfb({"Workbook": bytes(g2) + body})) == [
        "42.5\thello"]


def test_xls_refusals():
    wb = list_streams(encode_xls(SHEETS))["Workbook"]
    b5 = bytearray(wb)
    struct.pack_into("<H", b5, 4, 0x0500)
    with pytest.raises(XlsError, match="BIFF version 0x0500"):
        xls_units(encode_cfb({"Workbook": bytes(b5)}))
    ins = struct.pack("<HH", 0x002F, 4) + b"\x00" * 4
    with pytest.raises(XlsError, match="FILEPASS"):
        xls_units(encode_cfb({"Workbook": wb[:20] + ins + wb[20:]}))
    with pytest.raises(XlsError, match="no Workbook"):
        xls_units(encode_cfb({"WordDocument": b"x" * 2000}))


# ---------------------------------------------------------------- .ppt

SLIDES = ["Title slide", "bullets été latin-1", "unicode スライド", ""]


def test_ppt_round_trip():
    from verified_sources_spark.llm.pptdoc import encode_ppt, ppt_units

    assert ppt_units(encode_ppt(SLIDES)) == SLIDES
    assert ppt_units(encode_ppt([])) == []


def test_ppt_refusals():
    from verified_sources_spark.llm.pptdoc import (
        PptError, encode_ppt, ppt_units,
    )

    body = struct.pack("<HHI", 0, 0x2F14, 4) + b"\x00" * 4
    doc = struct.pack("<HHI", 0x000F, 0x03E8, len(body)) + body
    with pytest.raises(PptError, match="encrypted"):
        ppt_units(encode_cfb({"PowerPoint Document": doc}))
    good = list_streams(encode_ppt(SLIDES))["PowerPoint Document"]
    with pytest.raises(PptError, match="truncated"):
        ppt_units(encode_cfb({"PowerPoint Document": good[:-5]}))
    with pytest.raises(PptError, match="no 'PowerPoint Document'"):
        ppt_units(encode_cfb({"WordDocument": b"x" * 2000}))


# ------------------------------------------------------- dispatch

def test_extract_office_dispatches_binary_formats():
    from verified_sources_spark.llm.office import OfficeError, extract_office
    from verified_sources_spark.llm.pptdoc import encode_ppt

    out = extract_office(encode_doc(PARAS))
    assert out["format"] == "doc" and out["units"] == PARAS
    out = extract_office(encode_xls({"S": [["a", 1]]}))
    assert out["format"] == "xls" and out["units"] == ["a\t1"]
    out = extract_office(encode_ppt(SLIDES))
    assert out["format"] == "ppt" and out["units"] == SLIDES
    with pytest.raises(OfficeError, match="not a known office"):
        extract_office(encode_cfb({"Mystery": b"x" * 5000}))
