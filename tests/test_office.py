"""Office-document extraction (llm/office.py): DOCX/XLSX/PPTX/ODT/ODS/
RTF round trips, format quirks, refusal isolation, and the Spark
operator."""

from __future__ import annotations

import pytest

from verified_sources_spark.llm.office import (
    OfficeError,
    encode_docx,
    encode_ods,
    encode_odt,
    encode_pptx,
    encode_rtf,
    encode_xlsx,
    extract_office,
    office_extract,
)

PARAS = [
    "Plain paragraph.",
    "With\ttab and\nsoft break.",
    "  two leading, trailing  ",
    "escapes: a<b & c>d \"q\"",
    "unicode: café — naïve 中文 🚀",
    "",
]


@pytest.mark.parametrize("enc,fmt", [
    (encode_docx, "docx"), (encode_odt, "odt"), (encode_rtf, "rtf"),
])
def test_paragraph_roundtrip(enc, fmt):
    out = extract_office(enc(PARAS))
    assert out["format"] == fmt
    assert out["units"] == PARAS


@pytest.mark.parametrize("enc,fmt", [(encode_xlsx, "xlsx"),
                                     (encode_ods, "ods")])
def test_sheet_roundtrip(enc, fmt):
    rows = [["name", "qty", "ok"], ["widget", 3, True],
            ["gadget", 2.5, False], ["dup", "widget", 1]]
    out = extract_office(enc(rows))
    assert out["format"] == fmt
    assert out["units"] == [
        "name\tqty\tok\nwidget\t3\tTRUE\ngadget\t2.5\tFALSE\ndup\twidget\t1"]


def test_pptx_slide_order_and_paragraphs():
    slides = ["Title", "Bullet one\nBullet two", "Closing"]
    out = extract_office(encode_pptx(slides))
    assert out["format"] == "pptx"
    assert out["units"] == slides


def test_xlsx_inline_str_and_formula_cache_and_sparse_cols():
    # hand-built sheet exercising cell types the encoder doesn't emit:
    # inlineStr, str (cached formula), out-of-order/sparse column refs
    import io
    import zipfile

    base = encode_xlsx([["x"]])
    with zipfile.ZipFile(io.BytesIO(base)) as z:
        parts = {n: z.read(n) for n in z.namelist()}
    S = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    parts["xl/worksheets/sheet1.xml"] = (
        f'<worksheet xmlns="{S}"><sheetData>'
        '<row r="1">'
        '<c r="C1" t="inlineStr"><is><t>inline</t></is></c>'
        '<c r="A1" t="str"><v>cached</v></c>'
        '<c r="B1"><v>7.25</v></c>'
        "</row></sheetData></worksheet>"
    ).encode()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for n, d in parts.items():
            z.writestr(n, d)
    out = extract_office(buf.getvalue())
    # A1 cached formula string, B1 float, C1 inline — in column order
    assert out["units"] == ["cached\t7.25\tinline"]


def test_odt_nested_spans_and_spacing():
    # hand-built content.xml: nested spans, text:s run-length spaces
    import io
    import zipfile

    base = encode_odt(["x"])
    with zipfile.ZipFile(io.BytesIO(base)) as z:
        parts = [(n, z.read(n)) for n in z.namelist()]
    T = "urn:oasis:names:tc:opendocument:xmlns:text:1.0"
    O = "urn:oasis:names:tc:opendocument:xmlns:office:1.0"
    content = (
        f'<office:document-content xmlns:office="{O}" xmlns:text="{T}">'
        "<office:body><office:text>"
        '<text:p>a<text:span>b<text:span>c</text:span>d</text:span>'
        'e<text:s text:c="3"/>f<text:tab/>g</text:p>'
        "<text:h>heading</text:h>"
        "</office:text></office:body></office:document-content>"
    ).encode()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for n, d in parts:
            z.writestr(n, content if n == "content.xml" else d)
    out = extract_office(buf.getvalue())
    assert out["units"] == ["abcde   f\tg", "heading"]


class TestRtf:
    def test_destinations_skipped(self):
        rtf = (rb"{\rtf1\ansi\deff0"
               rb"{\fonttbl{\f0 Arial;}}"
               rb"{\colortbl;\red0\green0\blue0;}"
               rb"{\*\generator FixtureWriter 1.0;}"
               rb"{\stylesheet{\s0 Normal;}}"
               rb"body text\par}")
        out = extract_office(rtf)
        assert out["units"] == ["body text"]

    def test_unicode_negative_and_uc_skip(self):
        # \uc1: one fallback char after \uN must be swallowed
        rtf = "{\\rtf1\\ansi\\uc1 A\\u-10179?\\u-8704?B\\par}".encode()
        out = extract_office(rtf)
        # -10179+65536=55357, -8704+65536=56832 (surrogate pair halves)
        assert out["units"] == ["A😀B"]

    def test_uc2_skips_two(self):
        rtf = rb"{\rtf1\ansi\uc2 X\u233 ??Y\par}"
        out = extract_office(rtf)
        assert out["units"] == ["XéY"]

    def test_hex_escape_codepage(self):
        rtf = rb"{\rtf1\ansi\ansicpg1252 caf\'e9\par}"
        assert extract_office(rtf)["units"] == ["café"]

    def test_uc_skip_swallows_whole_hex_escape(self):
        # Word writes \uN\'hh fallbacks: with \ucN >= 1 the WHOLE \'hh
        # sequence is one skipped char — its hex digits must not leak
        rtf = rb"{\rtf1\ansi\uc1 X\u233\'e9Y\par}"
        assert extract_office(rtf)["units"] == ["XéY"]
        # \uc2: two hex-escape fallbacks, both fully swallowed
        rtf = rb"{\rtf1\ansi\uc2 X\u233\'e9\'3fY\par}"
        assert extract_office(rtf)["units"] == ["XéY"]

    def test_bin_skip(self):
        rtf = rb"{\rtf1\ansi before\bin5 " + bytes(5) + rb" after\par}"
        out = extract_office(rtf)
        assert out["units"] == ["before after"]

    def test_escaped_braces_and_nbsp(self):
        rtf = rb"{\rtf1\ansi \{x\} \\ \~end\par}"
        assert extract_office(rtf)["units"] == ["{x} \\  end"]

    def test_trailing_text_without_par_kept(self):
        rtf = rb"{\rtf1\ansi first\par tail}"
        assert extract_office(rtf)["units"] == ["first", "tail"]


@pytest.mark.parametrize("bad", [
    b"", b"garbage bytes", b"PK\x03\x04 not a zip",
    encode_docx(["x"])[:40],
])
def test_refusals(bad):
    with pytest.raises(OfficeError):
        extract_office(bad)


def test_refuses_plain_zip_and_odf_presentation():
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("readme.txt", "hello")
    with pytest.raises(OfficeError, match="not a known office package"):
        extract_office(buf.getvalue())

    # odp DECODES now — an ODF mimetype outside the supported trio
    # (e.g. graphics) remains the named refusal
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        zi = zipfile.ZipInfo("mimetype")
        z.writestr(zi, b"application/vnd.oasis.opendocument.graphics",
                   compress_type=zipfile.ZIP_STORED)
    with pytest.raises(OfficeError, match="unsupported ODF mimetype"):
        extract_office(buf.getvalue())


def test_office_extract_operator(spark):
    rows = [
        (0, encode_docx(["p0", "p1"])),
        (1, encode_xlsx([["a", 1]])),
        (2, b"not an office file"),
        (3, encode_rtf(["only"])),
    ]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    out = office_extract(df).orderBy("doc_id", "unit_idx").collect()
    assert [(r.doc_id, r.decoded_ok, r.format, r.unit_idx, r.n_units, r.text)
            for r in out] == [
        (0, True, "docx", 0, 2, "p0"),
        (0, True, "docx", 1, 2, "p1"),
        (1, True, "xlsx", 0, 1, "a\t1"),
        (2, False, None, None, None, None),
        (3, True, "rtf", 0, 1, "only"),
    ]


def test_odp_round_trip():
    """ODF presentations: one unit per draw:page, text runs joined —
    completing the ODF trio (text/spreadsheet/presentation)."""
    from verified_sources_spark.llm.office import encode_odp

    slides = ["Title slide text", "bullet été content", "closing ライド"]
    out = extract_office(encode_odp(slides))
    assert out["format"] == "odp"
    assert out["units"] == slides


class TestStructuralText:
    """Tables, headers/footers and foot/endnotes ARE prose — the walk
    emits them as units in a documented order: headers, body blocks
    (paragraphs + tables in document order), footnotes, endnotes,
    footers."""

    def test_docx_full_structure(self):
        d = encode_docx(
            ["intro para", "second para"],
            tables=[[["name", "qty"], ["bolts", "12"]],
                    [["solo"]]],
            headers=["Annual Report", "Confidential"],
            footers=["page 1"],
            footnotes=["first note", "second note"])
        out = extract_office(d)
        assert out["units"] == [
            "Annual Report", "Confidential",
            "intro para", "second para",
            "name\tqty\nbolts\t12", "solo",
            "first note", "second note",
            "page 1"]

    def test_docx_table_cells_do_not_leak_as_units(self):
        # regression: iter('w:p') used to emit every table-cell
        # paragraph as a stray sibling unit AND no table unit
        d = encode_docx(["p"], tables=[[["a", "b"]]])
        assert extract_office(d)["units"] == ["p", "a\tb"]

    def test_docx_endnotes_and_nested_table(self):
        # hand-assembled: endnotes part + a table nested in a cell
        # (the encoder writes neither)
        import io
        import zipfile

        base = encode_docx(["body"], footnotes=["fn"])
        buf = io.BytesIO(base)
        W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
        with zipfile.ZipFile(buf, "a") as z:
            z.writestr(
                "word/endnotes.xml",
                f'<w:endnotes xmlns:w="{W}">'
                '<w:endnote w:type="separator" w:id="0"><w:p/></w:endnote>'
                '<w:endnote w:id="2"><w:p><w:r><w:t>the endnote</w:t>'
                "</w:r></w:p></w:endnote></w:endnotes>")
        out = extract_office(buf.getvalue())
        assert out["units"] == ["body", "fn", "the endnote"]

        nested = (
            f'<w:document xmlns:w="{W}"><w:body><w:tbl><w:tr><w:tc>'
            "<w:p><w:r><w:t>outer</w:t></w:r></w:p>"
            "<w:tbl><w:tr><w:tc><w:p><w:r><w:t>inner</w:t></w:r></w:p>"
            "</w:tc></w:tr></w:tbl>"
            "</w:tc></w:tr></w:tbl></w:body></w:document>")
        buf2 = io.BytesIO()
        with zipfile.ZipFile(buf2, "w") as z:
            for n in ("[Content_Types].xml", "_rels/.rels"):
                with zipfile.ZipFile(io.BytesIO(base)) as src:
                    z.writestr(n, src.read(n))
            z.writestr("word/document.xml", nested)
        assert extract_office(buf2.getvalue())["units"] == [
            "outer\ninner"]

    def test_odt_full_structure(self):
        d = encode_odt(
            ["first para", "second para"],
            tables=[[["x", "y"], ["1", "2"]]],
            header=["Doc Header"],
            footer=["Doc Footer"],
            footnotes=["a footnote body"])
        out = extract_office(d)
        assert out["units"] == [
            "Doc Header", "first para", "second para",
            "x\ty\n1\t2", "a footnote body", "Doc Footer"]

    def test_odt_note_not_spliced_into_paragraph(self):
        # the anchor paragraph's text must NOT contain the citation
        # or note body inline (the mid-sentence splice bug)
        d = encode_odt(["before after"], footnotes=["NOTE TEXT"])
        units = extract_office(d)["units"]
        assert units == ["before after", "NOTE TEXT"]

    def test_plain_files_unchanged(self):
        # no structural args -> the old single-list walk, byte-same
        assert extract_office(encode_docx(PARAS))["units"] == PARAS
        assert extract_office(encode_odt(PARAS))["units"] == PARAS

    def test_pptx_speaker_notes(self):
        d = encode_pptx(["Slide A", "Slide B"],
                        notes={0: "speak slowly", 1: "wrap up"})
        assert extract_office(d)["units"] == [
            "Slide A", "speak slowly", "Slide B", "wrap up"]
        # notes on a subset of slides; empty notes emit nothing
        d = encode_pptx(["S1", "S2", "S3"], notes={1: "middle note"})
        assert extract_office(d)["units"] == [
            "S1", "S2", "middle note", "S3"]

    def test_odp_speaker_notes_not_spliced(self):
        from verified_sources_spark.llm.office import encode_odp

        d = encode_odp(["Slide A", "Slide B"],
                       notes={0: "speak slowly", 1: "wrap up"})
        assert extract_office(d)["units"] == [
            "Slide A", "speak slowly", "Slide B", "wrap up"]
        # subset notes; no-notes slides unchanged
        d = encode_odp(["S1", "S2"], notes={1: "only here"})
        assert extract_office(d)["units"] == ["S1", "S2", "only here"]
