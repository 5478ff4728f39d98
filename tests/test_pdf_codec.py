"""PDF text extraction (llm/pdf_codec.py): object syntax, both xref
generations (classic tables, 1.5 cross-reference streams + ObjStm with
PNG predictors), Flate content, show-operator variants, escapes,
incremental updates, refusals, and the Spark operator."""

from __future__ import annotations

import zlib

import pytest

from verified_sources_spark.llm.pdf_codec import (
    PdfError,
    encode_pdf,
    extract_pdf_text,
    pdf_extract,
)

PAGES = [["hello world", "second (line) with \\ escapes and ()"],
         ["page two text"]]


@pytest.mark.parametrize("kw", [
    dict(),
    dict(compress=True),
    dict(xref_stream=True),
    dict(xref_stream=True, compress=True),
    dict(tj_arrays=True),
])
def test_layout_matrix_roundtrip(kw):
    out = extract_pdf_text(encode_pdf(PAGES, **kw))
    assert out["n_pages"] == 2
    assert out["pages"][0] == "hello world\nsecond (line) with \\ escapes and ()"
    assert out["pages"][1] == "page two text"
    assert out["text"] == out["pages"][0] + "\f" + out["pages"][1]


def test_string_escapes_and_operators():
    """Hand-written content streams the fixture writer never emits:
    octal escapes, \\n escapes, hex strings, the ' operator, Tm."""
    content = (b"BT /F1 12 Tf 72 720 Td (A\\101\\n) Tj "
               b"<4243> Tj (line2) ' 1 0 0 1 72 600 Tm (line3) Tj ET")
    body = (b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
            b"4 0 obj\n<< /Length " + str(len(content)).encode()
            + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
            b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n")
    out = extract_pdf_text(body)
    assert out["pages"][0] == "AA\nBC\nline2\nline3"


def test_indirect_length_and_content_array():
    """/Length as an indirect ref + /Contents as an ARRAY of streams."""
    c1, c2 = b"BT (part one ) Tj ET", b"BT (part two) Tj ET"
    body = (b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R "
            b"/Contents [4 0 R 6 0 R] >>\nendobj\n"
            b"4 0 obj\n<< /Length 5 0 R >>\nstream\n" + c1
            + b"\nendstream\nendobj\n"
            b"5 0 obj\n" + str(len(c1)).encode() + b"\nendobj\n"
            b"6 0 obj\n<< /Length " + str(len(c2)).encode()
            + b" >>\nstream\n" + c2 + b"\nendstream\nendobj\n"
            b"trailer\n<< /Size 7 /Root 1 0 R >>\n%%EOF\n")
    out = extract_pdf_text(body)
    # separate BT..ET blocks are separate lines by design
    assert out["pages"][0] == "part one \npart two"


def test_incremental_update_later_definition_wins():
    data = encode_pdf([["original text"]])
    update = (b"\n3 0 obj\n<< /Type /Page /Parent 2 0 R "
              b"/Contents 9 0 R >>\nendobj\n"
              b"9 0 obj\n<< /Length 22 >>\nstream\n"
              b"BT (replaced text) Tj ET\nendstream\nendobj\n")
    # page object 4 is the original page in encode_pdf's numbering;
    # appending a new definition of IT must win
    page_redef = update.replace(b"3 0 obj", b"4 0 obj")
    out = extract_pdf_text(data + page_redef)
    assert out["pages"][0] == "replaced text"


def test_refusals_and_errors():
    with pytest.raises(PdfError, match="missing %PDF"):
        extract_pdf_text(b"not a pdf")
    with pytest.raises(PdfError, match="no pages"):
        extract_pdf_text(encode_pdf(PAGES)[:200])
    enc = encode_pdf(PAGES).replace(
        b"/Root 1 0 R >>", b"/Root 1 0 R /Encrypt << /V 2 >> >>")
    with pytest.raises(PdfError, match="Encrypt"):
        extract_pdf_text(enc)
    # exotic filter on a CONTENT stream refuses by name (CCITT image
    # XObjects decode via llm/fax_codec; a fax-coded content stream
    # is not a thing this engine serves)
    c = zlib.compress(b"BT (x) Tj ET")
    body = (b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Contents 4 0 R >>\nendobj\n"
            b"4 0 obj\n<< /Length " + str(len(c)).encode()
            + b" /Filter /CCITTFaxDecode >>\nstream\n" + c
            + b"\nendstream\nendobj\n"
            b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n")
    with pytest.raises(PdfError, match="CCITTFaxDecode"):
        extract_pdf_text(body)


def test_spark_operator(spark):
    rows = [
        (1, bytearray(encode_pdf([["alpha beta"]], compress=True))),
        (2, bytearray(encode_pdf([["one"], ["two"]], xref_stream=True))),
        (3, bytearray(b"%PDF-1.4 truncated garbage")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    got = {r["doc_id"]: r for r in pdf_extract(df).collect()}
    assert got[1]["text"] == "alpha beta" and got[1]["n_pages"] == 1
    assert got[2]["text"] == "one\ftwo" and got[2]["n_pages"] == 2
    assert got[3]["decoded_ok"] is False


@pytest.mark.parametrize("kw", [
    dict(cid_font=True),
    dict(cid_font=True, compress=True),
    dict(cid_font=True, xref_stream=True, compress=True),
])
def test_cid_font_tounicode_roundtrip(kw):
    """Composite Type0/Identity-H text shows as 2-byte CID hex strings
    and is only recoverable through the /ToUnicode CMap — a latin-1
    walk would emit raw CID garbage. Non-ASCII included."""
    pages = [["héllo wörld 日本語", "second line"], ["page two"]]
    out = extract_pdf_text(encode_pdf(pages, **kw))
    assert out["pages"][0] == "héllo wörld 日本語\nsecond line"
    assert out["pages"][1] == "page two"


def test_cid_font_without_tounicode_refuses_by_name():
    import re as _re

    data = _re.sub(rb"/ToUnicode \d+ 0 R ", b"",
                   encode_pdf([["abc"]], cid_font=True))
    with pytest.raises(PdfError, match="Type0.*without /ToUnicode"):
        extract_pdf_text(data)


def test_cid_incrementing_bfrange_and_simple_font_cmap():
    """The incrementing-destination bfrange form (hand CMap: codes
    1..3 → 'A'..'C'), which the fixture writer never emits."""
    cmap = (b"1 begincodespacerange <0000> <FFFF> endcodespacerange\n"
            b"1 beginbfrange <0001> <0003> <0041> endbfrange\n")
    content = b"BT /F1 12 Tf <000100020003> Tj ET"
    body = (b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Resources "
            b"<< /Font << /F1 5 0 R >> >> /Contents 4 0 R >>\nendobj\n"
            b"4 0 obj\n<< /Length " + str(len(content)).encode()
            + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
            b"5 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /X "
            b"/Encoding /Identity-H /ToUnicode 6 0 R >>\nendobj\n"
            b"6 0 obj\n<< /Length " + str(len(cmap)).encode()
            + b" >>\nstream\n" + cmap + b"\nendstream\nendobj\n"
            b"trailer\n<< /Size 7 /Root 1 0 R >>\n%%EOF\n")
    assert extract_pdf_text(body)["pages"][0] == "ABC"


def test_obj_pattern_inside_stream_does_not_clobber():
    """Bytes that look like 'N G obj' INSIDE a stream payload must not
    overwrite the real object N (compressed payloads contain arbitrary
    byte patterns at 100 TB scale)."""
    # the page object in encode_pdf's numbering is 4; hide a fake
    # redefinition of it inside the content stream's payload
    poison = b"BT (real text) Tj ET % 4 0 obj << /Contents 99 0 R >> x"
    body = (b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
            b"4 0 obj\n<< /Length " + str(len(poison)).encode()
            + b" >>\nstream\n" + poison + b"\nendstream\nendobj\n"
            b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n")
    out = extract_pdf_text(body)
    assert out["pages"][0] == "real text"


def test_obj_pattern_inside_indirect_length_stream_does_not_clobber():
    """Round-10 ADVICE regression: when /Length is an INDIRECT ref the
    payload span only resolves after other objects load — a fake
    'N G obj' inside such a stream must still not clobber the real
    object N (requires the fixed-point span pass)."""
    poison = b"BT (real text) Tj ET % 3 0 obj << /Contents 99 0 R >> x"
    body = (b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
            b"4 0 obj\n<< /Length 5 0 R >>\nstream\n" + poison
            + b"\nendstream\nendobj\n"
            b"5 0 obj\n" + str(len(poison)).encode() + b"\nendobj\n"
            b"trailer\n<< /Size 6 /Root 1 0 R >>\n%%EOF\n")
    out = extract_pdf_text(body)
    assert out["pages"][0] == "real text"


FILTER_SPECS = ["flate", "lzw", "ahx", "a85", "rl",
                "flate+ahx", "lzw+a85", "rl+flate"]


@pytest.mark.parametrize("spec", FILTER_SPECS)
def test_stream_filters_roundtrip(spec):
    data = encode_pdf(PAGES, content_filter=spec)
    base = extract_pdf_text(encode_pdf(PAGES))
    assert extract_pdf_text(data)["text"] == base["text"]
    # same through the xref-stream generation
    d2 = encode_pdf(PAGES, content_filter=spec, xref_stream=True)
    assert extract_pdf_text(d2)["text"] == base["text"]


def test_ascii85_edge_cases():
    from verified_sources_spark.llm.pdf_codec import _a85_decode
    import base64

    for payload in [b"", b"a", b"ab", b"abc", b"abcd", b"abcde",
                    b"\x00\x00\x00\x00", b"\x00" * 9, bytes(range(256))]:
        enc = base64.a85encode(payload) + b"~>"
        assert _a85_decode(enc) == payload
    # 'z' shortcut + whitespace tolerated
    assert _a85_decode(b"z\n z~>") == b"\x00" * 8
    with pytest.raises(PdfError, match="lone trailing digit"):
        _a85_decode(b"zA~>")
    with pytest.raises(PdfError, match="byte"):
        _a85_decode(b"\x7f~>")


def test_runlength_edge_cases():
    from verified_sources_spark.llm.pdf_codec import _rl_decode, _rl_encode

    for payload in [b"", b"x", b"aaaa", b"abcabc", b"a" * 300,
                    b"ab" + b"c" * 130 + b"de", bytes(range(256)) * 2]:
        assert _rl_decode(_rl_encode(payload)) == payload
    with pytest.raises(PdfError, match="truncated RunLength"):
        _rl_decode(b"\x05ab")


def test_png_predictor_stride_and_bpp():
    """PNG /Predictor row stride is ceil(columns*colors*bpc/8) — a
    1-bit image whose Columns is not a multiple of 8 still pads rows
    to byte boundaries — and the Sub/Paeth 'left' offset is the PNG
    bytes-per-pixel, not always 1 byte (8-bit RGB looks back 3)."""
    import random

    from verified_sources_spark.llm.pdf_codec import _apply_predictor

    def png_filter(rows, bpp, ftypes):
        # independent forward implementation straight from the PNG spec
        out, prev = bytearray(), bytes(len(rows[0]))
        for row, ft in zip(rows, ftypes):
            out.append(ft)
            for i, x in enumerate(row):
                a = row[i - bpp] if i >= bpp else 0
                b, c = prev[i], (prev[i - bpp] if i >= bpp else 0)
                if ft == 0:
                    pr = 0
                elif ft == 1:
                    pr = a
                elif ft == 2:
                    pr = b
                elif ft == 3:
                    pr = (a + b) >> 1
                else:
                    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    pr = a if pa <= pb and pa <= pc else (
                        b if pb <= pc else c)
                out.append((x - pr) & 0xFF)
            prev = row
        return bytes(out)

    rng = random.Random(12)
    # 1-bit, Columns=10 -> stride ceil(10/8)=2 (floor gives 1: garbage)
    rows = [bytes(rng.randrange(256) for _ in range(2)) for _ in range(6)]
    pm = {"Predictor": 15, "Colors": 1, "BitsPerComponent": 1,
          "Columns": 10}
    enc = png_filter(rows, 1, [0, 1, 2, 3, 4, 2])
    assert _apply_predictor(pm, enc) == b"".join(rows)
    # 8-bit RGB, Columns=5 -> stride 15, bpp=3 (left is 3 bytes back)
    rows = [bytes(rng.randrange(256) for _ in range(15)) for _ in range(4)]
    pm = {"Predictor": 15, "Colors": 3, "BitsPerComponent": 8,
          "Columns": 5}
    enc = png_filter(rows, 3, [1, 4, 3, 1])
    assert _apply_predictor(pm, enc) == b"".join(rows)


def _gray_fixture(w=24, h=16, seed=7):
    import numpy as np

    rng = np.random.default_rng(seed)
    coarse = rng.integers(0, 256, size=(4, 6))
    gray = coarse[(np.arange(h) * 4) // h][:, (np.arange(w) * 6) // w]
    return np.stack([gray] * 3, axis=2).astype(np.uint8).tobytes(), gray


def test_embedded_dct_image_matches_standalone_jpeg():
    from verified_sources_spark.llm.jpeg_codec import decode as jdec
    from verified_sources_spark.llm.jpeg_codec import encode as jenc
    from verified_sources_spark.llm.pdf_codec import extract_pdf_images

    rgb, _ = _gray_fixture()
    jpg = jenc(24, 16, rgb, quality=90)
    data = encode_pdf(PAGES, image={"width": 24, "height": 16,
                                    "data": jpg, "pdf_filter": "DCTDecode"})
    # text extraction unaffected by the image XObject + Do operator
    assert extract_pdf_text(data)["text"] == \
        extract_pdf_text(encode_pdf(PAGES))["text"]
    ims = extract_pdf_images(data)
    assert len(ims) == 1 and ims[0]["codec"] == "dct"
    assert ims[0]["pixels"] == jdec(jpg)["pixels"]


def test_embedded_raw_images_rgb_and_gray():
    from verified_sources_spark.llm.pdf_codec import extract_pdf_images

    rgb, gray = _gray_fixture()
    data = encode_pdf(PAGES, image={
        "width": 24, "height": 16, "data": zlib.compress(rgb),
        "pdf_filter": "FlateDecode"})
    ims = extract_pdf_images(data)
    assert ims[0]["codec"] == "raw" and ims[0]["pixels"] == rgb

    gb = bytes(gray.astype("uint8").ravel())
    data = encode_pdf(PAGES, image={
        "width": 24, "height": 16, "data": zlib.compress(gb),
        "pdf_filter": "FlateDecode", "colorspace": "DeviceGray"})
    ims = extract_pdf_images(data)
    assert ims[0]["pixels"][0::3] == gb and ims[0]["pixels"] == rgb


def test_image_refusals_and_dims_check():
    from verified_sources_spark.llm.pdf_codec import extract_pdf_images
    from verified_sources_spark.llm.jpeg_codec import encode as jenc

    rgb, _ = _gray_fixture()
    with pytest.raises(PdfError, match="JPXDecode"):
        extract_pdf_images(encode_pdf(PAGES, image={
            "width": 4, "height": 4, "data": b"x",
            "pdf_filter": "JPXDecode"}))
    # declared dims disagreeing with the JPEG's own SOF dims refuse
    jpg = jenc(24, 16, rgb, quality=90)
    with pytest.raises(PdfError, match="disagree"):
        extract_pdf_images(encode_pdf(PAGES, image={
            "width": 23, "height": 16, "data": jpg,
            "pdf_filter": "DCTDecode"}))
    with pytest.raises(PdfError, match="short sample data"):
        extract_pdf_images(encode_pdf(PAGES, image={
            "width": 24, "height": 16, "data": zlib.compress(rgb[:10]),
            "pdf_filter": "FlateDecode"}))


def test_pdf_images_operator(spark):
    from verified_sources_spark.llm.pdf_codec import pdf_images
    from verified_sources_spark.llm.jpeg_codec import encode as jenc

    rgb, _ = _gray_fixture()
    rows = [
        (0, bytearray(encode_pdf(PAGES, image={
            "width": 24, "height": 16, "data": jenc(24, 16, rgb, quality=90),
            "pdf_filter": "DCTDecode"}))),
        (1, bytearray(encode_pdf(PAGES))),          # no images
        (2, bytearray(b"not a pdf")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    got = {r.doc_id: r for r in pdf_images(df).collect()}
    assert got[0].decoded_ok and got[0].codec == "dct" \
        and got[0].dhash is not None
    assert got[1].decoded_ok and got[1].image_idx is None
    assert not got[2].decoded_ok


def test_encrypted_pdfs_with_empty_user_password_decrypt():
    """The common owner-password-only case: all four standard-handler
    generations decrypt to the same text as the plain file; a wrong /U
    (= a real user password) refuses by name."""
    import re as _re

    from verified_sources_spark.llm.pdf_codec import (
        encode_pdf as enc, extract_pdf_images,
    )

    pages = [["Hello encrypted world", "second line été"],
             ["page two content"]]
    plain = extract_pdf_text(enc(pages, compress=True))
    for mode in ("rc4-40", "rc4-128", "aesv2", "aes256"):
        data = enc(pages, compress=True, encrypt=mode)
        assert b"Hello encrypted world" not in data  # really encrypted
        out = extract_pdf_text(data)
        assert out["pages"] == plain["pages"], mode
    # images inside an encrypted PDF decrypt too (stream payloads)
    data = enc([["fig"]], encrypt="aesv2",
               image={"width": 4, "height": 2,
                      "data": zlib.compress(bytes(range(24))),
                      "pdf_filter": "FlateDecode"})
    ims = extract_pdf_images(data)
    assert len(ims) == 1 and ims[0]["pixels"] == bytes(range(24))
    # a non-empty user password is unknowable: refuse by name
    data = enc(pages, encrypt="rc4-128")
    m = _re.search(rb"/U <([0-9a-f]+)>", data)
    bad = data[:m.start(1)] + b"00" * (len(m.group(1)) // 2) + data[m.end(1):]
    with pytest.raises(PdfError, match="password-protected"):
        extract_pdf_text(bad)


def test_pdf_crypt_fips_and_rc4_vectors():
    """The AES seam is pinned to FIPS-197 Appendix C vectors; RC4 to
    the classic Key/Plaintext vector — a wrong constant cannot hide."""
    from verified_sources_spark.llm.pdf_crypt import (
        _aes_cbc, aes_available, rc4,
    )

    assert rc4(b"Key", b"Plaintext").hex().upper() == "BBF316E8D940AF0AD3"
    if not aes_available():
        pytest.skip("cryptography package not present")
    pt = bytes.fromhex("00112233445566778899aabbccddeeff")
    assert _aes_cbc(bytes(range(16)), bytes(16), pt, True).hex() == \
        "69c4e0d86a7b0430d8cdb78070b4c55a"
    assert _aes_cbc(bytes(range(32)), bytes(16), pt, True).hex() == \
        "8ea2b7ca516745bfeafc49904b496089"
