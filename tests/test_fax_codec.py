"""CCITT Group 3 / Group 4 fax codec (llm/fax_codec) — self
round-trips for all three flavors, BOTH-direction cross-checks against
system libtiff (capability-gated), the TIFF strip integration
(llm/tiff_codec COMPRESSION 2/3/4 + encode_bilevel), the PDF
/CCITTFaxDecode image path, and the named refusals.

The T.4 code tables in fax_codec were derived empirically from libtiff
by tools/derive_t4_tables.py; these tests re-anchor the decoder and
encoder to that same independent implementation at every run where
libtiff is present, so a transcription error can never ride along
silently."""

from __future__ import annotations

import ctypes
import random
import struct

import pytest

from verified_sources_spark.llm import fax_codec as fx
from verified_sources_spark.llm.fax_codec import FaxError


def _rand_rows(rng: random.Random, w: int, h: int, p: float) -> list[bytes]:
    return [bytes(1 if rng.random() < p else 0 for _ in range(w))
            for _ in range(h)]


def test_round_trips_all_flavors():
    rng = random.Random(11)
    for _ in range(15):
        w = rng.choice([1, 7, 8, 63, 64, 100, 321, 1728])
        h = rng.randint(1, 10)
        rows = _rand_rows(rng, w, h, rng.choice([0.02, 0.3, 0.7, 0.98]))
        assert fx.decode_rle(fx.encode_rle(rows), w, h) == rows
        g3 = fx.encode_g3(rows)
        assert fx.decode_g3(g3, w, h) == rows
        assert fx.decode_g3(g3, w, None) == rows  # RTC-terminated
        g4 = fx.encode_g4(rows)
        assert fx.decode_g4(g4, w, h) == rows
        assert fx.decode_g4(g4, w, None) == rows  # EOFB-terminated
        for k in (1, 2, 4):
            g32 = fx.encode_g3_2d(rows, k=k)
            assert fx.decode_g3_2d(g32, w, h) == rows
            assert fx.decode_g3_2d(g32, w, None) == rows  # RTC


def test_extreme_rows():
    # all-white, all-black, and a >2560 run (chained 2560-makeups)
    for w in (8, 64, 2561, 6000):
        rows = [bytes(w), bytes([1]) * w]
        for enc, dec in [(fx.encode_rle, lambda d: fx.decode_rle(d, w, 2)),
                         (fx.encode_g3, lambda d: fx.decode_g3(d, w, 2)),
                         (fx.encode_g4, lambda d: fx.decode_g4(d, w, 2))]:
            assert dec(enc(rows)) == rows


def test_pack_unpack_row_bits():
    rng = random.Random(2)
    rows = _rand_rows(rng, 13, 3, 0.5)
    for black_is_1 in (False, True):
        packed = fx.pack_row_bits(rows, black_is_1=black_is_1)
        assert len(packed) == 2 * 3  # 13 bits -> 2-byte stride
        assert fx.unpack_row_bits(packed, 13, 3,
                                  black_is_1=black_is_1) == rows


def test_named_refusals():
    with pytest.raises(FaxError, match="exhausted"):
        fx.decode_rle(b"", 8, 1)
    with pytest.raises(FaxError, match="invalid white run"):
        # 0000000 000... is no prefix of any white code
        fx.decode_rle(bytes(20), 1728, 1)
    with pytest.raises(FaxError, match="ended after"):
        rows = [bytes(64)]
        fx.decode_g4(fx.encode_g4(rows), 64, 5)
    with pytest.raises(FaxError, match="uncompressed mode"):
        # G4 extension escape 0000000 1111 (uncompressed entry)
        fx.decode_g4(bytes([0b00000001, 0b11100000]), 64, 1)
    with pytest.raises(FaxError, match="overflows row"):
        fx.decode_rle(fx.encode_rle([bytes(64)]), 32, 1)


def test_table_shapes():
    # prefix-free per color alphabet, disjoint term/makeup keys
    for term, makeup in [(fx.WHITE_TERM, fx.WHITE_MAKEUP),
                         (fx.BLACK_TERM, fx.BLACK_MAKEUP)]:
        assert sorted(term) == list(range(64))
        assert sorted(makeup) == [64 * k for k in range(1, 41)]
        codes = list(term.values()) + list(makeup.values())
        assert len(set(codes)) == len(codes)
        for i, a in enumerate(codes):
            for b in codes[i + 1:]:
                assert not a.startswith(b) and not b.startswith(a)


# ---------------------------------------------------------------------------
# libtiff cross-check (capability-gated like the libwebp seam)

def _libtiff():
    try:
        lib = ctypes.CDLL("libtiff.so.6")
    except OSError:
        return None
    lib.TIFFOpen.restype = ctypes.c_void_p
    lib.TIFFOpen.argtypes = [ctypes.c_char_p, ctypes.c_char_p]
    lib.TIFFWriteEncodedStrip.restype = ctypes.c_long
    lib.TIFFWriteEncodedStrip.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_void_p, ctypes.c_long]
    lib.TIFFReadEncodedStrip.restype = ctypes.c_long
    lib.TIFFReadEncodedStrip.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_void_p, ctypes.c_long]
    lib.TIFFClose.argtypes = [ctypes.c_void_p]
    return lib


def _libtiff_write(lib, tmp_path, rows, w, h, compression) -> bytes:
    """Encode with libtiff; return the raw strip bytes."""
    path = str(tmp_path / "w.tif").encode()
    tif = lib.TIFFOpen(path, b"w")
    assert tif
    t = ctypes.c_void_p(tif)
    for tag, val in [(256, w), (257, h), (258, 1), (259, compression),
                     (262, 0), (277, 1), (278, h), (284, 1)]:
        assert lib.TIFFSetField(t, ctypes.c_uint32(tag), val) == 1, tag
    raw = fx.pack_row_bits(rows, black_is_1=True)
    buf = ctypes.create_string_buffer(raw, len(raw))
    assert lib.TIFFWriteEncodedStrip(t, 0, buf, len(raw)) > 0
    lib.TIFFClose(t)
    data = open(path, "rb").read()
    off = struct.unpack("<I", data[4:8])[0]
    nent = struct.unpack("<H", data[off:off + 2])[0]
    fields = {}
    for i in range(nent):
        e = data[off + 2 + 12 * i: off + 14 + 12 * i]
        tag, _typ, _cnt = struct.unpack("<HHI", e[:8])
        fields[tag] = struct.unpack("<I", e[8:12])[0]
    return data[fields[273]:fields[273] + fields[279]]


def _libtiff_read(lib, tmp_path, strip, w, h, compression) -> list[bytes]:
    """Decode OUR strip bytes with libtiff via a minimal container."""
    stride = (w + 7) // 8
    entries = [(256, 3, w), (257, 3, h), (258, 3, 1), (259, 3, compression),
               (262, 3, 0), (273, 4, 8), (277, 3, 1), (278, 3, h),
               (279, 4, len(strip)), (284, 3, 1)]
    ifd_off = 8 + len(strip) + (len(strip) % 2)
    out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off) + strip)
    out += b"\x00" * (len(strip) % 2)
    out += struct.pack("<H", len(entries))
    for tag, typ, val in entries:
        out += struct.pack("<HHII", tag, typ, 1, val)
    out += struct.pack("<I", 0)
    path = str(tmp_path / "r.tif").encode()
    open(path, "wb").write(out)
    tif = lib.TIFFOpen(path, b"r")
    assert tif
    t = ctypes.c_void_p(tif)
    buf = ctypes.create_string_buffer(stride * h)
    n = lib.TIFFReadEncodedStrip(t, 0, buf, stride * h)
    lib.TIFFClose(t)
    assert n == stride * h
    return fx.unpack_row_bits(buf.raw[:stride * h], w, h, black_is_1=True)


@pytest.mark.parametrize("comp", [2, 3, 4], ids=["rle", "g3", "g4"])
def test_cross_check_libtiff_both_directions(comp, tmp_path):
    lib = _libtiff()
    if lib is None:
        pytest.skip("system libtiff not present")
    dec = {2: fx.decode_rle, 3: fx.decode_g3, 4: fx.decode_g4}[comp]
    enc = {2: fx.encode_rle, 3: fx.encode_g3, 4: fx.encode_g4}[comp]
    rng = random.Random(7 + comp)
    for _ in range(8):
        w = rng.choice([8, 40, 64, 100, 321, 1728])
        h = rng.randint(1, 8)
        rows = _rand_rows(rng, w, h, rng.choice([0.05, 0.4, 0.9]))
        # libtiff encode -> our decode
        strip = _libtiff_write(lib, tmp_path, rows, w, h, comp)
        assert dec(strip, w, h) == rows
        # our encode -> libtiff decode
        assert _libtiff_read(lib, tmp_path, enc(rows), w, h, comp) == rows


def test_cross_check_libtiff_g3_2d(tmp_path):
    """FAX3 + GROUP3OPT_2DENCODING (T4Options bit 0), both directions."""
    lib = _libtiff()
    if lib is None:
        pytest.skip("system libtiff not present")
    rng = random.Random(77)
    for _ in range(6):
        w = rng.choice([8, 64, 100, 321, 1728])
        h = rng.randint(1, 8)
        rows = _rand_rows(rng, w, h, rng.choice([0.05, 0.4, 0.9]))
        # libtiff encode (with 2D option) -> our decode
        path = str(tmp_path / "w2d.tif").encode()
        tif = lib.TIFFOpen(path, b"w")
        t = ctypes.c_void_p(tif)
        for tag, val in [(256, w), (257, h), (258, 1), (259, 3),
                         (262, 0), (277, 1), (278, h), (284, 1), (292, 1)]:
            assert lib.TIFFSetField(t, ctypes.c_uint32(tag), val) == 1
        raw = fx.pack_row_bits(rows, black_is_1=True)
        buf = ctypes.create_string_buffer(raw, len(raw))
        assert lib.TIFFWriteEncodedStrip(t, 0, buf, len(raw)) > 0
        lib.TIFFClose(t)
        data = open(path, "rb").read()
        off = struct.unpack("<I", data[4:8])[0]
        nent = struct.unpack("<H", data[off:off + 2])[0]
        fields = {}
        for i in range(nent):
            e = data[off + 2 + 12 * i: off + 14 + 12 * i]
            tag, _typ, _cnt = struct.unpack("<HHI", e[:8])
            fields[tag] = struct.unpack("<I", e[8:12])[0]
        strip = data[fields[273]:fields[273] + fields[279]]
        assert fx.decode_g3_2d(strip, w, h) == rows
        # our encode -> libtiff decode (minimal container + tag 292)
        for k in (2, 4):
            ours = fx.encode_g3_2d(rows, k=k)
            stride = (w + 7) // 8
            ents = [(256, 3, w), (257, 3, h), (258, 3, 1), (259, 3, 3),
                    (262, 3, 0), (273, 4, 8), (277, 3, 1), (278, 3, h),
                    (279, 4, len(ours)), (284, 3, 1), (292, 4, 1)]
            ifd_off = 8 + len(ours) + (len(ours) % 2)
            out = bytearray(b"II*\x00" + struct.pack("<I", ifd_off)
                            + ours + b"\x00" * (len(ours) % 2))
            out += struct.pack("<H", len(ents))
            for tag, typ, val in ents:
                out += struct.pack("<HHII", tag, typ, 1, val)
            out += struct.pack("<I", 0)
            rpath = str(tmp_path / "r2d.tif").encode()
            open(rpath, "wb").write(out)
            tif = lib.TIFFOpen(rpath, b"r")
            t = ctypes.c_void_p(tif)
            buf = ctypes.create_string_buffer(stride * h)
            n = lib.TIFFReadEncodedStrip(t, 0, buf, stride * h)
            lib.TIFFClose(t)
            assert n == stride * h
            assert fx.unpack_row_bits(buf.raw[:stride * h], w, h,
                                      black_is_1=True) == rows


# ---------------------------------------------------------------------------
# TIFF integration (llm/tiff_codec COMPRESSION 2/3/4)

def test_tiff_bilevel_round_trip():
    from verified_sources_spark.llm.tiff_codec import (
        decode, encode_bilevel, probe,
    )

    rng = random.Random(3)
    for comp, name in [("rle", "CCITT-RLE"), ("g3", "CCITT-G3"),
                       ("g4", "CCITT-G4")]:
        w, h = 41, 13
        bits = bytes(1 if rng.random() < 0.4 else 0 for _ in range(w * h))
        for bo in ("II", "MM"):
            t = encode_bilevel(w, h, bits, comp, byte_order=bo,
                               rows_per_strip=5)
            m = probe(t)
            assert (m["width"], m["height"], m["compression"]) == (w, h, name)
            assert m["bits_per_sample"] == [1]
            d = decode(t)
            want = b"".join(b"\x00\x00\x00" if b else b"\xff\xff\xff"
                            for b in bits)
            assert (d["width"], d["height"], d["mode"]) == (w, h, "RGB")
            assert d["pixels"] == want


def test_tiff_g3_2d_round_trip():
    """COMPRESSION_CCITTFAX3 with T4Options bit 0 (mixed 1D/2D) —
    encode_bilevel('g3-2d') sets the option and decode honors it."""
    from verified_sources_spark.llm.tiff_codec import decode, encode_bilevel

    rng = random.Random(23)
    w, h = 52, 11
    bits = bytes(1 if rng.random() < 0.35 else 0 for _ in range(w * h))
    t = encode_bilevel(w, h, bits, "g3-2d", rows_per_strip=4)
    assert struct.pack("<HHI", 0x0124, 4, 1) in t  # T4Options present
    want = b"".join(b"\x00\x00\x00" if b else b"\xff\xff\xff" for b in bits)
    assert decode(t)["pixels"] == want


def test_tiff_ccitt_refusals():
    from verified_sources_spark.llm.tiff_codec import (
        TiffError, decode, encode_bilevel,
    )

    t = bytearray(encode_bilevel(16, 4, bytes(64), "g3"))
    # T4Options tag (0x0124) value bit 1 = uncompressed mode
    i = t.index(struct.pack("<HHI", 0x0124, 4, 1))
    t[i + 8] = 2
    with pytest.raises(TiffError, match="uncompressed mode"):
        decode(bytes(t))
    with pytest.raises(TiffError, match="truncated strip"):
        decode(encode_bilevel(16, 4, bytes(64), "g4")[:-3])


def test_tiff_decode_libtiff_written_ccitt(tmp_path):
    """A real libtiff-authored CCITT TIFF file decodes through the
    top-level tiff_codec.decode dispatch (not just the strip layer)."""
    lib = _libtiff()
    if lib is None:
        pytest.skip("system libtiff not present")
    from verified_sources_spark.llm.tiff_codec import decode

    rng = random.Random(19)
    w, h = 100, 9
    rows = _rand_rows(rng, w, h, 0.35)
    for comp in (2, 3, 4):
        path = str(tmp_path / f"c{comp}.tif").encode()
        tif = lib.TIFFOpen(path, b"w")
        t = ctypes.c_void_p(tif)
        for tag, val in [(256, w), (257, h), (258, 1), (259, comp),
                         (262, 0), (277, 1), (278, h), (284, 1)]:
            assert lib.TIFFSetField(t, ctypes.c_uint32(tag), val) == 1
        raw = fx.pack_row_bits(rows, black_is_1=True)
        buf = ctypes.create_string_buffer(raw, len(raw))
        assert lib.TIFFWriteEncodedStrip(t, 0, buf, len(raw)) > 0
        lib.TIFFClose(t)
        d = decode(open(path, "rb").read())
        want = b"".join(b"\x00\x00\x00" if b else b"\xff\xff\xff"
                        for row in rows for b in row)
        assert d["pixels"] == want


# ---------------------------------------------------------------------------
# PDF /CCITTFaxDecode image path

def _pdf_scan(w, h, data, parms):
    from verified_sources_spark.llm.pdf_codec import encode_pdf

    return encode_pdf([["scan"]], image={
        "width": w, "height": h, "data": data,
        "pdf_filter": "CCITTFaxDecode", "colorspace": "DeviceGray",
        "bpc": 1, "decode_parms": parms})


def test_pdf_ccitt_images_decode():
    from verified_sources_spark.llm.pdf_codec import extract_pdf_images

    rng = random.Random(5)
    w, h = 48, 20
    bits = bytes(1 if rng.random() < 0.3 else 0 for _ in range(w * h))
    rows = [bits[y * w:(y + 1) * w] for y in range(h)]
    want = b"".join(b"\x00\x00\x00" if b else b"\xff\xff\xff" for b in bits)
    cases = [
        (fx.encode_g4(rows), f"<< /K -1 /Columns {w} /Rows {h} >>"),
        (fx.encode_g3(rows), f"<< /K 0 /Columns {w} /Rows {h} >>"),
        (fx.encode_rle(rows),
         f"<< /K 0 /Columns {w} /Rows {h} /EncodedByteAlign true >>"),
        # K>0: mixed 1D/2D rows (a 1D anchor every K rows)
        (fx.encode_g3_2d(rows, k=4), f"<< /K 4 /Columns {w} /Rows {h} >>"),
        # /Rows omitted: falls back to /Height
        (fx.encode_g4(rows), f"<< /K -1 /Columns {w} >>"),
    ]
    for data, parms in cases:
        ims = extract_pdf_images(_pdf_scan(w, h, data, parms))
        assert len(ims) == 1
        assert ims[0]["codec"] == "ccitt"
        assert (ims[0]["width"], ims[0]["height"]) == (w, h)
        assert ims[0]["pixels"] == want


def test_pdf_ccitt_refusals():
    from verified_sources_spark.llm.pdf_codec import (
        PdfError, extract_pdf_images,
    )

    with pytest.raises(PdfError, match="Columns 1728 != /Width 48"):
        extract_pdf_images(_pdf_scan(48, 4, b"\x00" * 8, "<< /K -1 >>"))
    with pytest.raises(PdfError, match="bad CCITT stream"):
        # T.6 extension escape 0000000 — refuses through the wrapper
        extract_pdf_images(_pdf_scan(48, 4, bytes([0b00000001, 0b11100000]),
                                     "<< /K -1 /Columns 48 >>"))


def test_multipage_bilevel_roundtrip():
    """Chained-IFD multi-page fax TIFFs: every page decodes by index,
    out-of-range pages refuse."""
    from verified_sources_spark.llm.tiff_codec import (
        TiffError, decode, encode_multipage_bilevel, probe,
    )

    rng = random.Random(41)
    pages = []
    for p in range(3):
        w, h = 24 + 8 * p, 10 + 4 * p
        pages.append((w, h, bytes(1 if rng.random() < 0.3 else 0
                                  for _ in range(w * h))))
    for comp in ("rle", "g3", "g3-2d", "g4"):
        t = encode_multipage_bilevel(pages, comp, rows_per_strip=4)
        assert probe(t)["n_pages"] == 3
        for i, (w, h, bits) in enumerate(pages):
            d = decode(t, page=i)
            want = b"".join(b"\x00\x00\x00" if b else b"\xff\xff\xff"
                            for b in bits)
            assert (d["width"], d["height"]) == (w, h)
            assert d["pixels"] == want
    with pytest.raises(TiffError, match="out of range"):
        decode(encode_multipage_bilevel(pages[:1]), page=3)


def test_tiff_pages_spark_operator(spark):
    """Per-page explosion: same page content in two documents dedups
    by page dHash; corrupt files isolate."""
    from verified_sources_spark.llm.image_dedup import tiff_pages
    from verified_sources_spark.llm.tiff_codec import (
        encode_multipage_bilevel,
    )

    rng = random.Random(6)
    w, h = 32, 16
    shared = bytes(1 if rng.random() < 0.4 else 0 for _ in range(w * h))
    other = bytes(1 if rng.random() < 0.4 else 0 for _ in range(w * h))
    rows = [
        (1, bytearray(encode_multipage_bilevel(
            [(w, h, shared), (w, h, other)], "g4"))),
        (2, bytearray(encode_multipage_bilevel([(w, h, shared)], "rle"))),
        (3, bytearray(b"not a tiff")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    got: dict = {}
    for r in tiff_pages(df).collect():
        got.setdefault(r["doc_id"], []).append(r)
    assert [r["page_idx"] for r in got[1]] == [0, 1]
    assert all(r["n_pages"] == 2 for r in got[1])
    # page-level dedup: doc 1 page 0 == doc 2 page 0 by dHash
    assert got[1][0]["dhash"] == got[2][0]["dhash"]
    assert got[1][1]["dhash"] != got[2][0]["dhash"]
    (r3,) = got[3]
    assert r3["decoded_ok"] is False and r3["n_pages"] is None
