"""Property-based tests (hypothesis) for the round-11 codec layer:
fax (all four CCITT flavors), CFB containers, shard codecs, 7z,
markdown and notebook extraction — roundtrip and never-misdecode
invariants over arbitrary inputs, the same posture as
test_codec_properties.py."""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from verified_sources_spark.llm import fax_codec
from verified_sources_spark.llm.archives import (
    ArchiveError, decompress_shard, encode_shard,
)
from verified_sources_spark.llm.cfb import CfbError, encode_cfb, list_streams
from verified_sources_spark.llm.sevenzip import (
    SevenZipError, encode_7z, iter_7z_members,
)

_fast = settings(max_examples=25, deadline=None)


# ---------------------------------------------------------------- fax

@_fast
@given(
    w=st.integers(1, 200),
    h=st.integers(1, 8),
    flavor=st.sampled_from(["rle", "g3", "g3-2d", "g4"]),
    density=st.floats(0.0, 1.0),
    seed=st.integers(0, 2**31 - 1),
)
def test_fax_roundtrip_any_bitmap(w, h, flavor, density, seed):
    import random

    rng = random.Random(seed)
    rows = [bytes(1 if rng.random() < density else 0 for _ in range(w))
            for _ in range(h)]
    enc = {"rle": fax_codec.encode_rle, "g3": fax_codec.encode_g3,
           "g3-2d": fax_codec.encode_g3_2d,
           "g4": fax_codec.encode_g4}[flavor]
    dec = {"rle": fax_codec.decode_rle, "g3": fax_codec.decode_g3,
           "g3-2d": fax_codec.decode_g3_2d,
           "g4": fax_codec.decode_g4}[flavor]
    assert dec(enc(rows), w, h) == rows


@_fast
@given(junk=st.binary(min_size=0, max_size=64),
       w=st.integers(1, 64), h=st.integers(1, 4))
def test_fax_junk_never_misdecodes(junk, w, h):
    """Arbitrary bytes either decode to exactly h full rows or raise
    FaxError — never hang, never return short/long rows."""
    for dec in (fax_codec.decode_rle, fax_codec.decode_g3,
                fax_codec.decode_g3_2d, fax_codec.decode_g4):
        try:
            rows = dec(junk, w, h)
        except fax_codec.FaxError:
            continue
        assert len(rows) == h and all(len(r) == w for r in rows)
        assert all(b in (0, 1) for r in rows for b in r)


# ---------------------------------------------------------------- CFB

@_fast
@given(
    names=st.lists(st.text(
        alphabet=st.characters(min_codepoint=48, max_codepoint=122),
        min_size=1, max_size=20), min_size=1, max_size=6, unique=True),
    sizes=st.lists(st.integers(0, 9000), min_size=6, max_size=6),
    seed=st.integers(0, 2**31 - 1),
)
def test_cfb_roundtrip_any_streams(names, sizes, seed):
    import random

    rng = random.Random(seed)
    streams = {n: bytes(rng.randrange(256) for _ in range(sz))
               for n, sz in zip(names, sizes)}
    assert list_streams(encode_cfb(streams)) == streams


@_fast
@given(junk=st.binary(min_size=0, max_size=512),
       pad=st.booleans())
def test_cfb_junk_never_hangs(junk, pad):
    """Both truncated headers AND full-size headers with junk bodies
    must raise CfbError — a raw struct.error here would escape the
    office operators' error isolation and fail a Spark task (the
    exact bug this fuzz originally caught)."""
    data = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + junk
    if pad:
        data = data.ljust(704, b"\xa5")
    with pytest.raises(CfbError):
        list_streams(data)


# ------------------------------------------------------------- shards

@_fast
@given(
    text=st.binary(min_size=0, max_size=5000),
    codec=st.sampled_from(["gzip", "xz", "bz2", "zstd", "lz4"]),
    cut=st.floats(0.1, 0.9),
)
def test_shard_roundtrip_and_truncation(text, codec, cut):
    if codec in ("zstd", "lz4"):
        from verified_sources_spark.llm.lz4_system import (
            available as lz4a,
        )
        from verified_sources_spark.llm.zstd_system import (
            available as zsta,
        )

        if not (zsta() if codec == "zstd" else lz4a()):
            return
    sh = encode_shard(text, codec)
    assert decompress_shard(sh) == text
    trunc = sh[: max(4, int(len(sh) * cut))]
    if trunc != sh:
        try:
            out = decompress_shard(trunc)
            # a truncated stream may only "succeed" with a PREFIX of
            # the true text (gzip member boundaries); never garbage
            assert text.startswith(out)
        except ArchiveError:
            pass


# ----------------------------------------------------------------- 7z

@_fast
@given(
    names=st.lists(st.text(
        alphabet=st.characters(min_codepoint=48, max_codepoint=122),
        min_size=1, max_size=12), min_size=1, max_size=5, unique=True),
    sizes=st.lists(st.integers(0, 4000), min_size=5, max_size=5),
    codec=st.sampled_from(["copy", "lzma1", "lzma2"]),
    eh=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_7z_roundtrip_any_members(names, sizes, codec, eh, seed):
    import random

    rng = random.Random(seed)
    members = {n: bytes(rng.randrange(256) for _ in range(sz))
               for n, sz in zip(names, sizes)}
    d = encode_7z(members, codec=codec, encoded_header=eh)
    assert dict(iter_7z_members(d)) == members


@_fast
@given(junk=st.binary(min_size=0, max_size=256))
def test_7z_junk_never_hangs(junk):
    with pytest.raises(SevenZipError):
        dict(iter_7z_members(b"7z\xbc\xaf\x27\x1c" + junk))


# ---------------------------------------------------- text extractors

@_fast
@given(text=st.text(max_size=2000))
def test_markdown_never_raises_on_any_text(text):
    """Markdown degrades gracefully by design: any utf-8 text must
    extract without raising, and fenced content must never appear in
    the prose."""
    from verified_sources_spark.llm.markdown import markdown_extract

    out = markdown_extract(text.encode())
    assert isinstance(out["text"], str)
    assert "```" not in out["text"]


@_fast
@given(junk=st.binary(min_size=0, max_size=256))
def test_notebook_junk_refuses_cleanly(junk):
    from verified_sources_spark.llm.notebooks import (
        NotebookError, notebook_cells,
    )

    try:
        cells = notebook_cells(junk)
    except NotebookError:
        return
    assert isinstance(cells, list)


@_fast
@given(junk=st.binary(min_size=0, max_size=2048))
def test_office_binary_junk_refuses_cleanly(junk):
    """Random bytes planted as the format streams of a VALID CFB
    container must raise the format's own error type (never a raw
    struct/IndexError that would fail a Spark task)."""
    from verified_sources_spark.llm.pptdoc import PptError, ppt_units
    from verified_sources_spark.llm.worddoc import DocError, doc_units
    from verified_sources_spark.llm.xlsdoc import XlsError, xls_units

    d = encode_cfb({"WordDocument": junk, "1Table": junk})
    try:
        units = doc_units(d)
        assert isinstance(units, list)
    except DocError:
        pass
    d = encode_cfb({"Workbook": junk})
    try:
        units = xls_units(d)
        assert isinstance(units, list)
    except XlsError:
        pass
    d = encode_cfb({"PowerPoint Document": junk})
    try:
        units = ppt_units(d)
        assert isinstance(units, list)
    except PptError:
        pass


@_fast
@given(junk=st.binary(min_size=0, max_size=1024))
def test_pdf_junk_refuses_cleanly(junk):
    """pdf_extract isolates on PdfError ONLY — any other exception
    from the object loader would fail a Spark task."""
    from verified_sources_spark.llm.pdf_codec import (
        PdfError, extract_pdf_text,
    )

    try:
        out = extract_pdf_text(b"%PDF-1.4\n" + junk)
        assert isinstance(out, dict)
    except PdfError:
        pass


@_fast
@given(junk=st.binary(min_size=0, max_size=1024))
def test_warc_junk_refuses_cleanly(junk):
    from verified_sources_spark.llm.warc import WarcError, iter_records

    try:
        for _h, _b in iter_records(b"WARC/1.0\r\n" + junk):
            pass
    except WarcError:
        pass


@_fast
@given(junk=st.binary(min_size=0, max_size=1024))
def test_email_junk_refuses_cleanly(junk):
    from verified_sources_spark.llm.email_ingest import (
        EmailError, parse_eml,
    )

    try:
        out = parse_eml(b"Subject: x\r\n" + junk)
        assert isinstance(out, dict)
    except EmailError:
        pass


@_fast
@given(junk=st.binary(min_size=0, max_size=1024))
def test_feed_and_svg_junk_refuse_cleanly(junk):
    from verified_sources_spark.llm.feeds import FeedError, feed_entries
    from verified_sources_spark.llm.svg_codec import SvgError, probe

    try:
        out = feed_entries(b'<rss version="2.0">' + junk)
        assert isinstance(out, list)
    except FeedError:
        pass
    try:
        out = probe(b"<svg " + junk)
        assert isinstance(out, dict)
    except SvgError:
        pass
