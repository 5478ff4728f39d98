"""WARC reader + HTML extraction (llm/warc.py): record walks over
plain and per-member-gzip archives, chunked/gzipped HTTP payloads,
boilerplate-dropping text extraction, honest truncation errors, and
the Spark warc_extract operator end-to-end."""

from __future__ import annotations

import gzip
import html as H

import pytest

from verified_sources_spark.llm.warc import (
    WarcError,
    encode_record,
    encode_warc,
    extract_text,
    http_payload,
    http_response_block,
    iter_records,
)

TEXT = "Hello <world> & friends\nsecond line\twith tabs"
HTML = (f"<html><head><title>t-1</title><script>var x='<p>';</script>"
        f"<style>p{{}}</style></head><body><p>{H.escape(TEXT)}</p>"
        f"<noscript>js off</noscript></body></html>")


def _resp_record(body=HTML.encode(), **kw):
    return encode_record(block=http_response_block(body, **kw),
                         uri="http://x.test/a")


def test_plain_and_gzip_member_archives():
    recs = [encode_record(warc_type="warcinfo", block=b"software: t"),
            _resp_record(),
            encode_record(warc_type="request", block=b"GET / HTTP/1.1\r\n")]
    for gz in (False, True):
        out = list(iter_records(encode_warc(recs, gzip_members=gz)))
        assert [h["WARC-Type"] for h, _ in out] == [
            "warcinfo", "response", "request"]
        assert out[1][0]["WARC-Target-URI"] == "http://x.test/a"
        assert out[1][0]["WARC-Version"] == "WARC/1.0"


@pytest.mark.parametrize("kw", [dict(), dict(chunked=True),
                                dict(gzip_body=True),
                                dict(chunked=True, gzip_body=True),
                                dict(encoding="x-gzip"),
                                dict(encoding="deflate"),
                                dict(encoding="deflate-raw"),
                                dict(chunked=True, encoding="deflate")])
def test_http_payload_wire_variants(kw):
    (_h, block), = iter_records(_resp_record(**kw))
    status, headers, body = http_payload(block)
    assert status == 200 and headers["content-type"] == "text/html"
    assert body == HTML.encode()


def test_http_payload_refuses_unknown_encoding():
    # 'br' decodes through the libbrotli seam now; 'compress' (LZW,
    # never implemented by any stdlib) remains the named refusal
    from verified_sources_spark.llm.warc import WarcError

    block = http_response_block(HTML.encode())
    block = block.replace(
        b"Content-Length", b"Content-Encoding: compress\r\nContent-Length"
    )
    with pytest.raises(WarcError, match="Content-Encoding 'compress'"):
        http_payload(block)


def test_extract_text_drops_boilerplate():
    title, text = extract_text(HTML, collapse=False)
    assert title == "t-1"
    assert text == TEXT  # script/style/noscript gone, entities unescaped
    title, text = extract_text(HTML, collapse=True)
    assert text == "Hello <world> & friends second line with tabs"


def test_whole_archive_layouts_the_stub_never_emits():
    """Hand-tweaked wire details: WARC/1.1 version, inter-record CRLF
    padding, a 404 status, extra WARC headers."""
    rec = _resp_record(status=404)
    rec = rec.replace(b"WARC/1.0", b"WARC/1.1", 1)
    data = b"\r\n\r\n" + rec + b"\r\n\r\n" + encode_record(
        warc_type="metadata", block=b"k: v",
        extra_headers={"WARC-Concurrent-To": "<urn:uuid:9>"})
    out = list(iter_records(data))
    assert out[0][0]["WARC-Version"] == "WARC/1.1"
    assert http_payload(out[0][1])[0] == 404
    assert out[1][0]["WARC-Concurrent-To"] == "<urn:uuid:9>"


def test_error_paths():
    rec = _resp_record()
    with pytest.raises(WarcError, match="not a WARC record"):
        list(iter_records(b"HTTP/1.1 200 OK\r\n\r\n"))
    with pytest.raises(WarcError, match="truncated WARC block"):
        list(iter_records(rec[: len(rec) - 30]))
    with pytest.raises(WarcError, match="truncated gzip member"):
        list(iter_records(gzip.compress(rec)[:20]))
    with pytest.raises(WarcError, match="missing Content-Length"):
        list(iter_records(b"WARC/1.0\r\nWARC-Type: x\r\n\r\n"))
    with pytest.raises(WarcError, match="truncated chunk"):
        (_h, block), = iter_records(_resp_record(chunked=True))
        http_payload(block[: len(block) - 10])
    with pytest.raises(WarcError, match="truncated HTTP body"):
        (_h, block), = iter_records(_resp_record())
        http_payload(block[: len(block) - 5])


def test_detect_charset_precedence():
    from verified_sources_spark.llm.warc import detect_charset

    # BOM beats header
    assert detect_charset({"content-type": "text/html; charset=latin-1"},
                          b"\xef\xbb\xbfhi") == ("utf-8-sig", "bom")
    assert detect_charset(None, b"\xff\xfeh\x00")[0] == "utf-16"
    # header charset, with quotes and mixed case
    assert detect_charset(
        {"content-type": 'text/html; charset="Windows-1251"'}, b"x"
    ) == ("cp1251", "http-header")
    # meta sniff when header has no charset
    body = b'<html><head><meta charset="Shift_JIS"><title>t</title>'
    assert detect_charset({"content-type": "text/html"}, body) == (
        "shift_jis", "meta")
    # http-equiv form
    body = (b'<html><head><meta http-equiv="Content-Type" '
            b'content="text/html; charset=ISO-8859-1">')
    assert detect_charset({}, body) == ("iso8859-1", "meta")
    # unknown label falls through to default
    assert detect_charset(
        {"content-type": "text/html; charset=utf8-general-nonsense"}, b"x"
    ) == ("utf-8", "default")
    assert detect_charset({}, b"plain") == ("utf-8", "default")


@pytest.mark.parametrize("codec,label,text", [
    ("iso-8859-1", "ISO-8859-1", "café déjà vu"),
    ("cp1251", "windows-1251", "привет мир"),
    ("shift_jis", "Shift_JIS", "こんにちは世界"),
    ("gbk", "GBK", "你好世界"),
    ("euc_jp", "EUC-JP", "日本語テキスト"),
    ("gb18030", "GB18030", "你好，世界 𝄞"),
    ("big5", "Big5", "繁體中文測試"),
    ("iso2022_jp", "ISO-2022-JP", "日本語メール"),
])
def test_decode_body_recovers_legacy_charsets(codec, label, text):
    """The mojibake regression: decoding these bodies as hard-coded
    UTF-8 would garble every non-ASCII char; honoring the declared
    charset recovers the original text byte-for-byte."""
    from verified_sources_spark.llm.warc import decode_body

    raw = text.encode(codec)
    assert raw.decode("utf-8", errors="replace") != text  # would mojibake
    got, cs, clean = decode_body(
        {"content-type": f"text/html; charset={label}"}, raw)
    assert (got, clean) == (text, True)
    # meta-only declaration path
    page = (f'<meta charset="{label}">{text}').encode(codec)
    got2, cs2, clean2 = decode_body({"content-type": "text/html"}, page)
    assert text in got2 and clean2 and cs2 == cs


def test_decode_body_flags_dirty_decodes():
    from verified_sources_spark.llm.warc import decode_body

    # bytes invalid for the declared charset: replace, flag dirty
    got, cs, clean = decode_body(
        {"content-type": "text/html; charset=utf-8"}, b"\x80\xffab")
    assert clean is False and got.endswith("ab")  # decoded with replacement
    # undeclared non-UTF-8 body: the round-13 bare-charset probe
    # recovers it exactly (cp1252 ⊇ latin-1 for these bytes) instead
    # of the old utf-8-replace garble
    got, cs, clean = decode_body({}, "café".encode("iso-8859-1"))
    assert got == "café" and cs == "cp1252" and clean is True
    # truly undecodable bytes still flag dirty, never crash
    got, cs, clean = decode_body({}, bytes(range(256)) * 2)
    assert clean is False


def test_warc_extract_charset_columns(spark):
    """End-to-end: a Shift_JIS page with header-declared charset comes
    out clean and un-mojibaked through the Spark operator."""
    from verified_sources_spark.llm.warc import warc_extract

    text = "日本語のページ"
    body = (f"<html><head><title>t</title></head>"
            f"<body>{text}</body></html>").encode("shift_jis")
    rec = encode_record(block=http_response_block(
        body, content_type="text/html; charset=Shift_JIS"))
    df = spark.createDataFrame(
        [(1, bytearray(encode_warc([rec])))], "doc_id long, asset binary")
    (row,) = warc_extract(df).collect()
    assert row["text"] == text
    assert row["charset"] == "shift_jis" and row["decode_clean"] is True


def test_warc_extract_spark_operator(spark):
    """End-to-end over Spark: mixed wire layouts land documents-shaped
    rows; corrupt archives isolate as decoded_ok=false."""
    from verified_sources_spark.llm.warc import warc_extract

    def archive(i, text, gz):
        body = (f"<html><head><title>doc-{i}</title></head>"
                f"<body>{H.escape(text)}</body></html>").encode()
        rec = encode_record(uri=f"http://x.test/{i}",
                            block=http_response_block(body, chunked=i % 2 == 0))
        return encode_warc([rec], gzip_members=gz)

    rows = [
        (1, bytearray(archive(1, "alpha beta", False))),
        (2, bytearray(archive(2, "gamma & delta", True))),
        (3, bytearray(b"corrupt bytes not warc")),
        (4, bytearray(archive(4, "", True))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    got = {r["doc_id"]: r for r in warc_extract(df).collect()}
    assert got[1]["text"] == "alpha beta" and got[1]["status"] == 200
    assert got[2]["text"] == "gamma & delta"
    assert got[2]["uri"] == "http://x.test/2"
    assert got[3]["decoded_ok"] is False and got[3]["text"] is None
    assert got[4]["decoded_ok"] is True and got[4]["text"] == ""


def test_zstd_warc_and_content_encoding():
    """.warc.zst outer frames and RFC 8878 zstd Content-Encoding both
    decode through the libzstd seam; absent-library degrades to the
    named refusal (covered by the seam's own gate tests)."""
    from verified_sources_spark.llm.zstd_system import available

    if not available():
        import pytest

        pytest.skip("system libzstd not present")
    from verified_sources_spark.llm.warc import (
        encode_record, encode_warc, http_payload, http_response_block,
        iter_records,
    )

    body = b"<html><body><p>zstd page</p></body></html>"
    block = http_response_block(body, encoding="zstd")
    rec = encode_record(uri="http://e.com/1", block=block)
    info = encode_record(warc_type="warcinfo", block=b"sw: t")
    warc = encode_warc([info, rec], zstd_frames=True)
    recs = list(iter_records(warc))
    assert [h["WARC-Type"] for h, _ in recs] == ["warcinfo", "response"]
    status, hh, got = http_payload(recs[1][1])
    assert status == 200 and hh["content-encoding"] == "zstd"
    assert got == body
    # truncated zstd WARC refuses with the stream named
    import pytest

    from verified_sources_spark.llm.warc import WarcError

    with pytest.raises(WarcError, match="zstd"):
        list(iter_records(warc[: len(warc) // 2]))


def test_brotli_content_encoding():
    """RFC 7932 'br' bodies decode through the libbrotli seam."""
    from verified_sources_spark.llm.brotli_system import available

    if not available():
        import pytest

        pytest.skip("system libbrotli not present")
    import pytest

    from verified_sources_spark.llm.brotli_system import (
        BrotliError, compress, decompress,
    )
    from verified_sources_spark.llm.warc import (
        WarcError, http_payload, http_response_block,
    )

    body = "<html><body><p>br page é</p></body></html>".encode()
    block = http_response_block(body, encoding="br")
    status, hh, got = http_payload(block)
    assert status == 200 and hh["content-encoding"] == "br"
    assert got == body
    # seam contract: truncation + bomb + corrupt all refuse by name
    c = compress(b"x" * 100000)
    with pytest.raises(BrotliError, match="truncated"):
        decompress(c[: len(c) // 2])
    with pytest.raises(BrotliError, match="bomb"):
        decompress(compress(bytes(3_000_000)), max_out=10_000)
    with pytest.raises(BrotliError, match="corrupt"):
        decompress(b"\xff\xff not brotli data at all......")
    # a corrupt declared-br body surfaces as a WarcError
    raw = (b"HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\n"
           b"\x00\x11garbage")
    with pytest.raises(WarcError, match="brotli"):
        http_payload(raw)
