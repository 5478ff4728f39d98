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


# --- r15: WET/WAT conversion- and metadata-record doors --------------------


def _wet_buffer(gz=False):
    import json

    recs = [
        encode_record(warc_type="warcinfo", block=b"sw: t"),
        encode_record(warc_type="request", uri="http://x.test/a",
                      block=b"GET /a HTTP/1.1\r\nHost: x.test\r\n\r\n"),
        encode_record(warc_type="conversion", uri="http://x.test/a",
                      block="page one text".encode(),
                      extra_headers={"Content-Type": "text/plain",
                                     "WARC-Refers-To": "<urn:uuid:a>"}),
        encode_record(warc_type="response", uri="http://x.test/a",
                      block=http_response_block(b"<p>poison</p>")),
        encode_record(warc_type="conversion", uri="http://x.test/b",
                      block="текст стр".encode("windows-1251"),
                      extra_headers={
                          "Content-Type":
                              "text/plain; charset=windows-1251"}),
        encode_record(warc_type="metadata", uri="http://x.test/a",
                      block=json.dumps({"Envelope": {
                          "Payload-Metadata": {
                              "HTTP-Response-Metadata": {
                                  "Response-Message": {"Status": "301"},
                                  "HTML-Metadata": {
                                      "Head": {"Title": "A"},
                                      "Links": [{}, {}, {}]}}}}}).encode()),
    ]
    return encode_warc(recs, gzip_members=gz)


def test_sniff_warc_flavor():
    """The flavor comes from the first non-warcinfo record's type —
    filenames lie; warcinfo-only and unparseable buffers stay 'warc'."""
    from verified_sources_spark.llm.warc import sniff_warc_flavor

    wet = encode_warc([
        encode_record(warc_type="warcinfo", block=b"x: y"),
        encode_record(warc_type="conversion", block=b"t")])
    wat = encode_warc([
        encode_record(warc_type="metadata", block=b"{}")])
    warc = encode_warc([_resp_record()])
    assert sniff_warc_flavor(wet) == "wet"
    assert sniff_warc_flavor(wat) == "wat"
    assert sniff_warc_flavor(warc) == "warc"
    assert sniff_warc_flavor(encode_warc([
        encode_record(warc_type="warcinfo", block=b"x: y")])) == "warc"
    assert sniff_warc_flavor(b"WARC/1.0\r\ngarbage") == "warc"


def test_docrouter_routes_warc_flavors_by_name():
    """A plain WET buffer must NOT walk like text into the document
    surface (the r14-verdict gap: it would ingest verbatim, WARC
    headers and all) — all three flavors refuse by name toward their
    extract surfaces."""
    from verified_sources_spark.llm.docrouter import (
        DocRouteError, extract_document, sniff_document,
    )

    pure_wet = encode_warc([
        encode_record(warc_type="warcinfo", block=b"x: y"),
        encode_record(warc_type="conversion", block=b"page text")])
    assert sniff_document(pure_wet) == "wet"
    # the interleaved fixture leads with a request record — that is the
    # real .warc layout (request/response/metadata per capture), and
    # first-non-warcinfo is what keeps a true WARC from misrouting
    assert sniff_document(_wet_buffer()) == "warc"
    assert sniff_document(encode_warc([_resp_record()])) == "warc"
    assert sniff_document(encode_warc([
        encode_record(warc_type="metadata", block=b"{}")])) == "wat"
    with pytest.raises(DocRouteError, match="wet.*wet_extract"):
        extract_document(pure_wet)
    with pytest.raises(DocRouteError, match="warc.*warc_extract"):
        extract_document(_wet_buffer())


def test_wet_extract_spark_operator(spark):
    """Only conversion records ingest (one row each, in order); the
    request/response/metadata/warcinfo siblings count as skipped; the
    declared-charset record decodes un-mojibaked; corrupt archives and
    conversion-free (response-flavor) archives isolate as
    decoded_ok=false instead of yielding nothing."""
    from verified_sources_spark.llm.warc import wet_extract

    rows = [
        (1, bytearray(_wet_buffer(gz=False))),
        (2, bytearray(_wet_buffer(gz=True))),
        (3, bytearray(_wet_buffer()[:40])),
        (4, bytearray(encode_warc([_resp_record()]))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, asset binary")
    got = {}
    for r in wet_extract(df).collect():
        got.setdefault(r["doc_id"], []).append(r)
    for did in (1, 2):
        a, b = sorted(got[did], key=lambda r: r["record_idx"])
        assert a["text"] == "page one text" and a["charset"] == "utf-8"
        assert a["refers_to"] == "<urn:uuid:a>"
        assert b["text"] == "текст стр" and b["charset"] == "cp1251"
        assert b["decode_clean"] is True
        assert a["n_conversion"] == 2 and a["n_skipped"] == 4
        assert a["uri"] == "http://x.test/a"
        assert b["uri"] == "http://x.test/b"
    (r3,) = got[3]
    assert r3["decoded_ok"] is False and r3["text"] is None
    (r4,) = got[4]
    assert r4["decoded_ok"] is False and r4["n_conversion"] == 0
    assert r4["n_skipped"] == 1


def test_wat_extract_spark_operator(spark):
    """Metadata records surface their envelope fields typed; invalid
    JSON reports json_ok=false without failing the record; corrupt
    archives isolate."""
    import json

    from verified_sources_spark.llm.warc import wat_extract

    wat = encode_warc([
        encode_record(warc_type="warcinfo", block=b"x: y"),
        encode_record(warc_type="metadata", uri="http://x.test/a",
                      block=json.dumps({"Envelope": {
                          "Payload-Metadata": {
                              "HTTP-Response-Metadata": {
                                  "Response-Message": {"Status": "404"},
                                  "HTML-Metadata": {
                                      "Head": {"Title": "gone"},
                                      "Links": []}}}}}).encode()),
        encode_record(warc_type="metadata", uri="http://x.test/b",
                      block=b"{broken"),
        encode_record(warc_type="metadata", uri="http://x.test/c",
                      block=json.dumps({"Envelope": []}).encode()),
    ])
    df = spark.createDataFrame(
        [(1, bytearray(wat)), (2, bytearray(wat[:30]))],
        "doc_id long, asset binary")
    got = {}
    for r in wat_extract(df).collect():
        got.setdefault(r["doc_id"], []).append(r)
    a, b, c = sorted(got[1], key=lambda r: r["record_idx"])
    assert a["json_ok"] is True and a["http_status"] == 404
    assert a["n_links"] == 0 and a["title"] == "gone"
    assert a["n_metadata"] == 3 and a["n_skipped"] == 1
    assert b["json_ok"] is False and b["http_status"] is None
    # list at an envelope level: json_ok but every typed field null
    assert c["json_ok"] is True and c["http_status"] is None
    (r2,) = got[2]
    assert r2["decoded_ok"] is False


def test_wet_extract_bom_and_probed_charsets(spark):
    """The conversion decode runs the same precedence as response
    bodies: a BOM wins, and an UNDECLARED GB18030 block reaches the
    bare-charset probe instead of replace-decoding to mojibake."""
    import codecs

    from verified_sources_spark.llm.warc import wet_extract

    zh = "你好，世界。这是一段用于测试的中文文本"
    recs = [
        encode_record(warc_type="conversion", uri="http://x.test/bom",
                      block=codecs.BOM_UTF8 + "bom text".encode(),
                      extra_headers={"Content-Type": "text/plain"}),
        encode_record(warc_type="conversion", uri="http://x.test/zh",
                      block=zh.encode("gb18030"),
                      extra_headers={"Content-Type": "text/plain"}),
    ]
    df = spark.createDataFrame(
        [(1, bytearray(encode_warc(recs)))], "doc_id long, asset binary")
    a, b = sorted(wet_extract(df).collect(),
                  key=lambda r: r["record_idx"])
    assert a["text"] == "bom text" and a["charset"] == "utf-8-sig"
    assert b["text"] == zh and b["charset"] == "gb18030"
    assert b["decode_clean"] is True


def test_wet_conversion_text_ignores_quoted_meta_tag(spark):
    """A WET conversion record whose PROSE quotes an HTML meta tag
    (web-dev tutorials do) must decode by the plain-text precedence —
    BOM / record Content-Type / bare probe — never by the quoted tag
    (which would mojibake the rest of the record)."""
    from verified_sources_spark.llm.warc import wet_extract

    text = '<meta charset="shift_jis"> is how you declare — naïve café'
    rec = encode_record(warc_type="conversion", uri="http://x.test/t",
                        block=text.encode("utf-8"),
                        extra_headers={"Content-Type": "text/plain"})
    df = spark.createDataFrame(
        [(1, bytearray(encode_warc([rec])))], "doc_id long, asset binary")
    (row,) = wet_extract(df).collect()
    assert row["text"] == text
    assert row["charset"] == "utf-8" and row["decode_clean"] is True


def test_wat_status_outside_int32_reports_null(spark):
    """A hostile Status like '4294967296' must surface http_status
    null, not blow up the Arrow int32 batch (per-record isolation)."""
    import json

    from verified_sources_spark.llm.warc import wat_extract

    rec = encode_record(warc_type="metadata", uri="http://x.test/s",
                        block=json.dumps({"Envelope": {
                            "Payload-Metadata": {
                                "HTTP-Response-Metadata": {
                                    "Response-Message": {
                                        "Status": "4294967296"}}}}}
                                         ).encode())
    df = spark.createDataFrame(
        [(1, bytearray(encode_warc([rec])))], "doc_id long, asset binary")
    (row,) = wat_extract(df).collect()
    assert row["json_ok"] is True and row["http_status"] is None
