"""Deterministic mutation fuzzing of every ingestion front door.

At 100 TB the corpus WILL contain truncated, bit-flipped and
spliced files; the engine's contract is REFUSE-OR-ROW — each decoder
either succeeds or raises its own named error type.  Any other
exception (struct.error, IndexError, UnicodeDecodeError, infinite
loop) escapes the operators' isolation nets and fails whole tasks.

This net takes each fixture encoder's output and applies a
deterministic mutation battery (truncations at spread offsets, single
byte flips, zero-fill windows, splices of another format's bytes) —
~60 mutants per format — asserting every decode either returns or
raises an allowed error.  Seeds are pinned; failures reproduce.
"""

from __future__ import annotations

import random

import pytest


def _mutants(payload: bytes, seed: int = 7, n_each: int = 15):
    rng = random.Random(seed)
    n = len(payload)
    out = []
    # truncations spread over the file (always including tiny heads)
    cuts = sorted({1, 2, 8, n // 4, n // 2, 3 * n // 4, n - 1}
                  | {rng.randrange(1, max(2, n)) for _ in range(n_each)})
    out += [payload[:c] for c in cuts if 0 < c < n]
    # single byte flips
    for _ in range(n_each):
        i = rng.randrange(n)
        b = bytearray(payload)
        b[i] ^= 1 << rng.randrange(8)
        out.append(bytes(b))
    # zero-fill windows
    for _ in range(n_each // 2):
        i = rng.randrange(n)
        w = min(n - i, rng.randrange(1, 64))
        b = bytearray(payload)
        b[i : i + w] = bytes(w)
        out.append(bytes(b))
    # cross-format splice: foreign magic at the front
    for magic in (b"\x89PNG\r\n\x1a\n", b"PK\x03\x04", b"%PDF-1.4\n"):
        out.append(magic + payload[len(magic):])
    return out


def _battery(encode, decode, allowed, seed=7):
    payload = encode()
    assert len(payload) > 16
    decode(payload)  # the unmutated fixture must decode
    for i, mut in enumerate(_mutants(payload, seed=seed)):
        try:
            decode(mut)
        except allowed:
            pass
        except Exception as e:  # noqa: BLE001 — the assertion itself
            raise AssertionError(
                f"mutant {i} escaped the refusal net: "
                f"{type(e).__name__}: {e}") from e


def test_fuzz_warc():
    from verified_sources_spark.llm.warc import (
        WarcError, encode_record, encode_warc, http_response_block,
        iter_records,
    )

    def enc():
        recs = [encode_record(uri=f"http://e/{i}",
                              block=http_response_block(
                                  b"<html><body><p>x</p></body></html>",
                                  chunked=i % 2 == 0))
                for i in range(3)]
        return encode_warc(recs, gzip_members=True)

    _battery(enc, lambda d: list(iter_records(d)), (WarcError,))


def test_fuzz_pdf():
    from verified_sources_spark.llm.pdf_codec import (
        PdfError, encode_pdf, extract_pdf_text,
    )

    _battery(lambda: encode_pdf([["text line", "another"]],
                                compress=True, encrypt="rc4-128"),
             extract_pdf_text, (PdfError,))


def test_fuzz_jbig2_pdf_image():
    from verified_sources_spark.llm.jbig2 import (
        Jbig2Error, decode_jbig2_embedded, encode_jbig2_mmr,
    )
    from verified_sources_spark.llm.fax_codec import FaxError

    rows = [bytes([i % 2] * 24) for i in range(16)]
    _battery(lambda: encode_jbig2_mmr(rows),
             decode_jbig2_embedded, (Jbig2Error, FaxError))

    # arithmetic (MQ) generic regions: the MQ coder itself never
    # fails on garbage bits (it decodes SOME bitmap), so the net
    # asserts the container walk refuses-or-rows, never crashes
    from verified_sources_spark.llm.jbig2 import encode_jbig2_arith

    _battery(lambda: encode_jbig2_arith(rows, tpgdon=True),
             decode_jbig2_embedded, (Jbig2Error,), seed=5)

    # symbol dictionary + text region: IADH/IADW/IAEX/IAID walks,
    # height classes, strip placement — mutants must refuse as
    # Jbig2Error or decode SOME page, never escape/hang
    from verified_sources_spark.llm.jbig2 import (
        encode_jbig2_symbol_text,
    )

    syms = [[bytes([(x + y + k) % 2 for x in range(3 + k % 3)])
             for y in range(3 + k // 2)] for k in range(4)]
    insts = [(0, 0, 0), (5, 0, 1), (10, 0, 2), (1, 7, 3), (8, 7, 0)]
    _battery(lambda: encode_jbig2_symbol_text(syms, insts, (16, 14)),
             decode_jbig2_embedded, (Jbig2Error,), seed=61)
    # and the globals split: mutate the GLOBALS stream under an
    # intact page stream
    g0, p0 = encode_jbig2_symbol_text(syms, insts, (16, 14),
                                      in_globals=True)
    _battery(lambda: g0,
             lambda d: decode_jbig2_embedded(p0, globals_data=d),
             (Jbig2Error,), seed=67)

    # pattern dictionary + halftone region: collective-bitmap slice,
    # Gray-coded bitplanes, grid placement
    from verified_sources_spark.llm.jbig2 import encode_jbig2_halftone

    pats = [[bytes(1 if (x + y * 3) % 3 < lvl else 0
                   for x in range(3)) for y in range(3)]
            for lvl in range(4)]
    _battery(lambda: encode_jbig2_halftone(
        [[0, 1, 2], [3, 2, 0]], pats),
        decode_jbig2_embedded, (Jbig2Error,), seed=71)


def test_fuzz_office():
    from verified_sources_spark.llm.office import (
        OfficeError, encode_docx, extract_office,
    )

    _battery(lambda: encode_docx(["para one", "para two"],
                                 tables=[[["a", "b"]]],
                                 footnotes=["note"]),
             extract_office, (OfficeError,))


def test_fuzz_legacy_doc():
    from verified_sources_spark.llm.office import (
        OfficeError, extract_office,
    )
    from verified_sources_spark.llm.worddoc import DocError, encode_doc
    from verified_sources_spark.llm.cfb import CfbError

    _battery(lambda: encode_doc(["legacy paragraph", "second"]),
             extract_office, (OfficeError, DocError, CfbError))


def test_fuzz_msg():
    from verified_sources_spark.llm.cfb import CfbError
    from verified_sources_spark.llm.msgdoc import MsgError, encode_msg, parse_msg

    _battery(lambda: encode_msg("Subj", "a@e.com", "body text",
                                attachments=[("f.txt", b"data")]),
             parse_msg, (MsgError, CfbError))


def test_fuzz_sevenzip():
    from verified_sources_spark.llm.sevenzip import (
        SevenZipError, encode_7z, iter_7z_members,
    )

    _battery(lambda: encode_7z({"a.txt": b"alpha" * 20,
                                "b.txt": b"beta"}, codec="lzma2"),
             lambda d: list(iter_7z_members(d)), (SevenZipError,))


def test_fuzz_mhtml():
    from verified_sources_spark.llm.mhtml import (
        MhtmlError, encode_mhtml, parse_mhtml,
    )

    _battery(lambda: encode_mhtml(
        "<html><body><p>page body</p></body></html>",
        resources=[("http://e/a.png", "image/png", bytes(16))]),
        parse_mhtml, (MhtmlError,))


def test_fuzz_latex():
    from verified_sources_spark.llm.latex import (
        LatexError, encode_latex, latex_extract,
    )

    _battery(lambda: encode_latex(
        "Title", [("S1", "prose one"), ("S2", "prose two")]),
        latex_extract, (LatexError,))


def test_fuzz_wikidump():
    from verified_sources_spark.llm.wikitext import (
        WikiError, encode_dump, iter_dump_pages, strip_wikitext,
    )

    def dec(d):
        for p in iter_dump_pages(d):
            strip_wikitext(p["wikitext"])

    _battery(lambda: encode_dump(
        [{"title": "A", "wikitext": "{{t|x}} '''b''' [[c|d]]"},
         {"title": "B", "wikitext": "== h ==\nprose"}]),
        dec, (WikiError,))


def test_fuzz_jats_se_chat():
    import json

    from verified_sources_spark.llm.chatlog import (
        ChatError, parse_conversation,
    )
    from verified_sources_spark.llm.jats import (
        JatsError, encode_jats, jats_extract,
    )
    from verified_sources_spark.llm.sedump import (
        SeDumpError, encode_posts, iter_posts,
    )

    _battery(lambda: encode_jats("T", "abstract",
                                 [("S", "prose body")]),
             jats_extract, (JatsError,))
    _battery(lambda: encode_posts(
        [{"post_id": 1, "post_type": 1, "title": "Q",
          "body_html": "<p>q</p>", "tags": ["a"]},
         {"post_id": 2, "post_type": 2, "parent_id": 1,
          "body_html": "<p>a</p>"}]),
        lambda d: list(iter_posts(d)), (SeDumpError,))

    rec = json.dumps({"messages": [
        {"role": "user", "content": "question text"},
        {"role": "assistant", "content": "answer text"}]}).encode()
    _battery(lambda: rec,
             lambda d: parse_conversation(
                 d.decode("utf-8", "replace")),
             (ChatError,))


def test_fuzz_tabular_and_epub():
    from verified_sources_spark.llm.ebook import (
        EbookError, encode_epub, extract_epub,
    )
    from verified_sources_spark.llm.tabular import (
        TabularError, encode_delimited, parse_delimited,
    )

    _battery(lambda: encode_delimited(
        [["1", 'a "q", x\ny'], ["2", "plain"]], header=["id", "v"]),
        parse_delimited, (TabularError,))
    _battery(lambda: encode_epub([("C1", "chapter body text")]),
             extract_epub, (EbookError,))


def test_fuzz_tiff_fax():
    from verified_sources_spark.llm.tiff_codec import (
        TiffError, decode, encode_multipage_bilevel, probe,
    )
    from verified_sources_spark.llm.fax_codec import FaxError

    def enc():
        import numpy as np

        rng = np.random.default_rng(1)
        bits = (rng.integers(0, 256, size=(16, 24)) < 128
                ).astype(np.uint8)
        return encode_multipage_bilevel(
            [(24, 16, bits.tobytes())] * 2, compression="g4")

    def dec(d):
        n = probe(d)["n_pages"]
        for p in range(n):
            decode(d, page=p)

    _battery(enc, dec, (TiffError, FaxError))


def test_fuzz_png_bmp_gif():
    from verified_sources_spark.llm.bmp_codec import BmpError
    from verified_sources_spark.llm.gif_codec import GifError
    from verified_sources_spark.llm.image_io import decode_image
    from verified_sources_spark.llm.png_codec import PngError

    import numpy as np

    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)

    from verified_sources_spark.llm.png_codec import encode as penc

    _battery(lambda: penc(16, 12, px.tobytes()), decode_image,
             (PngError, ValueError))

    from verified_sources_spark.llm.bmp_codec import encode as benc

    _battery(lambda: benc(16, 12, px.tobytes()), decode_image,
             (BmpError, ValueError))

    from verified_sources_spark.llm.gif_codec import encode as genc

    _battery(lambda: genc(16, 12, px.tobytes()), decode_image,
             (GifError, ValueError))


def test_fuzz_jpeg():
    from verified_sources_spark.llm.jpeg_codec import (
        JpegError, decode, encode,
    )

    import numpy as np

    rng = np.random.default_rng(4)
    px = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    _battery(lambda: encode(16, 16, px.tobytes(), quality=85),
             decode, (JpegError, ValueError))


def test_fuzz_wav_flac():
    from verified_sources_spark.llm.flac_codec import FlacError
    from verified_sources_spark.llm.wav_codec import WavError

    import numpy as np

    rng = np.random.default_rng(6)
    pcm = (rng.normal(size=400) * 0.2).clip(-1, 1)

    from verified_sources_spark.llm.wav_codec import (
        decode as wdec, encode as wenc,
    )

    _battery(lambda: wenc(pcm, 8000), wdec, (WavError, ValueError))

    from verified_sources_spark.llm.flac_codec import (
        decode as fdec, encode as fenc,
    )

    ints = [int(x) for x in (pcm * 32767).astype(np.int64)]
    _battery(lambda: fenc(ints, 8000), fdec, (FlacError, ValueError))


def test_fuzz_mp4_webm_avi_probes():
    from verified_sources_spark.llm.video_io import probe_video

    allowed = (ValueError, NotImplementedError)

    from verified_sources_spark.llm.mp4_codec import encode_stub as m4

    _battery(lambda: m4(codec=b"avc1"), probe_video, allowed)

    from verified_sources_spark.llm.webm_codec import encode_stub as wm

    _battery(lambda: wm(), probe_video, allowed)

    import numpy as np

    from verified_sources_spark.llm.avi_codec import encode as avienc

    _battery(lambda: avienc(
        [np.zeros((12, 16, 3), np.uint8)] * 2, 10.0, 16, 12),
        probe_video, allowed)


def test_fuzz_ico_aiff_ogg_mp3():
    import numpy as np

    from verified_sources_spark.llm.aiff_codec import (
        AiffError, decode as adec, encode as aenc,
    )
    from verified_sources_spark.llm.ico_codec import (
        IcoError, decode as idec, encode as ienc,
    )
    from verified_sources_spark.llm.mp3_codec import (
        Mp3Error, encode_stub as m3enc, probe as m3probe,
    )
    from verified_sources_spark.llm.ogg_codec import (
        OggError, encode_stub as oenc, probe as oprobe,
    )

    rng = np.random.default_rng(8)
    px = rng.integers(0, 256, size=(16, 16, 4), dtype=np.uint8)
    _battery(lambda: ienc(16, 16, px.tobytes()), idec,
             (IcoError, ValueError))
    pcm = (rng.normal(size=300) * 0.2).clip(-1, 1)
    _battery(lambda: aenc(pcm, 8000), adec, (AiffError, ValueError))
    _battery(lambda: oenc(), oprobe, (OggError, ValueError))
    _battery(lambda: m3enc(), m3probe, (Mp3Error, ValueError))


def test_fuzz_structured_text_doors():
    from verified_sources_spark.llm.feeds import (
        FeedError, encode_rss, feed_entries,
    )
    from verified_sources_spark.llm.heif_codec import (
        HeifError, encode_stub as henc, probe as hprobe,
    )
    from verified_sources_spark.llm.notebooks import (
        NotebookError, encode_notebook, notebook_cells,
    )
    from verified_sources_spark.llm.subtitles import (
        SubtitleError, encode_srt, parse_subtitles,
    )
    from verified_sources_spark.llm.svg_codec import (
        SvgError, encode_svg, extract_text as svg_text,
    )

    _battery(lambda: encode_rss(
        [{"title": f"p{k}", "link": f"http://e/{k}",
          "description": f"<p>sum {k}</p>"} for k in range(3)]),
        feed_entries, (FeedError, ValueError))
    _battery(lambda: encode_notebook(
        [("markdown", "# head"), ("code", "x = 1\nprint(x)")]),
        notebook_cells, (NotebookError, ValueError))
    _battery(lambda: encode_svg(100, 60, ["hello svg", "line two"]),
             svg_text, (SvgError, ValueError))
    _battery(lambda: henc(320, 240), hprobe,
             (HeifError, ValueError))
    _battery(lambda: encode_srt(
        [(0, 1500, "cue one"), (2000, 3000, "cue two")]).encode(),
        lambda d: parse_subtitles(d.decode("utf-8", "replace")),
        (SubtitleError, ValueError))


def test_fuzz_eml_and_shards():
    from verified_sources_spark.llm.archives import (
        ArchiveError, decompress_shard, encode_shard,
    )
    from verified_sources_spark.llm.email_ingest import (
        EmailError, encode_eml, iter_attachments, parse_eml,
    )

    def enc():
        return encode_eml("Subj", "body\n", html_body="<p>h</p>",
                          attachments=[("a.txt", "text/plain",
                                        b"attachment data")])

    def dec(d):
        parse_eml(d)
        list(iter_attachments(d))

    # stdlib email is lenient by design: most mutants still parse —
    # the battery asserts nothing ESCAPES, not that mutants refuse
    _battery(enc, dec, (EmailError,))

    _battery(lambda: encode_shard(
        b"".join(b'{"id": %d}\n' % i for i in range(50)), "gzip"),
        decompress_shard, (ArchiveError,))
    _battery(lambda: encode_shard(b"line\n" * 40, "xz"),
             decompress_shard, (ArchiveError,))


def test_fuzz_pdf_images_path():
    from verified_sources_spark.llm.fax_codec import FaxError
    from verified_sources_spark.llm.jbig2 import encode_jbig2_mmr
    from verified_sources_spark.llm.pdf_codec import (
        PdfError, encode_pdf, extract_pdf_images,
    )

    rows = [bytes([i % 2] * 24) for i in range(16)]
    _battery(lambda: encode_pdf([["x"]], image={
        "width": 24, "height": 16, "bpc": 1,
        "colorspace": "DeviceGray", "pdf_filter": "JBIG2Decode",
        "data": encode_jbig2_mmr(rows)}),
        extract_pdf_images, (PdfError, FaxError))


def test_fuzz_ass_ttml():
    from verified_sources_spark.llm.subtitles import (
        SubtitleError, encode_ass, encode_ttml, parse_subtitles,
    )

    def dec(d):
        parse_subtitles(d.decode("utf-8", "replace"))

    _battery(lambda: encode_ass(
        [(1500, 3000, "cue one"), (4000, 5500, "cue two")]).encode(),
        dec, (SubtitleError,))
    _battery(lambda: encode_ttml(
        [(1500, 3000, "cue one"), (4000, 5500, "cue two")]).encode(),
        dec, (SubtitleError,))


def test_fuzz_datablob():
    """The columnar-blob door (parquet via pyarrow, avro via the
    repo's codec incl. the snappy block codec) under the mutation
    net — the one decoder family r12 left out of the battery."""
    from verified_sources_spark.llm.datablob import (
        DataBlobError, avro_rows_blob, parquet_rows_blob,
    )

    def enc_parquet():
        import io

        import pyarrow as pa
        import pyarrow.parquet as pq

        buf = io.BytesIO()
        pq.write_table(pa.table({
            "id": list(range(40)),
            "note": [f"row {i} text" for i in range(40)]}), buf)
        return buf.getvalue()

    _battery(enc_parquet, parquet_rows_blob, (DataBlobError,))

    def enc_orc():
        import io

        import pyarrow as pa
        import pyarrow.orc as orc

        buf = io.BytesIO()
        orc.write_table(pa.table({
            "id": list(range(40)),
            "note": [f"row {i} text" for i in range(40)]}), buf)
        return buf.getvalue()

    # SQLite blobs: upstream sqlite is famously fuzz-hardened; this
    # net asserts OUR wrapper converts every sqlite3.Error to the
    # named refusal, never lets one escape
    import sqlite3 as _sq

    from verified_sources_spark.llm.datablob import sqlite_tables_blob

    _con = _sq.connect(":memory:")
    _con.execute("CREATE TABLE t (id INTEGER, s TEXT)")
    _con.executemany("INSERT INTO t VALUES (?,?)",
                     [(i, f"row {i} text") for i in range(30)])
    _sql_blob = _con.serialize()
    _con.close()
    _battery(lambda: _sql_blob, sqlite_tables_blob,
             (DataBlobError,), seed=73)

    from verified_sources_spark.llm.datablob import orc_rows_blob

    _battery(enc_orc, orc_rows_blob, (DataBlobError,), seed=17)

    from verified_sources_spark.operators.avro_codec import (
        write_container,
    )

    schema = {"type": "record", "name": "R", "fields": [
        {"name": "id", "type": "long"},
        {"name": "note", "type": "string"}]}
    recs = [{"id": i, "note": f"row {i} " * 6} for i in range(40)]
    for codec in ("null", "deflate", "snappy"):
        _battery(lambda c=codec: write_container(schema, recs, codec=c),
                 avro_rows_blob, (DataBlobError,), seed=11)


def test_fuzz_tfrecord():
    """TFRecord shards under the mutation net: the double masked-CRC
    framing means every flip/truncation/zero-fill refuses by name."""
    from verified_sources_spark.llm.tfrecord import (
        TfRecordError, encode_example, encode_tfrecord, iter_tfrecord,
        parse_example,
    )

    def enc():
        return encode_tfrecord(
            [encode_example({"text": [f"doc {i} body".encode()],
                             "id": [i], "w": [0.5 * i]})
             for i in range(30)])

    def dec(d):
        for rec in iter_tfrecord(d):
            parse_example(rec)

    _battery(enc, dec, (TfRecordError,), seed=23)


def test_fuzz_ics_vcf():
    from verified_sources_spark.llm.ics_vcf import (
        IcsVcfError, encode_ics, encode_vcf, parse_ics, parse_vcf,
    )

    def enc_ics():
        return encode_ics([
            {"uid": f"e{k}@x", "summary": f"event {k}, with; marks",
             "description": "line one\nline two",
             "dtstart": "20240301T100000Z",
             "dtend": "20240301T110000Z"} for k in range(4)])

    _battery(enc_ics, parse_ics, (IcsVcfError,), seed=29)

    def enc_tz():
        return encode_ics(
            [{"uid": "t@x", "summary": "tz",
              "dtstart": "20240331T013000", "dtstart_tzid": "City",
              "dtend": "20240331T033000", "dtend_tzid": "City"}],
            timezones=[{"tzid": "City", "observances": [
                {"kind": "DAYLIGHT", "dtstart": "19700329T020000",
                 "from": "+0100", "to": "+0200",
                 "rrule": "FREQ=YEARLY;BYMONTH=3;BYDAY=-1SU"},
                {"kind": "STANDARD", "dtstart": "19701025T030000",
                 "from": "+0200", "to": "+0100",
                 "rrule": "FREQ=YEARLY;BYMONTH=10;BYDAY=-1SU"}]}])

    # the VTIMEZONE walk (offsets, RRULE, onset arithmetic) under the
    # net: a mutated tz block must poison only its TZID, never escape
    # a raw ValueError from datetime()
    _battery(enc_tz, parse_ics, (IcsVcfError,), seed=53)
    _battery(lambda: encode_vcf([
        {"fn": f"P {k}", "org": "O; U", "title": "t" * 90,
         "emails": [f"p{k}@e.com"], "tels": ["+1"]}
        for k in range(4)]), parse_vcf, (IcsVcfError,), seed=31)


def test_fuzz_webdataset():
    from verified_sources_spark.llm.webdataset import (
        WdsError, encode_wds, iter_wds_samples,
    )
    from verified_sources_spark.llm.archives import ArchiveError

    def enc():
        return encode_wds([
            (f"{k:06d}", {"txt": f"sample {k} body".encode(),
                          "json": b'{"id": %d}' % k})
            for k in range(12)])

    _battery(enc, lambda d: list(iter_wds_samples(d)),
             (WdsError, ArchiveError), seed=37)


def test_fuzz_crawlgov():
    from verified_sources_spark.llm.crawlgov import (
        CrawlGovError, encode_robots, encode_sitemap, parse_robots,
        parse_sitemap,
    )

    _battery(lambda: encode_robots([
        {"agents": ["*"], "rules": [("disallow", "/private/"),
                                    ("allow", "/private/ok")],
         "crawl_delay": 2.0},
        {"agents": ["bot1"], "rules": [("disallow", "/tmp/*.pdf$")]},
    ], sitemaps=["https://e.com/sm.xml"]),
        parse_robots, (CrawlGovError,), seed=41)
    _battery(lambda: encode_sitemap(
        [{"loc": f"https://e.com/{k}", "lastmod": "2024-03-01"}
         for k in range(8)], gz=True),
        parse_sitemap, (CrawlGovError,), seed=43)

    # frontier expansion: mutate the ROOT INDEX while the children
    # stay intact — every escape path must stay a CrawlGovError
    # (corrupt XML, entries pointing at unfetched children, …)
    from verified_sources_spark.llm.crawlgov import expand_host

    base = "http://h.example.com"
    s1loc, s2loc = f"{base}/s1.xml", f"{base}/s2.xml.gz"
    fetched = {
        s1loc: encode_sitemap([{"loc": f"{base}/a"},
                               {"loc": f"{base}/block/b"}]),
        s2loc: encode_sitemap([{"loc": f"{base}/c"}], gz=True),
    }
    rb = encode_robots([{"agents": ["*"],
                         "rules": [("disallow", "/block/")]}])
    _battery(lambda: encode_sitemap(
        [{"loc": s1loc}, {"loc": s2loc}], kind="sitemapindex"),
        lambda d: expand_host(rb, d, fetched, "bot"),
        (CrawlGovError,), seed=47)
    # and mutate the GZIP CHILD under an intact index
    idx = encode_sitemap([{"loc": s2loc}], kind="sitemapindex")
    _battery(lambda: fetched[s2loc],
             lambda d: expand_host(rb, idx, {s2loc: d}, "bot"),
             (CrawlGovError,), seed=59)


def test_fuzz_wet_wat():
    """The WET/WAT record doors (r15): mutate a mixed
    conversion+metadata archive and drive the full per-record path —
    record walk, conversion charset decode, WAT envelope extraction.
    decode_body and wat_payload_fields must never raise (they report
    dirty decodes / json_ok=false instead); only WarcError may escape
    the walk itself."""
    import json

    from verified_sources_spark.llm.warc import (
        WarcError,
        decode_body,
        encode_record,
        encode_warc,
        iter_records,
        wat_payload_fields,
    )

    def enc():
        recs = []
        for i in range(2):
            recs.append(encode_record(
                warc_type="conversion", uri=f"http://e/{i}",
                block=f"текст 你好 wet {i}".encode(),
                extra_headers={"Content-Type": "text/plain"}))
            recs.append(encode_record(
                warc_type="metadata", uri=f"http://e/{i}",
                block=json.dumps({"Envelope": {"Payload-Metadata": {
                    "HTTP-Response-Metadata": {
                        "Response-Message": {"Status": "200"},
                        "HTML-Metadata": {
                            "Head": {"Title": "t"},
                            "Links": [{"url": "/x"}]}}}}}).encode()))
        return encode_warc(recs, gzip_members=True)

    def dec(data):
        for hdrs, block in iter_records(data):
            wtype = hdrs.get("WARC-Type")
            if wtype == "conversion":
                ct = hdrs.get("Content-Type", "")
                decode_body({"content-type": ct} if ct else None, block)
            elif wtype == "metadata":
                wat_payload_fields(block)

    _battery(enc, dec, (WarcError,))


def test_fuzz_jbig2_huffman():
    """The r15 SDHUFF/SBHUFF path: mutate a standard-Huffman
    symbol/text stream (MMR collective bitmaps) — only Jbig2Error may
    escape, and the pad-feed gate keeps decode-from-nothing mutants
    from buying minutes of work."""
    from verified_sources_spark.llm.fax_codec import FaxError
    from verified_sources_spark.llm.jbig2 import (
        Jbig2Error,
        decode_jbig2_embedded,
        encode_jbig2_symbol_text_huffman,
    )

    def glyph(seed, w, h):
        import random as R
        rng = R.Random(seed)
        return [bytes(rng.getrandbits(1) for _ in range(w))
                for _ in range(h)]

    def enc():
        syms = [glyph(1, 5, 4), glyph(2, 6, 4), glyph(3, 4, 7)]
        insts = [(0, 0, 0), (6, 0, 1), (1, 5, 2)]
        return encode_jbig2_symbol_text_huffman(
            syms, insts, (16, 12), mmr_bitmaps=True)

    _battery(enc, decode_jbig2_embedded, (Jbig2Error, FaxError))


def test_fuzz_jbig2_custom_tables():
    """The r15 §B.2 custom-table path: mutate a stream whose
    DH/DW/FS/DS tables travel as selector-3 table segments — the
    table reader's gates (span/prefix/range/line-count) plus the
    shared Huffman work gates must hold; only Jbig2Error/FaxError may
    escape."""
    from verified_sources_spark.llm.fax_codec import FaxError
    from verified_sources_spark.llm.jbig2 import (
        Jbig2Error,
        decode_jbig2_embedded,
        encode_jbig2_symbol_text_huffman,
    )

    def glyph(seed, w, h):
        import random as R
        rng = R.Random(seed)
        return [bytes(rng.getrandbits(1) for _ in range(w))
                for _ in range(h)]

    def enc():
        syms = [glyph(4, 5, 4), glyph(5, 6, 4), glyph(6, 4, 7)]
        insts = [(0, 0, 0), (6, 0, 1), (1, 5, 2)]
        return encode_jbig2_symbol_text_huffman(
            syms, insts, (16, 12), mmr_bitmaps=True,
            custom_tables=True)

    _battery(enc, decode_jbig2_embedded, (Jbig2Error, FaxError))


def test_fuzz_arrow_blob():
    """r15 Arrow IPC door: IPC decode is zero-copy, so this family
    guards the full-validation pass that keeps mutated offset/length
    buffers from ABORTING the worker process (found by this battery
    on the unvalidated first cut) — only DataBlobError may escape."""
    import io

    import pyarrow as pa

    from verified_sources_spark.llm.datablob import (
        DataBlobError, arrow_rows_blob,
    )

    t = pa.table({"id": list(range(20)),
                  "v": [f"val {i}" for i in range(20)]})

    def enc_file():
        buf = io.BytesIO()
        with pa.ipc.new_file(buf, t.schema) as wr:
            wr.write_table(t)
        return buf.getvalue()

    def enc_stream():
        buf = io.BytesIO()
        with pa.ipc.new_stream(buf, t.schema) as wr:
            wr.write_table(t)
        return buf.getvalue()

    _battery(enc_file, arrow_rows_blob, (DataBlobError,))
    _battery(enc_stream, arrow_rows_blob, (DataBlobError,), seed=31)
