"""Honest-refusal matrix: EVERY named decode refusal across the stdlib
codec suite raises with the format/variant NAMED in the message (never
a bare struct.error, never a silent garble).  One parametrized test per
refusal keeps the contract pinned — this is precisely the net that
catches a codec module landing unwired or a refusal message regressing
to something un-triageable (round-9 verdict item #4).

Decodable formats are asserted green elsewhere (their codec tests);
this file is only the refusal surface."""

from __future__ import annotations

import struct

import numpy as np
import pytest


def _jpeg_with_sof(marker: int) -> bytes:
    """Baseline fixture re-marked to a non-baseline SOF variant."""
    from verified_sources_spark.llm.jpeg_codec import encode

    jpg = encode(16, 12, bytes(16 * 12 * 3), quality=90)
    k = jpg.index(b"\xff\xc0")
    return jpg[: k + 1] + bytes([marker]) + jpg[k + 2 :]


def _bmp_with_compression(comp: int) -> bytes:
    from verified_sources_spark.llm.bmp_codec import encode

    bmp = encode(8, 6, bytes(8 * 6 * 3))
    return bmp[:30] + struct.pack("<I", comp) + bmp[34:]


def _avi_with_fourcc(fourcc: bytes) -> bytes:
    from verified_sources_spark.llm.avi_codec import encode

    avi = encode([np.zeros((12, 16, 3), np.uint8)] * 3, 10.0, 16, 12)
    i = avi.index(b"strf")  # BITMAPINFOHEADER: biCompression at +16
    return avi[: i + 8 + 16] + fourcc + avi[i + 8 + 20 :]


def _wav_with_format_code(code: int) -> bytes:
    from verified_sources_spark.llm.wav_codec import encode

    wav = encode(np.zeros(100), 8000)
    j = wav.index(b"fmt ")
    return wav[: j + 8] + struct.pack("<H", code) + wav[j + 10 :]


def _vp8_webp() -> bytes:
    # minimal RIFF/WEBP wrapper with a VP8 (lossy) chunk: sniffable,
    # header-probeable, pixel-refused
    vp8_body = bytes(3) + b"\x9d\x01\x2a" + struct.pack("<HH", 16, 12)
    chunk = b"VP8 " + struct.pack("<I", len(vp8_body)) + vp8_body
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _decode_jpeg(payload):
    from verified_sources_spark.llm.jpeg_codec import decode

    decode(payload)


def _decode_bmp(payload):
    from verified_sources_spark.llm.bmp_codec import decode

    decode(payload)


def _decode_avi_frame(payload):
    from verified_sources_spark.llm.avi_codec import decode_frame, probe

    decode_frame(payload, probe(payload), 0)


def _decode_wav(payload):
    from verified_sources_spark.llm.wav_codec import decode

    decode(payload)


def _decode_png(payload):
    from verified_sources_spark.llm.png_codec import decode

    decode(payload)


def _decode_image(payload):
    from verified_sources_spark.llm.image_io import decode_image

    decode_image(payload)


def _sample_mp4(payload):
    from verified_sources_spark.llm.video_io import probe_video, sample_frames

    sample_frames(payload, probe_video(payload), every_ms=500)


def _mp4(codec: bytes) -> bytes:
    from verified_sources_spark.llm.mp4_codec import encode_stub

    return encode_stub(codec=codec)


def _mp3() -> bytes:
    from verified_sources_spark.llm.mp3_codec import encode_stub

    return encode_stub()


def _decode_mp3_samples(payload):
    from verified_sources_spark.llm.mp3_codec import decode_samples

    decode_samples(payload)


def _webm() -> bytes:
    from verified_sources_spark.llm.webm_codec import encode_stub

    return encode_stub()


def _pdf_encrypted() -> bytes:
    from verified_sources_spark.llm.pdf_codec import encode_pdf

    return encode_pdf([["x"]]).replace(
        b"/Root 1 0 R >>", b"/Root 1 0 R /Encrypt << /V 2 >> >>")


def _pdf_ccitt() -> bytes:
    # CCITT image XObjects DECODE now (llm/fax_codec) — but a CCITT
    # filter on a *content* stream is not a thing this engine serves,
    # and _apply_filters still refuses it by name
    import zlib

    c = zlib.compress(b"BT (x) Tj ET")
    return (b"%PDF-1.4\n"
            b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
            b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
            b"3 0 obj\n<< /Type /Page /Contents 4 0 R >>\nendobj\n"
            b"4 0 obj\n<< /Length " + str(len(c)).encode()
            + b" /Filter /CCITTFaxDecode >>\nstream\n" + c
            + b"\nendstream\nendobj\n"
            b"trailer\n<< /Size 5 /Root 1 0 R >>\n%%EOF\n")


def _extract_pdf(payload):
    from verified_sources_spark.llm.pdf_codec import extract_pdf_text

    extract_pdf_text(payload)


def _pdf_jbig2_template1() -> bytes:
    # both MMR and arithmetic TEMPLATE-0 JBIG2 regions DECODE now
    # (llm/jbig2 + llm/mq_coder); the remaining generic-region
    # refusal is a non-zero GBTEMPLATE — flip the template bits on a
    # valid arithmetic fixture
    import struct

    from verified_sources_spark.llm.jbig2 import encode_jbig2_arith
    from verified_sources_spark.llm.pdf_codec import encode_pdf

    data = bytearray(encode_jbig2_arith([b"\x01\x00\x00\x01"] * 4))
    plen = struct.unpack_from(">I", data, 7)[0]
    data[11 + plen + 11 + 17] = 0x02  # generic flags: template 1
    return encode_pdf([["x"]], image={"width": 4, "height": 4,
                                      "bpc": 1,
                                      "colorspace": "DeviceGray",
                                      "data": bytes(data),
                                      "pdf_filter": "JBIG2Decode"})


def _extract_pdf_images(payload):
    from verified_sources_spark.llm.pdf_codec import extract_pdf_images

    extract_pdf_images(payload)


MATRIX = [
    # (case id, payload builder, decode fn, message fragment that NAMES it)
    # progressive (SOF2) and 8-bit extended sequential (SOF1) DECODE
    # now — the remaining refusals are the variants stdlib genuinely
    # can't serve
    ("jpeg-arithmetic", lambda: _jpeg_with_sof(0xC9), _decode_jpeg,
     "arithmetic sequential (SOF9)"),
    ("jpeg-lossless", lambda: _jpeg_with_sof(0xC3), _decode_jpeg,
     "lossless (SOF3)"),
    # RLE4 / BITFIELDS decode now (llm/bmp_codec) — but a 24-bit body
    # MISLABELED with those compressions is malformed and still
    # refuses with the compression named
    ("bmp-rle4-on-24bit", lambda: _bmp_with_compression(2), _decode_bmp,
     "BI_RLE4"),
    ("bmp-bitfields-on-24bit", lambda: _bmp_with_compression(3),
     _decode_bmp, "BI_BITFIELDS"),
    ("avi-h264-fourcc", lambda: _avi_with_fourcc(b"H264"), _decode_avi_frame,
     "H264"),
    ("avi-xvid-fourcc", lambda: _avi_with_fourcc(b"XVID"), _decode_avi_frame,
     "XVID"),
    ("wav-mp3-format-code", lambda: _wav_with_format_code(85), _decode_wav,
     "format code 85"),
    ("wav-not-riff", lambda: b"ID3\x03" + bytes(64), _decode_wav,
     "not a RIFF/WAVE"),
    # png-adam7 was removed when Adam7 interlace decode landed
    # (llm/png_codec.decode) — interlaced PNGs now pixel-decode
    # webp-vp8-lossy moved to its own test: it decodes through the
    # system-libwebp seam when present and refuses by name only when
    # the library is absent (test_webp_lossy_refuses_without_libwebp)
    ("mp4-avc1-pixels", lambda: _mp4(b"avc1"), _sample_mp4, "avc1"),
    ("mp4-hev1-pixels", lambda: _mp4(b"hev1"), _sample_mp4, "hev1"),
    # flac-subframes was removed when the full FLAC frame decoder
    # landed (llm/flac_codec.decode) — lossless audio now decodes
    ("mp3-pcm-synthesis", _mp3, _decode_mp3_samples, "MPEG-1 Layer III"),
    ("webm-vp9-pixels", _webm, _sample_mp4, "V_VP9"),
    ("pdf-encrypted", _pdf_encrypted, _extract_pdf, "Encrypt"),
    ("pdf-ccitt-filter", _pdf_ccitt, _extract_pdf, "CCITTFaxDecode"),
    ("pdf-jbig2-template1", _pdf_jbig2_template1,
     _extract_pdf_images, "template 1"),
]


@pytest.mark.parametrize(
    "builder,fn,fragment", [m[1:] for m in MATRIX], ids=[m[0] for m in MATRIX]
)
def test_refusal_names_the_format(builder, fn, fragment):
    payload = builder()
    with pytest.raises(Exception) as exc_info:
        fn(payload)
    msg = str(exc_info.value)
    assert fragment in msg, f"refusal message {msg!r} must name {fragment!r}"
    # a refusal is a typed, catchable error — never a bare struct.error
    assert not isinstance(exc_info.value, struct.error)


def test_webp_lossy_refuses_without_libwebp(monkeypatch):
    """With the system library gated off, lossy VP8 keeps the exact
    pre-seam named-refusal posture (a stub VP8 chunk also refuses even
    WITH the library — libwebp rejects the truncated bitstream)."""
    from verified_sources_spark.llm import webp_system

    monkeypatch.setattr(webp_system, "available", lambda: False)
    with pytest.raises(Exception, match="WebP"):
        _decode_image(_vp8_webp())


def test_webp_probe_still_serves_headers():
    """The refusal is pixel-only: the VP8 lossy header still probes."""
    from verified_sources_spark.llm.image_io import probe_webp

    m = probe_webp(_vp8_webp())
    assert (m["width"], m["height"]) == (16, 12)
    assert m["variant"] == "VP8 (lossy)"


def test_mp4_probe_still_serves_manifest():
    """The refusal is pixel-only: the avc1 container still probes."""
    from verified_sources_spark.llm.video_io import probe_video

    m = probe_video(_mp4(b"avc1"))
    assert m["codec"] == "avc1" and m["n_frames"] == 30
