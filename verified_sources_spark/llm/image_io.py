"""Format-sniffing image decode: ONE entry point over the stdlib codecs.

``decode_image`` dispatches on magic bytes — PNG signature →
llm/png_codec, JPEG SOI → llm/jpeg_codec — and returns the shared
contract both codecs emit: ``{width, height, mode, pixels}`` with
``pixels`` top-down RGB/RGBA bytes.  Everything image-shaped in the
engine (dHash, perceptual dedup, the media-ingest ledger) goes through
this seam, so the SAME photo stored once as PNG and once as JPEG — the
single most common duplicate class in a scraped corpus — lands within a
few dHash bits and dedups across formats.

``sniff_image_format`` is the header-only classifier for manifests.
"""

from __future__ import annotations

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff_image_format(payload: bytes) -> str | None:
    """'png' / 'jpeg' / 'gif' / 'bmp' / None — magic bytes only."""
    if payload[:8] == _PNG_SIG:
        return "png"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:2] == b"BM":
        return "bmp"
    return None


def decode_image(payload: bytes) -> dict:
    """Decode a PNG / baseline JPEG / GIF (first frame) / BMP payload to
    the common ``{width, height, mode, pixels, format}`` dict; raises on
    anything else (callers treat that as "not an image")."""
    fmt = sniff_image_format(payload)
    if fmt == "png":
        from verified_sources_spark.llm.png_codec import decode
    elif fmt == "jpeg":
        from verified_sources_spark.llm.jpeg_codec import decode
    elif fmt == "gif":
        from verified_sources_spark.llm.gif_codec import decode
    elif fmt == "bmp":
        from verified_sources_spark.llm.bmp_codec import decode
    else:
        raise ValueError(
            "unrecognized image payload (not PNG/JPEG/GIF/BMP)"
        )
    out = decode(payload)
    out["format"] = fmt
    return out
