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
    """'png' / 'jpeg' / 'gif' / 'bmp' / 'webp' / 'tiff' / 'ico' /
    'heif' (HEIC/AVIF, probe-only) / None
    — magic bytes only (ICO's weak magic additionally validates the
    directory).  WebP pixel-decodes for VP8L (pure stdlib) and, when
    the system libwebp is present, for lossy VP8 too (llm/webp_system
    seam); otherwise lossy refuses by name with header metadata via
    ``probe_webp``."""
    if payload[:8] == _PNG_SIG:
        return "png"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return "webp"
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    if payload[4:8] == b"ftyp":
        from verified_sources_spark.llm.heif_codec import HEIF_BRANDS

        if payload[8:12] in HEIF_BRANDS:
            return "heif"
    if payload[:4] in (b"\x00\x00\x01\x00", b"\x00\x00\x02\x00") and len(
        payload
    ) >= 6:
        # ICO/CUR magic is weak (all zeros + type) — require a sane
        # entry count and a first entry that stays inside the payload
        # before claiming it
        count = int.from_bytes(payload[4:6], "little")
        if 1 <= count <= 1024 and len(payload) >= 6 + 16 * count:
            size = int.from_bytes(payload[14:18], "little")
            off = int.from_bytes(payload[18:22], "little")
            if off >= 6 + 16 * count and off + size <= len(payload):
                return "ico"
    return None


def probe_webp(payload: bytes) -> dict:
    """Header-only WebP dims for all three bitstream layouts: VP8
    (lossy key frame), VP8L (lossless), VP8X (extended canvas).  No
    pixel work — the manifest path for a format the engine refuses to
    pixel-decode."""
    import struct

    if sniff_image_format(payload) != "webp":
        raise ValueError("not a WebP payload")
    fourcc = payload[12:16]
    if fourcc == b"VP8 ":
        # key frame: 3-byte frame tag, then 3-byte start code 9D 01 2A,
        # then 14-bit width / 14-bit height (little-endian)
        if payload[23:26] != b"\x9d\x01\x2a":
            raise ValueError("VP8 start code missing (not a key frame)")
        w = struct.unpack_from("<H", payload, 26)[0] & 0x3FFF
        h = struct.unpack_from("<H", payload, 28)[0] & 0x3FFF
        variant = "VP8 (lossy)"
    elif fourcc == b"VP8L":
        if payload[20] != 0x2F:
            raise ValueError("VP8L signature byte missing")
        bits = struct.unpack_from("<I", payload, 21)[0]
        w = (bits & 0x3FFF) + 1
        h = ((bits >> 14) & 0x3FFF) + 1
        variant = "VP8L (lossless)"
    elif fourcc == b"VP8X":
        w = int.from_bytes(payload[24:27], "little") + 1
        h = int.from_bytes(payload[27:30], "little") + 1
        variant = "VP8X (extended)"
    else:
        raise ValueError(f"unknown WebP chunk {fourcc!r}")
    return {"width": w, "height": h, "format": "webp", "variant": variant}


def decode_image(payload: bytes) -> dict:
    """Decode a PNG / JPEG (baseline or progressive) / GIF (first
    frame) / BMP / TIFF / ICO (largest entry) / WebP-VP8L payload to
    the common ``{width, height, mode, pixels, format}`` dict; raises
    on anything else (callers treat that as "not an image")."""
    fmt = sniff_image_format(payload)
    if fmt == "png":
        from verified_sources_spark.llm.png_codec import decode
    elif fmt == "jpeg":
        from verified_sources_spark.llm.jpeg_codec import decode
    elif fmt == "gif":
        from verified_sources_spark.llm.gif_codec import decode
    elif fmt == "bmp":
        from verified_sources_spark.llm.bmp_codec import decode
    elif fmt == "tiff":
        from verified_sources_spark.llm.tiff_codec import decode
    elif fmt == "ico":
        from verified_sources_spark.llm.ico_codec import decode
    elif fmt == "webp":
        variant = probe_webp(payload)["variant"]
        # VP8X is just an envelope: an extended file whose frame chunk
        # is VP8L still pixel-decodes (the chunk walk skips VP8X)
        if variant == "VP8L (lossless)" or (
            variant == "VP8X (extended)" and b"VP8L" in payload[:64]
        ):
            from verified_sources_spark.llm.vp8l_codec import decode
        else:
            # lossy VP8 (the majority of real-world WebP): decode via
            # the system libwebp when present — a hand-rolled RFC 6386
            # decoder can't be verified offline (trained probability
            # tables), so the seam is the honest real-corpus path;
            # without the library this refuses by name exactly as
            # before
            from verified_sources_spark.llm import webp_system

            if webp_system.available():
                out = webp_system.decode_rgb(payload)
                out["format"] = fmt
                return out
            raise ValueError(
                f"cannot pixel-decode WebP {variant} (boolean arithmetic "
                f"coder + DCT) without system libwebp — probe_webp "
                f"serves header metadata; VP8L lossless decodes"
            )
    elif fmt == "heif":
        # HEVC/AV1 pixel payloads: manifest-first posture — the probe
        # (llm/heif_codec.probe) serves dims/codec/brand facts
        from verified_sources_spark.llm.heif_codec import probe as hp

        m = hp(payload)
        raise ValueError(
            f"cannot pixel-decode HEIF/{m['brand']} ({m['codec']}) — "
            f"llm/heif_codec.probe serves the manifest"
        )
    else:
        raise ValueError(
            "unrecognized image payload (not PNG/JPEG/GIF/BMP/WebP)"
        )
    out = decode(payload)
    out["format"] = fmt
    return out
