"""Pure-stdlib ICO/CUR codec: favicons and cursor files.

Favicons are a distinct image class in any web crawl (every site root
ships one, usually multi-resolution), and the container is trivially
stdlib-decodable: an ICONDIR of 16-byte entries, each pointing at
either a complete PNG stream (Vista+ icons) or a headerless BMP DIB
whose height field covers the XOR color plane *plus* a 1-bit AND
transparency mask.  ``probe`` inventories every entry; ``decode``
materializes the largest (or a chosen) image as RGBA, honoring the
AND mask for non-32-bit entries and the alpha channel for 32-bit ones
(with the classic all-zero-alpha fallback to the AND mask).  ``encode``
writes real single- or multi-entry icons from RGBA pixels — 32-bit DIB
or embedded-PNG payloads — so the decoder has an independent fixture
source.  Reference analogue: the scraping source lands favicon bytes
verbatim (/root/reference/sources/scraping/__init__.py:17-64); this
gives those payloads the same decode/dedup path as every other image.
"""

from __future__ import annotations

import struct

__all__ = ["IcoError", "probe", "decode", "encode", "encode_multi"]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


class IcoError(ValueError):
    pass


def _entries(data: bytes) -> tuple[str, list[dict]]:
    if len(data) < 6:
        raise IcoError("not an ICO payload (too short)")
    reserved, typ, count = struct.unpack_from("<HHH", data, 0)
    if reserved != 0 or typ not in (1, 2):
        raise IcoError("not an ICO payload (bad ICONDIR)")
    if count == 0 or count > 1024:
        raise IcoError(f"implausible ICO image count {count}")
    if len(data) < 6 + 16 * count:
        raise IcoError("truncated ICONDIR")
    kind = "ico" if typ == 1 else "cur"
    out = []
    for i in range(count):
        w, h, _colors, _r, planes, bits, size, off = struct.unpack_from(
            "<BBBBHHII", data, 6 + 16 * i
        )
        if off + size > len(data) or size < 8:
            raise IcoError(f"entry {i} points outside the payload")
        out.append(
            {
                "width": w or 256,
                "height": h or 256,
                "bits": bits,
                "size": size,
                "offset": off,
                "png": data[off : off + 8] == _PNG_SIG,
                # CUR files reuse planes/bits as the hotspot coords
                "hotspot": (planes, bits) if kind == "cur" else None,
            }
        )
    return kind, out


def probe(data: bytes) -> dict:
    """Header-only inventory: container type plus per-entry dims/
    payload kind.  PNG entries get their true dims from the PNG IHDR
    (the directory's 1-byte dims cap at 256 and lie for larger)."""
    kind, entries = _entries(data)
    for e in entries:
        if e["png"]:
            from verified_sources_spark.llm.png_codec import probe as png_probe

            p = png_probe(data[e["offset"] : e["offset"] + e["size"]])
            e["width"], e["height"] = p["width"], p["height"]
        else:
            if e["size"] >= 12:
                _hs, w, h2 = struct.unpack_from(
                    "<Iii", data, e["offset"]
                )
                if w > 0 and h2 > 0:
                    e["width"], e["height"] = w, h2 // 2
    return {"format": kind, "n_images": len(entries), "images": entries}


def _decode_dib(data: bytes, off: int, size: int) -> dict:
    end = off + size
    if size < 40:
        raise IcoError("DIB entry too small for BITMAPINFOHEADER")
    hsize, w, h2, _planes, bits, comp = struct.unpack_from("<IiiHHI", data, off)
    if hsize < 40:
        raise IcoError(f"unsupported DIB header size {hsize}")
    if comp != 0:
        raise IcoError(f"cannot decode compressed ICO DIB (compression {comp})")
    if h2 % 2 or w <= 0 or h2 <= 0:
        raise IcoError("bad ICO DIB dimensions")
    h = h2 // 2
    if bits not in (1, 4, 8, 24, 32):
        raise IcoError(f"cannot decode {bits}-bit ICO DIB")
    pal = []
    pos = off + hsize
    if bits <= 8:
        n_pal = 1 << bits
        if pos + 4 * n_pal > end:
            raise IcoError("truncated ICO palette")
        for i in range(n_pal):
            b, g, r, _x = data[pos + 4 * i : pos + 4 * i + 4]
            pal.append((r, g, b))
        pos += 4 * n_pal
    xor_stride = ((w * bits + 31) // 32) * 4
    and_stride = ((w + 31) // 32) * 4
    if pos + h * xor_stride + h * and_stride > end:
        raise IcoError("truncated ICO pixel data")
    and_off = pos + h * xor_stride

    out = bytearray(w * h * 4)
    opaque_alpha_seen = False
    for y in range(h):
        src_y = h - 1 - y  # bottom-up
        row = pos + src_y * xor_stride
        arow = and_off + src_y * and_stride
        for x in range(w):
            if bits == 32:
                b, g, r, a = data[row + 4 * x : row + 4 * x + 4]
                if a:
                    opaque_alpha_seen = True
            elif bits == 24:
                b, g, r = data[row + 3 * x : row + 3 * x + 3]
                a = 255
            elif bits == 8:
                r, g, b = pal[data[row + x]]
                a = 255
            else:  # 1/4-bit, MSB-first
                bitpos = x * bits
                idx = (
                    data[row + (bitpos >> 3)] >> (8 - bits - (bitpos & 7))
                ) & ((1 << bits) - 1)
                r, g, b = pal[idx]
                a = 255
            if bits != 32:
                # AND mask bit set -> transparent
                if (data[arow + (x >> 3)] >> (7 - (x & 7))) & 1:
                    a = 0
            o = (y * w + x) * 4
            out[o : o + 4] = bytes((r, g, b, a))
    if bits == 32 and not opaque_alpha_seen:
        # classic XP-era 32-bit icons with an unused alpha channel:
        # transparency lives in the AND mask instead
        for y in range(h):
            arow = and_off + (h - 1 - y) * and_stride
            for x in range(w):
                if not (data[arow + (x >> 3)] >> (7 - (x & 7))) & 1:
                    out[(y * w + x) * 4 + 3] = 255
    return {"width": w, "height": h, "mode": "RGBA", "pixels": bytes(out)}


def decode(data: bytes, index: int | None = None) -> dict:
    """Decode one entry (default: the largest by area) to the common
    ``{width, height, mode, pixels}`` contract, always RGBA."""
    kind, entries = _entries(data)
    if index is None:
        index = max(
            range(len(entries)),
            key=lambda i: entries[i]["width"] * entries[i]["height"],
        )
    if not 0 <= index < len(entries):
        raise IcoError(f"entry index {index} out of range")
    e = entries[index]
    if e["png"]:
        from verified_sources_spark.llm.png_codec import decode as png_decode

        im = png_decode(data[e["offset"] : e["offset"] + e["size"]])
        if im["mode"] == "RGB":  # normalize: icons are an alpha format
            px = im["pixels"]
            out = bytearray(len(px) // 3 * 4)
            out[0::4] = px[0::3]
            out[1::4] = px[1::3]
            out[2::4] = px[2::3]
            out[3::4] = b"\xff" * (len(px) // 3)
            im = {**im, "mode": "RGBA", "pixels": bytes(out)}
    else:
        im = _decode_dib(data, e["offset"], e["size"])
    im["format"] = kind
    im["n_images"] = len(entries)
    return im


def _rgba(pixels: bytes, w: int, h: int, mode: str) -> bytes:
    if mode == "RGBA":
        if len(pixels) != w * h * 4:
            raise IcoError("pixel buffer does not match dimensions")
        return pixels
    if mode != "RGB" or len(pixels) != w * h * 3:
        raise IcoError("encode expects RGB/RGBA pixels matching dims")
    out = bytearray(w * h * 4)
    out[0::4] = pixels[0::3]
    out[1::4] = pixels[1::3]
    out[2::4] = pixels[2::3]
    out[3::4] = b"\xff" * (w * h)
    return bytes(out)


def encode_multi(images: list[tuple], png: bool = False) -> bytes:
    """Multi-entry ICO from [(width, height, pixels, mode), ...] —
    32-bit BGRA DIB payloads (alpha-channel transparency, zero AND
    mask) or embedded PNG streams when ``png``."""
    if not images or len(images) > 1024:
        raise IcoError("encode_multi needs 1..1024 images")
    payloads = []
    for w, h, pixels, mode in images:
        if not (0 < w <= 256 and 0 < h <= 256):
            raise IcoError("ICO entries are limited to 256x256")
        rgba = _rgba(pixels, w, h, mode)
        if png:
            from verified_sources_spark.llm.png_codec import encode as png_enc

            payloads.append(png_enc(w, h, rgba, "RGBA"))
            continue
        xor_stride = w * 4
        and_stride = ((w + 31) // 32) * 4
        body = bytearray()
        for y in range(h - 1, -1, -1):  # bottom-up BGRA
            row = rgba[y * xor_stride : (y + 1) * xor_stride]
            line = bytearray(row)
            line[0::4] = row[2::4]
            line[2::4] = row[0::4]
            body += line
        body += bytes(and_stride * h)  # zero AND mask: alpha rules
        dib = struct.pack(
            "<IiiHHIIiiII", 40, w, h * 2, 1, 32, 0, len(body), 0, 0, 0, 0
        )
        payloads.append(dib + bytes(body))
    out = bytearray(struct.pack("<HHH", 0, 1, len(images)))
    off = 6 + 16 * len(images)
    for (w, h, _px, _mode), payload in zip(images, payloads):
        out += struct.pack(
            "<BBBBHHII",
            w % 256,
            h % 256,
            0,
            0,
            1,
            0 if png else 32,
            len(payload),
            off,
        )
        off += len(payload)
    for payload in payloads:
        out += payload
    return bytes(out)


def encode(
    width: int, height: int, pixels: bytes, mode: str = "RGBA", png: bool = False
) -> bytes:
    """Single-entry convenience wrapper over :func:`encode_multi`."""
    return encode_multi([(width, height, pixels, mode)], png=png)
