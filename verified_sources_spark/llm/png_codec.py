"""Pure-stdlib PNG codec (zlib + struct): the always-available real
decode path behind the multimodal operators.

The container ships no image libraries, so without this the real-decode
code was only exercised where Pillow happened to be installed.  PNG is
an open spec (RFC 2083 / ISO 15948) fully decodable with stdlib zlib:
chunks with CRC-32, one IDAT zlib stream, five scanline filters.

Supported: 8-bit gray (0), truecolor RGB (2), palette (3), gray+alpha
(4), RGBA (6), non-interlaced.  16-bit depth and Adam7 interlace raise
``PngError`` — loud refusal, never a garbled image.  The encoder writes
filter-0 RGB/RGBA, which every PNG reader accepts.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"


class PngError(ValueError):
    pass


def _chunks(data: bytes):
    if data[:8] != _SIG:
        raise PngError("not a PNG (bad signature)")
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise PngError("truncated chunk")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if crc != (zlib.crc32(ctype + body) & 0xFFFFFFFF):
            raise PngError(f"bad CRC in {ctype!r}")
        yield ctype, body
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise PngError("missing IEND")


_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def probe(data: bytes) -> dict:
    """Header-only decode: width/height/mode without inflating IDAT."""
    for ctype, body in _chunks(data):
        if ctype != b"IHDR":
            raise PngError("first chunk is not IHDR")
        w, h, depth, color, comp, filt, interlace = struct.unpack(">IIBBBBB", body)
        mode = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}.get(color)
        if mode is None:
            raise PngError(f"unknown color type {color}")
        return {
            "width": w,
            "height": h,
            "mode": mode,
            "bit_depth": depth,
            "interlaced": bool(interlace),
        }
    raise PngError("empty PNG")


def _unfilter(raw: bytes, w: int, h: int, bpp: int) -> bytearray:
    stride = w * bpp
    out = bytearray(h * stride)
    pos = 0
    for y in range(h):
        if pos >= len(raw):
            raise PngError("truncated scanlines")
        ftype = raw[pos]
        pos += 1
        line = raw[pos : pos + stride]
        if len(line) != stride:
            raise PngError("truncated scanline")
        pos += stride
        o = y * stride
        prev = out[o - stride : o] if y else bytes(stride)
        if ftype == 0:
            out[o : o + stride] = line
        elif ftype == 1:  # Sub
            for i in range(stride):
                a = out[o + i - bpp] if i >= bpp else 0
                out[o + i] = (line[i] + a) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                out[o + i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = out[o + i - bpp] if i >= bpp else 0
                out[o + i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = out[o + i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[o + i] = (line[i] + pred) & 0xFF
        else:
            raise PngError(f"unknown filter type {ftype}")
    return out


def decode(data: bytes) -> dict:
    """Full decode → {"width","height","mode","pixels"} with pixels as
    packed RGB or RGBA bytes (gray/palette expanded)."""
    ihdr = None
    idat = bytearray()
    palette = None
    trns = None
    for ctype, body in _chunks(data):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            palette = body
        elif ctype == b"tRNS":
            trns = body
        elif ctype == b"IDAT":
            idat.extend(body)
    if ihdr is None:
        raise PngError("missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise PngError(f"bit depth {depth} not supported (8 only)")
    if interlace:
        raise PngError("Adam7 interlace not supported")
    if comp != 0 or filt != 0:
        raise PngError("unknown compression/filter method")
    if color not in _CHANNELS:
        raise PngError(f"unknown color type {color}")
    bpp = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    px = _unfilter(raw, w, h, bpp)

    if color == 2:
        return {"width": w, "height": h, "mode": "RGB", "pixels": bytes(px)}
    if color == 6:
        return {"width": w, "height": h, "mode": "RGBA", "pixels": bytes(px)}
    out = bytearray()
    if color == 0:  # gray → RGB
        for g in px:
            out += bytes((g, g, g))
        return {"width": w, "height": h, "mode": "RGB", "pixels": bytes(out)}
    if color == 4:  # gray+alpha → RGBA
        for i in range(0, len(px), 2):
            g, a = px[i], px[i + 1]
            out += bytes((g, g, g, a))
        return {"width": w, "height": h, "mode": "RGBA", "pixels": bytes(out)}
    # palette
    if palette is None:
        raise PngError("palette image without PLTE")
    has_alpha = trns is not None
    for idx in px:
        if 3 * idx + 2 >= len(palette):
            raise PngError("palette index out of range")
        out += palette[3 * idx : 3 * idx + 3]
        if has_alpha:
            out.append(trns[idx] if idx < len(trns) else 255)
    mode = "RGBA" if has_alpha else "RGB"
    return {"width": w, "height": h, "mode": mode, "pixels": bytes(out)}


def encode(width: int, height: int, pixels: bytes, mode: str = "RGB") -> bytes:
    """Filter-0 PNG encode of packed RGB or RGBA bytes."""
    ch = {"RGB": 3, "RGBA": 4}.get(mode)
    if ch is None:
        raise PngError(f"encode supports RGB/RGBA, got {mode!r}")
    if len(pixels) != width * height * ch:
        raise PngError(
            f"pixel buffer is {len(pixels)} bytes, need {width * height * ch}"
        )
    color = 2 if mode == "RGB" else 6
    raw = bytearray()
    stride = width * ch
    for y in range(height):
        raw.append(0)
        raw += pixels[y * stride : (y + 1) * stride]

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    return (
        _SIG
        + chunk(b"IHDR", struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw), 9))
        + chunk(b"IEND", b"")
    )


def resize_nearest(
    pixels: bytes, w: int, h: int, new_w: int, new_h: int, channels: int = 3
) -> bytes:
    """Nearest-neighbor resample of a packed pixel buffer (the stdlib
    path trades Lanczos quality for zero dependencies)."""
    out = bytearray(new_w * new_h * channels)
    for y in range(new_h):
        sy = min(h - 1, (y * h) // new_h)
        src_row = sy * w * channels
        dst_row = y * new_w * channels
        for x in range(new_w):
            sx = min(w - 1, (x * w) // new_w)
            s = src_row + sx * channels
            d = dst_row + x * channels
            out[d : d + channels] = pixels[s : s + channels]
    return bytes(out)
