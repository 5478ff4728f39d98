"""Pure-stdlib PNG codec (zlib + struct): the always-available real
decode path behind the multimodal operators.

The container ships no image libraries, so without this the real-decode
code was only exercised where Pillow happened to be installed.  PNG is
an open spec (RFC 2083 / ISO 15948) fully decodable with stdlib zlib:
chunks with CRC-32, one IDAT zlib stream, five scanline filters.

Supported: gray (0), truecolor RGB (2), palette (3), gray+alpha (4),
RGBA (6) at every legal bit depth (1/2/4/8/16 per the ISO 15948 depth
matrix), both sequential and Adam7-interlaced.  16-bit samples reduce
to their high byte (exact for the v*257 expansion every 8-bit-sourced
encoder uses).  Anything malformed raises ``PngError`` — loud refusal,
never a garbled image.  The encoder writes filter-0 RGB/RGBA,
optionally Adam7-interlaced and/or 16-bit, which every PNG reader
accepts and which gives the decoder an independent two-sided fixture
path.
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
        if len(body) != length or pos + 12 + length > len(data):
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


def _unfilter(raw: bytes, stride: int, h: int, bpp: int, pos: int = 0) -> bytearray:
    """Reverse the five scanline filters over ``h`` rows of ``stride``
    filtered bytes starting at ``raw[pos]`` (one sub-image of an Adam7
    stream, or the whole image when sequential)."""
    out = bytearray(h * stride)
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


# (x0, y0, dx, dy) of the seven Adam7 passes, ISO 15948 §8.2
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)

# legal bit depths per color type, ISO 15948 table 11.1
_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}


def _unpack_row(line: bytes, w: int, depth: int, ch: int, gray_scale: bool) -> bytes:
    """One unfiltered scanline → w*ch 8-bit samples.  16-bit keeps the
    high byte; sub-byte depths unpack MSB-first, scaled to full range
    for gray (exact: 255/(2^d-1) is integral) and kept raw for palette
    indices."""
    if depth == 8:
        return line[: w * ch]
    if depth == 16:
        return line[: w * ch * 2 : 2]
    # depth 1/2/4 — spec restricts these to single-channel (gray/palette)
    mask = (1 << depth) - 1
    scale = (255 // mask) if gray_scale else 1
    out = bytearray(w)
    for x in range(w):
        bitpos = x * depth
        out[x] = (
            (line[bitpos >> 3] >> (8 - depth - (bitpos & 7))) & mask
        ) * scale
    return bytes(out)


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
    if comp != 0 or filt != 0:
        raise PngError("unknown compression/filter method")
    if color not in _CHANNELS:
        raise PngError(f"unknown color type {color}")
    if depth not in _DEPTHS[color]:
        raise PngError(f"bit depth {depth} illegal for color type {color}")
    if interlace not in (0, 1):
        raise PngError(f"unknown interlace method {interlace}")
    if w == 0 or h == 0:
        raise PngError("zero-dimension image")
    nch = _CHANNELS[color]
    gray_scale = color == 0
    # filter "bpp": bytes per complete pixel, min 1 (ISO 15948 §9.2)
    fbpp = max(1, (depth * nch) // 8)
    raw = zlib.decompress(bytes(idat))

    if interlace:
        px = bytearray(w * h * nch)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue  # empty pass carries no scanlines at all
            stride = (pw * nch * depth + 7) // 8
            sub = _unfilter(raw, stride, ph, fbpp, pos)
            pos += ph * (1 + stride)
            for j in range(ph):
                row = _unpack_row(
                    sub[j * stride : (j + 1) * stride], pw, depth, nch, gray_scale
                )
                base = (y0 + j * dy) * w * nch
                for i in range(pw):
                    t = base + (x0 + i * dx) * nch
                    px[t : t + nch] = row[i * nch : (i + 1) * nch]
    else:
        stride = (w * nch * depth + 7) // 8
        flat = _unfilter(raw, stride, h, fbpp)
        if depth == 8:
            px = flat
        else:
            px = bytearray(w * h * nch)
            for y in range(h):
                px[y * w * nch : (y + 1) * w * nch] = _unpack_row(
                    flat[y * stride : (y + 1) * stride], w, depth, nch, gray_scale
                )

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


def encode(
    width: int,
    height: int,
    pixels: bytes,
    mode: str = "RGB",
    interlace: bool = False,
    bit_depth: int = 8,
) -> bytes:
    """Filter-0 PNG encode of packed RGB or RGBA bytes.  ``interlace``
    writes the seven Adam7 passes; ``bit_depth=16`` widens each 8-bit
    sample to v*257 (the spec's exact expansion) — both exist so the
    decoder has an independently-written fixture source for every
    layout it claims to read."""
    ch = {"RGB": 3, "RGBA": 4}.get(mode)
    if ch is None:
        raise PngError(f"encode supports RGB/RGBA, got {mode!r}")
    if bit_depth not in (8, 16):
        raise PngError(f"encode supports bit depth 8/16, got {bit_depth}")
    if len(pixels) != width * height * ch:
        raise PngError(
            f"pixel buffer is {len(pixels)} bytes, need {width * height * ch}"
        )
    color = 2 if mode == "RGB" else 6

    def widen(row: bytes) -> bytes:
        if bit_depth == 8:
            return row
        out = bytearray(len(row) * 2)
        out[0::2] = row
        out[1::2] = row  # v*257 = (v << 8) | v
        return bytes(out)

    raw = bytearray()
    stride = width * ch
    if interlace:
        for x0, y0, dx, dy in _ADAM7:
            for y in range(y0, height, dy):
                row = bytearray()
                for x in range(x0, width, dx):
                    s = y * stride + x * ch
                    row += pixels[s : s + ch]
                if row:
                    raw.append(0)
                    raw += widen(bytes(row))
    else:
        for y in range(height):
            raw.append(0)
            raw += widen(pixels[y * stride : (y + 1) * stride])

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    return (
        _SIG
        + chunk(
            b"IHDR",
            struct.pack(
                ">IIBBBBB", width, height, bit_depth, color, 0, 0, int(interlace)
            ),
        )
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
