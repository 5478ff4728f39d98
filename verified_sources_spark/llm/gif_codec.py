"""Pure-stdlib GIF decoder (87a/89a, LZW).

GIFs are everywhere in scraped web corpora.  This module parses the
logical screen descriptor, global/local color tables, graphic-control
extensions, and the image descriptors, and runs the variable-width LSB
LZW decompressor — all with stdlib ints and bytes (numpy only for the
final palette gather).

``probe`` is header-walk only (dims, frame count, animation flag,
version) — no LZW work, the cheap manifest path.  ``decode`` returns
the FIRST frame composited onto the logical screen as top-down RGB
bytes — the still-image contract image operators consume (for dedup
and dHash purposes the first frame IS the image; frame-level sampling
of animations belongs to the video surface).  ``decode`` also reports
``n_frames`` so callers can route animated GIFs to frame-aware
handling.  Malformed payloads raise ``GifError``.

The encoder emits a minimal uncompressed-style GIF87a (LZW with
immediate clear codes — valid output every decoder accepts, ~1.4x the
raw size) for deterministic fixtures.

The reference has no image operators — this is part of the engine's
multimodal surface beyond reference parity (SURVEY.md multimodal row).
"""

from __future__ import annotations

import struct

__all__ = ["GifError", "probe", "decode", "encode"]


class GifError(ValueError):
    pass


def _color_table(data: bytes, pos: int, flags: int) -> tuple[list, int]:
    if not flags & 0x80:
        return [], pos
    n = 2 << (flags & 0x07)
    end = pos + 3 * n
    if end > len(data):
        raise GifError("truncated color table")
    tbl = [data[pos + 3 * i : pos + 3 * i + 3] for i in range(n)]
    return tbl, end


def _skip_subblocks(data: bytes, pos: int) -> int:
    while True:
        if pos >= len(data):
            raise GifError("truncated sub-block chain")
        n = data[pos]
        pos += 1
        if n == 0:
            return pos
        pos += n


def _walk(data: bytes):
    """Yield ('ext', label, pos) / ('img', descriptor_pos) events and
    return via StopIteration; shared by probe and decode."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF payload")
    if len(data) < 13:
        raise GifError("truncated logical screen descriptor")
    _w, _h = struct.unpack_from("<HH", data, 6)
    flags = data[10]
    _gct, pos = _color_table(data, 13, flags)
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:  # trailer
            return
        if b == 0x21:  # extension
            if pos + 2 > len(data):
                raise GifError("truncated extension")
            yield "ext", data[pos + 1], pos + 2
            pos = _skip_subblocks(data, pos + 2)
        elif b == 0x2C:  # image descriptor
            yield "img", None, pos + 1
            if pos + 10 > len(data):
                raise GifError("truncated image descriptor")
            iflags = data[pos + 9]
            _lct, p2 = _color_table(data, pos + 10, iflags)
            pos = _skip_subblocks(data, p2 + 1)  # +1: LZW min code size
        else:
            raise GifError(f"unknown block 0x{b:02X} at offset {pos}")
    raise GifError("missing trailer")


def probe(data: bytes) -> dict:
    """Header-walk metadata: width, height, version, n_frames,
    animated — no LZW decompression."""
    w, h = struct.unpack_from("<HH", data, 6) if len(data) >= 10 else (0, 0)
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF payload")
    n = 0
    for kind, _label, _pos in _walk(data):
        if kind == "img":
            n += 1
    return {
        "width": w,
        "height": h,
        "version": data[3:6].decode("ascii"),
        "n_frames": n,
        "animated": n > 1,
    }


def _lzw_decode(data: bytes, pos: int, min_code_size: int) -> bytes:
    """GIF LZW: variable-width codes, LSB-first bit order, sub-block
    framing, dictionary growth to 4096 with CLEAR restarts."""
    clear = 1 << min_code_size
    eoi = clear + 1
    # concatenate sub-blocks first (framing is independent of codes)
    chunks = []
    while True:
        if pos >= len(data):
            raise GifError("truncated LZW sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            break
        chunks.append(data[pos : pos + n])
        pos += n
    stream = b"".join(chunks)

    out = bytearray()
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    prev: bytes | None = None
    acc = 0
    nbits = 0
    i = 0
    while True:
        while nbits < width:
            if i >= len(stream):
                return bytes(out)  # tolerant: some writers omit EOI
            acc |= stream[i] << nbits
            nbits += 8
            i += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = [bytes([k]) for k in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                raise GifError("LZW: first code not in table")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise GifError("LZW: code beyond table")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode(data: bytes) -> dict:
    """First frame as top-down RGB: probe fields plus ``pixels``
    (h*w*3 bytes) and ``mode`` ('RGB') — the same contract as
    png_codec/jpeg_codec.decode.  Transparent pixels keep the
    background color (index from the screen descriptor)."""
    import numpy as np

    meta = probe(data)
    w, h = meta["width"], meta["height"]
    flags = data[10]
    bg_index = data[11]
    gct, pos = _color_table(data, 13, flags)

    transparent = None
    while pos < len(data):
        b = data[pos]
        if b == 0x21:
            label = data[pos + 1]
            if label == 0xF9 and data[pos + 2] >= 4:  # graphic control
                gflags = data[pos + 3]
                if gflags & 1:
                    transparent = data[pos + 6]
            pos = _skip_subblocks(data, pos + 2)
        elif b == 0x2C:
            left, top, iw, ih = struct.unpack_from("<HHHH", data, pos + 1)
            iflags = data[pos + 9]
            lct, p2 = _color_table(data, pos + 10, iflags)
            palette = lct or gct
            if not palette:
                raise GifError("no color table for frame")
            min_code = data[p2]
            indices = _lzw_decode(data, p2 + 1, min_code)
            if len(indices) < iw * ih:
                raise GifError(
                    f"LZW underrun: {len(indices)} < {iw * ih} pixels"
                )
            idx = np.frombuffer(indices[: iw * ih], dtype=np.uint8)
            if iflags & 0x40:  # interlaced: reorder rows
                rows = idx.reshape(ih, iw)
                ordered = np.empty_like(rows)
                src = 0
                for start, step in _INTERLACE_PASSES:
                    for y in range(start, ih, step):
                        ordered[y] = rows[src]
                        src += 1
                idx = ordered.ravel()
            pal = np.zeros((256, 3), dtype=np.uint8)
            for k, rgb3 in enumerate(palette):
                pal[k] = list(rgb3)
            if idx.max(initial=0) >= len(palette):
                raise GifError("palette index out of range")
            frame = pal[idx].reshape(ih, iw, 3)
            if transparent is not None:
                bg = pal[bg_index] if bg_index < len(palette) else np.zeros(3, np.uint8)
                mask = idx.reshape(ih, iw) == transparent
                frame = frame.copy()
                frame[mask] = bg
            # composite onto the logical screen at (left, top)
            bg_rgb = (
                pal[bg_index] if gct and bg_index < len(gct) else np.zeros(3, np.uint8)
            )
            screen = np.tile(bg_rgb, (h, w, 1)).astype(np.uint8)
            y1, x1 = min(top + ih, h), min(left + iw, w)
            screen[top:y1, left:x1] = frame[: y1 - top, : x1 - left]
            meta = dict(meta)
            meta["pixels"] = screen.tobytes()
            meta["mode"] = "RGB"
            return meta
        elif b == 0x3B:
            break
        else:
            raise GifError(f"unknown block 0x{b:02X}")
    raise GifError("no image frame found")


def encode(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal GIF87a from top-down RGB bytes: palette built from the
    distinct colors (≤256 required), LZW emitted with an immediate-clear
    strategy (spec-valid, modestly compressed).  Deterministic fixture
    generator."""
    import numpy as np

    if len(pixels) != width * height * 3:
        raise GifError("pixel buffer does not match width*height*3")
    rgb = np.frombuffer(pixels, dtype=np.uint8).reshape(-1, 3)
    colors, inverse = np.unique(rgb, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise GifError("encode supports at most 256 distinct colors")
    # palette size: power of two >= max(2, n)
    size_exp = max(1, int(np.ceil(np.log2(max(2, len(colors))))))
    n_pal = 1 << size_exp
    min_code = max(2, size_exp)
    clear = 1 << min_code
    eoi = clear + 1
    width_bits = min_code + 1

    out = bytearray()
    out += b"GIF87a"
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | (size_exp - 1), 0, 0])  # GCT flag+size, bg 0, ratio
    pal = bytearray()
    for c in colors:
        pal += bytes(c)
    pal += b"\x00" * (3 * n_pal - len(pal))
    out += pal
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    out += bytes([min_code])

    # LZW, immediate-clear: emit CLEAR before every literal so the code
    # width never grows — every decoder accepts it
    acc = 0
    nbits = 0
    body = bytearray()

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width_bits
        while nbits >= 8:
            body.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    for k in inverse.ravel():
        emit(int(k))
        emit(clear)
    emit(eoi)
    if nbits:
        body.append(acc & 0xFF)
    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)
