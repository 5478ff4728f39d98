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

__all__ = [
    "GifError", "probe", "decode", "decode_frames", "encode",
    "encode_animated",
]


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
    animated, per-frame ``delays_ms`` (graphic-control, default 100 ms),
    ``timestamps_ms`` (cumulative start time per frame), duration_ms,
    and the average fps — all WITHOUT LZW decompression (delays live in
    extension blocks)."""
    w, h = struct.unpack_from("<HH", data, 6) if len(data) >= 10 else (0, 0)
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("not a GIF payload")
    delays = []
    pending = None
    for kind, label, pos in _walk(data):
        if kind == "ext" and label == 0xF9 and data[pos] >= 4:
            pending = struct.unpack_from("<H", data, pos + 2)[0] * 10
        elif kind == "img":
            # 0-delay frames render "as fast as possible"; browsers clamp
            # to ~100 ms, the convention samplers rely on
            delays.append(pending if pending else 100)
            pending = None
    ts = []
    t = 0
    for d in delays:
        ts.append(t)
        t += d
    n = len(delays)
    return {
        "width": w,
        "height": h,
        "version": data[3:6].decode("ascii"),
        "n_frames": n,
        "animated": n > 1,
        "delays_ms": delays,
        "timestamps_ms": ts,
        "duration_ms": t,
        "fps": (n * 1000.0 / t) if t else 0.0,
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


def decode_frames(data: bytes):
    """Yield (timestamp_ms, top-down RGB bytes) per frame, fully
    composited per the GIF89a animation model: transparency leaves the
    underlying canvas, disposal 2 restores the frame region to the
    background color, disposal 3 restores the pre-frame canvas.
    Decoding is inherently SEQUENTIAL (frames are deltas) — time-based
    samplers decode up to the last frame they keep, unlike AVI's
    per-frame seek."""
    import numpy as np

    meta = probe(data)
    w, h = meta["width"], meta["height"]
    flags = data[10]
    bg_index = data[11]
    gct, pos = _color_table(data, 13, flags)
    bg_rgb = (
        np.array(list(gct[bg_index]), dtype=np.uint8)
        if gct and bg_index < len(gct)
        else np.zeros(3, np.uint8)
    )
    screen = np.tile(bg_rgb, (h, w, 1)).astype(np.uint8)

    transparent = None
    disposal = 0
    frame_idx = 0
    while pos < len(data):
        b = data[pos]
        if b == 0x21:
            label = data[pos + 1]
            if label == 0xF9 and data[pos + 2] >= 4:  # graphic control
                gflags = data[pos + 3]
                disposal = (gflags >> 2) & 7
                transparent = data[pos + 6] if gflags & 1 else None
            pos = _skip_subblocks(data, pos + 2)
        elif b == 0x2C:
            left, top, iw, ih = struct.unpack_from("<HHHH", data, pos + 1)
            iflags = data[pos + 9]
            lct, p2 = _color_table(data, pos + 10, iflags)
            palette = lct or gct
            if not palette:
                raise GifError("no color table for frame")
            indices = _lzw_decode(data, p2 + 1, data[p2])
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
            idx2d = idx.reshape(ih, iw)
            frame = pal[idx2d]
            y1, x1 = min(top + ih, h), min(left + iw, w)
            snapshot = screen.copy() if disposal == 3 else None
            region = screen[top:y1, left:x1]
            patch = frame[: y1 - top, : x1 - left]
            if transparent is not None:
                mask = idx2d[: y1 - top, : x1 - left] == transparent
                patch = np.where(mask[:, :, None], region, patch)
            screen[top:y1, left:x1] = patch
            yield meta["timestamps_ms"][frame_idx], screen.tobytes()
            if disposal == 2:
                screen[top:y1, left:x1] = bg_rgb
            elif disposal == 3 and snapshot is not None:
                screen = snapshot
            transparent = None
            disposal = 0
            frame_idx += 1
            pos = _skip_subblocks(data, p2 + 1)
        elif b == 0x3B:
            return
        else:
            raise GifError(f"unknown block 0x{b:02X}")


def decode(data: bytes) -> dict:
    """First frame as top-down RGB: probe fields plus ``pixels``
    (h*w*3 bytes) and ``mode`` ('RGB') — the same contract as
    png_codec/jpeg_codec.decode.  Animated GIFs report ``n_frames`` so
    callers can route them to the frame-level surface
    (``decode_frames``)."""
    meta = dict(probe(data))
    for _ts, pixels in decode_frames(data):
        meta["pixels"] = pixels
        meta["mode"] = "RGB"
        return meta
    raise GifError("no image frame found")


def _palette_and_indices(frames_rgb):
    """ONE palette over all frames (≤256 distinct colors) + per-frame
    index arrays."""
    import numpy as np

    stacked = np.concatenate([f.reshape(-1, 3) for f in frames_rgb])
    colors, inverse = np.unique(stacked, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise GifError("encode supports at most 256 distinct colors")
    size_exp = max(1, int(np.ceil(np.log2(max(2, len(colors))))))
    outs = []
    pos = 0
    for f in frames_rgb:
        n = f.shape[0] * f.shape[1]
        outs.append(inverse[pos : pos + n])
        pos += n
    return colors, size_exp, outs


def _lzw_body(indices, size_exp: int) -> bytes:
    """Sub-block-framed LZW stream, immediate-clear strategy: emit
    CLEAR before every literal so the code width never grows —
    spec-valid output every decoder accepts, ~1.4x raw size."""
    min_code = max(2, size_exp)
    clear = 1 << min_code
    eoi = clear + 1
    width_bits = min_code + 1
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
    for k in indices.ravel():
        emit(int(k))
        emit(clear)
    emit(eoi)
    if nbits:
        body.append(acc & 0xFF)
    out = bytearray([min_code])
    for i in range(0, len(body), 255):
        chunk = body[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00"
    return bytes(out)


def _header(width, height, colors, size_exp, version=b"GIF87a") -> bytes:
    n_pal = 1 << size_exp
    out = bytearray()
    out += version
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | (size_exp - 1), 0, 0])  # GCT flag+size, bg 0, ratio
    pal = bytearray()
    for c in colors:
        pal += bytes(c)
    pal += b"\x00" * (3 * n_pal - len(pal))
    out += pal
    return bytes(out)


def encode(width: int, height: int, pixels: bytes) -> bytes:
    """Minimal GIF87a from top-down RGB bytes: palette built from the
    distinct colors (≤256 required).  Deterministic fixture generator."""
    import numpy as np

    if len(pixels) != width * height * 3:
        raise GifError("pixel buffer does not match width*height*3")
    rgb = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, 3)
    colors, size_exp, [idx] = _palette_and_indices([rgb])
    out = bytearray(_header(width, height, colors, size_exp))
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    out += _lzw_body(idx, size_exp)
    out += b"\x3b"
    return bytes(out)


def encode_animated(
    width: int, height: int, frames, delay_ms: int = 100
) -> bytes:
    """GIF89a animation from full-size top-down RGB frames (shared
    ≤256-color palette across all frames; each frame carries a
    graphic-control extension with ``delay_ms``).  Deterministic
    fixture generator for the video surface."""
    import numpy as np

    arrs = []
    for f in frames:
        a = (
            np.frombuffer(f, dtype=np.uint8)
            if isinstance(f, (bytes, bytearray))
            else np.asarray(f, dtype=np.uint8).ravel()
        )
        if a.shape[0] != width * height * 3:
            raise GifError("frame size does not match width*height*3")
        arrs.append(a.reshape(height, width, 3))
    if not arrs:
        raise GifError("need at least one frame")
    colors, size_exp, idxs = _palette_and_indices(arrs)
    out = bytearray(_header(width, height, colors, size_exp, b"GIF89a"))
    delay_cs = max(1, delay_ms // 10)
    for idx in idxs:
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
        out += _lzw_body(idx, size_exp)
    out += b"\x3b"
    return bytes(out)
