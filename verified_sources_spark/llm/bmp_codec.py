"""Pure-stdlib BMP decoder (Windows DIB: 24/32-bit BI_RGB + 8-bit
paletted).

BMPs still show up in scraped corpora (screenshots, clip art, legacy
uploads).  The format is the same DIB layout the AVI codec already
reads (bottom-up BGR rows, 4-byte stride) wrapped in a
BITMAPFILEHEADER; this module shares that math and emits the common
decode contract (``{width, height, mode, pixels}``, top-down RGB).
All four compressions decode: BI_RGB, RLE8/RLE4 runs, and
BI_BITFIELDS with arbitrary 16/32-bit channel masks (565/555/888, the
screenshot formats); malformed bit-depth/compression combos refuse
with the compression name.  ``encode`` emits 24-bit BI_RGB,
``encode_rle4`` / ``encode_bitfields`` the compressed flavors, for
deterministic fixtures.
"""

from __future__ import annotations

import struct

__all__ = ["BmpError", "probe", "decode", "encode", "encode_rle4",
           "encode_bitfields"]


class BmpError(ValueError):
    pass


_COMPRESSION = {0: "BI_RGB", 1: "BI_RLE8", 2: "BI_RLE4", 3: "BI_BITFIELDS"}


def probe(data: bytes) -> dict:
    """Header-only metadata — width, height, bits, compression,
    bottom_up, pixel data offset."""
    if len(data) < 54 or data[:2] != b"BM":
        raise BmpError("not a BMP payload")
    (_size, _r1, _r2, offset) = struct.unpack_from("<IHHI", data, 2)
    (hsize, w, h, planes, bits, comp) = struct.unpack_from("<IiiHHI", data, 14)
    if hsize < 40:
        raise BmpError(f"unsupported DIB header size {hsize}")
    return {
        "width": w,
        "height": abs(h),
        "bottom_up": h > 0,
        "bits": bits,
        "compression": _COMPRESSION.get(comp, f"unknown({comp})"),
        "offset": offset,
        "header_size": hsize,
    }


def decode(data: bytes) -> dict:
    """Top-down RGB: probe fields plus ``pixels`` (h*w*3) and ``mode``
    ('RGB').  24/32-bit BI_RGB, 8-bit paletted, RLE8/RLE4 runs, and
    16/32-bit BI_BITFIELDS (arbitrary channel masks) decode; anything
    else refuses with the name."""
    import numpy as np

    meta = probe(data)
    if meta["compression"] == "BI_RLE8":
        return _decode_rle8(data, meta)
    if meta["compression"] == "BI_RLE4":
        return _decode_rle4(data, meta)
    if meta["compression"] == "BI_BITFIELDS":
        return _decode_bitfields(data, meta)
    if meta["compression"] != "BI_RGB":
        raise BmpError(f"cannot decode {meta['compression']} BMP (BI_RGB only)")
    w, h, bits = meta["width"], meta["height"], meta["bits"]
    if bits not in (8, 24, 32):
        raise BmpError(f"cannot decode {bits}-bit BMP (8/24/32 only)")
    stride = (w * bits // 8 + 3) & ~3
    need = meta["offset"] + stride * h
    if len(data) < need:
        raise BmpError(f"truncated pixel data: {len(data)} < {need}")
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * h, offset=meta["offset"]
    ).reshape(h, stride)
    if bits == 8:
        pal_off = 14 + meta["header_size"]
        n_pal = (meta["offset"] - pal_off) // 4
        if n_pal <= 0:
            raise BmpError("8-bit BMP without a palette")
        pal = np.frombuffer(
            data, dtype=np.uint8, count=4 * n_pal, offset=pal_off
        ).reshape(n_pal, 4)[:, :3][:, ::-1]  # BGRX -> RGB
        idx = rows[:, :w]
        if idx.max(initial=0) >= n_pal:
            raise BmpError("palette index out of range")
        rgb = pal[idx]
    else:
        ch = bits // 8
        px = rows[:, : w * ch].reshape(h, w, ch)
        rgb = px[:, :, 2::-1]  # BGR(A) -> RGB
    if meta["bottom_up"]:
        rgb = rgb[::-1]
    meta = dict(meta)
    meta["pixels"] = np.ascontiguousarray(rgb).tobytes()
    meta["mode"] = "RGB"
    return meta


def _decode_rle8(data: bytes, meta: dict) -> dict:
    """Microsoft RLE8: [n>0, idx] runs; [0, 0]=end-of-line, [0, 1]=
    end-of-bitmap, [0, 2]=delta(dx, dy) (skipped pixels keep index 0),
    [0, n>=3]=n absolute literals padded to a word boundary."""
    import numpy as np

    if meta["bits"] != 8:
        raise BmpError("RLE8 BMP must be 8-bit")
    w, h = meta["width"], meta["height"]
    pal_off = 14 + meta["header_size"]
    n_pal = (meta["offset"] - pal_off) // 4
    if n_pal <= 0:
        raise BmpError("RLE8 BMP without a palette")
    pal = np.frombuffer(
        data, dtype=np.uint8, count=4 * n_pal, offset=pal_off
    ).reshape(n_pal, 4)[:, :3][:, ::-1]
    idx = np.zeros((h, w), dtype=np.uint8)
    x = y = 0
    pos = meta["offset"]
    while pos + 1 < len(data):
        n, v = data[pos], data[pos + 1]
        pos += 2
        if n > 0:  # encoded run
            end = min(x + n, w)
            idx[y, x:end] = v
            x = end
        elif v == 0:  # end of line
            x, y = 0, y + 1
            if y >= h:
                break
        elif v == 1:  # end of bitmap
            break
        elif v == 2:  # delta
            if pos + 1 >= len(data):
                raise BmpError("truncated RLE8 delta")
            x = min(x + data[pos], w)
            y = min(y + data[pos + 1], h - 1)
            pos += 2
        else:  # absolute mode: v literals, word-aligned
            if pos + v > len(data):
                raise BmpError("truncated RLE8 absolute run")
            end = min(x + v, w)
            idx[y, x:end] = np.frombuffer(
                data, dtype=np.uint8, count=end - x, offset=pos
            )
            x = end
            pos += v + (v & 1)
    if idx.max(initial=0) >= n_pal:
        raise BmpError("palette index out of range")
    rgb = pal[idx]
    if meta["bottom_up"]:
        rgb = rgb[::-1]
    out = dict(meta)
    out["pixels"] = np.ascontiguousarray(rgb).tobytes()
    out["mode"] = "RGB"
    return out


def _decode_rle4(data: bytes, meta: dict) -> dict:
    """Microsoft RLE4: same control codes as RLE8 but pixels are
    nibbles — an encoded run [n, v] alternates v's high and low
    nibble; absolute runs pack two pixels per byte, word-aligned."""
    import numpy as np

    if meta["bits"] != 4:
        raise BmpError("BI_RLE4 BMP must be 4-bit")
    w, h = meta["width"], meta["height"]
    pal_off = 14 + meta["header_size"]
    n_pal = (meta["offset"] - pal_off) // 4
    if n_pal <= 0:
        raise BmpError("BI_RLE4 BMP without a palette")
    pal = np.frombuffer(
        data, dtype=np.uint8, count=4 * n_pal, offset=pal_off
    ).reshape(n_pal, 4)[:, :3][:, ::-1]
    idx = np.zeros((h, w), dtype=np.uint8)
    x = y = 0
    pos = meta["offset"]
    while pos + 1 < len(data):
        n, v = data[pos], data[pos + 1]
        pos += 2
        if n > 0:  # encoded run: alternate high/low nibble
            end = min(x + n, w)
            hi, lo = v >> 4, v & 0xF
            for k in range(end - x):
                idx[y, x + k] = hi if k % 2 == 0 else lo
            x = end
        elif v == 0:  # end of line
            x, y = 0, y + 1
            if y >= h:
                break
        elif v == 1:  # end of bitmap
            break
        elif v == 2:  # delta
            if pos + 1 >= len(data):
                raise BmpError("truncated RLE4 delta")
            x = min(x + data[pos], w)
            y = min(y + data[pos + 1], h - 1)
            pos += 2
        else:  # absolute: v nibbles, byte count word-aligned
            nbytes = (v + 1) // 2
            if pos + nbytes > len(data):
                raise BmpError("truncated RLE4 absolute run")
            end = min(x + v, w)
            for k in range(end - x):
                b = data[pos + k // 2]
                idx[y, x + k] = (b >> 4) if k % 2 == 0 else (b & 0xF)
            x = end
            pos += nbytes + (nbytes & 1)
    if idx.max(initial=0) >= n_pal:
        raise BmpError("palette index out of range")
    rgb = pal[idx]
    if meta["bottom_up"]:
        rgb = rgb[::-1]
    out = dict(meta)
    out["pixels"] = np.ascontiguousarray(rgb).tobytes()
    out["mode"] = "RGB"
    return out


def _decode_bitfields(data: bytes, meta: dict) -> dict:
    """BI_BITFIELDS: 16/32-bit samples with per-channel masks (the
    three dwords following the 40-byte info header, or in place in
    V4+ headers — byte position 54 either way).  Each channel scales
    to 8 bits by exact integer rounding."""
    import numpy as np

    bits = meta["bits"]
    if bits not in (16, 32):
        raise BmpError("BI_BITFIELDS BMP must be 16/32-bit")
    if len(data) < 66:
        raise BmpError("truncated BI_BITFIELDS masks")
    masks = struct.unpack_from("<III", data, 54)
    w, h = meta["width"], meta["height"]
    stride = (w * bits // 8 + 3) & ~3
    need = meta["offset"] + stride * h
    if len(data) < need:
        raise BmpError(f"truncated pixel data: {len(data)} < {need}")
    rows = np.frombuffer(
        data, dtype=np.uint8, count=stride * h, offset=meta["offset"]
    ).reshape(h, stride)
    dt = np.uint16 if bits == 16 else np.uint32
    px = rows[:, : w * bits // 8].reshape(h, -1).view(dt)[:, :w].astype(
        np.uint32)
    chans = []
    for mask in masks:
        if mask == 0:
            raise BmpError("BI_BITFIELDS with a zero channel mask")
        shift = (mask & -mask).bit_length() - 1
        maxv = mask >> shift
        v = (px & mask) >> shift
        chans.append(((v * 255 + maxv // 2) // maxv).astype(np.uint8))
    rgb = np.stack(chans, axis=2)
    if meta["bottom_up"]:
        rgb = rgb[::-1]
    out = dict(meta)
    out["pixels"] = np.ascontiguousarray(rgb).tobytes()
    out["mode"] = "RGB"
    return out


def encode(width: int, height: int, pixels: bytes) -> bytes:
    """24-bit BI_RGB BMP from top-down RGB bytes — fixture generator."""
    import numpy as np

    if len(pixels) != width * height * 3:
        raise BmpError("pixel buffer does not match width*height*3")
    rgb = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, 3)
    bgr = rgb[::-1, :, ::-1]  # bottom-up BGR
    stride = (width * 3 + 3) & ~3
    rows = np.zeros((height, stride), dtype=np.uint8)
    rows[:, : width * 3] = bgr.reshape(height, width * 3)
    body = rows.tobytes()
    offset = 14 + 40
    header = b"BM" + struct.pack("<IHHI", offset + len(body), 0, 0, offset)
    dib = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return header + dib + body


def encode_rle4(width: int, height: int, idx: bytes,
                palette: list[tuple[int, int, int]]) -> bytes:
    """4-bit RLE4 BMP fixture from top-down palette indices (one 0-15
    byte per pixel) — encoded runs + EOL/EOB control codes, bottom-up
    per the format."""
    if len(idx) != width * height:
        raise BmpError("index buffer does not match dimensions")
    if not 0 < len(palette) <= 16 or max(idx) >= len(palette):
        raise BmpError("palette must cover all indices (<= 16 entries)")
    body = bytearray()
    for y in range(height - 1, -1, -1):
        row = idx[y * width : (y + 1) * width]
        x = 0
        while x < width:
            run = 1
            while (x + run < width and row[x + run] == row[x]
                   and run < 254):
                run += 1
            c = row[x]
            body += bytes([run, (c << 4) | c])
            x += run
        body += b"\x00\x00"  # end of line
    body += b"\x00\x01"      # end of bitmap
    pal = b"".join(bytes([b, g, r, 0]) for r, g, b in palette)
    offset = 14 + 40 + len(pal)
    header = b"BM" + struct.pack("<IHHI", offset + len(body), 0, 0, offset)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 4, 2,
                      len(body), 2835, 2835, len(palette), 0)
    return header + dib + pal + bytes(body)


def encode_bitfields(width: int, height: int, pixels: bytes,
                     bits: int = 16,
                     masks: tuple[int, int, int] = (0xF800, 0x07E0,
                                                    0x001F)) -> bytes:
    """BI_BITFIELDS fixture from top-down RGB bytes: packs each
    channel into its mask (565 by default; any disjoint masks fitting
    ``bits``), bottom-up, 4-byte row stride."""
    import numpy as np

    if len(pixels) != width * height * 3:
        raise BmpError("pixel buffer does not match width*height*3")
    if bits not in (16, 32):
        raise BmpError("BI_BITFIELDS fixture supports 16/32-bit only")
    rgb = np.frombuffer(pixels, dtype=np.uint8).reshape(
        height, width, 3).astype(np.uint32)
    packed = np.zeros((height, width), dtype=np.uint32)
    for ch, mask in enumerate(masks):
        shift = (mask & -mask).bit_length() - 1
        maxv = mask >> shift
        packed |= ((rgb[:, :, ch] * maxv + 127) // 255) << shift
    packed = packed[::-1]  # bottom-up
    dt = np.uint16 if bits == 16 else np.uint32
    stride = (width * bits // 8 + 3) & ~3
    rows = np.zeros((height, stride), dtype=np.uint8)
    raw = packed.astype(dt).view(np.uint8).reshape(height, -1)
    rows[:, : raw.shape[1]] = raw
    body = rows.tobytes()
    offset = 14 + 40 + 12
    header = b"BM" + struct.pack("<IHHI", offset + len(body), 0, 0, offset)
    dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, bits, 3,
                      len(body), 2835, 2835, 0, 0)
    return header + dib + struct.pack("<III", *masks) + body
