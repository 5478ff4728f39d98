"""Pure-stdlib BMP decoder (Windows DIB: 24/32-bit BI_RGB + 8-bit
paletted).

BMPs still show up in scraped corpora (screenshots, clip art, legacy
uploads).  The format is the same DIB layout the AVI codec already
reads (bottom-up BGR rows, 4-byte stride) wrapped in a
BITMAPFILEHEADER; this module shares that math and emits the common
decode contract (``{width, height, mode, pixels}``, top-down RGB).
Compressed BMPs (RLE4/RLE8/bitfields beyond the identity masks) refuse
with the compression name.  ``encode`` emits 24-bit BI_RGB for
deterministic fixtures.
"""

from __future__ import annotations

import struct

__all__ = ["BmpError", "probe", "decode", "encode"]


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
    ('RGB').  24/32-bit BI_RGB, 8-bit paletted, and 8-bit RLE8 decode;
    RLE4 and bitfields refuse with the name."""
    import numpy as np

    meta = probe(data)
    if meta["compression"] == "BI_RLE8":
        return _decode_rle8(data, meta)
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
