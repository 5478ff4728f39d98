"""Pure-stdlib TIFF codec: probe + uncompressed/Flate/LZW/PackBits
strip decode.

TIFF is the archival/scan format (datasets of digitized documents ship
as multi-page TIFFs) and shares its IFD structure with EXIF — this
module reuses that walk.  ``probe`` reads every IFD (multi-page):
dims, bits per sample, compression (named), photometric, strip layout.
``decode`` materializes pixels for the honestly-decodable subset —
uncompressed (1), LZW (5: the TIFF variant — MSB-first bit packing
with EARLY CHANGE, the wild's most common compressed TIFF), Deflate
(8/32946) and PackBits (32773: the fax/scanner RLE) strips, 8-bit
grayscale or RGB, top-down, with the
horizontal-differencing predictor (Predictor=2) that usually
accompanies LZW — plus bilevel CCITT fax strips (2: MH-RLE, 3: G3 1D
and mixed 1D/2D per T4Options, 4: G4/T.6 2D, the scanned-document
layer) via llm/fax_codec —
returning the common ``{width, height, mode,
pixels}`` contract; JPEG-in-TIFF and planar/tiled layouts
refuse WITH THE NAME.  ``encode`` writes real single-page uncompressed,
LZW (independent compressor: greedy string table, early-change widths,
mid-stream Clear on table fill), Deflate or PackBits TIFFs (both byte
orders, optional predictor) for fixtures and as the cross-format dedup
member; ``encode_bilevel`` / ``encode_multipage_bilevel`` write
single- and multi-page CCITT RLE/G3/G3-2D/G4 fax TIFFs (one chained
IFD per page — the scanned-document container shape); ``decode``
takes a ``page`` index bounded by ``probe()['n_pages']``.
"""

from __future__ import annotations

import struct
import zlib

__all__ = ["TiffError", "probe", "decode", "encode", "encode_bilevel",
           "encode_multipage_bilevel"]


class TiffError(ValueError):
    pass


_COMPRESSION_NAMES = {
    1: "uncompressed", 2: "CCITT-RLE", 3: "CCITT-G3", 4: "CCITT-G4",
    5: "LZW", 6: "old-JPEG", 7: "JPEG", 8: "Deflate", 32773: "PackBits",
    32946: "Deflate",
}

_T_WIDTH = 0x0100
_T_HEIGHT = 0x0101
_T_BITS = 0x0102
_T_COMPRESSION = 0x0103
_T_PHOTOMETRIC = 0x0106
_T_STRIP_OFFSETS = 0x0111
_T_SPP = 0x0115
_T_ROWS_PER_STRIP = 0x0116
_T_STRIP_COUNTS = 0x0117
_T_PLANAR = 0x011C
_T_T4_OPTIONS = 0x0124
_T_T6_OPTIONS = 0x0125
_T_TILE_W = 0x0142


def _byte_order(data: bytes) -> str:
    if data[:2] == b"II":
        return "<"
    if data[:2] == b"MM":
        return ">"
    raise TiffError(f"not a TIFF payload (byte order {data[:2]!r})")


def _ifds(data: bytes, bo: str):
    from verified_sources_spark.llm.exif import ExifError, _read_ifd

    if len(data) < 8:
        raise TiffError(f"truncated TIFF header ({len(data)} bytes)")
    (magic,) = struct.unpack_from(bo + "H", data, 2)
    if magic != 42:
        raise TiffError(f"bad TIFF magic {magic}")
    (off,) = struct.unpack_from(bo + "I", data, 4)
    seen = set()
    while off:
        if off in seen:
            raise TiffError("IFD chain cycle")
        seen.add(off)
        try:
            ifd, off = _read_ifd(data, 0, off, bo)
        except ExifError as e:
            raise TiffError(str(e)) from None
        yield ifd


def _as_list(v):
    return v if isinstance(v, list) else [v]


def _ints(data: bytes, ifd: dict, tag: int, bo: str) -> list[int]:
    """A tag's values as a list of ints (SHORT/LONG arrays arrive as
    raw bytes from the shared EXIF reader when count > 1)."""
    v = ifd.get(tag)
    if v is None:
        return []
    if isinstance(v, int):
        return [v]
    if isinstance(v, bytes):
        if len(v) % 4 == 0:
            return list(struct.unpack(bo + "I" * (len(v) // 4), v))
        if len(v) % 2 == 0:
            return list(struct.unpack(bo + "H" * (len(v) // 2), v))
        raise TiffError(f"odd-width value array for tag 0x{tag:04X}")
    if isinstance(v, list):
        return [int(x[0] / x[1]) if isinstance(x, tuple) else int(x)
                for x in v]
    raise TiffError(f"unexpected value shape for tag 0x{tag:04X}")


_T_PREDICTOR = 0x013D

_CLEAR, _EOI, _FIRST = 256, 257, 258


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW: MSB-first bit packing, 9→12-bit codes with
    EARLY CHANGE (the width bumps one code earlier than GIF's LSB
    variant — at table size 510/1022/2046 — the detail that breaks
    GIF-style decoders on real scanner output)."""
    out = bytearray()
    bitbuf = nbits = pos = 0
    width = 9
    table: list[bytes] = []
    prev: bytes | None = None

    def read_code():
        nonlocal bitbuf, nbits, pos
        while nbits < width:
            if pos >= len(data):
                return _EOI  # tolerated: many writers omit final EOI
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        v = (bitbuf >> nbits) & ((1 << width) - 1)
        bitbuf &= (1 << nbits) - 1
        return v

    base = [bytes([i]) for i in range(256)] + [b"", b""]
    while True:
        code = read_code()
        if code == _EOI:
            break
        if code == _CLEAR:
            table = list(base)
            width = 9
            prev = None
            continue
        if prev is None:
            if code >= len(table):
                raise TiffError(f"LZW stream starts with invalid code {code}")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        elif code >> 1 == _EOI:
            # A stream whose LAST data code lands exactly on the
            # early-change boundary (table 510/1022/2046) bumps the
            # reader's width, but the writer — whose final flush added
            # no table entry — emits EOI one bit NARROWER.  libtiff
            # never notices (it stops when the output buffer fills);
            # a length-blind reader (PDF streams) must recognize the
            # narrow EOI: the over-width read is (EOI << 1) | padbit.
            # Verified against system libtiff 6 output byte-for-byte.
            break
        else:
            raise TiffError(f"invalid LZW code {code} (table {len(table)})")
        out += entry
        prev = entry
        # early change, decoder side: the reader's table lags the
        # writer's by one entry, so the bump lands at 510/1022/2046
        # ((1<<width)-2) — the writer bumps at 511/1023/2047
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    return bytes(out)


def _lzw_encode(data: bytes) -> bytes:
    """Independent TIFF-LZW compressor for fixtures: greedy longest-
    match string table, early-change width bumps, Clear emitted
    mid-stream when the table fills (code 4094) per the spec."""
    out = bytearray()
    acc = nacc = 0

    def put(code: int, width: int):
        nonlocal acc, nacc
        acc = (acc << width) | code
        nacc += width
        while nacc >= 8:
            nacc -= 8
            out.append((acc >> nacc) & 0xFF)
        acc &= (1 << nacc) - 1

    width = 9
    table = {bytes([i]): i for i in range(256)}
    next_code = _FIRST
    put(_CLEAR, width)
    s = b""
    for b in data:
        c = s + bytes([b])
        if c in table:
            s = c
            continue
        put(table[s], width)
        table[c] = next_code
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code == 4094:
            put(_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = _FIRST
            width = 9
        s = bytes([b])
    if s:
        put(table[s], width)
    put(_EOI, width)
    if nacc:
        put(0, 8 - nacc)
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    """PackBits (TIFF 6.0 §9, the Apple RLE): control byte n —
    0..127 copies n+1 literal bytes, 129..255 repeats the next byte
    257-n times, 128 is a no-op."""
    out = bytearray()
    i = 0
    end = len(data)
    while i < end:
        n = data[i]
        i += 1
        if n < 128:
            j = i + n + 1
            if j > end:
                raise TiffError("truncated PackBits literal run")
            out += data[i:j]
            i = j
        elif n == 128:
            continue
        else:
            if i >= end:
                raise TiffError("truncated PackBits repeat run")
            out += bytes([data[i]]) * (257 - n)
            i += 1
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """Independent PackBits compressor for fixtures: greedy — emit a
    repeat run for >=2 identical bytes, otherwise a literal run broken
    at the next >=3-byte repeat, both capped at 128."""
    out = bytearray()
    i, end = 0, len(data)
    while i < end:
        j = i + 1
        while j < end and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 2:
            out.append(257 - (j - i))
            out.append(data[i])
            i = j
            continue
        k = i + 1
        while k < end and k - i < 128:
            if k + 2 < end and data[k] == data[k + 1] == data[k + 2]:
                break
            k += 1
        out.append(k - i - 1)
        out += data[i:k]
        i = k
    return bytes(out)


def _undiff_rows(raw: bytes, width: int, spp: int) -> bytes:
    """Reverse horizontal differencing (Predictor=2): per row, each
    sample is a delta from the same sample one pixel left."""
    row_bytes = width * spp
    out = bytearray(raw)
    for r0 in range(0, len(out) - row_bytes + 1, row_bytes):
        for i in range(r0 + spp, r0 + row_bytes):
            out[i] = (out[i] + out[i - spp]) & 0xFF
    return bytes(out)


def _diff_rows(raw: bytes, width: int, spp: int) -> bytes:
    row_bytes = width * spp
    out = bytearray(raw)
    for r0 in range(0, len(out) - row_bytes + 1, row_bytes):
        for i in range(r0 + row_bytes - 1, r0 + spp - 1, -1):
            out[i] = (out[i] - out[i - spp]) & 0xFF
    return bytes(out)


def probe(data: bytes) -> dict:
    """Header-only metadata for every page: width, height,
    bits_per_sample, samples_per_pixel, compression (named),
    photometric; top-level dims/compression are page 0's."""
    bo = _byte_order(data)
    pages = []
    for ifd in _ifds(data, bo):
        comp = _ints(data, ifd, _T_COMPRESSION, bo)
        bits = _ints(data, ifd, _T_BITS, bo)
        pages.append({
            "width": (_ints(data, ifd, _T_WIDTH, bo) or [0])[0],
            "height": (_ints(data, ifd, _T_HEIGHT, bo) or [0])[0],
            "bits_per_sample": bits or [1],
            "samples_per_pixel": (_ints(data, ifd, _T_SPP, bo) or [1])[0],
            "compression": _COMPRESSION_NAMES.get(
                (comp or [1])[0], f"compression-{(comp or [1])[0]}"
            ),
            "photometric": (_ints(data, ifd, _T_PHOTOMETRIC, bo) or [0])[0],
            "_ifd": ifd,
        })
    if not pages:
        raise TiffError("no IFDs found")
    p0 = pages[0]
    return {
        "width": p0["width"], "height": p0["height"],
        "n_pages": len(pages),
        "bits_per_sample": p0["bits_per_sample"],
        "samples_per_pixel": p0["samples_per_pixel"],
        "compression": p0["compression"],
        "photometric": p0["photometric"],
        "pages": [{k: v for k, v in pg.items() if k != "_ifd"}
                  for pg in pages],
        "_pages_raw": pages,
        "_bo": bo,
    }


def _decode_ccitt_page(data: bytes, pg: dict, ifd: dict, bo: str) -> dict:
    """Bilevel CCITT strips (COMPRESSION 2/3/4 = MH-RLE / G3 1D-or-2D
    per T4Options bit 0 / G4) through llm/fax_codec — the
    scanned-document TIFF layer.  Uncompressed mode refuses by name;
    each strip restarts the coder per the TIFF spec."""
    from verified_sources_spark.llm import fax_codec as _fax

    if pg["samples_per_pixel"] != 1 or pg["bits_per_sample"] != [1]:
        raise TiffError(
            f"CCITT TIFF must be 1-bit single-sample, got "
            f"{pg['bits_per_sample']} x{pg['samples_per_pixel']}")
    if _T_TILE_W in ifd:
        raise TiffError("cannot decode tiled TIFF (strips only)")
    w, h = pg["width"], pg["height"]
    comp = pg["compression"]
    g3_2d = False
    if comp == "CCITT-G3":
        t4 = (_ints(data, ifd, _T_T4_OPTIONS, bo) or [0])[0]
        g3_2d = bool(t4 & 1)
        if t4 & 2:
            raise TiffError("Group 3 uncompressed mode — refusing by name")
    rps = (_ints(data, ifd, _T_ROWS_PER_STRIP, bo) or [h])[0]
    offsets = _ints(data, ifd, _T_STRIP_OFFSETS, bo)
    counts = _ints(data, ifd, _T_STRIP_COUNTS, bo)
    if not offsets or len(offsets) != len(counts):
        raise TiffError("missing/mismatched strip tables")
    rows: list[bytes] = []
    for si, (off, cnt) in enumerate(zip(offsets, counts)):
        if off + cnt > len(data):
            raise TiffError(f"truncated strip at {off}")
        n = min(rps, h - si * rps)
        if n <= 0:
            break
        chunk = data[off : off + cnt]
        try:
            if comp == "CCITT-RLE":
                rows += _fax.decode_rle(chunk, w, n)
            elif comp == "CCITT-G3":
                rows += (_fax.decode_g3_2d(chunk, w, n) if g3_2d
                         else _fax.decode_g3(chunk, w, n,
                                             require_eol=False))
            else:
                rows += _fax.decode_g4(chunk, w, n)
        except _fax.FaxError as e:
            raise TiffError(f"bad {comp} strip: {e}") from None
    if len(rows) < h:
        raise TiffError(f"CCITT strips short: {len(rows)} < {h} rows")
    # fax runs are white/black; photometric 0 (MinIsWhite, the fax
    # standard sense) maps black->0, 1 (MinIsBlack) inverts
    if pg["photometric"] == 1:
        tbl = bytes(255 if b else 0 for b in range(256))
    else:
        tbl = bytes(0 if b else 255 for b in range(256))
    gray = b"".join(rows[:h]).translate(tbl)
    px = bytearray(len(gray) * 3)
    px[0::3] = gray
    px[1::3] = gray
    px[2::3] = gray
    return {"width": w, "height": h, "mode": "RGB", "pixels": bytes(px)}


def decode(data: bytes, page: int = 0) -> dict:
    """Pixels for IFD ``page`` (default the first — multi-page scanned
    documents decode page-by-page; ``probe(data)['n_pages']`` bounds
    the loop) for the decodable subset (uncompressed, LZW or
    Deflate strips, 8-bit gray or RGB, chunky, Predictor 1/2; bilevel
    CCITT RLE/G3-1D/2D/G4 fax strips via llm/fax_codec): the common
    ``{width, height, mode, pixels}`` contract (gray replicates
    to RGB).  Everything else refuses with the compression/layout
    named."""
    m = probe(data)
    bo = m["_bo"]
    pages = m["_pages_raw"]
    if not 0 <= page < len(pages):
        raise TiffError(
            f"page {page} out of range (TIFF has {len(pages)} pages)")
    pg = pages[page]
    ifd = pg["_ifd"]
    if pg["compression"] in ("CCITT-RLE", "CCITT-G3", "CCITT-G4"):
        return _decode_ccitt_page(data, pg, ifd, bo)
    if pg["compression"] not in ("uncompressed", "Deflate", "LZW", "PackBits"):
        raise TiffError(
            f"cannot decode {pg['compression']} TIFF "
            f"(uncompressed/LZW/Deflate/PackBits only)"
        )
    planar = (_ints(data, ifd, _T_PLANAR, bo) or [1])[0]
    if planar != 1:
        raise TiffError("cannot decode planar TIFF (chunky only)")
    if _T_TILE_W in ifd:
        raise TiffError("cannot decode tiled TIFF (strips only)")
    spp = pg["samples_per_pixel"]
    bits = pg["bits_per_sample"]
    if spp not in (1, 3) or any(b != 8 for b in bits):
        raise TiffError(
            f"cannot decode {bits}-bit x{spp} TIFF (8-bit gray/RGB only)"
        )
    predictor = (_ints(data, ifd, _T_PREDICTOR, bo) or [1])[0]
    if predictor not in (1, 2):
        raise TiffError(f"cannot decode TIFF predictor {predictor}")
    offsets = _ints(data, ifd, _T_STRIP_OFFSETS, bo)
    counts = _ints(data, ifd, _T_STRIP_COUNTS, bo)
    if not offsets or len(offsets) != len(counts):
        raise TiffError("missing/mismatched strip tables")
    w, h = pg["width"], pg["height"]
    raw = bytearray()
    for off, cnt in zip(offsets, counts):
        if off + cnt > len(data):
            raise TiffError(f"truncated strip at {off}")
        chunk = data[off : off + cnt]
        if pg["compression"] == "Deflate":
            try:
                chunk = zlib.decompress(chunk)
            except zlib.error as e:
                raise TiffError(f"bad Deflate strip: {e}") from None
        elif pg["compression"] == "LZW":
            chunk = _lzw_decode(chunk)
        elif pg["compression"] == "PackBits":
            chunk = _packbits_decode(chunk)
        if predictor == 2:
            # the predictor resets at every strip's first column but
            # accumulates along each row WITHIN a strip
            chunk = _undiff_rows(chunk, w, spp)
        raw += chunk
    need = w * h * spp
    if len(raw) < need:
        raise TiffError(f"strip data short: {len(raw)} < {need}")
    raw = bytes(raw[:need])
    if spp == 1:
        raw = b"".join(bytes([v, v, v]) for v in raw)
    return {"width": w, "height": h, "mode": "RGB", "pixels": raw}


def encode(
    width: int,
    height: int,
    pixels: bytes,
    mode: str = "RGB",
    byte_order: str = "II",
    deflate: bool = False,
    lzw: bool = False,
    packbits: bool = False,
    predictor: bool = False,
    rows_per_strip: int | None = None,
) -> bytes:
    """Real single-page TIFF: chunky 8-bit gray or RGB, one or more
    strips, optional Deflate, LZW or PackBits compression (independent
    compressors — fixtures don't share run/table logic with the
    decoder), optional horizontal-differencing predictor, either byte
    order."""
    if deflate + lzw + packbits > 1:
        raise TiffError("choose one of deflate/lzw/packbits")
    spp = 3 if mode == "RGB" else 1
    if len(pixels) != width * height * spp:
        raise TiffError("pixel buffer does not match dimensions")
    bo = "<" if byte_order == "II" else ">"
    rps = rows_per_strip or height
    strips = []
    for y0 in range(0, height, rps):
        rows = pixels[y0 * width * spp : min(y0 + rps, height) * width * spp]
        if predictor:
            rows = _diff_rows(rows, width, spp)
        if deflate:
            rows = zlib.compress(rows)
        elif lzw:
            rows = _lzw_encode(rows)
        elif packbits:
            rows = _packbits_encode(rows)
        strips.append(rows)

    n_entries = 10 if predictor else 9
    ifd_off = 8
    ifd_size = 2 + 12 * n_entries + 4
    heap = bytearray()
    heap_off = ifd_off + ifd_size

    def entry(tag, typ, cnt, val4):
        return struct.pack(bo + "HHI", tag, typ, cnt) + val4

    def short4(v):
        return struct.pack(bo + "H", v) + b"\x00\x00"

    def long4(v):
        return struct.pack(bo + "I", v)

    def longs(vals):
        if len(vals) == 1:
            return long4(vals[0])
        off = heap_off + len(heap)
        for v in vals:
            heap.extend(struct.pack(bo + "I", v))
        return long4(off)

    bits4 = short4(8)
    if spp == 3:
        off = heap_off + len(heap)
        heap.extend(struct.pack(bo + "HHH", 8, 8, 8))
        bits4 = long4(off)

    # strip offsets resolve after the heap: reserve placeholder entries
    strip_data_off_marker = object()
    entries = [
        entry(_T_WIDTH, 4, 1, long4(width)),
        entry(_T_HEIGHT, 4, 1, long4(height)),
        entry(_T_BITS, 3, spp, bits4),
        entry(_T_COMPRESSION, 3, 1,
              short4(8 if deflate else 5 if lzw
                     else 32773 if packbits else 1)),
        entry(_T_PHOTOMETRIC, 3, 1, short4(2 if spp == 3 else 1)),
        None,  # strip offsets: patched below
        entry(_T_SPP, 3, 1, short4(spp)),
        entry(_T_ROWS_PER_STRIP, 4, 1, long4(rps)),
        entry(_T_STRIP_COUNTS, 4, len(strips),
              longs([len(s) for s in strips])),
    ]
    if predictor:
        entries.append(entry(_T_PREDICTOR, 3, 1, short4(2)))
    del strip_data_off_marker
    # strip payloads live after the heap
    data_off = heap_off + len(heap) + (4 * len(strips) if len(strips) > 1
                                       else 0)
    offs = []
    acc = data_off
    for s in strips:
        offs.append(acc)
        acc += len(s)
    entries[5] = entry(_T_STRIP_OFFSETS, 4, len(strips), longs(offs))
    ifd = (struct.pack(bo + "H", n_entries) + b"".join(entries)
           + b"\x00\x00\x00\x00")
    head = ((b"II" if bo == "<" else b"MM") + struct.pack(bo + "H", 42)
            + struct.pack(bo + "I", ifd_off))
    return head + ifd + bytes(heap) + b"".join(strips)


def encode_bilevel(
    width: int,
    height: int,
    bits: bytes,
    compression: str = "g4",
    byte_order: str = "II",
    rows_per_strip: int | None = None,
) -> bytes:
    """Real single-page bilevel TIFF: 1 bit/sample, PHOTOMETRIC
    MinIsWhite (the fax standard sense), CCITT
    ``rle``/``g3``/``g3-2d``/``g4`` strips via llm/fax_codec.  ``bits`` is one byte per pixel, 1=black.
    The fax coder is cross-checked against system libtiff in both
    directions (tests/test_fax_codec.py), so fixtures minted here are
    anchored to an independent implementation."""
    from verified_sources_spark.llm import fax_codec as _fax

    if len(bits) != width * height:
        raise TiffError("bit buffer does not match dimensions")
    if any(b > 1 for b in bits):
        raise TiffError("bilevel buffer must be 0/1 bytes")
    try:
        comp_id = {"rle": 2, "g3": 3, "g3-2d": 3, "g4": 4}[compression]
        enc = {"rle": _fax.encode_rle, "g3": _fax.encode_g3,
               "g3-2d": _fax.encode_g3_2d,
               "g4": _fax.encode_g4}[compression]
    except KeyError:
        raise TiffError(f"unknown CCITT flavor {compression!r}") from None
    bo = "<" if byte_order == "II" else ">"
    rps = rows_per_strip or height
    rows = [bits[y * width : (y + 1) * width] for y in range(height)]
    strips = [enc(rows[y0 : y0 + rps]) for y0 in range(0, height, rps)]

    n_entries = 9 + (1 if compression.startswith("g3") else 0)
    ifd_off = 8
    heap = bytearray()
    heap_off = ifd_off + 2 + 12 * n_entries + 4

    def entry(tag, typ, cnt, val4):
        return struct.pack(bo + "HHI", tag, typ, cnt) + val4

    def short4(v):
        return struct.pack(bo + "H", v) + b"\x00\x00"

    def long4(v):
        return struct.pack(bo + "I", v)

    def longs(vals):
        if len(vals) == 1:
            return long4(vals[0])
        off = heap_off + len(heap)
        for v in vals:
            heap.extend(struct.pack(bo + "I", v))
        return long4(off)

    counts4 = longs([len(s) for s in strips])
    data_off = heap_off + len(heap) + (4 * len(strips)
                                       if len(strips) > 1 else 0)
    offs = []
    acc = data_off
    for s in strips:
        offs.append(acc)
        acc += len(s)
    entries = [
        entry(_T_WIDTH, 4, 1, long4(width)),
        entry(_T_HEIGHT, 4, 1, long4(height)),
        entry(_T_BITS, 3, 1, short4(1)),
        entry(_T_COMPRESSION, 3, 1, short4(comp_id)),
        entry(_T_PHOTOMETRIC, 3, 1, short4(0)),
        entry(_T_STRIP_OFFSETS, 4, len(strips), longs(offs)),
        entry(_T_SPP, 3, 1, short4(1)),
        entry(_T_ROWS_PER_STRIP, 4, 1, long4(rps)),
        entry(_T_STRIP_COUNTS, 4, len(strips), counts4),
    ]
    if compression.startswith("g3"):
        entries.append(entry(_T_T4_OPTIONS, 4, 1,
                             long4(1 if compression == "g3-2d" else 0)))
    ifd = (struct.pack(bo + "H", n_entries) + b"".join(entries)
           + b"\x00\x00\x00\x00")
    head = ((b"II" if bo == "<" else b"MM") + struct.pack(bo + "H", 42)
            + struct.pack(bo + "I", ifd_off))
    return head + ifd + bytes(heap) + b"".join(strips)


def encode_multipage_bilevel(
    pages: list[tuple[int, int, bytes]],
    compression: str = "g4",
    byte_order: str = "II",
    rows_per_strip: int | None = None,
) -> bytes:
    """Real MULTI-page bilevel fax TIFF — the canonical scanned-
    document container (one IFD per page, chained).  ``pages`` is a
    list of (width, height, bits) with bits one 0/1 byte per pixel
    (1=black); each page gets its own CCITT-coded strips via
    llm/fax_codec, same flavors as ``encode_bilevel``."""
    if not pages:
        raise TiffError("multipage TIFF needs at least one page")
    from verified_sources_spark.llm import fax_codec as _fax

    try:
        comp_id = {"rle": 2, "g3": 3, "g3-2d": 3, "g4": 4}[compression]
        enc = {"rle": _fax.encode_rle, "g3": _fax.encode_g3,
               "g3-2d": _fax.encode_g3_2d,
               "g4": _fax.encode_g4}[compression]
    except KeyError:
        raise TiffError(f"unknown CCITT flavor {compression!r}") from None
    bo = "<" if byte_order == "II" else ">"
    n_entries = 9 + (1 if compression.startswith("g3") else 0)
    out = bytearray((b"II" if bo == "<" else b"MM")
                    + struct.pack(bo + "H", 42) + b"\x00\x00\x00\x00")

    def entry(tag, typ, cnt, val4):
        return struct.pack(bo + "HHI", tag, typ, cnt) + val4

    next_ptr_pos = 4  # where the previous chain pointer lives
    for width, height, bits in pages:
        if len(bits) != width * height:
            raise TiffError("bit buffer does not match page dimensions")
        rps = rows_per_strip or height
        rows = [bits[y * width : (y + 1) * width] for y in range(height)]
        strips = [enc(rows[y0 : y0 + rps])
                  for y0 in range(0, height, rps)]
        ifd_off = len(out)
        struct.pack_into(bo + "I", out, next_ptr_pos, ifd_off)
        heap = bytearray()
        heap_off = ifd_off + 2 + 12 * n_entries + 4

        def longs(vals):
            if len(vals) == 1:
                return struct.pack(bo + "I", vals[0])
            off = heap_off + len(heap)
            for v in vals:
                heap.extend(struct.pack(bo + "I", v))
            return struct.pack(bo + "I", off)

        def short4(v):
            return struct.pack(bo + "H", v) + b"\x00\x00"

        def long4(v):
            return struct.pack(bo + "I", v)

        counts4 = longs([len(s) for s in strips])
        data_off = heap_off + len(heap) + (4 * len(strips)
                                           if len(strips) > 1 else 0)
        offs = []
        acc = data_off
        for s in strips:
            offs.append(acc)
            acc += len(s)
        entries = [
            entry(_T_WIDTH, 4, 1, long4(width)),
            entry(_T_HEIGHT, 4, 1, long4(height)),
            entry(_T_BITS, 3, 1, short4(1)),
            entry(_T_COMPRESSION, 3, 1, short4(comp_id)),
            entry(_T_PHOTOMETRIC, 3, 1, short4(0)),
            entry(_T_STRIP_OFFSETS, 4, len(strips), longs(offs)),
            entry(_T_SPP, 3, 1, short4(1)),
            entry(_T_ROWS_PER_STRIP, 4, 1, long4(rps)),
            entry(_T_STRIP_COUNTS, 4, len(strips), counts4),
        ]
        if compression.startswith("g3"):
            entries.append(entry(
                _T_T4_OPTIONS, 4, 1,
                long4(1 if compression == "g3-2d" else 0)))
        next_ptr_pos = len(out) + 2 + 12 * n_entries
        out += (struct.pack(bo + "H", n_entries) + b"".join(entries)
                + b"\x00\x00\x00\x00")
        out += heap
        out += b"".join(strips)
    return bytes(out)
