"""ITU-T T.4 / T.6 (CCITT Group 3 / Group 4) fax decode + encode —
pure stdlib.  The scanned-document layer: bilevel fax compression is
what legacy document TIFFs and PDF /CCITTFaxDecode images (scanner
output, fax archives, patent/records corpora) actually ship, and a
training-data pipeline that refuses them drops an entire corpus
genre.  Reference analogue: sources/unstructured_data +
sources/filesystem route local scanned documents into text/feature
pipelines.

Supported (everything else refuses by name):

- Modified Huffman 1D rows: TIFF COMPRESSION_CCITTRLE (2,
  byte-aligned rows, no EOL) and COMPRESSION_CCITTFAX3 (3, 1D with
  EOL markers + RTC); PDF CCITTFaxDecode with K = 0.
- Group 3 2D (T.4 K>0): EOL + tag-bit framed mixed 1D/2D rows —
  TIFF COMPRESSION_CCITTFAX3 with T4Options bit 0, PDF CCITTFaxDecode
  with K > 0.
- Group 4 (T.6) 2D: TIFF COMPRESSION_CCITTFAX4 (4) and PDF
  CCITTFaxDecode with K < 0 — pass / horizontal / vertical modes,
  EOFB termination.  T.4/T.6 uncompressed mode refuses by name.

The run-length code tables below are the ITU standard's published
constants, recovered EMPIRICALLY from system libtiff 6 by
tools/derive_t4_tables.py (divergent-anchor common-prefix probing of
COMPRESSION_CCITTRLE output) rather than hand-transcribed — a wrong
bit in a 208-entry codebook is exactly the silent-garble failure the
codec suite's verification posture exists to prevent.  The
capability-gated test suite round-trips random bitmaps against
libtiff in BOTH directions (tests/test_fax_codec.py).
"""

from __future__ import annotations

__all__ = [
    "FaxError",
    "decode_rle", "decode_g3", "decode_g3_2d", "decode_g4",
    "encode_rle", "encode_g3", "encode_g3_2d", "encode_g4",
    "pack_row_bits", "unpack_row_bits",
]


class FaxError(ValueError):
    """Named refusal: not a fax stream this decoder can serve honestly."""


# ---------------------------------------------------------------------------
# ITU T.4 code tables (bitstrings MSB-first) — derived, see module doc

WHITE_TERM = {
    0: "00110101",
    1: "000111",
    2: "0111",
    3: "1000",
    4: "1011",
    5: "1100",
    6: "1110",
    7: "1111",
    8: "10011",
    9: "10100",
    10: "00111",
    11: "01000",
    12: "001000",
    13: "000011",
    14: "110100",
    15: "110101",
    16: "101010",
    17: "101011",
    18: "0100111",
    19: "0001100",
    20: "0001000",
    21: "0010111",
    22: "0000011",
    23: "0000100",
    24: "0101000",
    25: "0101011",
    26: "0010011",
    27: "0100100",
    28: "0011000",
    29: "00000010",
    30: "00000011",
    31: "00011010",
    32: "00011011",
    33: "00010010",
    34: "00010011",
    35: "00010100",
    36: "00010101",
    37: "00010110",
    38: "00010111",
    39: "00101000",
    40: "00101001",
    41: "00101010",
    42: "00101011",
    43: "00101100",
    44: "00101101",
    45: "00000100",
    46: "00000101",
    47: "00001010",
    48: "00001011",
    49: "01010010",
    50: "01010011",
    51: "01010100",
    52: "01010101",
    53: "00100100",
    54: "00100101",
    55: "01011000",
    56: "01011001",
    57: "01011010",
    58: "01011011",
    59: "01001010",
    60: "01001011",
    61: "00110010",
    62: "00110011",
    63: "00110100",
}
BLACK_TERM = {
    0: "0000110111",
    1: "010",
    2: "11",
    3: "10",
    4: "011",
    5: "0011",
    6: "0010",
    7: "00011",
    8: "000101",
    9: "000100",
    10: "0000100",
    11: "0000101",
    12: "0000111",
    13: "00000100",
    14: "00000111",
    15: "000011000",
    16: "0000010111",
    17: "0000011000",
    18: "0000001000",
    19: "00001100111",
    20: "00001101000",
    21: "00001101100",
    22: "00000110111",
    23: "00000101000",
    24: "00000010111",
    25: "00000011000",
    26: "000011001010",
    27: "000011001011",
    28: "000011001100",
    29: "000011001101",
    30: "000001101000",
    31: "000001101001",
    32: "000001101010",
    33: "000001101011",
    34: "000011010010",
    35: "000011010011",
    36: "000011010100",
    37: "000011010101",
    38: "000011010110",
    39: "000011010111",
    40: "000001101100",
    41: "000001101101",
    42: "000011011010",
    43: "000011011011",
    44: "000001010100",
    45: "000001010101",
    46: "000001010110",
    47: "000001010111",
    48: "000001100100",
    49: "000001100101",
    50: "000001010010",
    51: "000001010011",
    52: "000000100100",
    53: "000000110111",
    54: "000000111000",
    55: "000000100111",
    56: "000000101000",
    57: "000001011000",
    58: "000001011001",
    59: "000000101011",
    60: "000000101100",
    61: "000001011010",
    62: "000001100110",
    63: "000001100111",
}
WHITE_MAKEUP = {
    64: "11011",
    128: "10010",
    192: "010111",
    256: "0110111",
    320: "00110110",
    384: "00110111",
    448: "01100100",
    512: "01100101",
    576: "01101000",
    640: "01100111",
    704: "011001100",
    768: "011001101",
    832: "011010010",
    896: "011010011",
    960: "011010100",
    1024: "011010101",
    1088: "011010110",
    1152: "011010111",
    1216: "011011000",
    1280: "011011001",
    1344: "011011010",
    1408: "011011011",
    1472: "010011000",
    1536: "010011001",
    1600: "010011010",
    1664: "011000",
    1728: "010011011",
    1792: "00000001000",
    1856: "00000001100",
    1920: "00000001101",
    1984: "000000010010",
    2048: "000000010011",
    2112: "000000010100",
    2176: "000000010101",
    2240: "000000010110",
    2304: "000000010111",
    2368: "000000011100",
    2432: "000000011101",
    2496: "000000011110",
    2560: "000000011111",
}
BLACK_MAKEUP = {
    64: "0000001111",
    128: "000011001000",
    192: "000011001001",
    256: "000001011011",
    320: "000000110011",
    384: "000000110100",
    448: "000000110101",
    512: "0000001101100",
    576: "0000001101101",
    640: "0000001001010",
    704: "0000001001011",
    768: "0000001001100",
    832: "0000001001101",
    896: "0000001110010",
    960: "0000001110011",
    1024: "0000001110100",
    1088: "0000001110101",
    1152: "0000001110110",
    1216: "0000001110111",
    1280: "0000001010010",
    1344: "0000001010011",
    1408: "0000001010100",
    1472: "0000001010101",
    1536: "0000001011010",
    1600: "0000001011011",
    1664: "0000001100100",
    1728: "0000001100101",
    1792: "00000001000",
    1856: "00000001100",
    1920: "00000001101",
    1984: "000000010010",
    2048: "000000010011",
    2112: "000000010100",
    2176: "000000010101",
    2240: "000000010110",
    2304: "000000010111",
    2368: "000000011100",
    2432: "000000011101",
    2496: "000000011110",
    2560: "000000011111",
}


# decode maps: bitstring -> run length (terminating < 64, makeup >= 64)
_WHITE_DEC = {v: k for k, v in {**WHITE_TERM, **WHITE_MAKEUP}.items()}
_BLACK_DEC = {v: k for k, v in {**BLACK_TERM, **BLACK_MAKEUP}.items()}
_MAX_CODE_LEN = max(len(c) for c in (*_WHITE_DEC, *_BLACK_DEC))


def _make_lut(dec: dict, width: int) -> list:
    """Single-level peek LUT (prefix-free alphabet, max code 13 bits):
    entry[i] = (value, code_length) for every ``width``-bit window
    whose prefix is a code — one dict probe per code instead of one
    per BIT, the same lesson the two-level JPEG Huffman tables taught
    (llm/jpeg_codec: a per-bit Python loop collapses under
    multi-process executors)."""
    lut: list = [None] * (1 << width)
    for code, val in dec.items():
        span = width - len(code)
        base = int(code, 2) << span
        for i in range(base, base + (1 << span)):
            lut[i] = (val, len(code))
    return lut


_WHITE_LUT = _make_lut(_WHITE_DEC, _MAX_CODE_LEN)
_BLACK_LUT = _make_lut(_BLACK_DEC, _MAX_CODE_LEN)

_EOL = "000000000001"

# T.6 / T.4-2D mode codes (verified against libtiff by round-trip)
_MODES = {
    "1": ("V", 0),
    "011": ("V", 1),
    "010": ("V", -1),
    "000011": ("V", 2),
    "000010": ("V", -2),
    "0000011": ("V", 3),
    "0000010": ("V", -3),
    "001": ("H", None),
    "0001": ("P", None),
}
_MAX_MODE_LEN = 7
_MODE_LUT = _make_lut(_MODES, _MAX_MODE_LEN)


class _Bits:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def eof(self) -> bool:
        return self.pos >= 8 * len(self.data)

    def read_bit(self) -> int:
        p = self.pos
        if p >= 8 * len(self.data):
            raise FaxError("fax stream exhausted mid-code")
        self.pos = p + 1
        return (self.data[p >> 3] >> (7 - (p & 7))) & 1

    def byte_align(self):
        self.pos = (self.pos + 7) & ~7

    def peek_str(self, n: int) -> str:
        save = self.pos
        out = []
        try:
            for _ in range(n):
                out.append(str(self.read_bit()))
        except FaxError:
            pass
        self.pos = save
        return "".join(out)


def _read_run(bits: _Bits, color: int) -> int:
    """One full run length: zero or more makeup codes + a terminating
    code (T.4 §2: runs over 2560 chain 2560-makeups).  Decodes via the
    13-bit peek LUT — one probe per code, not per bit."""
    lut = _BLACK_LUT if color else _WHITE_LUT
    data = bits.data
    nbits = 8 * len(data)
    total = 0
    for _ in range(64):  # bound: longest legal chain is tiny
        p = bits.pos
        avail = nbits - p
        if avail <= 0:
            raise FaxError("fax stream exhausted mid-code")
        byte = p >> 3
        window = data[byte : byte + 3]
        if len(window) < 3:
            window = window + b"\x00" * (3 - len(window))
        key = (int.from_bytes(window, "big") >> (11 - (p & 7))) & 0x1FFF
        ent = lut[key]
        if ent is None:
            raise FaxError(
                f"invalid {'black' if color else 'white'} run code "
                f"{key:013b}")
        v, ln = ent
        if ln > avail:
            raise FaxError("fax stream exhausted mid-code")
        bits.pos = p + ln
        total += v
        if v < 64:
            return total
    raise FaxError("runaway makeup chain")


def _decode_1d_row(bits: _Bits, columns: int) -> bytes:
    row = bytearray(columns)
    pos = 0
    color = 0
    while pos < columns:
        run = _read_run(bits, color)
        if pos + run > columns:
            raise FaxError(
                f"1D run overflows row: {pos}+{run} > {columns}")
        if color:
            row[pos : pos + run] = b"\x01" * run
        pos += run
        color ^= 1
    return bytes(row)


_MAX_COLUMNS = 1 << 20   # widest real fax is ~2432 columns
_MAX_PIXELS = 1 << 26    # decompression-work gate (the jbig2 bound)


def _check_dims(columns: int, rows: int | None) -> None:
    """Declared-dimension gate, BEFORE any row materializes: a
    bit-flipped TIFF/PDF width can declare a 536M-column page whose
    per-row numpy walks buy minutes of work inside otherwise-bounded
    row counts (8-seed fuzz HANG find) — refuse up front, centrally,
    for every CCITT consumer (TIFF strips, PDF CCITTFaxDecode)."""
    if columns <= 0 or columns > _MAX_COLUMNS:
        raise FaxError(f"fax columns {columns} over gate")
    if rows is not None and columns * max(rows, 0) > _MAX_PIXELS:
        raise FaxError(
            f"fax {columns}x{rows} exceeds {_MAX_PIXELS}-pixel gate")


def decode_rle(data: bytes, columns: int, rows: int) -> list[bytes]:
    """TIFF COMPRESSION_CCITTRLE: MH 1D rows, each starting on a byte
    boundary, no EOL codes."""
    _check_dims(columns, rows)
    bits = _Bits(data)
    out = []
    for _ in range(rows):
        bits.byte_align()
        out.append(_decode_1d_row(bits, columns))
    return out


def _skip_eol(bits: _Bits) -> bool:
    """Consume fill zeros + one EOL if present at the cursor."""
    save = bits.pos
    zeros = 0
    while True:
        if bits.eof():
            bits.pos = save
            return False
        b = bits.read_bit()
        if b == 0:
            zeros += 1
            if zeros > 64 + 11:
                bits.pos = save
                return False
        else:
            if zeros >= 11:
                return True  # consumed ...0000000000 1 = EOL (+fill)
            bits.pos = save
            return False


def decode_g3(data: bytes, columns: int, rows: int | None = None,
              require_eol: bool = True) -> list[bytes]:
    """T.4 Group 3 one-dimensional: EOL-framed MH rows (the TIFF
    COMPRESSION_CCITTFAX3 baseline and PDF K=0 with EndOfLine).  Stops
    at ``rows``, RTC (consecutive EOLs), or end of data."""
    _check_dims(columns, rows)
    bits = _Bits(data)
    out = []
    saw = _skip_eol(bits)
    if require_eol and not saw:
        raise FaxError("G3 stream does not start with EOL")
    while rows is None or len(out) < rows:
        if bits.eof():
            break
        if (len(out) + 1) * columns > _MAX_PIXELS:
            raise FaxError("G3 stream exceeds the pixel gate")
        out.append(_decode_1d_row(bits, columns))
        # fill + EOL between rows; a second EOL right away = RTC
        if not _skip_eol(bits):
            if rows is None:
                break
            continue
        if _skip_eol(bits):
            break  # RTC
    if rows is not None and len(out) < rows:
        raise FaxError(f"G3 stream ended after {len(out)}/{rows} rows")
    return out


try:
    import numpy as _np
except ImportError:  # pragma: no cover - numpy is baked into the env
    _np = None


def _changes(row: bytes) -> list[int]:
    """Positions where the color changes (pixel differs from the one
    before; row[-1] is imaginary white).  Vectorized when numpy is
    present — this runs once per coded row and a per-pixel Python loop
    dominates wide-page G4 decode otherwise."""
    if _np is not None:
        a = _np.frombuffer(row, dtype=_np.uint8)
        if not len(a):
            return []
        idx = (_np.flatnonzero(a[1:] != a[:-1]) + 1).tolist()
        return ([0] + idx) if a[0] else idx
    out = []
    prev = 0
    for i, v in enumerate(row):
        if v != prev:
            out.append(i)
            prev = v
    return out


def _b1_b2(ref_changes: list[int], columns: int, a0: int,
           color: int, start: int = 0) -> tuple[int, int, int]:
    """b1: first changing element of the reference line right of a0
    with color opposite the current color (change positions alternate
    white->black, black->white starting with the first = to-black);
    b2: the next change after b1.  ``start`` is a monotone resume
    index — a0 never decreases within a row, so each row's reference
    line is scanned once total instead of once per mode code."""
    # change at index i in ref_changes flips TO black when i is even
    n = len(ref_changes)
    i = start
    while i < n and ref_changes[i] <= a0:
        i += 1
    base = i
    # color of change i is to-black iff i even; we need to-(not color)
    want_even = (color == 0)  # current white -> b1 flips to black
    if (i % 2 == 0) != want_even:
        i += 1
    b1 = ref_changes[i] if i < n else columns
    b2 = ref_changes[i + 1] if i + 1 < n else columns
    return b1, b2, base


def _decode_2d_row(bits: _Bits, ref: bytes, columns: int) -> bytes:
    row = bytearray(columns)
    ref_changes = _changes(ref)
    data = bits.data
    nbits = 8 * len(data)
    a0 = -1
    color = 0
    ri = 0
    while a0 < columns:
        b1, b2, ri = _b1_b2(ref_changes, columns, a0, color, ri)
        p = bits.pos
        avail = nbits - p
        if avail <= 0:
            raise FaxError("fax stream exhausted mid-code")
        byte = p >> 3
        window = data[byte : byte + 2]
        if len(window) < 2:
            window = window + b"\x00"
        key = (int.from_bytes(window, "big") >> (9 - (p & 7))) & 0x7F
        ent = _MODE_LUT[key]
        if ent is None:
            if avail < _MAX_MODE_LEN:
                raise FaxError("fax stream exhausted mid-code")
            if key == 0:
                raise FaxError(
                    "T.6 extension/uncompressed mode — refusing by name")
            raise FaxError(f"invalid 2D mode code {key:07b}")
        (kind, d), ln = ent
        if ln > avail:
            raise FaxError("fax stream exhausted mid-code")
        bits.pos = p + ln
        s = max(a0, 0)
        if kind == "P":
            if b2 > columns:
                raise FaxError("pass mode overruns row")
            if color:
                row[s:b2] = b"\x01" * (b2 - s)
            a0 = b2
        elif kind == "V":
            a1 = b1 + d
            if a1 < s or a1 > columns:
                raise FaxError(f"vertical mode lands outside row: {a1}")
            if color:
                row[s:a1] = b"\x01" * (a1 - s)
            a0 = a1
            color ^= 1
        else:  # H: two MH runs, color unchanged after both
            r1 = _read_run(bits, color)
            r2 = _read_run(bits, color ^ 1)
            a1 = s + r1
            a2 = a1 + r2
            if a2 > columns:
                raise FaxError(f"horizontal runs overflow row: {a2}")
            if color:
                row[s:a1] = b"\x01" * (a1 - s)
            else:
                row[a1:a2] = b"\x01" * (a2 - a1)
            a0 = a2
    return bytes(row)


def decode_g4(data: bytes, columns: int, rows: int | None = None,
              byte_align: bool = False) -> list[bytes]:
    """T.6 Group 4: every row coded 2D against the previous (imaginary
    all-white first reference), terminated by EOFB (or ``rows``)."""
    _check_dims(columns, rows)
    bits = _Bits(data)
    out = []
    ref = bytes(columns)
    while rows is None or len(out) < rows:
        if byte_align:
            bits.byte_align()
        if bits.eof():
            break
        if bits.peek_str(12) == _EOL:
            break  # EOFB
        if (len(out) + 1) * columns > _MAX_PIXELS:
            raise FaxError("G4 stream exceeds the pixel gate")
        ref = _decode_2d_row(bits, ref, columns)
        out.append(ref)
    if rows is not None and len(out) < rows:
        raise FaxError(f"G4 stream ended after {len(out)}/{rows} rows")
    return out


# ---------------------------------------------------------------------------
# encoders (independent writers for fixtures + the TIFF/PDF encoders)


class _BitWriter:
    __slots__ = ("out", "acc", "n")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, bitstr: str):
        for ch in bitstr:
            self.acc = (self.acc << 1) | (ch == "1")
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def byte_align(self):
        while self.n:
            self.put("0")

    def bytes(self) -> bytes:
        w = _BitWriter.__new__(_BitWriter)
        out = bytearray(self.out)
        if self.n:
            out.append(self.acc << (8 - self.n))
        return bytes(out)


def _put_run(w: _BitWriter, run: int, color: int):
    term = BLACK_TERM if color else WHITE_TERM
    makeup = BLACK_MAKEUP if color else WHITE_MAKEUP
    while run > 2559:
        w.put(makeup[2560])
        run -= 2560
    if run >= 64:
        w.put(makeup[run - run % 64])
        run %= 64
    w.put(term[run])


def _encode_1d_row(w: _BitWriter, row: bytes):
    color = 0
    pos = 0
    n = len(row)
    while pos < n:
        run = 0
        while pos + run < n and row[pos + run] == (1 if color else 0):
            run += 1
        _put_run(w, run, color)
        pos += run
        color ^= 1
    if color == 0 and pos == n:
        pass


def encode_rle(rows: list[bytes]) -> bytes:
    w = _BitWriter()
    for row in rows:
        _encode_1d_row(w, row)
        w.byte_align()
    return w.bytes()


def encode_g3(rows: list[bytes], rtc: bool = True) -> bytes:
    w = _BitWriter()
    for row in rows:
        w.put(_EOL)
        _encode_1d_row(w, row)
    if rtc:
        for _ in range(6):
            w.put(_EOL)
    return w.bytes()


_VCODES = {0: "1", 1: "011", -1: "010", 2: "000011", -2: "000010",
           3: "0000011", -3: "0000010"}


def _encode_2d_row(w: _BitWriter, row: bytes, ref: bytes, columns: int):
    """One row in T.4/T.6 2D modes (pass/vertical/horizontal) against
    the reference line — shared by G4 and G3-2D (K>0)."""
    cur_changes = _changes(row) + [columns, columns]
    ref_changes = _changes(ref)
    a0 = -1
    color = 0
    ci = 0
    ri = 0
    while a0 < columns:
        while ci < len(cur_changes) - 2 and cur_changes[ci] <= a0:
            ci += 1
        a1 = cur_changes[ci] if cur_changes[ci] > a0 else columns
        b1, b2, ri = _b1_b2(ref_changes, columns, a0, color, ri)
        if b2 < a1:
            w.put("0001")          # pass
            a0 = b2
        elif abs(a1 - b1) <= 3:
            w.put(_VCODES[a1 - b1])  # vertical
            a0 = a1
            color ^= 1
        else:                       # horizontal
            s = max(a0, 0)
            a2 = (cur_changes[ci + 1]
                  if cur_changes[ci] > a0 else columns)
            if cur_changes[ci] <= a0:
                a2 = columns
            w.put("001")
            _put_run(w, a1 - s, color)
            _put_run(w, a2 - a1, color ^ 1)
            a0 = a2


def encode_g4(rows: list[bytes]) -> bytes:
    w = _BitWriter()
    columns = len(rows[0]) if rows else 0
    ref = bytes(columns)
    for row in rows:
        _encode_2d_row(w, row, ref, columns)
        ref = row
    w.put(_EOL)
    w.put(_EOL)
    return w.bytes()


def encode_g3_2d(rows: list[bytes], k: int = 4, rtc: bool = True) -> bytes:
    """T.4 Group 3 two-dimensional (K>0): every row framed by EOL + a
    tag bit (1 = this row is 1D MH, 0 = 2D against the previous row);
    a 1D anchor row at least every ``k`` rows, as real fax senders
    emit (K=2 at standard resolution, K=4 at fine)."""
    w = _BitWriter()
    columns = len(rows[0]) if rows else 0
    ref = bytes(columns)
    for i, row in enumerate(rows):
        w.put(_EOL)
        if i % k == 0:
            w.put("1")
            _encode_1d_row(w, row)
        else:
            w.put("0")
            _encode_2d_row(w, row, ref, columns)
        ref = row
    if rtc:
        for _ in range(6):
            w.put(_EOL)
            w.put("1")
    return w.bytes()


def decode_g3_2d(data: bytes, columns: int,
                 rows: int | None = None) -> list[bytes]:
    """T.4 Group 3 two-dimensional (K>0): TIFF COMPRESSION_CCITTFAX3
    with T4Options bit 0, PDF CCITTFaxDecode with K > 0.  Each row is
    EOL + tag bit (1 = 1D, 0 = 2D vs the previous row); stops at
    ``rows``, RTC, or end of data."""
    _check_dims(columns, rows)
    bits = _Bits(data)
    out: list[bytes] = []
    ref = bytes(columns)
    if not _skip_eol(bits):
        raise FaxError("G3 2D stream does not start with EOL")
    while rows is None or len(out) < rows:
        if bits.eof():
            break
        if (len(out) + 1) * columns > _MAX_PIXELS:
            raise FaxError("G3 2D stream exceeds the pixel gate")
        tag = bits.read_bit()
        if tag and bits.peek_str(12) == _EOL:
            break  # EOL+1 immediately followed by EOL: RTC
        try:
            ref = (_decode_1d_row(bits, columns) if tag
                   else _decode_2d_row(bits, ref, columns))
        except FaxError:
            if rows is None and out:
                break  # trailing fill after the last row
            raise
        out.append(ref)
        if not _skip_eol(bits):
            break
    if rows is not None and len(out) < rows:
        raise FaxError(f"G3 2D stream ended after {len(out)}/{rows} rows")
    return out


# ---------------------------------------------------------------------------
# row packing helpers (TIFF/PDF 1-bit sample layout, MSB-first)


def pack_row_bits(rows: list[bytes], black_is_1: bool = False) -> bytes:
    """Logical rows (1=black) -> 1-bit samples, each row byte-padded.
    ``black_is_1=False`` (the PDF default and TIFF WhiteIsZero
    reading) stores black as 0."""
    out = bytearray()
    for row in rows:
        packed = bytearray((len(row) + 7) // 8)
        for i, v in enumerate(row):
            bit = v if black_is_1 else 1 - v
            if bit:
                packed[i >> 3] |= 0x80 >> (i & 7)
        out += packed
    return bytes(out)


def unpack_row_bits(data: bytes, columns: int, rows: int,
                    black_is_1: bool = False) -> list[bytes]:
    stride = (columns + 7) // 8
    if len(data) < stride * rows:
        raise FaxError("packed bilevel data short")
    out = []
    for r in range(rows):
        base = r * stride
        row = bytearray(columns)
        for i in range(columns):
            bit = (data[base + (i >> 3)] >> (7 - (i & 7))) & 1
            row[i] = bit if black_is_1 else 1 - bit
        out.append(bytes(row))
    return out
