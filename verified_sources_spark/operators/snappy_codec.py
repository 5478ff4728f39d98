"""Snappy block-format codec, from scratch — the missing half of the
Avro container codec set.

``snappy`` is one of the two codecs real-world Avro containers
actually use (the other, ``deflate``, the engine already decodes via
zlib), and the wire format is small and fully public (google/snappy
``format_description.txt``): a varint32 uncompressed length followed
by tagged elements — literals and LZ77-style copies with 1/2/4-byte
little-endian offsets, copies allowed to overlap their output.  No
entropy coder, no framing checksum (Avro adds its own CRC32 per
block, checked in operators/avro_codec).

The decoder implements the full element set; the compressor is a
greedy hash-of-4-bytes matcher emitting 2-byte-offset copies — the
same shape as the reference implementation's fast path, deterministic
by construction.  Both directions are cross-verified in tests against
pyarrow's bundled snappy (``pa.compress``/``pa.decompress``), the one
independent implementation in this environment.

Reference parity note: the reference ingests snappy-coded Avro via
its bundled libsnappy; this engine keeps the no-new-dependency rule
the Avro codec already follows (avro_codec.py docstring).
"""

from __future__ import annotations

__all__ = ["SnappyError", "snappy_compress", "snappy_decompress"]

_MAX_LEN = 1 << 32


class SnappyError(ValueError):
    """Named refusal: not a valid snappy block stream."""


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    out = shift = 0
    while True:
        if pos >= len(data):
            raise SnappyError("truncated varint length preamble")
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 31:
            raise SnappyError("varint length preamble over 32 bits")


def snappy_decompress(data: bytes, max_len: int = 256 << 20) -> bytes:
    """Decode one snappy block stream; every malformed shape raises
    :class:`SnappyError` (never Index/struct errors — this runs under
    the front doors' refuse-or-row nets)."""
    want, pos = _read_varint(data, 0)
    if want > max_len:
        raise SnappyError(f"declared length {want} over gate {max_len}")
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:  # 60..63: length is that many extra bytes, LE
                nb = ln - 59
                if pos + nb > n:
                    raise SnappyError("truncated literal length")
                ln = int.from_bytes(data[pos:pos + nb], "little")
                pos += nb
            ln += 1
            if pos + ln > n:
                raise SnappyError("literal runs past end of input")
            out += data[pos:pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 1-byte offset (11-bit), len 4..11
            if pos >= n:
                raise SnappyError("truncated 1-byte-offset copy")
            ln = ((tag >> 2) & 0x7) + 4
            off = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte LE offset, len 1..64
            if pos + 2 > n:
                raise SnappyError("truncated 2-byte-offset copy")
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[pos:pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte LE offset
            if pos + 4 > n:
                raise SnappyError("truncated 4-byte-offset copy")
            ln = (tag >> 2) + 1
            off = int.from_bytes(data[pos:pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise SnappyError(
                f"copy offset {off} outside {len(out)} produced bytes")
        if len(out) + ln > want:
            raise SnappyError("copy overruns declared length")
        start = len(out) - off
        if off >= ln:
            out += out[start:start + ln]
        else:
            # overlapping copy: byte-at-a-time per the spec (this is
            # how snappy encodes runs)
            for i in range(ln):
                out.append(out[start + i])
    if len(out) != want:
        raise SnappyError(
            f"declared {want} bytes, produced {len(out)}")
    return bytes(out)


def _emit_literal(out: bytearray, chunk: bytes) -> None:
    ln = len(chunk) - 1
    if ln < 60:
        out.append(ln << 2)
    else:
        nb = (ln.bit_length() + 7) // 8
        out.append((59 + nb) << 2)
        out += ln.to_bytes(nb, "little")
    out += chunk


def snappy_compress(data: bytes) -> bytes:
    """Greedy snappy compressor: hash the next 4 bytes, emit a
    2-byte-offset copy when the last occurrence within 64 KiB still
    matches (extending as far as it runs, 64 bytes per copy element),
    literals otherwise.  Output always round-trips through
    :func:`snappy_decompress` and through pyarrow's snappy."""
    n = len(data)
    out = bytearray()
    ln = n
    while True:  # varint preamble
        b = ln & 0x7F
        ln >>= 7
        out.append(b | (0x80 if ln else 0))
        if not ln:
            break
    table: dict[bytes, int] = {}
    i = lit_start = 0
    while i + 4 <= n:
        key = data[i:i + 4]
        cand = table.get(key)
        table[key] = i
        if cand is not None and i - cand <= 0xFFFF \
                and data[cand:cand + 4] == key:
            # extend the match
            m = 4
            while i + m < n and data[cand + m] == data[i + m] \
                    and m < 0xFFF0:
                m += 1
            if lit_start < i:
                _emit_literal(out, data[lit_start:i])
            off = i - cand
            rem = m
            while rem > 0:  # 2-byte-offset copies carry 1..64 bytes
                step = min(rem, 64)
                out.append(((step - 1) << 2) | 2)
                out += off.to_bytes(2, "little")
                rem -= step
            i += m
            lit_start = i
        else:
            i += 1
    if lit_start < n:
        _emit_literal(out, data[lit_start:n])
    return bytes(out)
