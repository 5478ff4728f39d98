"""Pure-stdlib BSON encoder/decoder for the MongoDB wire client.

Implements the subset of the public BSON spec (bsonspec.org, version
1.1) the engine's Mongo surface needs: double, string, document, array,
binary, ObjectId, bool, UTC datetime, null, regex, int32, timestamp,
int64 and decimal128 (decode-only).  The wrapper classes carry the SAME
type names pymongo uses (``ObjectId``, ``Timestamp``, ``Regex``,
``Decimal128``) because sources/bson_coerce.py dispatches coercions by
type name — documents decoded here flow through the exact canonical
conversions the reference applies to pymongo values
(/root/reference/sources/mongodb/helpers.py:552-572).

The ``bson`` package stays out of the engine's baseline on purpose:
this codec plus sources/mongo_wire.py IS the driver, the way
sources/pg_wire.py is the engine's libpq.
"""

from __future__ import annotations

import datetime as _dt
import decimal
import os
import re
import struct
import threading


class BsonError(ValueError):
    pass


class ObjectId:
    """12-byte BSON ObjectId; ``str()`` is the 24-char hex form (the
    reference's canonical rendering, helpers.py:556-566)."""

    __slots__ = ("binary",)
    _counter = [int.from_bytes(os.urandom(3), "big")]
    _lock = threading.Lock()
    _machine = os.urandom(5)

    def __init__(self, value: bytes | str | None = None):
        if value is None:
            with self._lock:
                self._counter[0] = (self._counter[0] + 1) & 0xFFFFFF
                n = self._counter[0]
            ts = int(_dt.datetime.now(_dt.timezone.utc).timestamp())
            self.binary = (
                struct.pack(">I", ts) + self._machine + n.to_bytes(3, "big")
            )
        elif isinstance(value, bytes):
            if len(value) != 12:
                raise BsonError("ObjectId needs exactly 12 bytes")
            self.binary = value
        else:
            if len(value) != 24:
                raise BsonError("ObjectId hex needs exactly 24 chars")
            self.binary = bytes.fromhex(value)

    def __str__(self) -> str:
        return self.binary.hex()

    def __repr__(self) -> str:
        return f"ObjectId('{self}')"

    def __eq__(self, other) -> bool:
        return isinstance(other, ObjectId) and other.binary == self.binary

    def __hash__(self) -> int:
        return hash(self.binary)


class Int64(int):
    """Forces int64 encoding (BSON getMore REQUIRES the cursor id as
    int64 even when the value fits in 32 bits)."""


class Timestamp:
    """BSON internal timestamp (oplog positions): (time, increment)."""

    __slots__ = ("time", "inc")

    def __init__(self, time: int, inc: int):
        self.time, self.inc = int(time), int(inc)

    def as_datetime(self) -> _dt.datetime:
        return _dt.datetime.fromtimestamp(self.time, _dt.timezone.utc)

    def __eq__(self, other) -> bool:
        return (
            isinstance(other, Timestamp)
            and (other.time, other.inc) == (self.time, self.inc)
        )

    def __repr__(self) -> str:
        return f"Timestamp({self.time}, {self.inc})"


class Regex:
    __slots__ = ("pattern", "flags")

    def __init__(self, pattern: str, flags: str = ""):
        self.pattern, self.flags = pattern, flags

    def try_compile(self):
        f = 0
        for ch in self.flags:
            f |= {"i": re.I, "m": re.M, "s": re.S, "x": re.X}.get(ch, 0)
        return re.compile(self.pattern, f)

    def __repr__(self) -> str:
        return f"Regex({self.pattern!r}, {self.flags!r})"


class Decimal128:
    """IEEE 754-2008 decimal128, Binary Integer Decimal encoding —
    decode/str only (the engine renders Decimal128 as strings,
    bson_coerce.py / reference helpers.py:556-566)."""

    __slots__ = ("bid",)
    _EXP_BIAS = 6176

    def __init__(self, bid: bytes):
        if len(bid) != 16:
            raise BsonError("Decimal128 needs exactly 16 bytes")
        self.bid = bid

    def to_decimal(self) -> decimal.Decimal:
        low, high = struct.unpack("<QQ", self.bid)
        sign = 1 if (high & 0x8000000000000000) else 0
        if (high & 0x7C00000000000000) == 0x7C00000000000000:
            return decimal.Decimal("NaN")
        if (high & 0x7800000000000000) == 0x7800000000000000:
            return decimal.Decimal("-Infinity" if sign else "Infinity")
        if (high & 0x6000000000000000) == 0x6000000000000000:
            # combination '11': coefficient exceeds 34 digits — the spec
            # (and pymongo) treat it as zero at the encoded exponent
            exp = ((high >> 47) & 0x3FFF) - self._EXP_BIAS
            coeff = 0
        else:
            exp = ((high >> 49) & 0x3FFF) - self._EXP_BIAS
            coeff = ((high & 0x0001FFFFFFFFFFFF) << 64) | low
            if coeff > 9999999999999999999999999999999999:
                coeff = 0
        digits = tuple(int(c) for c in str(coeff))
        with decimal.localcontext() as ctx:
            ctx.prec = 34
            return decimal.Decimal((sign, digits, exp))

    def __str__(self) -> str:
        return str(self.to_decimal())

    def __repr__(self) -> str:
        return f"Decimal128('{self}')"


_EPOCH = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)


def _cstring(s: str) -> bytes:
    b = s.encode("utf-8")
    if b"\x00" in b:
        raise BsonError("BSON cstring cannot contain NUL")
    return b + b"\x00"


def _encode_value(name: str, v) -> bytes:
    n = _cstring(name)
    if isinstance(v, bool):
        return b"\x08" + n + (b"\x01" if v else b"\x00")
    if isinstance(v, Int64):
        return b"\x12" + n + struct.pack("<q", int(v))
    if isinstance(v, int):
        if -(2**31) <= v < 2**31:
            return b"\x10" + n + struct.pack("<i", v)
        return b"\x12" + n + struct.pack("<q", v)
    if isinstance(v, float):
        return b"\x01" + n + struct.pack("<d", v)
    if isinstance(v, str):
        b = v.encode("utf-8") + b"\x00"
        return b"\x02" + n + struct.pack("<i", len(b)) + b
    if v is None:
        return b"\x0a" + n
    if isinstance(v, dict):
        return b"\x03" + n + encode_document(v)
    if isinstance(v, (list, tuple)):
        return b"\x04" + n + encode_document(
            {str(i): x for i, x in enumerate(v)}
        )
    if isinstance(v, (bytes, bytearray)):
        b = bytes(v)
        return b"\x05" + n + struct.pack("<iB", len(b), 0) + b
    if isinstance(v, ObjectId):
        return b"\x07" + n + v.binary
    if isinstance(v, _dt.datetime):
        if v.tzinfo is None:
            v = v.replace(tzinfo=_dt.timezone.utc)
        # exact integer math (pymongo-style): float64 total_seconds()
        # rounds at ~2^53 us and int() truncates toward zero, shifting
        # values by 1 ms and breaking encode(decode(x)) == x
        delta = v - _EPOCH
        us = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
        ms = us // 1000  # floor division: correct for pre-1970 too
        return b"\x09" + n + struct.pack("<q", ms)
    if isinstance(v, Timestamp):
        return b"\x11" + n + struct.pack("<Q", (v.time << 32) | v.inc)
    if isinstance(v, Regex):
        return b"\x0b" + n + _cstring(v.pattern) + _cstring(v.flags)
    if isinstance(v, Decimal128):
        return b"\x13" + n + v.bid
    raise BsonError(f"cannot BSON-encode {type(v).__name__}")


def encode_document(doc: dict) -> bytes:
    body = b"".join(_encode_value(str(k), v) for k, v in doc.items())
    return struct.pack("<i", len(body) + 5) + body + b"\x00"


def _read_cstring(buf: bytes, at: int) -> tuple[str, int]:
    end = buf.index(b"\x00", at)
    return buf[at:end].decode("utf-8"), end + 1


def _decode_value(t: int, buf: bytes, at: int):
    if t == 0x01:
        return struct.unpack_from("<d", buf, at)[0], at + 8
    if t == 0x02:
        (ln,) = struct.unpack_from("<i", buf, at)
        return buf[at + 4 : at + 3 + ln].decode("utf-8"), at + 4 + ln
    if t == 0x03:
        (ln,) = struct.unpack_from("<i", buf, at)
        return decode_document(buf[at : at + ln]), at + ln
    if t == 0x04:
        (ln,) = struct.unpack_from("<i", buf, at)
        d = decode_document(buf[at : at + ln])
        return [d[k] for k in d], at + ln
    if t == 0x05:
        ln, _sub = struct.unpack_from("<iB", buf, at)
        return bytes(buf[at + 5 : at + 5 + ln]), at + 5 + ln
    if t == 0x07:
        return ObjectId(bytes(buf[at : at + 12])), at + 12
    if t == 0x08:
        return buf[at] == 1, at + 1
    if t == 0x09:
        (ms,) = struct.unpack_from("<q", buf, at)
        return _EPOCH + _dt.timedelta(milliseconds=ms), at + 8
    if t == 0x0A:
        return None, at
    if t == 0x0B:
        pat, at = _read_cstring(buf, at)
        flags, at = _read_cstring(buf, at)
        return Regex(pat, flags), at
    if t == 0x10:
        return struct.unpack_from("<i", buf, at)[0], at + 4
    if t == 0x11:
        (u,) = struct.unpack_from("<Q", buf, at)
        return Timestamp(u >> 32, u & 0xFFFFFFFF), at + 8
    if t == 0x12:
        return Int64(struct.unpack_from("<q", buf, at)[0]), at + 8
    if t == 0x13:
        return Decimal128(bytes(buf[at : at + 16])), at + 16
    raise BsonError(f"unsupported BSON type 0x{t:02x}")


def decode_document(buf: bytes) -> dict:
    (total,) = struct.unpack_from("<i", buf, 0)
    if total != len(buf):
        raise BsonError(f"document length {total} != buffer {len(buf)}")
    if buf[-1:] != b"\x00":
        raise BsonError("document missing trailing NUL")
    out: dict = {}
    at = 4
    while at < total - 1:
        t = buf[at]
        name, at = _read_cstring(buf, at + 1)
        out[name], at = _decode_value(t, buf, at)
    return out
