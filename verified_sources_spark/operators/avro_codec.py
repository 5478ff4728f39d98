"""Minimal Apache Avro Object Container File codec, pure Python.

Iceberg stores its manifest lists and manifest files as Avro (the
Iceberg spec, iceberg.apache.org/spec); reading or writing them without
an avro dependency needs this. Implements the PUBLIC Avro 1.x
specification (avro.apache.org/docs — binary encoding + object
container files):

- binary encoding: zigzag-varint ints/longs, little-endian IEEE
  float/double, length-prefixed bytes/strings, records as concatenated
  fields, arrays/maps as blocked sequences, unions as index+value,
  fixed/enum
- container format: ``Obj\\x01`` magic, file-metadata map carrying the
  writer schema JSON and codec, 16-byte sync marker, blocked data
- codecs: ``null``, ``deflate`` (raw zlib, RFC 1951) and ``snappy``
  (the repo's own block codec, operators/snappy_codec, cross-verified
  against pyarrow's snappy; per-block big-endian CRC32 of the
  uncompressed content checked per the Avro spec)

The reader decodes with the EMBEDDED writer schema (no schema
resolution — the use case is parsing self-describing metadata files, and
the caller navigates the returned dicts by field name). Logical types
are returned as their base primitive; Iceberg's readers do the same for
manifests (timestamps ride as long micros).

Deliberately not a general Avro library: no schema resolution against a
reader schema, no RPC.
"""

from __future__ import annotations

import io
import json
import struct
import zlib
from typing import Any

MAGIC = b"Obj\x01"

_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


class AvroError(ValueError):
    pass


# ------------------------------------------------------------------ schema
def _named(schema: Any) -> str | None:
    if isinstance(schema, dict) and schema.get("type") in ("record", "enum", "fixed"):
        name = schema["name"]
        ns = schema.get("namespace")
        return f"{ns}.{name}" if ns and "." not in name else name
    return None


def _collect_names(schema: Any, names: dict[str, dict]) -> None:
    if isinstance(schema, list):
        for s in schema:
            _collect_names(s, names)
    elif isinstance(schema, dict):
        n = _named(schema)
        if n is not None:
            names[n] = schema
            names[schema["name"]] = schema  # short name too
        t = schema.get("type")
        if t == "record":
            for f in schema.get("fields", []):
                _collect_names(f["type"], names)
        elif t == "array":
            _collect_names(schema["items"], names)
        elif t == "map":
            _collect_names(schema["values"], names)


def _resolve(schema: Any, names: dict[str, dict]) -> Any:
    """A bare string that is not a primitive is a reference to a named type."""
    if isinstance(schema, str) and schema not in _PRIMITIVES:
        try:
            return names[schema]
        except KeyError:
            raise AvroError(f"unresolved named type: {schema}") from None
    if isinstance(schema, dict) and isinstance(schema.get("type"), (dict, list)):
        # {"type": {...complex...}} wrapper
        return _resolve(schema["type"], names)
    return schema


# ----------------------------------------------------------------- decoding
class _Reader:
    def __init__(self, data: bytes):
        self._b = memoryview(data)
        self._pos = 0

    def read(self, n: int) -> bytes:
        if self._pos + n > len(self._b):
            raise AvroError("truncated avro data")
        out = bytes(self._b[self._pos : self._pos + n])
        self._pos += n
        return out

    @property
    def remaining(self) -> int:
        return len(self._b) - self._pos

    def long(self) -> int:
        shift, acc = 0, 0
        while True:
            (byte,) = self.read(1)
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)  # zigzag

    def decode(self, schema: Any, names: dict[str, dict]) -> Any:
        schema = _resolve(schema, names)
        if isinstance(schema, list):  # union
            idx = self.long()
            if not 0 <= idx < len(schema):
                raise AvroError(f"union index {idx} out of range")
            return self.decode(schema[idx], names)
        t = schema if isinstance(schema, str) else schema["type"]
        if t == "null":
            return None
        if t == "boolean":
            return self.read(1) != b"\x00"
        if t in ("int", "long"):
            return self.long()
        if t == "float":
            return struct.unpack("<f", self.read(4))[0]
        if t == "double":
            return struct.unpack("<d", self.read(8))[0]
        if t == "bytes":
            return self.read(self.long())
        if t == "string":
            return self.read(self.long()).decode("utf-8")
        if t == "fixed":
            return self.read(int(schema["size"]))
        if t == "enum":
            return schema["symbols"][self.long()]
        if t == "record":
            return {
                f["name"]: self.decode(f["type"], names)
                for f in schema["fields"]
            }
        if t == "array":
            out = []
            while True:
                n = self.long()
                if n == 0:
                    break
                if n < 0:
                    n = -n
                    self.long()  # byte size of the block, unused here
                for _ in range(n):
                    out.append(self.decode(schema["items"], names))
            return out
        if t == "map":
            out = {}
            while True:
                n = self.long()
                if n == 0:
                    break
                if n < 0:
                    n = -n
                    self.long()
                for _ in range(n):
                    k = self.read(self.long()).decode("utf-8")
                    out[k] = self.decode(schema["values"], names)
            return out
        raise AvroError(f"unsupported avro type: {t!r}")


def read_container(data: bytes) -> tuple[Any, list[Any]]:
    """Parse an Object Container File → (writer schema, list of records)."""
    schema, records, _meta = read_container_full(data)
    return schema, records


def read_container_full(data: bytes) -> tuple[Any, list[Any], dict[str, bytes]]:
    """Like ``read_container`` but also returns the raw file-metadata map
    (spec consumers — e.g. Iceberg manifest readers — key off it)."""
    r = _Reader(data)
    if r.read(4) != MAGIC:
        raise AvroError("not an avro object container file (bad magic)")
    meta_schema = {"type": "map", "values": "bytes"}
    meta = r.decode(meta_schema, {})  # keys decode as str, values as bytes
    if "avro.schema" not in meta:
        raise AvroError("container carries no avro.schema metadata")
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate", "snappy"):
        raise AvroError(f"unsupported avro codec: {codec}")
    sync = r.read(16)
    names: dict[str, dict] = {}
    _collect_names(schema, names)
    records: list[Any] = []
    while r.remaining:
        count = r.long()
        size = r.long()
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, wbits=-15)
        elif codec == "snappy":
            # Avro snappy blocks append a 4-byte big-endian CRC32 of
            # the UNCOMPRESSED content (Avro spec, "snappy codec")
            if size < 4:
                raise AvroError("snappy block shorter than its CRC")
            from verified_sources_spark.operators.snappy_codec import (
                SnappyError, snappy_decompress,
            )

            try:
                block, crc = snappy_decompress(block[:-4]), block[-4:]
            except SnappyError as e:
                raise AvroError(f"bad snappy block: {e}") from None
            if zlib.crc32(block) != int.from_bytes(crc, "big"):
                raise AvroError("snappy block CRC32 mismatch")
        br = _Reader(block)
        for _ in range(count):
            records.append(br.decode(schema, names))
        if br.remaining:
            # a count that undershoots the block is corruption, not
            # padding — silently ignoring the tail would return a
            # truncated table as if it were whole
            raise AvroError(
                f"block carries {br.remaining} bytes beyond its "
                f"declared {count} records")
        if r.read(16) != sync:
            raise AvroError("sync marker mismatch (corrupt container)")
    return schema, records, meta


# ----------------------------------------------------------------- encoding
class _Writer:
    def __init__(self):
        self._out = io.BytesIO()

    def getvalue(self) -> bytes:
        return self._out.getvalue()

    def write(self, b: bytes) -> None:
        self._out.write(b)

    def long(self, v: int) -> None:
        v = (v << 1) ^ (v >> 63) if v >= 0 else ((-v - 1) << 1 | 1)  # zigzag
        while True:
            bits = v & 0x7F
            v >>= 7
            if v:
                self.write(bytes([bits | 0x80]))
            else:
                self.write(bytes([bits]))
                return

    def encode(self, schema: Any, value: Any, names: dict[str, dict]) -> None:
        schema = _resolve(schema, names)
        if isinstance(schema, list):  # union: first branch accepting the value
            for i, branch in enumerate(schema):
                if _accepts(_resolve(branch, names), value):
                    self.long(i)
                    self.encode(branch, value, names)
                    return
            raise AvroError(f"no union branch for {type(value).__name__} in {schema}")
        t = schema if isinstance(schema, str) else schema["type"]
        if t == "null":
            if value is not None:
                raise AvroError("null schema with non-null value")
            return
        if t == "boolean":
            self.write(b"\x01" if value else b"\x00")
        elif t in ("int", "long"):
            self.long(int(value))
        elif t == "float":
            self.write(struct.pack("<f", float(value)))
        elif t == "double":
            self.write(struct.pack("<d", float(value)))
        elif t == "bytes":
            self.long(len(value))
            self.write(bytes(value))
        elif t == "string":
            b = str(value).encode("utf-8")
            self.long(len(b))
            self.write(b)
        elif t == "fixed":
            if len(value) != int(schema["size"]):
                raise AvroError("fixed size mismatch")
            self.write(bytes(value))
        elif t == "enum":
            self.long(schema["symbols"].index(value))
        elif t == "record":
            for f in schema["fields"]:
                if f["name"] not in value and "default" not in f:
                    raise AvroError(f"missing field {f['name']!r}")
                self.encode(f["type"], value.get(f["name"], f.get("default")), names)
        elif t == "array":
            if value:
                self.long(len(value))
                for item in value:
                    self.encode(schema["items"], item, names)
            self.long(0)
        elif t == "map":
            if value:
                self.long(len(value))
                for k, v in value.items():
                    kb = str(k).encode("utf-8")
                    self.long(len(kb))
                    self.write(kb)
                    self.encode(schema["values"], v, names)
            self.long(0)
        else:
            raise AvroError(f"unsupported avro type: {t!r}")


def _accepts(schema: Any, value: Any) -> bool:
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return value is None
    if value is None:
        return False
    if t == "boolean":
        return isinstance(value, bool)
    if t in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if t in ("float", "double"):
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if t in ("bytes", "fixed"):
        return isinstance(value, (bytes, bytearray))
    if t in ("string", "enum"):
        return isinstance(value, str)
    if t == "record":
        return isinstance(value, dict)
    if t == "array":
        return isinstance(value, (list, tuple))
    if t == "map":
        return isinstance(value, dict)
    return False


def write_container(
    schema: Any,
    records: list[Any],
    codec: str = "deflate",
    sync: bytes = b"verified-sources",  # deterministic 16-byte marker
    metadata: dict[str, bytes | str] | None = None,
) -> bytes:
    """Serialize records into an Object Container File (one data block —
    these are metadata files, not data files).

    ``metadata`` adds extra file-metadata entries (consumers like Iceberg
    require spec keys — e.g. ``schema`` / ``partition-spec`` on manifest
    files — in the container's key-value metadata, not just the records).
    Keys must not start with ``avro.`` (reserved by the Avro spec)."""
    if codec not in ("null", "deflate", "snappy"):
        raise AvroError(f"unsupported avro codec: {codec}")
    if len(sync) != 16:
        raise AvroError("sync marker must be 16 bytes")
    names: dict[str, dict] = {}
    _collect_names(schema, names)
    body = _Writer()
    for rec in records:
        body.encode(schema, rec, names)
    payload = body.getvalue()
    if codec == "deflate":
        payload = zlib.compress(payload, 9)[2:-4]  # raw deflate: strip zlib wrap
    elif codec == "snappy":
        from verified_sources_spark.operators.snappy_codec import (
            snappy_compress,
        )

        payload = (snappy_compress(payload)
                   + zlib.crc32(payload).to_bytes(4, "big"))

    out = _Writer()
    out.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode("utf-8"),
        "avro.codec": codec.encode("utf-8"),
    }
    for k, v in (metadata or {}).items():
        if k.startswith("avro."):
            raise AvroError(f"metadata key {k!r} is reserved (avro.*)")
        meta[k] = v.encode("utf-8") if isinstance(v, str) else bytes(v)
    out.encode({"type": "map", "values": "bytes"}, meta, {})
    out.write(sync)
    out.long(len(records))
    out.long(len(payload))
    out.write(payload)
    out.write(sync)
    return out.getvalue()
