"""pgoutput logical-replication message decoder.

Self-contained binary parser for PostgreSQL's ``pgoutput`` plugin
protocol (protocol version 1), written from the public protocol
documentation (PostgreSQL docs: "Logical Replication Message Formats").
Covers the message set the reference consumes
(reference: sources/pg_replication/decoders.py — Begin/Commit/Relation/
Insert/Update/Delete/Truncate; re-implemented here from the spec, not
ported): this is the byte-level front door of the CDC source; the
relational application lives in sources/cdc.py.

Message framing (first byte = type):
  'B' Begin     : final_lsn u64, commit_ts i64 (µs since 2000-01-01), xid u32
  'C' Commit    : flags u8, commit_lsn u64, end_lsn u64, commit_ts i64
  'R' Relation  : rel_id u32, namespace cstr, relname cstr, replica_identity
                  u8, ncols u16, then per column: flags u8, name cstr,
                  type_oid u32, atttypmod i32
  'I' Insert    : rel_id u32, 'N', TupleData
  'U' Update    : rel_id u32, ['K'|'O' TupleData] 'N' TupleData
  'D' Delete    : rel_id u32, 'K'|'O', TupleData
  'T' Truncate  : nrels u32, options u8, rel_ids u32...
TupleData: ncols u16; per column 'n' (NULL) | 'u' (unchanged TOAST) |
  't' len u32 + bytes (text-format value).
"""

from __future__ import annotations

import json
import struct
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone
from decimal import Decimal
from typing import Any

PG_EPOCH = datetime(2000, 1, 1, tzinfo=timezone.utc)


def pg_ts(micros_since_2000: int) -> datetime:
    return PG_EPOCH + timedelta(microseconds=micros_since_2000)


class _Reader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def u8(self) -> int:
        (v,) = struct.unpack_from(">B", self.buf, self.pos)
        self.pos += 1
        return v

    def u16(self) -> int:
        (v,) = struct.unpack_from(">H", self.buf, self.pos)
        self.pos += 2
        return v

    def u32(self) -> int:
        (v,) = struct.unpack_from(">I", self.buf, self.pos)
        self.pos += 4
        return v

    def i32(self) -> int:
        (v,) = struct.unpack_from(">i", self.buf, self.pos)
        self.pos += 4
        return v

    def u64(self) -> int:
        (v,) = struct.unpack_from(">Q", self.buf, self.pos)
        self.pos += 8
        return v

    def i64(self) -> int:
        (v,) = struct.unpack_from(">q", self.buf, self.pos)
        self.pos += 8
        return v

    def cstr(self) -> str:
        end = self.buf.index(b"\x00", self.pos)
        s = self.buf[self.pos : end].decode("utf-8")
        self.pos = end + 1
        return s

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos : self.pos + n]
        self.pos += n
        return b


@dataclass
class ColumnMeta:
    flags: int  # 1 = part of key
    name: str
    type_oid: int
    atttypmod: int


@dataclass
class Begin:
    final_lsn: int
    commit_ts: datetime
    xid: int


@dataclass
class Commit:
    flags: int
    commit_lsn: int
    end_lsn: int
    commit_ts: datetime


@dataclass
class Relation:
    rel_id: int
    namespace: str
    name: str
    replica_identity: int
    columns: list[ColumnMeta]


@dataclass
class Insert:
    rel_id: int
    new: list[bytes | None]


@dataclass
class Update:
    rel_id: int
    old: list[bytes | None] | None
    old_kind: str | None  # 'K' key-only | 'O' full old row
    new: list[bytes | None]


@dataclass
class Delete:
    rel_id: int
    old: list[bytes | None]
    old_kind: str


@dataclass
class Truncate:
    options: int
    rel_ids: list[int]


def _tuple_data(r: _Reader) -> list[bytes | None]:
    ncols = r.u16()
    out: list[bytes | None] = []
    for _ in range(ncols):
        kind = chr(r.u8())
        if kind == "n":
            out.append(None)
        elif kind == "u":  # unchanged TOAST — treated as absent
            out.append(None)
        elif kind == "t":
            out.append(r.take(r.u32()))
        else:
            raise ValueError(f"unknown tuple column kind {kind!r}")
    return out


def decode_message(payload: bytes):
    """One pgoutput payload → typed message object."""
    r = _Reader(payload)
    tag = chr(r.u8())
    if tag == "B":
        return Begin(final_lsn=r.u64(), commit_ts=pg_ts(r.i64()), xid=r.u32())
    if tag == "C":
        return Commit(flags=r.u8(), commit_lsn=r.u64(), end_lsn=r.u64(), commit_ts=pg_ts(r.i64()))
    if tag == "R":
        rel_id = r.u32()
        ns, name = r.cstr(), r.cstr()
        ident = r.u8()
        ncols = r.u16()
        cols = [ColumnMeta(r.u8(), r.cstr(), r.u32(), r.i32()) for _ in range(ncols)]
        return Relation(rel_id, ns, name, ident, cols)
    if tag == "I":
        rel_id = r.u32()
        marker = chr(r.u8())
        if marker != "N":
            raise ValueError(f"insert expects 'N' tuple, got {marker!r}")
        return Insert(rel_id, _tuple_data(r))
    if tag == "U":
        rel_id = r.u32()
        marker = chr(r.u8())
        old = old_kind = None
        if marker in ("K", "O"):
            old_kind = marker
            old = _tuple_data(r)
            marker = chr(r.u8())
        if marker != "N":
            raise ValueError(f"update expects 'N' tuple, got {marker!r}")
        return Update(rel_id, old, old_kind, _tuple_data(r))
    if tag == "D":
        rel_id = r.u32()
        old_kind = chr(r.u8())
        if old_kind not in ("K", "O"):
            raise ValueError(f"delete expects 'K'/'O' tuple, got {old_kind!r}")
        return Delete(rel_id, _tuple_data(r), old_kind)
    if tag == "T":
        nrels = r.u32()
        options = r.u8()
        return Truncate(options, [r.u32() for _ in range(nrels)])
    raise ValueError(f"unknown message tag {tag!r}")


# -------------------------------------------------- OID → type + coercion
PG_OID_TO_SPARK: dict[int, str] = {
    16: "boolean",
    17: "binary",
    20: "long",
    21: "int",
    23: "int",
    25: "string",
    114: "string",   # json kept as string column
    700: "float",
    701: "double",
    1042: "string",
    1043: "string",
    1082: "date",
    1083: "string",  # time-of-day: no Spark TimeType — keep text
    1114: "timestamp_ntz",
    1184: "timestamp",
    1700: "decimal(38,18)",
    3802: "string",  # jsonb as string
}


def pg_text_to_python(type_oid: int, raw: bytes | None) -> Any:
    """Text-format wire value → Python value (engine-typed)."""
    if raw is None:
        return None
    s = raw.decode("utf-8")
    if type_oid == 16:
        return s == "t"
    if type_oid in (20, 21, 23):
        return int(s)
    if type_oid in (700, 701):
        return float(s)
    if type_oid == 1700:
        return Decimal(s)
    if type_oid == 17:
        if s.startswith("\\x"):
            return bytes.fromhex(s[2:])
        return raw
    if type_oid == 1082:
        return datetime.strptime(s, "%Y-%m-%d").date()
    if type_oid in (1114, 1184):
        fmt = "%Y-%m-%d %H:%M:%S.%f" if "." in s else "%Y-%m-%d %H:%M:%S"
        if type_oid == 1184:
            # timestamptz wire text carries an offset suffix like +00
            s2 = s
            if s2[-3] in "+-":
                s2 = s2 + "00"
            try:
                return datetime.strptime(s2, fmt + "%z")
            except ValueError:
                return datetime.strptime(s, fmt)
        return datetime.strptime(s, fmt)
    if type_oid in (114, 3802):
        json.loads(s)  # validate; stored as string column
        return s
    return s


def messages_to_change_rows(framed: list[tuple[int, bytes]]) -> list[dict[str, Any]]:
    """(lsn, payload) stream → flat change rows for sources.cdc.apply_changes:
    {table, op, lsn, txn_id, commit_ts, <columns...>}.

    Maintains the Relation registry; rows carry typed values.  Deletes
    materialize only the key/old columns (reference behavior: NOT NULL
    payload gets dummy values downstream; here they are simply NULL)."""
    relations: dict[int, Relation] = {}
    rows: list[dict[str, Any]] = []
    txn_id: int | None = None
    commit_ts: datetime | None = None
    for lsn, payload in framed:
        msg = decode_message(payload)
        if isinstance(msg, Begin):
            txn_id, commit_ts = msg.xid, msg.commit_ts
        elif isinstance(msg, Relation):
            relations[msg.rel_id] = msg
        elif isinstance(msg, (Insert, Update, Delete)):
            rel = relations[msg.rel_id]
            names = [c.name for c in rel.columns]
            oids = [c.type_oid for c in rel.columns]
            vals = msg.new if not isinstance(msg, Delete) else msg.old
            row: dict[str, Any] = {
                "table": rel.name,
                "op": {"Insert": "I", "Update": "U", "Delete": "D"}[type(msg).__name__],
                "lsn": lsn,
                "txn_id": txn_id,
                "commit_ts": commit_ts,
            }
            for name, oid, raw in zip(names, oids, vals):
                row[name] = pg_text_to_python(oid, raw)
            rows.append(row)
        elif isinstance(msg, Commit):
            txn_id, commit_ts = None, None
    return rows
