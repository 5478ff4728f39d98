"""pgoutput decoder tests: binary messages are CONSTRUCTED from the
public protocol layout, then parsed back — round-trip verification."""

from __future__ import annotations

import struct
from datetime import datetime, timezone
from decimal import Decimal

from verified_sources_spark.sources.cdc import apply_changes
from verified_sources_spark.sources.pg_decoders import (
    Begin,
    Commit,
    Delete,
    Insert,
    Relation,
    Truncate,
    Update,
    decode_message,
    messages_to_change_rows,
    pg_text_to_python,
)


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


def _tuple(vals: list[bytes | None]) -> bytes:
    out = struct.pack(">H", len(vals))
    for v in vals:
        if v is None:
            out += b"n"
        else:
            out += b"t" + struct.pack(">I", len(v)) + v
    return out


def _relation(rel_id: int, name: str, cols: list[tuple[str, int]]) -> bytes:
    b = b"R" + struct.pack(">I", rel_id) + _cstr("public") + _cstr(name) + b"\x64"
    b += struct.pack(">H", len(cols))
    for cname, oid in cols:
        b += b"\x01" + _cstr(cname) + struct.pack(">Ii", oid, -1)
    return b


def _begin(lsn: int, ts_us: int, xid: int) -> bytes:
    return b"B" + struct.pack(">QqI", lsn, ts_us, xid)


def _commit(lsn: int, ts_us: int) -> bytes:
    return b"C\x00" + struct.pack(">QQq", lsn, lsn, ts_us)


def test_decode_begin_commit_relation():
    b = decode_message(_begin(1000, 86400 * 1_000_000, 42))
    assert isinstance(b, Begin) and b.xid == 42
    assert b.commit_ts == datetime(2000, 1, 2, tzinfo=timezone.utc)
    c = decode_message(_commit(2000, 0))
    assert isinstance(c, Commit) and c.commit_lsn == 2000
    r = decode_message(_relation(7, "users", [("id", 20), ("name", 25)]))
    assert isinstance(r, Relation)
    assert [col.name for col in r.columns] == ["id", "name"]
    assert [col.type_oid for col in r.columns] == [20, 25]


def test_decode_dml_and_truncate():
    ins = decode_message(b"I" + struct.pack(">I", 7) + b"N" + _tuple([b"1", b"alice"]))
    assert isinstance(ins, Insert) and ins.new == [b"1", b"alice"]
    upd = decode_message(
        b"U" + struct.pack(">I", 7) + b"K" + _tuple([b"1", None]) + b"N" + _tuple([b"1", b"bob"])
    )
    assert isinstance(upd, Update) and upd.old_kind == "K" and upd.new[1] == b"bob"
    dele = decode_message(b"D" + struct.pack(">I", 7) + b"K" + _tuple([b"1", None]))
    assert isinstance(dele, Delete) and dele.old == [b"1", None]
    tr = decode_message(b"T" + struct.pack(">IB", 2, 0) + struct.pack(">II", 7, 8))
    assert isinstance(tr, Truncate) and tr.rel_ids == [7, 8]


def test_text_coercions():
    assert pg_text_to_python(16, b"t") is True
    assert pg_text_to_python(20, b"123") == 123
    assert pg_text_to_python(701, b"1.5") == 1.5
    assert pg_text_to_python(1700, b"12.345") == Decimal("12.345")
    assert pg_text_to_python(17, b"\\x6869") == b"hi"
    assert pg_text_to_python(1082, b"2024-01-09").isoformat() == "2024-01-09"
    assert pg_text_to_python(1114, b"2024-01-09 10:30:00.123456").microsecond == 123456
    assert pg_text_to_python(114, b'{"a": 1}') == '{"a": 1}'
    assert pg_text_to_python(25, None) is None


def test_feed_to_change_rows_and_apply(spark):
    feed = [
        (10, _relation(7, "users", [("id", 20), ("name", 25)])),
        (11, _begin(100, 0, 500)),
        (12, b"I" + struct.pack(">I", 7) + b"N" + _tuple([b"1", b"alice"])),
        (13, b"I" + struct.pack(">I", 7) + b"N" + _tuple([b"2", b"bob"])),
        (14, _commit(100, 0)),
        (15, _begin(200, 0, 501)),
        (16, b"U" + struct.pack(">I", 7) + b"K" + _tuple([b"1", None]) + b"N" + _tuple([b"1", b"alice2"])),
        (17, b"D" + struct.pack(">I", 7) + b"K" + _tuple([b"2", None])),
        (18, _commit(200, 0)),
    ]
    rows = messages_to_change_rows(feed)
    assert [r["op"] for r in rows] == ["I", "I", "U", "D"]
    assert rows[0]["txn_id"] == 500 and rows[2]["txn_id"] == 501
    # end-to-end: decoded feed → change DataFrame → merge-applied state
    df = spark.createDataFrame(
        [(r["table"], r["op"], r["lsn"], r["txn_id"], r["id"], r["name"]) for r in rows],
        "table string, op string, lsn long, txn_id long, id long, name string",
    )
    final = apply_changes(None, df, keys=["id"], payload_cols=["name"])
    assert {(r["id"], r["name"]) for r in final.collect()} == {(1, "alice2")}
