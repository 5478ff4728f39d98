"""MongoDB OP_MSG wire client driven end-to-end against an in-process
fake mongod on a REAL socket (the test_pg_wire/test_kafka_wire pattern):
hello, SCRAM-SHA-256 auth, find/getMore cursors with filter/projection/
sort/skip/limit, count, and both Spark loaders (sequential + the
executor-parallel skip/limit batches of reference
sources/mongodb/helpers.py:216-268, 468-549)."""

from __future__ import annotations

import datetime as dt
import socketserver
import struct
import threading

import pytest

from verified_sources_spark.sources.bson_codec import (
    Decimal128,
    Int64,
    ObjectId,
    Regex,
    Timestamp,
    decode_document,
    encode_document,
)
from verified_sources_spark.sources.mongo_wire import (
    MongoError,
    MongoWireClient,
    load_collection,
    load_collection_parallel,
)

UTC = dt.timezone.utc


# ------------------------------------------------------------ BSON codec


def test_bson_round_trip_all_supported_types():
    oid = ObjectId("6578f1a2b3c4d5e6f7a8b9c0")
    doc = {
        "f": 1.5,
        "s": "héllo",
        "sub": {"a": 1, "b": [1, "x", None]},
        "arr": [1, 2, 3],
        "bin": b"\x00\x01\xff",
        "oid": oid,
        "t": True,
        "dt": dt.datetime(2024, 3, 1, 12, 30, 15, 250000, tzinfo=UTC),
        "nil": None,
        "rx": Regex("^a.*b$", "i"),
        "i32": 42,
        "neg": -7,
        "ts": Timestamp(1700000000, 5),
        "i64": 2**40,
        "forced": Int64(1),
    }
    out = decode_document(encode_document(doc))
    assert out["f"] == 1.5 and out["s"] == "héllo"
    assert out["sub"] == {"a": 1, "b": [1, "x", None]}
    assert out["arr"] == [1, 2, 3] and out["bin"] == b"\x00\x01\xff"
    assert out["oid"] == oid and str(out["oid"]) == "6578f1a2b3c4d5e6f7a8b9c0"
    assert out["t"] is True and out["nil"] is None
    assert out["dt"] == doc["dt"] and out["dt"].tzinfo is not None
    assert (out["rx"].pattern, out["rx"].flags) == ("^a.*b$", "i")
    assert out["rx"].try_compile().match("Axxb")
    assert out["i32"] == 42 and out["neg"] == -7
    assert out["ts"] == Timestamp(1700000000, 5)
    assert out["i64"] == 2**40 and isinstance(out["i64"], Int64)
    # int64 was forced even though the value fits in int32
    assert isinstance(out["forced"], Int64)


def test_decimal128_bid_decoding():
    # coefficient 15, exponent -1 => 1.5 (sign 0)
    high = (6176 - 1) << 49
    assert str(Decimal128(struct.pack("<QQ", 15, high))) == "1.5"
    # negative: -0.001 => coeff 1, exp -3, sign bit set
    high = ((6176 - 3) << 49) | (1 << 63)
    assert str(Decimal128(struct.pack("<QQ", 1, high))) == "-0.001"
    assert str(Decimal128(struct.pack("<QQ", 0, 0x7C00000000000000))) == "NaN"
    inf = Decimal128(struct.pack("<QQ", 0, 0x7800000000000000))
    assert str(inf) == "Infinity"


# ------------------------------------------------------- fake mongod

N_DOCS = 25
BASE = dt.datetime(2024, 1, 1, tzinfo=UTC)
DOCS = [
    {
        "_id": ObjectId(struct.pack(">I", i) + b"\x00" * 8),
        "name": f"user{i:02d}",
        "age": 20 + (i % 10),
        "created": BASE + dt.timedelta(days=i),
        "score": i / 4.0,
        "tags": [f"t{i % 3}"],
        "meta": {"tier": "gold" if i % 2 == 0 else "silver"},
    }
    for i in range(N_DOCS)
]


def _match(doc: dict, filt: dict) -> bool:
    for k, spec in filt.items():
        v = doc.get(k)
        if isinstance(spec, dict) and any(o.startswith("$") for o in spec):
            for op, arg in spec.items():
                ok = {
                    "$eq": lambda: v == arg,
                    "$ne": lambda: v != arg,
                    "$gt": lambda: v is not None and v > arg,
                    "$gte": lambda: v is not None and v >= arg,
                    "$lt": lambda: v is not None and v < arg,
                    "$lte": lambda: v is not None and v <= arg,
                    "$in": lambda: v in arg,
                }[op]()
                if not ok:
                    return False
        elif v != spec:
            return False
    return True


class _FakeMongod(socketserver.BaseRequestHandler):
    """OP_MSG command dispatcher over the scripted DOCS collection:
    hello, saslStart/saslContinue (ScramServer when creds configured),
    find/getMore with real cursor state, count."""

    def _recv_exact(self, n: int) -> bytes:
        buf = b""
        while len(buf) < n:
            chunk = self.request.recv(65536)
            if not chunk:
                raise ConnectionError("client left")
            buf += chunk
        return buf

    def _reply(self, rid: int, doc: dict) -> None:
        body = encode_document(doc)
        payload = struct.pack("<I", 0) + b"\x00" + body
        self.request.sendall(
            struct.pack("<iiii", 16 + len(payload), 1, rid, 2013) + payload
        )

    def handle(self) -> None:
        srv = self.server
        buf = b""
        cursors: dict[int, list] = {}
        next_cur = [1000]
        authed = srv.creds is None
        scram = None
        while True:
            try:
                while len(buf) < 16:
                    chunk = self.request.recv(65536)
                    if not chunk:
                        return
                    buf += chunk
                length, rid, _to, opcode = struct.unpack("<iiii", buf[:16])
                while len(buf) < length:
                    buf += self._recv_exact(length - len(buf))
                frame, buf = buf[16:length], buf[length:]
            except ConnectionError:
                return
            assert opcode == 2013 and frame[4] == 0
            cmd = decode_document(frame[5:])
            name = next(iter(cmd))
            srv.commands.append(name)

            if name == "hello":
                self._reply(rid, {"ok": 1.0, "maxWireVersion": 17,
                                  "maxBatchSize": 100000})
            elif name == "saslStart":
                from verified_sources_spark.sources.scram import ScramServer

                user, pw = srv.creds
                scram = ScramServer(cmd["mechanism"], user, pw)
                try:
                    first = scram.handle_client_first(bytes(cmd["payload"]))
                except Exception as e:
                    self._reply(rid, {"ok": 0.0, "errmsg": str(e)})
                    continue
                self._reply(rid, {"ok": 1.0, "conversationId": 1,
                                  "done": False, "payload": first})
            elif name == "saslContinue":
                try:
                    final = scram.handle_client_final(bytes(cmd["payload"]))
                except Exception as e:
                    self._reply(rid, {"ok": 0.0, "code": 18,
                                      "codeName": "AuthenticationFailed",
                                      "errmsg": str(e)})
                    continue
                authed = True
                self._reply(rid, {"ok": 1.0, "conversationId": 1,
                                  "done": True, "payload": final})
            elif not authed:
                self._reply(rid, {"ok": 0.0, "code": 13,
                                  "codeName": "Unauthorized",
                                  "errmsg": "command requires authentication"})
            elif name == "count":
                n = sum(1 for d in DOCS if _match(d, cmd.get("query") or {}))
                self._reply(rid, {"ok": 1.0, "n": n})
            elif name == "find":
                rows = [d for d in DOCS if _match(d, cmd.get("filter") or {})]
                for k, direction in reversed(list((cmd.get("sort") or {}).items())):
                    rows.sort(key=lambda d: d.get(k), reverse=direction < 0)
                if cmd.get("skip"):
                    rows = rows[cmd["skip"]:]
                if cmd.get("limit"):
                    rows = rows[: cmd["limit"]]
                proj = cmd.get("projection")
                if proj:
                    if any(v in (1, True) for v in proj.values()):
                        keep = {k for k, v in proj.items() if v in (1, True)}
                        if proj.get("_id") not in (0, False):
                            keep.add("_id")
                        rows = [{k: d[k] for k in d if k in keep} for d in rows]
                    else:
                        drop = {k for k, v in proj.items() if v in (0, False)}
                        rows = [
                            {k: v for k, v in d.items() if k not in drop}
                            for d in rows
                        ]
                bs = cmd.get("batchSize") or 101
                first, rest = rows[:bs], rows[bs:]
                cid = 0
                if rest:
                    next_cur[0] += 1
                    cid = next_cur[0]
                    cursors[cid] = rest
                self._reply(rid, {"ok": 1.0, "cursor": {
                    "id": Int64(cid), "ns": "testdb.users",
                    "firstBatch": first}})
            elif name == "getMore":
                cid = int(cmd["getMore"])
                srv.getmores.append(cid)
                rest = cursors.get(cid, [])
                bs = cmd.get("batchSize") or 101
                batch, rest = rest[:bs], rest[bs:]
                if rest:
                    cursors[cid] = rest
                    out_id = cid
                else:
                    cursors.pop(cid, None)
                    out_id = 0
                self._reply(rid, {"ok": 1.0, "cursor": {
                    "id": Int64(out_id), "ns": "testdb.users",
                    "nextBatch": batch}})
            else:
                self._reply(rid, {"ok": 0.0, "errmsg": f"no such command {name}"})


class _Server(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self, creds=None):
        super().__init__(("127.0.0.1", 0), _FakeMongod)
        self.creds = creds
        self.commands: list[str] = []
        self.getmores: list[int] = []


@pytest.fixture()
def mongod():
    srv = _Server()
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv
    srv.shutdown()
    srv.server_close()


@pytest.fixture()
def mongod_auth():
    srv = _Server(creds=("app", "sekret"))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv
    srv.shutdown()
    srv.server_close()


def _conn(srv, **kw):
    host, port = srv.server_address
    return {"host": host, "port": port, "database": "testdb", **kw}


# ------------------------------------------------------------ wire level


def test_hello_and_full_cursor_drain_uses_getmore(mongod):
    with MongoWireClient(**_conn(mongod)) as c:
        assert c.hello["maxWireVersion"] >= 6
        got = list(c.find("users", batch_size=7))
    assert len(got) == N_DOCS
    assert [d["name"] for d in got] == [d["name"] for d in DOCS]
    # 25 docs at batchSize 7: find + 3 getMores, server-assigned cursor
    assert len(mongod.getmores) == 3


def test_find_filter_sort_skip_limit_projection(mongod):
    with MongoWireClient(**_conn(mongod)) as c:
        got = list(
            c.find(
                "users",
                filter={"age": {"$gte": 25}, "meta": {"tier": "gold"}},
                sort={"created": -1},
                skip=1,
                limit=3,
                projection={"name": 1, "created": 1},
            )
        )
    want = [
        d for d in DOCS if d["age"] >= 25 and d["meta"] == {"tier": "gold"}
    ]
    want.sort(key=lambda d: d["created"], reverse=True)
    want = want[1:4]
    assert [d["name"] for d in got] == [d["name"] for d in want]
    # inclusion projection keeps _id implicitly, drops the rest
    assert set(got[0]) == {"_id", "name", "created"}


def test_count_documents(mongod):
    with MongoWireClient(**_conn(mongod)) as c:
        assert c.count_documents("users") == N_DOCS
        assert c.count_documents("users", {"age": {"$lt": 22}}) == sum(
            1 for d in DOCS if d["age"] < 22
        )


def test_scram_auth_then_find(mongod_auth):
    with MongoWireClient(
        **_conn(mongod_auth, username="app", password="sekret")
    ) as c:
        assert len(list(c.find("users", limit=2))) == 2
    assert "saslStart" in mongod_auth.commands
    assert "saslContinue" in mongod_auth.commands


def test_scram_wrong_password_rejected(mongod_auth):
    with pytest.raises((MongoError, Exception)) as ei:
        MongoWireClient(**_conn(mongod_auth, username="app", password="wrong"))
    assert "Authentication" in str(ei.value) or "proof" in str(ei.value)


def test_unauthenticated_find_refused(mongod_auth):
    c = MongoWireClient(**_conn(mongod_auth))  # hello is allowed pre-auth
    with pytest.raises(MongoError) as ei:
        list(c.find("users"))
    assert "authentication" in str(ei.value)
    c.close()


# ------------------------------------------------------------ Spark side

SCHEMA = (
    "_id string, name string, age int, created timestamp, score double"
)


def test_load_collection_sequential_coerces_bson(spark, mongod):
    df = load_collection(
        spark, _conn(mongod), "users", SCHEMA,
        filter_doc={"age": {"$gte": 28}}, sort={"name": 1},
    )
    rows = df.collect()
    want = sorted(
        (d for d in DOCS if d["age"] >= 28), key=lambda d: d["name"]
    )
    assert [r.name for r in rows] == [d["name"] for d in want]
    # ObjectId coerced to its 24-hex string, datetime to a real timestamp
    assert rows[0]._id == str(want[0]["_id"]) and len(rows[0]._id) == 24
    assert rows[0].created is not None


def test_load_collection_parallel_matches_sequential(spark, mongod):
    conn = _conn(mongod)
    seq = load_collection(spark, conn, "users", SCHEMA)
    par = load_collection_parallel(
        spark, conn, "users", SCHEMA, chunk_size=7
    )
    assert {tuple(r) for r in par.collect()} == {tuple(r) for r in seq.collect()}
    # one executor task per (skip, limit) batch: ceil(25/7) = 4 finds
    # with skip 0,7,14,21 (+1 sequential find + 1 count)
    assert par.rdd.getNumPartitions() == 4


def test_load_collection_parallel_respects_filter_and_limit(spark, mongod):
    par = load_collection_parallel(
        spark, _conn(mongod), "users", SCHEMA,
        filter_doc={"meta": {"tier": "silver"}}, limit=5, chunk_size=2,
    )
    got = par.collect()
    assert len(got) == 5
    silver = {d["name"] for d in DOCS if d["meta"]["tier"] == "silver"}
    assert {r.name for r in got} <= silver


def test_bson_datetime_millisecond_exactness():
    """Datetime encoding must use exact integer math: float64
    total_seconds() rounds and int() truncates toward zero, shifting
    some values by 1 ms (e.g. .123 -> .122) and breaking equality
    filters against server-stored values.  Pre-1970 floors, not
    truncates."""
    cases = [
        dt.datetime(2023, 7, 14, 12, 0, 0, 123000, tzinfo=UTC),
        dt.datetime(2038, 1, 19, 3, 14, 7, 999000, tzinfo=UTC),
        dt.datetime(1963, 1, 1, 0, 0, 0, 1000, tzinfo=UTC),
        dt.datetime(1901, 12, 13, 20, 45, 52, 1000, tzinfo=UTC),
    ]
    for d in cases:
        out = decode_document(encode_document({"d": d}))["d"]
        assert out == d, (d, out)
