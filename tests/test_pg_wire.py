"""WalsenderClient against a REAL socket: an in-process fake walsender
speaks the backend side of the PostgreSQL streaming-replication
protocol (startup/auth, IDENTIFY_SYSTEM over simple query,
START_REPLICATION → CopyBoth, XLogData + keepalive frames, standby
status updates advancing the confirmed flush LSN), and the framed
payloads flow through the pgoutput decoder into Spark apply_changes —
the live-transport end of the CDC pipeline exercised end-to-end."""

from __future__ import annotations

import socketserver
import struct
import threading

import pytest

from verified_sources_spark.sources.cdc import apply_changes
from verified_sources_spark.sources.pg_decoders import messages_to_change_rows
from verified_sources_spark.sources.pg_wire import (
    WalsenderClient,
    fetch_slot_changes,
    fmt_lsn,
    parse_lsn,
)

TEXT_OID = 25


def _cstr(s: str) -> bytes:
    return s.encode() + b"\x00"


def _tuple(vals: list[bytes | None]) -> bytes:
    out = struct.pack(">H", len(vals))
    for v in vals:
        out += b"n" if v is None else b"t" + struct.pack(">I", len(v)) + v
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


def _insert(rel: int, vals: list[bytes | None]) -> bytes:
    return b"I" + struct.pack(">I", rel) + b"N" + _tuple(vals)


def _update(rel: int, key: list[bytes | None], new: list[bytes | None]) -> bytes:
    return b"U" + struct.pack(">I", rel) + b"K" + _tuple(key) + b"N" + _tuple(new)


def _delete(rel: int, key: list[bytes | None]) -> bytes:
    return b"D" + struct.pack(">I", rel) + b"K" + _tuple(key)


# the scripted change stream: two committed transactions on table "users"
REL = 44
SCRIPT: list[tuple[int, bytes]] = [
    (100, _begin(100, 1_000, 7)),
    (101, _relation(REL, "users", [("id", TEXT_OID), ("name", TEXT_OID)])),
    (102, _insert(REL, [b"1", b"alice"])),
    (103, _insert(REL, [b"2", b"bob"])),
    (110, _commit(110, 1_000)),
    (120, _begin(120, 2_000, 8)),
    (121, _update(REL, [b"1", None], [b"1", b"alice2"])),
    (122, _delete(REL, [b"2", None])),
    (130, _commit(130, 2_000)),
]
LAST_LSN = 130


class _FakeWalsender(socketserver.BaseRequestHandler):
    """Backend side of the protocol, scripted.  Replies to the startup
    with AuthenticationOk + ReadyForQuery, answers IDENTIFY_SYSTEM, and
    on START_REPLICATION streams SCRIPT as XLogData frames with a
    keepalive (reply requested) in the middle, then waits for a standby
    status update confirming LAST_LSN before finishing the copy."""

    def _send(self, mtype: bytes, body: bytes) -> None:
        self.request.sendall(mtype + struct.pack(">I", len(body) + 4) + body)

    def setup(self) -> None:
        self._buf = b""

    def _recv_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.request.recv(65536)
            if not chunk:
                raise ConnectionError("client went away")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _read_client(self) -> tuple[bytes, bytes]:
        mtype = self._recv_exact(1)
        (length,) = struct.unpack(">I", self._recv_exact(4))
        return mtype, self._recv_exact(length - 4)

    def handle(self) -> None:
        srv = self.server
        # startup message (untyped): length + proto + params
        (length,) = struct.unpack(">I", self._recv_exact(4))
        body = self._recv_exact(length - 4)
        (proto,) = struct.unpack(">I", body[:4])
        params = body[4:].rstrip(b"\x00").split(b"\x00")
        srv.startup_params = dict(zip(params[::2], params[1::2]))
        srv.protocol = proto
        if getattr(srv, "scram_creds", None) is not None:
            from verified_sources_spark.sources.scram import ScramServer

            user, pw = srv.scram_creds
            # AuthenticationSASL: advertise mechanisms (null-terminated
            # list, empty string terminator)
            self._send(
                b"R", struct.pack(">I", 10) + b"SCRAM-SHA-256\x00\x00"
            )
            mtype, mbody = self._read_client()
            assert mtype == b"p"
            mech_end = mbody.index(b"\x00")
            assert mbody[:mech_end] == b"SCRAM-SHA-256"
            (ilen,) = struct.unpack(">i", mbody[mech_end + 1 : mech_end + 5])
            client_first = mbody[mech_end + 5 : mech_end + 5 + ilen]
            scram = ScramServer("SCRAM-SHA-256", user, pw)
            server_first = scram.handle_client_first(client_first)
            self._send(b"R", struct.pack(">I", 11) + server_first)
            mtype, mbody = self._read_client()
            assert mtype == b"p"
            try:
                server_final = scram.handle_client_final(mbody)
            except Exception as e:
                err = b"SMFATAL\x00C28P01\x00M" + str(e).encode() + b"\x00\x00"
                self._send(b"E", err)
                return
            self._send(b"R", struct.pack(">I", 12) + server_final)
        self._send(b"R", struct.pack(">I", 0))  # AuthenticationOk
        self._send(b"S", _cstr("server_version") + _cstr("16.3"))
        self._send(b"Z", b"I")
        while True:
            try:
                mtype, mbody = self._read_client()
            except ConnectionError:
                return
            if mtype == b"X":
                return
            if mtype != b"Q":
                continue
            sql = mbody.rstrip(b"\x00").decode()
            if sql == "IDENTIFY_SYSTEM":
                self._send(b"T", struct.pack(">H", 0))
                row = [b"7000", b"1", fmt_lsn(LAST_LSN).encode(), b"testdb"]
                drow = struct.pack(">H", len(row))
                for v in row:
                    drow += struct.pack(">i", len(v)) + v
                self._send(b"D", drow)
                self._send(b"C", _cstr("IDENTIFY_SYSTEM"))
                self._send(b"Z", b"I")
            elif sql.startswith("START_REPLICATION"):
                srv.replication_sql = sql
                start_lsn = parse_lsn(sql.split(" LOGICAL ")[1].split(" ")[0])
                self._send(b"W", struct.pack(">BH", 0, 0))  # CopyBothResponse
                half = len(SCRIPT) // 2
                for i, (lsn, payload) in enumerate(SCRIPT):
                    if lsn < start_lsn:
                        continue  # resume semantics: skip acknowledged WAL
                    self._send(
                        b"d",
                        b"w" + struct.pack(">QQq", lsn, lsn, 0) + payload,
                    )
                    if i == half:  # mid-stream keepalive demanding a reply
                        self._send(b"d", b"k" + struct.pack(">QqB", lsn, 0, 1))
                        self._await_status(srv)
                # hold the copy open until the client confirms the tip
                deadline_frames = 50
                while srv.flushed_lsn <= LAST_LSN and deadline_frames:
                    self._send(b"d", b"k" + struct.pack(">QqB", LAST_LSN, 0, 1))
                    self._await_status(srv)
                    deadline_frames -= 1
                self._send(b"c", b"")  # CopyDone
                self._send(b"C", _cstr("COPY 0"))
                self._send(b"Z", b"I")

    def _await_status(self, srv) -> None:
        mtype, body = self._read_client()
        if mtype == b"d" and body[:1] == b"r":
            received, flushed, applied = struct.unpack(">QQQ", body[1:25])
            srv.flushed_lsn = max(srv.flushed_lsn, flushed)


class _Server(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self):
        super().__init__(("127.0.0.1", 0), _FakeWalsender)
        self.flushed_lsn = 0
        self.startup_params: dict[bytes, bytes] = {}
        self.replication_sql = ""
        self.protocol = 0


@pytest.fixture()
def walsender():
    srv = _Server()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


def test_identify_and_stream_advances_slot(walsender):
    host, port = walsender.server_address
    with WalsenderClient(host, port, "testdb", "repl") as client:
        info = client.identify_system()
        assert info["xlogpos"] == fmt_lsn(LAST_LSN)
        frames = []
        for frame in client.start_replication("slot1", "pub1", start_lsn=0):
            frames.append(frame)
            # confirm as the sink commits — the server keeps the copy open
            # (keepalive ping-pong) until the tip is acknowledged
            client.confirm_flush(frame.wal_start)
    assert [f.wal_start for f in frames] == [lsn for lsn, _ in SCRIPT]
    assert walsender.protocol == 196608
    assert walsender.startup_params[b"replication"] == b"database"
    assert 'SLOT "slot1"' in walsender.replication_sql
    assert "publication_names '\"pub1\"'" in walsender.replication_sql
    # the standby status updates advanced the server's confirmed flush
    # position past the last commit — the slot will not resend this WAL
    assert walsender.flushed_lsn == LAST_LSN + 1


def test_resume_skips_acknowledged_wal(walsender):
    host, port = walsender.server_address
    framed, last = fetch_slot_changes(
        host, port, "testdb", "repl", "slot1", "pub1", start_lsn=120, confirm_every=1
    )
    assert [lsn for lsn, _ in framed] == [120, 121, 122, 130]
    assert last == 130


def test_stream_to_spark_apply_changes(spark, walsender):
    host, port = walsender.server_address
    framed, last = fetch_slot_changes(
        host, port, "testdb", "repl", "slot1", "pub1", confirm_every=1
    )
    assert last == LAST_LSN
    rows = messages_to_change_rows(framed)
    df = spark.createDataFrame(rows)
    final = apply_changes(None, df, keys=["id"], payload_cols=["name"])
    got = {(r["id"], r["name"]) for r in final.collect()}
    assert got == {("1", "alice2")}  # bob deleted, alice updated


# ---------------------------------------------------------------- SCRAM auth


def test_scram_sha256_auth_then_stream(walsender):
    """AuthenticationSASL → SASLInitialResponse → SASLContinue →
    SASLResponse → SASLFinal (server signature verified) → Ok, then the
    replication session works as before."""
    walsender.scram_creds = ("repl", "wal-pass")
    host, port = walsender.server_address
    with WalsenderClient(host, port, "testdb", "repl", password="wal-pass") as c:
        assert c.identify_system()["xlogpos"] == fmt_lsn(LAST_LSN)


def test_scram_wrong_password_rejected(walsender):
    from verified_sources_spark.sources.pg_wire import PgError

    walsender.scram_creds = ("repl", "wal-pass")
    host, port = walsender.server_address
    with pytest.raises(PgError):
        WalsenderClient(host, port, "testdb", "repl", password="nope")


def test_scram_without_password_raises(walsender):
    walsender.scram_creds = ("repl", "wal-pass")
    host, port = walsender.server_address
    with pytest.raises(NotImplementedError, match="no password"):
        WalsenderClient(host, port, "testdb", "repl")
