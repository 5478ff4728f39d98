"""KafkaWireClient against a REAL socket: an in-process fake broker
speaks the size-framed binary protocol (ApiVersions, Metadata v1,
ListOffsets v1, Fetch v4) and serves RecordBatch v2 record sets one
batch per fetch, so the client's bounded-read loop (snapshot end
offsets, read exactly (committed, end], commit after landing) is
exercised end-to-end through to Spark's bounded_read semantics."""

from __future__ import annotations

import socketserver
import struct
import threading

import pytest

from verified_sources_spark.sources.kafka_wire import (
    EARLIEST_TS,
    KafkaRecord,
    KafkaWireClient,
    crc32c,
    decode_record_batches,
    decode_varint,
    encode_record_batch,
    encode_varint,
    fetch_bounded,
    records_to_rows,
)


def test_crc32c_and_varint_pinned():
    # RFC 3720 §B.4 check value pins the CRC family; zigzag varints pin
    # the record field codec
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    for v in (0, 1, -1, 63, 64, -64, -65, 300, -300, 2**31, -(2**31)):
        buf = encode_varint(v)
        got, pos = decode_varint(buf, 0)
        assert (got, pos) == (v, len(buf))
    assert encode_varint(0) == b"\x00"
    assert encode_varint(-1) == b"\x01"
    assert encode_varint(1) == b"\x02"


def test_record_batch_roundtrip_and_crc_detection():
    batch = encode_record_batch(
        base_offset=40,
        first_timestamp_ms=1_000,
        records=[
            (b"k1", b"v1", [("h", b"x")]),
            (None, b"v2", []),
            (b"k3", None, []),
        ],
    )
    recs = decode_record_batches(batch, "t", 0)
    assert [(r.offset, r.key, r.value) for r in recs] == [
        (40, b"k1", b"v1"),
        (41, None, b"v2"),
        (42, b"k3", None),
    ]
    assert recs[0].headers == [("h", b"x")]
    assert [r.timestamp_ms for r in recs] == [1000, 1001, 1002]
    corrupt = batch[:30] + bytes([batch[30] ^ 0xFF]) + batch[31:]
    with pytest.raises(ValueError, match="CRC"):
        decode_record_batches(corrupt, "t", 0)
    # a truncated trailing batch is dropped, not an error
    assert decode_record_batches(batch + batch[: len(batch) // 2], "t", 0) == recs


def _str(s: str | None) -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    return struct.pack(">h", len(s.encode())) + s.encode()


class _Rd:
    def __init__(self, buf):
        self.buf, self.pos = buf, 0

    def take(self, fmt):
        v = struct.unpack_from(fmt, self.buf, self.pos)
        self.pos += struct.calcsize(fmt)
        return v if len(v) > 1 else v[0]

    def string(self):
        n = self.take(">h")
        if n < 0:
            return None
        s = self.buf[self.pos : self.pos + n].decode()
        self.pos += n
        return s

    def raw(self, n):
        out = self.buf[self.pos : self.pos + n]
        self.pos += n
        return out


class _FakeBroker(socketserver.BaseRequestHandler):
    """Scripted broker: one topic log of pre-encoded RecordBatch v2
    chunks; Fetch serves ONE batch per request to force the client's
    advance-and-refetch loop."""

    def setup(self):
        self._buf = b""
        self._mech = None
        self._scram = None
        self._authed = False

    def _recv_exact(self, n):
        while len(self._buf) < n:
            chunk = self.request.recv(65536)
            if not chunk:
                raise ConnectionError
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def _reply(self, corr: int, body: bytes):
        frame = struct.pack(">i", corr) + body
        self.request.sendall(struct.pack(">i", len(frame)) + frame)

    def handle(self):
        log = self.server.log  # (topic, pid) -> [(base, count, bytes)]
        while True:
            try:
                (size,) = struct.unpack(">i", self._recv_exact(4))
            except ConnectionError:
                return
            r = _Rd(self._recv_exact(size))
            api, ver, corr = r.take(">hhi")
            self.server.seen.append((api, ver, r.string()))  # client_id
            if (
                self.server.sasl_creds is not None
                and not self._authed
                and api not in (17, 36, 18)
            ):
                # SASL listener: unauthenticated data-plane request →
                # connection killed (what a real broker does)
                return
            if api == 17:  # SaslHandshake v1
                mech = r.string()
                self._mech = mech
                known = ("SCRAM-SHA-256", "SCRAM-SHA-512", "PLAIN")
                err = 0 if (self.server.sasl_creds and mech in known) else 33
                body = struct.pack(">hi", err, len(known))
                for m in known:
                    body += _str(m)
                self._reply(corr, body)
            elif api == 36:  # SaslAuthenticate v0
                from verified_sources_spark.sources.scram import ScramServer

                n = r.take(">i")
                payload = r.raw(n)
                user, pw = self.server.sasl_creds
                try:
                    if self._mech == "PLAIN":
                        _z, u, p = payload.split(b"\x00")
                        if (u.decode(), p.decode()) != (user, pw):
                            raise ValueError("PLAIN credentials rejected")
                        out, self._authed = b"", True
                    elif self._scram is None:
                        self._scram = ScramServer(self._mech, user, pw)
                        out = self._scram.handle_client_first(payload)
                    else:
                        out = self._scram.handle_client_final(payload)
                        self._authed = True
                    body = struct.pack(">h", 0) + _str(None)
                    body += struct.pack(">i", len(out)) + out
                except Exception as e:  # real broker: SASL_AUTHENTICATION_FAILED
                    body = struct.pack(">h", 58) + _str(str(e))
                    body += struct.pack(">i", 0)
                    self._scram = None
                self._reply(corr, body)
            elif api == 18:  # ApiVersions
                body = struct.pack(">h", 0) + struct.pack(">i", 3)
                for key, lo, hi in ((1, 0, 4), (2, 0, 1), (3, 0, 1)):
                    body += struct.pack(">hhh", key, lo, hi)
                self._reply(corr, body)
            elif api == 3:  # Metadata v1
                n = r.take(">i")
                topics = sorted({t for t, _ in log}) if n < 0 else [
                    r.string() for _ in range(n)
                ]
                host, port = self.server.server_address
                body = struct.pack(">i", 1)
                body += struct.pack(">i", 0) + _str(host) + struct.pack(">i", port)
                body += _str(None)  # rack
                body += struct.pack(">i", 0)  # controller
                body += struct.pack(">i", len(topics))
                for t in topics:
                    pids = sorted(p for tt, p in log if tt == t)
                    body += struct.pack(">h", 0) + _str(t) + b"\x00"
                    body += struct.pack(">i", len(pids))
                    for p in pids:
                        body += struct.pack(">hii", 0, p, 0)
                        body += struct.pack(">ii", 1, 0)  # replicas [0]
                        body += struct.pack(">ii", 1, 0)  # isr [0]
                self._reply(corr, body)
            elif api == 2:  # ListOffsets v1
                r.take(">i")  # replica_id
                body = b""
                ntop = r.take(">i")
                body += struct.pack(">i", ntop)
                for _ in range(ntop):
                    t = r.string()
                    nparts = r.take(">i")
                    body += _str(t) + struct.pack(">i", nparts)
                    for _ in range(nparts):
                        pid, ts = r.take(">iq")
                        chunks = log[(t, pid)]
                        if ts == -2:
                            off = chunks[0][0] if chunks else 0
                        else:  # latest = log-end
                            off = (
                                chunks[-1][0] + chunks[-1][1] if chunks else 0
                            )
                        body += struct.pack(">ihqq", pid, 0, -1, off)
                self._reply(corr, body)
            elif api == 1:  # Fetch v4
                r.take(">iiiib")
                ntop = r.take(">i")
                body = struct.pack(">i", 0) + struct.pack(">i", ntop)
                for _ in range(ntop):
                    t = r.string()
                    nparts = r.take(">i")
                    body += _str(t) + struct.pack(">i", nparts)
                    for _ in range(nparts):
                        pid, off, _mb = r.take(">iqi")
                        chunks = log[(t, pid)]
                        hw = chunks[-1][0] + chunks[-1][1] if chunks else 0
                        served = next(
                            (c for c in chunks if c[0] + c[1] > off), None
                        )
                        record_set = served[2] if served else b""
                        body += struct.pack(">ihqq", pid, 0, hw, hw)
                        body += struct.pack(">i", 0)  # aborted txns
                        body += struct.pack(">i", len(record_set)) + record_set
                self._reply(corr, body)


class _Broker(socketserver.ThreadingTCPServer):
    allow_reuse_address = True
    daemon_threads = True

    def __init__(self):
        super().__init__(("127.0.0.1", 0), _FakeBroker)
        self.log = {}
        self.seen = []
        self.sasl_creds = None  # (user, password) switches SASL enforcement on

    def load(self, topic, pid, base, records, ts=1_000):
        batch = encode_record_batch(base, ts, records)
        self.log.setdefault((topic, pid), []).append((base, len(records), batch))


@pytest.fixture()
def broker():
    srv = _Broker()
    # partition 0: two batches (forces the refetch loop); partition 1: one
    srv.load("events", 0, 0, [(b"a", b"ev-a", []), (b"b", b"ev-b", [])])
    srv.load("events", 0, 2, [(b"c", b"ev-c", [("src", b"unit")])])
    srv.load("events", 1, 0, [(b"d", b"ev-d", [])])
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


def test_metadata_offsets_fetch(broker):
    host, port = broker.server_address
    with KafkaWireClient(host, port) as client:
        assert 1 in client.api_versions()
        meta = client.metadata(["events"])
        assert meta["topics"] == {"events": [0, 1]}
        assert client.list_offsets("events", [0, 1]) == {0: 3, 1: 1}
        assert client.list_offsets("events", [0], EARLIEST_TS) == {0: 0}
        recs, hw = client.fetch("events", 0, 1)
        # whole batch returned, records below the requested offset dropped
        assert [(r.offset, r.key) for r in recs] == [(1, b"b")]
        assert hw == 3
    assert all(cid == "verified_sources_spark" for _, _, cid in broker.seen)


def test_fetch_bounded_and_resume(broker):
    host, port = broker.server_address
    records, state = fetch_bounded(host, port, "events")
    assert [(r.partition, r.offset, r.value) for r in records] == [
        (0, 0, b"ev-a"),
        (0, 1, b"ev-b"),
        (0, 2, b"ev-c"),
        (1, 0, b"ev-d"),
    ]
    assert state == {0: 2, 1: 0}
    # resume from the committed state: nothing new
    again, state2 = fetch_bounded(host, port, "events", committed=state)
    assert again == [] and state2 == state
    # new produce lands, next bounded run reads exactly the delta
    broker.load("events", 1, 1, [(b"e", b"ev-e", [])])
    delta, state3 = fetch_bounded(host, port, "events", committed=state)
    assert [(r.partition, r.offset) for r in delta] == [(1, 1)]
    assert state3 == {0: 2, 1: 1}


def test_records_to_spark_envelope(spark, broker):
    from verified_sources_spark.sources.streams import with_envelope

    host, port = broker.server_address
    records, _ = fetch_bounded(host, port, "events")
    schema = (
        "topic string, partition int, offset long, ts long, "
        "key string, value binary, headers map<string, binary>"
    )
    df = spark.createDataFrame(records_to_rows(records), schema=schema)
    out = with_envelope(df).collect()
    assert len(out) == 4
    assert len({r["_msg_id"] for r in out}) == 4  # digest ids unique
    byid = {(r["partition"], r["offset"]): r for r in out}
    assert bytes(byid[(0, 2)]["value"]) == b"ev-c"
    assert bytes(byid[(0, 2)]["headers"]["src"]) == b"unit"


# ---------------------------------------------------------------- SASL / TLS


def _sasl_broker():
    srv = _Broker()
    srv.sasl_creds = ("alice", "s3cret")
    srv.load("t", 0, 0, [(b"k", b"v", [])])
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv


def test_sasl_scram_handshake_then_fetch():
    """Full KIP-152 flow against a proof-verifying broker: handshake,
    two SCRAM rounds, mutual-auth check, then the data plane works."""
    srv = _sasl_broker()
    try:
        host, port = srv.server_address
        with KafkaWireClient(host, port) as c:
            c.sasl_authenticate("alice", "s3cret", "SCRAM-SHA-256")
            md = c.metadata(["t"])
            assert md["topics"]["t"] == [0]
        # the wire saw handshake(17) then two authenticate(36) rounds
        apis = [a for a, _, _ in srv.seen]
        assert apis[:3] == [17, 36, 36]
    finally:
        srv.shutdown()


def test_sasl_plain_inside_and_wrong_password():
    srv = _sasl_broker()
    try:
        host, port = srv.server_address
        with KafkaWireClient(host, port) as c:
            c.sasl_authenticate("alice", "s3cret", "PLAIN")
            assert c.metadata(["t"])["topics"]["t"] == [0]
        with KafkaWireClient(host, port) as c:
            with pytest.raises(ValueError, match="SaslAuthenticate error 58"):
                c.sasl_authenticate("alice", "wrong", "SCRAM-SHA-256")
    finally:
        srv.shutdown()


def test_unauthenticated_data_plane_is_refused():
    srv = _sasl_broker()
    try:
        host, port = srv.server_address
        with KafkaWireClient(host, port) as c:
            with pytest.raises((ConnectionError, ValueError)):
                c.metadata(["t"])
    finally:
        srv.shutdown()


@pytest.fixture(scope="module")
def tls_cert(tmp_path_factory):
    """Self-signed cert with a 127.0.0.1 SAN so real hostname
    verification runs."""
    import subprocess

    d = tmp_path_factory.mktemp("tls")
    key, crt = str(d / "key.pem"), str(d / "crt.pem")
    subprocess.run(
        [
            "openssl", "req", "-x509", "-newkey", "rsa:2048", "-nodes",
            "-keyout", key, "-out", crt, "-days", "2", "-subj", "/CN=localhost",
            "-addext", "subjectAltName=IP:127.0.0.1",
        ],
        check=True, capture_output=True,
    )
    return key, crt


def test_tls_wrapped_broker_socket(tls_cert):
    """The client's tls= knob performs a real TLS handshake (cert loaded
    into the client context, hostname-verified) and SASL+fetch run
    inside the channel — the SASL_SSL listener stack."""
    import ssl as _ssl

    key, crt = tls_cert
    server_ctx = _ssl.SSLContext(_ssl.PROTOCOL_TLS_SERVER)
    server_ctx.load_cert_chain(crt, key)

    class _TlsBroker(_Broker):
        def get_request(self):
            sock, addr = socketserver.ThreadingTCPServer.get_request(self)
            return server_ctx.wrap_socket(sock, server_side=True), addr

    srv = _TlsBroker()
    srv.sasl_creds = ("alice", "s3cret")
    srv.load("t", 0, 0, [(b"k", b"v", [])])
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        host, port = srv.server_address
        client_ctx = _ssl.create_default_context(cafile=crt)
        with KafkaWireClient(host, port, tls=client_ctx) as c:
            c.sasl_authenticate("alice", "s3cret", "SCRAM-SHA-512")
            assert c.metadata(["t"])["topics"]["t"] == [0]
    finally:
        srv.shutdown()
