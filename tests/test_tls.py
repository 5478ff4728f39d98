"""mTLS context helpers (sources/tls.py): REAL stdlib-ssl handshakes over
live sockets with certificates minted by our own DER writer + RS256
signer — genuine certificate verification, not mocks."""

from __future__ import annotations

import random
import socket
import ssl
import threading

import pytest

from verified_sources_spark.sources.rsa_jwt import generate_rsa_key, private_key_to_pem
from verified_sources_spark.sources.tls import (
    client_context,
    self_signed_cert,
    server_context,
)


@pytest.fixture(scope="module")
def certs(tmp_path_factory):
    d = tmp_path_factory.mktemp("certs")
    out = {}
    for i, who in enumerate(("server", "client")):
        key = generate_rsa_key(2048, rng=random.Random(1000 + i))
        (d / f"{who}.crt").write_text(self_signed_cert(key, f"{who}.test"))
        (d / f"{who}.key").write_text(private_key_to_pem(key))
        out[who] = (str(d / f"{who}.crt"), str(d / f"{who}.key"))
    return out


def _serve_once(ctx, results):
    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)

    def run():
        conn, _ = srv.accept()
        try:
            tc = ctx.wrap_socket(conn, server_side=True)
            results["peer_cert"] = tc.getpeercert()
            tc.sendall(b"over-tls")
            tc.close()
        except ssl.SSLError as e:
            results["server_error"] = e
        finally:
            srv.close()

    t = threading.Thread(target=run, daemon=True)
    t.start()
    return srv.getsockname()[1], t


def test_mutual_tls_round_trip(certs):
    s_crt, s_key = certs["server"]
    c_crt, c_key = certs["client"]
    results = {}
    port, t = _serve_once(server_context(s_crt, s_key, client_ca=c_crt), results)
    ctx = client_context(
        cafile=s_crt, certfile=c_crt, keyfile=c_key, check_hostname=False
    )
    with socket.create_connection(("127.0.0.1", port)) as raw:
        with ctx.wrap_socket(raw) as tls:
            assert tls.recv(16) == b"over-tls"
            assert tls.version() is not None
    t.join(5)
    # server performed REQUIRED client-cert verification and saw it
    assert results.get("peer_cert") is not None
    subj = dict(x[0] for x in results["peer_cert"]["subject"])
    assert subj["commonName"] == "client.test"


def test_server_rejects_client_without_cert(certs):
    s_crt, s_key = certs["server"]
    c_crt, _ = certs["client"]
    results = {}
    port, t = _serve_once(server_context(s_crt, s_key, client_ca=c_crt), results)
    ctx = client_context(cafile=s_crt, check_hostname=False)  # no client cert
    with pytest.raises(ssl.SSLError):
        with socket.create_connection(("127.0.0.1", port)) as raw:
            with ctx.wrap_socket(raw) as tls:
                tls.recv(16)
    t.join(5)


def test_client_rejects_unknown_server_ca(certs):
    s_crt, s_key = certs["server"]
    c_crt, c_key = certs["client"]
    results = {}
    port, t = _serve_once(server_context(s_crt, s_key), results)
    # client trusts only its OWN cert, not the server's → verify fails
    ctx = client_context(cafile=c_crt, check_hostname=False)
    with pytest.raises(ssl.SSLCertVerificationError):
        with socket.create_connection(("127.0.0.1", port)) as raw:
            ctx.wrap_socket(raw)
    t.join(5)


def test_default_cert_valid_now_and_2050_uses_generalizedtime():
    """Default-minted certs must be valid at mint time (a fixed epoch
    default is a time bomb), and validity dates >= 2050 must encode as
    GeneralizedTime (UTCTime's 2-digit years wrap to 19xx)."""
    import base64
    import datetime

    from verified_sources_spark.sources.rsa_jwt import _read_tlv, generate_rsa_key
    from verified_sources_spark.sources.tls import _x509_time, self_signed_cert

    # UTCTime (0x17) below 2050, GeneralizedTime (0x18) at/after
    assert _x509_time(datetime.datetime(2049, 12, 31))[0] == 0x17
    assert _x509_time(datetime.datetime(2050, 1, 1))[0] == 0x18
    tag, val, _ = _read_tlv(_x509_time(datetime.datetime(2055, 6, 1, 12)), 0)
    assert val == b"20550601120000Z"

    # a default-minted cert loads as a trust anchor RIGHT NOW
    import ssl

    key = generate_rsa_key(2048, rng=random.Random(77))
    pem = self_signed_cert(key, "now.test")
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    ctx.load_verify_locations(cadata=pem)
    der = base64.b64decode(
        "".join(l for l in pem.splitlines() if not l.startswith("-----")))
    assert der[0] == 0x30
