"""TLS context helpers for the wire clients — mTLS included, stdlib-only.

The wire clients (``kafka_wire``, ``pg_wire``, ``kinesis_wire``'s HTTP
transport, ``imap_client``) all accept an ``ssl.SSLContext`` for custom
trust; what was missing is the construction side: building a context
from credential material the way the reference builds authenticated
clients from credentials (reference ``sources/kafka/helpers.py:240-262``
passes ssl_ca_location / ssl_certificate_location / ssl_key_location
straight to librdkafka — the same three inputs :func:`client_context`
takes here).

Also here: :func:`self_signed_cert` — a minimal X.509 (v1, RS256)
certificate minted from an ``rsa_jwt`` key with the same DER writer the
JWT signer uses.  That makes REAL mTLS handshakes testable in this
container (no openssl CLI, no crypto package): mint a cert per party,
hand them to ``ssl``, and the stdlib performs genuine certificate
verification over a live socket.  Production deployments bring CA-issued
certs; the minting exists for fixtures and local fakes, exactly like
``generate_rsa_key``.
"""

from __future__ import annotations

import base64
import datetime
import ssl

from verified_sources_spark.sources.rsa_jwt import (
    RsaPrivateKey,
    _enc_int,
    _enc_oid,
    _enc_seq,
    _tlv,
    rs256_sign,
)

_SHA256_RSA_OID = "1.2.840.113549.1.1.11"  # sha256WithRSAEncryption
_RSA_OID = "1.2.840.113549.1.1.1"
_CN_OID = "2.5.4.3"  # commonName


def _name(cn: str) -> bytes:
    atv = _enc_seq(_enc_oid(_CN_OID), _tlv(0x0C, cn.encode()))  # UTF8String
    return _enc_seq(_tlv(0x31, atv))  # RDNSequence = SEQUENCE OF SET


def _utctime(dt: datetime.datetime) -> bytes:
    return _tlv(0x17, dt.strftime("%y%m%d%H%M%SZ").encode())


def _spki(key: RsaPrivateKey) -> bytes:
    rsa_pub = _enc_seq(_enc_int(key.n), _enc_int(key.e))
    return _enc_seq(
        _enc_seq(_enc_oid(_RSA_OID), _tlv(0x05, b"")),
        _tlv(0x03, b"\x00" + rsa_pub),
    )


def self_signed_cert(
    key: RsaPrivateKey,
    common_name: str,
    days: int = 365,
    serial: int = 1,
    not_before: datetime.datetime | None = None,
) -> str:
    """Minimal self-signed X.509 v1 certificate (PEM), RS256-signed.

    v1 deliberately: no extensions means no basicConstraints/SAN to get
    wrong, and a v1 self-signed certificate placed in a trust store acts
    as a trust anchor for stdlib ``ssl`` (verified by the live-handshake
    tests).  Hostname checking needs a SAN, so pair with
    ``check_hostname=False`` + explicit CA pinning — the fixture/fake
    use this exists for."""
    nb = not_before if not_before is not None else datetime.datetime(2026, 1, 1)
    alg = _enc_seq(_enc_oid(_SHA256_RSA_OID), _tlv(0x05, b""))
    tbs = _enc_seq(
        _enc_int(serial),
        alg,
        _name(common_name),
        _enc_seq(_utctime(nb), _utctime(nb + datetime.timedelta(days=days))),
        _name(common_name),
        _spki(key),
    )
    cert = _enc_seq(tbs, alg, _tlv(0x03, b"\x00" + rs256_sign(tbs, key)))
    b64 = base64.b64encode(cert).decode()
    lines = [b64[i : i + 64] for i in range(0, len(b64), 64)]
    return (
        "-----BEGIN CERTIFICATE-----\n"
        + "\n".join(lines)
        + "\n-----END CERTIFICATE-----\n"
    )


def client_context(
    cafile: str | None = None,
    cadata: str | None = None,
    certfile: str | None = None,
    keyfile: str | None = None,
    check_hostname: bool = True,
) -> ssl.SSLContext:
    """Client-side ``SSLContext`` for the wire clients' ``tls=`` param.

    - ``cafile``/``cadata``: trust anchors (defaults to the system store
      when neither is given);
    - ``certfile``(+``keyfile``): CLIENT certificate → mTLS; omit for
      plain server-authenticated TLS;
    - ``check_hostname=False`` for CA-pinned endpoints whose cert has no
      SAN (self-signed fixtures) — verification still requires the
      pinned CA, it only skips the name match.
    """
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_CLIENT)
    if cafile or cadata:
        ctx.load_verify_locations(cafile=cafile, cadata=cadata)
    else:
        ctx.load_default_certs()
    ctx.check_hostname = check_hostname
    ctx.verify_mode = ssl.CERT_REQUIRED
    if certfile:
        ctx.load_cert_chain(certfile, keyfile)
    return ctx


def server_context(
    certfile: str,
    keyfile: str | None = None,
    client_ca: str | None = None,
) -> ssl.SSLContext:
    """Server-side context for in-process fakes; ``client_ca`` switches
    on REQUIRED client-certificate verification (the mTLS test bed)."""
    ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    ctx.load_cert_chain(certfile, keyfile)
    if client_ca:
        ctx.load_verify_locations(cafile=client_ca)
        ctx.verify_mode = ssl.CERT_REQUIRED
    return ctx
