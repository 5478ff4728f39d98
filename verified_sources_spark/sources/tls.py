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

import datetime
import ssl

from verified_sources_spark.sources.rsa_jwt import (
    RsaPrivateKey,
    _enc_int,
    _enc_oid,
    _enc_seq,
    _tlv,
    pem_wrap,
    rs256_sign,
    spki_der,
)

_SHA256_RSA_OID = "1.2.840.113549.1.1.11"  # sha256WithRSAEncryption
_CN_OID = "2.5.4.3"  # commonName


def _name(cn: str) -> bytes:
    atv = _enc_seq(_enc_oid(_CN_OID), _tlv(0x0C, cn.encode()))  # UTF8String
    return _enc_seq(_tlv(0x31, atv))  # RDNSequence = SEQUENCE OF SET


def _x509_time(dt: datetime.datetime) -> bytes:
    # X.509: UTCTime (2-digit year) covers 1950-2049 ONLY; dates from
    # 2050 MUST use GeneralizedTime or they'd silently wrap to 19xx and
    # read as expired
    if dt.year >= 2050:
        return _tlv(0x18, dt.strftime("%Y%m%d%H%M%SZ").encode())
    return _tlv(0x17, dt.strftime("%y%m%d%H%M%SZ").encode())


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
    use this exists for.  The default validity window starts an hour ago
    (clock-skew headroom) and runs ``days`` forward — a fixed default
    epoch would turn every test/fixture cert into a time bomb."""
    nb = (
        not_before
        if not_before is not None
        else datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
        - datetime.timedelta(hours=1)
    )
    alg = _enc_seq(_enc_oid(_SHA256_RSA_OID), _tlv(0x05, b""))
    tbs = _enc_seq(
        _enc_int(serial),
        alg,
        _name(common_name),
        _enc_seq(_x509_time(nb), _x509_time(nb + datetime.timedelta(days=days))),
        _name(common_name),
        spki_der(key.n, key.e),
    )
    cert = _enc_seq(tbs, alg, _tlv(0x03, b"\x00" + rs256_sign(tbs, key)))
    return pem_wrap("CERTIFICATE", cert)


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
