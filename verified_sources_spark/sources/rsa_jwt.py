"""RS256 JWT signing from the stdlib — the JWT-bearer OAuth2 grant's
missing primitive.

The reference authenticates Google-family connectors with service
accounts and Salesforce with the JWT-bearer flow (reference
sources/salesforce/helpers/client.py:94, google-auth's signed-JWT
exchange used by sources/google_sheets /google_analytics credentials):
both sign a JWS with RS256 and exchange it at the token endpoint
(RFC 7523).  Python's stdlib has hashlib/hmac but no RSA, and this
engine takes no crypto dependency — so this module implements exactly
the pieces the grant needs from their public specifications:

- a minimal ASN.1 DER reader/writer (ITU-T X.690) for RSA key material,
- PKCS#1 (RFC 8017 A.1.2 ``RSAPrivateKey``) and PKCS#8 (RFC 5208
  ``PrivateKeyInfo``) PEM parsing, plus SPKI public keys,
- EMSA-PKCS1-v1_5 signing/verification with the SHA-256 DigestInfo
  prefix (RFC 8017 §9.2), CRT-accelerated modexp when p/q are present,
- compact JWS (RFC 7515) / JWT (RFC 7519) encoding,
- a deterministic-given-rng RSA keypair generator (Miller-Rabin,
  FIPS 186-style) so tests can mint fixtures without a crypto package.

Scope note: this is a CLIENT-SIDE signer for short-lived assertion JWTs.
It does textbook constant-algorithm RSA — adequate for signing (the
secret never meets attacker-controlled timing oracles the way a TLS
decryption key does), not a general-purpose crypto library.
"""

from __future__ import annotations

import base64
import hashlib
import json
import secrets
import time
from dataclasses import dataclass

# ---------------------------------------------------------------- DER read
_RSA_OID = "1.2.840.113549.1.1.1"  # rsaEncryption


class DerError(ValueError):
    pass


def _read_tlv(data: bytes, pos: int) -> tuple[int, bytes, int]:
    """One DER TLV at *pos* → (tag, value, next_pos)."""
    if pos >= len(data):
        raise DerError("truncated DER")
    tag = data[pos]
    pos += 1
    if pos >= len(data):
        raise DerError("truncated DER length")
    first = data[pos]
    pos += 1
    if first < 0x80:
        length = first
    else:
        n = first & 0x7F
        if n == 0 or pos + n > len(data):
            raise DerError("bad DER length")
        length = int.from_bytes(data[pos : pos + n], "big")
        pos += n
    if pos + length > len(data):
        raise DerError("DER value overruns buffer")
    return tag, data[pos : pos + length], pos + length


def _der_int(value: bytes) -> int:
    if not value:
        raise DerError("empty INTEGER")
    return int.from_bytes(value, "big", signed=True)


def _iter_sequence(value: bytes):
    pos = 0
    while pos < len(value):
        tag, v, pos = _read_tlv(value, pos)
        yield tag, v


def _decode_oid(value: bytes) -> str:
    if not value:
        raise DerError("empty OID")
    out = [str(value[0] // 40), str(value[0] % 40)]
    acc = 0
    for b in value[1:]:
        acc = (acc << 7) | (b & 0x7F)
        if not b & 0x80:
            out.append(str(acc))
            acc = 0
    return ".".join(out)


# --------------------------------------------------------------- DER write
def _write_len(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    raw = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([0x80 | len(raw)]) + raw


def _tlv(tag: int, value: bytes) -> bytes:
    return bytes([tag]) + _write_len(len(value)) + value


def _enc_int(v: int) -> bytes:
    if v < 0:
        raise DerError("negative INTEGER unsupported")
    raw = v.to_bytes((v.bit_length() + 8) // 8 or 1, "big")
    return _tlv(0x02, raw)


def _enc_seq(*parts: bytes) -> bytes:
    return _tlv(0x30, b"".join(parts))


def _enc_oid(dotted: str) -> bytes:
    nums = [int(x) for x in dotted.split(".")]
    body = bytearray([nums[0] * 40 + nums[1]])
    for n in nums[2:]:
        chunk = bytearray([n & 0x7F])
        n >>= 7
        while n:
            chunk.append(0x80 | (n & 0x7F))
            n >>= 7
        body.extend(reversed(chunk))
    return _tlv(0x06, bytes(body))


# ------------------------------------------------------------------- keys
@dataclass(frozen=True)
class RsaPrivateKey:
    n: int
    e: int
    d: int
    p: int = 0
    q: int = 0
    dp: int = 0
    dq: int = 0
    qinv: int = 0

    @property
    def byte_length(self) -> int:
        return (self.n.bit_length() + 7) // 8

    def public(self) -> "RsaPublicKey":
        return RsaPublicKey(self.n, self.e)


@dataclass(frozen=True)
class RsaPublicKey:
    n: int
    e: int

    @property
    def byte_length(self) -> int:
        return (self.n.bit_length() + 7) // 8


def _pem_body(pem: str, kinds: tuple[str, ...]) -> tuple[str, bytes]:
    lines = [ln.strip() for ln in pem.strip().splitlines()]
    if not lines or not lines[0].startswith("-----BEGIN "):
        raise DerError("not a PEM block")
    kind = lines[0][len("-----BEGIN ") : -len("-----")]
    if kind not in kinds:
        raise DerError(f"unexpected PEM type {kind!r} (want one of {kinds})")
    body = "".join(ln for ln in lines[1:] if not ln.startswith("-----"))
    return kind, base64.b64decode(body)


def _parse_pkcs1_private(der: bytes) -> RsaPrivateKey:
    tag, seq, _ = _read_tlv(der, 0)
    if tag != 0x30:
        raise DerError("PKCS#1 key is not a SEQUENCE")
    ints = []
    for t, v in _iter_sequence(seq):
        if t != 0x02:
            raise DerError(f"unexpected tag {t:#x} in RSAPrivateKey")
        ints.append(_der_int(v))
    if len(ints) < 9:
        raise DerError("RSAPrivateKey needs 9 integers (multi-prime unsupported)")
    version, n, e, d, p, q, dp, dq, qinv = ints[:9]
    if version != 0:
        raise DerError(f"RSAPrivateKey version {version} unsupported")
    return RsaPrivateKey(n, e, d, p, q, dp, dq, qinv)


def parse_pem_private_key(pem: str) -> RsaPrivateKey:
    """PKCS#1 (``RSA PRIVATE KEY``) or PKCS#8 (``PRIVATE KEY``) PEM →
    key.  Encrypted keys are out of scope (raise)."""
    kind, der = _pem_body(pem, ("RSA PRIVATE KEY", "PRIVATE KEY"))
    if kind == "RSA PRIVATE KEY":
        return _parse_pkcs1_private(der)
    tag, seq, _ = _read_tlv(der, 0)
    if tag != 0x30:
        raise DerError("PKCS#8 PrivateKeyInfo is not a SEQUENCE")
    parts = list(_iter_sequence(seq))
    if len(parts) < 3:
        raise DerError("PrivateKeyInfo too short")
    (vt, vv), (at, av), (kt, kv) = parts[:3]
    if vt != 0x02 or _der_int(vv) != 0:
        raise DerError("PrivateKeyInfo version must be 0")
    if at != 0x30:
        raise DerError("missing AlgorithmIdentifier")
    alg = list(_iter_sequence(av))
    if not alg or alg[0][0] != 0x06:
        raise DerError("AlgorithmIdentifier has no OID")
    oid = _decode_oid(alg[0][1])
    if oid != _RSA_OID:
        raise DerError(f"not an RSA key (algorithm {oid})")
    if kt != 0x04:
        raise DerError("privateKey must be an OCTET STRING")
    return _parse_pkcs1_private(kv)


def parse_pem_public_key(pem: str) -> RsaPublicKey:
    """SPKI (``PUBLIC KEY``) or PKCS#1 (``RSA PUBLIC KEY``) PEM → key."""
    kind, der = _pem_body(pem, ("PUBLIC KEY", "RSA PUBLIC KEY"))
    tag, seq, _ = _read_tlv(der, 0)
    if tag != 0x30:
        raise DerError("public key is not a SEQUENCE")
    if kind == "PUBLIC KEY":
        parts = list(_iter_sequence(seq))
        if len(parts) != 2 or parts[0][0] != 0x30 or parts[1][0] != 0x03:
            raise DerError("malformed SubjectPublicKeyInfo")
        alg = list(_iter_sequence(parts[0][1]))
        if not alg or _decode_oid(alg[0][1]) != _RSA_OID:
            raise DerError("not an RSA public key")
        bits = parts[1][1]
        if not bits or bits[0] != 0:
            raise DerError("BIT STRING with unused bits unsupported")
        tag, seq, _ = _read_tlv(bits[1:], 0)
        if tag != 0x30:
            raise DerError("RSAPublicKey is not a SEQUENCE")
    ints = [_der_int(v) for t, v in _iter_sequence(seq) if t == 0x02]
    if len(ints) != 2:
        raise DerError("RSAPublicKey needs exactly n and e")
    return RsaPublicKey(ints[0], ints[1])


def pem_wrap(label: str, der: bytes) -> str:
    """DER → PEM with the standard 64-column base64 body."""
    b64 = base64.b64encode(der).decode()
    lines = [b64[i : i + 64] for i in range(0, len(b64), 64)]
    return (
        f"-----BEGIN {label}-----\n" + "\n".join(lines) + f"\n-----END {label}-----\n"
    )


def spki_der(n: int, e: int) -> bytes:
    """SubjectPublicKeyInfo DER for an RSA public key — shared by the
    public-key PEM writer and the X.509 certificate minter."""
    rsa_pub = _enc_seq(_enc_int(n), _enc_int(e))
    return _enc_seq(
        _enc_seq(_enc_oid(_RSA_OID), _tlv(0x05, b"")),
        _tlv(0x03, b"\x00" + rsa_pub),
    )


def private_key_to_pem(key: RsaPrivateKey, pkcs8: bool = True) -> str:
    body = _enc_seq(
        _enc_int(0), _enc_int(key.n), _enc_int(key.e), _enc_int(key.d),
        _enc_int(key.p), _enc_int(key.q), _enc_int(key.dp), _enc_int(key.dq),
        _enc_int(key.qinv),
    )
    if pkcs8:
        body = _enc_seq(
            _enc_int(0),
            _enc_seq(_enc_oid(_RSA_OID), _tlv(0x05, b"")),  # NULL params
            _tlv(0x04, body),
        )
        return pem_wrap("PRIVATE KEY", body)
    return pem_wrap("RSA PRIVATE KEY", body)


def public_key_to_pem(key: RsaPublicKey) -> str:
    return pem_wrap("PUBLIC KEY", spki_der(key.n, key.e))


# -------------------------------------------------------- sign and verify
# DigestInfo prefix for SHA-256 (RFC 8017 §9.2 note 1)
_SHA256_PREFIX = bytes.fromhex("3031300d060960864801650304020105000420")


def _emsa_pkcs1_v15(message: bytes, em_len: int) -> bytes:
    t = _SHA256_PREFIX + hashlib.sha256(message).digest()
    if em_len < len(t) + 11:
        raise ValueError("RSA modulus too small for SHA-256 PKCS#1 v1.5")
    return b"\x00\x01" + b"\xff" * (em_len - len(t) - 3) + b"\x00" + t


def rs256_sign(message: bytes, key: RsaPrivateKey) -> bytes:
    em = _emsa_pkcs1_v15(message, key.byte_length)
    m = int.from_bytes(em, "big")
    if key.p and key.q and key.dp and key.dq and key.qinv:
        # CRT: two half-size modexps (~4x faster than pow(m, d, n))
        m1 = pow(m % key.p, key.dp, key.p)
        m2 = pow(m % key.q, key.dq, key.q)
        h = ((m1 - m2) * key.qinv) % key.p
        s = m2 + h * key.q
    else:
        s = pow(m, key.d, key.n)
    return s.to_bytes(key.byte_length, "big")


def rs256_verify(message: bytes, signature: bytes, key: RsaPublicKey) -> bool:
    if len(signature) != key.byte_length:
        return False
    em = pow(int.from_bytes(signature, "big"), key.e, key.n).to_bytes(
        key.byte_length, "big"
    )
    return em == _emsa_pkcs1_v15(message, key.byte_length)


# ------------------------------------------------------------------- JWT
def _b64url(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode()


def jwt_encode_rs256(
    claims: dict, key: RsaPrivateKey, header_extra: dict | None = None
) -> str:
    """Compact JWS: ``base64url(header).base64url(claims).base64url(sig)``."""
    header = {"alg": "RS256", "typ": "JWT", **(header_extra or {})}
    signing_input = (
        _b64url(json.dumps(header, separators=(",", ":")).encode())
        + "."
        + _b64url(json.dumps(claims, separators=(",", ":")).encode())
    ).encode("ascii")
    return signing_input.decode() + "." + _b64url(rs256_sign(signing_input, key))


def jwt_decode_unverified(token: str) -> tuple[dict, dict, bytes, bytes]:
    """(header, claims, signing_input, signature) without verification —
    the verifying side pairs it with :func:`rs256_verify`."""
    parts = token.split(".")
    if len(parts) != 3:
        raise ValueError("not a compact JWS")
    pad = lambda s: s + "=" * (-len(s) % 4)
    header = json.loads(base64.urlsafe_b64decode(pad(parts[0])))
    claims = json.loads(base64.urlsafe_b64decode(pad(parts[1])))
    sig = base64.urlsafe_b64decode(pad(parts[2]))
    return header, claims, (parts[0] + "." + parts[1]).encode("ascii"), sig


# ------------------------------------------------------------ key generation
def _is_probable_prime(n: int, rng, rounds: int = 40) -> bool:
    if n < 2:
        return False
    for sp in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % sp == 0:
            return n == sp
    d, r = n - 1, 0
    while d % 2 == 0:
        d //= 2
        r += 1
    for _ in range(rounds):
        a = rng.randrange(2, n - 1)
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(r - 1):
            x = pow(x, 2, n)
            if x == n - 1:
                break
        else:
            return False
    return True


def _gen_prime(bits: int, rng) -> int:
    while True:
        cand = rng.getrandbits(bits) | (1 << (bits - 1)) | 1
        if _is_probable_prime(cand, rng):
            return cand


def generate_rsa_key(bits: int = 2048, rng=None) -> RsaPrivateKey:
    """Test-fixture RSA keypair (deterministic given a seeded ``rng``).

    For minting fixtures and local fake-server credentials — production
    keys come from the service provider (e.g. a downloaded service-account
    JSON), not from here.
    """
    import random as _random

    rng = rng if rng is not None else _random.SystemRandom()
    e = 65537
    while True:
        p = _gen_prime(bits // 2, rng)
        q = _gen_prime(bits - bits // 2, rng)
        if p == q:
            continue
        if p < q:
            p, q = q, p
        phi = (p - 1) * (q - 1)
        if phi % e == 0:
            continue
        n = p * q
        if n.bit_length() != bits:
            continue
        d = pow(e, -1, phi)
        return RsaPrivateKey(
            n=n, e=e, d=d, p=p, q=q,
            dp=d % (p - 1), dq=d % (q - 1), qinv=pow(q, -1, p),
        )


# ----------------------------------------------------- RFC 7523 assertion
def jwt_bearer_assertion(
    key: RsaPrivateKey,
    issuer: str,
    audience: str,
    scope: str | None = None,
    subject: str | None = None,
    lifetime: int = 3600,
    now: float | None = None,
    extra_claims: dict | None = None,
    key_id: str | None = None,
) -> str:
    """The signed JWT a JWT-bearer grant posts as ``assertion`` —
    the Google service-account / Salesforce shape: ``iss`` = client email
    / client id, ``aud`` = token endpoint, ``iat``/``exp`` window, and
    ``scope`` (Google) or ``sub`` (Salesforce impersonation)."""
    iat = int(now if now is not None else time.time())
    claims = {"iss": issuer, "aud": audience, "iat": iat, "exp": iat + int(lifetime)}
    if scope:
        claims["scope"] = scope
    if subject:
        claims["sub"] = subject
    claims.update(extra_claims or {})
    header = {"kid": key_id} if key_id else None
    return jwt_encode_rs256(claims, key, header)
