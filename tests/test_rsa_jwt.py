"""RS256 / JWT-bearer grant (sources/rsa_jwt.py + oauth.JwtBearerProvider).

The signer is cross-validated against the REFERENCE implementation on
Spark's classpath: java.security's ``SHA256withRSA`` verifies our
signatures and our verifier checks Java-produced signatures — an
independent implementation on both sides, not our code reading its own
bytes (same strategy as the Avro codec tests).
"""

from __future__ import annotations

import json
import random

import pytest

from verified_sources_spark.sources.oauth import JwtBearerProvider
from verified_sources_spark.sources.rsa_jwt import (
    DerError,
    RsaPrivateKey,
    generate_rsa_key,
    jwt_bearer_assertion,
    jwt_decode_unverified,
    jwt_encode_rs256,
    parse_pem_private_key,
    parse_pem_public_key,
    private_key_to_pem,
    public_key_to_pem,
    rs256_sign,
    rs256_verify,
)


@pytest.fixture(scope="module")
def key():
    # deterministic fixture key: seeded rng, 1024-bit (fast; size is not
    # under test — the DER/signing logic is bit-length independent)
    return generate_rsa_key(1024, rng=random.Random(20240814))


def test_pem_roundtrip_pkcs8_and_pkcs1(key):
    for pkcs8 in (True, False):
        pem = private_key_to_pem(key, pkcs8=pkcs8)
        back = parse_pem_private_key(pem)
        assert back == key
    pub = parse_pem_public_key(public_key_to_pem(key.public()))
    assert (pub.n, pub.e) == (key.n, key.e)


def test_pem_rejects_wrong_block_type(key):
    with pytest.raises(DerError, match="unexpected PEM type"):
        parse_pem_private_key(public_key_to_pem(key.public()))
    with pytest.raises(DerError):
        parse_pem_private_key("not pem at all")


def test_sign_verify_and_tamper(key):
    msg = b"payload under test"
    sig = rs256_sign(msg, key)
    assert rs256_verify(msg, sig, key.public())
    assert not rs256_verify(msg + b"x", sig, key.public())
    assert not rs256_verify(msg, sig[:-1] + bytes([sig[-1] ^ 1]), key.public())


def test_crt_matches_plain_exponentiation(key):
    msg = b"crt equivalence"
    no_crt = RsaPrivateKey(n=key.n, e=key.e, d=key.d)
    assert rs256_sign(msg, key) == rs256_sign(msg, no_crt)


def test_cross_validate_against_jvm_security(spark, key):
    """Ours → Java verify, Java sign → ours verify."""
    jvm = spark.sparkContext._jvm
    kf = jvm.java.security.KeyFactory.getInstance("RSA")

    import base64

    pkcs8_der = base64.b64decode(
        "".join(
            ln for ln in private_key_to_pem(key, pkcs8=True).splitlines()
            if not ln.startswith("-----")
        )
    )
    x509_der = base64.b64decode(
        "".join(
            ln for ln in public_key_to_pem(key.public()).splitlines()
            if not ln.startswith("-----")
        )
    )
    jpriv = kf.generatePrivate(
        jvm.java.security.spec.PKCS8EncodedKeySpec(bytearray(pkcs8_der))
    )
    jpub = kf.generatePublic(
        jvm.java.security.spec.X509EncodedKeySpec(bytearray(x509_der))
    )

    msg = b"interop message"
    # ours -> Java
    ver = jvm.java.security.Signature.getInstance("SHA256withRSA")
    ver.initVerify(jpub)
    ver.update(bytearray(msg))
    assert ver.verify(bytearray(rs256_sign(msg, key)))
    # Java -> ours
    sig = jvm.java.security.Signature.getInstance("SHA256withRSA")
    sig.initSign(jpriv)
    sig.update(bytearray(msg))
    jsig = bytes(sig.sign())
    assert rs256_verify(msg, jsig, key.public())


def test_jwt_encode_decode(key):
    tok = jwt_encode_rs256({"iss": "me", "aud": "you"}, key, {"kid": "k1"})
    header, claims, signing_input, sig = jwt_decode_unverified(tok)
    assert header == {"alg": "RS256", "typ": "JWT", "kid": "k1"}
    assert claims == {"iss": "me", "aud": "you"}
    assert rs256_verify(signing_input, sig, key.public())
    assert "=" not in tok  # base64url without padding


def test_assertion_claims(key):
    tok = jwt_bearer_assertion(
        key, issuer="svc@proj", audience="https://tok", scope="s1 s2",
        subject="user@x", lifetime=120, now=1_000_000.0,
    )
    _, claims, signing_input, sig = jwt_decode_unverified(tok)
    assert claims == {
        "iss": "svc@proj", "aud": "https://tok", "iat": 1_000_000,
        "exp": 1_000_120, "scope": "s1 s2", "sub": "user@x",
    }
    assert rs256_verify(signing_input, sig, key.public())


def test_jwt_bearer_provider_fresh_assertion_per_refresh(key):
    """The provider posts the RFC 7523 grant with a freshly signed
    assertion each acquisition; the fake endpoint VERIFIES the signature
    and claims before minting, and proactive expiry forces a second
    acquisition whose assertion differs (new iat) yet still verifies."""
    pub = key.public()
    minted, now = [], [1000.0]
    wall = [5_000_000.0]

    def post(url, form):
        assert url == "https://issuer/token"
        assert form["grant_type"].endswith(":jwt-bearer")
        header, claims, signing_input, sig = jwt_decode_unverified(form["assertion"])
        assert header["alg"] == "RS256"
        if not rs256_verify(signing_input, sig, pub):
            return 401, {"error": "bad signature"}
        if claims["iss"] != "svc@proj" or claims["aud"] != "https://issuer/token":
            return 401, {"error": "bad claims"}
        assert claims["exp"] - claims["iat"] == 600
        minted.append(form["assertion"])
        return 200, {"access_token": f"t{len(minted)}", "expires_in": 60}

    prov = JwtBearerProvider(
        "https://issuer/token", issuer="svc@proj",
        private_key_pem=private_key_to_pem(key),
        scope="sheets.readonly", assertion_lifetime=600,
        post=post, clock=lambda: now[0], wall_clock=lambda: wall[0],
    )
    assert prov.authorization() == "Bearer t1"
    assert prov.authorization() == "Bearer t1"  # cached, no new grant
    now[0] += 120  # past expires_in(60) - skew(30)
    wall[0] += 120
    assert prov.authorization() == "Bearer t2"
    assert len(minted) == 2 and minted[0] != minted[1]
    c1 = jwt_decode_unverified(minted[0])[1]
    c2 = jwt_decode_unverified(minted[1])[1]
    assert c2["iat"] - c1["iat"] == 120
    assert c1["scope"] == "sheets.readonly"


# ---------------------------------------------------------------- properties
from hypothesis import given, settings, strategies as st

from verified_sources_spark.sources.rsa_jwt import _enc_int, _read_tlv, _der_int


@given(st.integers(min_value=0, max_value=2**4096))
@settings(max_examples=200, deadline=None)
def test_der_integer_roundtrip(v):
    der = _enc_int(v)
    tag, raw, end = _read_tlv(der, 0)
    assert tag == 0x02 and end == len(der)
    assert _der_int(raw) == v
    # DER minimal-encoding invariants: no redundant leading 0x00 unless
    # needed for the sign bit
    if len(raw) > 1 and raw[0] == 0:
        assert raw[1] & 0x80


@given(st.dictionaries(
    st.text(min_size=1, max_size=8),
    st.one_of(st.text(max_size=16), st.integers(-2**31, 2**31), st.booleans()),
    max_size=6,
))
@settings(max_examples=100, deadline=None)
def test_jwt_claims_roundtrip(key, claims):
    tok = jwt_encode_rs256(claims, key)
    header, got, signing_input, sig = jwt_decode_unverified(tok)
    assert got == claims
    assert rs256_verify(signing_input, sig, key.public())


@given(st.binary(max_size=64))
@settings(max_examples=100, deadline=None)
def test_tlv_reader_never_overreads(junk):
    try:
        tag, raw, end = _read_tlv(junk, 0)
        assert end <= len(junk)
        assert len(raw) <= len(junk)
    except Exception as e:
        from verified_sources_spark.sources.rsa_jwt import DerError
        assert isinstance(e, DerError)
