"""Wire-auth crypto pinned to published vectors: SCRAM (RFC 5802/7677)
and AWS SigV4 (the AWS documentation's reference request)."""

from __future__ import annotations

import datetime as dt

import pytest

from verified_sources_spark.sources.scram import ScramClient, ScramError, ScramServer
from verified_sources_spark.sources.sigv4 import sign_request, sigv4_signer


def test_scram_sha256_rfc7677_vector():
    """The complete RFC 7677 §3 example exchange, byte-for-byte."""
    c = ScramClient("SCRAM-SHA-256", "user", "pencil", nonce="rOprNGfwEbeRWgbNEkqO")
    assert c.client_first() == b"n,,n=user,r=rOprNGfwEbeRWgbNEkqO"
    server_first = (
        b"r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,"
        b"s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"
    )
    assert c.client_final(server_first) == (
        b"c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,"
        b"p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ="
    )
    c.verify_server_final(b"v=6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=")


def test_scram_mutual_auth_and_tamper_detection():
    for mech in ("SCRAM-SHA-256", "SCRAM-SHA-512"):
        c = ScramClient(mech, "alice", "s3cret")
        s = ScramServer(mech, "alice", "s3cret")
        final = s.handle_client_final(c.client_final(s.handle_client_first(c.client_first())))
        c.verify_server_final(final)

    # wrong password: server rejects the proof
    s = ScramServer("SCRAM-SHA-256", "alice", "s3cret")
    bad = ScramClient("SCRAM-SHA-256", "alice", "wrong")
    with pytest.raises(ScramError, match="proof invalid"):
        s.handle_client_final(bad.client_final(s.handle_client_first(bad.client_first())))

    # forged server signature: client catches the impostor (mutual auth)
    c = ScramClient("SCRAM-SHA-256", "alice", "s3cret")
    s = ScramServer("SCRAM-SHA-256", "alice", "s3cret")
    s.handle_client_final(c.client_final(s.handle_client_first(c.client_first())))
    with pytest.raises(ScramError, match="signature mismatch"):
        c.verify_server_final(b"v=AAAA")

    # a server that does not extend the client nonce is replaying
    c = ScramClient("SCRAM-SHA-256", "alice", "s3cret", nonce="abc")
    with pytest.raises(ScramError, match="nonce"):
        c.client_final(b"r=zzz,s=c2FsdA==,i=4096")


def test_sigv4_aws_documentation_vector():
    """GET ListUsers against IAM — the reference request from the AWS
    SigV4 documentation, with its published signature."""
    hdrs = sign_request(
        "GET",
        "https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08",
        {"content-type": "application/x-www-form-urlencoded; charset=utf-8"},
        b"",
        "AKIDEXAMPLE",
        "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
        "us-east-1",
        "iam",
        "20150830T123600Z",
    )
    assert hdrs["Authorization"] == (
        "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/iam/"
        "aws4_request, SignedHeaders=content-type;host;x-amz-date, Signature="
        "5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7"
    )


def test_sigv4_signer_hook_shape():
    """The KinesisClient hook: mutates headers in place, deterministic
    under an injected clock, session token included when present."""
    clock = lambda: dt.datetime(2015, 8, 30, 12, 36, 0, tzinfo=dt.timezone.utc)
    sign = sigv4_signer(
        "https://kinesis.us-east-1.amazonaws.com",
        "AKIDEXAMPLE",
        "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
        "us-east-1",
        session_token="THETOKEN",
        clock=clock,
    )
    h1 = {"Content-Type": "application/x-amz-json-1.1", "X-Amz-Target": "Kinesis_20131202.ListShards"}
    h2 = dict(h1)
    sign(h1, b"{}")
    sign(h2, b"{}")
    assert h1 == h2  # deterministic
    assert h1["x-amz-date"] == "20150830T123600Z"
    assert h1["x-amz-security-token"] == "THETOKEN"
    assert "x-amz-security-token" in h1["Authorization"]  # token is signed
    assert h1["Authorization"].startswith("AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/kinesis/aws4_request")
    # body is part of the signature
    h3 = dict(h1)
    del h3["Authorization"]
    h3.pop("host", None)
    h3 = {"Content-Type": h3["Content-Type"], "X-Amz-Target": h3["X-Amz-Target"]}
    sign(h3, b'{"StreamName": "s"}')
    assert h3["Authorization"] != h1["Authorization"]
