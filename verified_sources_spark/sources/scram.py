"""SCRAM-SHA-256/-512 SASL (RFC 5802 / RFC 7677), pure hashlib+hmac.

One implementation of the challenge-response math serves every wire
client that needs it: the Kafka binary client (SaslHandshake +
SaslAuthenticate, reference sources/kafka/helpers.py:240-262 builds the
same mechanism from credentials) and the walsender client
(AuthenticationSASL, PostgreSQL message flow).  The server role lives
here too so the in-process protocol test servers verify real proofs
instead of waving byte blobs through.

Scope notes:

- Channel binding: ``n,,`` (none) — the non-PLUS mechanisms.  TLS is
  handled at the socket layer by the callers; SCRAM-*-PLUS would need
  the TLS channel-binding export, which stdlib ``ssl`` does not expose.
- SASLprep (RFC 4013) is not in the stdlib; usernames/passwords pass
  through UTF-8 unprepared, exact for the ASCII credentials that are the
  practical norm.  Non-ASCII credentials needing prep should be prepped
  by the caller.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import secrets


class ScramError(RuntimeError):
    pass


_HASHES = {"SCRAM-SHA-256": hashlib.sha256, "SCRAM-SHA-512": hashlib.sha512}


def _saslname(name: str) -> str:
    """RFC 5802 username escaping: '=' and ',' are the metacharacters."""
    return name.replace("=", "=3D").replace(",", "=2C")


def _parse_attrs(msg: bytes) -> dict[str, str]:
    out: dict[str, str] = {}
    for part in msg.decode("utf-8").split(","):
        if len(part) >= 2 and part[1] == "=":
            out[part[0]] = part[2:]
    return out


def _hi(hash_fn, password: bytes, salt: bytes, iterations: int) -> bytes:
    """Hi() == PBKDF2-HMAC (RFC 5802 §2.2)."""
    return hashlib.pbkdf2_hmac(hash_fn().name, password, salt, iterations)


def _hmac(hash_fn, key: bytes, msg: bytes) -> bytes:
    return hmac.new(key, msg, hash_fn).digest()


class ScramClient:
    """Client side of one SCRAM exchange.

    Drive it: ``client_first()`` → (server-first) → ``client_final(...)``
    → (server-final) → ``verify_server_final(...)``.  The server-final
    check matters: it is the mutual-auth half (proves the server actually
    knows the credential derivative, not just that it let us in).
    """

    def __init__(
        self,
        mechanism: str,
        username: str,
        password: str,
        nonce: str | None = None,
    ):
        if mechanism not in _HASHES:
            raise ScramError(f"unsupported mechanism {mechanism!r}")
        self.mechanism = mechanism
        self._hash = _HASHES[mechanism]
        self.username = username
        self.password = password
        self._cnonce = nonce or base64.b64encode(secrets.token_bytes(18)).decode()
        self._gs2 = "n,,"
        self._client_first_bare = f"n={_saslname(username)},r={self._cnonce}"
        self._server_first: bytes | None = None
        self._auth_message: bytes | None = None
        self._salted: bytes | None = None

    def client_first(self) -> bytes:
        return (self._gs2 + self._client_first_bare).encode("utf-8")

    def client_final(self, server_first: bytes) -> bytes:
        attrs = _parse_attrs(server_first)
        try:
            nonce, salt_b64, iters = attrs["r"], attrs["s"], int(attrs["i"])
        except KeyError as e:
            raise ScramError(f"server-first missing {e}") from e
        if not nonce.startswith(self._cnonce):
            raise ScramError("server nonce does not extend client nonce")
        self._server_first = server_first
        self._salted = _hi(
            self._hash,
            self.password.encode("utf-8"),
            base64.b64decode(salt_b64),
            iters,
        )
        client_key = _hmac(self._hash, self._salted, b"Client Key")
        stored_key = self._hash(client_key).digest()
        without_proof = f"c={base64.b64encode(self._gs2.encode()).decode()},r={nonce}"
        self._auth_message = b",".join(
            [self._client_first_bare.encode(), server_first, without_proof.encode()]
        )
        signature = _hmac(self._hash, stored_key, self._auth_message)
        proof = bytes(a ^ b for a, b in zip(client_key, signature))
        return f"{without_proof},p={base64.b64encode(proof).decode()}".encode()

    def verify_server_final(self, server_final: bytes) -> None:
        attrs = _parse_attrs(server_final)
        if "e" in attrs:
            raise ScramError(f"server rejected authentication: {attrs['e']}")
        if self._salted is None or self._auth_message is None:
            raise ScramError("client_final must run before verify_server_final")
        server_key = _hmac(self._hash, self._salted, b"Server Key")
        expected = _hmac(self._hash, server_key, self._auth_message)
        got = base64.b64decode(attrs.get("v", ""))
        if not hmac.compare_digest(expected, got):
            raise ScramError("server signature mismatch (not mutual-auth)")


class ScramServer:
    """Server side, for the embedded protocol test servers.

    Verifies a real client proof against (username, password) and emits a
    real server signature — the handshake-byte tests exercise the same
    math an actual broker/postgres does, not a stub that accepts
    anything.
    """

    def __init__(
        self,
        mechanism: str,
        username: str,
        password: str,
        salt: bytes | None = None,
        iterations: int = 4096,
        snonce: str | None = None,
    ):
        if mechanism not in _HASHES:
            raise ScramError(f"unsupported mechanism {mechanism!r}")
        self._hash = _HASHES[mechanism]
        self.username = username
        self.password = password
        self.salt = salt if salt is not None else secrets.token_bytes(16)
        self.iterations = iterations
        self._snonce = snonce or base64.b64encode(secrets.token_bytes(18)).decode()
        self._client_first_bare: bytes | None = None
        self._full_nonce: str | None = None
        self._server_first: bytes | None = None

    def handle_client_first(self, client_first: bytes) -> bytes:
        if not client_first.startswith(b"n,,"):
            raise ScramError("only the n,, GS2 header is supported")
        self._client_first_bare = client_first[3:]
        attrs = _parse_attrs(self._client_first_bare)
        if attrs.get("n") != _saslname(self.username):
            raise ScramError(f"unknown user {attrs.get('n')!r}")
        self._full_nonce = attrs["r"] + self._snonce
        self._server_first = (
            f"r={self._full_nonce},"
            f"s={base64.b64encode(self.salt).decode()},"
            f"i={self.iterations}"
        ).encode()
        return self._server_first

    def handle_client_final(self, client_final: bytes) -> bytes:
        if self._server_first is None or self._client_first_bare is None:
            raise ScramError("client-first must be handled first")
        attrs = _parse_attrs(client_final)
        if attrs.get("r") != self._full_nonce:
            raise ScramError("nonce mismatch")
        without_proof = client_final[: client_final.rindex(b",p=")]
        auth_message = b",".join(
            [self._client_first_bare, self._server_first, without_proof]
        )
        salted = _hi(
            self._hash, self.password.encode("utf-8"), self.salt, self.iterations
        )
        client_key = _hmac(self._hash, salted, b"Client Key")
        stored_key = self._hash(client_key).digest()
        signature = _hmac(self._hash, stored_key, auth_message)
        proof = base64.b64decode(attrs.get("p", ""))
        recovered_key = bytes(a ^ b for a, b in zip(signature, proof))
        if not hmac.compare_digest(self._hash(recovered_key).digest(), stored_key):
            raise ScramError("client proof invalid")
        server_key = _hmac(self._hash, salted, b"Server Key")
        server_sig = _hmac(self._hash, server_key, auth_message)
        return b"v=" + base64.b64encode(server_sig)
