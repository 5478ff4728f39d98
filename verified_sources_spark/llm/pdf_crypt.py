"""PDF standard security handler — the EMPTY-user-password case.

A large share of "encrypted" PDFs in any document corpus are
owner-password-only: the user password is empty, every conforming
reader opens them silently, and refusing them would drop real
documents for no reason.  This module serves exactly that share:

- Key derivation + /U validation for the standard handler revisions
  R2 (RC4-40), R3 (RC4-128), R4 (/CF with V2=RC4 or AESV2=AES-128-CBC)
  and R5/R6 (AES-256, the 2.B hardened hash) — Algorithms 2, 2.A,
  2.B, 4 and 5 of the PDF spec, public constants only.
- ``decrypt_bytes`` for per-object string/stream payloads: RC4 keys
  are md5(file key + objnum + gen [+ sAlT]); AES payloads carry a
  16-byte IV prefix and PKCS#7 padding.
- A fixture ENCRYPTION side (``build_encryption``) so tests and the
  oracle entry mint real encrypted files — the two-sided method.

RC4 is 15 lines of stdlib.  AES rides the ``cryptography`` package
behind a capability gate (absent → the named refusal, same posture as
the libzstd/libwebp seams); the gate test pins the FIPS-197 vectors.
A NON-empty user password is unknowable: ``derive_key`` raises with
"password-protected" in the message, and the PDF front door keeps
refusing those by name.
"""

from __future__ import annotations

import hashlib
import struct

__all__ = ["PdfCryptError", "rc4", "derive_key", "decrypt_bytes",
           "build_encryption", "aes_available"]

_PAD = bytes([
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
])


class PdfCryptError(ValueError):
    """Named refusal: an encryption shape this handler can't serve."""


def rc4(key: bytes, data: bytes) -> bytes:
    s = list(range(256))
    j = 0
    for i in range(256):
        j = (j + s[i] + key[i % len(key)]) & 0xFF
        s[i], s[j] = s[j], s[i]
    out = bytearray(len(data))
    i = j = 0
    for k, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + s[i]) & 0xFF
        s[i], s[j] = s[j], s[i]
        out[k] = b ^ s[(s[i] + s[j]) & 0xFF]
    return bytes(out)


def aes_available() -> bool:
    try:
        from cryptography.hazmat.primitives.ciphers import (  # noqa: F401
            Cipher,
        )
        return True
    except ImportError:
        return False


def _aes_cbc(key: bytes, iv: bytes, data: bytes, encrypt: bool) -> bytes:
    if not aes_available():
        raise PdfCryptError(
            "AES-encrypted PDF — cryptography package not present; "
            "refusing by name")
    from cryptography.hazmat.primitives.ciphers import (
        Cipher, algorithms, modes,
    )

    c = Cipher(algorithms.AES(key), modes.CBC(iv))
    op = c.encryptor() if encrypt else c.decryptor()
    return op.update(data) + op.finalize()


def _hash_2b(pw: bytes, salt: bytes, udata: bytes) -> bytes:
    """Algorithm 2.B (R6 hardened hash)."""
    k = hashlib.sha256(pw + salt + udata).digest()
    i = 0
    while True:
        k1 = (pw + k + udata) * 64
        e = _aes_cbc(k[:16], k[16:32], k1, encrypt=True)
        mod = sum(e[:16]) % 3
        k = (hashlib.sha256, hashlib.sha384, hashlib.sha512)[mod](e).digest()
        i += 1
        if i >= 64 and e[-1] <= i - 32:
            return k[:32]


def _r34_key(o: bytes, p: int, id0: bytes, r: int, nbytes: int) -> bytes:
    h = hashlib.md5(_PAD + o[:32] + struct.pack("<i", p) + id0)
    if r >= 4:
        # EncryptMetadata false would append ffffffff; fixtures and the
        # common case encrypt metadata, so nothing is appended here
        pass
    key = h.digest()
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key[:nbytes]).digest()
    return key[:nbytes]


def derive_key(enc: dict, id0: bytes, resolve) -> tuple[bytes, str]:
    """(file_key, method) for an /Encrypt dict with an EMPTY user
    password; ``method`` is 'rc4' / 'aesv2' / 'aesv3' / 'identity'.
    Raises :class:`PdfCryptError` naming the shape otherwise."""
    def name(v):
        v = resolve(v)
        return v[1] if isinstance(v, tuple) else v

    if name(enc.get("Filter")) != "Standard":
        raise PdfCryptError(
            f"/Encrypt with non-standard security handler "
            f"/{name(enc.get('Filter'))} — refusing by name")
    v = int(resolve(enc.get("V", 0)))
    r = int(resolve(enc.get("R", 2)))
    o = resolve(enc.get("O"))
    u = resolve(enc.get("U"))
    p = int(resolve(enc.get("P", -1)))
    if p >= 1 << 31:
        p -= 1 << 32
    if not isinstance(o, bytes) or not isinstance(u, bytes):
        raise PdfCryptError("malformed /Encrypt (missing O/U strings)")

    if v == 5 and r in (5, 6):
        if len(u) < 48:
            raise PdfCryptError("malformed R5/R6 /U entry")
        vsalt, ksalt = u[32:40], u[40:48]
        if r == 6:
            check = _hash_2b(b"", vsalt, b"")
        else:
            check = hashlib.sha256(b"" + vsalt).digest()
        if check != u[:32]:
            raise PdfCryptError(
                "password-protected PDF (non-empty user password) "
                "— refusing by name")
        ue = resolve(enc.get("UE"))
        if not isinstance(ue, bytes) or len(ue) != 32:
            raise PdfCryptError("malformed R5/R6 /UE entry")
        ikey = (_hash_2b(b"", ksalt, b"") if r == 6
                else hashlib.sha256(b"" + ksalt).digest())
        file_key = _aes_cbc(ikey, bytes(16), ue, encrypt=False)
        return file_key, "aesv3"

    if v in (1, 2, 4) and r in (2, 3, 4):
        nbytes = int(resolve(enc.get("Length", 40))) // 8 if v != 1 else 5
        if r == 2:
            nbytes = 5
        key = _r34_key(o, p, id0, r, nbytes)
        # validate the empty user password against /U (Algorithms 4/5)
        if r == 2:
            ok = rc4(key, _PAD) == u[:32]
        else:
            h = hashlib.md5(_PAD + id0).digest()
            x = rc4(key, h)
            for i in range(1, 20):
                x = rc4(bytes(b ^ i for b in key), x)
            ok = x == u[:16]
        if not ok:
            raise PdfCryptError(
                "password-protected PDF (non-empty user password) "
                "— refusing by name")
        method = "rc4"
        if v == 4:
            cf = resolve(enc.get("CF")) or {}
            stdcf = resolve(cf.get("StdCF")) if isinstance(cf, dict) else {}
            cfm = name((stdcf or {}).get("CFM")) if stdcf else None
            stmf = name(enc.get("StmF", ("name", "Identity")))
            if stmf == "Identity":
                method = "identity"
            elif cfm == "AESV2":
                method = "aesv2"
            elif cfm == "V2":
                method = "rc4"
            else:
                raise PdfCryptError(
                    f"crypt filter /{cfm} — refusing by name")
        return key, method

    raise PdfCryptError(
        f"encryption V={v} R={r} — refusing by name")


def _object_key(file_key: bytes, num: int, gen: int, aes: bool) -> bytes:
    h = hashlib.md5(file_key + struct.pack("<I", num)[:3]
                    + struct.pack("<I", gen)[:2]
                    + (b"sAlT" if aes else b""))
    return h.digest()[: min(len(file_key) + 5, 16)]


def decrypt_bytes(file_key: bytes, method: str, num: int, gen: int,
                  data: bytes) -> bytes:
    if method == "identity":
        return data
    if method == "rc4":
        return rc4(_object_key(file_key, num, gen, aes=False), data)
    if method == "aesv2":
        key = _object_key(file_key, num, gen, aes=True)
    elif method == "aesv3":
        key = file_key
    else:
        raise PdfCryptError(f"unknown crypt method {method!r}")
    if len(data) < 32 or len(data) % 16:
        raise PdfCryptError("malformed AES payload (IV + padded blocks)")
    out = _aes_cbc(key, data[:16], data[16:], encrypt=False)
    pad = out[-1]
    if not 1 <= pad <= 16:
        raise PdfCryptError("bad AES padding in encrypted object")
    return out[:-pad]


def encrypt_bytes(file_key: bytes, method: str, num: int, gen: int,
                  data: bytes, iv: bytes | None = None) -> bytes:
    """Fixture-side inverse of :func:`decrypt_bytes`."""
    if method == "identity":
        return data
    if method == "rc4":
        return rc4(_object_key(file_key, num, gen, aes=False), data)
    key = (file_key if method == "aesv3"
           else _object_key(file_key, num, gen, aes=True))
    iv = iv if iv is not None else hashlib.md5(
        struct.pack("<II", num, gen) + b"fixture-iv").digest()[:16]
    pad = 16 - len(data) % 16
    return iv + _aes_cbc(key, iv, data + bytes([pad]) * pad, encrypt=True)


def build_encryption(mode: str, id0: bytes) -> tuple[dict, bytes, str]:
    """Fixture /Encrypt parameters for an empty-user/empty-owner-
    password file: returns (encrypt dict entries as a raw-PDF string
    mapping, file_key, method).  ``mode``: 'rc4-40' (R2), 'rc4-128'
    (R3), 'aesv2' (R4), 'aes256' (R6)."""
    import os

    if mode in ("rc4-40", "rc4-128"):
        r = 2 if mode == "rc4-40" else 3
        nbytes = 5 if r == 2 else 16
        p = -44
        # Algorithm 3: /O from the (empty) owner password
        okey = hashlib.md5(_PAD).digest()
        if r >= 3:
            for _ in range(50):
                okey = hashlib.md5(okey).digest()
        okey = okey[:nbytes]
        o = rc4(okey, _PAD)
        if r >= 3:
            for i in range(1, 20):
                o = rc4(bytes(b ^ i for b in okey), o)
        key = _r34_key(o, p, id0, r, nbytes)
        if r == 2:
            u = rc4(key, _PAD)
        else:
            x = rc4(key, hashlib.md5(_PAD + id0).digest())
            for i in range(1, 20):
                x = rc4(bytes(b ^ i for b in key), x)
            u = x + bytes(16)
        ent = {"V": "1" if r == 2 else "2", "R": str(r),
               "Length": str(nbytes * 8), "P": str(p),
               "O": o.hex(), "U": u.hex()}
        return ent, key, "rc4"
    if mode == "aesv2":
        r, nbytes, p = 4, 16, -44
        okey = hashlib.md5(_PAD).digest()
        for _ in range(50):
            okey = hashlib.md5(okey).digest()
        o = rc4(okey[:nbytes], _PAD)
        for i in range(1, 20):
            o = rc4(bytes(b ^ i for b in okey[:nbytes]), o)
        key = _r34_key(o, p, id0, r, nbytes)
        x = rc4(key, hashlib.md5(_PAD + id0).digest())
        for i in range(1, 20):
            x = rc4(bytes(b ^ i for b in key), x)
        u = x + bytes(16)
        ent = {"V": "4", "R": "4", "Length": "128", "P": str(p),
               "O": o.hex(), "U": u.hex(),
               "CF": "<< /StdCF << /CFM /AESV2 /AuthEvent /DocOpen >> >>",
               "StmF": "/StdCF", "StrF": "/StdCF"}
        return ent, key, "aesv2"
    if mode == "aes256":
        file_key = os.urandom(32) if False else hashlib.sha256(
            b"fixture-file-key" + id0).digest()
        u_vsalt = hashlib.md5(id0 + b"uv").digest()[:8]
        u_ksalt = hashlib.md5(id0 + b"uk").digest()[:8]
        u = _hash_2b(b"", u_vsalt, b"") + u_vsalt + u_ksalt
        ue = _aes_cbc(_hash_2b(b"", u_ksalt, b""), bytes(16), file_key,
                      encrypt=True)
        o_vsalt = hashlib.md5(id0 + b"ov").digest()[:8]
        o_ksalt = hashlib.md5(id0 + b"ok").digest()[:8]
        o = _hash_2b(b"", o_vsalt, u) + o_vsalt + o_ksalt
        oe = _aes_cbc(_hash_2b(b"", o_ksalt, u), bytes(16), file_key,
                      encrypt=True)
        perms = _aes_cbc(file_key, bytes(16),
                         struct.pack("<i", -44) + b"\xff\xff\xff\xffTadb"
                         + bytes(4), encrypt=True)[:16]
        ent = {"V": "5", "R": "6", "Length": "256", "P": "-44",
               "O": o.hex(), "U": u.hex(), "OE": oe.hex(),
               "UE": ue.hex(), "Perms": perms.hex(),
               "CF": "<< /StdCF << /CFM /AESV3 /AuthEvent /DocOpen >> >>",
               "StmF": "/StdCF", "StrF": "/StdCF"}
        return ent, file_key, "aesv3"
    raise PdfCryptError(f"unknown fixture encryption mode {mode!r}")
