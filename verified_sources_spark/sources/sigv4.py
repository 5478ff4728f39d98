"""AWS Signature Version 4 request signing, pure hashlib+hmac+urllib.

The Kinesis wire client (``sources/kinesis_wire.py``) takes an optional
``sign(headers, body)`` hook; ``sigv4_signer`` builds that hook from
credentials — the stdlib equivalent of what the reference gets from boto
(``/root/reference/sources/kinesis/__init__.py:75-130`` builds a
botocore session from aws_access_key_id/secret).  The algorithm is the
published SigV4 spec (canonical request → string-to-sign → derived
signing key → Authorization header); ``sign_request`` is the generic
core so any AWS-shaped JSON/REST API can reuse it, and so the pinned
test vector from the AWS documentation can drive a GET with a query
string.
"""

from __future__ import annotations

import datetime as _dt
import hashlib
import hmac
from collections.abc import Callable
from urllib.parse import quote, urlparse

_ALGO = "AWS4-HMAC-SHA256"


def _hmac_sha256(key: bytes, msg: str) -> bytes:
    return hmac.new(key, msg.encode("utf-8"), hashlib.sha256).digest()


def _sha256_hex(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


def _canonical_query(query: str) -> str:
    """Sorted, RFC 3986-encoded key=value pairs (spec: encode everything
    except unreserved characters; '=' separates even empty values)."""
    if not query:
        return ""
    pairs = []
    for part in query.split("&"):
        if not part:
            continue
        k, _, v = part.partition("=")
        pairs.append((quote(k, safe="-_.~"), quote(v, safe="-_.~")))
    return "&".join(f"{k}={v}" for k, v in sorted(pairs))


def signing_key(secret_key: str, datestamp: str, region: str, service: str) -> bytes:
    """kSigning = HMAC-chain over date → region → service → aws4_request."""
    k_date = _hmac_sha256(("AWS4" + secret_key).encode("utf-8"), datestamp)
    k_region = hmac.new(k_date, region.encode(), hashlib.sha256).digest()
    k_service = hmac.new(k_region, service.encode(), hashlib.sha256).digest()
    return hmac.new(k_service, b"aws4_request", hashlib.sha256).digest()


def sign_request(
    method: str,
    url: str,
    headers: dict[str, str],
    body: bytes,
    access_key: str,
    secret_key: str,
    region: str,
    service: str,
    amz_date: str,
    session_token: str | None = None,
) -> dict[str, str]:
    """Return the headers to send: input headers + x-amz-date (+ token) +
    Authorization.  ``amz_date`` is ``YYYYMMDDTHHMMSSZ``; the Host header
    is derived from *url* if absent (urllib sets the same one on the
    wire, and it MUST be signed)."""
    parsed = urlparse(url)
    hdrs = dict(headers)
    hdrs.setdefault("host", parsed.netloc)
    hdrs["x-amz-date"] = amz_date
    if session_token is not None:
        hdrs["x-amz-security-token"] = session_token

    lower = {k.lower().strip(): " ".join(v.split()) for k, v in hdrs.items()}
    signed_names = ";".join(sorted(lower))
    canonical_headers = "".join(f"{k}:{lower[k]}\n" for k in sorted(lower))
    canonical_request = "\n".join(
        [
            method.upper(),
            quote(parsed.path or "/", safe="/-_.~"),
            _canonical_query(parsed.query),
            canonical_headers,
            signed_names,
            _sha256_hex(body),
        ]
    )
    datestamp = amz_date[:8]
    scope = f"{datestamp}/{region}/{service}/aws4_request"
    string_to_sign = "\n".join(
        [_ALGO, amz_date, scope, _sha256_hex(canonical_request.encode())]
    )
    key = signing_key(secret_key, datestamp, region, service)
    signature = hmac.new(key, string_to_sign.encode(), hashlib.sha256).hexdigest()
    hdrs["Authorization"] = (
        f"{_ALGO} Credential={access_key}/{scope}, "
        f"SignedHeaders={signed_names}, Signature={signature}"
    )
    return hdrs


def sigv4_signer(
    url: str,
    access_key: str,
    secret_key: str,
    region: str,
    service: str = "kinesis",
    session_token: str | None = None,
    clock: Callable[[], _dt.datetime] | None = None,
) -> Callable[[dict, bytes], None]:
    """Build the ``sign(headers, body)`` hook ``KinesisClient`` accepts.

    Mutates the request headers in place with x-amz-date and
    Authorization computed for a POST to *url* (the only request shape
    the JSON-1.1 API uses).  ``clock`` is injectable for tests; defaults
    to UTC now.
    """

    def sign(headers: dict, body: bytes) -> None:
        now = (clock or (lambda: _dt.datetime.now(_dt.timezone.utc)))()
        amz_date = now.strftime("%Y%m%dT%H%M%SZ")
        signed = sign_request(
            "POST",
            url.rstrip("/") + "/",
            headers,
            body,
            access_key,
            secret_key,
            region,
            service,
            amz_date,
            session_token,
        )
        headers.clear()
        headers.update(signed)

    return sign
