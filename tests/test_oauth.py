"""OAuth2 middleware against a REAL token server: a local http.server
issues expiring Bearer tokens and a guarded resource endpoint, so token
acquisition, proactive expiry refresh, reactive 401 refresh, and
refresh-token rotation are all exercised on the wire (no mocks in the
HTTP path). Mirrors the reference's credential-refresh flows
(sources/google_sheets/setup_script_gcp_oauth.py, salesforce
helpers/client.py OAuth2 flows) as middleware over HttpTransport.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from verified_sources_spark.sources.oauth import (
    OAuth2Error,
    OAuth2TokenProvider,
    StaticTokenProvider,
)
from verified_sources_spark.sources.rest import (
    HttpTransport,
    OffsetPaginator,
    RestClient,
    RestEndpoint,
    TransportError,
)


class _OAuthServer:
    """Token endpoint + guarded paginated resource, in-process."""

    def __init__(self, expires_in: float | None = 3600.0, rotate_refresh: bool = False):
        srv = self
        srv.expires_in = expires_in
        srv.rotate_refresh = rotate_refresh
        srv.valid_tokens: set[str] = set()
        srv.token_seq = 0
        srv.grants: list[dict] = []
        srv.data_calls = 0
        srv.current_refresh = "refresh-0"

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _json(self, status: int, body: dict):
                payload = json.dumps(body).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

            def do_POST(self):
                if urlparse(self.path).path != "/token":
                    return self._json(404, {})
                n = int(self.headers.get("Content-Length", 0))
                form = {k: v[0] for k, v in parse_qs(self.rfile.read(n).decode()).items()}
                srv.grants.append(form)
                if form.get("client_id") != "cid" or form.get("client_secret", "") not in ("", "sec"):
                    return self._json(401, {"error": "invalid_client"})
                if form.get("grant_type") == "refresh_token" and form.get("refresh_token") != srv.current_refresh:
                    return self._json(400, {"error": "invalid_grant"})
                srv.token_seq += 1
                tok = f"tok-{srv.token_seq}"
                srv.valid_tokens.add(tok)
                body = {"access_token": tok, "token_type": "Bearer"}
                if srv.expires_in is not None:
                    body["expires_in"] = srv.expires_in
                if srv.rotate_refresh and form.get("grant_type") == "refresh_token":
                    srv.current_refresh = f"refresh-{srv.token_seq}"
                    body["refresh_token"] = srv.current_refresh
                self._json(200, body)

            def do_GET(self):
                u = urlparse(self.path)
                if u.path != "/data":
                    return self._json(404, {})
                auth = self.headers.get("Authorization", "")
                if not (auth.startswith("Bearer ") and auth[7:] in srv.valid_tokens):
                    return self._json(401, {"error": "unauthorized"})
                srv.data_calls += 1
                q = {k: v[0] for k, v in parse_qs(u.query).items()}
                off, lim = int(q.get("offset", 0)), int(q.get("limit", 100))
                rows = [{"id": i} for i in range(off, min(off + lim, 7))]
                self._json(200, {"data": rows})

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self.thread.start()
        self.base = f"http://127.0.0.1:{self.httpd.server_address[1]}"

    def revoke_all(self):
        self.valid_tokens.clear()

    def close(self):
        self.httpd.shutdown()
        self.httpd.server_close()


@pytest.fixture()
def oauth_server():
    srv = _OAuthServer()
    yield srv
    srv.close()


def _provider(srv, **kw):
    kw.setdefault("client_id", "cid")
    kw.setdefault("client_secret", "sec")
    return OAuth2TokenProvider(f"{srv.base}/token", **kw)


def test_client_credentials_single_acquisition(oauth_server):
    """One token request serves many pages; form carries the grant."""
    prov = _provider(oauth_server)
    client = RestClient(HttpTransport(auth=prov))
    ep = RestEndpoint(url=f"{oauth_server.base}/data", paginator=OffsetPaginator(limit=3))
    ids = [r["id"] for r in client.records(ep)]
    assert ids == list(range(7))
    assert prov.n_token_requests == 1
    assert oauth_server.grants[0]["grant_type"] == "client_credentials"
    assert oauth_server.data_calls == 3  # 3+3+1 rows over 3 pages


def test_proactive_expiry_refresh(oauth_server):
    """Clock passes expires_in - skew → new token BEFORE any 401."""
    now = [0.0]
    prov = _provider(oauth_server, expiry_skew=30.0, clock=lambda: now[0])
    t = HttpTransport(auth=prov)
    t.request(f"{oauth_server.base}/data", {})
    assert prov.n_token_requests == 1
    now[0] = 3600.0 - 29.0  # inside the skew margin
    t.request(f"{oauth_server.base}/data", {})
    assert prov.n_token_requests == 2
    # no 401 ever reached the resource server
    assert oauth_server.data_calls == 2


def test_reactive_401_refresh_retries_once(oauth_server):
    """Server-side revocation → 401 → invalidate, re-acquire, retry."""
    prov = _provider(oauth_server)
    t = HttpTransport(auth=prov)
    t.request(f"{oauth_server.base}/data", {})
    oauth_server.revoke_all()  # out-of-band revocation
    body, _ = t.request(f"{oauth_server.base}/data", {})
    assert body["data"]
    assert prov.n_token_requests == 2


def test_401_with_fresh_token_propagates(oauth_server):
    """If even the fresh token is rejected, the 401 surfaces (no loop)."""
    prov = _provider(oauth_server)
    t = HttpTransport(auth=prov)

    orig = prov.authorization

    def poisoned():
        v = orig()
        oauth_server.revoke_all()  # every token dies the moment it's issued
        return v

    prov.authorization = poisoned
    with pytest.raises(TransportError) as ei:
        t.request(f"{oauth_server.base}/data", {})
    assert ei.value.status == 401
    assert prov.n_token_requests == 2  # initial + exactly one refresh


def test_refresh_token_grant_and_rotation():
    srv = _OAuthServer(rotate_refresh=True)
    try:
        prov = _provider(srv, grant_type="refresh_token", refresh_token="refresh-0")
        t = HttpTransport(auth=prov)
        t.request(f"{srv.base}/data", {})
        assert srv.grants[0]["grant_type"] == "refresh_token"
        assert srv.grants[0]["refresh_token"] == "refresh-0"
        # server rotated; provider stored the replacement
        rotated = prov.refresh_token
        assert rotated == f"refresh-{srv.token_seq}" != "refresh-0"
        srv.revoke_all()
        t.request(f"{srv.base}/data", {})  # must use the ROTATED token
        assert srv.grants[-1]["refresh_token"] == rotated
        assert prov.refresh_token != rotated  # and store the next rotation
    finally:
        srv.close()


def test_password_grant_form(oauth_server):
    prov = _provider(
        oauth_server, grant_type="password", username="u@example.com", password="pw",
        scope="read:all",
    )
    HttpTransport(auth=prov).request(f"{oauth_server.base}/data", {})
    g = oauth_server.grants[0]
    assert g["grant_type"] == "password"
    assert g["username"] == "u@example.com"
    assert g["scope"] == "read:all"


def test_bad_client_raises_oauth2_error(oauth_server):
    prov = _provider(oauth_server, client_id="wrong")
    with pytest.raises(OAuth2Error):
        prov.authorization()


def test_no_expiry_token_never_proactively_refreshed():
    srv = _OAuthServer(expires_in=None)
    try:
        now = [0.0]
        prov = _provider(srv, clock=lambda: now[0])
        t = HttpTransport(auth=prov)
        t.request(f"{srv.base}/data", {})
        now[0] = 1e9
        t.request(f"{srv.base}/data", {})
        assert prov.n_token_requests == 1
    finally:
        srv.close()


def test_concurrent_expiry_single_refresh(oauth_server):
    """N threads hitting an expired token produce ONE token request."""
    now = [0.0]
    prov = _provider(oauth_server, clock=lambda: now[0])
    prov.authorization()
    now[0] = 1e6  # expired
    results = []
    threads = [
        threading.Thread(target=lambda: results.append(prov.authorization()))
        for _ in range(8)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert len(set(results)) == 1
    assert prov.n_token_requests == 2  # initial + one shared refresh


def test_static_token_provider(oauth_server):
    """Zendesk-shape pre-issued token: attached as-is, 401 propagates."""
    oauth_server.valid_tokens.add("long-lived")
    t = HttpTransport(auth=StaticTokenProvider("long-lived"))
    body, _ = t.request(f"{oauth_server.base}/data", {})
    assert body["data"]
    oauth_server.revoke_all()
    with pytest.raises(TransportError) as ei:
        t.request(f"{oauth_server.base}/data", {})
    assert ei.value.status == 401


def test_grant_validation():
    with pytest.raises(ValueError):
        OAuth2TokenProvider("http://x/token", "cid", grant_type="implicit")
    with pytest.raises(ValueError):
        OAuth2TokenProvider("http://x/token", "cid", grant_type="refresh_token")
    with pytest.raises(ValueError):
        OAuth2TokenProvider("http://x/token", "cid", grant_type="password")


def test_end_to_end_extraction_with_midstream_token_expiry(spark):
    """The Google-family connector shape (reference
    setup_script_gcp_oauth.py: refresh-token -> access token -> paged
    API): tokens die every 2 resource calls, pagination needs 3 pages —
    the middleware refreshes transparently mid-extraction and the full
    DataFrame lands."""
    from verified_sources_spark.sources.rest import fetch_to_dataframe

    srv = _OAuthServer()
    try:
        calls = {"n": 0}
        prov = _provider(srv, grant_type="client_credentials")

        class RevokingTransport(HttpTransport):
            # the server revokes ALL tokens after every 2nd successful
            # data call — forced mid-pagination expiry
            def request(self, url, params):
                body, headers = super().request(url, params)
                calls["n"] += 1
                if calls["n"] % 2 == 0:
                    srv.revoke_all()
                return body, headers

        client = RestClient(RevokingTransport(auth=prov))
        ep = RestEndpoint(
            url=f"{srv.base}/data", paginator=OffsetPaginator(limit=3)
        )
        df = fetch_to_dataframe(spark, client, ep, "id long")
        assert sorted(r["id"] for r in df.collect()) == list(range(7))
        assert prov.n_token_requests >= 2  # refreshed at least once mid-run
    finally:
        srv.close()
