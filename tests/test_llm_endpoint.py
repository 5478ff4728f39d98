"""LLM completion endpoint client against a REAL socket: an in-process
fake OpenAI-style server answers POST /v1/completions by running the
same deterministic heuristic as llm.extract.deterministic_fake_llm over
the (context, question) parsed back out of each prompt — so the
endpoint-backed extraction pipeline must reproduce the stub-backed one
bit-for-bit, while the wire layer exercises Bearer auth, 429/Retry-After,
5xx backoff, and index-aligned batched choices."""

from __future__ import annotations

import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from verified_sources_spark.llm.endpoint import (
    EmbeddingsClient,
    LlmEndpointClient,
    LlmEndpointError,
    embed_texts,
    extract_fields_via_endpoint,
)
from verified_sources_spark.llm.extract import (
    deterministic_fake_embedding,
    deterministic_fake_llm,
)

_PROMPT_RE = re.compile(
    r"Context:\n(?P<text>.*)\n\nQuestion: (?P<query>.*)\nAnswer:\Z", re.DOTALL
)


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def _json(self, payload: dict, status: int = 200, headers: dict | None = None):
        body = json.dumps(payload).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        for k, v in (headers or {}).items():
            self.send_header(k, v)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        srv = self.server
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        srv.calls.append({"path": self.path, "body": body,
                          "auth": self.headers.get("Authorization")})
        if self.path not in ("/v1/completions", "/v1/embeddings"):
            self._json({"error": "not found"}, status=404)
            return
        if srv.api_key is not None and (
            self.headers.get("Authorization") != f"Bearer {srv.api_key}"
        ):
            self._json({"error": "bad key"}, status=401)
            return
        if srv.throttle_next:
            srv.throttle_next -= 1
            self._json({"error": "rate limited"}, status=429,
                       headers={"Retry-After": str(srv.retry_after)})
            return
        if srv.fail_next:
            srv.fail_next -= 1
            self._json({"error": "boom"}, status=500)
            return
        if self.path == "/v1/embeddings":
            texts = body["input"]
            if isinstance(texts, str):
                texts = [texts]
            data = [
                {"index": i, "object": "embedding",
                 "embedding": deterministic_fake_embedding(t, srv.embed_dim)}
                for i, t in enumerate(texts)
            ]
            if srv.drop_last_embedding:
                data = data[:-1]
            # deliberately out of order: the client must align by index
            self._json({"model": body.get("model"), "data": list(reversed(data))})
            return
        prompts = body["prompt"]
        if isinstance(prompts, str):
            prompts = [prompts]
        choices = []
        for i, p in enumerate(prompts):
            m = _PROMPT_RE.search(p)
            ans = deterministic_fake_llm(m.group("text"), m.group("query")) if m else None
            choices.append({"index": i, "text": ans if ans is not None else ""})
        # deliberately out of order: the client must align by index
        self._json({"model": body.get("model"), "choices": list(reversed(choices))})


class _Server(ThreadingHTTPServer):
    def __init__(self):
        super().__init__(("127.0.0.1", 0), _Handler)
        self.calls: list = []
        self.api_key: str | None = None
        self.throttle_next = 0
        self.retry_after = 0.5
        self.fail_next = 0
        self.embed_dim = 16
        self.drop_last_embedding = False


@pytest.fixture()
def server():
    srv = _Server()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


def _url(srv) -> str:
    host, port = srv.server_address
    return f"http://{host}:{port}"


def _prompt(text: str, query: str) -> str:
    from verified_sources_spark.llm.endpoint import PROMPT_TEMPLATE

    return PROMPT_TEMPLATE.format(text=text, query=query)


def test_batch_alignment_and_null_mapping(server):
    client = LlmEndpointClient(_url(server))
    answers = client.complete_batch(
        [
            _prompt("Total: 9.99", "what is the total?"),
            _prompt("no structure here", "what is the total?"),
            _prompt("alpha beta", "first word of the text"),
        ]
    )
    # server reversed the choices; index alignment restores order, and
    # the empty-string answer for the unanswerable prompt maps to None
    assert answers == ["9.99", None, "alpha"]
    assert client.complete_batch([]) == []


def test_bearer_auth_and_401_not_retried(server):
    server.api_key = "sk-test"
    good = LlmEndpointClient(_url(server), api_key="sk-test")
    assert good.complete(_prompt("Total: 1.00", "what is the total?")) == "1.00"
    bad = LlmEndpointClient(_url(server), api_key="sk-wrong")
    n_before = len(server.calls)
    with pytest.raises(LlmEndpointError) as ei:
        bad.complete(_prompt("x", "y"))
    assert ei.value.status == 401
    assert len(server.calls) == n_before + 1  # no retry on auth failure


def test_429_honors_retry_after(server):
    server.throttle_next = 2
    server.retry_after = 0.25
    slept: list = []
    client = LlmEndpointClient(_url(server), sleep=slept.append)
    assert client.complete(_prompt("Total: 3", "what is the total?")) == "3"
    assert slept == [0.25, 0.25]


def test_5xx_backoff_then_raise(server):
    server.fail_next = 10
    slept: list = []
    client = LlmEndpointClient(
        _url(server), max_retries=2, backoff_base=0.01, sleep=slept.append
    )
    with pytest.raises(LlmEndpointError) as ei:
        client.complete(_prompt("x", "y"))
    assert ei.value.status == 500
    assert slept == [0.01, 0.02]  # exponential, then retries exhausted
    # transient 5xx heals inside the retry budget
    server.fail_next = 1
    ok = LlmEndpointClient(_url(server), sleep=lambda _: None)
    assert ok.complete(_prompt("Total: 7", "what is the total?")) == "7"


def test_extract_via_endpoint_matches_stub_pipeline(spark, server):
    """End-to-end over Spark: the endpoint-backed extraction equals the
    in-process stub extraction row-for-row (same heuristic behind the
    wire), and the Arrow batch boundary is the HTTP call boundary —
    each call carries docs_in_batch x n_fields prompts."""
    from verified_sources_spark.llm.extract import extract_fields

    server.api_key = "sk-live"
    docs = spark.createDataFrame(
        [
            (1, "Invoice Total: 42.50; due soon"),
            (2, "completely unstructured prose"),
            (3, None),
            (4, "Amount: 7.25; paid"),
        ],
        "doc_id long, text string",
    )
    queries = {
        "total": "what is the invoice total amount?",
        "first_word": "first word of the text",
    }
    via_stub = {r["doc_id"]: r.asDict() for r in
                extract_fields(docs, "doc_id", "text", queries).collect()}
    via_http = {r["doc_id"]: r.asDict() for r in
                extract_fields_via_endpoint(
                    docs, "doc_id", "text", queries,
                    base_url=_url(server), api_key="sk-live",
                ).collect()}
    assert via_http == via_stub
    comp_calls = [c for c in server.calls if c["path"] == "/v1/completions"]
    n_prompts = sum(len(c["body"]["prompt"]) for c in comp_calls)
    assert n_prompts == 4 * len(queries)  # one prompt per (doc, field)
    for c in comp_calls:  # batched: every call is a multiple of n_fields
        assert len(c["body"]["prompt"]) % len(queries) == 0
        assert c["auth"] == "Bearer sk-live"


def test_extract_via_endpoint_survives_throttling(spark, server):
    """A transient 429 inside an executor task retries in place — the
    Spark job completes without task failure."""
    server.throttle_next = 1
    server.retry_after = 0.05
    docs = spark.createDataFrame([(1, "Total: 5.00")], "doc_id long, text string")
    out = extract_fields_via_endpoint(
        docs, "doc_id", "text", {"total": "what is the total?"},
        base_url=_url(server),
    ).collect()
    assert out[0]["total"] == "5.00"


# ------------------------------------------------------------- embeddings
def test_embed_batch_alignment_and_determinism(server):
    client = EmbeddingsClient(_url(server))
    texts = ["alpha beta gamma", "delta epsilon", ""]
    vecs = client.embed_batch(texts)
    # server returns data reversed: client must re-align by index
    assert vecs == [deterministic_fake_embedding(t) for t in texts]
    assert all(len(v) == 16 for v in vecs)
    assert client.embed_batch([]) == []
    assert client.embed("alpha beta gamma") == vecs[0]


def test_embed_retries_429_and_5xx(server):
    server.throttle_next = 1
    server.fail_next = 1
    client = EmbeddingsClient(_url(server), backoff_base=0.001)
    vecs = client.embed_batch(["hello world"])
    assert vecs == [deterministic_fake_embedding("hello world")]
    # 1 throttle + 1 fail + 1 success = 3 wire calls
    assert len([c for c in server.calls if c["path"] == "/v1/embeddings"]) == 3


def test_embed_bearer_auth(server):
    server.api_key = "sk-good"
    client = EmbeddingsClient(_url(server), api_key="sk-good")
    assert client.embed_batch(["x"]) == [deterministic_fake_embedding("x")]
    bad = EmbeddingsClient(_url(server), api_key="sk-bad")
    with pytest.raises(LlmEndpointError) as ei:
        bad.embed_batch(["x"])
    assert ei.value.status == 401


def test_embed_protocol_violation_raises(server):
    """A response covering fewer inputs than sent must raise loudly —
    a silent None poisons every downstream cosine."""
    server.drop_last_embedding = True
    client = EmbeddingsClient(_url(server))
    with pytest.raises(LlmEndpointError, match="covered 1/2"):
        client.embed_batch(["one", "two"])


def test_embed_texts_spark_end_to_end(spark, server):
    """documents-shaped text → embed_texts → (id, array<float>) matching
    the stub per-row; then the full raw-text → SemDeDup composition
    (corpus.semantic_dedup_text) drops the planted near-identical doc
    and keeps the distinct ones."""
    from verified_sources_spark.llm.corpus import semantic_dedup_text

    # ids 1-2 are DISTINCT texts (k-means inits on the lowest-id
    # vectors, so they seed well-separated clusters); the planted
    # near-dup pair is 3 ~ 4 (cosine 0.97 via the token-hash stub)
    rows = [
        (1, "completely unrelated legal boilerplate paragraph text"),
        (2, "spark structured streaming watermark semantics explained"),
        (3, "the quick brown fox jumps over the lazy dog"),
        (4, "the quick brown fox jumps over the lazy dog today"),  # ~dup of 3
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    emb = embed_texts(docs, "doc_id", "text", _url(server)).collect()
    got = {r["doc_id"]: list(r["embedding"]) for r in emb}
    for did, text in rows:
        expect = deterministic_fake_embedding(text)
        assert got[did] == pytest.approx(expect, abs=1e-6)

    kept = semantic_dedup_text(
        docs, "doc_id", "text", _url(server), n_clusters=2, threshold=0.9
    ).collect()
    kept_ids = {r["doc_id"] for r in kept}
    assert 4 not in kept_ids          # near-dup absorbed
    assert {1, 2, 3} <= kept_ids      # distinct docs survive
    absorbed = {r["doc_id"]: r["n_dropped_dups"] for r in kept}
    assert absorbed[3] == 1
