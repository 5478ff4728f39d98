"""KinesisClient against a REAL socket: an in-process fake Kinesis
endpoint speaks the JSON-1.1 API (ListShards with NextToken paging,
GetShardIterator, GetRecords with MillisBehindLatest / closed-shard
semantics, throttling errors) and fetch_stream drives it through the
already-tested resolve_shard_iterators resume/reshard semantics."""

from __future__ import annotations

import base64
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from verified_sources_spark.sources.kinesis_wire import (
    KinesisClient,
    KinesisError,
    fetch_stream,
)


def _tok(sid: str, idx: int) -> str:
    return json.dumps({"s": sid, "i": idx})


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):
        pass

    def _json(self, payload: dict, status: int = 200):
        body = json.dumps(payload).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/x-amz-json-1.1")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_POST(self):
        srv = self.server
        op = self.headers["X-Amz-Target"].split(".")[-1]
        body = self.rfile.read(int(self.headers["Content-Length"]))
        req = json.loads(body)
        srv.calls.append((op, req))
        if getattr(srv, "sigv4_creds", None) is not None:
            # verify like AWS does: recompute the signature from the
            # received request with the shared secret and compare
            from verified_sources_spark.sources.sigv4 import sign_request

            access, secret, region = srv.sigv4_creds
            auth = self.headers.get("Authorization") or ""
            try:
                signed_names = auth.split("SignedHeaders=")[1].split(",")[0]
                hdrs = {
                    name: self.headers[name]
                    for name in signed_names.split(";")
                    if name != "x-amz-date"
                }
                expected = sign_request(
                    "POST",
                    f"http://{self.headers['Host']}/",
                    hdrs,
                    body,
                    access,
                    secret,
                    region,
                    "kinesis",
                    self.headers["x-amz-date"],
                )["Authorization"]
            except Exception:
                expected = None
            if auth != expected:
                self._json(
                    {"__type": "InvalidSignatureException",
                     "message": "signature mismatch"},
                    status=403,
                )
                return
        if op == "ListShards":
            # two pages to exercise NextToken
            if "NextToken" in req:
                self._json({"Shards": srv.shard_meta[1:]})
            else:
                self._json({"Shards": srv.shard_meta[:1], "NextToken": "t1"})
        elif op == "GetShardIterator":
            sid = req["ShardId"]
            recs = srv.records[sid]
            kind = req["ShardIteratorType"]
            if kind == "TRIM_HORIZON":
                idx = 0
            elif kind == "LATEST":
                idx = len(recs)
            elif kind == "AFTER_SEQUENCE_NUMBER":
                seqs = [r["SequenceNumber"] for r in recs]
                idx = seqs.index(req["StartingSequenceNumber"]) + 1
            else:  # AT_TIMESTAMP
                idx = next(
                    (
                        i
                        for i, r in enumerate(recs)
                        if r["ApproximateArrivalTimestamp"] >= req["Timestamp"]
                    ),
                    len(recs),
                )
            self._json({"ShardIterator": _tok(sid, idx)})
        elif op == "GetRecords":
            if srv.throttle_next:
                srv.throttle_next -= 1
                self._json(
                    {
                        "__type": "x#ProvisionedThroughputExceededException",
                        "message": "slow down",
                    },
                    status=400,
                )
                return
            tok = json.loads(req["ShardIterator"])
            sid, idx = tok["s"], tok["i"]
            recs = srv.records[sid]
            limit = req.get("Limit", 1000)
            page = recs[idx : idx + limit]
            new_idx = idx + len(page)
            closed = sid in srv.closed and new_idx >= len(recs)
            self._json(
                {
                    "Records": page,
                    "NextShardIterator": None if closed else _tok(sid, new_idx),
                    "MillisBehindLatest": 0 if new_idx >= len(recs) else 1000,
                }
            )


class _Endpoint(ThreadingHTTPServer):
    def __init__(self):
        super().__init__(("127.0.0.1", 0), _Handler)
        self.calls = []
        self.throttle_next = 0
        self.closed = {"shardId-000"}
        self.shard_meta = [
            {"ShardId": "shardId-000"},  # closed parent
            {"ShardId": "shardId-001", "ParentShardId": "shardId-000"},
            {"ShardId": "shardId-002"},
        ]
        self.records = {
            "shardId-000": [self._rec("s0-1", b"p0-a"), self._rec("s0-2", b"p0-b")],
            "shardId-001": [self._rec("s1-1", b"p1-a")],
            "shardId-002": [self._rec("s2-1", b"p2-a"), self._rec("s2-2", b"p2-b")],
        }

    @staticmethod
    def _rec(seq: str, data: bytes, ts: float = 100.0) -> dict:
        return {
            "SequenceNumber": seq,
            "PartitionKey": "pk",
            "Data": base64.b64encode(data).decode(),
            "ApproximateArrivalTimestamp": ts,
        }


@pytest.fixture()
def endpoint():
    srv = _Endpoint()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()
    srv.server_close()


def _url(srv) -> str:
    host, port = srv.server_address
    return f"http://{host}:{port}"


def test_fresh_run_reads_everything(endpoint):
    rows, state = fetch_stream(_url(endpoint), "events")
    assert [(r["shard_id"], r["data"]) for r in rows] == [
        ("shardId-000", b"p0-a"),
        ("shardId-000", b"p0-b"),
        ("shardId-001", b"p1-a"),
        ("shardId-002", b"p2-a"),
        ("shardId-002", b"p2-b"),
    ]
    assert state == {
        "shardId-000": "s0-2",
        "shardId-001": "s1-1",
        "shardId-002": "s2-2",
    }
    # ListShards paged through NextToken
    assert [op for op, _ in endpoint.calls].count("ListShards") == 2


def test_resume_and_reshard_child(endpoint):
    # stored state knows the closed parent only — the child must start at
    # TRIM_HORIZON (not LATEST) so the handoff loses nothing
    rows, state = fetch_stream(_url(endpoint), "events", {"shardId-000": "s0-2"})
    kinds = {
        req["ShardId"]: req["ShardIteratorType"]
        for op, req in endpoint.calls
        if op == "GetShardIterator"
    }
    assert kinds == {
        "shardId-000": "AFTER_SEQUENCE_NUMBER",
        "shardId-001": "TRIM_HORIZON",
        "shardId-002": "TRIM_HORIZON",
    }
    assert [(r["shard_id"], r["data"]) for r in rows] == [
        ("shardId-001", b"p1-a"),
        ("shardId-002", b"p2-a"),
        ("shardId-002", b"p2-b"),
    ]
    # next run from the returned state is empty
    rows2, state2 = fetch_stream(_url(endpoint), "events", state)
    assert rows2 == [] and state2 == state


def test_throttling_is_retried_then_surfaces(endpoint):
    endpoint.throttle_next = 2
    rows, _ = fetch_stream(_url(endpoint), "events")
    assert len(rows) == 5  # both throttles absorbed by backoff
    client = KinesisClient(_url(endpoint), max_retries=1, backoff_s=0.01)
    endpoint.throttle_next = 5
    it = client.get_shard_iterator("events", "shardId-002", {"ShardIteratorType": "TRIM_HORIZON"})
    with pytest.raises(KinesisError, match="ProvisionedThroughput"):
        client.get_records(it)


def test_rows_to_spark(spark, endpoint):
    rows, _ = fetch_stream(_url(endpoint), "events")
    df = spark.createDataFrame(
        rows,
        schema="shard_id string, sequence_number string, partition_key string, "
        "data binary, arrival_ts double",
    )
    got = df.groupBy("shard_id").count().collect()
    assert {(r["shard_id"], r["count"]) for r in got} == {
        ("shardId-000", 2),
        ("shardId-001", 1),
        ("shardId-002", 2),
    }


def test_sigv4_signed_calls_verified_by_endpoint(endpoint):
    """End-to-end SigV4: the endpoint recomputes every signature with the
    shared secret (what AWS does) and 403s mismatches; a correctly signed
    client reads the stream, a wrong-secret client is rejected."""
    from verified_sources_spark.sources.kinesis_wire import KinesisClient, KinesisError
    from verified_sources_spark.sources.sigv4 import sigv4_signer

    endpoint.sigv4_creds = ("AKIDTEST", "the-secret", "us-east-1")
    url = _url(endpoint)
    good = KinesisClient(
        url, sign=sigv4_signer(url, "AKIDTEST", "the-secret", "us-east-1")
    )
    shards = good.list_shards("s")
    assert [s["shard_id"] for s in shards] == [
        "shardId-000", "shardId-001", "shardId-002",
    ]

    bad = KinesisClient(
        url, sign=sigv4_signer(url, "AKIDTEST", "wrong-secret", "us-east-1")
    )
    with pytest.raises(KinesisError, match="InvalidSignatureException"):
        bad.list_shards("s")

    unsigned = KinesisClient(url)
    with pytest.raises(KinesisError, match="InvalidSignatureException"):
        unsigned.list_shards("s")


def test_capped_drain_resumes_exactly(endpoint):
    """max_records_per_shard bounds each call to O(cap) and the returned
    state resumes precisely where the drain stopped — iterating the
    capped probe walks the whole stream with no gaps or duplicates."""
    url = _url(endpoint)
    rows1, state1 = fetch_stream(url, "events", max_records_per_shard=1)
    assert [(r["shard_id"], r["data"]) for r in rows1] == [
        ("shardId-000", b"p0-a"),
        ("shardId-001", b"p1-a"),
        ("shardId-002", b"p2-a"),
    ]
    rows2, state2 = fetch_stream(url, "events", state1, max_records_per_shard=1)
    assert [(r["shard_id"], r["data"]) for r in rows2] == [
        ("shardId-000", b"p0-b"),
        ("shardId-002", b"p2-b"),
    ]
    # caught up: a third capped call consumes nothing and is stable
    rows3, state3 = fetch_stream(url, "events", state2, max_records_per_shard=1)
    assert rows3 == [] and state3 == state2
    # the capped walk saw exactly what an uncapped drain sees
    full, full_state = fetch_stream(url, "events")
    assert sorted(
        (r["shard_id"], r["data"]) for r in rows1 + rows2
    ) == sorted((r["shard_id"], r["data"]) for r in full)
    assert state2 == full_state


def test_stream_reader_max_records_per_batch(endpoint):
    """The kinesis_wire stream option ``maxRecordsPerBatch`` caps the
    driver-side tip probe: each latestOffset advances by at most the cap
    per shard, so a backlogged stream costs O(cap) per micro-batch."""
    from verified_sources_spark.streaming.datasources import (
        _KinesisWireStreamReader,
    )

    rdr = _KinesisWireStreamReader(
        {"endpoint": _url(endpoint), "stream": "events",
         "maxRecordsPerBatch": "1"}
    )
    off1 = rdr.latestOffset()
    assert off1["seq"] == {
        "shardId-000": "s0-1",
        "shardId-001": "s1-1",
        "shardId-002": "s2-1",
    }
    off2 = rdr.latestOffset()
    assert off2["seq"] == {
        "shardId-000": "s0-2",
        "shardId-001": "s1-1",
        "shardId-002": "s2-2",
    }
    # caught up — further probes are cheap no-ops at the tip
    assert rdr.latestOffset()["seq"] == off2["seq"]
    # and the planned slices between the capped offsets cover the gap
    parts = rdr.partitions({"seq": off1["seq"]}, {"seq": off2["seq"]})
    assert sorted((p.shard_id, p.start, p.end) for p in parts) == [
        ("shardId-000", "s0-1", "s0-2"),
        ("shardId-002", "s2-1", "s2-2"),
    ]


def test_stream_reader_rejects_nonpositive_cap(endpoint):
    """``maxRecordsPerBatch=0`` must be rejected at option parse time:
    "0" is a truthy string, and accepting it would make every probe
    break before reading anything — a stream that stalls forever with
    no error."""
    from verified_sources_spark.streaming.datasources import (
        _KinesisWireStreamReader,
    )

    for bad in ("0", "-3"):
        with pytest.raises(ValueError, match="maxRecordsPerBatch"):
            _KinesisWireStreamReader(
                {"endpoint": _url(endpoint), "stream": "events",
                 "maxRecordsPerBatch": bad}
            )
