"""Generic paginated REST reader framework (SURVEY.md §2.2).

The reference implements ~10 pagination protocols ad hoc per connector;
here each is a small strategy object and every connector is just config:

- ``OffsetPaginator``       — ``offset``/``limit`` params until short page
  (jira ``startAt``, GA4 offsets; reference sources/jira/__init__.py:124-150)
- ``PageNumberPaginator``   — ``page=N`` until empty
- ``CursorPaginator``       — opaque cursor in the response body
  (zendesk ``links.next`` / ``meta.has_more``; hubspot ``paging.next.link``;
  reference sources/zendesk/helpers/talk_api.py:104-107)
- ``KeysetPaginator``       — ``starting_after=<last id>`` (stripe;
  reference sources/stripe_analytics/helpers.py:11-39)
- ``HeaderLinkPaginator``   — RFC5988 ``Link: <url>; rel="next"`` (github;
  reference sources/github/helpers.py:25-43)
- ``StartTimePaginator``    — time-cursor protocol: next ``start_time``
  from the response, stop on ``count == 0`` / end_of_stream (zendesk
  incremental exports; reference sources/zendesk/helpers/talk_api.py:111-116)

Transport is pluggable.  ``LocalPagesTransport`` serves canned page dicts
for tests (the container has no network); a real ``requests``-based
transport drops in behind the same interface.  Retry/backoff with 429
``Retry-After`` handling wraps any transport
(reference sources/freshdesk/freshdesk_client.py:37-64).

Scale model: page fetching is inherently sequential per endpoint (each
page points at the next), so the unit of parallelism is the *endpoint ×
key-range* — ``fetch_partitioned`` fans endpoint instances out across
executors via ``mapPartitions`` style threading on the driver, and at
cluster scale via an exploded parameter DataFrame.  The extracted pages
land in a DataFrame immediately; everything downstream (flatten, route,
merge) is distributed.
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator, Sequence
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.types as T


# ----------------------------------------------------------------- transport
class TransportError(Exception):
    def __init__(self, status: int, message: str = "", retry_after: float | None = None):
        super().__init__(f"HTTP {status}: {message}")
        self.status = status
        self.retry_after = retry_after


class Transport:
    """Minimal HTTP-ish interface: request(url, params) -> (body, headers)."""

    def request(self, url: str, params: dict[str, Any]) -> tuple[dict, dict]:
        raise NotImplementedError


class HttpTransport(Transport):
    """``requests``-backed transport (VERDICT r1 missing #7: the concrete
    network path behind the same interface the fixtures stub —
    reference connectors call ``requests`` directly, e.g.
    sources/freshdesk/freshdesk_client.py:17-35).

    Gated behind an import-try: constructing it without ``requests``
    installed raises ImportError; everything else in the engine works
    without it. Non-2xx responses raise ``TransportError`` carrying the
    parsed ``Retry-After`` so ``RestClient``'s retry/backoff (including
    the 429 protocol) applies unchanged.

    ``auth`` is an optional token provider (``sources.oauth``): its
    ``authorization()`` value becomes the ``Authorization`` header per
    request, and a 401 response invalidates the token and retries the
    request ONCE with a fresh one (reactive refresh — reference
    connectors refresh via their credential objects, e.g.
    sources/salesforce/helpers/client.py:42-114)."""

    def __init__(
        self,
        session=None,
        headers: dict[str, str] | None = None,
        timeout: float = 30.0,
        auth=None,
    ):
        try:
            import requests
        except ImportError as e:  # pragma: no cover - env without requests
            raise ImportError("HttpTransport requires the 'requests' package") from e
        self._session = session if session is not None else requests.Session()
        self._headers = dict(headers or {})
        self._timeout = timeout
        self._auth = auth

    def _get(self, url: str, params: dict[str, Any]):
        headers = dict(self._headers)
        sent_token: str | None = None
        if self._auth is not None:
            sent_token = self._auth.authorization()
            headers["Authorization"] = sent_token
        resp = self._session.get(
            url, params=params, headers=headers, timeout=self._timeout
        )
        return resp, sent_token

    def request(self, url: str, params: dict[str, Any]) -> tuple[dict, dict]:
        resp, sent_token = self._get(url, params)
        if resp.status_code == 401 and self._auth is not None:
            # reactive refresh: revocation the expiry clock can't see
            self._auth.invalidate(sent_token)
            resp, _ = self._get(url, params)
        headers = dict(resp.headers)
        if resp.status_code >= 400:
            retry_after = None
            ra = headers.get("Retry-After")
            if ra is not None:
                try:
                    retry_after = float(ra)
                except ValueError:
                    retry_after = None
            raise TransportError(resp.status_code, resp.text[:500], retry_after=retry_after)
        body = resp.json() if resp.content else {}
        return body, headers


class LocalPagesTransport(Transport):
    """Serves pre-baked pages keyed by URL; each call pops the next page
    for that URL (or resolves an absolute page URL directly).  Can inject
    failures to exercise the retry path."""

    def __init__(self, pages: dict[str, list[tuple[dict, dict]]], failures: list[TransportError] | None = None):
        self._pages = {k: list(v) for k, v in pages.items()}
        self._failures = list(failures or [])
        self.calls: list[tuple[str, dict]] = []

    def request(self, url: str, params: dict[str, Any]) -> tuple[dict, dict]:
        self.calls.append((url, dict(params)))
        if self._failures:
            raise self._failures.pop(0)
        queue = self._pages.get(url)
        if not queue:
            return {}, {}
        return queue.pop(0)


# ---------------------------------------------------------------- paginators
class Paginator:
    """Strategy: mutate request params / URL between pages and decide when
    to stop.  ``first`` seeds the initial request; ``next`` inspects the
    last (body, headers) and returns the next (url, params) or None."""

    def first(self, url: str, params: dict) -> tuple[str, dict]:
        return url, params

    def next(self, url: str, params: dict, body: dict, headers: dict, n_records: int) -> tuple[str, dict] | None:
        raise NotImplementedError


@dataclass
class OffsetPaginator(Paginator):
    limit: int = 100
    offset_param: str = "offset"
    limit_param: str = "limit"
    _offset: int = field(default=0, init=False)

    def first(self, url, params):
        self._offset = int(params.get(self.offset_param, 0))
        return url, {**params, self.offset_param: self._offset, self.limit_param: self.limit}

    def next(self, url, params, body, headers, n_records):
        if n_records < self.limit:
            return None
        self._offset += self.limit
        return url, {**params, self.offset_param: self._offset, self.limit_param: self.limit}


@dataclass
class PageNumberPaginator(Paginator):
    page_param: str = "page"
    _page: int = field(default=1, init=False)

    def first(self, url, params):
        self._page = int(params.get(self.page_param, 1))
        return url, {**params, self.page_param: self._page}

    def next(self, url, params, body, headers, n_records):
        if n_records == 0:
            return None
        self._page += 1
        return url, {**params, self.page_param: self._page}


@dataclass
class CursorPaginator(Paginator):
    """Opaque cursor: read ``cursor_path`` from the body; stop when absent
    or when ``more_path`` says no more (pipedrive
    ``more_items_in_collection``, zendesk ``meta.has_more``)."""

    cursor_path: str = "next_cursor"
    cursor_param: str = "cursor"
    more_path: str | None = None
    stop_path: str | None = None  # stop when TRUTHY (e.g. zendesk end_of_stream)

    def next(self, url, params, body, headers, n_records):
        if self.more_path is not None and not _json_path(body, self.more_path):
            return None
        if self.stop_path is not None and _json_path(body, self.stop_path):
            return None
        cur = _json_path(body, self.cursor_path)
        if not cur:
            return None
        if str(cur).startswith("http"):
            return str(cur), dict(params)  # absolute next-page URL
        return url, {**params, self.cursor_param: cur}


@dataclass
class KeysetPaginator(Paginator):
    """``starting_after = id of last record`` (stripe keyset)."""

    id_key: str = "id"
    param: str = "starting_after"
    records_path: str = "data"

    def next(self, url, params, body, headers, n_records):
        if not _json_path(body, "has_more"):
            return None
        records = _json_path(body, self.records_path) or []
        if not records:
            return None
        return url, {**params, self.param: records[-1][self.id_key]}


@dataclass
class HeaderLinkPaginator(Paginator):
    """RFC5988 Link header, rel=next (github REST)."""

    def next(self, url, params, body, headers, n_records):
        link = headers.get("Link") or headers.get("link") or ""
        for part in link.split(","):
            if 'rel="next"' in part:
                u = part.split(";")[0].strip().strip("<>")
                return u, {}
        return None


@dataclass
class SinglePagePaginator(Paginator):
    """One request, no paging — endpoints that return everything at once
    (mux assets, pokemon lists)."""

    def next(self, url, params, body, headers, n_records):
        return None


@dataclass
class StartTimePaginator(Paginator):
    """Time-cursor export protocol: next start_time from body; stop when
    no records or end_of_stream."""

    start_time_path: str = "end_time"
    start_time_param: str = "start_time"
    end_of_stream_path: str | None = "end_of_stream"

    def next(self, url, params, body, headers, n_records):
        if n_records == 0:
            return None
        if self.end_of_stream_path and _json_path(body, self.end_of_stream_path):
            return None
        nxt = _json_path(body, self.start_time_path)
        if nxt is None:
            return None
        return url, {**params, self.start_time_param: nxt}


# ---------------------------------------------------------------- JSON paths
def _json_path(obj: Any, path: str) -> Any:
    """Dot-path extraction ('a.b.0.c'); the engine's JSONPath-lite used for
    response record/cursor paths (reference sources/slack/helpers.py:24-36)."""
    cur = obj
    for part in path.split("."):
        if cur is None:
            return None
        if isinstance(cur, list):
            try:
                cur = cur[int(part)]
            except (ValueError, IndexError):
                return None
        elif isinstance(cur, dict):
            cur = cur.get(part)
        else:
            return None
    return cur


# ------------------------------------------------------------------- client
@dataclass
class RestEndpoint:
    """One resource: URL + params + where the records live in the body.

    ``stop_when(record) -> bool``: early-termination predicate — stop
    paging after the page containing the first matching record (use with
    server-side sort + a cursor bound).

    ``row_order``: the dlt ``row_order`` sort pushdown — (column,
    direction, param_name, template) rendered into the request params so
    the SERVER returns rows sorted; descending order + ``stop_when`` on
    the cursor bound is the reference's start_out_of_range early stop
    (one request past the watermark instead of the full history)."""

    url: str
    params: dict[str, Any] = field(default_factory=dict)
    records_path: str = "data"
    paginator: Paginator = field(default_factory=OffsetPaginator)
    stop_when: Callable[[dict], bool] | None = None
    row_order: tuple[str, str] | None = None  # (column, "asc"|"desc")
    row_order_param: str = "order"
    row_order_template: str = "{column}.{direction}"

    def __post_init__(self):
        if self.row_order is not None:
            col, direction = self.row_order
            if direction not in ("asc", "desc"):
                raise ValueError(f"row_order direction must be asc|desc, got {direction!r}")
            self.params = {
                **self.params,
                self.row_order_param: self.row_order_template.format(
                    column=col, direction=direction
                ),
            }


class RestClient:
    """Drives a paginator over a transport with retry/backoff; yields
    record batches (one list per page)."""

    def __init__(
        self,
        transport: Transport,
        max_retries: int = 3,
        backoff_base: float = 0.01,
        sleep: Callable[[float], None] = time.sleep,
    ):
        self.transport = transport
        self.max_retries = max_retries
        self.backoff_base = backoff_base
        self.sleep = sleep

    def _request(self, url: str, params: dict) -> tuple[dict, dict]:
        attempt = 0
        while True:
            try:
                return self.transport.request(url, params)
            except TransportError as e:
                retriable = e.status == 429 or e.status >= 500
                if not retriable or attempt >= self.max_retries:
                    raise
                # honor Retry-After on 429 (reference freshdesk_client.py:37-64)
                delay = e.retry_after if e.retry_after is not None else self.backoff_base * (2**attempt)
                self.sleep(delay)
                attempt += 1

    def pages(self, ep: RestEndpoint) -> Iterator[list[dict]]:
        url, params = ep.paginator.first(ep.url, dict(ep.params))
        while True:
            body, headers = self._request(url, params)
            records = _json_path(body, ep.records_path)
            if records is None:
                records = body if isinstance(body, list) else []
            records = list(records)
            stop = False
            if ep.stop_when is not None and records:
                # early termination (reference `start_out_of_range` /
                # `end_out_of_range`, sources/pipedrive/__init__.py:197-206,
                # sources/zendesk/__init__.py:141-143): an IO optimization —
                # once a sorted page crosses the cursor bound, stop paging.
                # The page itself still yields; the semantic range filter
                # (incremental_filter) stays in the plan.
                stop = any(ep.stop_when(r) for r in records)
            yield records
            if stop:
                return
            nxt = ep.paginator.next(url, params, body, headers, len(records))
            if nxt is None:
                return
            url, params = nxt

    def records(self, ep: RestEndpoint) -> Iterator[dict]:
        for page in self.pages(ep):
            yield from page


def poll_async_job(
    client: RestClient,
    submit_url: str,
    submit_params: dict[str, Any],
    status_path: str = "status",
    done_value: str = "completed",
    failed_value: str = "failed",
    job_url_path: str = "job_url",
    max_polls: int = 30,
    backoff_base: float = 0.01,
) -> tuple[str, dict]:
    """Async report-job protocol (reference facebook_ads insights jobs,
    sources/facebook_ads/helpers.py:134-180): submit → poll status with
    exponential backoff → return the result URL + final status body.

    Raises on failure status or poll exhaustion."""
    body, _ = client._request(submit_url, submit_params)
    job_url = _json_path(body, job_url_path) or submit_url
    for attempt in range(max_polls):
        status_body, _ = client._request(job_url, {})
        status = _json_path(status_body, status_path)
        if status == done_value:
            return _json_path(status_body, "result_url") or job_url, status_body
        if status == failed_value:
            raise TransportError(500, f"async job failed: {status_body}")
        client.sleep(backoff_base * (2**attempt))
    raise TransportError(504, f"async job did not complete after {max_polls} polls")


def fetch_to_dataframe(
    spark: SparkSession,
    client: RestClient,
    ep: RestEndpoint,
    schema: T.StructType | str,
    transform: Callable[[dict], dict] | None = None,
) -> DataFrame:
    """Extract one endpoint into a typed DataFrame.  Records pass through
    an optional per-record transform (the reference's ``msg_processor`` /
    transformer hook) before schema application."""
    rows = [transform(r) if transform else r for r in client.records(ep)]
    return spark.createDataFrame(rows, schema)  # type: ignore[arg-type]


def fetch_partitioned(
    spark: SparkSession,
    make_client: Callable[[], RestClient],
    endpoints: Sequence[RestEndpoint],
    schema: T.StructType | str,
    max_workers: int = 8,
    transform: Callable[[dict], dict] | None = None,
) -> DataFrame:
    """Parallel fan-out over endpoint instances (the reference's
    ``@dlt.defer`` thread pool, sources/chess/__init__.py:55) then one
    union'd DataFrame.  Each worker gets its own client/transport.

    At cluster scale the same shape becomes: endpoint-param DataFrame →
    ``mapPartitions(fetch)`` so executors do the IO; the driver-side pool
    here is the local[HTTP-bound] equivalent."""

    def fetch(ep: RestEndpoint) -> list[dict]:
        c = make_client()
        return [transform(r) if transform else r for r in c.records(ep)]

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        batches = list(pool.map(fetch, endpoints))
    rows = [r for b in batches for r in b]
    return spark.createDataFrame(rows, schema)  # type: ignore[arg-type]


def fetch_distributed(
    params_df: DataFrame,
    make_client: Callable[[], RestClient],
    make_endpoint: Callable[[dict], "RestEndpoint"],
    schema: T.StructType | str,
    transform: Callable[[dict, dict], dict] | None = None,
    num_slices: int | None = None,
) -> DataFrame:
    """Executor-side endpoint fan-out: one API fetch per row of
    ``params_df``, run inside ``mapPartitions`` so parameter rows never
    collect to the driver (VERDICT r1 #6 — the driver-side pool in
    ``fetch_partitioned`` bottlenecks at 100× parents).

    ``make_client`` / ``make_endpoint`` ship to executors, so they must be
    picklable; each PARTITION builds one client (connection/session reuse
    across that partition's fetches, the per-executor analogue of the
    reference's per-thread session). ``transform`` receives
    ``(record, params_row)`` so children can be tagged with parent keys.

    This is the one place per-partition imperative logic is genuine: the
    work is remote IO, not relational compute — the result lands as a
    normal DataFrame and everything downstream is Catalyst-planned.
    """
    spark = params_df.sparkSession
    if num_slices is None:
        num_slices = spark.sparkContext.defaultParallelism
    # spread param rows so fetches parallelize across executors even when
    # the param frame arrives as one partition (single-file scan)
    spread = params_df.repartition(min(num_slices, max(1, params_df.count())))

    def run(it):
        client = make_client()
        for row in it:
            p = row.asDict()
            ep = make_endpoint(p)
            for rec in client.records(ep):
                yield transform(rec, p) if transform else rec

    rdd = spread.rdd.mapPartitions(run)
    return spark.createDataFrame(rdd, schema)  # type: ignore[arg-type]


def records_to_json_df(spark: SparkSession, records: list[dict]) -> DataFrame:
    """Schema-on-read fallback: land records as JSON strings and let the
    normalizer (operators.normalize.parse_json_column) type them."""
    return spark.createDataFrame([(json.dumps(r),) for r in records], "raw string")
