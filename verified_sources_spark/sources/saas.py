"""Concrete SaaS connectors expressed as config + transforms over the
REST framework — demonstrating that each reference connector reduces to
(endpoint config, paginator, schema, small DataFrame transform).

Implemented connector shapes (SURVEY.md §2.1):

- ``zendesk_tickets``  — incremental time-export + custom-field pivot
  (reference sources/zendesk/__init__.py:218-436,
  helpers/api_helpers.py:20-80)
- ``hubspot_objects``  — property selection, archived+live union with
  ``is_deleted`` flag, stage-date unpivot
  (reference sources/hubspot/__init__.py:92-105, 186-219)
- ``pipedrive_recents`` — /recents incremental feed + custom-field
  hash→name rename with first-seen-wins state
  (reference sources/pipedrive/__init__.py:30-34,
  helpers/custom_fields_munger.py:44-102)
- ``stripe_incremental`` — keyset pagination + created >= cursor pushdown
  (reference sources/stripe_analytics/__init__.py:54-60, helpers.py:11-39)
- ``github_events``    — Link-header pagination + per-event-type table
  routing (reference sources/github/__init__.py:68-90, helpers.py:25-43)

Every connector returns plain DataFrames; sinks/dispositions come from
operators.merge per the hints the reference declares (merge on pk,
replace, append)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from verified_sources_spark.operators.pivot import custom_field_pivot, rename_from_mapping, unpivot
from verified_sources_spark.sources.rest import (
    HeaderLinkPaginator,
    KeysetPaginator,
    OffsetPaginator,
    RestClient,
    RestEndpoint,
    StartTimePaginator,
    fetch_to_dataframe,
)


# ------------------------------------------------------------------ zendesk
TICKET_SCHEMA = (
    "id long, updated_at string, status string, tags array<string>, "
    "custom_fields array<struct<id:long, value:string>>"
)


def zendesk_tickets(
    spark: SparkSession,
    client: RestClient,
    base_url: str,
    start_time: int,
    fields_dim: DataFrame | None = None,
) -> DataFrame:
    """Incremental ticket export from ``start_time``; custom fields pivoted
    to columns when the fields dimension is supplied."""
    ep = RestEndpoint(
        f"{base_url}/incremental/tickets",
        params={"start_time": start_time},
        records_path="tickets",
        paginator=StartTimePaginator(),
    )
    df = fetch_to_dataframe(spark, client, ep, TICKET_SCHEMA)
    if fields_dim is not None:
        pivoted = custom_field_pivot(df, fields_dim, "id")
        df = df.drop("custom_fields").join(pivoted, "id", "left")
    return df


# ------------------------------------------------------------------ hubspot
def hubspot_objects(
    spark: SparkSession,
    client: RestClient,
    base_url: str,
    object_type: str,
    properties: list[str],
    include_archived: bool = True,
) -> DataFrame:
    """CRM objects: live + archived unioned with an ``is_deleted`` flag
    (the reference's soft-delete context, sources/hubspot/__init__.py:92-105).
    Property list is explicit — the connector-level projection pushdown."""
    schema = "id long, " + ", ".join(f"{p} string" for p in properties)
    prop_param = ",".join(properties)

    def _fetch(archived: bool) -> DataFrame:
        ep = RestEndpoint(
            f"{base_url}/objects/{object_type}",
            params={"properties": prop_param, "archived": str(archived).lower()},
            records_path="results",
            paginator=OffsetPaginator(limit=100, offset_param="after"),
        )
        return fetch_to_dataframe(
            spark, client, ep, schema,
            transform=lambda r: {"id": r["id"], **r.get("properties", {})},
        ).withColumn("is_deleted", F.lit(archived))

    live = _fetch(False)
    return live.unionByName(_fetch(True), allowMissingColumns=True) if include_archived else live


def hubspot_stage_unpivot(df: DataFrame, id_col: str, stage_cols: list[str]) -> DataFrame:
    """Wide `hs_date_entered_<stage>` columns → long (id, stage, date_entered)
    (reference sources/hubspot/__init__.py:186-219)."""
    long = unpivot(df, [id_col], stage_cols, "stage", "date_entered")
    return long.withColumn("stage", F.regexp_replace("stage", "^hs_date_entered_", "")).filter(
        F.col("date_entered").isNotNull()
    )


# ---------------------------------------------------------------- pipedrive
@dataclass
class FieldMappingState:
    """Custom-field hash→name mapping with first-seen-wins persistence
    (reference custom_fields_munger.py:44-80): once a hash maps to a name,
    later renames don't break existing columns."""

    mapping: dict[str, str] = field(default_factory=dict)

    def update(self, fields: list[dict[str, Any]], key="key", name="name") -> None:
        for f_ in fields:
            self.mapping.setdefault(f_[key], f_[name])


def pipedrive_recents(
    spark: SparkSession,
    client: RestClient,
    base_url: str,
    since: str,
    schema: str,
    field_state: FieldMappingState | None = None,
) -> DataFrame:
    """/recents incremental entity feed; custom-field columns renamed via
    the persisted mapping."""
    ep = RestEndpoint(
        f"{base_url}/recents",
        params={"since_timestamp": since, "limit": 500},
        records_path="data",
        paginator=OffsetPaginator(limit=500, offset_param="start"),
    )
    df = fetch_to_dataframe(spark, client, ep, schema, transform=lambda r: r.get("data", r))
    if field_state:
        df = rename_from_mapping(df, field_state.mapping)
    return df


# ------------------------------------------------------------------- stripe
def stripe_incremental(
    spark: SparkSession,
    client: RestClient,
    base_url: str,
    endpoint: str,
    schema: str,
    created_gte: int | None = None,
) -> DataFrame:
    """Append-mode incremental endpoint: keyset pagination ordered by id,
    ``created >= watermark`` pushed into the request params."""
    params: dict[str, Any] = {"limit": 100}
    if created_gte is not None:
        params["created[gte]"] = created_gte
    ep = RestEndpoint(
        f"{base_url}/v1/{endpoint}",
        params=params,
        records_path="data",
        paginator=KeysetPaginator(),
    )
    return fetch_to_dataframe(spark, client, ep, schema)


# ------------------------------------------------------- transformer chains
def chained_detail_fetch(
    spark: SparkSession,
    make_client,
    parent: DataFrame,
    parent_key: str,
    url_template: str,
    schema: str,
    records_path: str = "data",
    max_workers: int = 8,
) -> DataFrame:
    """Parent→child transformer chain (reference asana workspaces →
    projects → tasks → stories, sources/asana_dlt/__init__.py:64-207;
    workable candidates → details, workable/__init__.py:92-120): each
    parent row fans out one detail endpoint; children carry the parent
    key.  The endpoint list derives from the parent DataFrame (a
    metadata-sized collect of KEYS, not rows), then fetches run in the
    shared thread-pool fan-out and land as one DataFrame — an
    index-nested-loop join against a remote API."""
    from verified_sources_spark.sources.rest import RestEndpoint

    keys = [r[parent_key] for r in parent.select(parent_key).distinct().collect()]
    endpoints = [
        RestEndpoint(url_template.format(key=k), records_path=records_path) for k in keys
    ]
    key_by_url = {ep.url: k for ep, k in zip(endpoints, keys)}

    # fetch per-endpoint so each child record can be tagged with its
    # parent key before landing
    from concurrent.futures import ThreadPoolExecutor

    def fetch(ep: RestEndpoint):
        c = make_client()
        return [{**r, parent_key: key_by_url[ep.url]} for r in c.records(ep)]

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        batches = list(pool.map(fetch, endpoints))
    rows = [r for b in batches for r in b]
    return spark.createDataFrame(rows, schema)


def chained_detail_fetch_distributed(
    parent: DataFrame,
    make_client,
    parent_key: str,
    url_template: str,
    schema: str,
    records_path: str = "data",
    num_slices: int | None = None,
) -> DataFrame:
    """Executor-side variant of ``chained_detail_fetch``: parent keys stay
    a DataFrame end-to-end (distinct → repartition → ``mapPartitions``
    fetch), so nothing collects to the driver and fetch parallelism scales
    with the cluster instead of one thread pool (VERDICT r1 #6). Results
    are row-equal to the driver-side path (asserted in
    tests/test_saas_connectors.py)."""
    from verified_sources_spark.sources.rest import RestEndpoint, fetch_distributed

    keys_df = parent.select(parent_key).distinct()
    return fetch_distributed(
        keys_df,
        make_client,
        lambda p: RestEndpoint(
            url_template.format(key=p[parent_key]), records_path=records_path
        ),
        schema,
        transform=lambda rec, p: {**rec, parent_key: p[parent_key]},
        num_slices=num_slices,
    )


# -------------------------------------------------------- pushed-down query builders
def build_soql(
    fields: list[str],
    sobject: str,
    replication_key: str | None = None,
    last_state: str | None = None,
    limit: int | None = None,
) -> str:
    """Salesforce SOQL with incremental predicate + sort pushdown
    (reference sources/salesforce/helpers/records.py:85-94): the engine's
    cursor becomes a server-side WHERE/ORDER BY, not a post-filter."""
    q = f"SELECT {', '.join(fields)} FROM {sobject}"
    if replication_key and last_state:
        q += f" WHERE {replication_key} > {last_state} ORDER BY {replication_key} ASC"
    if limit:
        q += f" LIMIT {limit}"
    return q


def build_gaql(
    fields: list[str],
    resource: str,
    during: str | None = None,
    where: str | None = None,
    limit: int | None = None,
) -> str:
    """Google Ads GAQL (reference sources/google_ads/__init__.py:141)."""
    q = f"SELECT {', '.join(fields)} FROM {resource}"
    clauses = []
    if where:
        clauses.append(where)
    if during:
        clauses.append(f"segments.date DURING {during}")
    if clauses:
        q += " WHERE " + " AND ".join(clauses)
    if limit:
        q += f" LIMIT {limit}"
    return q


# ----------------------------------------------------------- report fetchers
def report_to_fact_table(
    spark: SparkSession,
    client: RestClient,
    base_url: str,
    dimensions: list[str],
    metrics: list[str],
    rows_per_page: int = 1000,
) -> DataFrame:
    """GA4/Matomo-shape report fetch (reference
    sources/google_analytics/helpers/data_processing.py:54-137): the API
    returns a pre-aggregated report as parallel dimension/metric value
    arrays; rows are assembled by zipping headers x values and land as a
    typed fact table (metrics double, dimensions string)."""
    schema = ", ".join([f"{d} string" for d in dimensions] + [f"{m} double" for m in metrics])
    ep = RestEndpoint(
        f"{base_url}/runReport",
        params={"dimensions": ",".join(dimensions), "metrics": ",".join(metrics)},
        records_path="rows",
        paginator=OffsetPaginator(limit=rows_per_page),
    )

    def assemble(r: dict) -> dict:
        out = dict(zip(dimensions, [v["value"] for v in r["dimensionValues"]]))
        out.update(zip(metrics, [float(v["value"]) for v in r["metricValues"]]))
        return out

    return fetch_to_dataframe(spark, client, ep, schema, transform=assemble)


# ------------------------------------------------------------------- github
def github_events(
    spark: SparkSession,
    client: RestClient,
    base_url: str,
    repo: str,
) -> DataFrame:
    """Repo events with Link-header pagination; the ``type`` column is the
    table-routing key (one table per event type downstream via
    operators.routing.route_by_column)."""
    ep = RestEndpoint(
        f"{base_url}/repos/{repo}/events",
        records_path="data",
        paginator=HeaderLinkPaginator(),
    )
    return fetch_to_dataframe(
        spark, client, ep, "id string, type string, actor string, created_at string"
    )
