"""End-to-end example: the engine's full ELT loop in one script.

    python examples/incremental_pipeline.py [workdir]

Run it twice: the second run extracts only past the stored cursor,
re-reads the boundary, and the keyed merge dedups — the reference's
incremental contract (SURVEY.md §2.3/§2.9) on DataFrames.

Flow: paginated REST extract (local fixture transport) → incremental
cursor window → typed landing → keyed MERGE into a parquet sink →
per-type table routing → data-quality report.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from verified_sources_spark import get_spark
from verified_sources_spark.operators.incremental import CursorStore, max_cursor_value
from verified_sources_spark.operators.merge import ParquetSink
from verified_sources_spark.operators.quality import profile
from verified_sources_spark.operators.routing import route_by_column
from verified_sources_spark.sources.rest import (
    KeysetPaginator,
    LocalPagesTransport,
    RestClient,
    RestEndpoint,
    fetch_to_dataframe,
)

# fixture "API": two pages of orders-ish records, keyset-paginated
PAGES = {
    "https://api.example/v1/orders": [
        (
            {
                "data": [
                    {"id": "o1", "created": 100, "status": "open", "amount": 10.0},
                    {"id": "o2", "created": 150, "status": "open", "amount": 20.0},
                ],
                "has_more": True,
            },
            {},
        ),
        (
            {
                "data": [
                    {"id": "o3", "created": 200, "status": "closed", "amount": 30.0},
                ],
                "has_more": False,
            },
            {},
        ),
    ]
}


def run(workdir: str) -> None:
    spark = get_spark("example", master="local[4]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    store = CursorStore(os.path.join(workdir, "state", "cursors.json"))
    last = store.get("orders", 0)
    print(f"cursor(orders) = {last}")

    # extract: cursor pushed into the request (created >= last re-reads the
    # boundary; the merge below dedups it)
    client = RestClient(LocalPagesTransport(PAGES))
    ep = RestEndpoint(
        "https://api.example/v1/orders",
        params={"created[gte]": last},
        paginator=KeysetPaginator(),
    )
    df = fetch_to_dataframe(
        spark, client, ep, "id string, created long, status string, amount double"
    )
    print(f"extracted {df.count()} records")

    # load: keyed merge (upsert) + cursor advance
    sink = ParquetSink(spark, os.path.join(workdir, "orders"))
    sink.merge(df, keys=["id"], dedup_sort=["created"])
    new_cursor = max_cursor_value(df, "created")
    if new_cursor is not None:
        store.set("orders", new_cursor)
    print(f"table rows = {sink.read().count()}, cursor -> {store.get('orders')}")

    # route: one table per status value (single partitioned write)
    tables = route_by_column(sink.read(), "status", os.path.join(workdir, "routed"))
    print(f"routed tables: {sorted(tables)}")

    # validate: single-pass profile
    profile(sink.read()).show(truncate=False)
    spark.stop()


if __name__ == "__main__":
    run(sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="vss_example_"))
