"""Source connectors: filesystem, REST framework, message streams, CDC,
spreadsheet grids.

Connectors produce DataFrames with explicit schemas and pushdown-style
options (predicates / column lists / cursor ranges) — the engine's
equivalent of the reference's ``@dlt.source`` packages.  IO against
remote APIs happens in the connector adapter (driver side or
``mapPartitions``); everything after that is a plain DataFrame.
"""

from verified_sources_spark.sources.filesystem import read_files  # noqa: F401
from verified_sources_spark.sources.rest import (  # noqa: F401
    CursorPaginator,
    HeaderLinkPaginator,
    KeysetPaginator,
    LocalPagesTransport,
    OffsetPaginator,
    PageNumberPaginator,
    RestClient,
    RestEndpoint,
    StartTimePaginator,
)
