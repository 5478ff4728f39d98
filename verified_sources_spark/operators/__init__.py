"""Dataflow operators: the engine's core (SURVEY.md §2.3-§2.9)."""

from verified_sources_spark.operators.incremental import (  # noqa: F401
    CursorStore,
    incremental_filter,
    max_cursor_value,
    date_range_chunks,
)
from verified_sources_spark.operators.dedup import (  # noqa: F401
    drop_exact_duplicates,
    keep_latest,
)
from verified_sources_spark.operators.merge import (  # noqa: F401
    ParquetSink,
    merge_dataframes,
)
from verified_sources_spark.operators.routing import route_by_column  # noqa: F401
