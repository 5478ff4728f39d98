from verified_sources_spark.streaming.bounded import (  # noqa: F401
    bounded_file_stream,
    run_available_now,
    foreach_batch_merge,
)
from verified_sources_spark.streaming.corpus_ingest import CorpusIngest  # noqa: F401
