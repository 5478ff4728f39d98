"""Custom stateful streaming operators (applyInPandasWithState).

The reference's stateful pieces are offset trackers and session-close
heuristics held in pipeline state (SURVEY.md §2.11).  In Structured
Streaming the engine-native analogue is ``applyInPandasWithState``: state
lives in the checkpointed state store, keyed by group, updated per
micro-batch.

``running_counts``: canonical keyed-counter operator — per key, total
rows and last-seen value across all micro-batches.  Used by tests with
the file source + AvailableNow; the same code runs against Kafka.

Scale note: state is partitioned by key across executors (state-store
shuffle on the grouping key — the only shuffle in the pipeline); state
size is O(distinct keys), not O(rows).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

COUNT_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("last_value", T.DoubleType()),
    ]
)

COUNT_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType()),
        T.StructField("n", T.LongType()),
        T.StructField("last_value", T.DoubleType()),
    ]
)


def _update_counts(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, last = state.get if state.exists else (0, None)
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            last = float(pdf["value"].iloc[-1])
    state.update((n, last))
    yield pd.DataFrame({"key": [key[0]], "n": [n], "last_value": [last]})


def running_counts(stream_df: DataFrame, key_col: str = "key") -> DataFrame:
    """Keyed running (count, last_value) with update-mode output."""
    return (
        stream_df.groupBy(key_col)
        .applyInPandasWithState(
            _update_counts,
            outputStructType=COUNT_OUTPUT_SCHEMA,
            stateStructType=COUNT_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
