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


SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user", T.StringType()),
        T.StructField("session_start_us", T.LongType()),
        T.StructField("session_end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def sessionize_stateful(
    stream_df: DataFrame,
    key_col: str = "user",
    ts_col: str = "ts_us",
    gap_us: int = 30 * 60 * 1_000_000,
) -> DataFrame:
    """Streaming sessionizer with processing-time state TIMEOUT: per key,
    events accumulate into an open session; a gap above ``gap_us`` between
    event timestamps — or state timeout firing with no new events — CLOSES
    the session and emits one (start, end, count) row.

    This is the reference's session-close heuristic (matomo
    visit_timeout, sessionize_events's batch formulation) lifted into
    ``applyInPandasWithState``: state is one open session per key
    (O(distinct keys)), emission happens on close — the batch and
    streaming implementations agree on the same gap rule (cross-checked
    in tests/test_stateful.py)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        out: list[tuple] = []
        if state.hasTimedOut:
            if state.exists:
                start, last, n = state.get
                out.append((key[0], start, last, n))
            state.remove()
        else:
            ts: list[int] = []
            for pdf in pdfs:
                ts.extend(int(v) for v in pdf[ts_col])
            ts.sort()
            if ts:
                if state.exists:
                    start, last, n = state.get
                else:
                    start, last, n = ts[0], ts[0], 0
                for t in ts:
                    if t - last > gap_us:
                        out.append((key[0], start, last, n))
                        start, n = t, 0
                    last = t
                    n += 1
                state.update((start, last, n))
                state.setTimeoutDuration(gap_us // 1000 or 1)
        if out:
            yield pd.DataFrame(
                out, columns=["user", "session_start_us", "session_end_us", "n_events"]
            )

    return stream_df.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
