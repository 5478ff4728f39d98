"""applyInPandasWithState: state persists across micro-batches and runs."""

from __future__ import annotations

import json

from verified_sources_spark.streaming.bounded import bounded_file_stream
from verified_sources_spark.streaming.stateful import running_counts

SCHEMA = "key string, value double"


def _write(dirpath, name, rows):
    (dirpath / name).write_text("\n".join(json.dumps(r) for r in rows) + "\n")


def _run(spark, src, ckpt, out):
    stream = bounded_file_stream(spark, str(src), SCHEMA)
    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(str(out))

    q = (
        running_counts(stream)
        .writeStream.foreachBatch(sink)  # update-mode op → foreachBatch sink
        .outputMode("update")
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(str(out))


def test_state_survives_across_runs(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write(src, "b1.json", [{"key": "a", "value": 1.0}, {"key": "a", "value": 2.0}, {"key": "b", "value": 5.0}])
    out1 = _run(spark, src, tmp_path / "ck", tmp_path / "out")
    rows1 = {r["key"]: (r["n"], r["last_value"]) for r in out1.collect()}
    assert rows1 == {"a": (2, 2.0), "b": (1, 5.0)}

    # second bounded run: counts continue from checkpointed state
    _write(src, "b2.json", [{"key": "a", "value": 9.0}, {"key": "c", "value": 7.0}])
    out2 = _run(spark, src, tmp_path / "ck", tmp_path / "out")
    latest = {}
    for r in out2.collect():  # append-mode sink: keep max n per key
        k = r["key"]
        if k not in latest or r["n"] > latest[k][0]:
            latest[k] = (r["n"], r["last_value"])
    assert latest["a"] == (3, 9.0)  # 2 from run1 + 1 new, state carried
    assert latest["c"] == (1, 7.0)


def test_sessionize_stateful_gap_close_matches_batch_rule(spark, tmp_path):
    """Streaming sessionizer: a gap above the threshold closes the session
    and emits it; the open session stays in state (append mode emits only
    CLOSED sessions). Gap rule identical to the batch sessionizer."""
    from verified_sources_spark.streaming.stateful import sessionize_stateful

    src = tmp_path / "src"
    src.mkdir()
    GAP = 30 * 60 * 1_000_000  # 30 min in us
    t0 = 1_700_000_000_000_000
    _write(src, "b1.json", [
        {"user": "u1", "ts_us": t0},
        {"user": "u1", "ts_us": t0 + 60_000_000},          # same session (1 min later)
        {"user": "u1", "ts_us": t0 + GAP + 120_000_000},   # gap -> closes session 1
        {"user": "u2", "ts_us": t0},
    ])

    out = tmp_path / "out"

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(str(out))

    stream = bounded_file_stream(spark, str(src), "user string, ts_us long")
    # NOTE: timer-bearing stateful queries never self-terminate (state
    # cleanup batches keep the trigger active) and processAllAvailable can
    # block on them — so poll the sink for the expected emission, then stop.
    q = (
        sessionize_stateful(stream, gap_us=GAP)
        .writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    import time

    deadline = time.time() + 90
    while time.time() < deadline:
        try:
            if spark.read.parquet(str(out)).count() >= 1:
                break
        except Exception:
            pass  # sink dir not created yet
        time.sleep(1)
    q.stop()
    q.awaitTermination()

    rows = [tuple(r) for r in spark.read.parquet(str(out)).collect()]
    # exactly ONE closed session: u1's first (2 events, 60s span).
    # u1's second session and u2's only session remain open in state.
    assert rows == [("u1", t0, t0 + 60_000_000, 2)]
