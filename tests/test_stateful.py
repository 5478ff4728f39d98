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
