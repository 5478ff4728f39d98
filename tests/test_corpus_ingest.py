"""End-to-end streaming corpus ingestion (streaming/corpus_ingest.py)."""

from __future__ import annotations

import json

import pyspark.sql.functions as F

from verified_sources_spark.operators.table_format import ManifestTable
from verified_sources_spark.streaming.bounded import bounded_file_stream
from verified_sources_spark.streaming.corpus_ingest import CorpusIngest

SCHEMA = "doc_id long, text string, source string"

GOOD = (
    "the quick brown fox jumps over the lazy dog and then the dog naps "
    "while the fox runs to the forest to find a meal of the day"
)
# a second base text sharing no shingles with GOOD, so the two standing
# docs never band-collide with each other (in-batch near-dedup is
# candidate-level: any band collision with a lower id drops the doc)
GOOD2 = (
    "deep in the winter harbor an old sailor mends a torn grey sail and "
    "hums a slow tune about distant islands rich with fruit and warm rain"
)


def _land(tmp_path, name: str, rows: list[tuple[int, str, str]]) -> None:
    lines = [
        json.dumps({"doc_id": i, "text": t, "source": s}) for i, t, s in rows
    ]
    (tmp_path / name).write_text("\n".join(lines))


def _mk(spark, tmp_path):
    docs = ManifestTable(spark, str(tmp_path / "docs"))
    fps = ManifestTable(spark, str(tmp_path / "fps"))
    return CorpusIngest(docs, fps, quality_min=0.2)


def test_ingest_dedups_within_and_across_batches(spark, tmp_path):
    land = tmp_path / "landing"
    land.mkdir()
    # batch A: two distinct docs + one in-batch exact dup + one in-batch
    # NEAR dup (band-collides with doc 1, lowest id wins) + one junk doc
    _land(land, "a.json", [
        (1, GOOD + " first document body", "s1"),
        (2, GOOD2 + " second document body", "s1"),
        (3, GOOD + " first document body", "s2"),   # exact dup of 1, same batch
        (4, "@@@@ ###", "s2"),                       # fails the quality gate
        (5, GOOD + " first document body extra", "s2"),  # near dup of 1, same batch
    ])
    ing = _mk(spark, tmp_path)
    stream = bounded_file_stream(spark, str(land), SCHEMA, max_files_per_trigger=1)
    ing.run(stream, str(tmp_path / "ckpt"))
    got = {r["doc_id"] for r in ing.docs_table.read().collect()}
    assert got == {1, 2}

    # batch B: exact dup of standing doc, near dup of standing doc, fresh doc
    _land(land, "b.json", [
        (10, GOOD + " first document body", "s3"),            # exact dup of 1
        (11, GOOD2 + " second document body extra", "s3"),    # near dup of 2
        (12, "an entirely different tale about the spark engine and the "
             "catalyst optimizer that rewrites the plan of the day for the "
             "cluster to run with the best of the shuffles", "s3"),
    ])
    stream = bounded_file_stream(spark, str(land), SCHEMA, max_files_per_trigger=1)
    ing.run(stream, str(tmp_path / "ckpt"))
    got = {r["doc_id"] for r in ing.docs_table.read().collect()}
    assert got == {1, 2, 12}
    # fingerprint table covers every accepted doc: md5 + 4 bands each
    fp_kinds = {
        (r["doc_id"], r["kind"]) for r in ing.fp_table.read().collect()
    }
    for d in (1, 2, 12):
        assert (d, "md5") in fp_kinds
        assert (d, "band0") in fp_kinds and (d, "band3") in fp_kinds


def test_replay_after_crash_between_commits_is_idempotent(spark, tmp_path):
    ing = _mk(spark, tmp_path)
    batch = spark.createDataFrame(
        [(1, GOOD + " replay body one", "s1"), (2, GOOD2 + " replay body two", "s1")],
        SCHEMA,
    )
    # crash simulation: docs commit lands (tagged, as apply_batch writes
    # it), fingerprint commit does not
    acc = ing.accepted(batch).localCheckpoint(eager=True)
    tagged = acc.withColumn("_ingest_stream", F.lit(ing.stream_id)).withColumn(
        "_ingest_batch", F.lit(0)
    )
    ing.docs_table.append(tagged, stream=(ing.stream_id, 0))
    assert ing.fp_table.last_batch_id(ing.stream_id) is None

    # replay of batch 0: docs skipped (no new version), fingerprints redone
    v_docs_before = ing.docs_table.latest_version()
    ing.apply_batch(batch, 0)
    assert ing.docs_table.latest_version() == v_docs_before
    assert ing.fp_table.last_batch_id(ing.stream_id) == 0
    assert ing.docs_table.read().count() == 2
    assert ing.fp_table.read().filter(F.col("kind") == "md5").count() == 2

    # full replay of an already-complete batch: both tables untouched
    v_fp = ing.fp_table.latest_version()
    ing.apply_batch(batch, 0)
    assert ing.docs_table.latest_version() == v_docs_before
    assert ing.fp_table.latest_version() == v_fp

    # next batch appends one version per table (distinct content — the
    # fixed minhash family correctly near-dups another "replay body" doc)
    batch2 = spark.createDataFrame(
        [(3, "a wholly different story of the catalyst planner and the "
             "tungsten engine that turn a declared plan into the stages "
             "of a cluster run with the least of the shuffles", "s2")], SCHEMA
    )
    ing.apply_batch(batch2, 1)
    assert ing.docs_table.read().count() == 3
    assert ing.docs_table.last_batch_id(ing.stream_id) == 1


def test_ingest_jaccard_verified_near_dedup(spark, tmp_path):
    """min_jaccard verifies band collisions against the standing DOCS
    table: a true near-dup is rejected below its real Jaccard and
    accepted when the threshold exceeds it."""
    def mk(thr, sub):
        docs = ManifestTable(spark, str(tmp_path / sub / "docs"))
        fps = ManifestTable(spark, str(tmp_path / sub / "fps"))
        return CorpusIngest(docs, fps, quality_min=0.2, min_jaccard=thr)

    day1 = spark.createDataFrame(
        [(1, GOOD + " standing body one", "s1"), (2, GOOD2 + " standing body two", "s1")],
        SCHEMA,
    )
    near = spark.createDataFrame(
        [(10, GOOD2 + " standing body two extra", "s2")], SCHEMA  # J ~0.9 vs doc 2
    )

    moderate = mk(0.5, "m")
    moderate.apply_batch(day1, 0)
    moderate.apply_batch(near, 1)
    assert {r["doc_id"] for r in moderate.docs_table.read().collect()} == {1, 2}

    strict = mk(0.999, "s")
    strict.apply_batch(day1, 0)
    strict.apply_batch(near, 1)
    assert {r["doc_id"] for r in strict.docs_table.read().collect()} == {1, 2, 10}


def test_in_batch_near_dup_jaccard_verified(spark, tmp_path):
    """Same-batch band collisions honor min_jaccard: a moderate threshold
    drops the in-batch near dup (lowest id wins), a stricter-than-actual
    threshold keeps both."""
    def mk(thr, sub):
        docs = ManifestTable(spark, str(tmp_path / sub / "docs"))
        fps = ManifestTable(spark, str(tmp_path / sub / "fps"))
        return CorpusIngest(docs, fps, quality_min=0.2, min_jaccard=thr)

    batch = spark.createDataFrame(
        [(1, GOOD + " same batch body", "s1"),
         (20, GOOD + " same batch body extra", "s1")],  # J ~0.9 vs doc 1
        SCHEMA,
    )
    moderate = mk(0.5, "m2")
    moderate.apply_batch(batch, 0)
    assert {r["doc_id"] for r in moderate.docs_table.read().collect()} == {1}

    strict = mk(0.999, "s2")
    strict.apply_batch(batch, 0)
    assert {r["doc_id"] for r in strict.docs_table.read().collect()} == {1, 20}


def test_batch_id_regression_raises(spark, tmp_path):
    """A fresh checkpoint dir restarts batch ids at 0; reusing the tables
    and stream_id must fail loudly, not silently skip every batch."""
    import pytest

    ing = _mk(spark, tmp_path)
    b0 = spark.createDataFrame([(1, GOOD + " regression one", "s1")], SCHEMA)
    b1 = spark.createDataFrame([(2, GOOD2 + " regression two", "s1")], SCHEMA)
    ing.apply_batch(b0, 0)
    ing.apply_batch(b1, 1)
    # replay of the LAST batch is a legitimate idempotent skip
    ing.apply_batch(b1, 1)
    assert ing.docs_table.read().count() == 2
    # a batch id below the committed high-water mark is a config error
    with pytest.raises(ValueError, match="regressed below"):
        ing.apply_batch(b0, 0)


def test_recreated_checkpoint_at_highwater_raises(spark, tmp_path):
    """batch_id == high-water with DIFFERENT input rows is a recreated
    checkpoint (ids restarted at 0), not a replay — must raise, not
    silently swallow the new batch."""
    import pytest

    ing = _mk(spark, tmp_path)
    b0 = spark.createDataFrame([(1, GOOD + " token alpha", "s1")], SCHEMA)
    ing.apply_batch(b0, 0)
    # genuine replay: identical rows, same id → idempotent skip
    ing.apply_batch(b0, 0)
    assert ing.docs_table.read().count() == 1
    # recreated checkpoint: NEW rows delivered as batch 0 again
    b_new = spark.createDataFrame([(2, GOOD2 + " token beta", "s1")], SCHEMA)
    with pytest.raises(ValueError, match="DIFFERENT input rows"):
        ing.apply_batch(b_new, 0)


def test_input_token_distinguishes_multiplicity(spark, tmp_path):
    """The batch input token must change when row MULTIPLICITY changes:
    {A,A,A,B} vs {A,B,B,B} share count and XOR-of-hashes, so a pure
    count+xor digest would classify a different restarted batch as a
    replay and silently skip it.  The wrapping hash-sum component breaks
    the tie; row ORDER still doesn't matter."""
    ing = _mk(spark, tmp_path)
    A, B = (1, "x", "s"), (2, "y", "s")
    ta = ing._input_token(spark.createDataFrame([A, A, A, B], SCHEMA))
    tb = ing._input_token(spark.createDataFrame([A, B, B, B], SCHEMA))
    assert ta != tb
    rev = ing._input_token(spark.createDataFrame([B, A, A, A], SCHEMA))
    assert rev == ta
