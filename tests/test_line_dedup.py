"""Corpus-level line dedup (llm/line_dedup): planted cross-document
boilerplate is scrubbed (or kept once), unique content survives intact,
and the plan aggregates on the unit hash with no corpus-wide window or
unbounded collect."""

from __future__ import annotations

from verified_sources_spark.llm.line_dedup import (
    line_dedup,
    rebuild_docs,
    split_lines,
    split_token_windows,
)

BANNER = "accept all cookies to continue"
DOCS = [
    (1, f"{BANNER}\nalpha beta gamma\ndelta epsilon"),
    (2, f"{BANNER}\nzeta eta theta"),
    (3, f"{BANNER}\niota kappa\n{BANNER}"),
    (4, "unique document with no boilerplate at all"),
]


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_scrub_removes_every_banner_copy(spark):
    lines = split_lines(_docs_df(spark), "doc_id", "text")
    kept = line_dedup(lines, min_occurrences=2)
    out = {
        r["doc_id"]: r
        for r in rebuild_docs(kept, lines).collect()
    }
    assert out[1]["text_clean"] == "alpha beta gamma\ndelta epsilon"
    assert out[2]["text_clean"] == "zeta eta theta"
    assert out[3]["text_clean"] == "iota kappa"
    assert out[4]["text_clean"] == DOCS[3][1]
    assert out[3]["n_dropped"] == 2  # both in-doc banner copies gone
    assert out[4]["n_dropped"] == 0
    # every original document survives as a row
    assert set(out) == {1, 2, 3, 4}


def test_keep_first_retains_single_occurrence(spark):
    lines = split_lines(_docs_df(spark), "doc_id", "text")
    kept = line_dedup(lines, min_occurrences=2, keep_first=True)
    out = {r["doc_id"]: r for r in rebuild_docs(kept, lines).collect()}
    # the smallest (doc_id, pos) occurrence — doc 1 pos 0 — is the keeper
    assert out[1]["text_clean"].startswith(BANNER)
    assert BANNER not in out[2]["text_clean"]
    assert BANNER not in out[3]["text_clean"]


def test_token_windows_rejoin_identity_when_nothing_dropped(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i j"), (2, "one two three"), (3, "")],
        "doc_id long, text string",
    )
    lines = split_token_windows(df, "doc_id", "text", window=4)
    rows = {(r["doc_id"], r["pos"]): r["line"] for r in lines.collect()}
    assert rows[(1, 0)] == "a b c d"
    assert rows[(1, 2)] == "i j"  # trailing partial window
    assert rows[(2, 0)] == "one two three"
    assert not any(d == 3 for d, _ in rows)  # empty doc yields no units
    # all windows unique -> rebuild reproduces the tokenized text
    kept = line_dedup(lines, min_occurrences=2)
    out = {r["doc_id"]: r["text_clean"] for r in rebuild_docs(kept, lines, sep=" ").collect()}
    assert out[1] == "a b c d e f g h i j"


def test_plan_shape_hash_partitioned_single_pass(spark):
    lines = split_token_windows(_docs_df(spark), "doc_id", "text", window=2)
    plan = rebuild_docs(
        line_dedup(lines, min_occurrences=2, keep_first=True, keep_flag="_keep"),
        None,
        keep_col="_keep",
    )._jdf.queryExecution().executedPlan().toString()
    # count/argmin come from a window partitioned by the UNIT HASH — never a
    # corpus-wide single-partition window
    assert "SinglePartition" not in plan
    assert "windowspecdefinition(_h#" in plan
    # the fused flag+rebuild path runs one pass: no groupBy-join-back fork
    assert "Join" not in plan
    assert plan.count("regexp_extract_all") == 1


def test_flagged_rebuild_matches_two_table_rebuild(spark):
    lines = split_lines(_docs_df(spark), "doc_id", "text")
    kept = line_dedup(lines, min_occurrences=2, keep_first=True)
    old = sorted(map(tuple, rebuild_docs(kept, lines).collect()))
    flagged = line_dedup(lines, min_occurrences=2, keep_first=True, keep_flag="_keep")
    new = sorted(
        map(tuple, rebuild_docs(flagged, None, keep_col="_keep").collect())
    )
    assert old == new
