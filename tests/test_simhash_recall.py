"""SimHash completeness (tools/simhash_recall_sweep): the banded
pair lister must match brute-force popcount EXACTLY (pigeonhole is a
theorem — any miss is an implementation bug), and the linear
dedup-group scheme's under-merge stays bounded."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/tools")

from simhash_recall_sweep import brute_force_pairs, closure  # noqa: E402


def test_near_pairs_exactly_match_brute_force(spark):
    """On real testdata, banded candidates == brute-force popcount
    pairs at hamming<=3 — zero missing (pigeonhole), zero spurious
    (the hamming filter)."""
    from verified_sources_spark.llm.simhash import (
        simhash64,
        simhash_near_pairs,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text")
    sigs = {int(r["doc_id"]): int(r["simhash"]) & ((1 << 64) - 1)
            for r in simhash64(docs, "doc_id", "text").collect()}
    truth = brute_force_pairs(sigs, 3)
    cand = {(min(int(r["id_a"]), int(r["id_b"])),
             max(int(r["id_a"]), int(r["id_b"])))
            for r in simhash_near_pairs(
                docs, "doc_id", "text", max_hamming=3).collect()}
    assert cand == truth


def test_dedup_groups_under_merge_bounded(spark):
    """A planted 24-doc near-identical cluster: the linear scheme may
    under-merge vs the closure, but must keep the cluster in FEW
    groups (not shatter it) and never over-merge with the distinct
    docs."""
    from verified_sources_spark.llm.simhash import (
        simhash64,
        simhash_dedup_groups,
    )

    base = ("alpha beta gamma delta epsilon zeta eta theta iota "
            "kappa lambda mu nu xi omicron pi rho sigma tau")
    rows = [(i, base + f" tail{i % 3}") for i in range(24)]
    rows += [(100 + j, f"unrelated corpus {j} " + " ".join(
        f"w{j}x{t}" for t in range(18))) for j in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {int(r["doc_id"]): int(r["simhash"]) & ((1 << 64) - 1)
            for r in simhash64(df, "doc_id", "text").collect()}
    truth = brute_force_pairs(sigs, 3)
    comp = closure(truth)
    cluster_comps = {comp.get(i, i) for i in range(24)}
    groups = {int(r["doc_id"]): r["group"] for r in
              simhash_dedup_groups(df, "doc_id", "text").collect()}
    cluster_groups = {groups[i] for i in range(24)}
    # under-merge bounded: no more groups than exact components + 2
    assert len(cluster_groups) <= len(cluster_comps) + 2
    # never over-merge: distinct docs stay out of the cluster groups
    for j in range(4):
        assert groups[100 + j] not in cluster_groups
