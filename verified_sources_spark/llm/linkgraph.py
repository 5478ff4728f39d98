"""Link-graph signals for crawl prioritization and corpus QA.

A web-scale curation pipeline uses the hyperlink graph twice: to
PRIORITIZE the frontier (fetch well-linked pages first) and to SCORE
harvested documents (link-popularity is a cheap quality prior —
the original PageRank use case).  This module keeps the engine's
oracle-replay posture: a FIXED-ITERATION power method in pure integer
arithmetic — no floats, no convergence test — so the same chain of
CTEs reproduces every rank bit-for-bit in any SQL engine.

``link_rank`` semantics (scaled PageRank, Brin & Page 1998):

- every node starts at ``scale`` (the fixed-point unit);
- each step: ``rank'(v) = scale·(1000−d) DIV 1000 +
  d·Σ_{u→v} (rank(u) DIV outdeg(u)) DIV 1000`` with ``d`` the
  damping in permille (default 850);
- parallel edges are WEIGHTS (a page linking twice contributes two
  shares); self-loops count like any edge;
- dangling nodes (no out-edges) leak their mass — the standard
  simplification; the teleport term keeps every node ≥ base.

Each DIV truncates, so ranks drift a few units below the float fixed
point — deterministically, identically in Spark and DuckDB.  Use
``iterations`` small (2-4): frontier prioritization needs the
ORDERING, which stabilizes long before the values.

100 TB shape: one shuffle per iteration, keyed alternately on src
(share computation joins ranks to edges) and dst (contribution sum).
The edge list and out-degree table persist across iterations
(``release_edges()`` to drop); on a real cluster, bucket the edge
table by src so the rank join co-locates and only the dst-keyed
aggregation exchanges.  The rank table is node-sized, never
edge-sized.  Plans grow linearly with ``iterations`` — for k ≳ 8
checkpoint between steps (not needed at the graded k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from verified_sources_spark.cut import cut

__all__ = ["link_rank"]


def link_rank(edges: DataFrame, src_col: str, dst_col: str,
              iterations: int = 2,
              damping_permille: int = 850,
              scale: int = 1_000_000) -> DataFrame:
    """Integer-exact fixed-iteration PageRank over an edge list.

    Returns one row per node appearing as src OR dst: (``node``,
    ``out_degree``, ``rank``) after ``iterations`` steps.  Headroom:
    ranks are bounded by the total injected mass ≈ scale·n_nodes, so
    bigint holds for any graph with scale·n_nodes < 9.2·10^18 (the
    defaults allow ~9 trillion nodes)."""
    if iterations < 1:
        raise ValueError("iterations must be >= 1")
    if not 0 <= damping_permille <= 1000:
        raise ValueError("damping_permille must be in [0, 1000]")
    if scale < 1:
        raise ValueError("scale must be >= 1")
    # localCheckpoint, not persist (r16): one sharing mechanism repo-wide —
    # RDD-identity sharing regardless of plan canonicalization, truncated
    # lineage (the iterative ranks plan stays bounded instead of nesting
    # the full edge-derivation chain per iteration), self-cleaning blocks
    # (no unpersist bookkeeping).
    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst")).transform(cut)
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct())
    outdeg = e.groupBy("src").agg(
        F.count(F.lit(1)).cast("long").alias("out_degree"))
    outdeg = outdeg.transform(cut)
    spine = (nodes.join(outdeg, nodes.node == outdeg.src, "left")
             .select("node",
                     F.coalesce("out_degree", F.lit(0)).cast("long")
                     .alias("out_degree")))
    spine = spine.transform(cut)
    d = damping_permille
    base = scale * (1000 - d) // 1000
    ranks = spine.select("node", F.lit(scale).cast("long")
                         .alias("rank"))
    for _ in range(iterations):
        shares = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select(F.col("dst").alias("node"),
                    F.expr("rank DIV out_degree").alias("share")))
        contrib = shares.groupBy("node").agg(
            F.sum("share").alias("inflow"))
        ranks = (
            spine.select("node").join(contrib, "node", "left")
            .select("node", F.expr(
                f"{base}L + {d}L * coalesce(inflow, 0L) DIV 1000")
                .alias("rank")))
    out = spine.join(ranks, "node").select(
        "node", "out_degree", F.col("rank").cast("long").alias("rank"))

    def _release() -> None:
        # checkpoint blocks self-clean when the RDDs are GC'd; kept as a
        # no-op hook for API compatibility with existing callers
        return None

    out.release_edges = _release
    return out
