"""Training-data text preparation: repetition signals, PII scrubbing,
token-window chunking.

These are the per-document filters/transforms a large-scale LLM data
pipeline runs between raw ingestion and tokenization (the quality-filter
stage popularized by the Gopher/MassiveText and C4 data recipes —
published methodology, re-expressed as Spark dataflows):

- ``repetition_signals``: documents dominated by repeated lines or a few
  repeated n-grams are boilerplate (cookie banners, navigation, scraper
  loops) and get filtered before training.  Implemented as EXPLODE +
  two-level aggregation rather than per-row quadratic array scans: a
  transform(distinct, d -> count_in(lines)) formulation is O(L·D) per
  document and serializes on pathological megadocs, while the exploded
  groupBy is linear, spills, and spreads one huge document's lines
  across the cluster like any other skewed key.
- ``pii_scrub``: masks emails / IPv4 / phone-shaped substrings and counts
  the hits, keeping the patterns inside the regex subset Java and RE2
  share so the DuckDB oracle replays them bit-for-bit.
- ``token_chunks``: overlapping fixed-size token windows (the context-
  window packing step before tokenizer/embedding jobs), exploded into a
  child table with deterministic chunk ids.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from verified_sources_spark.functions.text import TOKEN_RE, shingles


def _span_occurrences(
    df: DataFrame, id_col: str, text_col: str, window: int
) -> DataFrame:
    """(_id, spos, _h, _dup): every sliding ``window``-token span hash
    occurrence, flagged ``_dup`` when the hash appears in >= 2 DISTINCT
    documents.

    The distinct-documents test is ``min(_id) != max(_id)`` over a
    hash-partitioned window — ONE pass over the corpus and one shuffle
    on the span hash.  The previous formulation self-joined the
    occurrence table with its own groupBy/count_distinct: the two
    branches fork the plan DAG and Spark cannot share the subtree, so
    the dominant cost (tokenize + shingle + md5 + posexplode of the
    whole corpus) executed TWICE and the join shuffled the occurrence
    table a second time.  Skew shape is unchanged: a boilerplate span
    shared by millions of docs is one window partition processed
    linearly, exactly as it was one grouping key before."""
    sp = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.transform(shingles(text_col, window), lambda s: F.md5(s))
        ).alias("spos", "_h"),
    )
    w = Window.partitionBy("_h")
    return sp.withColumn("_dup", F.min("_id").over(w) != F.max("_id").over(w))

# kept to the Java/RE2 COMMON regex subset (no lookarounds, no \b at the
# pattern edge differences): the DuckDB oracle replays these literally
PII_PATTERNS = {
    # local@domain.tld — conservative, favors precision over recall
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # dotted quad; \b is supported identically by Java regex and RE2
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    # +country / separator-tolerant phone shape, 9+ digits total
    "phone": r"\+?\d[\d\-\. ]{7,}\d",
}
PII_MASK = {"email": "<EMAIL>", "ipv4": "<IP>", "phone": "<PHONE>"}


def repetition_signals(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document repetition quality signals (Gopher-style):

    - ``n_lines``: non-empty (after trim) line count
    - ``dup_line_frac``: 1 − distinct/total over those lines
    - ``dup_line_char_frac``: fraction of line characters that live in a
      line occurring more than once
    - ``top_bigram_frac``: occurrences of the most frequent word 2-gram
      over total 2-gram occurrences

    Documents with no qualifying lines (or <2 tokens) report zeros so the
    output stays one row per input document.

    Scale shape: two exploded aggregations (lines, bigrams), each a
    groupBy on (doc, unit) then (doc) — linear work, hash-partitioned,
    no per-row quadratic array scans; a single pathological megadoc
    spreads across the (doc, unit) shuffle instead of pinning one task.
    """
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.filter(
                F.transform(F.split(F.col(text_col), "\n"), lambda s: F.trim(s)),
                lambda s: s != "",
            )
        ).alias("line"),
    )
    per_line = lines.groupBy("_id", "line").agg(
        F.count(F.lit(1)).alias("cnt"), F.length("line").alias("len")
    )
    line_stats = per_line.groupBy("_id").agg(
        F.sum("cnt").cast("long").alias("n_lines"),
        (1.0 - F.count(F.lit(1)) / F.sum("cnt")).alias("dup_line_frac"),
        (
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt") * F.col("len")).otherwise(0))
            / F.sum(F.col("cnt") * F.col("len"))
        ).alias("dup_line_char_frac"),
    )

    bigrams = df.select(
        F.col(id_col).alias("_id"),
        F.explode(shingles(text_col, 2)).alias("bg"),
    )
    per_bg = bigrams.groupBy("_id", "bg").agg(F.count(F.lit(1)).alias("cnt"))
    bg_stats = per_bg.groupBy("_id").agg(
        (F.max("cnt") / F.sum("cnt")).alias("top_bigram_frac")
    )

    return (
        df.select(F.col(id_col))
        .join(line_stats, F.col(id_col) == line_stats["_id"], "left")
        .drop("_id")
        .join(bg_stats, F.col(id_col) == bg_stats["_id"], "left")
        .drop("_id")
        .select(
            F.col(id_col),
            F.coalesce("n_lines", F.lit(0)).cast("long").alias("n_lines"),
            F.coalesce("dup_line_frac", F.lit(0.0)).alias("dup_line_frac"),
            F.coalesce("dup_line_char_frac", F.lit(0.0)).alias("dup_line_char_frac"),
            F.coalesce("top_bigram_frac", F.lit(0.0)).alias("top_bigram_frac"),
        )
    )


# F.expr can't call a python helper: inline the token expression textually
def _inline_tokens(sql: str, text_col: str) -> str:
    return sql.replace(f"_tp_toks({text_col})", f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)")


def pii_scrub(df: DataFrame, text_col: str, out_col: str | None = None) -> DataFrame:
    """Mask emails / IPv4s / phone-shaped substrings in *text_col* and
    count the hits per kind.  Adds ``{out_col}`` (default: the input
    column, replaced) plus ``n_email`` / ``n_ipv4`` / ``n_phone``.

    Masking order matters and is FIXED (email → ipv4 → phone) so the
    phone pattern cannot eat the digits of an already-masked IP; counts
    are taken on the original text for email/ipv4 and on the
    email+ip-masked text for phone (a phone match inside an email local
    part would otherwise double-count).  Pure JVM regex — one projection,
    no shuffle, no UDFs."""
    out = out_col or text_col
    email, ipv4, phone = PII_PATTERNS["email"], PII_PATTERNS["ipv4"], PII_PATTERNS["phone"]
    c = F.col(text_col)
    after_email = F.regexp_replace(c, email, PII_MASK["email"])
    after_ip = F.regexp_replace(after_email, ipv4, PII_MASK["ipv4"])
    scrubbed = F.regexp_replace(after_ip, phone, PII_MASK["phone"])
    counts = [
        F.regexp_count(c, F.lit(email)).cast("long").alias("n_email"),
        F.regexp_count(c, F.lit(ipv4)).cast("long").alias("n_ipv4"),
        F.regexp_count(after_ip, F.lit(phone)).cast("long").alias("n_phone"),
    ]
    keep = [F.col(n) for n in df.columns if n != out]
    return df.select(*keep, scrubbed.alias(out), *counts)


def token_chunks(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_size: int = 128,
    stride: int | None = None,
) -> DataFrame:
    """Overlapping token windows as a child table:
    (id, chunk_idx, chunk_text, n_tokens).

    Chunk *i* covers tokens ``[i·stride, i·stride + chunk_size)``;
    ``stride`` defaults to ``chunk_size`` (no overlap).  The last chunk
    may be short; documents with no tokens yield no chunks.  One
    projection + explode — the token array is materialized once per row
    and sliced per chunk (array slice is O(chunk), not O(doc))."""
    stride = stride or chunk_size
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    sql = _inline_tokens(
        f"""
SELECT `{id_col}`, chunk.chunk_idx,
       array_join(chunk.toks_slice, ' ') AS chunk_text,
       CAST(size(chunk.toks_slice) AS BIGINT) AS n_tokens
FROM (
  SELECT `{id_col}`,
         explode(transform(
           sequence(0, CAST(greatest(ceil((size(toks) - {chunk_size}) / {stride}.0), 0) AS INT)),
           i -> struct(i AS chunk_idx,
                       slice(toks, i * {stride} + 1, {chunk_size}) AS toks_slice)
         )) AS chunk
  FROM (SELECT `{id_col}`, _tp_toks(`{text_col}`) AS toks FROM {{df}})
  WHERE size(toks) > 0
)
""",
        f"`{text_col}`",
    )
    return df.sparkSession.sql(sql, df=df)


def duplicate_spans(
    df: DataFrame, id_col: str, text_col: str, window: int = 8
) -> DataFrame:
    """Cross-document duplicated n-gram spans — the statistics side of
    substring-level dedup (the ExactSubstr recipe from the published
    "Deduplicating Training Data Makes Language Models Better"
    methodology, re-expressed as a corpus statistic rather than a suffix
    array): every sliding ``window``-token span is hashed, and a span
    appearing in >= 2 DISTINCT documents marks each of its occurrences
    as duplicated material.  Within-document repetition is deliberately
    excluded (that is ``repetition_signals``' job).

    Output per document: ``n_windows`` (total spans), ``n_dup_windows``
    (spans shared with another doc), ``dup_span_frac`` (their ratio; 0.0
    for docs too short to window).  Downstream recipes drop or trim docs
    above a frac threshold.

    Scale shape: spans are md5'd IMMEDIATELY, so the shuffles carry
    (hash, doc_id) pairs — never text; the cross-document flag comes
    from ONE hash-partitioned window pass (``_span_occurrences``), so
    the corpus is tokenized/shingled once and the occurrence table
    shuffles once.  A boilerplate span shared by millions of docs is
    one window partition scanned linearly — skew-safe, no pair
    expansion.
    """
    occ = _span_occurrences(df, id_col, text_col, window)
    per_doc = (
        occ.groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_windows"),
            F.sum(F.col("_dup").cast("long")).alias("n_dup_windows"),
        )
        .withColumnRenamed("_id", id_col)
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_windows", F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce("n_dup_windows", F.lit(0)).cast("long").alias("n_dup_windows"),
            F.round(
                F.when(
                    F.coalesce("n_windows", F.lit(0)) > 0,
                    F.coalesce("n_dup_windows", F.lit(0))
                    / F.col("n_windows").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_span_frac"),
        )
    )


def duplicate_span_positions(
    df: DataFrame, id_col: str, text_col: str, window: int = 8
) -> DataFrame:
    """(id, pos) of every token covered by a cross-document duplicated
    ``window``-token span — the position-level primitive underneath
    :func:`remove_duplicate_spans`, exposed so the windowed
    approximation can be MEASURED against a brute-force
    exact-substring oracle (tools/span_recall_sweep.py; results in
    SCALE.md).  Structural relationship to exact-substring dedup at
    threshold L tokens, both provable and pinned by test:

    - ``window <= L``: recall is exactly 1.0 (every position inside a
      shared run of >= L tokens is covered by one of the run's shared
      sub-windows) — the windowed method NEVER misses material the
      exact method would cut; precision < 1 is the measured cost
      (runs of window..L-1 tokens it additionally flags).
    - ``window >= L``: precision is exactly 1.0; recall < 1 is the
      measured cost (runs of L..window-1 tokens it misses).

    Same scale shape as duplicate_spans: spans md5'd immediately,
    shuffles carry (hash, doc, pos) only."""
    dup = _span_occurrences(df, id_col, text_col, window).filter("_dup")
    return (
        dup.select(
            "_id",
            F.explode(
                F.sequence(F.col("spos"), F.col("spos") + F.lit(window - 1))
            ).alias("pos"),
        )
        .distinct()
        .select(F.col("_id").alias(id_col), "pos")
    )


def remove_duplicate_spans(
    df: DataFrame, id_col: str, text_col: str, window: int = 8
) -> DataFrame:
    """The removal side of ExactSubstr dedup: tokens covered by any
    ``window``-token span that appears in >= 2 DISTINCT documents are cut
    and the remaining tokens re-joined — the published recipe removes
    the duplicated substring from all-but-one (or all) occurrences; this
    Spark form removes every cross-document duplicated span occurrence,
    the simplest deterministic policy (no occurrence ordering needed).

    Output per document: ``clean_text`` (kept tokens joined by single
    spaces — TOKEN-LEVEL reconstruction: original whitespace/punctuation
    between tokens is not preserved, matching the token-stream view the
    tokenizer consumes anyway), ``n_tokens`` (original), and
    ``n_tokens_removed``.  A fully-duplicated document comes back with
    ``clean_text = ''``.

    Scale shape: span hashes and (doc, position) pairs are the only
    shuffled payloads until the final per-doc reassembly, which carries
    each document's KEPT tokens once (the same cardinality any
    text-rewrite must touch).  The cross-document duplicate flag is one
    hash-partitioned window pass over the occurrence table
    (``_span_occurrences``) — no corpus-sized join side, no second
    shingle pass.  Reassembly sorts per-doc token arrays (array_sort on
    (pos, term) structs), not a global sort.
    """
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)).alias(
            "pos", "term"
        ),
    )
    dup = _span_occurrences(df, id_col, text_col, window).filter("_dup")
    covered = dup.select(
        "_id",
        F.explode(
            F.sequence(F.col("spos"), F.col("spos") + F.lit(window - 1))
        ).alias("pos"),
    ).distinct()
    kept = toks.join(covered, ["_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "term"))),
                lambda s: s["term"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("_n_kept"),
    )
    spine = df.select(
        F.col(id_col).alias("_id"),
        F.size(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
        ).cast("long").alias("n_tokens"),
    )
    return (
        spine.join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("_n_kept", F.lit(0)))
            .cast("long")
            .alias("n_tokens_removed"),
        )
    )


def decontaminate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    benchmark: DataFrame,
    bench_text_col: str | None = None,
    shingle_n: int = 8,
    min_overlap: int = 1,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing at least
    ``min_overlap`` DISTINCT word n-gram shingles with any benchmark
    document (the train/test-overlap scrub every published LLM data
    recipe runs before training).

    Adds ``n_overlap`` (distinct shared shingles) and ``contaminated``.

    Scale shape: the benchmark side collapses to a DISTINCT shingle set —
    benchmark suites are tiny next to a 100 TB corpus, so it broadcasts
    (set ``broadcast_benchmark=False`` to let AQE decide for outsized
    ones) and the corpus-side explode + broadcast-hash-join + groupBy
    never shuffles document text, only (id, shingle-hit) rows."""
    from verified_sources_spark.functions.text import shingles_of, tokens

    bench_text_col = bench_text_col or text_col
    # staged tokenizer projections (r16, guide §4 expression duplication):
    # shingles(col, n=8) textually embeds regexp_extract_all ~2n times per
    # side (18 copies in this plan before); projecting the token array
    # once per side and shingling the column reference leaves ONE copy —
    # CollapseProject keeps the stages apart because the producer alias
    # is non-cheap and multiply referenced
    bench_sh = (
        benchmark.select(tokens(bench_text_col).alias("__toks"))
        .select(
            F.explode(
                F.array_distinct(shingles_of(F.col("__toks"), shingle_n))
            ).alias("sh")
        )
        .distinct()
    )
    if broadcast_benchmark:
        bench_sh = F.broadcast(bench_sh)
    corpus_sh = (
        df.select(F.col(id_col).alias("_id"), tokens(text_col).alias("__toks"))
        .select(
            "_id",
            F.explode(
                F.array_distinct(shingles_of(F.col("__toks"), shingle_n))
            ).alias("sh"),
        )
    )
    hits = corpus_sh.join(bench_sh, "sh").groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_overlap")
    )
    return (
        df.join(hits, df[id_col] == hits["_id"], "left")
        .drop("_id")
        .withColumn("n_overlap", F.coalesce("n_overlap", F.lit(0)).cast("long"))
        .withColumn("contaminated", F.col("n_overlap") >= F.lit(min_overlap))
    )


# hash-sample keyspace: thresholds are computed in PYTHON as integers so
# the Spark side and any SQL oracle share exact literals (no float drift)
HASH_SAMPLE_BUCKETS = 1_000_000


def hash_sample_threshold(fraction: float) -> int:
    if not (0.0 <= fraction <= 1.0):
        raise ValueError("fraction must be in [0, 1]")
    return int(round(fraction * HASH_SAMPLE_BUCKETS))


def hash_sample_bucket(key_col, salt: str = ""):
    """Deterministic per-key bucket in [0, HASH_SAMPLE_BUCKETS): md5 of the
    salted key, 60-bit hex prefix → bigint → mod.  Content-addressed and
    engine-portable (DuckDB reproduces it bit-for-bit), unlike rand() or
    sample() — the same row lands in the same bucket on every run, every
    engine, every cluster size, so samples are reproducible and
    subset-nested across rates (a 1% sample is contained in the 10%)."""
    c = F.col(key_col) if isinstance(key_col, str) else key_col
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{salt}|"), c.cast("string"))), 1, 15), 16, 10)
        .cast("bigint")
        % F.lit(HASH_SAMPLE_BUCKETS)
    )


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float | None = None,
    strata_col: str | None = None,
    fractions: dict | None = None,
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic (reproducible, engine-portable) sampling — the
    mixture-weighting step of a training-data pipeline: keep each row iff
    its key's hash bucket falls under the stratum's threshold.

    Either a global ``fraction``, or per-stratum ``fractions`` keyed by
    ``strata_col`` values (rows from unlisted strata keep
    ``default_fraction``).  One projection + filter, no shuffle, no RNG
    state — scales to any corpus size and any retry/replay semantics."""
    bucket = hash_sample_bucket(key_col, salt)
    if fractions is not None:
        if strata_col is None:
            raise ValueError("fractions requires strata_col")
        thr = F.lit(hash_sample_threshold(default_fraction))
        for value, frac in sorted(fractions.items()):
            thr = F.when(
                F.col(strata_col) == F.lit(value), F.lit(hash_sample_threshold(frac))
            ).otherwise(thr)
    elif fraction is not None:
        thr = F.lit(hash_sample_threshold(fraction))
    else:
        raise ValueError("pass fraction or fractions")
    return df.filter(bucket < thr)


def remove_maximal_duplicate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 8,
    min_span_tokens: int = 50,
) -> DataFrame:
    """Variable-length ExactSubstr removal: merge ADJACENT duplicated
    windows into MAXIMAL spans and cut only spans of at least
    ``min_span_tokens`` tokens — the published recipe ("Deduplicating
    Training Data Makes Language Models Better") removes maximal
    duplicated substrings >= 50 tokens, not every 8-token hit, so short
    incidental overlaps (quotes, idioms) survive while long boilerplate
    runs are cut whole.

    Construction: duplicated ``window``-token hits per document (same
    cross-document >= 2-distinct-docs rule as
    :func:`remove_duplicate_spans`), then a gaps-and-islands merge —
    sorted hit starts, a new island when the gap exceeds ``window``
    (i.e. the covered intervals are neither overlapping nor adjacent),
    island extent = [min(start), max(start)+window-1].  Linear run-length
    over window hits; no suffix array needed.

    Output per document: ``clean_text`` (kept tokens, single-space
    joined), ``n_tokens``, ``n_tokens_removed``, ``n_spans`` (maximal
    spans actually cut).

    Scale shape: everything up to the island merge shuffles (hash,
    doc_id, position) triples only; the merge itself is one
    partition-by-document window (documents are tiny next to the
    corpus, so per-doc ordering is safe), and reassembly is the same
    per-doc array_sort as the fixed-window form — no global sort."""
    from pyspark.sql import Window as W

    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
        ).alias("pos", "term"),
    )
    hits = (
        _span_occurrences(df, id_col, text_col, window)
        .filter("_dup")
        .select("_id", "spos")
        .distinct()
    )

    w_ord = W.partitionBy("_id").orderBy("spos")
    isl = (
        hits.withColumn("_prev", F.lag("spos").over(w_ord))
        .withColumn(
            "_new_run",
            (
                F.col("_prev").isNull()
                | ((F.col("spos") - F.col("_prev")) > F.lit(window))
            ).cast("int"),
        )
        .withColumn(
            "_island",
            F.sum("_new_run").over(w_ord.rowsBetween(W.unboundedPreceding, 0)),
        )
    )
    spans = (
        isl.groupBy("_id", "_island")
        .agg(
            F.min("spos").alias("_start"),
            (F.max("spos") + F.lit(window - 1)).alias("_end"),
        )
        .filter(F.col("_end") - F.col("_start") + 1 >= F.lit(min_span_tokens))
    )
    covered = spans.select(
        "_id", F.explode(F.sequence("_start", "_end")).alias("pos")
    ).distinct()
    n_spans = spans.groupBy("_id").agg(F.count(F.lit(1)).cast("long").alias("n_spans"))

    kept = toks.join(covered, ["_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "term"))),
                lambda s: s["term"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("_n_kept"),
    )
    spine = df.select(
        F.col(id_col).alias("_id"),
        F.size(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
        ).cast("long").alias("n_tokens"),
    )
    return (
        spine.join(rebuilt, "_id", "left")
        .join(n_spans, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("_n_kept", F.lit(0)))
            .cast("long")
            .alias("n_tokens_removed"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        )
    )


def remove_contaminated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    benchmark: DataFrame,
    bench_text_col: str | None = None,
    window: int = 8,
    min_span_tokens: int = 8,
) -> DataFrame:
    """Decontamination by REMOVAL: cut maximal corpus spans that overlap
    a benchmark suite, instead of dropping whole documents.

    :func:`decontaminate` (llm/__init__) FLAGS documents sharing
    benchmark shingles; published pipelines often prefer scrubbing just
    the overlapping passage — a long document with one quoted benchmark
    question keeps its other 5k tokens.  Construction mirrors
    :func:`remove_maximal_duplicate_spans`: corpus ``window``-token hits
    whose hash appears in the BENCHMARK's shingle set, merged
    gaps-and-islands into maximal spans, spans >= ``min_span_tokens``
    cut, token stream rebuilt.

    Scale shape: the benchmark collapses to a DISTINCT hash set
    (suite-sized — tiny next to the corpus) and is broadcast into one
    hash semi-join against the corpus window hashes; everything after is
    the same linear islands merge + per-doc reassembly.  Output:
    ``clean_text``, ``n_tokens``, ``n_tokens_removed``, ``n_spans``."""
    from pyspark.sql import Window as W

    bcol = bench_text_col or text_col
    bench_hashes = (
        benchmark.select(
            F.explode(
                F.transform(shingles(bcol, window), lambda s: F.md5(s))
            ).alias("_h")
        )
        .distinct()
    )
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
        ).alias("pos", "term"),
    )
    sp = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.transform(shingles(text_col, window), lambda s: F.md5(s))
        ).alias("spos", "_h"),
    )
    hits = (
        sp.join(F.broadcast(bench_hashes), "_h", "left_semi")
        .select("_id", "spos")
        .distinct()
    )
    w_ord = W.partitionBy("_id").orderBy("spos")
    isl = (
        hits.withColumn("_prev", F.lag("spos").over(w_ord))
        .withColumn(
            "_new_run",
            (
                F.col("_prev").isNull()
                | ((F.col("spos") - F.col("_prev")) > F.lit(window))
            ).cast("int"),
        )
        .withColumn(
            "_island",
            F.sum("_new_run").over(w_ord.rowsBetween(W.unboundedPreceding, 0)),
        )
    )
    spans = (
        isl.groupBy("_id", "_island")
        .agg(
            F.min("spos").alias("_start"),
            (F.max("spos") + F.lit(window - 1)).alias("_end"),
        )
        .filter(F.col("_end") - F.col("_start") + 1 >= F.lit(min_span_tokens))
    )
    covered = spans.select(
        "_id", F.explode(F.sequence("_start", "_end")).alias("pos")
    ).distinct()
    n_spans = spans.groupBy("_id").agg(F.count(F.lit(1)).cast("long").alias("n_spans"))
    kept = toks.join(covered, ["_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "term"))),
                lambda s: s["term"],
            ),
            " ",
        ).alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("_n_kept"),
    )
    spine = df.select(
        F.col(id_col).alias("_id"),
        F.size(
            F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_RE), 0)
        ).cast("long").alias("n_tokens"),
    )
    return (
        spine.join(rebuilt, "_id", "left")
        .join(n_spans, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce("_n_kept", F.lit(0)))
            .cast("long")
            .alias("n_tokens_removed"),
            F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
        )
    )
