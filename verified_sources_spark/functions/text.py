"""Text-analysis functions for training-data pipelines.

All pure Column expressions (JVM-side, codegen-friendly): tokenization,
token counting, quality scoring, language ID, fingerprinting, shingling.
Semantics are deliberately chosen to be expressible in ANSI SQL so the
DuckDB oracle can verify them bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

TOKEN_RE = "[a-z0-9]+"

# tiny deterministic per-language stopword sets for the n-gram/stopword
# language-ID heuristic; ordered — first match wins ties.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "de": ("der", "die", "und", "das", "ein"),
    "fr": ("le", "la", "et", "les", "des"),
    "es": ("el", "la", "de", "que", "los"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),
}


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: str | Column) -> Column:
    """Lowercased alphanumeric tokens (BPE-ish regex tokenizer baseline)."""
    return F.regexp_extract_all(F.lower(_c(col)), F.lit(TOKEN_RE), 0)


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


def char_count(col: str | Column) -> Column:
    return F.length(_c(col))


def punct_ratio(col: str | Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    c = _c(col)
    n_punct = F.length(F.regexp_replace(c, "[a-zA-Z0-9 ]", ""))
    return n_punct / F.greatest(F.length(c), F.lit(1))


def stopword_count(col: str | Column, stopwords: tuple[str, ...]) -> Column:
    """Number of tokens that are in *stopwords* (with repeats)."""
    toks = tokens(col)
    arr = F.array(*[F.lit(s) for s in stopwords])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def stopword_ratio(col: str | Column, stopwords: tuple[str, ...]) -> Column:
    return stopword_count(col, stopwords) / F.greatest(token_count(col), F.lit(1))


def quality_score(col: str | Column, stopwords: tuple[str, ...] = LANG_STOPWORDS["en"]) -> Column:
    """Deterministic [0,1] doc-quality heuristic: rewards reasonable length
    and stopword density, penalizes punctuation noise.  Weights are
    arbitrary but fixed; the point is a reproducible scalar pipeline."""
    n_tok = token_count(col)
    len_score = F.least(n_tok.cast("double") / F.lit(100.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio(col, stopwords) * 5.0, F.lit(1.0))
    punct_pen = punct_ratio(col)
    return F.round(0.5 * len_score + 0.3 * stop_score + 0.2 * (1.0 - punct_pen), 6)


def lang_scores(col: str | Column) -> dict[str, Column]:
    """Per-language stopword-hit counts."""
    return {lang: stopword_count(col, sw) for lang, sw in LANG_STOPWORDS.items()}


def lang_id(col: str | Column) -> Column:
    """argmax over language stopword scores, fixed tie order (dict order),
    'und' (undetermined) when no stopword hits at all."""
    scores = lang_scores(col)
    langs = list(scores)
    best = F.greatest(*[scores[lang] for lang in langs])
    expr = F.lit("und")
    # build reversed so earlier languages win ties
    for lang in reversed(langs):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


def normalized_text(col: str | Column) -> Column:
    """CCNet-style dedup normalization: lowercase, non-alphanumerics to
    spaces, whitespace collapsed, trimmed — so case/punctuation/spacing
    variants of the same content hash identically.  Kept to the Java∩RE2
    regex subset so the DuckDB oracle replays it bit-for-bit."""
    c = F.lower(_c(col))
    c = F.regexp_replace(c, "[^a-z0-9\\s]", " ")
    return F.trim(F.regexp_replace(c, "\\s+", " "))


def fingerprint(col: str | Column) -> Column:
    """Normalized document fingerprint: md5 over sorted distinct tokens —
    order- and whitespace-insensitive content identity."""
    return F.md5(F.array_join(F.array_sort(F.array_distinct(tokens(col))), " "))


def shingles(col: str | Column, n: int = 3) -> Column:
    """Word n-gram shingles (space-joined), for MinHash/Jaccard near-dup.

    Built with ``zip_with`` over shifted ``slice``s of the token array so
    the tokenizer runs once per row — an index-lambda formulation
    (``element_at(tokens(...), i)``) would re-embed the whole
    ``regexp_extract_all`` inside the per-element lambda and re-tokenize
    the document for every shingle (observed 50x slowdown).

    This form still textually embeds the tokenizer ~2n times (base array
    + per-shift slice/size references) — an analysis-time tax that
    interpreted-eval CSE absorbs at runtime (measured r15).  Callers on
    a hot path can project ``tokens(col)`` once in a staged ``select``
    and build from the column reference via :func:`shingles_of`."""
    return shingles_of(tokens(col), n)


def shingles_of(toks: Column, n: int = 3) -> Column:
    """:func:`shingles` over an ALREADY-TOKENIZED array column — pass a
    staged ``tokens(...)`` projection's column reference so each
    expensive tokenizer evaluates once per row instead of being
    re-embedded per shingle-shift reference."""
    if n == 1:
        return toks

    def shifted(k: int) -> Column:
        return F.slice(toks, k + 1, F.greatest(F.size(toks) - k, F.lit(0)))

    # strict concat (null-propagating): trailing partial windows become
    # NULL and are filtered; zip_with pads the shorter side with NULLs
    sh = F.zip_with(toks, shifted(1), lambda a, b: F.concat(a, F.lit(" "), b))
    for k in range(2, n):
        sh = F.zip_with(sh, shifted(k), lambda ab, c: F.concat(ab, F.lit(" "), c))
    return F.filter(sh, lambda s: s.isNotNull())
