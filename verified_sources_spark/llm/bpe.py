"""Byte-pair-encoding tokenizer: distributed corpus statistics, exact
merge training, Arrow-batched application.

A training-data pipeline that reports token counts, packs sequences, or
enforces token budgets needs an actual learned tokenizer, not just the
whitespace/regex proxy in ``functions.text``.  This is the classic BPE
recipe (Sennrich et al. 2016's algorithm, as used by GPT-2-style
vocabularies):

1. ``word_frequencies`` — ONE distributed aggregation collapses the
   corpus (any size) to its word-frequency table.  This is the only
   corpus-sized step; the table is vocabulary-sized (Zipf: a 100 TB crawl
   has tens of millions of distinct words, not trillions).
2. ``train_bpe`` — exact greedy merge learning over the word-frequency
   table, driver-side BY DESIGN: the working set is the vocab, and the
   algorithm is inherently sequential (merge i+1 depends on merge i).
   Incremental pair-count maintenance (only words containing the merged
   pair are touched), deterministic tie-breaking (count desc, then
   lexicographic pair), so two runs — or two engines — learn byte-equal
   merge tables.  ``max_vocab_rows`` guards the driver: the collect
   RAISES beyond it instead of OOMing (cap the vocab with ``min_freq``).
3. ``apply_bpe`` — encoding is embarrassingly parallel: the merge ranks
   broadcast in the UDF closure (a merge table is KBs–MBs), each Arrow
   batch encodes independently, and a per-batch word cache collapses the
   Zipf head (most tokens in a batch are repeats of common words).

End-of-word handling: the final symbol of each word carries the ``</w>``
marker (the paper's formulation), so ``xy</w>`` and ``xy`` mid-word are
distinct merge targets and decoding is unambiguous: concatenate tokens,
split on the marker.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from verified_sources_spark.functions.text import tokens

EOW = "</w>"


def word_frequencies(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over the tokenized corpus — the one corpus-sized pass
    of BPE training.  Uses the engine tokenizer (lowercased [a-z0-9]+
    runs) so counts match ``functions.text.token_count`` semantics."""
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def _word_symbols(word: str) -> tuple[str, ...]:
    if not word:
        return ()
    return tuple(word[:-1]) + (word[-1] + EOW,)


def _merge_word(sym: tuple[str, ...], a: str, b: str) -> tuple[str, ...]:
    out: list[str] = []
    i = 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def _pair_counts_of(sym: tuple[str, ...]) -> Counter:
    c: Counter = Counter()
    for i in range(len(sym) - 1):
        c[(sym[i], sym[i + 1])] += 1
    return c


def train_bpe(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    min_freq: int = 2,
    max_vocab_rows: int = 5_000_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the ordered
    merge list (rank = position).

    Exact and deterministic: at every step the highest-count pair wins,
    ties broken by the lexicographically smallest pair.  Stops early when
    no pair occurs at least twice (merging a count-1 pair memorizes one
    word).  Incremental maintenance: merging (a,b) re-counts only the
    words that contain the pair — the standard index trick that makes
    tens of thousands of merges tractable on a multi-million-row vocab.
    """
    wf = word_frequencies(df, text_col).filter(F.col("freq") >= int(min_freq))
    n = wf.count()
    if n > max_vocab_rows:
        raise ValueError(
            f"word-frequency table has {n} rows > max_vocab_rows="
            f"{max_vocab_rows}; raise min_freq (training operates on the "
            "vocab driver-side — the corpus itself is never collected)"
        )
    words: dict[int, tuple[str, ...]] = {}
    freqs: dict[int, int] = {}
    for idx, row in enumerate(wf.collect()):
        sym = _word_symbols(row["word"])
        if len(sym) >= 2:
            words[idx] = sym
            freqs[idx] = int(row["freq"])

    pair_counts: Counter = Counter()
    pair_words: defaultdict[tuple[str, str], set[int]] = defaultdict(set)
    for idx, sym in words.items():
        for pair, k in _pair_counts_of(sym).items():
            pair_counts[pair] += k * freqs[idx]
            pair_words[pair].add(idx)

    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        best_pair, best_cnt = None, 1
        for pair, cnt in pair_counts.items():
            if cnt < 2:
                continue
            if (
                best_pair is None
                or cnt > best_cnt
                or (cnt == best_cnt and pair < best_pair)
            ):
                best_pair, best_cnt = pair, cnt
        if best_pair is None:
            break
        a, b = best_pair
        merges.append((a, b))
        for idx in list(pair_words[(a, b)]):
            old = words[idx]
            new = _merge_word(old, a, b)
            f = freqs[idx]
            for pair, k in _pair_counts_of(old).items():
                pair_counts[pair] -= k * f
                if pair_counts[pair] <= 0:
                    del pair_counts[pair]
                s = pair_words.get(pair)
                if s is not None:
                    s.discard(idx)
                    if not s:
                        del pair_words[pair]
            if len(new) >= 2:
                words[idx] = new
                for pair, k in _pair_counts_of(new).items():
                    pair_counts[pair] += k * f
                    pair_words[pair].add(idx)
            else:
                del words[idx]
                del freqs[idx]
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(_word_symbols(word))
    while len(sym) >= 2:
        best_rank, best_i = None, -1
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def apply_bpe(
    df: DataFrame,
    text_col: str,
    merges: list[tuple[str, str]],
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Append ``out_col`` (array<string> of BPE subword tokens, in
    document order, ``</w>`` marking word ends).

    mapInPandas with the merge ranks in the closure: encoding is pure
    per-row work, Arrow-batched, with a per-batch word→tokens cache (the
    Zipf head encodes once per batch, not once per occurrence).
    """
    import re as _re

    ranks = {tuple(m): i for i, m in enumerate(merges)}
    token_re = _re.compile(r"[a-z0-9]+")
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"`{out_col}` array<string>"]
    )

    def encode_batches(batches: Iterator) -> Iterator:
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            col = []
            for text in pdf[text_col]:
                toks: list[str] = []
                for w in token_re.findall((text or "").lower()):
                    enc = cache.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        cache[w] = enc
                    toks.extend(enc)
                col.append(toks)
            pdf = pdf.copy()
            pdf[out_col] = col
            yield pdf

    return df.mapInPandas(encode_batches, schema=out_schema)


def decode_bpe(tokens_: list[str]) -> str:
    """Inverse of ``apply_bpe`` for one token list: concatenate, split on
    the end-of-word marker."""
    return " ".join(w for w in "".join(tokens_).split(EOW) if w)
