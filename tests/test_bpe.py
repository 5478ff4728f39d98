"""BPE tokenizer training + application (llm/bpe.py)."""

from __future__ import annotations

from collections import Counter

import pyspark.sql.functions as F

from verified_sources_spark.llm.bpe import (
    EOW,
    apply_bpe,
    decode_bpe,
    train_bpe,
    word_frequencies,
)

# the merge dynamics of the BPE paper's example: 'est</w>' should emerge
# from the newest/widest cluster before anything from 'low'
CORPUS = " ".join(
    ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
)


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_word_frequencies_match_counter(spark):
    texts = ["the cat sat", "the cat", "a dog! the DOG."]
    want = Counter(
        w for t in texts for w in __import__("re").findall(r"[a-z0-9]+", t.lower())
    )
    got = {
        r["word"]: r["freq"]
        for r in word_frequencies(_df(spark, texts), "text").collect()
    }
    assert got == dict(want)


def test_train_bpe_learns_the_paper_example(spark):
    df = _df(spark, [CORPUS])
    merges = train_bpe(df, "text", n_merges=10, min_freq=1)
    # 'es' appears 9x (newest 6 + widest 3) — the uncontested first merge;
    # then 'es'+'t</w>' → 'est</w>'
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t" + EOW)
    # determinism: re-training yields the identical table
    assert merges == train_bpe(df, "text", n_merges=10, min_freq=1)


def test_train_bpe_stops_at_count_one_pairs(spark):
    df = _df(spark, ["ab ab cd"])
    merges = train_bpe(df, "text", n_merges=50, min_freq=1)
    # only 'ab</w>' merges twice; 'cd' is a singleton and must not merge
    assert merges == [("a", "b" + EOW)]


def test_apply_bpe_roundtrips_and_uses_merges(spark):
    df = _df(spark, [CORPUS, "lowest newest zz"])
    merges = train_bpe(df, "text", n_merges=30, min_freq=1)
    out = apply_bpe(df, "text", merges).collect()
    assert [r["doc_id"] for r in out] == [0, 1]
    for r in out:
        # lossless: decoding the token stream reproduces the tokenized text
        assert decode_bpe(r["bpe_tokens"]) == " ".join(
            __import__("re").findall(r"[a-z0-9]+", r["text"].lower())
        )
    by_id = {r["doc_id"]: r["bpe_tokens"] for r in out}
    # frequent training words collapse to single tokens
    assert "newest" + EOW in by_id[0]
    assert "low" + EOW in by_id[0]
    # unseen word still encodes (falls back to finer subwords/chars)
    assert any(tok.startswith("z") for tok in by_id[1])
    # 'lowest' (unseen) reuses learned subwords — greedy lowest-rank
    # merging yields 'lo' + 'west</w>' with this merge table
    assert by_id[1][:2] == ["lo", "west" + EOW]


def test_train_bpe_vocab_guard(spark):
    import pytest

    df = _df(spark, ["one two three four five six seven"])
    with pytest.raises(ValueError, match="max_vocab_rows"):
        train_bpe(df, "text", n_merges=5, min_freq=1, max_vocab_rows=3)


def test_apply_bpe_preserves_schema_and_scales_partitions(spark):
    df = _df(spark, [f"doc {i} common words here" for i in range(100)]).repartition(8)
    merges = train_bpe(df, "text", n_merges=10, min_freq=1)
    out = apply_bpe(df, "text", merges)
    assert out.columns == ["doc_id", "text", "bpe_tokens"]
    n = out.filter(F.size("bpe_tokens") > 0).count()
    assert n == 100


def test_distributed_trainer_matches_driver_path(spark):
    """max_vocab_rows=None (r7): the distributed trainer learns
    byte-equal merges to the driver path on the same corpus — same
    greedy winners, same tie-breaks, same early stop."""
    df = spark.createDataFrame(
        [("low lower lowest newer newest wider wide low low newer",),
         ("the cat sat on the mat, the cat ate",),
         ("aaa aaab abab banana bandana",)],
        "text string",
    )
    driver = train_bpe(df, "text", n_merges=25, min_freq=1)
    dist = train_bpe(df, "text", n_merges=25, min_freq=1, max_vocab_rows=None)
    assert dist == driver and len(dist) > 10


def test_distributed_trainer_works_above_the_driver_cap(spark):
    """A vocabulary larger than max_vocab_rows raises on the driver path
    (with the distributed hint) and trains fine distributed."""
    import pytest as _pytest

    rows = [(f"w{i:03d}x w{i:03d}x common common",) for i in range(40)]
    df = spark.createDataFrame(rows, "text string")
    with _pytest.raises(ValueError, match="max_vocab_rows=None"):
        train_bpe(df, "text", n_merges=3, min_freq=1, max_vocab_rows=10)
    merges = train_bpe(df, "text", n_merges=3, min_freq=1, max_vocab_rows=None)
    assert merges == train_bpe(df, "text", n_merges=3, min_freq=1)
