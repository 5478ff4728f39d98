"""SimHash near-duplicate fingerprinting.

64-bit simhash: each token hashes to 64 bits (xxhash64); bit i of the
fingerprint is 1 iff the sum over tokens of (+1 / -1 for bit i set/unset)
is positive.  Computed entirely with Column expressions: explode tokens →
per-bit sign aggregation → reassemble.  One shuffle on the doc id.

Near-pair search blocks on bit-bands (pigeonhole: two fingerprints within
hamming distance d must agree exactly on at least one of d+1 disjoint
bands), so candidate generation is a bucket join like MinHash-LSH —
never all-pairs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from verified_sources_spark.functions.text import tokens


def simhash64(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, simhash) with simhash as a signed 64-bit long."""
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    tok = tok.withColumn("h", F.xxhash64("tok"))
    # per-bit contribution: +1 if bit set else -1; sum per doc
    bit_sums = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{i}")
            for i in range(64)
        ]
    )
    fp = F.lit(0).cast("long")
    for i in range(64):
        fp = fp.bitwiseOR(
            F.when(F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        )
    return bit_sums.select(F.col(id_col), fp.alias("simhash"))


def _band(col, band_idx: int, band_bits: int):
    return F.shiftrightunsigned(col, band_idx * band_bits).bitwiseAND(
        F.lit((1 << band_bits) - 1)
    )


def simhash_near_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3, n_bands: int = 4
) -> DataFrame:
    """Pairs (id_a < id_b, hamming <= max_hamming).  n_bands must exceed
    max_hamming for the pigeonhole guarantee."""
    assert n_bands > max_hamming, "need n_bands > max_hamming (pigeonhole)"
    assert 64 % n_bands == 0
    band_bits = 64 // n_bands
    # materialize the signatures (skinny: id + one bigint) before the
    # self-join: the two join sides fork the plan DAG, and without the
    # checkpoint the per-token hashing + 64 per-bit aggregations would
    # execute once PER SIDE (Spark cannot share subtrees across a fork)
    sig = simhash64(df, id_col, text_col).localCheckpoint(eager=False)
    banded = sig.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        _band(F.col("simhash"), i, band_bits).alias("band_val"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("band"),
    ).select(id_col, "simhash", "band.band_idx", "band.band_val")
    a, b = banded.alias("a"), banded.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
