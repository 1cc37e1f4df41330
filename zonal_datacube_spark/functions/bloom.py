"""Broadcast Bloom-filter semi-join prefilter.

The 100 TB pattern: a semi-join whose build side is too large to
broadcast as rows can still broadcast its BLOOM FILTER — an m-bit bitset
(m/64 longs) summarizing the key set with zero false negatives. The
probe side tests membership map-side and drops the (typically vast)
majority of rows BEFORE the shuffle of the exact join, so the shuffle
carries only candidate rows. Spark's own runtime row-level filtering
(spark.sql.optimizer.runtime.bloomFilter.enabled) applies the same idea
automatically inside one query; this library form makes it explicit,
reusable across queries (build once, probe many), and portable to probe
jobs that run later.

Implementation is pure DataFrame + literal-array expressions:

- build: k positions per key via xxhash64(key, seed), folded into
  m/64 longs with a bit_or groupBy — one partial-aggregable shuffle of
  at most m/64 rows per partition. The collect at the end is the bitset
  itself (codebook-sized, e.g. 8 KB for m = 2^16), NOT the data.
- probe: an AND of k bit-tests against the literal word array — a
  map-side whole-stage-codegen expression, no Python, no join.

False positives are possible (rate (1 - e^{-kn/m})^k); callers needing
exactness follow the prefilter with the exact semi-join on the
surviving rows, which is what q_join_bloom_semi does.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def build_bloom(df: DataFrame, key: str, m_bits: int, k: int) -> list[int]:
    """Aggregate the distinct values of ``df[key]`` into an m_bits-wide
    Bloom bitset with k hash functions; returns the m_bits/64 words.
    ``m_bits`` must be a multiple of 64."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    seeds = F.array(*[F.lit(i) for i in range(k)])
    positions = (
        df.select(F.col(key).alias("k"))
        .distinct()
        .select(F.explode(seeds).alias("seed"), "k")
        .select(
            F.pmod(F.xxhash64("k", "seed"), F.lit(m_bits)).alias("pos")
        )
    )
    words = (
        positions.select(
            (F.col("pos") / 64).cast("int").alias("word_idx"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
            ).alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").alias("word"))
        .collect()  # bitset-sized (m_bits/64 longs), never data-sized
    )
    out = [0] * (m_bits // 64)
    for r in words:
        out[r.word_idx] = r.word
    return out


def might_contain(key: Column, words: list[int], m_bits: int, k: int) -> Column:
    """Membership-test expression: AND of k bit probes against the
    literal word array. Stays inside whole-stage codegen (array literal
    + xxhash64 + bit ops); no false negatives by construction."""
    lit_words = F.array(*[F.lit(w).cast("long") for w in words])
    probes = []
    for i in range(k):
        pos = F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
        word = F.element_at(lit_words, ((pos / 64).cast("int") + 1))
        mask = F.call_function(
            "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
        )
        probes.append(word.bitwiseAND(mask) != 0)
    out = probes[0]
    for p in probes[1:]:
        out = out & p
    return out
