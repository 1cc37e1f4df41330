"""Banded sign-LSH blocking for cosine similarity joins.

The similarity self-join's naive shape is n² score evaluations per block.
Banded LSH replaces it with the candidate-generate → verify split every
sub-quadratic similarity system uses (MinHash-LSH for sets, SimHash for
bits, sign-random-projection for dense vectors):

- each vector gets ``bands`` keys, band k = the sign pattern of ``bits``
  consecutive dimensions (axis-plane hyperplanes — deterministic and
  portable to the SQL oracle);
- a pair is a CANDIDATE iff some band agrees: one equi-join on
  (part_col, band_id, band_key) over the exploded band table — never a
  per-pair comparison;
- candidates are deduped (a pair can agree on several bands), then scored
  exactly once against the real vectors and kept at ``score >= tau``.

Cost model: with uniformly-spread signs a band bucket holds n/2^bits rows,
so candidates ≈ bands · n²/2^bits per block — the fraction ``bands/2^bits``
of the naive n² (0.5 at the 4-bit × 8-band default, measured 0.40 on the
fixture). The asymptotic story is the standard LSH one: hold per-bucket
occupancy constant by growing ``bits`` ≈ log2(n) and recall by raising
``bands``, giving n^(1+ρ) candidates with ρ = ln p1 / ln p2 < 1. A pair at
cosine s agrees on one ``bits``-bit band with p(s)^bits, p(s) = 1 −
acos(s)/π, so is a candidate with 1 − (1 − p^bits)^bands: ~75% at s = 0.4
(the declared key's regime — recall measured 5/5 at sf0.01), ~99% at
s = 0.8 (the near-dup regime the production dial targets with far fewer
bands).

The declared q_sim_join key pins (bits=4, bands=8) so the DuckDB oracle
can run the IDENTICAL blocking — parity is by construction, not sampling
luck. This module is the engine-side implementation; callers with other
regimes pick their own (bits, bands).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sign_band_keys(vec_col: str, bits: int, bands: int) -> Column:
    """array of ``bands`` ints: band k = sign bits of dims
    [k·bits+1 .. k·bits+bits] packed little-endian."""
    out = []
    for k in range(bands):
        key = F.lit(0)
        for i in range(bits):
            key = key + F.when(
                F.element_at(F.col(vec_col), k * bits + i + 1) > 0,
                F.lit(1 << i),
            ).otherwise(F.lit(0))
        out.append(key)
    return F.array(*out)


def banded_cosine_join(
    emb: DataFrame,
    tau: float,
    bits: int,
    bands: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    part_col: str | None = "label",
) -> DataFrame:
    """Blocked cosine similarity self-join: (part_col, a_id, b_id, score)
    for candidate pairs (same part_col, ≥1 agreeing band, a_id < b_id)
    with exact cosine ≥ tau. Vectors never ride through the explode —
    band rows carry only (part, id, band_id, band_key); the verify stage
    joins the id pairs back to the vector table."""
    part = [part_col] if part_col else []
    keyed = emb.select(
        *part,
        F.col(id_col).alias("_id"),
        F.posexplode(sign_band_keys(vec_col, bits, bands)).alias(
            "_band", "_key"
        ),
    )
    a = keyed.select(
        *part, F.col("_id").alias("a_id"), "_band", "_key"
    )
    b = keyed.select(
        *([F.col(c).alias(f"_b_{c}") for c in part]),
        F.col("_id").alias("b_id"),
        F.col("_band").alias("_b_band"),
        F.col("_key").alias("_b_key"),
    )
    cond = (F.col("_band") == F.col("_b_band")) & (
        F.col("_key") == F.col("_b_key")
    ) & (F.col("a_id") < F.col("b_id"))
    for c in part:
        cond = cond & (F.col(c) == F.col(f"_b_{c}"))
    cands = a.join(b, cond).select(*part, "a_id", "b_id").distinct()

    va = emb.select(
        F.col(id_col).alias("a_id"), F.col(vec_col).alias("_va")
    )
    vb = emb.select(
        F.col(id_col).alias("b_id"), F.col(vec_col).alias("_vb")
    )
    dot = F.expr(
        "aggregate(zip_with(_va, _vb,"
        " (x, y) -> cast(x AS double) * cast(y AS double)),"
        " 0D, (acc, v) -> acc + v)"
    )
    return (
        cands.join(va, "a_id")
        .join(vb, "b_id")
        .withColumn("score", F.round(dot, 6))
        .filter(F.col("score") >= tau)
        .select(*part, "a_id", "b_id", "score")
    )
