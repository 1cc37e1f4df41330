"""Bucketed range-join rewrite — the 100 TB path for non-equi joins
(SURVEY.md §4.3).

A range join ``fact.value ∈ [dim.lo, dim.hi)`` has no hash path in Spark:
with a small dim it plans BroadcastNestedLoopJoin (fine), but if the dim
side grows, the NLJ is O(n·m). The rewrite converts it to an equi join:

1. pick a bucket width w;
2. explode each [lo, hi) interval into the integer buckets it overlaps
   (cost: interval_span / w rows per interval — bounded and tiny for
   narrow intervals);
3. equi-join on ``floor(value / w)`` — a plain shuffled/broadcast hash
   join — then re-apply the exact range predicate as a residual filter.

Same results, hash-join scaling. This is an application-level rewrite, not
a Catalyst rule: the engine applies it where interval semantics allow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def explode_interval_buckets(
    intervals: DataFrame, lo: str = "lo", hi: str = "hi", width: float = 25.0
) -> DataFrame:
    """One row per (interval, overlapped bucket). Half-open [lo, hi)."""
    return intervals.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo) / width).cast("long"),
                # hi is exclusive: a hi exactly on a bucket edge doesn't
                # reach into the next bucket
                F.floor((F.col(hi) - F.lit(1e-9)) / width).cast("long"),
            )
        ),
    )


def bucketed_range_join(
    fact: DataFrame,
    intervals: DataFrame,
    value_col: str,
    lo: str = "lo",
    hi: str = "hi",
    width: float = 25.0,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on bucket + residual range predicate. Drop the helper
    ``bucket`` column before returning."""
    bucketed = explode_interval_buckets(intervals, lo, hi, width)
    fact_b = fact.withColumn("bucket", F.floor(F.col(value_col) / width).cast("long"))
    residual: Column = (F.col(value_col) >= F.col(lo)) & (F.col(value_col) < F.col(hi))
    return fact_b.join(bucketed, on=["bucket"], how=how).filter(residual).drop("bucket")
