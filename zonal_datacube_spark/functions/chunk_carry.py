"""Two-level last-non-null carry — the distributed rewrite of the
carry-forward window (``last(x, ignorenulls=True) OVER (... ROWS
UNBOUNDED PRECEDING)``) for enum-cardinality partition keys.

Problem: gap-fill / LOCF / interpolation bracketing all reduce to "the
most recent non-null observation at or before me" — a GROWING frame
that Spark evaluates incrementally (O(n) per partition) but whose
parallelism is still capped at the partition-key cardinality. With ~5
series keys, 100 TB of events funnel through 5 reducers (VERDICT r06/r07
what's-wrong #2).

Rewrite (same two-level decomposition as functions/prefix_sweep.py):

1. bucket the numeric order column into ``n_buckets`` equal-width value
   ranges per partition key (per-key min/max from one broadcast
   aggregate; equal order values never straddle buckets);
2. run the carry-forward window INSIDE each (key, bucket) —
   ``n_keys × n_buckets`` parallel partitions;
3. per (key, bucket) take the bucket's LAST non-null source value (a
   lexicographic struct max over (order, tiebreaks, src) — one partial
   aggregate), sweep those on the bucket-grain table (broadcast-sized
   by construction) into each bucket's carry-in, and stitch:
   ``carried = coalesce(in_bucket_carry, carry_in_of_earlier_buckets)``.

A row's in-bucket carry sees exactly the rows at or before it in its
bucket; the carry-in contributes the latest non-null of all FULL
earlier buckets — identical to the single-partition window's answer.

Pair-consistency: callers that carry several fields that must come from
the SAME source row (a bracketing (ts, value) pair) pack them into ONE
struct column and carry that — per-column carries could mix rows.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_P, _B = "_zds_cc_part", "_zds_cc_bucket"

DEFAULT_BUCKETS = 64


def carry_last(
    df: DataFrame,
    part_cols: Sequence[str],
    order_col: str,
    tiebreak: Sequence[str],
    src_col: str,
    out_col: str,
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """``df`` + ``out_col`` = the last non-null ``src_col`` over rows at
    or before the current one in ``(order_col, *tiebreak)`` ascending
    order within each ``part_cols`` group (frame UNBOUNDED PRECEDING →
    CURRENT ROW), computed with (part, value-bucket) parallelism.

    ``order_col`` must be numeric and NON-NULL (a null order value has
    no place in the carry order — callers filter first); descending
    carries pass a negated copy of the order/tiebreak columns. Ties
    beyond ``tiebreak`` are broken by the src value itself in the
    bucket rollup (deterministic; rows that tie on the full
    ``(order_col, *tiebreak)`` key were order-ambiguous in the direct
    window too).
    """
    parts = list(part_cols)
    work = df
    if not parts:
        work = work.withColumn(_P, F.lit(1))
        parts = [_P]

    bounds = work.groupBy(*parts).agg(
        F.min(order_col).alias("_zds_lo"), F.max(order_col).alias("_zds_hi")
    )
    lo, hi = F.col("_zds_lo"), F.col("_zds_hi")
    width = (hi - lo) / F.lit(float(n_buckets))
    bucket = (
        F.when(
            hi > lo,
            F.least(
                F.lit(n_buckets - 1),
                F.greatest(F.lit(0), F.floor((F.col(order_col) - lo) / width)),
            ),
        )
        .otherwise(F.lit(0))
        .cast("int")
    )
    work = (
        work.join(F.broadcast(bounds), parts)
        .withColumn(_B, bucket)
        .drop("_zds_lo", "_zds_hi")
    )

    # ---- level 1: carry-forward inside each (part, bucket) ----
    order_exprs = [F.col(order_col).asc()] + [F.col(c).asc() for c in tiebreak]
    in_w = (
        Window.partitionBy(*parts, _B)
        .orderBy(*order_exprs)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = work.withColumn(out_col, F.last(src_col, ignorenulls=True).over(in_w))

    # ---- level 2: per-bucket last non-null → carry-in offsets ----
    # lexicographic struct max = "src of the max (order, *tiebreak) among
    # non-null src rows"; the bucket-grain table is n_buckets rows per part
    keyed = F.when(
        F.col(src_col).isNotNull(),
        F.struct(
            F.col(order_col).alias("_o"),
            *[F.col(c).alias(f"_t{i}") for i, c in enumerate(tiebreak)],
            F.col(src_col).alias("_v"),
        ),
    )
    totals = work.groupBy(*parts, _B).agg(F.max(keyed).alias("_zds_bl"))
    off_w = (
        Window.partitionBy(*parts)
        .orderBy(F.col(_B).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        *parts,
        _B,
        F.last(F.col("_zds_bl").getField("_v"), ignorenulls=True)
        .over(off_w)
        .alias("_zds_ci"),
    )

    # ---- stitch: in-bucket carry, else earlier buckets' carry-in ----
    out = (
        local.join(F.broadcast(offsets), [*parts, _B])
        .withColumn(out_col, F.coalesce(F.col(out_col), F.col("_zds_ci")))
        .drop(_B, "_zds_ci")
    )
    if _P in out.columns:
        out = out.drop(_P)
    return out
