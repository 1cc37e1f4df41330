"""MERGE / upsert kernels — the CDC step of a training-data pipeline.

A 100 TB corpus is never rebuilt from scratch; it is *merged into*: a daily
crawl delta upserts on document key, a metadata refresh overwrites columns
for matched keys. Warehouse engines spell this ``MERGE INTO``; on plain
Spark DataFrames the same semantics are a composition of one anti-join and
one union — no shuffle beyond the anti-join itself, broadcast-able whenever
the delta is small (the common case: delta ≪ corpus).

Scale notes:
- ``upsert`` is last-write-wins at row granularity: the source (delta) side
  replaces matched target rows wholesale. One ``left_anti`` join on the key
  + one union; with a small delta, AQE turns the anti-join into a broadcast
  and the corpus is never shuffled.
- ``merge_accumulate`` is the aggregate-update variant (UPDATE SET x =
  f(old, new) ... WHEN NOT MATCHED INSERT): a single full-outer join on the
  key, then per-column coalesce/combine expressions. Exactly one shuffle of
  each side on the merge key.
- Writing the merged result back partitioned by the merge key's bucket
  (sinks.write_parquet(partition_by=...)) keeps successive merges
  co-partitioned on disk.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def upsert(target: DataFrame, source: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Last-write-wins upsert: every source row lands in the result; target
    rows survive only when no source row shares their key. Schemas must
    match by name (unionByName)."""
    keep = target.join(source.select(*keys).distinct(), list(keys), "left_anti")
    return source.unionByName(keep)


def merge_accumulate(
    target: DataFrame,
    source: DataFrame,
    keys: Sequence[str],
    combine: dict[str, Column],
) -> DataFrame:
    """Full-outer MERGE with per-column combine expressions.

    ``combine`` maps output column name -> expression over ``F.col("t.x")``
    / ``F.col("s.x")`` (target / source aliases). Unmatched sides surface as
    NULLs, exactly like SQL MERGE's WHEN [NOT] MATCHED arms; a typical entry
    is ``F.coalesce(F.col("t.bal") + F.col("s.delta"), F.col("t.bal"),
    F.col("s.delta"))`` — update when both, keep when target-only, insert
    when source-only."""
    t, s = target.alias("t"), source.alias("s")
    # string-qualified refs (F.col("t.k")), not DataFrame indexing (t[k]):
    # target and source often share lineage (state and delta carved from
    # the same scan), and attribute-id resolution is ambiguous there
    cond = [F.col(f"t.{k}").eqNullSafe(F.col(f"s.{k}")) for k in keys]
    joined = t.join(s, cond, "full_outer")
    key_cols = [
        F.coalesce(F.col(f"t.{k}"), F.col(f"s.{k}")).alias(k) for k in keys
    ]
    out_cols = [expr.alias(name) for name, expr in combine.items()]
    return joined.select(*key_cols, *out_cols)
