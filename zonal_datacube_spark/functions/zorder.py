"""Z-order (Morton) layout — multi-dimensional data skipping at rest.

A parquet file sorted on ONE column gives tight row-group min/max ranges
on that column only; a filter on any other column reads everything.
Interleaving the bits of two (bucketed) columns into one Morton key and
sorting by it gives every row group a small rectangle in BOTH dimensions,
so min/max pruning works for filters on either column — the lakehouse
``ZORDER BY`` technique, expressed with public Spark APIs:

1. bucket each dimension into ``2^bits`` integer cells (caller chooses the
   bucketing — range, hash, whatever matches the filter patterns);
2. ``zorder_key2`` interleaves the bits JVM-side (pure shift/mask
   arithmetic inside whole-stage codegen, no UDF);
3. ``write_zordered`` range-partitions + sorts by the key and writes
   parquet, whose per-file and per-row-group statistics then prune on
   both dimensions (observable in the footers —
   tests/test_zorder.py reads them with pyarrow and counts which files a
   filter on the SECOND dimension could skip vs a single-column sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key2(a: Column | str, b: Column | str, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative integer
    columns: a's bit i lands at position 2i, b's at 2i+1. Plain codegen'd
    shift/mask arithmetic; 2·bits ≤ 62 keeps the key in a BIGINT."""
    if not 1 <= bits <= 31:
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    a_col = F.col(a) if isinstance(a, str) else a
    b_col = F.col(b) if isinstance(b, str) else b
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        key = key + (
            F.shiftleft((F.shiftright(a_col.cast("bigint"), i) % 2), 2 * i)
            + F.shiftleft((F.shiftright(b_col.cast("bigint"), i) % 2), 2 * i + 1)
        )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    a: str,
    b: str,
    bits: int = 8,
    n_files: int = 8,
) -> None:
    """Write df as parquet laid out in Morton order over (a, b): range-
    partition on the interleaved key (files = contiguous key ranges =
    small rectangles in (a, b) space), sort within partitions so row-group
    statistics are tight, drop the helper key column from the files."""
    keyed = df.withColumn("_zkey", zorder_key2(a, b, bits))
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
