"""Sinks (SURVEY.md §2.1): parquet / CSV / JSON writers.

Reference analogue: dask ``.to_parquet()`` of result frames. Ours wraps
``DataFrameWriter`` with the engine's defaults:

- parquet + snappy for results that feed further queries;
- optional ``partitionBy`` — at 100 TB, results partitioned by the query's
  group key (zone_id, day) make downstream reads partition-prunable;
- explicit repartition before write so file count ≈ partition count is a
  deliberate choice, not whatever the last shuffle left behind.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    if n_files is not None:
        df = df.repartition(n_files, *partition_by) if partition_by else df.coalesce(n_files)
    writer = df.write.mode(mode).option("compression", "snappy")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """ORC sink (native ORC writer, zlib). Same layout contract as the
    parquet sink; ORC carries its own column statistics and bloom-filter
    support, so downstream reads keep predicate pushdown."""
    writer = df.write.mode(mode).format("orc")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)
