"""Scans / sources (SURVEY.md §2.1).

Reference analogue: windowed COG reads + fishnet tile pruning — only tiles
intersecting zones are read. Spark equivalent: parquet column pruning +
predicate pushdown to row-group statistics; both are verified in
``plans/diagnostics.py`` (``ReadSchema`` / ``PushedFilters`` in the
formatted plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zonal_datacube_spark.sources.loader import load_table


def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection-only scan: Catalyst prunes ReadSchema to 3 columns —
    at 100 TB this is the difference between reading 3 columns and 16."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", F.round("l_quantity", 2).alias("qty")
    )


def q_scan_filter_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter pushed to parquet row-group stats (the fishnet-pruning
    analogue): shipdate predicate reaches PushedFilters."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 2).alias("price"),
            F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_day"),
        )
    )


QUERIES = {
    "q_scan_project": q_scan_project,
    "q_scan_filter_pushdown": q_scan_filter_pushdown,
}

ORACLE = {
    "q_scan_project": """
        SELECT l_orderkey, l_linenumber, round(l_quantity, 2) AS qty
        FROM lineitem
    """,
    "q_scan_filter_pushdown": """
        SELECT l_orderkey, l_linenumber,
               round(l_extendedprice, 2) AS price,
               strftime(l_shipdate, '%Y-%m-%d') AS ship_day
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    """,
}
