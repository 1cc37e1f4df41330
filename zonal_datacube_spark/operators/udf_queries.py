"""Rows-only query keys exercising the Python-kernel surface
(SURVEY.md §2.12): pandas UDF / grouped-agg UDAF / applyInPandas.

These run real Arrow-batched Python kernels, so no SQL oracle exists by
design — the driver records the weaker rows-only check (declared without
``oracle_sql`` entries). Value-level correctness for the same kernels is
asserted in tests/test_functions.py against hand-computed expectations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zonal_datacube_spark.functions.udfs import per_group_zscore, zonal_trimmed_mean
from zonal_datacube_spark.operators.zonal import zones_df
from zonal_datacube_spark.sources.loader import load_table


def q_udaf_zonal_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-zone 10%-trimmed mean (grouped-agg pandas UDF) over the zonal
    assignment — the custom-statistic slot of the reference's per-tile
    analysis registry."""
    cells = load_table(spark, sf_dir, "events")
    zones = F.broadcast(zones_df(spark))
    assigned = cells.join(
        zones, (cells.value >= zones.lo) & (cells.value < zones.hi)
    ).select("zone_id", "value")
    return zonal_trimmed_mean(assigned).orderBy("zone_id")


def q_udf_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user z-scored event values via applyInPandas (whole-group
    kernel), reduced to per-user extremes so the result stays small."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    z = per_group_zscore(ev, "user_id", "value")
    return z.groupBy("user_id").agg(
        F.round(F.max("zscore"), 6).alias("max_z"),
        F.round(F.min("zscore"), 6).alias("min_z"),
        F.count("*").alias("n"),
    )


QUERIES = {
    "q_udaf_zonal_trimmed_mean": q_udaf_zonal_trimmed_mean,
    "q_udf_grouped_zscore": q_udf_grouped_zscore,
}

ORACLE: dict[str, str] = {}  # rows-only by design (SURVEY.md §2.12)
