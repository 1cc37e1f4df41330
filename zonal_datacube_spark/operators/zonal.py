"""Zonal statistics — the reference's signature semantics (SURVEY.md §2.11).

Reference analogue (``/root/reference/README.md:2`` — "Scalable Dask-backed
zonal statistics"): assign each raster cell to a zone, then aggregate per
zone. Relationally (the Raptor decomposition, PAPERS.md:9) that is a
range/spatial join followed by a grouped aggregation.

Spark-first design:
- zones are a tiny inline dimension → ``broadcast()`` hint, so the huge cell
  side never shuffles for the join (the analogue of shipping the zone table
  to every Dask worker);
- the per-zone aggregation runs as partial (map-side) + final HashAggregate —
  Spark's built-in split-apply-combine, identical in shape to the reference's
  per-tile partial stats + tree-reduce combine;
- at 100 TB the plan is unchanged: cells stream through executors once, only
  the tiny per-zone partials shuffle.

The driver fixture stands in for the raster: ``events.value`` is the cell
value, an inline ``(zone_id, lo, hi)`` table is the zone layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zonal_datacube_spark.sources.loader import load_table

# Value-band zones over events.value (observed domain ~0–330). Half-open
# [lo, hi) intervals, deliberately non-uniform width with a catch-all tail.
ZONES = [
    (0, 0.0, 25.0),
    (1, 25.0, 50.0),
    (2, 50.0, 75.0),
    (3, 75.0, 100.0),
    (4, 100.0, 150.0),
    (5, 150.0, 200.0),
    (6, 200.0, 350.0),
]

ZONES_SQL_VALUES = ", ".join(f"({z}, {lo}, {hi})" for z, lo, hi in ZONES)


def zones_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(ZONES, "zone_id INT, lo DOUBLE, hi DOUBLE")


def q_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-zone count/sum/mean/min/max/stddev of cell values.

    Flagship query: scan → broadcast range join → partial+final groupBy.
    """
    cells = load_table(spark, sf_dir, "events")
    zones = F.broadcast(zones_df(spark))
    joined = cells.join(
        zones, (cells.value >= zones.lo) & (cells.value < zones.hi), "inner"
    )
    return (
        joined.groupBy("zone_id")
        .agg(
            F.count("*").alias("n_cells"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("mean_value"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
            F.round(F.stddev_samp("value"), 6).alias("stddev_value"),
        )
        .orderBy("zone_id")
    )


def q_zonal_categorical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical zonal histogram: per-zone per-category cell counts,
    pivoted wide via conditional aggregation (engine-portable column names,
    FIXTURES.md parity rule 5)."""
    cells = load_table(spark, sf_dir, "events")
    zones = F.broadcast(zones_df(spark))
    joined = cells.join(
        zones, (cells.value >= zones.lo) & (cells.value < zones.hi), "inner"
    )
    cats = ["click", "error", "purchase", "signup", "view"]
    aggs = [
        F.count(F.when(F.col("event_type") == c, F.lit(1))).alias(f"n_{c}")
        for c in cats
    ]
    return joined.groupBy("zone_id").agg(*aggs).orderBy("zone_id")


QUERIES = {
    "q_zonal_stats": q_zonal_stats,
    "q_zonal_categorical": q_zonal_categorical,
}

ORACLE = {
    "q_zonal_stats": f"""
        WITH zones(zone_id, lo, hi) AS (VALUES {ZONES_SQL_VALUES})
        SELECT zone_id,
               count(*) AS n_cells,
               round(sum(value), 2) AS sum_value,
               round(avg(value), 6) AS mean_value,
               round(min(value), 2) AS min_value,
               round(max(value), 2) AS max_value,
               round(stddev_samp(value), 6) AS stddev_value
        FROM events JOIN zones ON value >= lo AND value < hi
        GROUP BY zone_id
    """,
    "q_zonal_categorical": f"""
        WITH zones(zone_id, lo, hi) AS (VALUES {ZONES_SQL_VALUES})
        SELECT zone_id,
               count(CASE WHEN event_type = 'click' THEN 1 END) AS n_click,
               count(CASE WHEN event_type = 'error' THEN 1 END) AS n_error,
               count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
               count(CASE WHEN event_type = 'signup' THEN 1 END) AS n_signup,
               count(CASE WHEN event_type = 'view' THEN 1 END) AS n_view
        FROM events JOIN zones ON value >= lo AND value < hi
        GROUP BY zone_id
    """,
}
