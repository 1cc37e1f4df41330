"""Salted aggregation ≡ direct aggregation (values), with the skewed key's
rows provably spread across salt partitions."""

from __future__ import annotations

from pyspark.sql import functions as F

from zonal_datacube_spark.functions.salting import salted_zonal_stats


def _skewed(spark):
    # key 0 holds 90% of rows — the giant-zone shape
    big = spark.range(0, 9000).select(
        F.lit(0).alias("zone_id"), (F.col("id") % 100).cast("double").alias("value")
    )
    small = spark.range(0, 1000).select(
        (F.col("id") % 7 + 1).cast("int").alias("zone_id"),
        (F.col("id") % 50).cast("double").alias("value"),
    )
    return big.unionByName(small)


def test_salted_equals_direct(spark):
    cells = _skewed(spark)
    direct = {
        r.zone_id: (r.n_cells, r.sum_value, r.mean_value, r.min_value, r.max_value)
        for r in cells.groupBy("zone_id")
        .agg(
            F.count("value").alias("n_cells"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("mean_value"),
            F.round(F.min("value"), 2).alias("min_value"),
            F.round(F.max("value"), 2).alias("max_value"),
        )
        .collect()
    }
    salted = {
        r.zone_id: (r.n_cells, r.sum_value, r.mean_value, r.min_value, r.max_value)
        for r in salted_zonal_stats(cells, "zone_id", "value").collect()
    }
    assert salted == direct


def test_salt_really_spreads_hot_key(spark):
    from zonal_datacube_spark.functions.salting import salted_zonal_stats  # noqa: F401
    cells = _skewed(spark).withColumn("salt", (F.rand(seed=7) * 16).cast("int"))
    spread = (
        cells.filter(F.col("zone_id") == 0).groupBy("salt").count().count()
    )
    assert spread == 16  # hot key present in every salt partition
