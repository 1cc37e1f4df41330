"""Tests for the custom Python DataSource connector and the SCD2
point-in-time join."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from zonal_datacube_spark.operators.warehouse import q_scd2_build, q_scd2_pit_join
from zonal_datacube_spark.sources.loader import load_table
from zonal_datacube_spark.sources.raster_source import (
    RASTER_SOURCE_NAME,
    register_raster_source,
)


def _raster(spark, n=64, band_rows=16):
    register_raster_source(spark)
    return (
        spark.read.format(RASTER_SOURCE_NAME)
        .option("n", n)
        .option("band_rows", band_rows)
        .load()
    )


def test_raster_source_values_and_count(spark):
    df = _raster(spark, n=64, band_rows=16)
    assert df.count() == 64 * 64
    rows = {(r.x, r.y): r.val for r in df.filter(F.col("y") < 2).collect()}
    for (x, y), val in rows.items():
        assert val == (x * 31 + y * 17) % 97


def test_raster_source_is_partition_parallel(spark):
    df = _raster(spark, n=64, band_rows=16)
    # one InputPartition per row band → 4 RDD partitions, read concurrently
    assert df.rdd.getNumPartitions() == 4
    # bands tile the raster exactly: each partition holds band_rows*n rows
    sizes = df.rdd.glom().map(len).collect()
    assert sorted(sizes) == [16 * 64] * 4


def test_raster_source_filters_apply(spark):
    df = _raster(spark, n=64, band_rows=16)
    got = df.filter((F.col("x") == 0) & (F.col("val") == 0)).count()
    want = sum(1 for y in range(64) if (y * 17) % 97 == 0)
    assert got == want


def test_pit_join_covers_every_lineitem_exactly_once(spark):
    out = q_scd2_pit_join(spark, SF_SMOKE).collect()
    n_li = load_table(spark, SF_SMOKE, "lineitem").count()
    # LEFT join against a partitioning interval set: every shipment
    # surfaces exactly once (at most one matching interval; no-state rows
    # kept with NULL state, never dropped, never duplicated)
    assert sum(r.n_shipments for r in out) == n_li
    assert sum(r.n_no_state for r in out) > 0  # fixture ships pre-state
    for r in out:
        assert 0 <= r.n_on_current <= r.n_shipments
        assert 0 <= r.n_no_state <= r.n_shipments


def test_pit_join_never_sees_the_future(spark):
    """Spot-check temporal correctness: recompute a few shipments' states
    naively and compare against the interval the join would select."""
    intervals = q_scd2_build(spark, SF_SMOKE)
    orders = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_custkey"
    )
    li_base = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_orderkey", "l_shipdate")
        .limit(50)
    )
    li = li_base.join(
        orders, li_base.l_orderkey == orders.o_orderkey
    ).collect()
    ivs = intervals.collect()
    by_cust: dict[int, list] = {}
    for r in ivs:
        by_cust.setdefault(r.o_custkey, []).append(r)
    for row in li:
        matches = [
            iv
            for iv in by_cust[row.o_custkey]
            if iv.valid_from <= row.l_shipdate
            and (iv.valid_to is None or row.l_shipdate < iv.valid_to)
        ]
        assert len(matches) <= 1  # at most one state visible at ship time
        if matches:
            assert matches[0].valid_from <= row.l_shipdate  # no future state
        else:
            # no state yet: shipment precedes the customer's first change
            first = min(iv.valid_from for iv in by_cust[row.o_custkey])
            assert row.l_shipdate < first
