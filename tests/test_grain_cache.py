"""Shared-grain cache (functions/grain_cache.py — VERDICT r11
next-round #2: the percentile family re-derived the same (table,
value-axis) grain key after key in-suite).

Pins: (1) same-axis calls return the SAME cached DataFrame, different
axes don't collide; (2) the grain's content equals a direct groupBy;
(3) the consumers that migrated to the cache stay value-identical to
their pre-cache formulations (hash parity is the standing gate in
check_parity; here the cheap structural twin); (4) LRU eviction
unpersists without breaking an evicted frame (it recomputes)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from zonal_datacube_spark.functions import grain_cache
from zonal_datacube_spark.functions.grain_cache import (
    GRAIN_COUNT,
    table_value_grain,
)
from zonal_datacube_spark.sources.loader import load_table


@pytest.fixture(autouse=True)
def _fresh_cache():
    grain_cache.clear_grain_cache()
    yield
    grain_cache.clear_grain_cache()


def test_same_axis_is_cached_distinct_axes_are_not(spark):
    a = table_value_grain(
        spark, SF_SMOKE, "lineitem", ("l_returnflag",),
        "l_extendedprice", "l_extendedprice",
    )
    b = table_value_grain(
        spark, SF_SMOKE, "lineitem", ("l_returnflag",),
        "l_extendedprice", "l_extendedprice",
    )
    assert a is b
    c = table_value_grain(
        spark, SF_SMOKE, "lineitem", ("l_returnflag",),
        "CAST(l_quantity AS DOUBLE)", "val",
    )
    assert c is not a


def test_grain_content_matches_direct_groupby(spark):
    grain = table_value_grain(
        spark, SF_SMOKE, "events", ("event_type",), "value", "value"
    )
    direct = (
        load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type", "value")
        .agg(F.count("*").alias(GRAIN_COUNT))
    )
    assert sorted(map(tuple, grain.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_eviction_unpersists_but_frame_still_computes(spark):
    first = table_value_grain(
        spark, SF_SMOKE, "events", ("event_type",), "value", "value"
    )
    n = first.count()
    # flood the cache past its cap with distinct derived axes
    for i in range(grain_cache._CAP + 1):
        table_value_grain(
            spark, SF_SMOKE, "events", ("event_type",),
            f"value + {i}", "value",
        )
    assert first.storageLevel.useMemory is False  # evicted
    assert first.count() == n  # recomputes fine


def test_stacked_union_equals_stacked_groupby(spark):
    """q_agg_percentile's union-of-grains must be the same multiset as
    the old stack-then-group grain."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    stacked = li.selectExpr(
        "l_returnflag",
        "stack(2, 'qty', CAST(l_quantity AS DOUBLE),"
        " 'price', l_extendedprice) AS (var, val)",
    )
    old = (
        stacked.groupBy("l_returnflag", "var", "val")
        .agg(F.count("*").alias(GRAIN_COUNT))
    )
    price = table_value_grain(
        spark, SF_SMOKE, "lineitem", ("l_returnflag",),
        "l_extendedprice", "val",
    )
    qty = table_value_grain(
        spark, SF_SMOKE, "lineitem", ("l_returnflag",),
        "CAST(l_quantity AS DOUBLE)", "val",
    )
    new = price.select(
        "l_returnflag", F.lit("price").alias("var"), "val", GRAIN_COUNT
    ).unionByName(
        qty.select("l_returnflag", F.lit("qty").alias("var"), "val", GRAIN_COUNT)
    )
    assert sorted(map(tuple, new.collect())) == sorted(
        map(tuple, old.collect())
    )
