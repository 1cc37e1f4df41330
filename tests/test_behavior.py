"""Behavioral-analytics tests: funnel strict-ordering semantics on a
hand-built frame, and plan locks for the single-shuffle funnel window
chain and the 3-shuffle cohort rollup."""

from __future__ import annotations

import datetime
import re

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from zonal_datacube_spark.operators.behavior import (
    q_cohort_retention,
    q_funnel_conversion,
)
from zonal_datacube_spark.plans.diagnostics import formatted_plan


def _shuffle_exchanges(plan: str) -> int:
    # tree-edge Exchange nodes only; BroadcastExchange doesn't count as a
    # shuffle and the detail section repeats nodes without tree prefixes
    return len([l for l in plan.splitlines() if re.search(r"[+:]- Exchange ", l)])


def test_funnel_requires_strict_stage_order(spark, tmp_path):
    """A user whose purchase precedes their click must NOT count for the
    purchase stage, even though all four event types exist for them."""
    t0_ns = int(datetime.datetime(2024, 1, 1).timestamp() * 1e9)

    def ev(uid, minute, typ):
        # loader contract: events.ts is int64 epoch NANOS (TESTDATA.md)
        return (uid, t0_ns + minute * 60_000_000_000, typ)

    rows = [
        # user 1: clean in-order funnel -> reaches purchase
        ev(1, 0, "signup"), ev(1, 1, "view"), ev(1, 2, "click"), ev(1, 3, "purchase"),
        # user 2: purchase BEFORE click -> stalls at click
        ev(2, 0, "signup"), ev(2, 1, "view"), ev(2, 3, "click"), ev(2, 2, "purchase"),
        # user 3: never signs up -> counts for no stage
        ev(3, 0, "view"), ev(3, 1, "click"), ev(3, 2, "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_type string")
    path = str(tmp_path / "events.parquet")
    df.withColumn("event_id", F.monotonically_increasing_id()).withColumn(
        "value", F.lit(1.0)
    ).withColumn("props", F.lit("{}")).write.parquet(path)

    # point the operator at the tiny fixture dir (loader reads <dir>/events.parquet)
    out = {
        r["stage"]: (r["n_users"], r["conv_ppm"])
        for r in q_funnel_conversion(spark, str(tmp_path)).collect()
    }
    assert out["signup"] == (2, 1_000_000)
    assert out["view"] == (2, 1_000_000)
    assert out["click"] == (2, 1_000_000)
    assert out["purchase"] == (1, 500_000)


def test_funnel_plan_single_user_shuffle(spark):
    plan = formatted_plan(q_funnel_conversion(spark, SF_SMOKE))
    # 4 chained stage windows share one partitionBy(user_id) exchange; the
    # only other shuffle is the single-partition collapse for the global
    # funnel counts — stage count must never add shuffles
    assert len(re.findall(r"[+:]- Window", plan)) == 4
    assert _shuffle_exchanges(plan) == 2


def test_cohort_plan_three_shuffles(spark):
    plan = formatted_plan(q_cohort_retention(spark, SF_SMOKE))
    # user_id rollup, (cohort, week_k) rollup, cohort-week window — the
    # raw event table crosses the wire exactly once
    assert _shuffle_exchanges(plan) == 3


def test_cohort_week_zero_is_cohort_size(spark):
    rows = q_cohort_retention(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r["n_active"] <= r["cohort_size"]
        if r["week_k"] == 0:
            assert r["n_active"] == r["cohort_size"]
            assert r["retained_ppm"] == 1_000_000


def test_diurnal_profile_indexes_average_to_one(spark):
    from zonal_datacube_spark.operators.behavior import q_ts_diurnal_profile

    rows = q_ts_diurnal_profile(spark, SF_SMOKE).collect()
    assert rows
    by_type = {}
    for r in rows:
        assert 0 <= r.hour_of_day <= 23
        assert r.seasonal_index > 0
        by_type.setdefault(r.event_type, []).append(r)
    for trs in by_type.values():
        # n-weighted mean of the seasonal index is exactly 1
        tot_n = sum(r.n for r in trs)
        weighted = sum(r.seasonal_index * r.n for r in trs) / tot_n
        assert abs(weighted - 1.0) < 1e-4


def test_time_to_convert_ordering(spark):
    from zonal_datacube_spark.operators.behavior import (
        q_behavior_time_to_convert,
    )

    r = q_behavior_time_to_convert(spark, SF_SMOKE).collect()[0]
    assert r.n_converted > 0
    assert 0 <= r.median_gap_s <= r.p90_gap_s
    assert r.avg_gap_s > 0


def test_basket_affinity_ratios_consistent(spark):
    from zonal_datacube_spark.operators.behavior import (
        BASKET_TOPK,
        q_basket_affinity,
    )

    rows = q_basket_affinity(spark, SF_SMOKE).collect()
    assert 1 <= len(rows) <= BASKET_TOPK
    counts = [r.n_ab for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert r.brand_a < r.brand_b
        assert 0 < r.support <= 1
        assert 0 < r.confidence <= 1
        assert r.lift > 0
