"""Physical-plan locks for the round-4 keys: broadcasts stay broadcast,
fact tables shuffle at most once, no quadratic joins sneak in when
Catalyst re-plans a future Spark upgrade."""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from zonal_datacube_spark.plans.diagnostics import formatted_plan
from zonal_datacube_spark.registry import all_queries

Q = all_queries()


def _plan(spark, key: str) -> str:
    return formatted_plan(Q[key](spark, SF_SMOKE))


def test_trade_matrix_broadcasts_dims_and_pushes_years(spark):
    plan = _plan(spark, "q_report_trade_matrix")
    assert plan.count("BroadcastHashJoin") >= 2  # supp + cust chains
    assert "PushedFilters" in plan
    assert "CartesianProduct" not in plan


def test_zonal_change_single_scan_broadcast_join(spark):
    plan = _plan(spark, "q_zonal_change")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # the zones range join must NOT be a cartesian product
    assert "CartesianProduct" not in plan


def test_weighted_median_no_global_fact_window(spark):
    plan = _plan(spark, "q_agg_weighted_median")
    # the cumulative sweep runs AFTER the per-price collapse: the node
    # directly above the fact scan is the collapsing aggregate, so no
    # Window ever sees fact-table rows
    assert "Window" in plan
    assert "(2) HashAggregate" in plan


def test_bloom_semi_filter_below_join(spark):
    plan = _plan(spark, "q_join_bloom_semi")
    # map-side membership probes reach the scan side, below the join
    assert plan.index("xxhash64") > plan.index("BroadcastHashJoin")


def test_lateral_decorrelates_to_ranked_window(spark):
    plan = _plan(spark, "q_join_lateral_topn")
    assert "CartesianProduct" not in plan
    assert "Window" in plan  # Catalyst decorrelated ORDER BY…LIMIT


def test_quantiles_multi_single_aggregate(spark):
    plan = _plan(spark, "q_agg_quantiles_multi")
    # one percentile aggregate computes all five cut points
    assert plan.count("percentile") <= 4  # partial+final, key+result refs


def test_ltv_deciles_window_on_rollup_not_fact(spark):
    plan = _plan(spark, "q_report_ltv_deciles")
    # same shape: the per-customer rollup sits directly on the scan; the
    # ntile window only ever sees customer-grain rows
    assert "(2) HashAggregate" in plan
