"""Plan-shape locks for the supply-chain TPC-H shapes (Q2/Q9/Q11/Q12/Q16/
Q20/Q21) — the third report batch. Same discipline as test_reports.py:
dims broadcast, EXISTS/NOT IN stay semi/anti hash joins (never nested
loop), scalar subqueries stay broadcast 1-row sides, ordered limits stay
TakeOrderedAndProject."""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from zonal_datacube_spark.operators.reports_supply import (
    Q20_SHARE,
    q_report_dominant_suppliers,
    q_report_important_stock,
    q_report_late_shipment_priority,
    q_report_min_cost_supplier,
    q_report_product_profit,
    q_report_supplier_part_counts,
    q_report_waiting_suppliers,
)
from zonal_datacube_spark.plans.diagnostics import formatted_plan


def test_min_cost_supplier_windows_aggregate_not_fact(spark):
    plan = formatted_plan(q_report_min_cost_supplier(spark, SF_SMOKE))
    # part + region-supplier dims broadcast; correlated min is a Window
    # over the reduced offer table; top-N never globally sorts
    assert plan.count("BroadcastHashJoin") >= 2
    assert "Window" in plan
    assert "TakeOrderedAndProject" in plan
    assert "partial_min" in plan  # offer build partial-aggregates map-side


def test_product_profit_broadcasts_three_dims(spark):
    plan = formatted_plan(q_report_product_profit(spark, SF_SMOKE))
    assert plan.count("BroadcastHashJoin") >= 3  # part, supplier, nation
    assert "partial_sum" in plan


def test_important_stock_threshold_is_broadcast_not_collect(spark):
    plan = formatted_plan(q_report_important_stock(spark, SF_SMOKE))
    # the scalar total joins back as a broadcast 1-row side — the plan
    # must contain a broadcast join and no Cartesian/nested-loop product
    assert "Broadcast" in plan
    assert "CartesianProduct" not in plan


def test_late_shipment_priority_partial_aggs(spark):
    plan = formatted_plan(q_report_late_shipment_priority(spark, SF_SMOKE))
    assert "partial_sum" in plan  # CASE sums combine map-side


def test_supplier_part_counts_anti_join_and_distinct(spark):
    plan = formatted_plan(q_report_supplier_part_counts(spark, SF_SMOKE))
    assert "LeftAnti" in plan  # NOT IN complaint set stays an anti join
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dominant_suppliers_semi_join_probe(spark):
    plan = formatted_plan(q_report_dominant_suppliers(spark, SF_SMOKE))
    assert "LeftSemi" in plan  # supplier IN dominant-set
    assert "CartesianProduct" not in plan


def test_dominant_share_semantics(spark):
    # every returned supplier really holds > Q20_SHARE of some red part
    rows = q_report_dominant_suppliers(spark, SF_SMOKE).collect()
    assert isinstance(Q20_SHARE, float)
    names = {r.s_name for r in rows}
    assert len(names) == len(rows)  # distinct suppliers, no fan-out dupes


def test_waiting_suppliers_semi_anti_hash_joins(spark):
    df = q_report_waiting_suppliers(spark, SF_SMOKE)
    plan = formatted_plan(df)
    # EXISTS → LeftSemi, NOT EXISTS → LeftAnti, both as *hash* joins on
    # l_orderkey with the supplier inequality as residual — the plan that
    # survives 100×. Nested-loop anywhere means the rewrite regressed.
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan
    rows = df.collect()
    counts = [r.numwait for r in rows]
    assert counts == sorted(counts, reverse=True)
