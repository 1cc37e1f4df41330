"""Plan + behavior locks for the subquery-shaped report keys
(operators/reports_subq.py): scalar subqueries stay broadcast (never a
driver collect or a global sort), correlated aggregates decorrelate to
aggregate-then-join, and the anti-join path keeps hash scaling."""

from __future__ import annotations

import re

from tests.conftest import SF_SMOKE
from zonal_datacube_spark.operators.reports_subq import (
    q_report_customer_distribution,
    q_report_idle_balance,
    q_report_market_share,
    q_report_small_qty_revenue,
    q_report_top_supplier,
)
from zonal_datacube_spark.plans.diagnostics import formatted_plan


def test_market_share_broadcasts_all_dims(spark):
    plan = formatted_plan(q_report_market_share(spark, SF_SMOKE))
    # customer, region-nation, supplier all broadcast; numerator and
    # denominator come from ONE conditional aggregate, not two scans
    assert plan.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in plan
    # one lineitem scan feeds both ratio terms (one Location line per scan)
    assert len(re.findall(r"Location.*lineitem", plan)) == 1


def test_customer_distribution_keeps_zero_bucket(spark):
    rows = q_report_customer_distribution(spark, SF_SMOKE).collect()
    by_count = {r.c_count: r.custdist for r in rows}
    # every customer lands in exactly one bucket
    n_cust = sum(by_count.values())
    from zonal_datacube_spark.sources.loader import load_table

    assert n_cust == load_table(spark, SF_SMOKE, "customer").count()
    plan = formatted_plan(q_report_customer_distribution(spark, SF_SMOKE))
    assert "LeftOuter" in plan  # zero-order customers must survive


def test_top_supplier_no_global_sort_no_collect(spark):
    df = q_report_top_supplier(spark, SF_SMOKE)
    plan = formatted_plan(df)
    # the scalar max re-joins as a broadcast equality — no Sort node for
    # picking the winner, no nested loop
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" not in plan
    rows = df.collect()
    assert rows
    assert len({r.total_rev for r in rows}) == 1  # ties all share the max


def test_small_qty_revenue_aggregate_then_join(spark):
    plan = formatted_plan(q_report_small_qty_revenue(spark, SF_SMOKE))
    # per-part avg computed before the join back (partial_avg partial agg),
    # brand dim broadcast
    assert "partial_avg" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_idle_balance_anti_join_and_scalar_broadcast(spark):
    df = q_report_idle_balance(spark, SF_SMOKE)
    plan = formatted_plan(df)
    assert "LeftAnti" in plan  # NOT EXISTS stays an anti join
    # the 1-row global-average side is broadcast, not collected
    assert "BroadcastExchange" in plan
    rows = df.collect()
    assert rows and all(r.n_cust >= 1 for r in rows)
