"""Behavior + plan locks for the warehouse ops (SCD2, DQ checks) and the
label-centroid embedding report."""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from zonal_datacube_spark.operators.similarity import q_sim_label_centroid
from zonal_datacube_spark.operators.warehouse import q_dq_checks, q_scd2_build
from zonal_datacube_spark.plans.diagnostics import formatted_plan
from zonal_datacube_spark.sources.loader import load_table


def test_scd2_one_current_row_per_customer(spark):
    rows = q_scd2_build(spark, SF_SMOKE).collect()
    n_orders = load_table(spark, SF_SMOKE, "orders").count()
    assert len(rows) == n_orders  # one interval per change, none dropped
    by_cust = {}
    for r in rows:
        by_cust.setdefault(r.o_custkey, []).append(r)
    for cust, ivs in by_cust.items():
        currents = [r for r in ivs if r.is_current == 1]
        assert len(currents) == 1, f"customer {cust} must have one open row"
        # closed intervals chain: each valid_to equals a later valid_from
        ivs.sort(key=lambda r: (r.valid_from, r.o_orderkey))
        for prev, nxt in zip(ivs, ivs[1:]):
            assert prev.valid_to == nxt.valid_from
        assert ivs[-1].valid_to is None


def test_scd2_single_window_shuffle(spark):
    plan = formatted_plan(q_scd2_build(spark, SF_SMOKE))
    assert plan.count("Exchange") <= 2  # one shuffle (+AQE read node)
    assert "Join" not in plan  # never the naive self-join formulation


def test_dq_checks_all_pass_on_clean_fixture(spark):
    rows = {r.check_name: r for r in q_dq_checks(spark, SF_SMOKE).collect()}
    assert len(rows) == 7
    assert all(r.n_violations == 0 and r.passed == 1 for r in rows.values())


def test_dq_checks_one_scan_per_table(spark):
    import re

    plan = formatted_plan(q_dq_checks(spark, SF_SMOKE))
    # fused constraint battery: lineitem and events each scanned once
    # (one Location line per parquet scan node)
    assert len(re.findall(r"Location.*lineitem", plan)) == 1
    assert len(re.findall(r"Location.*events", plan)) == 1


def test_label_centroid_no_explode_two_shuffles(spark):
    df = q_sim_label_centroid(spark, SF_SMOKE)
    plan = formatted_plan(df)
    # centroid built by 64 avg aggregates in one pass — no per-element
    # explode (Generate) and the centroid side re-enters via broadcast
    assert "Generate" not in plan
    assert "BroadcastHashJoin" in plan
    rows = df.collect()
    assert {r.label for r in rows} == set(range(10))
    # unit vectors scoring against their own centroid: cosine in [-1, 1]
    assert all(-1.0 <= r.min_cos <= r.avg_cos <= 1.0 for r in rows)


def test_cdc_diff_ops_partition_and_delta_signs(spark):
    from zonal_datacube_spark.operators.warehouse import q_cdc_diff

    rows = {r.op: r for r in q_cdc_diff(spark, SF_SMOKE).collect()}
    assert set(rows) <= {"I", "U", "D"}
    assert rows, "snapshots a year apart must differ"
    if "I" in rows:
        assert rows["I"].spend_delta > 0  # inserts only add spend
    if "D" in rows:
        assert rows["D"].spend_delta < 0  # deletes only remove spend
