"""Physical-plan locks for the round-8 scale sweep: the six per-series
timeseries windows and the sequence-packing cumsum must never again run
a window partitioned by the bare event_type/lang enum over data-scaled
input (VERDICT r06/r07 what's-wrong #2/#3). Every window whose ORDER BY
touches a data-grain column (raw idx / epoch / doc_id) must carry a
chunk or bucket partition key; bucket-grain sweeps (offsets/totals) are
bounded by construction and are allowed."""

from __future__ import annotations

import re

from tests.conftest import SF_SMOKE
from zonal_datacube_spark.plans.diagnostics import formatted_plan, window_specs
from zonal_datacube_spark.registry import all_queries

Q = all_queries()

REWRITTEN = {
    "q_ts_peaks": ("_zds_ps_bucket", "_zds_chunk_b"),
    "q_ts_time_weighted_avg": ("_zds_ps_bucket", "_zds_chunk_b"),
    "q_ts_moving_median": ("_zds_ps_bucket", "_zds_chunk_b"),
    "q_ts_ewma": ("_zds_ps_bucket", "_zds_chunk_b"),
    "q_ts_drawdown": ("_zds_ps_bucket",),
    "q_ts_resample_interp": ("_zds_cc_bucket",),
    "q_pack_sequences": ("_zds_ps_bucket",),
}

# any of these in a windowspecdefinition marks a chunk/bucket-parallel
# window (partition key) or a bounded bucket-grain sweep (order key)
_PARALLEL_MARKS = ("_zds_ps_bucket", "_zds_chunk_b", "_zds_cc_bucket")
# data-grain order columns: a window ordering by one of these runs over
# the full fact stream and MUST be chunk/bucket-partitioned
_DATA_ORDER = re.compile(r"\b(idx|ts_us|neg_us|doc_id|ts|event_id)#\d+")


def _specs(plan: str) -> list[str]:
    # balanced-paren extraction (ADVICE r08): the old [^)]* regex
    # truncated at the first ')' inside a cast()/function-call expression
    # and silently dropped the ORDER BY section from the inspected span
    return window_specs(plan)


def _plan(spark, key: str) -> str:
    return formatted_plan(Q[key](spark, SF_SMOKE))


def test_rewritten_keys_use_chunked_machinery(spark):
    for key, marks in REWRITTEN.items():
        plan = _plan(spark, key)
        for mark in marks:
            assert mark in plan, f"{key}: missing {mark}"
        assert "CartesianProduct" not in plan, key


def test_no_enum_window_over_data_grain_order(spark):
    for key in REWRITTEN:
        plan = _plan(spark, key)
        for spec in _specs(plan):
            if _DATA_ORDER.search(spec):
                assert any(m in spec for m in _PARALLEL_MARKS), (
                    f"{key}: data-grain window without chunk/bucket "
                    f"partitioning: {spec}"
                )


def test_ohlc_is_one_windowless_aggregate(spark):
    # r08: open/close fold as struct argmin/argmax inside the single
    # groupBy — the two per-(type, day) ranking windows must not return
    plan = _plan(spark, "q_ts_ohlc")
    assert "windowspecdefinition" not in plan
    assert "Join" not in plan


def test_ewma_last_row_selection_needs_no_extra_ranking(spark):
    # the "last point per series" filter rides the sweep's n_total —
    # no descending row_number window may reappear
    plan = _plan(spark, "q_ts_ewma")
    assert "DESC" not in plan or "row_number" not in plan.lower()
