"""Plan locks for the round-9 scale fixes (VERDICT r08 what's-wrong
#2/#3):

* no FORCED BroadcastExchange on a frequency table keyed by a
  data-scaled column (token / shingle vocabulary) — the hint, not the
  join, was the 100 TB OOM; AQE may still broadcast at runtime when the
  built side fits, which is exactly the behavior we want, so the gate
  inspects the OPTIMIZED LOGICAL plan for hint residue rather than the
  physical plan for BroadcastHashJoin;
* q_ts_rolling_corr no longer runs any one-reducer window over the
  minute grain — every windowspecdefinition in its plan either carries
  a chunk/bucket partition key (the prefix-sweep row index + halo
  exchange) or partitions on something.
"""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from zonal_datacube_spark.plans.diagnostics import (
    formatted_plan,
    partition_args,
    window_specs,
)
from zonal_datacube_spark.registry import all_queries

Q = all_queries()

_MARKS = ("_zds_ps_bucket", "_zds_chunk_b", "_zds_cc_bucket")


def _optimized(spark, key: str) -> str:
    return (
        Q[key](spark, SF_SMOKE)._jdf.queryExecution().optimizedPlan().toString()
    )


def test_tfidf_df_table_join_is_not_hint_forced(spark):
    # the doc-frequency table is keyed by TOKEN (open vocabulary): the
    # equi-join on token must carry no broadcast hint. The single
    # permitted hint is the 1-row corpus-size cross join — scalar at any
    # scale.
    plan = _optimized(spark, "q_text_tfidf")
    for line in plan.splitlines():
        if "Join" in line and "token#" in line:
            assert "strategy=broadcast" not in line, line
    assert plan.count("strategy=broadcast") == 1, plan


def test_prefix_filter_shingle_freq_join_is_not_hint_forced(spark):
    # the shingle-frequency ranking join: distinct shingles grow
    # near-linearly with the corpus, so no hint anywhere in these plans
    for key in ("q_dedup_near", "q_dedup_containment"):
        plan = _optimized(spark, key)
        assert "strategy=broadcast" not in plan, key


def test_rolling_corr_has_no_one_reducer_window(spark):
    plan = formatted_plan(Q["q_ts_rolling_corr"](spark, SF_SMOKE))
    specs = window_specs(plan)
    assert specs, "expected windows in the rolling-corr plan"
    for spec in specs:
        assert any(m in spec for m in _MARKS) or partition_args(spec), spec
    # and the rewrite machinery is actually present
    assert "_zds_ps_bucket" in plan and "_zds_chunk_b" in plan


def test_window_spec_extractor_balances_parens():
    # ADVICE r08: a cast() inside the partition expression must not
    # truncate the captured span before the ORDER BY section
    plan = (
        "Window [sum(x#1) ...], [windowspecdefinition(cast(k#2 as bigint), "
        "ts#3 ASC NULLS FIRST, specifiedwindowframe(RangeFrame, -59, 0))]"
    )
    (spec,) = window_specs(plan)
    assert "ts#3 ASC" in spec and spec.endswith("-59, 0)")
    assert partition_args(spec) == ["cast(k#2 as bigint)"]
    unpart = "windowspecdefinition(ts#3 ASC NULLS FIRST, specifiedwindowframe(RowFrame, -1, 0))"
    (spec2,) = window_specs(unpart)
    assert partition_args(spec2) == []
