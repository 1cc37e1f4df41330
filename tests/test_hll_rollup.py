"""The two-level HLL rollup is rows-only (sketch estimates are
implementation-defined) — this test pins its accuracy contract: union of
daily sketches must estimate the per-type distinct-user count within 5%
of exact, which is what makes the stored-sketch rollup usable."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from zonal_datacube_spark.operators.aggregations import q_agg_hll_rollup
from zonal_datacube_spark.sources.loader import load_table


def test_hll_union_estimate_within_5pct(spark):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in q_agg_hll_rollup(spark, SF_SMOKE).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for t, est in approx.items():
        assert abs(est - exact[t]) <= 0.05 * exact[t], (t, est, exact[t])
