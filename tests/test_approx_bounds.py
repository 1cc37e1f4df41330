"""In-row error referees for the approx-sketch rows-only keys (VERDICT
r12 next-round #8: q_agg_approx_distinct / q_agg_approx_topk /
q_agg_percentile_approx had no referee beyond a row count).

Each key now emits its exact twin beside the sketch estimate plus an
``in_bound`` boolean; these tests pin (1) every boolean TRUE on the
fixture, (2) cross-run determinism of the full output (HLL/GK/top-k
merges commute — the q_agg_sketch_error_eval policy), and (3) the exact
side against an independent pandas fold."""

from __future__ import annotations

import pandas as pd

from tests.conftest import SF_SMOKE
from zonal_datacube_spark.operators.aggregations import (
    q_agg_approx_distinct,
    q_agg_percentile_approx,
)
from zonal_datacube_spark.operators.scalar_funcs import q_agg_approx_topk
from zonal_datacube_spark.sources.loader import load_table


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_approx_distinct_in_bound_and_deterministic(spark):
    out = q_agg_approx_distinct(spark, SF_SMOKE)
    rows = out.collect()
    assert rows and all(r["in_bound"] for r in rows)
    # exact side vs pandas
    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_type", "user_id"
    ).toPandas()
    exact = ev.groupby("event_type")["user_id"].nunique()
    for r in rows:
        assert r["exact_users"] == int(exact[r["event_type"]])
    assert _sorted_rows(out) == _sorted_rows(
        q_agg_approx_distinct(spark, SF_SMOKE)
    )


def test_approx_topk_in_bound_and_deterministic(spark):
    out = q_agg_approx_topk(spark, SF_SMOKE)
    rows = out.collect()
    assert len(rows) == 3
    assert all(r["in_bound"] for r in rows)
    ev = load_table(spark, SF_SMOKE, "events").select("event_type").toPandas()
    counts = ev["event_type"].value_counts()
    for r in rows:
        assert r["exact_n"] == int(counts[r["item"]])
    # reported hitters are ranked by sketch count, descending
    ns = [r["n"] for r in sorted(rows, key=lambda r: r["rank"])]
    assert ns == sorted(ns, reverse=True)
    assert _sorted_rows(out) == _sorted_rows(q_agg_approx_topk(spark, SF_SMOKE))


def test_percentile_approx_ranks_in_bound_and_deterministic(spark):
    out = q_agg_percentile_approx(spark, SF_SMOKE)
    rows = out.collect()
    assert rows and all(r["ranks_in_bound"] for r in rows)
    # every reported cell is an ACTUAL data value of its axis (GK returns
    # elements, not interpolations) — pandas referee
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    ).toPandas()
    for r in rows:
        grp = li[li["l_returnflag"] == r["l_returnflag"]]
        prices = set(grp["l_extendedprice"].astype(float))
        for c in ("price_p25", "price_p50", "price_p75", "price_p99"):
            assert float(r[c]) in prices
        assert float(r["median_qty"]) in set(grp["l_quantity"].astype(float))
    assert _sorted_rows(out) == _sorted_rows(
        q_agg_percentile_approx(spark, SF_SMOKE)
    )


def test_percentile_approx_bound_rejects_wrong_rank(spark):
    """The referee must be falsifiable: a value whose rank is far from
    the target p must trip the bracket check, proving ``ranks_in_bound``
    is a real gate rather than a tautology."""
    import pyspark.sql.functions as F

    from zonal_datacube_spark.functions.grain_cache import (
        GRAIN_COUNT,
        table_value_grain,
    )

    grain = table_value_grain(
        spark, SF_SMOKE, "lineitem", ("l_returnflag",),
        "l_extendedprice", "l_extendedprice",
    )
    # claim the per-flag MINIMUM price is the p50: rank interval [1, c_min]
    # vs a 0.5·n target — must fail the intersection test for every flag
    stats = (
        grain.groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("vmin"),
            F.sum(GRAIN_COUNT).alias("n"),
        )
        .collect()
    )
    eps = 1.0 / 10_000
    for r in stats:
        c_min = (
            grain.filter(
                (F.col("l_returnflag") == r["l_returnflag"])
                & (F.col("l_extendedprice") == r["vmin"])
            )
            .agg(F.sum(GRAIN_COUNT))
            .collect()[0][0]
        )
        n_lt, n_le = 0, c_min
        ok = (n_lt + 1 <= (0.5 + eps) * r["n"] + 1) and (
            n_le >= (0.5 - eps) * r["n"]
        )
        assert not ok
