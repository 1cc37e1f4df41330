"""Time-chunk+halo trailing-window rewrite (functions/chunked_window.py):
differential equivalence vs the direct per-series window, halo-size
accounting, parallelism scaling, and guard rails."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from zonal_datacube_spark.functions.chunked_window import (
    n_chunks,
    with_trailing_range_window,
)
from zonal_datacube_spark.sources.loader import load_table

WINDOW_S = 6 * 3600


def _events_ep(spark):
    return (
        load_table(spark, SF_SMOKE, "events")
        .withColumn(
            "ep",
            F.expr(
                "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
            ),
        )
        .select("event_id", "event_type", "value", "ep")
    )


def _direct(ev):
    w = (
        Window.partitionBy("event_type")
        .orderBy("ep")
        .rangeBetween(-WINDOW_S, -1)
    )
    return ev.select(
        "event_id",
        F.round(F.avg("value").over(w), 6).alias("mu"),
        F.round(F.count("value").over(w), 6).alias("cnt"),
        F.round(F.sum("value").over(w), 4).alias("sv"),
    )


def _chunked(ev, chunk_s):
    out = with_trailing_range_window(
        ev,
        ["event_type"],
        "ep",
        WINDOW_S,
        lambda w: {
            "mu": F.round(F.avg("value").over(w), 6),
            "cnt": F.round(F.count("value").over(w), 6),
            "sv": F.round(F.sum("value").over(w), 4),
        },
        chunk_s=chunk_s,
    )
    return out.select("event_id", "mu", "cnt", "sv")


@pytest.mark.parametrize("chunk_s", [WINDOW_S, 4 * WINDOW_S, 24 * 3600 * 7])
def test_chunked_equals_direct(spark, chunk_s):
    ev = _events_ep(spark)
    direct = _direct(ev)
    chunked = _chunked(ev, chunk_s)
    assert direct.count() == chunked.count()
    # exceptAll both ways == multiset equality of every scored row
    assert chunked.exceptAll(direct).count() == 0
    assert direct.exceptAll(chunked).count() == 0


def test_parallelism_scales_with_time_not_enum(spark):
    ev = _events_ep(spark)
    n_types = ev.select("event_type").distinct().count()
    chunks = n_chunks(ev, "ep", WINDOW_S)  # default chunk = 4*W = 1 day
    # the direct window would have n_types partitions; chunked has
    # n_types * chunks — proportional to the fixture's time span
    assert chunks > 5 * n_types
    # and the plan's window partition spec includes the chunk bucket
    plan = _chunked(ev, 4 * WINDOW_S)._jdf.queryExecution().executedPlan().toString()
    assert "_zds_chunk_b" in plan


def test_halo_fraction_accounting(spark):
    # with chunk = W every row is haloed once; with chunk = 4W only rows in
    # the trailing quarter of each chunk are — measure the duplicated rows
    ev = _events_ep(spark)
    n = ev.count()
    for chunk_s, max_frac in [(WINDOW_S, 1.0), (4 * WINDOW_S, 0.35)]:
        halo = ev.filter(
            F.col("ep") % chunk_s >= chunk_s - WINDOW_S
        ).count()
        assert halo <= max_frac * n + 1
        if chunk_s == WINDOW_S:
            assert halo == n  # minimum chunk: 100% duplication


def test_guard_rails(spark):
    ev = _events_ep(spark)
    with pytest.raises(ValueError, match="chunk_s"):
        with_trailing_range_window(
            ev, ["event_type"], "ep", WINDOW_S, lambda w: {}, chunk_s=WINDOW_S - 1
        )
    with pytest.raises(ValueError, match="trailing"):
        with_trailing_range_window(
            ev, ["event_type"], "ep", WINDOW_S, lambda w: {}, upper_bound=1
        )


def test_current_row_inclusive_frame(spark):
    # upper_bound=0 (frame includes current row) must also round-trip
    ev = _events_ep(spark)
    w = (
        Window.partitionBy("event_type")
        .orderBy("ep")
        .rangeBetween(-WINDOW_S, 0)
    )
    direct = ev.select(
        "event_id", F.round(F.sum("value").over(w), 4).alias("sv")
    )
    chunked = with_trailing_range_window(
        ev,
        ["event_type"],
        "ep",
        WINDOW_S,
        lambda win: {"sv": F.round(F.sum("value").over(win), 4)},
        upper_bound=0,
    ).select("event_id", "sv")
    assert direct.exceptAll(chunked).count() == 0
    assert chunked.exceptAll(direct).count() == 0
