"""Round-8 per-series window rewrites: differential equivalence of the
two-sided banded chunk+halo window (functions/chunked_window.py) and the
two-level last-non-null carry (functions/chunk_carry.py) against the
direct per-series windows they replace, plus guard rails."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from zonal_datacube_spark.functions.chunk_carry import carry_last
from zonal_datacube_spark.functions.chunked_window import (
    with_banded_range_window,
)
from zonal_datacube_spark.functions.prefix_sweep import prefix_sweep
from zonal_datacube_spark.sources.loader import load_table


def _indexed(spark):
    ev = load_table(spark, SF_SMOKE, "events").withColumn(
        "ts_us",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ),
    )
    return prefix_sweep(
        ev.select("event_id", "event_type", "value", "ts_us"),
        ["event_type"],
        "ts_us",
        tiebreak=["event_id"],
        row_number_col="idx",
    )


def _rows(df, *cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_series_idx_matches_direct_row_number(spark):
    ev = _indexed(spark)
    w = Window.partitionBy("event_type").orderBy("ts_us", "event_id")
    direct = ev.select(
        "event_id", F.row_number().over(w).alias("rn")
    )
    got = _rows(ev, "event_id", "idx")
    want = _rows(direct, "event_id", "rn")
    assert got == want


@pytest.mark.parametrize("chunk", [2, 7, 64])
def test_banded_window_equals_direct_lag_lead(spark, chunk):
    ev = _indexed(spark)
    dw = Window.partitionBy("event_type").orderBy("idx")
    direct = ev.select(
        "event_id",
        F.lag("value").over(dw).alias("p"),
        F.lead("value").over(dw).alias("n"),
    )
    banded = with_banded_range_window(
        ev,
        ["event_type"],
        "idx",
        1,
        1,
        {
            "p": (-1, -1, F.max("value")),
            "n": (1, 1, F.max("value")),
        },
        chunk_s=chunk,
    )
    assert _rows(banded, "event_id", "p", "n") == _rows(direct, "event_id", "p", "n")


def test_banded_window_trailing_only_and_leading_only(spark):
    ev = _indexed(spark)
    dw = Window.partitionBy("event_type").orderBy("idx")
    direct = ev.select(
        "event_id",
        F.sum("value").over(dw.rangeBetween(-3, 0)).alias("ts3"),
        F.sum("value").over(dw.rangeBetween(0, 2)).alias("ld2"),
    )
    banded = with_banded_range_window(
        ev,
        ["event_type"],
        "idx",
        3,
        2,
        {
            "ts3": (-3, 0, F.sum("value")),
            "ld2": (0, 2, F.sum("value")),
        },
        chunk_s=5,
    )
    got = sorted(
        (e, round(a, 6), round(b, 6))
        for e, a, b in banded.select("event_id", "ts3", "ld2").collect()
    )
    want = sorted(
        (e, round(a, 6), round(b, 6))
        for e, a, b in direct.collect()
    )
    assert got == want


def test_banded_window_row_count_preserved(spark):
    ev = _indexed(spark)
    out = with_banded_range_window(
        ev, ["event_type"], "idx", 1, 1,
        {"x": (-1, 1, F.count("*"))},
        chunk_s=3,
    )
    assert out.count() == ev.count()


def test_banded_window_guards():
    with pytest.raises(ValueError):
        with_banded_range_window(None, [], "e", -1, 0, {})
    with pytest.raises(ValueError):
        with_banded_range_window(None, [], "e", 0, 0, {})
    with pytest.raises(ValueError):
        with_banded_range_window(None, [], "e", 5, 1, {}, chunk_s=3)


def test_banded_window_rejects_frames_beyond_the_halo():
    # ADVICE r08: a frame wider than the declared halo used to be
    # silently truncated (wrong values); the declarative API refuses it
    with pytest.raises(ValueError, match="halo contract"):
        with_banded_range_window(
            None, [], "e", 1, 1, {"x": (-2, 0, F.sum("v"))}
        )
    with pytest.raises(ValueError, match="halo contract"):
        with_banded_range_window(
            None, [], "e", 1, 1, {"x": (0, 2, F.sum("v"))}
        )
    with pytest.raises(ValueError, match="halo contract"):
        with_banded_range_window(
            None, [], "e", 2, 2, {"x": (1, -1, F.sum("v"))}
        )


@pytest.mark.parametrize("n_buckets", [3, 64])
def test_carry_last_equals_direct_growing_frame(spark, n_buckets):
    # null out ~half the values: the carry must skip them exactly like
    # last(ignorenulls) over the growing frame
    ev = _indexed(spark).withColumn(
        "v", F.when(F.col("event_id") % 2 == 0, F.col("value"))
    )
    dw = (
        Window.partitionBy("event_type")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    direct = ev.select(
        "event_id", F.last("v", ignorenulls=True).over(dw).alias("c")
    )
    carried = carry_last(
        ev, ["event_type"], "ts_us", ["event_id"], "v", "c",
        n_buckets=n_buckets,
    )
    assert _rows(carried, "event_id", "c") == _rows(direct, "event_id", "c")


def test_carry_last_struct_pair_stays_consistent(spark):
    # carrying a struct must bracket (ts_us, v) from the SAME source row
    ev = _indexed(spark).withColumn(
        "obs",
        F.when(
            F.col("event_id") % 3 == 0,
            F.struct(F.col("ts_us").alias("t"), F.col("value").alias("v")),
        ),
    )
    dw = (
        Window.partitionBy("event_type")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    direct = ev.select(
        "event_id",
        F.last("obs", ignorenulls=True).over(dw).alias("c"),
    ).select("event_id", F.col("c.t").alias("t"), F.col("c.v").alias("v"))
    carried = carry_last(
        ev, ["event_type"], "ts_us", ["event_id"], "obs", "c", n_buckets=5
    ).select("event_id", F.col("c.t").alias("t"), F.col("c.v").alias("v"))
    assert _rows(carried, "event_id", "t", "v") == _rows(direct, "event_id", "t", "v")


def test_carry_last_all_null_source_stays_null(spark):
    ev = _indexed(spark).withColumn("v", F.lit(None).cast("double"))
    carried = carry_last(ev, ["event_type"], "ts_us", ["event_id"], "v", "c")
    assert carried.filter(F.col("c").isNotNull()).count() == 0
