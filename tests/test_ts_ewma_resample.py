"""Differential tests: q_ts_ewma vs a numpy reference of the truncated
adjusted EWMA, and q_ts_resample_interp vs np.interp on the hourly grid."""

from __future__ import annotations

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE
from zonal_datacube_spark.operators.timeseries import (
    EWMA_SPAN,
    q_ts_ewma,
    q_ts_resample_interp,
)


def _events_pdf() -> pd.DataFrame:
    import duckdb

    con = duckdb.connect()
    pdf = con.execute(
        f"SELECT event_type, ts::TIMESTAMP AS ts, event_id, value "
        f"FROM '{SF_SMOKE}/events.parquet' ORDER BY event_type, ts, event_id"
    ).df()
    con.close()
    return pdf


def test_ewma_matches_numpy_reference(spark):
    got = {r.event_type: r for r in q_ts_ewma(spark, SF_SMOKE).collect()}
    pdf = _events_pdf()
    for etype, g in pdf.groupby("event_type"):
        vals = g["value"].to_numpy()[-EWMA_SPAN:]
        length = len(vals)
        w = 0.5 ** (length - 1 - np.arange(length))
        ref = float((vals * w).sum() / (2.0 - 0.5 ** (length - 1)))
        assert got[etype].n_window == length
        assert abs(got[etype].ewma_last - ref) < 1e-6
        # EWMA is a convex combination up to the truncated tail
        assert vals.min() - 1e-9 <= got[etype].ewma_last <= vals.max() + 1e-9


def test_resample_matches_numpy_interp(spark):
    got = {
        r.event_type: r for r in q_ts_resample_interp(spark, SF_SMOKE).collect()
    }
    pdf = _events_pdf()
    for etype, g in pdf.groupby("event_type"):
        t = (
            g["ts"].astype("datetime64[ns]").astype("int64").to_numpy() // 1000
        )  # ns → µs regardless of the frame's native resolution
        v = g["value"].to_numpy()
        mn, mx = t.min(), t.max()
        start = pd.Timestamp(g["ts"].min()).floor("h").value // 1000
        grid = np.arange(start, mx + 1, 3_600_000_000)
        grid = grid[grid >= mn]
        # duplicate-instant observations: np.interp uses a stable pick;
        # our engine brackets with (last prev, first next). Both agree
        # everywhere the fixture has unique instants per series.
        iv = np.interp(grid, t, v)
        r = got[etype]
        assert r.n_grid == len(grid)
        assert abs(r.avg_interp - iv.mean()) < 1e-5
        assert abs(r.min_interp - iv.min()) < 1e-5
        assert abs(r.max_interp - iv.max()) < 1e-5


def test_drawdown_monotone_peak_and_bounds(spark):
    from zonal_datacube_spark.operators.timeseries import q_ts_drawdown

    rows = q_ts_drawdown(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.max_drawdown < 1.0
        assert 0.0 <= r.underwater_share <= 1.0
        assert r.all_time_peak > 0


def test_peaks_bounded_by_points(spark):
    from zonal_datacube_spark.operators.timeseries import (
        PEAK_MIN_VALUE,
        q_ts_peaks,
    )

    rows = q_ts_peaks(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # interior strict peaks can never exceed half the points
        assert 0 <= r.n_peaks <= r.n_points // 2
        if r.n_peaks:
            assert r.tallest_peak > PEAK_MIN_VALUE


def test_rank_migration_movers_ordered(spark):
    from zonal_datacube_spark.operators.reports import (
        RANK_TOPN,
        q_report_rank_migration,
    )

    rows = q_report_rank_migration(spark, SF_SMOKE).collect()
    assert 1 <= len(rows) <= RANK_TOPN
    deltas = [abs(r.delta) for r in rows]
    assert deltas == sorted(deltas, reverse=True)
    for r in rows:
        assert r.delta == r.rank_a - r.rank_b


def test_ewma_truncation_invisible_at_rounding(spark):
    """The docstring claims 0.5^40 weights are six orders below the 1e-6
    output rounding — verify by recomputing with a 60-lag window: the
    truncated tail must move the answer by far less than the rounding
    grain."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from zonal_datacube_spark.operators.timeseries import q_ts_ewma
    from zonal_datacube_spark.sources.loader import load_table

    got = {r.event_type: r.ewma_last for r in q_ts_ewma(spark, SF_SMOKE).collect()}
    ev = load_table(spark, SF_SMOKE, "events")
    span = 60
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-(span - 1), 0)
    )
    wd = Window.partitionBy("event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    wide = (
        ev.select(
            "event_type",
            "ts",
            "event_id",
            F.collect_list("value").over(w).alias("vals"),
        )
        .withColumn(
            "ewma",
            F.expr(
                "aggregate(transform(vals, (x, i) ->"
                "  x * power(0.5, size(vals) - 1 - i)),"
                " cast(0.0 as double), (acc, x) -> acc + x)"
                " / (2.0 - power(0.5, size(vals) - 1))"
            ),
        )
        .withColumn("rn", F.row_number().over(wd))
        .filter(F.col("rn") == 1)
        .collect()
    )
    for r in wide:
        # the declared key rounds at 6; the truncated tail must not be
        # able to move the ROUNDED value (tail ≲1e-7 ≪ the 5e-7 grain)
        assert round(r.ewma, 6) == got[r.event_type]


def test_moving_median_matches_numpy(spark):
    """Trailing-21-row interpolated median vs numpy's percentile on the
    same trailing windows (linear interpolation = the same estimator)."""
    import numpy as np

    from zonal_datacube_spark.operators.timeseries import (
        MOVMED_ROWS,
        q_ts_moving_median,
    )

    got = {r.event_type: r for r in q_ts_moving_median(spark, SF_SMOKE).collect()}
    pdf = _events_pdf()
    for etype, g in pdf.groupby("event_type"):
        v = g["value"].to_numpy()
        meds = np.array(
            [
                np.percentile(v[max(0, i - MOVMED_ROWS + 1) : i + 1], 50)
                for i in range(len(v))
            ]
        )
        r = got[etype]
        assert r.n_points == len(v)
        assert abs(r.avg_moving_med - meds.mean()) < 1e-5
        assert abs(r.min_moving_med - meds.min()) < 1e-5
        assert abs(r.max_moving_med - meds.max()) < 1e-5
