"""Property-based differential tests for the round-8 helpers on random
series WITH ENGINEERED TIES — the events fixture has no duplicate
(series, ts) pairs, so the tiebreak paths of the dense row index, the
banded chunk+halo window, and the last-non-null carry would otherwise
ship untested. Each case compares against the direct single-partition
window on the same data."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from zonal_datacube_spark.functions.chunk_carry import carry_last
from zonal_datacube_spark.functions.chunked_window import (
    with_banded_range_window,
)
from zonal_datacube_spark.functions.prefix_sweep import prefix_sweep

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@st.composite
def tied_series(draw):
    """Rows (series, ep, uid, value): few series, HEAVILY tied small ep
    domain (ties are the point), unique uid tiebreak."""
    n = draw(st.integers(20, 80))
    n_series = draw(st.integers(1, 3))
    ep_domain = draw(st.integers(2, 8))  # tiny domain → many ties
    rows = []
    for uid in range(n):
        rows.append(
            (
                f"s{draw(st.integers(0, n_series - 1))}",
                draw(st.integers(0, ep_domain)),
                uid,
                draw(st.integers(-5, 5)),
            )
        )
    return rows


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "series string, ep long, uid long, value long"
    )


@given(rows=tied_series(), chunk=st.integers(2, 9))
@SETTINGS
def test_row_index_then_banded_window_matches_direct(spark, rows, chunk):
    df = prefix_sweep(
        _df(spark, rows),
        ["series"],
        "ep",
        tiebreak=["uid"],
        row_number_col="idx",
    )
    dw = Window.partitionBy("series").orderBy("ep", "uid")
    direct = df.select(
        "uid",
        F.lag("value").over(dw).alias("p"),
        F.lead("value").over(dw).alias("n"),
        F.sum("value").over(dw.rowsBetween(-2, 0)).alias("t2"),
    )
    got = with_banded_range_window(
        df,
        ["series"],
        "idx",
        2,
        1,
        {
            "p": (-1, -1, F.max("value")),
            "n": (1, 1, F.max("value")),
            "t2": (-2, 0, F.sum("value")),
        },
        chunk_s=chunk,
    )
    key = lambda df_: sorted(  # noqa: E731
        tuple(r) for r in df_.select("uid", "p", "n", "t2").collect()
    )
    assert key(got) == key(direct)


@given(rows=tied_series(), n_buckets=st.integers(2, 8))
@SETTINGS
def test_carry_last_with_ties_matches_direct(spark, rows, n_buckets):
    # null out part of the values; ties on ep resolve through the uid
    # tiebreak in BOTH formulations, so the carries must agree exactly
    df = _df(spark, rows).withColumn(
        "v", F.when(F.col("uid") % 3 != 0, F.col("value"))
    )
    dw = (
        Window.partitionBy("series")
        .orderBy("ep", "uid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    direct = df.select(
        "uid", F.last("v", ignorenulls=True).over(dw).alias("c")
    )
    got = carry_last(
        df, ["series"], "ep", ["uid"], "v", "c", n_buckets=n_buckets
    )
    key = lambda df_: sorted(  # noqa: E731
        tuple(r) for r in df_.select("uid", "c").collect()
    )
    assert key(got) == key(direct)


@given(rows=tied_series())
@SETTINGS
def test_strict_max_sweep_with_ties_matches_direct(spark, rows):
    df = _df(spark, rows)
    dw = (
        Window.partitionBy("series")
        .orderBy("ep", "uid")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    direct = df.select(
        "uid", F.max("value").over(dw).alias("peak")
    )
    swept = prefix_sweep(
        df, ["series"], "ep", tiebreak=["uid"],
        strict_max_cols={"px": "value"},
    ).select("uid", F.greatest("value", "px").alias("peak"))
    key = lambda df_: sorted(tuple(r) for r in df_.collect())  # noqa: E731
    assert key(swept) == key(direct)
