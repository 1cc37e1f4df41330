"""Property-based differential tests for the round-4 statistical
operators: weighted median and Gini against a numpy reference on
hypothesis-generated data. This pins the ALGORITHM (not just the fixture
answer): any reformulation that drifts from the textbook definition
fails on some generated input."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F


def _weighted_median_np(values, weights):
    order = np.argsort(values, kind="stable")
    v, w = np.asarray(values)[order], np.asarray(weights)[order]
    cum = np.cumsum(w)
    tot = cum[-1]
    return float(v[np.searchsorted(cum * 2, tot, side="left")])


@given(
    data=st.lists(
        st.tuples(
            st.integers(1, 50),  # value (small int domain forces ties)
            st.integers(1, 9),  # weight
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_weighted_median_matches_numpy(data, spark):
    df = spark.createDataFrame(data, "v INT, w INT")
    per_v = df.groupBy("v").agg(F.sum("w").alias("w"))
    cw = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    tw = Window.partitionBy()
    got = (
        per_v.select(
            "v",
            F.sum("w").over(cw).alias("cum"),
            F.sum("w").over(tw).alias("tot"),
        )
        .filter(F.col("cum") * 2 >= F.col("tot"))
        .agg(F.min("v"))
        .collect()[0][0]
    )
    vals = [v for v, _ in data]
    ws = [w for _, w in data]
    assert got == _weighted_median_np(vals, ws)


@given(
    vals=st.lists(st.integers(1, 1000), min_size=2, max_size=80),
)
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_gini_matches_numpy(vals, spark):
    df = spark.createDataFrame([(v,) for v in vals], "x INT")
    w = Window.orderBy("x")
    got = (
        df.select("x", F.row_number().over(w).alias("i"))
        .agg(
            2 * F.sum(F.col("i") * F.col("x"))
            / (F.count("*") * F.sum("x"))
            - (F.count("*") + 1) / F.count("*")
        )
        .collect()[0][0]
    )
    x = np.sort(np.asarray(vals, dtype=float))
    n = len(x)
    ref = 2 * np.sum(np.arange(1, n + 1) * x) / (n * x.sum()) - (n + 1) / n
    assert abs(got - ref) < 1e-9
    assert -1e-9 <= got < 1.0
