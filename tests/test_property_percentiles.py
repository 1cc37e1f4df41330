"""Property-based differential for the round-10 exact-percentile grain
fold (functions/percentiles.py): on random multisets — duplicate-heavy,
skewed, integer and fractional, single-row and single-part — the sweep
fold must reproduce Spark's buffered percentile() exactly at every
requested p, including the 0.0/1.0 endpoints and ps landing exactly on
order-statistic boundaries."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from zonal_datacube_spark.functions.percentiles import grain_percentiles

PS = (0.0, 0.25, 0.5, 0.75, 0.9, 1.0)


@st.composite
def corpora(draw):
    n_parts = draw(st.integers(1, 3))
    rows = []
    for part in range(n_parts):
        # small value pools force heavy ties; wide pools force real
        # interpolation between distinct grain rows
        pool = draw(st.integers(2, 12))
        n = draw(st.integers(1, 40))
        for _ in range(n):
            # mixed-sign values: the width-mode bucket arithmetic
            # (value − lo)/width must hold on negative-spanning ranges
            v = draw(st.integers(-pool, pool))
            # sometimes fractional values (exercise double grains)
            if draw(st.booleans()):
                rows.append((f"p{part}", float(v) + 0.25))
            else:
                rows.append((f"p{part}", float(v)))
    return rows


@given(rows=corpora(), p_extra=st.floats(0.01, 0.99, allow_nan=False))
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_grain_fold_matches_buffered_percentile(rows, p_extra, spark):
    from pyspark.sql import functions as F

    ps = PS + (round(p_extra, 3),)
    df = spark.createDataFrame(rows, "k string, v double")
    got = {
        (r.k, r.p): r.q
        for r in grain_percentiles(df, ["k"], "v", ps).collect()
    }
    ps_sql = ", ".join(str(float(p)) for p in ps)
    labels = F.array(*[F.lit(float(p)) for p in ps])
    want_rows = (
        df.groupBy("k")
        .agg(F.expr(f"percentile(v, array({ps_sql}))").alias("qs"))
        .select(
            "k",
            F.explode(
                F.arrays_zip(labels.alias("p"), F.col("qs").alias("q"))
            ).alias("z"),
        )
        .select("k", F.col("z.p").alias("p"), F.col("z.q").alias("q"))
        .collect()
    )
    want = {(r.k, r.p): r.q for r in want_rows}
    assert set(got) == set(want)
    for key, v in want.items():
        assert abs(got[key] - v) < 1e-9, (key, got[key], v)
