"""Round-5 analytics additions (SURVEY.md §2.16): batch sessionization,
series autocorrelation, CUSUM drift detection, higher-moment statistics,
boolean aggregates, winsorized means, RFM segmentation, year-over-year
growth, inter-order gap statistics, and nearest-event alignment — the
next ring of the analytics surface a warehouse/behavioral user expects,
each with an independent DuckDB oracle.

Determinism: counts and day/second gaps are integers (bit-identical);
double outputs round at 6 (4 for cusum extrema) after both engines
aggregate the SAME closed-form expressions; ranked/ntile orders always
carry a unique key tie-break.

Scale notes (100 TB):
- sessionize/order-gap windows partition on user/customer — natural
  high-cardinality keys, skew-free.
- autocorr/cusum first collapse events to the per-(type, minute) grain
  (bounded by time span × types, not row count — the q_ts_anomaly r05
  lesson); cusum's running sum goes through the range-bucketed
  prefix sweep (functions/prefix_sweep.py), never an enum-partitioned
  full sort.
- RFM's three quintile assignments each run through the prefix sweep's
  distributed row_number + arithmetic ntile — no global window ever
  sees the customer-grain table.
- yoy joins orders→customer (shuffled hash join on the natural key),
  then windows over the (nation, year) rollup — bounded output grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zonal_datacube_spark.functions.prefix_sweep import (
    ntile_from_row_number,
    prefix_sweep,
)
from zonal_datacube_spark.functions.local_rel import local_relation
from zonal_datacube_spark.sources.loader import load_table

SESSION_GAP_MIN = 30


def _round4_half_up(col: F.Column) -> F.Column:
    """floor(x*1e4 + 0.5)/1e4 — HALF_UP 4dp rounding bit-identical in
    Spark and DuckDB (DuckDB rounds doubles half-to-even; values feeding
    ratios/ranks must round identically on both sides — FIXTURES.md
    cookbook rule 6/8). Non-negative inputs only."""
    return F.floor(col * 10000 + F.lit(0.5)) / 10000


def q_ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: a user's events belong to one session while
    consecutive gaps stay ≤ 30 minutes (the island starts where the gap
    exceeds it) — the batch twin of q_stream_session, reported as global
    session statistics. One user-keyed window pass builds session ids
    (cumulative sum of gap-break flags), one rollup per session, one
    global aggregate; durations are integer seconds."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        # MICROSECOND diffs: at the storage precision both engines'
        # boundary-counting and truncating semantics coincide exactly —
        # a SECOND-granularity diff on sub-second timestamps does not
        # (DuckDB counts second-boundary crossings, Spark truncates the
        # true delta; a 1800.2 s gap straddling a boundary flips them)
        F.when(
            F.expr("timestampdiff(MICROSECOND, lag(ts) OVER "
                   "(PARTITION BY user_id ORDER BY ts, event_id), ts)")
            > SESSION_GAP_MIN * 60 * 1_000_000,
            1,
        )
        .otherwise(0)
        .alias("brk"),
    )
    sess = flagged.select(
        "user_id",
        "ts",
        F.sum("brk").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias(
            "session_id"
        ),
    )
    per_session = sess.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        (
            F.expr("timestampdiff(MICROSECOND, min(ts), max(ts))")
            / 1_000_000.0
        ).alias("dur_s"),
    )
    return per_session.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_sessions"),
        F.round(F.avg("n_events"), 6).alias("avg_events_per_session"),
        F.round(F.avg("dur_s"), 6).alias("avg_session_seconds"),
        F.max("n_events").alias("max_session_events"),
        F.round(F.max("dur_s"), 6).alias("max_session_seconds"),
    )


def _minute_grain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(type, minute) mean value — the bounded series every
    minute-grain analysis here shares. Means round at 6 BEFORE any
    downstream arithmetic so both engines start from identical series."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.expr(
            "timestampdiff(MINUTE, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("epm"),
    ).agg(F.round(F.avg("value"), 6).alias("mv"))


def q_ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of each type's minute-mean series — THE
    one-number memory/whiteness screen (near 0 = noise; near 1 = strong
    persistence, a different animal for forecasting and anomaly
    thresholds). The series is the bounded minute grain; the lag pairs
    come from one type-keyed window over it and feed a plain corr
    aggregate."""
    g = _minute_grain(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("epm")
    paired = g.select(
        "event_type", "mv", F.lag("mv").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    return paired.groupBy("event_type").agg(
        F.count("*").alias("n_pairs"),
        F.round(F.corr("mv", "prev"), 6).alias("autocorr_lag1"),
    )


def q_ts_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM drift detection: the running sum of each minute-mean's
    deviation from its series mean; the max/min excursions are the
    standard change-point evidence (a sustained level shift walks the
    cusum away from zero long before any single point trips a z-score).
    The cumulative sweep runs over the bounded minute grain THROUGH the
    range-bucketed prefix sweep — a deliberate second user of
    functions/prefix_sweep.py on the time axis (cusum at 100 TB is
    exactly the enum-partition straggler shape q_agg_gini had). One
    sweep suffices: cusum_i = Σ_{j≤i} mv_j − i·mean folds the centering
    into the sweep's own totals (running sum, row number, and the
    series mean's numerator/denominator all ride the same bucket-grain
    offsets), so the grain subtree is never re-joined against a
    separate mean aggregate."""
    swept = prefix_sweep(
        _minute_grain(spark, sf_dir),
        ["event_type"],
        "epm",
        sum_cols={"cum_mv": "mv"},
        row_number_col="rn",
        total_sum_cols={"tot_mv": "mv"},
        total_count_col="n_min",
    )
    cusum = F.col("cum_mv") - F.col("rn") * (
        F.col("tot_mv") / F.col("n_min")
    )
    return swept.groupBy("event_type").agg(
        F.count("*").alias("n_minutes"),
        F.round(F.max(cusum), 4).alias("max_cusum"),
        F.round(F.min(cusum), 4).alias("min_cusum"),
    )


def q_agg_skew_kurt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skewness and excess kurtosis of extended price per return flag,
    from explicitly-centered moments: broadcast the group mean back onto
    the scan, aggregate avg((x−m)^k) for k=2,3,4, and fold g1 = m3/m2^1.5,
    g2 = m4/m2² − 3. Centering first kills the power-sum cancellation
    (avg(x⁴) carries ~30× the central moment's magnitude here) AND pins
    both engines to the same population-moment definition — Spark's
    skewness() and DuckDB's skewness() disagree on sample corrections,
    so neither builtin is used."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    means = li.groupBy("l_returnflag").agg(
        F.avg("l_extendedprice").alias("m")
    )
    d = li.join(F.broadcast(means), "l_returnflag").select(
        "l_returnflag", (F.col("l_extendedprice") - F.col("m")).alias("d")
    )
    mom = d.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.avg(F.col("d") * F.col("d")).alias("m2"),
        F.avg(F.col("d") * F.col("d") * F.col("d")).alias("m3"),
        F.avg(F.col("d") * F.col("d") * F.col("d") * F.col("d")).alias("m4"),
    )
    return mom.select(
        "l_returnflag",
        "n_rows",
        F.round(F.col("m3") / F.pow("m2", 1.5), 6).alias("skewness_g1"),
        F.round(F.col("m4") / (F.col("m2") * F.col("m2")) - 3, 6).alias(
            "excess_kurtosis_g2"
        ),
    )


BOOL_HI_PRICE = 400_000.0
BOOL_LO_PRICE = 1_000.0


def q_agg_boolean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregates per order priority: BOOL_AND / BOOL_OR /
    COUNT_IF — the SQL:2023 EVERY/ANY surface DQ rules compile to
    ("every row priced", "any whale order", "how many finished").
    Integer/boolean-exact, fully partial-aggregable."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        F.expr(f"bool_and(o_totalprice > {BOOL_LO_PRICE})").alias(
            "all_priced"
        ),
        F.expr(f"bool_or(o_totalprice > {BOOL_HI_PRICE})").alias(
            "any_whale"
        ),
        F.expr("count_if(o_orderstatus = 'F')").alias("n_finished"),
    )


WINSOR_LO, WINSOR_HI = 0.05, 0.95


def q_agg_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean: clamp each price into [p05, p95] then average —
    the robust-mean partner of the trimmed mean (q_udaf_zonal_trimmed_
    mean) that KEEPS the tail rows at the fence instead of dropping
    them. Exact interpolating percentiles per group — folded from the
    (flag, price)-grain prefix sweep (functions/percentiles.py, the
    round-10 exact-percentile rewrite: no flag-keyed executor buffer) —
    broadcast back onto the same scan, one final aggregate."""
    from zonal_datacube_spark.functions.grain_cache import table_swept_grain
    from zonal_datacube_spark.functions.percentiles import (
        cached_swept_percentiles,
        pivot_percentiles,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    # fences from the shared SWEPT (flag, price) grain (functions/
    # grain_cache.py — one lineitem scan AND one prefix sweep serve the
    # whole percentile family per process, r13); the clamp+average below
    # keeps its original per-row arithmetic so the oracle-compared
    # mean's summation tree is untouched.
    fences = pivot_percentiles(
        cached_swept_percentiles(
            table_swept_grain(
                spark, sf_dir, "lineitem", ("l_returnflag",),
                "l_extendedprice", "l_extendedprice",
            ),
            ["l_returnflag"],
            "l_extendedprice",
            (WINSOR_LO, WINSOR_HI),
        ),
        ["l_returnflag"],
        {WINSOR_LO: "lo", WINSOR_HI: "hi"},
    )
    clamped = li.join(F.broadcast(fences), "l_returnflag").select(
        "l_returnflag",
        "l_extendedprice",
        F.greatest(
            F.col("lo"), F.least(F.col("hi"), F.col("l_extendedprice"))
        ).alias("wx"),
        (
            (F.col("l_extendedprice") < F.col("lo"))
            | (F.col("l_extendedprice") > F.col("hi"))
        ).alias("clipped"),
    )
    return clamped.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.round(F.avg("wx"), 6).alias("winsorized_mean"),
        F.round(F.avg("l_extendedprice"), 6).alias("raw_mean"),
        F.sum(F.col("clipped").cast("bigint")).alias("n_clipped"),
    )


RFM_TILES = 5


def q_behavior_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: every customer scored 1–5 on Recency (days
    since last order — lower is better), Frequency (order count), and
    Monetary (total spend), then the segment census — the classic
    marketing cube. Each quintile assignment is a distributed
    row_number through the range-bucketed prefix sweep plus the
    arithmetic ANSI ntile (functions/prefix_sweep.py) — the
    customer-grain table never enters a global window. Ties split
    deterministically on custkey.

    r13 (guide §2.4; the q_stats_spearman stacking trick): the three
    per-axis quintile assignments ran as three separate quantile sweeps
    (a GK-sketch aggregate + bucketed window each) joined back on
    custkey — 30 sequential jobs at sf0.1. The axis now rides the
    sweep's PARTITION key: per_cust stacks to (axis, custkey, v) with v
    negated on the descending axes (descending=True orders by (val
    DESC, custkey ASC); ordering -val ASC with the same tiebreak is the
    identical total order, and recency/frequency/monetary are
    integer-or-2dp-grid values whose negation is exact), ONE sweep
    ranks all three axes (quantile edges are drawn per part key, so
    each axis keeps its own boundaries), and the scores pivot back by
    axis — one sketch job + one sweep + one pivot shuffle instead of
    three of each."""
    orders = load_table(spark, sf_dir, "orders")
    anchor = orders.agg(F.max("o_orderdate").alias("maxd"))
    per_cust = (
        orders.crossJoin(F.broadcast(anchor))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.first("maxd"), F.max("o_orderdate")).alias(
                "recency_d"
            ),
            F.count("*").alias("frequency"),
            F.round(F.sum("o_totalprice"), 2).alias("monetary"),
        )
        # customer-grain and consumed by TEN branches (three sweeps at
        # three references each + the score join): one-shot
        # materialization keeps the orders scan/rollup single and the
        # plan linear in the branch count
        .localCheckpoint()
    )

    # stack the three axes so ONE sweep ranks them all (docstring r13
    # note): ascending -frequency / -monetary == descending original,
    # custkey tiebreak unchanged; values are grid-exact so negation is
    # lossless
    stacked = per_cust.selectExpr(
        "o_custkey",
        "stack(3,"
        " 'r', CAST(recency_d AS DOUBLE),"
        " 'f', -CAST(frequency AS DOUBLE),"
        " 'm', -monetary) AS (axis, v)",
    )
    swept = prefix_sweep(
        stacked,
        ["axis"],
        "v",
        tiebreak=["o_custkey"],
        row_number_col="_rn",
        total_count_col="_n",
        boundaries="quantile",
    )
    tiles = swept.select(
        "axis",
        "o_custkey",
        ntile_from_row_number(F.col("_rn"), F.col("_n"), RFM_TILES).alias(
            "_tile"
        ),
    )
    # pivot the per-axis scores back to one row per customer; every
    # customer appears on all three axes, so the pivoted columns are
    # never null and the old three-way inner join is reproduced exactly
    scores = tiles.groupBy("o_custkey").agg(
        F.max(F.when(F.col("axis") == "r", F.col("_tile"))).alias("r_score"),
        F.max(F.when(F.col("axis") == "f", F.col("_tile"))).alias("f_score"),
        F.max(F.when(F.col("axis") == "m", F.col("_tile"))).alias("m_score"),
    )
    scored = per_cust.select("o_custkey", "monetary").join(scores, "o_custkey")
    # cell SUM, not avg: monetary sits on the 1e-2 decimal grid, so the
    # sum rounds exactly at 2dp on both engines — an avg divides by the
    # cell count and can land exactly on a half-cent midpoint, where
    # Spark (HALF_UP) and DuckDB (half-to-even) disagree (hit at sf0.001)
    return scored.groupBy("r_score", "f_score", "m_score").agg(
        F.count("*").alias("n_customers"),
        F.round(F.sum("monetary"), 2).alias("cell_monetary"),
    )


def q_report_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per nation: the (nation, year)
    revenue rollup (orders→customer shuffled hash join, broadcast
    nation names) with the previous year's revenue aligned by one lag
    over the bounded year axis; revenue rounds to 2dp BEFORE the ratio
    so near-tie growth rates are engine-stable."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name"
        )
    )
    rolled = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").alias("yr"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("rev"))
    )
    w = Window.partitionBy("n_name").orderBy("yr")
    return (
        rolled.select(
            "n_name",
            "yr",
            "rev",
            F.lag("rev").over(w).alias("prev_rev"),
        )
        .filter(F.col("prev_rev").isNotNull())
        .select(
            "n_name",
            "yr",
            "rev",
            "prev_rev",
            F.round(
                (F.col("rev") - F.col("prev_rev")) / F.col("prev_rev"), 6
            ).alias("yoy_pct"),
        )
    )


def q_report_order_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase cadence per market segment: the day gaps between a
    customer's consecutive orders (one customer-keyed window pass),
    rolled to median / p90 / mean per segment — the replenishment-cycle
    readout behind "order every N days" lifecycle campaigns. Gaps are
    integer days; percentiles interpolate identically on both engines
    and fold from the (segment, gap)-grain prefix sweep (functions/
    percentiles.py, round-10 exact-percentile rewrite — the gap grain is
    calendar-bounded, the old buffered aggregate was order-count-sized
    per segment)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        orders.select(
            "o_custkey",
            F.datediff(
                "o_orderdate", F.lag("o_orderdate").over(w)
            ).alias("gap_d"),
        )
        .filter(F.col("gap_d").isNotNull())
    )
    from zonal_datacube_spark.functions.percentiles import (
        grain_percentiles,
        pivot_percentiles,
    )

    from pyspark.storagelevel import StorageLevel

    # persisted: the segment-gap table (one customer-keyed window pass)
    # feeds both the count/mean rollup and the percentile grain sweep —
    # unpersisted, Spark re-plans the window subtree at every reference
    seg_gaps = (
        gaps.join(cust, gaps.o_custkey == cust.c_custkey)
        .select("c_mktsegment", "gap_d")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    base = seg_gaps.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_gaps"),
        F.round(F.avg("gap_d"), 6).alias("mean_gap_d"),
    )
    qs = pivot_percentiles(
        grain_percentiles(seg_gaps, ["c_mktsegment"], "gap_d", (0.5, 0.9)),
        ["c_mktsegment"],
        {0.5: "mg", 0.9: "pg"},
    )
    return base.join(qs, "c_mktsegment").select(
        "c_mktsegment",
        "n_gaps",
        F.round("mg", 6).alias("median_gap_d"),
        F.round("pg", 6).alias("p90_gap_d"),
        "mean_gap_d",
    )


def q_join_nearest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-event alignment: each purchase pairs with the temporally
    closest non-purchase event of the same user, BEFORE or AFTER (ties
    go to the earlier side) — the bidirectional generalization of the
    as-of join that attribution and root-cause tooling ask for. One
    user-keyed window pass computes both candidates (carry-forward and
    carry-backward IGNORE NULLS), plain arithmetic picks the nearer;
    never a per-purchase range join."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "eps",
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ),
    )
    touch = F.when(
        F.col("event_type") != "purchase",
        F.struct(F.col("eps").alias("t"), F.col("event_type").alias("ty")),
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("eps", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bwd = (
        Window.partitionBy("user_id")
        .orderBy("eps", "event_id")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    paired = ev.select(
        "user_id",
        "event_type",
        "eps",
        F.last(touch, ignorenulls=True).over(fwd).alias("prev_t"),
        F.first(touch, ignorenulls=True).over(bwd).alias("next_t"),
    ).filter(F.col("event_type") == "purchase")
    d_prev = F.col("eps") - F.col("prev_t.t")
    d_next = F.col("next_t.t") - F.col("eps")
    pick_prev = F.col("next_t").isNull() | (
        F.col("prev_t").isNotNull() & (d_prev <= d_next)
    )
    chosen = paired.filter(
        F.col("prev_t").isNotNull() | F.col("next_t").isNotNull()
    ).select(
        F.when(pick_prev, F.col("prev_t.ty"))
        .otherwise(F.col("next_t.ty"))
        .alias("nearest_type"),
        F.when(pick_prev, d_prev).otherwise(d_next).alias("dist_s"),
        F.when(pick_prev, F.lit("before"))
        .otherwise(F.lit("after"))
        .alias("side"),
    )
    return chosen.groupBy("nearest_type", "side").agg(
        F.count("*").alias("n_purchases"),
        F.round(F.avg("dist_s"), 2).alias("avg_dist_s"),
        F.max("dist_s").alias("max_dist_s"),
    )


def q_agg_ols_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-regressor OLS per return flag — price on (quantity, discount)
    via the closed-form normal equations over CENTERED cross-moments:
    one broadcast of the three means back onto the scan, one aggregate
    of the five centered sums, driver-free arithmetic for β₁/β₂/β₀/R².
    This is the distributed multiple-regression shape (the moment-matrix
    reduction every scalable linear model uses — X'X is k×k regardless
    of row count); SQL's REGR_* family stops at one regressor, so the
    oracle spells out the identical closed form."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").alias("y"),
        F.col("l_quantity").alias("x1"),
        F.col("l_discount").alias("x2"),
    )
    means = li.groupBy("l_returnflag").agg(
        F.avg("y").alias("my"), F.avg("x1").alias("mx1"), F.avg("x2").alias("mx2")
    )
    c = li.join(F.broadcast(means), "l_returnflag").select(
        "l_returnflag",
        "my",
        "mx1",
        "mx2",
        (F.col("y") - F.col("my")).alias("dy"),
        (F.col("x1") - F.col("mx1")).alias("d1"),
        (F.col("x2") - F.col("mx2")).alias("d2"),
    )
    s = c.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        F.first("my").alias("my"),
        F.first("mx1").alias("mx1"),
        F.first("mx2").alias("mx2"),
        F.sum(F.col("d1") * F.col("d1")).alias("s11"),
        F.sum(F.col("d2") * F.col("d2")).alias("s22"),
        F.sum(F.col("d1") * F.col("d2")).alias("s12"),
        F.sum(F.col("d1") * F.col("dy")).alias("s1y"),
        F.sum(F.col("d2") * F.col("dy")).alias("s2y"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
    )
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    b1 = (F.col("s22") * F.col("s1y") - F.col("s12") * F.col("s2y")) / det
    b2 = (F.col("s11") * F.col("s2y") - F.col("s12") * F.col("s1y")) / det
    sse = F.col("syy") - b1 * F.col("s1y") - b2 * F.col("s2y")
    return s.select(
        "l_returnflag",
        "n_rows",
        F.round(b1, 6).alias("beta_qty"),
        F.round(b2, 6).alias("beta_disc"),
        F.round(
            F.col("my") - b1 * F.col("mx1") - b2 * F.col("mx2"), 6
        ).alias("intercept"),
        F.round(1 - sse / F.col("syy"), 6).alias("r2"),
    )


PDISC_PS = (0.25, 0.5, 0.75)


def q_agg_percentile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISCRETE percentiles (percentile_disc / SQL:2008 inverse
    distribution WITHIN GROUP): the smallest ACTUAL data value whose
    cumulative distribution reaches p — the right quantile when the
    domain is categorical-ish (quantities, latencies bucketed to ms)
    and an interpolated fraction would be a value that never occurred.
    Returned values are real data points, so engines compare exactly
    with no rounding at all."""
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [
        F.expr(
            f"percentile_disc({p}) WITHIN GROUP (ORDER BY l_quantity)"
        ).alias(f"p{int(p * 100)}")
        for p in PDISC_PS
    ]
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"), *aggs
    )


def q_report_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort LTV curves: customers grouped by FIRST-order month, revenue
    tracked per months-since-acquisition — the (cohort × age) revenue
    matrix behind every retention/payback chart. One customer-grain first
    aggregate, one shuffled join back on the natural key, one matrix
    rollup; month indices are pure integer arithmetic (y·12+m), so every
    cell key is engine-exact."""
    orders = load_table(spark, sf_dir, "orders")
    ym = F.year("o_orderdate") * 12 + F.month("o_orderdate")
    firsts = orders.groupBy("o_custkey").agg(F.min(ym).alias("cohort_ym"))
    joined = orders.join(firsts, "o_custkey").select(
        "o_custkey",
        "o_totalprice",
        F.col("cohort_ym"),
        (ym - F.col("cohort_ym")).alias("month_idx"),
    )
    return joined.groupBy(
        (F.floor((F.col("cohort_ym") - 1) / 12)).cast("int").alias("cohort_year"),
        ((F.col("cohort_ym") - 1) % 12 + 1).cast("int").alias("cohort_month"),
        F.col("month_idx").cast("int").alias("month_idx"),
    ).agg(
        F.countDistinct("o_custkey").alias("n_active"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


def q_report_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier concentration per brand via the Herfindahl–Hirschman
    index (Σ market-share² × 10000 — the antitrust threshold scale):
    supplier-grain revenue rolls up on the 1e-4 decimal grid, brand
    totals fold from the same rollup, one final aggregate. Two shuffles
    total; shares are ratios of identically-rounded sums."""
    li = load_table(spark, sf_dir, "lineitem")
    parts = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        li.join(parts, li.l_partkey == parts.p_partkey)
        .groupBy("p_brand", "l_suppkey")
        .agg(
            _round4_half_up(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("rev")
        )
    )
    # brand totals via a partial-agg groupBy broadcast back — the earlier
    # full-partition window forced each brand's supplier rollup through
    # one window partition for a 25-row aggregate (r06 self-audit)
    tot = rev.groupBy("p_brand").agg(F.sum("rev").alias("_brand_rev"))
    shared = rev.join(F.broadcast(tot), "p_brand").select(
        "p_brand", (F.col("rev") / F.col("_brand_rev")).alias("share")
    )
    return shared.groupBy("p_brand").agg(
        F.count("*").alias("n_suppliers"),
        F.round(F.sum(F.col("share") * F.col("share")) * 10000, 4).alias("hhi"),
        F.round(F.max("share"), 6).alias("top_share"),
    )


def q_ts_seasonal_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diurnal-seasonality strength per series: 1 − var(value − hour-of-
    day mean)/var(value) — the variance-explained share of the 24-hour
    cycle (the STL "strength of seasonality" statistic on the hour
    component). Hour means broadcast back onto the same scan; both
    variances aggregate in one pass."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").alias("hh"), "value"
    )
    hmeans = ev.groupBy("event_type", "hh").agg(
        F.avg("value").alias("hm")
    )
    resid = ev.join(F.broadcast(hmeans), ["event_type", "hh"]).select(
        "event_type", "value", (F.col("value") - F.col("hm")).alias("r")
    )
    return resid.groupBy("event_type").agg(
        F.count("*").alias("n_rows"),
        F.round(
            1 - F.var_samp("r") / F.var_samp("value"), 6
        ).alias("seasonal_strength"),
    )


def q_graph_2hop_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-hop reach over the HEAVY-route trade graph: for each nation,
    the count of DISTINCT nations reachable in exactly two heavy hops
    but NOT one (friend-of-friend discovery — the link-prediction
    candidate set). The full nation graph is complete, so the same
    SF-invariant top-quartile rank cut q_graph_sssp uses sparsifies it
    first; then one self-equi-join on the edge rollup, a distinct, an
    anti-join against the direct edges — every step hash-join sized on
    the nation-grain table."""
    from zonal_datacube_spark.operators.graph import trade_edges_cached

    all_edges = trade_edges_cached(spark, sf_dir).filter(
        F.col("src") != F.col("dst")
    )
    w_rank = Window.orderBy(
        F.col("w").desc(), F.col("src").asc(), F.col("dst").asc()
    )
    cnt = Window.partitionBy()
    edges_cut = (
        all_edges.select(
            "src",
            "dst",
            F.row_number().over(w_rank).alias("rnk"),
            F.count("*").over(cnt).alias("n_e"),
        )
        .filter(F.col("rnk") * 4 <= F.col("n_e"))
        .select("src", "dst")
    )
    # the nation-grain edge list is SCHEMA-bounded (≤ n_nations² = 625
    # rows at any SF — nations don't scale with data volume), but its
    # derivation is a 4-table fact join. The self-join + anti-join below
    # reference it three times, and Spark re-evaluates shared subtrees
    # per reference — so materialize the bounded rollup ONCE and rebuild
    # it as a local relation (the same eager-bounded pattern as
    # q_graph_sssp's frontier loop; cost: one fact pass instead of three)
    collected = edges_cut.collect()
    # defensive: the collect is only safe because the edge grain is
    # schema-bounded (nations² ≤ 625). If _trade_edges is ever rewired to
    # a data-scaled key space, fail loudly instead of OOMing the driver.
    if len(collected) > 10_000:
        raise AssertionError(
            "q_graph_2hop_neighbors: edge rollup is no longer "
            f"schema-bounded ({len(collected)} rows collected); the "
            "driver-side materialization assumes a nation-grain graph"
        )
    # LocalRelation, not createDataFrame's LogicalRDD (functions/
    # local_rel.py): the self-join + anti-join reference this ≤625-row
    # table three times, and each LogicalRDD reference paid a 32-task
    # scan stage over near-empty partitions (event-log profile: 1.8 s
    # of the key's wall in those stages)
    edges = local_relation(spark, collected, "src long, dst long")
    e2 = edges.select(
        F.col("src").alias("mid"), F.col("dst").alias("dst2")
    )
    two_hop = (
        edges.join(e2, edges.dst == e2.mid)
        .select("src", "dst2")
        .filter(F.col("src") != F.col("dst2"))
        .distinct()
        .join(
            edges.select("src", F.col("dst").alias("dst2")),
            ["src", "dst2"],
            "left_anti",
        )
    )
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    return (
        two_hop.groupBy("src")
        .agg(F.count("*").alias("n_two_hop_only"))
        .join(nation, F.col("src") == F.col("n_nationkey"))
        .select(F.col("n_name").alias("nation"), "n_two_hop_only")
    )


def q_dq_daily_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily pipeline-health panel: events, distinct users, null/zero
    values, and purchase share per day — the first dashboard any
    ingestion pipeline grows. One day-grain rollup, integer counts plus
    one rounded ratio."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
    return ev.groupBy(day.alias("day")).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(
            (F.col("value").isNull() | (F.col("value") == 0)).cast("bigint")
        ).alias("n_null_or_zero"),
        F.round(
            F.avg((F.col("event_type") == "purchase").cast("double")), 6
        ).alias("purchase_share"),
    )


QUERIES = {
    "q_ts_sessionize": q_ts_sessionize,
    "q_agg_ols_multi": q_agg_ols_multi,
    "q_agg_percentile_disc": q_agg_percentile_disc,
    "q_report_cohort_ltv_curve": q_report_cohort_ltv_curve,
    "q_report_supplier_hhi": q_report_supplier_hhi,
    "q_ts_seasonal_strength": q_ts_seasonal_strength,
    "q_graph_2hop_neighbors": q_graph_2hop_neighbors,
    "q_dq_daily_health": q_dq_daily_health,
    "q_ts_autocorr": q_ts_autocorr,
    "q_ts_cusum": q_ts_cusum,
    "q_agg_skew_kurt": q_agg_skew_kurt,
    "q_agg_boolean": q_agg_boolean,
    "q_agg_winsorized_mean": q_agg_winsorized_mean,
    "q_behavior_rfm": q_behavior_rfm,
    "q_report_yoy_growth": q_report_yoy_growth,
    "q_report_order_gap_stats": q_report_order_gap_stats,
    "q_join_nearest_event": q_join_nearest_event,
}

from zonal_datacube_spark.operators.graph import _EDGES_SQL as _EDGES_FRAGMENT

_MINUTE_GRAIN_SQL = """
        grain AS (
            SELECT event_type,
                   date_diff('minute', TIMESTAMP '1970-01-01 00:00:00', ts)
                       AS epm,
                   round(avg(value), 6) AS mv
            FROM events GROUP BY 1, 2
        )
"""

ORACLE = {
    "q_report_cohort_ltv_curve": """
        WITH firsts AS (
            SELECT o_custkey,
                   min(year(o_orderdate) * 12 + month(o_orderdate))
                       AS cohort_ym
            FROM orders GROUP BY o_custkey
        ),
        joined AS (
            SELECT o.o_custkey, o.o_totalprice, f.cohort_ym,
                   (year(o.o_orderdate) * 12 + month(o.o_orderdate))
                       - f.cohort_ym AS month_idx
            FROM orders o JOIN firsts f USING (o_custkey)
        )
        SELECT ((cohort_ym - 1) // 12)::INT AS cohort_year,
               ((cohort_ym - 1) % 12 + 1)::INT AS cohort_month,
               month_idx::INT AS month_idx,
               count(DISTINCT o_custkey) AS n_active,
               round(sum(o_totalprice), 2) AS revenue
        FROM joined GROUP BY 1, 2, 3
    """,
    "q_report_supplier_hhi": """
        WITH rev AS (
            SELECT p.p_brand, l.l_suppkey,
                   floor(sum(l.l_extendedprice * (1 - l.l_discount))
                         * 10000 + 0.5) / 10000 AS rev
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY 1, 2
        ),
        shared AS (
            SELECT p_brand,
                   rev / sum(rev) OVER (PARTITION BY p_brand) AS share
            FROM rev
        )
        SELECT p_brand,
               count(*) AS n_suppliers,
               round(sum(share * share) * 10000, 4) AS hhi,
               round(max(share), 6) AS top_share
        FROM shared GROUP BY p_brand
    """,
    "q_ts_seasonal_strength": """
        WITH hmeans AS (
            SELECT event_type, hour(ts) AS hh, avg(value) AS hm
            FROM events GROUP BY 1, 2
        ),
        resid AS (
            SELECT e.event_type, e.value, e.value - h.hm AS r
            FROM events e
            JOIN hmeans h ON e.event_type = h.event_type
                         AND hour(e.ts) = h.hh
        )
        SELECT event_type,
               count(*) AS n_rows,
               round(1 - var_samp(r) / var_samp(value), 6)
                   AS seasonal_strength
        FROM resid GROUP BY event_type
    """,
    "q_graph_2hop_neighbors": """
        WITH """ + _EDGES_FRAGMENT + """,
        ranked AS (
            SELECT src, dst,
                   row_number() OVER (ORDER BY w DESC, src ASC, dst ASC)
                       AS rnk,
                   count(*) OVER () AS n_e
            FROM edges WHERE src <> dst
        ),
        direct AS (
            SELECT DISTINCT src, dst FROM ranked WHERE rnk * 4 <= n_e
        ),
        two_hop AS (
            SELECT DISTINCT a.src, b.dst AS dst2
            FROM direct a JOIN direct b ON a.dst = b.src
            WHERE a.src <> b.dst
        ),
        only2 AS (
            SELECT t.src, t.dst2 FROM two_hop t
            WHERE NOT EXISTS (
                SELECT 1 FROM direct d
                WHERE d.src = t.src AND d.dst = t.dst2
            )
        )
        SELECT n.n_name AS nation, count(*) AS n_two_hop_only
        FROM only2 o JOIN nation n ON o.src = n.n_nationkey
        GROUP BY n.n_name
    """,
    "q_dq_daily_health": """
        SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
               count(*) AS n_events,
               count(DISTINCT user_id) AS n_users,
               sum(CASE WHEN value IS NULL OR value = 0
                        THEN 1 ELSE 0 END)::BIGINT AS n_null_or_zero,
               round(avg(CASE WHEN event_type = 'purchase'
                              THEN 1.0 ELSE 0.0 END), 6) AS purchase_share
        FROM events GROUP BY 1
    """,
    "q_agg_ols_multi": """
        WITH means AS (
            SELECT l_returnflag,
                   avg(l_extendedprice) AS my,
                   avg(l_quantity) AS mx1,
                   avg(l_discount) AS mx2
            FROM lineitem GROUP BY l_returnflag
        ),
        s AS (
            SELECT li.l_returnflag,
                   count(*) AS n_rows,
                   any_value(my) AS my,
                   any_value(mx1) AS mx1,
                   any_value(mx2) AS mx2,
                   sum((l_quantity - mx1) * (l_quantity - mx1)) AS s11,
                   sum((l_discount - mx2) * (l_discount - mx2)) AS s22,
                   sum((l_quantity - mx1) * (l_discount - mx2)) AS s12,
                   sum((l_quantity - mx1) * (l_extendedprice - my)) AS s1y,
                   sum((l_discount - mx2) * (l_extendedprice - my)) AS s2y,
                   sum((l_extendedprice - my) * (l_extendedprice - my))
                       AS syy
            FROM lineitem li JOIN means USING (l_returnflag)
            GROUP BY li.l_returnflag
        )
        SELECT l_returnflag, n_rows,
               round((s22 * s1y - s12 * s2y) / (s11 * s22 - s12 * s12), 6)
                   AS beta_qty,
               round((s11 * s2y - s12 * s1y) / (s11 * s22 - s12 * s12), 6)
                   AS beta_disc,
               round(my - (s22 * s1y - s12 * s2y)
                          / (s11 * s22 - s12 * s12) * mx1
                        - (s11 * s2y - s12 * s1y)
                          / (s11 * s22 - s12 * s12) * mx2, 6) AS intercept,
               round(1 - (syy - (s22 * s1y - s12 * s2y)
                                / (s11 * s22 - s12 * s12) * s1y
                              - (s11 * s2y - s12 * s1y)
                                / (s11 * s22 - s12 * s12) * s2y) / syy, 6)
                   AS r2
        FROM s
    """,
    "q_agg_percentile_disc": f"""
        SELECT l_returnflag,
               count(*) AS n_rows,
               {", ".join(
                   f"quantile_disc(l_quantity, {p}) AS p{int(p * 100)}"
                   for p in PDISC_PS
               )}
        FROM lineitem GROUP BY l_returnflag
    """,
    "q_ts_sessionize": f"""
        WITH flagged AS (
            SELECT user_id, ts, event_id,
                   CASE WHEN date_diff('microsecond',
                                       lag(ts) OVER (PARTITION BY user_id
                                                     ORDER BY ts, event_id),
                                       ts) > {SESSION_GAP_MIN * 60 * 1_000_000}
                        THEN 1 ELSE 0 END AS brk
            FROM events
        ),
        sess AS (
            SELECT user_id, ts,
                   sum(brk) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS session_id
            FROM flagged
        ),
        per_session AS (
            SELECT user_id, session_id,
                   count(*) AS n_events,
                   date_diff('microsecond', min(ts), max(ts)) * 1.0
                       / 1000000 AS dur_s
            FROM sess GROUP BY 1, 2
        )
        SELECT count(DISTINCT user_id) AS n_users,
               count(*) AS n_sessions,
               round(avg(n_events), 6) AS avg_events_per_session,
               round(avg(dur_s), 6) AS avg_session_seconds,
               max(n_events) AS max_session_events,
               round(max(dur_s), 6) AS max_session_seconds
        FROM per_session
    """,
    "q_ts_autocorr": f"""
        WITH {_MINUTE_GRAIN_SQL.strip()},
        paired AS (
            SELECT event_type, mv,
                   lag(mv) OVER (PARTITION BY event_type ORDER BY epm)
                       AS prev
            FROM grain
        )
        SELECT event_type,
               count(*) AS n_pairs,
               round(corr(mv, prev), 6) AS autocorr_lag1
        FROM paired WHERE prev IS NOT NULL
        GROUP BY event_type
    """,
    "q_ts_cusum": f"""
        WITH {_MINUTE_GRAIN_SQL.strip()},
        centered AS (
            SELECT event_type, epm,
                   mv - avg(mv) OVER (PARTITION BY event_type) AS dev
            FROM grain
        ),
        swept AS (
            SELECT event_type,
                   sum(dev) OVER (PARTITION BY event_type ORDER BY epm
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS cusum
            FROM centered
        )
        SELECT event_type,
               count(*) AS n_minutes,
               round(max(cusum), 4) AS max_cusum,
               round(min(cusum), 4) AS min_cusum
        FROM swept GROUP BY event_type
    """,
    "q_agg_skew_kurt": """
        WITH means AS (
            SELECT l_returnflag, avg(l_extendedprice) AS m
            FROM lineitem GROUP BY l_returnflag
        ),
        mom AS (
            SELECT li.l_returnflag,
                   count(*) AS n_rows,
                   avg(pow(l_extendedprice - m, 2)) AS m2,
                   avg(pow(l_extendedprice - m, 3)) AS m3,
                   avg(pow(l_extendedprice - m, 4)) AS m4
            FROM lineitem li JOIN means USING (l_returnflag)
            GROUP BY li.l_returnflag
        )
        SELECT l_returnflag, n_rows,
               round(m3 / pow(m2, 1.5), 6) AS skewness_g1,
               round(m4 / (m2 * m2) - 3, 6) AS excess_kurtosis_g2
        FROM mom
    """,
    "q_agg_boolean": f"""
        SELECT o_orderpriority,
               count(*) AS n_orders,
               bool_and(o_totalprice > {BOOL_LO_PRICE}) AS all_priced,
               bool_or(o_totalprice > {BOOL_HI_PRICE}) AS any_whale,
               count_if(o_orderstatus = 'F')::BIGINT AS n_finished
        FROM orders GROUP BY o_orderpriority
    """,
    "q_agg_winsorized_mean": f"""
        WITH fences AS (
            SELECT l_returnflag,
                   quantile_cont(l_extendedprice, {WINSOR_LO}) AS lo,
                   quantile_cont(l_extendedprice, {WINSOR_HI}) AS hi
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT li.l_returnflag,
               count(*) AS n_rows,
               round(avg(greatest(lo, least(hi, l_extendedprice))), 6)
                   AS winsorized_mean,
               round(avg(l_extendedprice), 6) AS raw_mean,
               sum(CASE WHEN l_extendedprice < lo OR l_extendedprice > hi
                        THEN 1 ELSE 0 END)::BIGINT AS n_clipped
        FROM lineitem li JOIN fences f USING (l_returnflag)
        GROUP BY li.l_returnflag
    """,
    "q_behavior_rfm": f"""
        WITH anchor AS (SELECT max(o_orderdate) AS maxd FROM orders),
        per_cust AS (
            SELECT o_custkey,
                   date_diff('day', max(o_orderdate), any_value(maxd))
                       AS recency_d,
                   count(*) AS frequency,
                   round(sum(o_totalprice), 2) AS monetary
            FROM orders, anchor
            GROUP BY o_custkey
        ),
        scored AS (
            SELECT monetary,
                   ntile({RFM_TILES}) OVER (ORDER BY recency_d ASC,
                                            o_custkey ASC) AS r_score,
                   ntile({RFM_TILES}) OVER (ORDER BY frequency DESC,
                                            o_custkey ASC) AS f_score,
                   ntile({RFM_TILES}) OVER (ORDER BY monetary DESC,
                                            o_custkey ASC) AS m_score
            FROM per_cust
        )
        SELECT r_score, f_score, m_score,
               count(*) AS n_customers,
               round(sum(monetary), 2) AS cell_monetary
        FROM scored GROUP BY 1, 2, 3
    """,
    "q_report_yoy_growth": """
        WITH rolled AS (
            SELECT n.n_name, year(o.o_orderdate) AS yr,
                   round(sum(o.o_totalprice), 2) AS rev
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        ),
        lagged AS (
            SELECT n_name, yr, rev,
                   lag(rev) OVER (PARTITION BY n_name ORDER BY yr)
                       AS prev_rev
            FROM rolled
        )
        SELECT n_name, yr, rev, prev_rev,
               round((rev - prev_rev) / prev_rev, 6) AS yoy_pct
        FROM lagged WHERE prev_rev IS NOT NULL
    """,
    "q_report_order_gap_stats": """
        WITH gaps AS (
            SELECT o_custkey,
                   date_diff('day',
                             lag(o_orderdate) OVER (PARTITION BY o_custkey
                                                    ORDER BY o_orderdate,
                                                             o_orderkey),
                             o_orderdate) AS gap_d
            FROM orders
        )
        SELECT c.c_mktsegment,
               count(*) AS n_gaps,
               round(quantile_cont(gap_d, 0.5), 6) AS median_gap_d,
               round(quantile_cont(gap_d, 0.9), 6) AS p90_gap_d,
               round(avg(gap_d), 6) AS mean_gap_d
        FROM gaps g JOIN customer c ON g.o_custkey = c.c_custkey
        WHERE gap_d IS NOT NULL
        GROUP BY c.c_mktsegment
    """,
    "q_join_nearest_event": """
        WITH base AS (
            SELECT user_id, event_id, event_type,
                   date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
                       AS eps
            FROM events
        ),
        paired AS (
            SELECT user_id, event_type, eps,
                   last_value(CASE WHEN event_type <> 'purchase'
                                   THEN struct_pack(t := eps,
                                                    ty := event_type)
                              END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY eps, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND 1 PRECEDING) AS prev_t,
                   first_value(CASE WHEN event_type <> 'purchase'
                                    THEN struct_pack(t := eps,
                                                     ty := event_type)
                               END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY eps, event_id
                             ROWS BETWEEN 1 FOLLOWING
                                   AND UNBOUNDED FOLLOWING) AS next_t
            FROM base
        ),
        chosen AS (
            SELECT CASE WHEN next_t IS NULL
                          OR (prev_t IS NOT NULL
                              AND eps - prev_t.t <= next_t.t - eps)
                        THEN prev_t.ty ELSE next_t.ty END AS nearest_type,
                   CASE WHEN next_t IS NULL
                          OR (prev_t IS NOT NULL
                              AND eps - prev_t.t <= next_t.t - eps)
                        THEN eps - prev_t.t ELSE next_t.t - eps
                   END AS dist_s,
                   CASE WHEN next_t IS NULL
                          OR (prev_t IS NOT NULL
                              AND eps - prev_t.t <= next_t.t - eps)
                        THEN 'before' ELSE 'after' END AS side
            FROM paired
            WHERE event_type = 'purchase'
              AND (prev_t IS NOT NULL OR next_t IS NOT NULL)
        )
        SELECT nearest_type, side,
               count(*) AS n_purchases,
               round(avg(dist_s), 2) AS avg_dist_s,
               max(dist_s) AS max_dist_s
        FROM chosen GROUP BY 1, 2
    """,
}
