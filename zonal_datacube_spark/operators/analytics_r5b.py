"""Round-5b analytics additions (SURVEY.md §2.17): Spark 4 SQL pipe
syntax, interval merging (gaps-and-islands coverage), distributed
hypothesis tests (Welch t, chi-square independence, tie-corrected
Mann-Whitney U through the range-bucketed prefix sweep), rolling
correlation on the bounded minute grain, DAU/WAU stickiness, cross-source
duplicate detection, an exact grid-blocked nearest-neighbor join, and the
percent_rank/cume_dist window surface — each with an independent DuckDB
oracle.

Determinism (FIXTURES.md cookbook): island/coverage arithmetic stays in
integer MICROSECONDS until one final division (rules 7/11); every count
that DuckDB would widen to HUGEINT is cast ``::BIGINT`` in the oracle
(rule 12); chi-square and Mann-Whitney derive every statistic from exact
integer counts (identical doubles on both engines); Welch t and rolling
correlation round at 6dp after both engines evaluate the SAME closed
forms; ratios that feed no rank are display-rounded half-up (rule 15).

Scale notes (100 TB):
- interval merge and stickiness partition on user/day — natural
  high-cardinality keys; no global ordered pass ever sees the raw table.
- Mann-Whitney collapses events to the VALUE grain first, then ranks the
  grain through functions/prefix_sweep.py — the rank sweep runs with
  (bucket × value-range) parallelism, never one sorted reducer.
- rolling correlation sweeps the per-minute grain, bounded by TIME SPAN
  (43,200 minutes/month), not row count — the q_ts_anomaly r05 lesson.
- cross-source dedup shuffles on the md5 digest (16 bytes), never the
  document text; the per-digest source set is bounded by source count.
- the NN join is the spatial-grid candidate pattern (3x3 neighbor cells
  equi-joined on the cell id), with an EXACT residual: probes whose best
  in-neighborhood candidate cannot be proven nearest (best d >= cell
  side) fall back to a broadcast brute-force pass — empty at observed
  densities, and the provable-correctness escape hatch at any density.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zonal_datacube_spark.functions.chunked_window import with_trailing_range_window
from zonal_datacube_spark.functions.prefix_sweep import prefix_sweep
from zonal_datacube_spark.sources.loader import load_table

_EPOCH_US = (
    "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
)
_EPOCH_MIN = "timestampdiff(MINUTE, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"


def q_sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 SQL pipe syntax (`|>`): the classic pricing-summary shape
    written as a left-to-right pipeline — FROM |> WHERE |> EXTEND
    |> AGGREGATE … GROUP BY |> ORDER BY. Catalyst resolves pipe stages
    to the identical logical plan as the nested form, so pushdown /
    partial aggregation behave exactly like q_agg_groupby; the revenue
    sum rounds on its 1e-4 data grid half-up on both engines (rule 6)."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "zds_li_pipe"
    )
    return spark.sql(
        """
        FROM zds_li_pipe
        |> WHERE l_quantity > 5
        |> EXTEND l_extendedprice * (1 - l_discount) AS rev
        |> AGGREGATE
               floor(SUM(rev) * 10000 + 0.5) / 10000 AS revenue,
               COUNT(*) AS n_rows,
               floor(SUM(l_quantity) * 10 + 0.5) / 10 AS sum_qty
           GROUP BY l_returnflag, l_linestatus
        |> ORDER BY l_returnflag, l_linestatus
        """
    )


ISLAND_TOP_USERS = 20


def q_ts_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands interval merge: each event opens a deterministic
    interval [ts, ts + 60·(1 + event_id % 7) s]; per user, overlapping or
    touching intervals merge into islands (an interval extends its island
    while its start ≤ the running max end of everything earlier), and the
    result is each user's covered-time census. One user-keyed window pass
    (strict running max of interval end) flags island breaks, a cumulative
    sum numbers them, two grouped rollups finish — the classic coverage/
    uptime operator, never a self-join. All comparisons run in integer
    epoch MICROSECONDS (cookbook rules 7/11); the single /1e6 division
    happens on identical integers in both engines."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr(_EPOCH_US).alias("start_us"),
        (
            F.expr(_EPOCH_US)
            + (60 + 60 * F.expr("event_id % 7")) * F.lit(1_000_000)
        ).alias("end_us"),
    )
    order = Window.partitionBy("user_id").orderBy("start_us", "event_id")
    prev_max_end = F.max("end_us").over(
        order.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = ev.select(
        "user_id",
        "event_id",
        "start_us",
        "end_us",
        F.when(F.col("start_us") > prev_max_end, 1).otherwise(0).alias("brk"),
    )
    islands = flagged.select(
        "user_id",
        "start_us",
        "end_us",
        F.sum("brk")
        .over(order.rowsBetween(Window.unboundedPreceding, 0))
        .alias("island_id"),
    )
    per_island = islands.groupBy("user_id", "island_id").agg(
        F.count("*").alias("n_events"),
        (F.max("end_us") - F.min("start_us")).alias("span_us"),
    )
    per_user = per_island.groupBy("user_id").agg(
        F.count("*").alias("n_islands"),
        F.sum("span_us").alias("covered_us"),
        F.max("n_events").alias("max_island_events"),
    )
    return (
        per_user.select(
            "user_id",
            "n_islands",
            (F.col("covered_us") / F.lit(1_000_000.0)).alias("covered_s"),
            "max_island_events",
        )
        .orderBy(F.desc("covered_s"), "user_id")
        .limit(ISLAND_TOP_USERS)
    )


def q_stats_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test, one-vs-rest per event type: does
    this type's `value` distribution differ from everything else's? One
    partial-aggregated groupBy produces per-type (n, Σv, Σv²), one
    broadcast of the global totals derives the complement group by
    subtraction — the whole test is closed-form moment folding, no second
    scan, no window. Both engines evaluate the identical variance form
    (Σv² − (Σv)²/n)/(n−1) and Welch–Satterthwaite df, rounded at 6dp."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    per = ev.groupBy("event_type").agg(
        F.count("*").alias("n1"),
        F.sum("value").alias("s1"),
        F.sum(F.col("value") * F.col("value")).alias("ss1"),
    )
    tot = ev.agg(
        F.count("*").alias("nt"),
        F.sum("value").alias("st"),
        F.sum(F.col("value") * F.col("value")).alias("sst"),
    )
    j = per.crossJoin(F.broadcast(tot))
    n1, s1, ss1 = F.col("n1"), F.col("s1"), F.col("ss1")
    n2 = F.col("nt") - n1
    s2 = F.col("st") - s1
    ss2 = F.col("sst") - ss1
    # nullif guards: a single-row group (n−1 = 0) or a single-type corpus
    # (n2 = 0) yields NULL statistics on BOTH engines instead of an ANSI
    # DIVIDE_BY_ZERO crash here and an inf/NULL divergence in the oracle
    m1 = s1 / n1
    m2 = s2 / F.nullif(n2, F.lit(0))
    v1 = (ss1 - s1 * s1 / n1) / F.nullif(n1 - 1, F.lit(0))
    v2 = (ss2 - s2 * s2 / F.nullif(n2, F.lit(0))) / F.nullif(
        n2 - 1, F.lit(0)
    )
    a, b = v1 / n1, v2 / F.nullif(n2, F.lit(0))
    se2 = a + b
    t = (m1 - m2) / F.sqrt(se2)
    df = (se2 * se2) / (
        a * a / F.nullif(n1 - 1, F.lit(0))
        + b * b / F.nullif(n2 - 1, F.lit(0))
    )
    return j.select(
        "event_type",
        n1.alias("n_rows"),
        F.round(m1, 6).alias("mean_v"),
        F.round(m2, 6).alias("rest_mean"),
        F.round(t, 6).alias("t_stat"),
        F.round(df, 6).alias("welch_df"),
    ).orderBy("event_type")


def q_stats_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square test of independence between customer market segment
    and home REGION (nation rolled up through the broadcast dims), plus
    Cramér's V effect size. The contingency table is one partial-agg
    groupBy; marginals come from windows over the CONTINGENCY grain —
    bounded by |segments| × |regions| (25 cells), never the data. Every
    input to the statistic is an exact integer count, so both engines
    derive bit-identical doubles (cookbook rule 8 by construction)."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    joined = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).select("c_mktsegment", "n_regionkey")
    cells = joined.groupBy("c_mktsegment", "n_regionkey").agg(
        F.count("*").alias("o")
    )
    # full marginal grid: segments × regions (broadcast-tiny), so absent
    # combinations still contribute their expected count e = st·rt/N —
    # the textbook statistic, not the present-cells-only approximation
    seg_t = cells.groupBy("c_mktsegment").agg(F.sum("o").alias("st"))
    reg_t = cells.groupBy("n_regionkey").agg(F.sum("o").alias("rt"))
    grand = cells.agg(F.sum("o").alias("n"))
    grid = (
        seg_t.crossJoin(F.broadcast(reg_t))
        .crossJoin(F.broadcast(grand))
        .join(F.broadcast(cells), ["c_mktsegment", "n_regionkey"], "left")
        .select(
            F.coalesce(F.col("o"), F.lit(0)).alias("o"),
            (F.col("st") * F.col("rt") / F.col("n")).alias("e"),
            "n",
            "c_mktsegment",
            "n_regionkey",
        )
    )
    chi2 = F.sum(
        (F.col("o") - F.col("e")) * (F.col("o") - F.col("e")) / F.col("e")
    )
    dof = (F.count_distinct("c_mktsegment") - 1) * (
        F.count_distinct("n_regionkey") - 1
    )
    return grid.agg(
        F.max("n").alias("n_customers"),
        F.count("*").alias("n_cells"),
        F.round(chi2, 6).alias("chi2"),
        dof.cast("bigint").alias("dof"),
        F.round(
            F.sqrt(
                chi2
                / (
                    F.max("n")
                    * F.least(
                        F.count_distinct("c_mktsegment") - 1,
                        F.count_distinct("n_regionkey") - 1,
                    )
                )
            ),
            6,
        ).alias("cramers_v"),
    )


def q_stats_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Mann-Whitney U ('click' vs 'view' event values): the
    rank-sum test computed at the VALUE GRAIN — group events by exact
    value (one shuffle keyed on value), attach the strict cumulative
    count through the range-bucketed prefix sweep, and every tied run's
    average rank is cum_before + (n_v+1)/2 in closed form. R₁ folds as
    Σ n₁ᵥ·avgrank; the tie-corrected normal approximation needs only
    Σ(n_v³−n_v). No row-level rank is ever materialized and the sweep
    parallelizes over value buckets (functions/prefix_sweep.py) — the
    100 TB plan, not a global sort. Ranks live on the exact 0.5 grid, so
    U is bit-identical across engines; only z/r round (6dp)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    grain = ev.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias(
            "n1_v"
        ),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias(
            "n2_v"
        ),
        F.count("*").alias("n_v"),
    )
    swept = prefix_sweep(
        grain,
        [],
        "value",
        strict_sum_cols={"cum_before": "n_v"},
        # width, not quantile: value-grain sweep on the bounded events
        # value domain — occupancy counts distinct values (axis
        # concentration 2.8× at sf0.1 ⇒ ≥23 effective buckets, and the
        # grid saturates toward exact balance at scale); see
        # functions/percentiles.py's boundary-mode docstring
        boundaries="width",
    )
    ranked = swept.select(
        "n1_v",
        "n2_v",
        "n_v",
        (
            F.coalesce(F.col("cum_before"), F.lit(0))
            + (F.col("n_v") + 1) / F.lit(2.0)
        ).alias("avg_rank"),
    )
    ag = ranked.agg(
        F.sum("n1_v").alias("n1"),
        F.sum("n2_v").alias("n2"),
        F.sum(F.col("n1_v") * F.col("avg_rank")).alias("r1"),
        F.sum(
            F.col("n_v") * F.col("n_v") * F.col("n_v") - F.col("n_v")
        ).alias("tie"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    n = n1 + n2
    u1 = F.col("r1") - n1 * (n1 + 1) / F.lit(2.0)
    mu = n1 * n2 / F.lit(2.0)
    sig2 = (n1 * n2 / F.lit(12.0)) * (
        (n + 1) - F.col("tie") / (n * (n - F.lit(1.0)))
    )
    z = (u1 - mu) / F.sqrt(sig2)
    return ag.select(
        n1.alias("n_click"),
        n2.alias("n_view"),
        F.round(u1, 1).alias("u_stat"),
        F.round(z, 6).alias("z_stat"),
        F.round(1 - 2 * u1 / (n1 * n2), 6).alias("rank_biserial"),
    )


CORR_WINDOW_MIN = 60


def q_ts_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 60-minute correlation between per-minute view and click
    volumes, reported as a per-day profile. Events first collapse to the
    minute grain with conditional aggregation (bounded by TIME SPAN ×
    nothing — one row per active minute, the q_ts_anomaly lesson); the
    rolling frame then slides over that grain and the correlation folds
    from five windowed INTEGER sums — exact on both engines — with the
    degenerate zero-variance windows excluded by an integer predicate.
    Only the per-day averaging of the (identical) per-window doubles
    rounds, at 6dp.

    Scale shape (r09, VERDICT r08 what's-wrong #3): the minute grain is
    time-bounded, but the rolling pass no longer rides a single global
    ``Window.orderBy(epm)`` reducer — the dense row index comes from the
    range-bucketed prefix sweep and the 60-row trailing frame from the
    chunk+halo exchange (RANGE over the dense index ≡ ROWS over the
    grain), so parallelism grows with the time span instead of pinning
    at 1. Integer sums make the rewrite bit-identical to the direct
    window."""
    grain = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click"))
        .groupBy(F.expr(_EPOCH_MIN).alias("epm"))
        .agg(
            F.sum(
                F.when(F.col("event_type") == "view", 1).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("y"),
        )
    )
    indexed = prefix_sweep(grain, [], "epm", row_number_col="rn")
    sums = with_trailing_range_window(
        indexed,
        [],
        "rn",
        CORR_WINDOW_MIN - 1,
        lambda w: {
            "sx": F.sum("x").over(w),
            "sy": F.sum("y").over(w),
            "sxy": F.sum(F.col("x") * F.col("y")).over(w),
            "sxx": F.sum(F.col("x") * F.col("x")).over(w),
            "syy": F.sum(F.col("y") * F.col("y")).over(w),
        },
        upper_bound=0,
    ).filter(F.col("rn") >= CORR_WINDOW_MIN)
    nw = F.lit(CORR_WINDOW_MIN)
    varx = nw * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = nw * F.col("syy") - F.col("sy") * F.col("sy")
    cov = nw * F.col("sxy") - F.col("sx") * F.col("sy")
    corr = (
        sums.filter((varx > 0) & (vary > 0))
        .select(
            F.expr("epm div 1440").alias("day_idx"),
            (cov / F.sqrt(varx * vary)).alias("c"),
        )
    )
    return (
        corr.groupBy("day_idx")
        .agg(
            F.count("*").alias("n_windows"),
            F.round(F.avg("c"), 6).alias("avg_corr"),
            F.round(F.min("c"), 6).alias("min_corr"),
            F.round(F.max("c"), 6).alias("max_corr"),
        )
        .orderBy("day_idx")
    )


def q_behavior_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per ISO week: average daily active users over
    weekly active users — the engagement-health ratio every product
    dashboard carries. Two distinct-user aggregations (day grain, week
    grain) joined on the bounded week axis; every input to the ratio is
    an exact integer, and the single derived ratio floors half-up at 6dp
    on both engines (cookbook rule 15)."""
    ev = load_table(spark, sf_dir, "events").select(
        F.expr("extract(YEAROFWEEK FROM ts)").cast("int").alias("iso_year"),
        F.weekofyear("ts").cast("int").alias("iso_week"),
        F.dayofmonth("ts").alias("dom"),
        F.month("ts").alias("mo"),
        "user_id",
    )
    dau = (
        ev.groupBy("iso_year", "iso_week", "mo", "dom")
        .agg(F.count_distinct("user_id").alias("dau"))
        .groupBy("iso_year", "iso_week")
        .agg(F.sum("dau").alias("sum_dau"), F.count("*").alias("n_days"))
    )
    wau = ev.groupBy("iso_year", "iso_week").agg(
        F.count_distinct("user_id").alias("wau")
    )
    j = dau.join(wau, ["iso_year", "iso_week"])
    ratio = F.col("sum_dau") / (F.col("n_days") * F.col("wau"))
    return j.select(
        "iso_year",
        "iso_week",
        "sum_dau",
        "n_days",
        "wau",
        (F.floor(ratio * 1_000_000 + F.lit(0.5)) / 1_000_000).alias(
            "stickiness"
        ),
    ).orderBy("iso_year", "iso_week")


CROSS_SOURCE_TOP = 25
CROSS_SHINGLE_N = 8


def q_dedup_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source n-gram leakage matrix: which source pairs share the
    most distinct 8-token shingles? The contamination audit every corpus
    pipeline runs before splitting train/eval by source (full-text md5
    match finds almost nothing — the fixture's copied SPANS live inside
    otherwise-distinct documents, the q_dedup_span signal). Documents
    explode to (shingle-digest, source) rows — the shuffle key is the
    16-byte md5 of the shingle, never the text — then ONE digest-keyed
    aggregation collects each digest's distinct source set (bounded by
    the source count, ≤20 here) and the unordered pairs expand IN-ROW
    from that bounded array: no self-join ever touches the data-scaled
    table, and a shingle copied a million times still contributes at
    most |sources|²/2 pair rows. (The first cut self-joined the distinct
    (digest, source) table — correct, but its 10×-data wall-time ratio
    was 3.3× vs ~1.5× for this shape: the join re-shuffled the whole
    pair table a second time; SCALING.md tracks the fix.)"""
    from zonal_datacube_spark.functions.text_funcs import shingles, tokens

    docs = load_table(spark, sf_dir, "documents").select(
        "source", tokens("text").alias("t")
    )
    src_sets = (
        docs.filter(F.size("t") >= CROSS_SHINGLE_N)
        .select(
            "source",
            F.explode(shingles("t", CROSS_SHINGLE_N)).alias("sh"),
        )
        # 16-byte binary digest, not the 32-char hex string: the digest
        # is a pure grouping key (never output), and unhex(md5) is
        # bijective on md5's range — same groups, half the shuffle key
        # bytes on the data-scaled exchange
        .select(F.unhex(F.md5("sh")).alias("dg"), "source")
        .groupBy("dg")
        .agg(F.sort_array(F.collect_set("source")).alias("srcs"))
        .filter(F.size("srcs") >= 2)
    )
    pairs = (
        src_sets.select(F.posexplode("srcs").alias("pa", "src_a"), "srcs")
        .select("src_a", "pa", F.posexplode("srcs").alias("pb", "src_b"))
        .filter(F.col("pa") < F.col("pb"))
    )
    return (
        pairs.groupBy("src_a", "src_b")
        .agg(F.count("*").alias("n_shared"))
        .orderBy(F.desc("n_shared"), "src_a", "src_b")
        .limit(CROSS_SOURCE_TOP)
    )


NN_CELL = 0.1
NN_CELL_SQ = 0.01  # same literal on both sides of the resolve predicate


def q_geo_nearest_neighbor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT nearest-neighbor join via grid blocking: every probe point
    (labels 0–4, coords = first two embedding dims) finds its true
    nearest base point (labels 5–9). Candidates come from a 3×3
    neighbor-cell equi-join on the probe's grid cell (side NN_CELL);
    geometry guarantees any point OUTSIDE that neighborhood is ≥ NN_CELL
    away, so a best candidate with d² < NN_CELL² is provably the global
    nearest. Probes the grid cannot certify (none at observed densities —
    tests/test_analytics_r5b.py pins the fraction) fall back to one
    broadcast brute-force pass, keeping the operator exact at ANY
    density while the hot path stays a cell-keyed equi-join that scales
    with local density, not n². Per-probe argmin ties break on base id
    via a struct min (same (d², id) lexicographic rule as the oracle's
    row_number)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.element_at("embedding", 1).cast("double").alias("x"),
        F.element_at("embedding", 2).cast("double").alias("y"),
    )
    probes = emb.filter(F.col("label") <= 4).select(
        F.col("vec_id").alias("a_id"),
        F.col("label").alias("a_label"),
        F.col("x").alias("ax"),
        F.col("y").alias("ay"),
        F.floor(F.col("x") / NN_CELL).alias("cx"),
        F.floor(F.col("y") / NN_CELL).alias("cy"),
    )
    base = emb.filter(F.col("label") >= 5).select(
        F.col("vec_id").alias("b_id"),
        F.col("x").alias("bx"),
        F.col("y").alias("by"),
        F.floor(F.col("x") / NN_CELL).alias("bcx"),
        F.floor(F.col("y") / NN_CELL).alias("bcy"),
    )
    neighborhood = (
        probes.select(
            "*", F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("dx")
        )
        .select("*", F.explode(F.sequence(F.lit(-1), F.lit(1))).alias("dy"))
        .select(
            "a_id",
            "a_label",
            "ax",
            "ay",
            (F.col("cx") + F.col("dx")).alias("tcx"),
            (F.col("cy") + F.col("dy")).alias("tcy"),
        )
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    grid_best = (
        neighborhood.join(
            base,
            (F.col("tcx") == F.col("bcx")) & (F.col("tcy") == F.col("bcy")),
        )
        .select(
            "a_id",
            "a_label",
            F.struct(d2.alias("d2"), F.col("b_id").alias("b_id")).alias(
                "cand"
            ),
        )
        .groupBy("a_id", "a_label")
        .agg(F.min("cand").alias("best"))
    )
    resolved = grid_best.filter(F.col("best.d2") < F.lit(NN_CELL_SQ))
    # probes with no certifiable in-neighborhood winner (none at fixture
    # density): one broadcast brute-force pass keeps the result exact
    unresolved = probes.join(resolved.select("a_id"), "a_id", "left_anti")
    brute = (
        unresolved.crossJoin(F.broadcast(base))
        .select(
            "a_id",
            "a_label",
            F.struct(d2.alias("d2"), F.col("b_id").alias("b_id")).alias(
                "cand"
            ),
        )
        .groupBy("a_id", "a_label")
        .agg(F.min("cand").alias("best"))
    )
    nn = resolved.unionByName(brute)
    return (
        nn.select("a_label", F.sqrt(F.col("best.d2")).alias("d"))
        .groupBy("a_label")
        .agg(
            F.count("*").alias("n_probes"),
            F.round(F.avg("d"), 6).alias("avg_nn_dist"),
            F.round(F.min("d"), 6).alias("min_nn_dist"),
            F.round(F.max("d"), 6).alias("max_nn_dist"),
        )
        .orderBy("a_label")
    )


PR_TOP = 40


def q_window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist over suppliers within nation by account
    balance — the remaining ANSI ranking-function surface. The suppkey
    tiebreak makes every rank distinct, so rank == row_number and both
    ratios collapse to exact integer quotients — percent_rank =
    (rn−1)/(n−1), cume_dist = rn/n — computed through the
    range-bucketed prefix sweep (the r06 self-audit retired the
    25-nation-partition window over the data-scaled supplier table)
    and rounded at 6dp."""
    from zonal_datacube_spark.functions.prefix_sweep import prefix_sweep

    sup = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    j = sup.join(nation, sup.s_nationkey == F.col("n_nationkey"))
    ranked = prefix_sweep(
        j.select("n_name", "s_suppkey", "s_acctbal"),
        ["n_name"],
        "s_acctbal",
        tiebreak=["s_suppkey"],
        row_number_col="rn",
        total_count_col="n",
        boundaries="quantile",
    )
    return (
        ranked.select(
            "n_name",
            "s_suppkey",
            F.round(
                F.when(
                    F.col("n") > 1,
                    (F.col("rn") - 1).cast("double") / (F.col("n") - 1),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("pct_rank"),
            F.round(F.col("rn").cast("double") / F.col("n"), 6).alias(
                "cume_dist"
            ),
        )
        .orderBy("n_name", "s_suppkey")
        .limit(PR_TOP)
    )


QUERIES = {
    "q_sql_pipe_syntax": q_sql_pipe_syntax,
    "q_ts_interval_merge": q_ts_interval_merge,
    "q_stats_ttest": q_stats_ttest,
    "q_stats_chi2": q_stats_chi2,
    "q_stats_mannwhitney": q_stats_mannwhitney,
    "q_ts_rolling_corr": q_ts_rolling_corr,
    "q_behavior_stickiness": q_behavior_stickiness,
    "q_dedup_cross_source": q_dedup_cross_source,
    "q_geo_nearest_neighbor": q_geo_nearest_neighbor,
    "q_window_percent_rank": q_window_percent_rank,
}

_US = "date_diff('microsecond', TIMESTAMP '1970-01-01 00:00:00', ts)"
_MIN = "date_diff('minute', TIMESTAMP '1970-01-01 00:00:00', ts)"

ORACLE = {
    "q_sql_pipe_syntax": """
        SELECT l_returnflag, l_linestatus,
               floor(sum(l_extendedprice * (1 - l_discount)) * 10000 + 0.5)
                   / 10000 AS revenue,
               count(*) AS n_rows,
               floor(sum(l_quantity) * 10 + 0.5) / 10 AS sum_qty
        FROM lineitem
        WHERE l_quantity > 5
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "q_ts_interval_merge": f"""
        WITH iv AS (
            SELECT user_id, event_id,
                   {_US} AS start_us,
                   {_US} + (60 + 60 * (event_id % 7)) * 1000000 AS end_us
            FROM events
        ),
        flagged AS (
            SELECT user_id, start_us, end_us,
                   CASE WHEN start_us > max(end_us) OVER (
                       PARTITION BY user_id ORDER BY start_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   THEN 1 ELSE 0 END AS brk,
                   event_id
            FROM iv
        ),
        isl AS (
            SELECT user_id, start_us, end_us,
                   sum(brk) OVER (
                       PARTITION BY user_id ORDER BY start_us, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS island_id
            FROM flagged
        ),
        per_island AS (
            SELECT user_id, island_id, count(*) AS n_events,
                   max(end_us) - min(start_us) AS span_us
            FROM isl GROUP BY 1, 2
        )
        SELECT user_id,
               count(*)::BIGINT AS n_islands,
               sum(span_us) / 1000000.0 AS covered_s,
               max(n_events)::BIGINT AS max_island_events
        FROM per_island GROUP BY user_id
        ORDER BY covered_s DESC, user_id LIMIT {ISLAND_TOP_USERS}
    """,
    "q_stats_ttest": """
        WITH per AS (
            SELECT event_type, count(*)::BIGINT AS n1,
                   sum(value) AS s1, sum(value * value) AS ss1
            FROM events GROUP BY event_type
        ),
        tot AS (
            SELECT count(*)::BIGINT AS nt, sum(value) AS st,
                   sum(value * value) AS sst
            FROM events
        ),
        derived AS (
            SELECT event_type, n1, nt - n1 AS n2,
                   s1 / n1 AS m1,
                   (st - s1) / nullif(nt - n1, 0) AS m2,
                   (ss1 - s1 * s1 / n1) / nullif(n1 - 1, 0) / n1 AS a,
                   ((sst - ss1)
                    - (st - s1) * (st - s1) / nullif(nt - n1, 0))
                       / nullif(nt - n1 - 1, 0)
                       / nullif(nt - n1, 0) AS b
            FROM per, tot
        )
        SELECT event_type, n1 AS n_rows,
               round(m1, 6) AS mean_v,
               round(m2, 6) AS rest_mean,
               round((m1 - m2) / sqrt(a + b), 6) AS t_stat,
               round((a + b) * (a + b)
                     / (a * a / nullif(n1 - 1, 0)
                        + b * b / nullif(n2 - 1, 0)), 6) AS welch_df
        FROM derived
        ORDER BY event_type
    """,
    "q_stats_chi2": """
        WITH cells AS (
            SELECT c.c_mktsegment, n.n_regionkey, count(*)::BIGINT AS o
            FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        ),
        seg_t AS (SELECT c_mktsegment, sum(o)::BIGINT AS st FROM cells
                  GROUP BY 1),
        reg_t AS (SELECT n_regionkey, sum(o)::BIGINT AS rt FROM cells
                  GROUP BY 1),
        grand AS (SELECT sum(o)::BIGINT AS n FROM cells),
        grid AS (
            SELECT coalesce(c.o, 0) AS o,
                   s.st * r.rt / g.n::DOUBLE AS e,
                   g.n, s.c_mktsegment, r.n_regionkey
            FROM seg_t s CROSS JOIN reg_t r CROSS JOIN grand g
            LEFT JOIN cells c
              ON c.c_mktsegment = s.c_mktsegment
             AND c.n_regionkey = r.n_regionkey
        )
        SELECT max(n)::BIGINT AS n_customers,
               count(*)::BIGINT AS n_cells,
               round(sum((o - e) * (o - e) / e), 6) AS chi2,
               ((count(DISTINCT c_mktsegment) - 1)
                * (count(DISTINCT n_regionkey) - 1))::BIGINT AS dof,
               round(sqrt(sum((o - e) * (o - e) / e)
                          / (max(n) * least(count(DISTINCT c_mktsegment) - 1,
                                            count(DISTINCT n_regionkey) - 1))),
                     6) AS cramers_v
        FROM grid
    """,
    "q_stats_mannwhitney": """
        WITH vg AS (
            SELECT value,
                   sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       ::BIGINT AS n1_v,
                   sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                       ::BIGINT AS n2_v,
                   count(*)::BIGINT AS n_v
            FROM events WHERE event_type IN ('click', 'view')
            GROUP BY value
        ),
        sw AS (
            SELECT n1_v, n2_v, n_v,
                   coalesce(sum(n_v) OVER (
                       ORDER BY value
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) + (n_v + 1) / 2.0 AS avg_rank
            FROM vg
        ),
        ag AS (
            SELECT sum(n1_v)::BIGINT AS n1, sum(n2_v)::BIGINT AS n2,
                   sum(n1_v * avg_rank) AS r1,
                   sum(n_v * n_v * n_v - n_v)::BIGINT AS tie
            FROM sw
        )
        SELECT n1 AS n_click, n2 AS n_view,
               round(r1 - n1 * (n1 + 1) / 2.0, 1) AS u_stat,
               round(((r1 - n1 * (n1 + 1) / 2.0) - n1 * n2 / 2.0)
                     / sqrt(n1 * n2 / 12.0
                            * ((n1 + n2 + 1)
                               - tie / ((n1 + n2) * (n1 + n2 - 1.0)))),
                     6) AS z_stat,
               round(1 - 2 * (r1 - n1 * (n1 + 1) / 2.0) / (n1 * n2), 6)
                   AS rank_biserial
        FROM ag
    """,
    "q_ts_rolling_corr": f"""
        WITH grain AS (
            SELECT {_MIN} AS epm,
                   sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                       ::BIGINT AS x,
                   sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                       ::BIGINT AS y
            FROM events WHERE event_type IN ('view', 'click')
            GROUP BY 1
        ),
        sums AS (
            SELECT epm,
                   row_number() OVER (ORDER BY epm) AS rn,
                   sum(x) OVER w AS sx, sum(y) OVER w AS sy,
                   sum(x * y) OVER w AS sxy,
                   sum(x * x) OVER w AS sxx,
                   sum(y * y) OVER w AS syy
            FROM grain
            WINDOW w AS (ORDER BY epm
                         ROWS BETWEEN {CORR_WINDOW_MIN - 1} PRECEDING
                         AND CURRENT ROW)
        ),
        c AS (
            SELECT epm // 1440 AS day_idx,
                   ({CORR_WINDOW_MIN} * sxy - sx * sy)
                       / sqrt(({CORR_WINDOW_MIN} * sxx - sx * sx)
                              * ({CORR_WINDOW_MIN} * syy - sy * sy)) AS c
            FROM sums
            WHERE rn >= {CORR_WINDOW_MIN}
              AND {CORR_WINDOW_MIN} * sxx - sx * sx > 0
              AND {CORR_WINDOW_MIN} * syy - sy * sy > 0
        )
        SELECT day_idx::BIGINT AS day_idx,
               count(*)::BIGINT AS n_windows,
               round(avg(c), 6) AS avg_corr,
               round(min(c), 6) AS min_corr,
               round(max(c), 6) AS max_corr
        FROM c GROUP BY 1 ORDER BY day_idx
    """,
    "q_behavior_stickiness": """
        WITH ev AS (
            SELECT isoyear(ts)::INT AS iso_year, week(ts)::INT AS iso_week,
                   month(ts) AS mo, day(ts) AS dom, user_id
            FROM events
        ),
        dau AS (
            SELECT iso_year, iso_week, sum(dau)::BIGINT AS sum_dau,
                   count(*)::BIGINT AS n_days
            FROM (SELECT iso_year, iso_week, mo, dom,
                         count(DISTINCT user_id) AS dau
                  FROM ev GROUP BY 1, 2, 3, 4)
            GROUP BY 1, 2
        ),
        wau AS (
            SELECT iso_year, iso_week, count(DISTINCT user_id)::BIGINT AS wau
            FROM ev GROUP BY 1, 2
        )
        SELECT iso_year, iso_week, sum_dau, n_days, wau,
               floor(sum_dau / (n_days * wau)::DOUBLE * 1000000 + 0.5)
                   / 1000000 AS stickiness
        FROM dau JOIN wau USING (iso_year, iso_week)
        ORDER BY iso_year, iso_week
    """,
    "q_dedup_cross_source": f"""
        WITH toks AS (
            SELECT source, string_split(lower(text), ' ') AS t
            FROM documents
        ),
        sh AS (
            SELECT source,
                   array_to_string(
                       t[i:i + {CROSS_SHINGLE_N - 1}], ' ') AS s
            FROM toks, unnest(range(1, len(t) - {CROSS_SHINGLE_N - 2}))
                 AS u(i)
            WHERE len(t) >= {CROSS_SHINGLE_N}
        ),
        d AS (SELECT DISTINCT md5(s) AS dg, source FROM sh)
        SELECT a.source AS src_a, b.source AS src_b,
               count(DISTINCT a.dg)::BIGINT AS n_shared
        FROM d a JOIN d b ON a.dg = b.dg AND a.source < b.source
        GROUP BY 1, 2
        ORDER BY n_shared DESC, src_a, src_b LIMIT {CROSS_SOURCE_TOP}
    """,
    "q_geo_nearest_neighbor": """
        WITH p AS (
            SELECT vec_id, label,
                   embedding[1]::DOUBLE AS x, embedding[2]::DOUBLE AS y
            FROM embeddings
        ),
        pr AS (SELECT * FROM p WHERE label <= 4),
        ba AS (SELECT * FROM p WHERE label >= 5),
        scored AS (
            SELECT pr.vec_id AS a_id, pr.label AS a_label,
                   (pr.x - ba.x) * (pr.x - ba.x)
                       + (pr.y - ba.y) * (pr.y - ba.y) AS d2,
                   row_number() OVER (
                       PARTITION BY pr.vec_id
                       ORDER BY (pr.x - ba.x) * (pr.x - ba.x)
                                + (pr.y - ba.y) * (pr.y - ba.y),
                                ba.vec_id) AS rn
            FROM pr CROSS JOIN ba
        )
        SELECT a_label,
               count(*)::BIGINT AS n_probes,
               round(avg(sqrt(d2)), 6) AS avg_nn_dist,
               round(min(sqrt(d2)), 6) AS min_nn_dist,
               round(max(sqrt(d2)), 6) AS max_nn_dist
        FROM scored WHERE rn = 1
        GROUP BY a_label ORDER BY a_label
    """,
    "q_window_percent_rank": f"""
        SELECT n_name, s_suppkey,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cume_dist
        FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        WINDOW w AS (PARTITION BY n_name ORDER BY s_acctbal, s_suppkey)
        ORDER BY n_name, s_suppkey LIMIT {PR_TOP}
    """,
}
