"""Round-6 third wave (SURVEY.md §2.22): rank-correlation statistics
(Spearman via the prefix sweep, Kendall tau-b on the bounded day grain),
a distributed PCA variance spectrum over the embedding corpus, a
ClickHouse-style windowFunnel, Holt linear exponential smoothing with a
recursive-CTE oracle, and the SQL named-WINDOW-clause surface.

Determinism (FIXTURES.md cookbook): every statistic folds from exact
integer inputs — doubled average ranks (2·rank is always an integer,
rule 8), cent/micro grids (rule 6), integer epoch-microseconds (rules
7/11) — and sums that can pass 2^63 ride DECIMAL(38,0) in Spark /
HUGEINT in DuckDB (rule 12). Each final score is a short fixed chain of
correctly-rounded double ops (cast → sqrt → mul → div) applied to the
same exact integers in both engines, so hashes match bit-for-bit. The
Holt recursion is sequential IEEE arithmetic with the identical
expression shape on both sides (see q_ts_holt's docstring).

Scale notes (100 TB):
- q_stats_spearman never materializes a row-level sort: BOTH variables'
  tie-averaged ranks live on ONE stacked VALUE GRAIN (one groupBy over
  (group, var, value)), the strict cumulative count comes from a single
  functions/prefix_sweep.py pass (parallelism = groups × vars × value
  buckets, no enum-partition window over data-scaled rows), and rows
  join back to the persisted grain table by (group, value) — plain
  shuffle equi-joins. The moment fold is one partial-agg groupBy.
- q_stats_kendall pairs the TIME-BOUNDED day grain (years × 366 rows per
  type), never raw events: the self-join is grain² work with a broadcast
  side, a shape that does not grow with data volume at fixed history.
- q_embed_pca_var is the map-side-combine matrix reduction: each Arrow
  batch folds into one d×d integer Gram partial (numpy int64 matmul —
  exact; |q|≤1e6 keeps a 10k-row batch ≤ 1e16 « 2^63), so the shuffle
  carries O(partitions · d²) rows, not O(rows · d²); partials sum as
  DECIMAL(38,0). The d×d eigensolve is driver-side on a 64×64 matrix —
  control-plane sized, independent of corpus size.
- q_behavior_window_funnel stacks three conditional-min windows over ONE
  user_id hash partitioning (a data-scaled key — parallelism grows with
  users) and the per-user rollup reuses the same partitioning: one
  shuffle end-to-end before the bounded depth census.
- q_ts_holt is a sequential recurrence over the bounded day grain — a
  deliberate applyInPandas python plan (PLANS.md class of the media
  decode kernel): ≤ years×366 rows per series, grouped by series key.
- q_sql_named_window partitions by o_custkey (data-scaled key), so every
  window task count grows with customers; no global or enum-keyed sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zonal_datacube_spark.functions.prefix_sweep import prefix_sweep
from zonal_datacube_spark.operators.analytics_r6b import (
    _DAILY_SQL,
    _G6_SQL,
    _daily,
    _g6,
)
from zonal_datacube_spark.sources.loader import load_table
from zonal_datacube_spark.functions.local_rel import local_relation


# --------------------------------------------------------------------------
# Spearman rank correlation
# --------------------------------------------------------------------------


def _doubled_ranks_stacked(
    df: DataFrame, part: str, xval: str, yval: str
) -> DataFrame:
    """BOTH variables' value-grain doubled tie-averaged ranks from ONE
    prefix sweep (VERDICT r09 next-round #3 — the r09 shape ran the
    sweep once per variable; the two sweeps shared the fact scan and
    the sketch machinery, so stacking the variables into a single
    (part, var, val) grain halves the sweep executions and reads the
    fact table once for both grains).

    Returns (part, var, val, u) where u = 2·(tie-averaged rank of val
    within (part, var)). Doubling keeps the average rank integral
    (rule 8: values that feed arithmetic stay exact): for a run of n_v
    ties after c earlier rows, avg rank = c + (n_v+1)/2, so
    2·avg = 2c + n_v + 1. The strict cumulative count c comes from the
    range-bucketed prefix sweep — no enum-partition window ever touches
    a data-scaled table. ``var`` rides the sweep's PARTITION key, so
    slice bounds are drawn per (part, var): mixing the two value
    distributions in one column costs no bucket balance. 32 buckets per
    (part, var) slice keep the same part×var×32 parallelism the two
    32-bucket sweeps had, with one bounds pass instead of two.

    The result is PERSISTED (MEMORY_AND_DISK): both rank-attach joins
    consume it, and Spark plans — not caches — shared DataFrame
    branches, so an unpersisted sweep would execute twice and give the
    fold back. The grain is bounded by the value-grid cardinality
    (cents/integer quantities), not by data volume, so the persist is
    control-plane sized at any SF."""
    grain = (
        df.selectExpr(
            part,
            f"stack(2, 'x', {xval}, 'y', {yval}) AS (var, val)",
        )
        .groupBy(part, "var", "val")
        .agg(F.count("*").alias("n_v"))
    )
    return _sweep_stacked_ranks(grain, part)


def _sweep_stacked_ranks(grain: DataFrame, part: str) -> DataFrame:
    """The rank sweep over a pre-built stacked (part, var, val, n_v)
    grain — factored out so q_stats_spearman can feed it the union of
    the two cached canonical grains (r13) while engineered-input tests
    keep the fact-table stack path."""
    from pyspark.storagelevel import StorageLevel

    swept = prefix_sweep(
        grain, [part, "var"], "val", strict_sum_cols={"cum_before": "n_v"},
        # width, not quantile (round-10 second pass): the sweep runs at
        # the VALUE GRAIN, where slice occupancy counts DISTINCT grid
        # values — the quantity grid and cent-grid prices are near-dense
        # on their ranges (max/avg ≤ 1.05 measured at sf0.1), and bounds
        # are drawn per (part, var) so each variable gets its own range;
        # skips the GK sketch + per-row edge scan entirely. See
        # functions/percentiles.py's boundary-mode docstring.
        n_buckets=32, boundaries="width",
    )
    return swept.select(
        part,
        "var",
        "val",
        "n_v",
        (
            2 * F.coalesce(F.col("cum_before"), F.lit(0))
            + F.col("n_v")
            + 1
        ).alias("u"),
    ).persist(StorageLevel.MEMORY_AND_DISK)


_RANK_SQL = """
        SELECT l_returnflag, {val} AS v,
               2 * coalesce(sum(count(*)) OVER (
                       PARTITION BY l_returnflag ORDER BY {val}
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) + count(*) + 1 AS {out}
        FROM lineitem GROUP BY l_returnflag, {val}
"""


def q_stats_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation between l_quantity and l_extendedprice
    per return flag — the monotone-association screen run before
    assuming linearity. Tie-averaged ranks are attached at the VALUE
    GRAIN (doubling keeps them integral), rows join back by (flag,
    value), and rho folds from five exact DECIMAL(38,0) moments with the
    closed Pearson-on-ranks form: every double is one correctly-rounded
    cast/sqrt/mul/div chain over the same integers in both engines.

    Perf note (VERDICT r06/r07 next-round #7, measured r08; rewritten
    r09 next-round #3): both variables' ranks fold from ONE stacked
    prefix sweep (see _doubled_ranks_stacked), and the moment fold now
    never sort-merge-joins the row table at all. The r09 shape shuffled
    the full fact TWICE (one rank-attach join per variable); the key
    observation is an asymmetric grain: the quantity grain is
    GRID-BOUNDED (≈ 50 integer values × flags — broadcast-sized at any
    data volume), while the price grain is cent-grid bounded but large.
    So the x-rank attaches to rows via a broadcast hash join (AQE picks
    it from the persisted table's runtime size — map-only, no fact
    shuffle), rows then collapse to the PRICE GRAIN with map-side
    partial sums of (n_p, Σux, Σux²), and the y-rank attaches with one
    grain×grain equi-join. Every moment is a sum of exact integers
    regrouped by price value — addition order is irrelevant, so the
    fold is bit-identical to the row-level one and hash parity with the
    unchanged DuckDB oracle holds. Net: one map-side broadcast probe +
    one grain shuffle replace two full-fact shuffle-sorts."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    return _spearman_fold(li, ranks=_stacked_ranks_from_cached(spark, sf_dir))


def _stacked_ranks_from_cached(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stacked (part, var, val) rank sweep INPUT assembled from the
    two canonical shared grains (functions/grain_cache.py) instead of a
    fresh stack+groupBy over the fact table (r13 — the q_agg_percentile
    union trick applied here): the grain rows are the same multiset
    (``var`` discriminates, so grouping the stack equals unioning the
    per-axis groupings — tests/test_grain_cache.py pins it), and both
    axes are pre-warmed in-suite, so the rank sweep becomes entirely
    grain-side and spearman's only remaining fact scan is the moment
    fold. Ranks are identical: the sweep runs on the same (part, var,
    val, n_v) rows either way."""
    from zonal_datacube_spark.functions.grain_cache import (
        SWEPT_COUNT,
        SWEPT_CUM,
        table_swept_grain,
    )

    # r13 second pass: the doubled tie-averaged rank is pure arithmetic
    # on the SWEPT grain's exact inclusive cumulative count — with
    # cum_before = _gp_cum − n_v, u = 2·cum_before + n_v + 1
    # = 2·_gp_cum − n_v + 1 — so spearman's rank attach no longer runs
    # ANY sweep of its own: both axes read the shared swept entries
    # (functions/grain_cache.table_swept_grain) map-side. Integer
    # arithmetic on the same integers the stacked sweep produced —
    # identical ranks, hash parity with the unchanged oracle.
    qty = table_swept_grain(
        spark, sf_dir, "lineitem", ("l_returnflag",),
        "CAST(l_quantity AS DOUBLE)", "l_quantity",
    )
    price = table_swept_grain(
        spark, sf_dir, "lineitem", ("l_returnflag",),
        "l_extendedprice", "l_extendedprice",
    )
    u = (2 * F.col(SWEPT_CUM) - F.col(SWEPT_COUNT) + 1).alias("u")
    return qty.select(
        "l_returnflag",
        F.lit("x").alias("var"),
        F.col("l_quantity").alias("val"),
        F.col(SWEPT_COUNT).alias("n_v"),
        u,
    ).unionByName(
        price.select(
            "l_returnflag",
            F.lit("y").alias("var"),
            F.col("l_extendedprice").alias("val"),
            F.col(SWEPT_COUNT).alias("n_v"),
            u,
        )
    )


def _spearman_fold(li: DataFrame, ranks: DataFrame | None = None) -> DataFrame:
    """The full pipeline on a (l_returnflag, l_quantity,
    l_extendedprice) frame — split out so tests can feed ENGINEERED
    inputs the fixture never produces (NULLs in either value column:
    the statistic's row universe is rows present in BOTH grains, and
    n_p must be counted in that joined universe, never taken from the
    y-grain — see the in-body comment)."""
    if ranks is None:
        ranks = _doubled_ranks_stacked(
            li, "l_returnflag", "l_quantity", "l_extendedprice"
        )
    xr = ranks.filter(F.col("var") == "x").select(
        "l_returnflag",
        F.col("val").alias("l_quantity"),
        F.col("u").alias("ux"),
    )
    yr = ranks.filter(F.col("var") == "y").select(
        "l_returnflag",
        F.col("val").alias("l_extendedprice"),
        F.col("u").alias("uy"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    # price-grain partial moments of the x-rank (exact integers: count,
    # Σux, Σux² per (flag, price)). n_p is counted HERE, not taken from
    # the y-grain's n_v: the statistic's row universe is rows that
    # inner-join BOTH grains (the oracle's JOIN xr JOIN yr), and a row
    # with a NULL quantity is in the y-grain but not here.
    pg = (
        li.join(xr, ["l_returnflag", "l_quantity"])
        .groupBy("l_returnflag", "l_extendedprice")
        .agg(
            F.count("*").alias("n_p"),
            F.sum(dec(F.col("ux"))).alias("sux"),
            F.sum(dec(F.col("ux")) * dec(F.col("ux"))).alias("suxx"),
        )
    )
    joined = pg.join(yr, ["l_returnflag", "l_extendedprice"])
    npd = dec(F.col("n_p"))
    s = joined.groupBy("l_returnflag").agg(
        F.sum("n_p").alias("n_rows"),
        F.sum(F.col("sux")).alias("su"),
        F.sum(npd * dec(F.col("uy"))).alias("sv"),
        F.sum(F.col("sux") * dec(F.col("uy"))).alias("suv"),
        F.sum(F.col("suxx")).alias("suu"),
        F.sum(npd * dec(F.col("uy")) * dec(F.col("uy"))).alias("svv"),
    )
    n = dec(F.col("n_rows"))
    num = (n * F.col("suv") - F.col("su") * F.col("sv")).cast("double")
    a = (n * F.col("suu") - F.col("su") * F.col("su")).cast("double")
    b = (n * F.col("svv") - F.col("sv") * F.col("sv")).cast("double")
    return s.select(
        "l_returnflag",
        "n_rows",
        _g6(num / (F.sqrt(a) * F.sqrt(b))).alias("spearman_rho"),
    ).orderBy("l_returnflag")


# --------------------------------------------------------------------------
# Kendall tau-b
# --------------------------------------------------------------------------


def q_stats_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between daily event count and daily value sum per
    event type — the concordance test robust to any monotone rescaling.
    Pairs come from the TIME-BOUNDED day grain (never raw events): one
    broadcast self-join of the daily table on (type, d1 < d2), then
    exact integer counts of concordant / discordant / x-tied / y-tied
    pairs fold tau-b = (C−D)/(√(n0−tx)·√(n0−ty)) as a fixed chain of
    correctly-rounded double ops. Cent-grid daily sums make every pair
    comparison integer-exact (rule 6)."""
    daily = _daily(spark, sf_dir)
    a = daily.alias("a")
    b = daily.alias("b")
    pairs = a.join(
        F.broadcast(b),
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.d") < F.col("b.d")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (F.col("b.nd") - F.col("a.nd")).alias("dx"),
        (F.col("b.sd") - F.col("a.sd")).alias("dy"),
    )
    pos = (F.col("dx") > 0) & (F.col("dy") > 0)
    neg = (F.col("dx") < 0) & (F.col("dy") < 0)
    stats = pairs.groupBy("event_type").agg(
        F.count("*").alias("n_pairs"),
        F.sum(F.when(pos | neg, 1).otherwise(0)).alias("concordant"),
        F.sum(
            F.when(
                ((F.col("dx") > 0) & (F.col("dy") < 0))
                | ((F.col("dx") < 0) & (F.col("dy") > 0)),
                1,
            ).otherwise(0)
        ).alias("discordant"),
        F.sum(F.when(F.col("dx") == 0, 1).otherwise(0)).alias("tied_x"),
        F.sum(F.when(F.col("dy") == 0, 1).otherwise(0)).alias("tied_y"),
    )
    ax = (F.col("n_pairs") - F.col("tied_x")).cast("double")
    ay = (F.col("n_pairs") - F.col("tied_y")).cast("double")
    tau = F.when(
        (F.col("n_pairs") > F.col("tied_x"))
        & (F.col("n_pairs") > F.col("tied_y")),
        (F.col("concordant") - F.col("discordant")).cast("double")
        / (F.sqrt(ax) * F.sqrt(ay)),
    )
    return stats.select(
        "event_type",
        "n_pairs",
        "concordant",
        "discordant",
        _g6(tau).alias("tau_b"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# distributed PCA variance spectrum
# --------------------------------------------------------------------------

PCA_DIM = 64  # fixture contract (FIXTURES.md: 64-dim unit-norm)
PCA_TOP = 8
_PCA_SCALE = 1_000_000


def q_embed_pca_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA variance spectrum of the embedding corpus — the whitening /
    dimensionality audit run before choosing a projection (and the
    exact statistic Matryoshka truncation quality depends on). The
    covariance matrix is a MAP-SIDE-COMBINE matrix reduction: each
    Arrow batch quantizes components to the 1e-6 grid and folds ONE
    d×d int64 Gram partial (exact — |q| ≤ 1e6 bounds a 10k-row batch
    at 1e16 « 2^63), plus per-dim sums and a count; the shuffle then
    carries only O(partitions·d²) scalar rows summed as DECIMAL(38,0).
    The 64×64 eigensolve runs driver-side (control-plane sized;
    numpy eigvalsh on an exactly-reproducible integer-derived matrix).
    Rows-only by design — eigendecomposition has no SQL form; the
    numpy referee in tests/test_analytics_r6c.py pins every share.
    Output: top-8 eigenvalue variance shares + cumulative share."""
    import numpy as np
    import pandas as pd

    d = PCA_DIM

    def gram_partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            q = np.floor(x * _PCA_SCALE + 0.5).astype(np.int64)
            g = q.T @ q
            iu, ju = np.triu_indices(d)
            out_i = np.concatenate([iu, np.arange(d), [-1]])
            out_j = np.concatenate([ju, np.full(d, -1), [-1]])
            out_v = np.concatenate(
                [g[iu, ju], q.sum(axis=0), [len(pdf)]]
            )
            yield pd.DataFrame({"i": out_i, "j": out_j, "v": out_v})

    emb = load_table(spark, sf_dir, "embeddings").select("embedding")
    cells = (
        emb.mapInPandas(gram_partials, schema="i long, j long, v long")
        .groupBy("i", "j")
        .agg(F.sum(F.col("v").cast("decimal(38,0)")).alias("v"))
    )
    rows = cells.collect()  # ≤ d(d+1)/2 + d + 1 rows — bounded by schema
    gram = np.zeros((d, d))
    sums = np.zeros(d)
    n = 0
    for r in rows:
        if r["i"] == -1:
            n = int(r["v"])
        elif r["j"] == -1:
            sums[r["i"]] = float(r["v"])
        else:
            gram[r["i"], r["j"]] = gram[r["j"], r["i"]] = float(r["v"])
    if n == 0:  # ADVICE r06: fail loudly, not with a silent 0/0 → NaN table
        raise ValueError(
            "q_embed_pca_var: embeddings table is empty — covariance and "
            "explained-variance shares are undefined"
        )
    mu = sums / n
    cov = gram / n - np.outer(mu, mu)
    evals = np.linalg.eigvalsh(cov)[::-1]
    total = float(evals.sum())
    out = []
    cum = 0.0
    for k in range(PCA_TOP):
        share = float(evals[k]) / total
        cum += share
        out.append(
            (
                k + 1,
                int(n),
                int(d),
                float(np.floor(share * 1e6 + 0.5) / 1e6),
                float(np.floor(cum * 1e6 + 0.5) / 1e6),
            )
        )
    return local_relation(
        spark,
        out,
        "component int, n_vectors int, dim int, "
        "var_share double, cum_share double",
    ).orderBy("component")


# --------------------------------------------------------------------------
# windowFunnel
# --------------------------------------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_WINDOW_US = 72 * 3600 * 1_000_000  # 72 h, integer microseconds


def q_behavior_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse-style windowFunnel(72h): per user, the deepest prefix
    of view → click → purchase completed strictly in order within 72
    hours of the FIRST view. Three conditional-min windows stack over
    ONE user_id hash partitioning (t2 conditions on t1, t3 on t2 —
    Catalyst plans consecutive same-partitioning windows with a single
    exchange) and the per-user rollup reuses that partitioning. Times
    are integer epoch-microseconds (rules 7/11), so every comparison is
    exact. Output: users per depth with the cohort share."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP '1970-01-01 00:00:00', ts)"
        ).alias("us"),
    )
    w = Window.partitionBy("user_id")
    s1, s2, s3 = FUNNEL_STEPS
    t1 = ev.withColumn(
        "t1",
        F.min(F.when(F.col("event_type") == s1, F.col("us"))).over(w),
    )
    t2 = t1.withColumn(
        "t2",
        F.min(
            F.when(
                (F.col("event_type") == s2)
                & (F.col("us") > F.col("t1"))
                & (F.col("us") <= F.col("t1") + FUNNEL_WINDOW_US),
                F.col("us"),
            )
        ).over(w),
    )
    t3 = t2.withColumn(
        "t3",
        F.min(
            F.when(
                (F.col("event_type") == s3)
                & (F.col("us") > F.col("t2"))
                & (F.col("us") <= F.col("t1") + FUNNEL_WINDOW_US),
                F.col("us"),
            )
        ).over(w),
    )
    per_user = t3.groupBy("user_id").agg(
        F.max(
            F.when(F.col("t3").isNotNull(), 3)
            .when(F.col("t2").isNotNull(), 2)
            .when(F.col("t1").isNotNull(), 1)
            .otherwise(0)
        ).alias("depth")
    )
    census = per_user.groupBy("depth").agg(
        F.count("*").alias("n_users")
    )
    tot = Window.partitionBy()  # depth grain: ≤ 4 rows, schema-bounded
    return census.select(
        "depth",
        "n_users",
        _g6(
            F.col("n_users").cast("double")
            / F.sum("n_users").over(tot).cast("double")
        ).alias("user_share"),
    ).orderBy("depth")


# --------------------------------------------------------------------------
# Holt linear exponential smoothing
# --------------------------------------------------------------------------


def q_ts_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt linear (double) exponential smoothing per event type over
    daily cent sums, alpha = beta = 1/2: level and trend after the full
    pass, the one-step forecast, and the mean absolute one-step error.
    A sequential recurrence cannot be windowed, but the day grain is
    TIME-bounded, so this is a deliberate applyInPandas python plan
    (the PLANS.md media-decode class) over ≤ years×366 rows per series.
    Engine parity without a closed form: both sides run the IDENTICAL
    IEEE op sequence — s' = 0.5·(x + (s + b)), b' = 0.5·((s' − s) + b),
    err = x − (s + b) — in day order from the same exact integer cents
    (multiplying by 0.5 is exact; +,− are correctly rounded in the same
    order), and per-step |err| quantizes to the 1e-6 grid BEFORE the
    integer error accumulation (rule 6). The oracle is a recursive CTE
    walking the same numbered day table. Initialization: s₁ = x₁,
    b₁ = 0."""
    import numpy as np
    import pandas as pd

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d")
        x = pdf["sd"].to_numpy().astype(np.float64)
        s = float(x[0])
        b = 0.0
        aem = 0
        for t in range(1, len(x)):
            xt = float(x[t])
            pred = s + b
            err = xt - pred
            aem += int(np.floor(abs(err) * 1_000_000 + 0.5))
            s_new = 0.5 * (xt + (s + b))
            b = 0.5 * ((s_new - s) + b)
            s = s_new
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_days": [len(x)],
                "level_c": [s],
                "trend_c": [b],
                "aem": [aem],
            }
        )

    daily = _daily(spark, sf_dir)
    fitted = daily.groupBy("event_type").applyInPandas(
        holt,
        schema="event_type string, n_days long, level_c double, "
        "trend_c double, aem long",
    )
    return fitted.select(
        "event_type",
        "n_days",
        _g6(F.col("level_c") / 100).alias("level_usd"),
        _g6(F.col("trend_c") / 100).alias("trend_usd"),
        _g6((F.col("level_c") + F.col("trend_c")) / 100).alias(
            "forecast_usd"
        ),
        F.when(
            F.col("n_days") > 1,
            _g6(
                F.col("aem").cast("double")
                / (F.col("n_days") - 1).cast("double")
                / 1_000_000
                / 100
            ),
        ).alias("mae_usd"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# SQL named WINDOW clause
# --------------------------------------------------------------------------


def q_sql_named_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL WINDOW-clause surface: two NAMED window specs over the same
    o_custkey partitioning (a data-scaled key — task count grows with
    customers, no enum or global sort), shared by three window
    functions — price rank, running cent spend in order-date order, and
    days since the previous order. Inputs are exact integers (cent
    grid, epoch days), the rank tiebreaks on the unique key, and the
    final filter keeps each customer's top-2 priciest orders."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "zds_nw_orders"
    )
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey, price_rank, cum_cents, gap_days
        FROM (
            SELECT o_custkey, o_orderkey,
                   row_number() OVER w_price AS price_rank,
                   sum(cents)   OVER w_time  AS cum_cents,
                   coalesce(od - lag(od) OVER w_time, -1) AS gap_days
            FROM (
                SELECT o_custkey, o_orderkey,
                       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                           AS cents,
                       CAST(datediff(CAST(o_orderdate AS DATE),
                                     DATE '1970-01-01') AS BIGINT) AS od
                FROM zds_nw_orders
            )
            WINDOW w_price AS (PARTITION BY o_custkey
                               ORDER BY cents DESC, o_orderkey),
                   w_time  AS (PARTITION BY o_custkey
                               ORDER BY od, o_orderkey)
        )
        WHERE price_rank <= 2
        ORDER BY o_custkey, price_rank
        """
    )


QUERIES = {
    "q_stats_spearman": q_stats_spearman,
    "q_stats_kendall": q_stats_kendall,
    "q_embed_pca_var": q_embed_pca_var,
    "q_behavior_window_funnel": q_behavior_window_funnel,
    "q_ts_holt": q_ts_holt,
    "q_sql_named_window": q_sql_named_window,
}


_XRANK = _RANK_SQL.format(val="l_quantity", out="ux")
_YRANK = _RANK_SQL.format(val="l_extendedprice", out="uy")

_FUNNEL_SQL = f"""
        WITH e AS (
            SELECT user_id, event_type,
                   date_diff('microsecond', TIMESTAMP '1970-01-01',
                             ts)::BIGINT AS us
            FROM events
        ),
        s1 AS (
            SELECT user_id,
                   min(CASE WHEN event_type = '{FUNNEL_STEPS[0]}'
                            THEN us END) AS t1
            FROM e GROUP BY user_id
        ),
        s2 AS (
            SELECT e.user_id,
                   min(CASE WHEN event_type = '{FUNNEL_STEPS[1]}'
                            AND us > t1
                            AND us <= t1 + {FUNNEL_WINDOW_US}
                            THEN us END) AS t2
            FROM e JOIN s1 ON e.user_id = s1.user_id
            GROUP BY e.user_id
        ),
        s3 AS (
            SELECT e.user_id,
                   min(CASE WHEN event_type = '{FUNNEL_STEPS[2]}'
                            AND us > t2
                            AND us <= t1 + {FUNNEL_WINDOW_US}
                            THEN us END) AS t3
            FROM e
            JOIN s1 ON e.user_id = s1.user_id
            JOIN s2 ON e.user_id = s2.user_id
            GROUP BY e.user_id
        ),
        depths AS (
            SELECT s1.user_id,
                   CASE WHEN t3 IS NOT NULL THEN 3
                        WHEN t2 IS NOT NULL THEN 2
                        WHEN t1 IS NOT NULL THEN 1
                        ELSE 0 END AS depth
            FROM s1
            JOIN s2 ON s1.user_id = s2.user_id
            JOIN s3 ON s1.user_id = s3.user_id
        ),
        census AS (
            SELECT depth, count(*)::BIGINT AS n_users
            FROM depths GROUP BY depth
        )
        SELECT depth, n_users,
               {_G6_SQL.format(
                   x="n_users::DOUBLE / sum(n_users) OVER ()::DOUBLE"
               )} AS user_share
        FROM census
        ORDER BY depth
"""


ORACLE = {
    "q_stats_spearman": f"""
        WITH xr AS ({_XRANK}),
        yr AS ({_YRANK}),
        r AS (
            SELECT l.l_returnflag,
                   xr.ux::HUGEINT AS ux, yr.uy::HUGEINT AS uy
            FROM lineitem l
            JOIN xr ON l.l_returnflag = xr.l_returnflag
                   AND l.l_quantity = xr.v
            JOIN yr ON l.l_returnflag = yr.l_returnflag
                   AND l.l_extendedprice = yr.v
        ),
        s AS (
            SELECT l_returnflag, count(*)::HUGEINT AS n,
                   sum(ux) AS su, sum(uy) AS sv,
                   sum(ux * uy) AS suv,
                   sum(ux * ux) AS suu,
                   sum(uy * uy) AS svv
            FROM r GROUP BY l_returnflag
        )
        SELECT l_returnflag, n::BIGINT AS n_rows,
               {_G6_SQL.format(
                   x="(n * suv - su * sv)::DOUBLE"
                   " / (sqrt((n * suu - su * su)::DOUBLE)"
                   " * sqrt((n * svv - sv * sv)::DOUBLE))"
               )} AS spearman_rho
        FROM s ORDER BY l_returnflag
    """,
    "q_stats_kendall": f"""
        WITH daily AS ({_DAILY_SQL}),
        pairs AS (
            SELECT a.event_type,
                   b.nd - a.nd AS dx, b.sd - a.sd AS dy
            FROM daily a JOIN daily b
              ON a.event_type = b.event_type AND a.d < b.d
        ),
        s AS (
            SELECT event_type,
                   count(*)::BIGINT AS n_pairs,
                   sum(CASE WHEN (dx > 0 AND dy > 0)
                              OR (dx < 0 AND dy < 0)
                            THEN 1 ELSE 0 END)::BIGINT AS concordant,
                   sum(CASE WHEN (dx > 0 AND dy < 0)
                              OR (dx < 0 AND dy > 0)
                            THEN 1 ELSE 0 END)::BIGINT AS discordant,
                   sum(CASE WHEN dx = 0 THEN 1 ELSE 0 END)::BIGINT
                       AS tied_x,
                   sum(CASE WHEN dy = 0 THEN 1 ELSE 0 END)::BIGINT
                       AS tied_y
            FROM pairs GROUP BY event_type
        )
        SELECT event_type, n_pairs, concordant, discordant,
               CASE WHEN n_pairs > tied_x AND n_pairs > tied_y THEN
                   {_G6_SQL.format(
                       x="(concordant - discordant)::DOUBLE"
                       " / (sqrt((n_pairs - tied_x)::DOUBLE)"
                       " * sqrt((n_pairs - tied_y)::DOUBLE))"
                   )}
               END AS tau_b
        FROM s ORDER BY event_type
    """,
    "q_behavior_window_funnel": _FUNNEL_SQL,
    "q_ts_holt": f"""
        WITH RECURSIVE daily AS ({_DAILY_SQL}),
        numbered AS (
            SELECT event_type, sd,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY d) AS rn
            FROM daily
        ),
        rec AS (
            SELECT event_type, rn,
                   sd::DOUBLE AS s, 0.0::DOUBLE AS b, 0::HUGEINT AS aem
            FROM numbered WHERE rn = 1
            UNION ALL
            SELECT n.event_type, n.rn,
                   0.5 * (n.sd::DOUBLE + (r.s + r.b)) AS s,
                   0.5 * ((0.5 * (n.sd::DOUBLE + (r.s + r.b)) - r.s)
                          + r.b) AS b,
                   r.aem + CAST(floor(
                       abs(n.sd::DOUBLE - (r.s + r.b)) * 1000000 + 0.5
                   ) AS HUGEINT) AS aem
            FROM rec r
            JOIN numbered n
              ON n.event_type = r.event_type AND n.rn = r.rn + 1
        ),
        final AS (
            SELECT event_type, rn AS n_days, s, b, aem,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY rn DESC) AS rev
            FROM rec
        )
        SELECT event_type, n_days::BIGINT AS n_days,
               {_G6_SQL.format(x="s / 100")} AS level_usd,
               {_G6_SQL.format(x="b / 100")} AS trend_usd,
               {_G6_SQL.format(x="(s + b) / 100")} AS forecast_usd,
               CASE WHEN n_days > 1 THEN
                   {_G6_SQL.format(
                       x="aem::DOUBLE / (n_days - 1)::DOUBLE"
                       " / 1000000 / 100"
                   )}
               END AS mae_usd
        FROM final WHERE rev = 1
        ORDER BY event_type
    """,
    "q_sql_named_window": """
        SELECT o_custkey, o_orderkey, price_rank, cum_cents, gap_days
        FROM (
            SELECT o_custkey, o_orderkey,
                   row_number() OVER w_price AS price_rank,
                   CAST(sum(cents) OVER w_time AS BIGINT) AS cum_cents,
                   coalesce(od - lag(od) OVER w_time, -1) AS gap_days
            FROM (
                SELECT o_custkey, o_orderkey,
                       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                           AS cents,
                       date_diff('day', DATE '1970-01-01',
                                 CAST(o_orderdate AS DATE))::BIGINT AS od
                FROM orders
            )
            WINDOW w_price AS (PARTITION BY o_custkey
                               ORDER BY cents DESC, o_orderkey),
                   w_time  AS (PARTITION BY o_custkey
                               ORDER BY od, o_orderkey)
        )
        WHERE price_rank <= 2
        ORDER BY o_custkey, price_rank
    """,
}
