"""Round-6 fourth wave (SURVEY.md §2.23): IGNORE-NULLS window surface,
an l-diversity privacy audit, a seasonal-naive forecast backtest, and
kNN-distance outlier scoring over the embedding corpus.

(Module named _r6d2 because operators/analytics_r5d.py already owns the
"d" suffix of the earlier naming scheme.)

Determinism (FIXTURES.md cookbook): window values ride the cent grid
(rule 6) with integer-µs/epoch-day orderings (rules 7/11); forecast
errors accumulate as exact integer cents with ONE final division (rule
8); the outlier score is a single correctly-rounded division of exact
micro-cosine integers so its descending order is engine-identical
(rule 8's rank rule); model-comparison verdicts compare exact integer
sums, never rounded doubles.

Scale notes (100 TB):
- q_window_ignore_nulls partitions by user_id (data-scaled key — task
  count grows with users); the three IGNORE-NULLS functions share one
  ordering so Catalyst plans a single exchange.
- q_privacy_l_diversity is one partial-agg groupBy on the QI tuple plus
  a bounded rollup — the q_privacy_k_anon shape with a second distinct
  aggregate.
- q_ts_seasonal_naive_eval joins the TIME-bounded day grain to itself
  at lag-1 and lag-7 (explicit calendar joins, no window at all);
  everything after the one fact-table fold is grain-sized.
- q_embed_outlier_knn reuses the sign-bit LSH blocking (equi-join on
  bucket, never all-pairs); per-vector top-k is a row_number inside the
  data-scaled vec_id partitioning, and the final top-20 is a
  TakeOrdered heap, not a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zonal_datacube_spark.operators.analytics_r6b import (
    _DAILY_SQL,
    _G6_SQL,
    _daily,
    _g6,
)
from zonal_datacube_spark.sources.loader import load_table


# --------------------------------------------------------------------------
# IGNORE NULLS window surface
# --------------------------------------------------------------------------


# identical semantics, two spellings: Spark parses IGNORE NULLS after
# the call parens, DuckDB inside them — the ONLY divergence between the
# engines here, so the body is a template over that token position
_IGNORE_NULLS_TEMPLATE = """
        SELECT event_id, user_id,
               coalesce(last_value(purchase_cents{inner}){outer} OVER (
                   PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), -1) AS prev_purchase_cents,
               coalesce(first_value(error_cents{inner}){outer} OVER (
                   PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
               ), -1) AS next_error_cents,
               coalesce(nth_value(purchase_cents, 2{inner}){outer} OVER (
                   PARTITION BY user_id ORDER BY us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ), -1) AS second_purchase_cents
        FROM base
        ORDER BY event_id
"""

_IGNORE_NULLS_BODY = _IGNORE_NULLS_TEMPLATE.format(
    inner="", outer=" IGNORE NULLS"
)
_IGNORE_NULLS_BODY_DUCK = _IGNORE_NULLS_TEMPLATE.format(
    inner=" IGNORE NULLS", outer=""
)


def q_window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window-function surface (ANSI null treatment):
    last_value / first_value / nth_value IGNORE NULLS carry the nearest
    non-null purchase/error amount across each user's event stream —
    the idiom behind 'attribute every event to the preceding purchase'
    without a LOCF self-join. All three functions share ONE user_id
    ordering (single exchange; user_id is a data-scaled key), values
    ride the cent grid and the order key is integer microseconds, so
    both engines emit identical integers."""
    load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP '1970-01-01 00:00:00', ts)"
        ).alias("us"),
        F.when(
            F.col("event_type") == "purchase",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"),
        ).alias("purchase_cents"),
        F.when(
            F.col("event_type") == "error",
            F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"),
        ).alias("error_cents"),
    ).createOrReplaceTempView("base")
    return spark.sql(_IGNORE_NULLS_BODY)


# --------------------------------------------------------------------------
# l-diversity
# --------------------------------------------------------------------------

L_DIVERSITY_L = 3


def q_privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala 2007) of the customer table:
    quasi-identifier = (nation, account-balance kilo-band), sensitive
    attribute = market segment. k-anonymity alone leaves a class
    re-identifiable when every member SHARES the sensitive value; this
    reports how many equivalence classes carry fewer than l=3 distinct
    segments and what share of rows sit in them. One groupBy on the QI
    with a count-distinct, then a bounded rollup — all exact integers
    until the one display division."""
    cust = load_table(spark, sf_dir, "customer")
    classes = cust.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
    ).agg(
        F.count("*").alias("s"),
        F.count_distinct("c_mktsegment").alias("l"),
    )
    low = F.col("l") < L_DIVERSITY_L
    return classes.agg(
        F.sum("s").alias("n_rows"),
        F.count("*").alias("n_classes"),
        F.min("l").alias("min_l"),
        F.sum(low.cast("bigint")).alias("n_classes_low_l"),
        F.sum(F.when(low, F.col("s")).otherwise(0)).alias("n_rows_low_l"),
    ).select(
        "n_rows",
        "n_classes",
        "min_l",
        "n_classes_low_l",
        "n_rows_low_l",
        _g6(
            F.col("n_rows_low_l").cast("double")
            / F.col("n_rows").cast("double")
        ).alias("low_l_row_share"),
    )


# --------------------------------------------------------------------------
# seasonal-naive forecast backtest
# --------------------------------------------------------------------------


def q_ts_seasonal_naive_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtest per event type: seasonal-naive (ŷ_t = y_{t−7})
    vs naive (ŷ_t = y_{t−1}) on daily cent sums — the baseline duel
    every forecasting pipeline runs before anything fancier (and the
    honesty check for q_ts_holt). Lags are explicit CALENDAR self-joins
    of the bounded day grain (a missing day yields no pair, exactly the
    semantics lag-by-rows would get wrong); only days where BOTH
    forecasts exist score, so the comparison is paired. Absolute errors
    accumulate as exact integer cents and the winner verdict compares
    those integer sums — no rounded double ever feeds the decision."""
    daily = _daily(spark, sf_dir)
    cur = daily.select("event_type", "d", F.col("sd").alias("y"))
    l1 = daily.select(
        "event_type", (F.col("d") + 1).alias("d"), F.col("sd").alias("y1")
    )
    l7 = daily.select(
        "event_type", (F.col("d") + 7).alias("d"), F.col("sd").alias("y7")
    )
    paired = cur.join(l1, ["event_type", "d"]).join(l7, ["event_type", "d"])
    scored = paired.groupBy("event_type").agg(
        F.count("*").alias("n_eval_days"),
        F.sum(F.abs(F.col("y") - F.col("y1"))).alias("ae1"),
        F.sum(F.abs(F.col("y") - F.col("y7"))).alias("ae7"),
    )
    return scored.select(
        "event_type",
        "n_eval_days",
        _g6(
            F.col("ae1").cast("double")
            / F.col("n_eval_days").cast("double")
            / 100
        ).alias("mae_naive_usd"),
        _g6(
            F.col("ae7").cast("double")
            / F.col("n_eval_days").cast("double")
            / 100
        ).alias("mae_seasonal_usd"),
        F.when(F.col("ae7") < F.col("ae1"), F.lit("seasonal_naive"))
        .when(F.col("ae1") < F.col("ae7"), F.lit("naive"))
        .otherwise(F.lit("tie"))
        .alias("better_model"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# kNN-distance outlier scoring
# --------------------------------------------------------------------------

OUTLIER_K = 3
OUTLIER_TOP = 20


def q_embed_outlier_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN-distance outlier scoring — the embedding-space data-quality
    screen (vectors far from everything are mislabeled, corrupt, or
    novel; corpus-cleaning pipelines drop or re-queue them). Candidates
    come from the same sign-bit LSH blocking the dedup/ANN tier uses
    (equi-join on bucket — never all-pairs); each vector keeps its k=3
    nearest candidates by integer micro-cosine (row_number inside the
    data-scaled vec_id partitioning), the score is ONE division of
    exact integers (mean 1−cos distance, rule 8 — its descending order
    is engine-identical), and the global top-20 is a TakeOrdered heap.
    Vectors alone in their bucket have no candidates and drop out (a
    production tier routes those to the exact fallback)."""
    from zonal_datacube_spark.operators.similarity import (
        _dot,
        _sign_bucket,
    )

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", _sign_bucket("embedding")
    )
    other = emb.select(
        F.col("vec_id").alias("other_id"),
        F.col("embedding").alias("other_vec"),
        F.col("bucket").alias("other_bucket"),
    )
    pairs = emb.join(
        other, F.col("bucket") == F.col("other_bucket")
    ).filter(F.col("vec_id") != F.col("other_id"))
    sims = pairs.select(
        "vec_id",
        "label",
        "other_id",
        F.floor(
            F.round(_dot("embedding", "other_vec"), 6) * 1_000_000
            + F.lit(0.5)
        )
        .cast("bigint")
        .alias("sim_micro"),
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("sim_micro").desc(), F.col("other_id").asc()
    )
    knn = sims.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= OUTLIER_K
    )
    scored = knn.groupBy("vec_id", "label").agg(
        F.count("*").alias("n_neighbors"),
        F.sum(F.lit(1_000_000) - F.col("sim_micro")).alias("dist_sum"),
    )
    score = F.col("dist_sum").cast("double") / (
        F.col("n_neighbors") * 1_000_000
    ).cast("double")
    return (
        scored.select(
            "vec_id",
            "label",
            "n_neighbors",
            _g6(score).alias("mean_knn_dist"),
        )
        .orderBy(F.col("mean_knn_dist").desc(), F.col("vec_id").asc())
        .limit(OUTLIER_TOP)
    )


QUERIES = {
    "q_window_ignore_nulls": q_window_ignore_nulls,
    "q_privacy_l_diversity": q_privacy_l_diversity,
    "q_ts_seasonal_naive_eval": q_ts_seasonal_naive_eval,
    "q_embed_outlier_knn": q_embed_outlier_knn,
}


def _outlier_oracle() -> str:
    from zonal_datacube_spark.operators.similarity import _BUCKET_SQL

    return f"""
        WITH e AS (
            SELECT vec_id, label, embedding::DOUBLE[] AS v,
                   ({_BUCKET_SQL})::BIGINT AS bucket
            FROM embeddings
        ),
        sims AS (
            SELECT a.vec_id, a.label, b.vec_id AS other_id,
                   CAST(floor(
                       round(list_inner_product(a.v, b.v), 6) * 1000000
                       + 0.5
                   ) AS BIGINT) AS sim_micro
            FROM e a JOIN e b
              ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
        ),
        knn AS (
            SELECT vec_id, label, sim_micro,
                   row_number() OVER (
                       PARTITION BY vec_id
                       ORDER BY sim_micro DESC, other_id ASC
                   ) AS rn
            FROM sims
            QUALIFY rn <= {OUTLIER_K}
        ),
        scored AS (
            SELECT vec_id, label,
                   count(*)::BIGINT AS n_neighbors,
                   sum(1000000 - sim_micro)::BIGINT AS dist_sum
            FROM knn GROUP BY vec_id, label
        )
        SELECT vec_id, label, n_neighbors,
               {_G6_SQL.format(
                   x="dist_sum::DOUBLE / (n_neighbors * 1000000)::DOUBLE"
               )} AS mean_knn_dist
        FROM scored
        ORDER BY mean_knn_dist DESC, vec_id ASC
        LIMIT {OUTLIER_TOP}
    """


ORACLE = {
    "q_window_ignore_nulls": f"""
        WITH base AS (
            SELECT event_id, user_id,
                   date_diff('microsecond', TIMESTAMP '1970-01-01',
                             ts)::BIGINT AS us,
                   CASE WHEN event_type = 'purchase' THEN
                       CAST(floor(value * 100 + 0.5) AS BIGINT)
                   END AS purchase_cents,
                   CASE WHEN event_type = 'error' THEN
                       CAST(floor(value * 100 + 0.5) AS BIGINT)
                   END AS error_cents
            FROM events
        )
        {_IGNORE_NULLS_BODY_DUCK}
    """,
    "q_privacy_l_diversity": f"""
        WITH classes AS (
            SELECT c_nationkey,
                   CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
                   count(*)::BIGINT AS s,
                   count(DISTINCT c_mktsegment)::BIGINT AS l
            FROM customer GROUP BY 1, 2
        )
        SELECT sum(s)::BIGINT AS n_rows,
               count(*)::BIGINT AS n_classes,
               min(l)::BIGINT AS min_l,
               sum(CASE WHEN l < {L_DIVERSITY_L} THEN 1 ELSE 0 END)::BIGINT
                   AS n_classes_low_l,
               sum(CASE WHEN l < {L_DIVERSITY_L} THEN s ELSE 0 END)::BIGINT
                   AS n_rows_low_l,
               {_G6_SQL.format(
                   x=f"sum(CASE WHEN l < {L_DIVERSITY_L} THEN s ELSE 0 "
                   "END)::DOUBLE / sum(s)::DOUBLE"
               )} AS low_l_row_share
        FROM classes
    """,
    "q_ts_seasonal_naive_eval": f"""
        WITH daily AS ({_DAILY_SQL}),
        paired AS (
            SELECT c.event_type, c.sd AS y, l1.sd AS y1, l7.sd AS y7
            FROM daily c
            JOIN daily l1 ON l1.event_type = c.event_type
                         AND l1.d = c.d - 1
            JOIN daily l7 ON l7.event_type = c.event_type
                         AND l7.d = c.d - 7
        ),
        scored AS (
            SELECT event_type,
                   count(*)::BIGINT AS n_eval_days,
                   sum(abs(y - y1))::BIGINT AS ae1,
                   sum(abs(y - y7))::BIGINT AS ae7
            FROM paired GROUP BY event_type
        )
        SELECT event_type, n_eval_days,
               {_G6_SQL.format(
                   x="ae1::DOUBLE / n_eval_days::DOUBLE / 100"
               )} AS mae_naive_usd,
               {_G6_SQL.format(
                   x="ae7::DOUBLE / n_eval_days::DOUBLE / 100"
               )} AS mae_seasonal_usd,
               CASE WHEN ae7 < ae1 THEN 'seasonal_naive'
                    WHEN ae1 < ae7 THEN 'naive'
                    ELSE 'tie' END AS better_model
        FROM scored ORDER BY event_type
    """,
}

ORACLE["q_embed_outlier_knn"] = _outlier_oracle()
