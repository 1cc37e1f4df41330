"""Round-6 eighth wave (SURVEY.md §2.27): a multi-horizon forecast
backtest, Jensen–Shannon divergence between language unigram
distributions, and Bollinger-band breakout detection with exact
integer band tests.

Determinism (FIXTURES.md cookbook): the backtest is integer cents end
to end (rule 6); JS divergence derives every probability as a single
division of exact integer counts, evaluates the identical ln-expression
shape in both engines, and quantizes each term to a 1e-9 grid integer
BEFORE the cross-vocabulary sum (rule 6 — no float reassociation
crosses an aggregation); the Bollinger breakout predicate is evaluated
in pure integer algebra — |x−μ|>2σ ⟺ (x·n−Σx)² > 4·(nΣx²−(Σx)²) — so
no rounded double ever feeds a count (rule 8), with the squared
products on DECIMAL(38,0)/HUGEINT (rule 12).

Scale notes (100 TB):
- q_ts_horizon_backtest folds the fact table onto the TIME-bounded day
  grain once, broadcast-joins a 4-row horizon table, and lag-joins the
  grain to itself by explicit calendar arithmetic — everything after
  the one fold is grain-sized.
- q_text_js_divergence is two groupBys (language-term counts, language
  totals) and a vocabulary-grain join; the divergence fold sums
  quantized integers, so vocabulary growth only widens a partial-agg.
- q_ts_bollinger windows the bounded day grain per event type (the
  changepoint/STL class) with a trailing 7-day frame.
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
from zonal_datacube_spark.functions.local_rel import local_relation


# --------------------------------------------------------------------------
# multi-horizon backtest
# --------------------------------------------------------------------------

HORIZONS = (1, 3, 7, 14)


def q_ts_horizon_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-horizon naive-forecast backtest per event type: MAE of
    ŷ_t = y_{t−h} for h ∈ {1, 3, 7, 14} days — the error-vs-horizon
    curve that tells a capacity planner how far ahead the naive
    baseline stays usable (and what any model must beat at each
    horizon). ONE broadcast join against the 4-row horizon table plus
    one calendar self-join of the bounded day grain; absolute errors
    accumulate as exact integer cents with a single display division."""
    daily = _daily(spark, sf_dir)
    horizons = F.broadcast(
        local_relation(
            spark, [(h,) for h in HORIZONS], "horizon_days int"
        )
    )
    cur = daily.select("event_type", "d", F.col("sd").alias("y"))
    lag = daily.select(
        "event_type", F.col("d").alias("d_lag"), F.col("sd").alias("y_lag")
    )
    paired = (
        cur.crossJoin(horizons)
        .join(
            lag,
            (cur.event_type == lag.event_type)
            & (F.col("d") - F.col("horizon_days") == F.col("d_lag")),
        )
        .select(
            cur.event_type.alias("event_type"), "horizon_days", "y", "y_lag"
        )
    )
    return (
        paired.groupBy("event_type", "horizon_days")
        .agg(
            F.count("*").alias("n_eval_days"),
            F.sum(F.abs(F.col("y") - F.col("y_lag"))).alias("abs_err"),
        )
        .select(
            "event_type",
            "horizon_days",
            "n_eval_days",
            _g6(
                F.col("abs_err").cast("double")
                / F.col("n_eval_days").cast("double")
                / 100
            ).alias("mae_usd"),
        )
        .orderBy("event_type", "horizon_days")
    )


# --------------------------------------------------------------------------
# Jensen–Shannon divergence between language distributions
# --------------------------------------------------------------------------

JS_LANGS = ("en", "de", "fr", "es", "zh")
_JS_GRID = 1_000_000_000  # 1e-9 grid for per-term contributions


def q_text_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence between every language pair's unigram
    token distribution — the symmetric, bounded distribution-shift
    metric a multilingual corpus pipeline monitors when mixing sources.
    Probabilities are single divisions of exact integer counts
    (term count / language total), each pairwise term
    p·ln(p/m) + q·ln(q/m) with m=(p+q)/2 is the IDENTICAL expression
    shape in both engines (absent terms contribute with p=0 via the
    one-sided limit q·ln(2)), and every term quantizes to a 1e-9 grid
    integer before the vocabulary-grain sum. Output: JS (nats, halved
    to the standard [0, ln 2] range) per unordered language pair."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "lang", F.explode(F.split(F.lower("text"), " ")).alias("tok")
    )
    counts = toks.groupBy("lang", "tok").agg(F.count("*").alias("c"))
    totals = toks.groupBy("lang").agg(F.count("*").alias("t"))
    wc = counts.join(F.broadcast(totals), "lang").select(
        "lang", "tok", (F.col("c").cast("double") / F.col("t").cast("double")).alias("p")
    )
    a = wc.select(
        F.col("lang").alias("lang_a"), "tok", F.col("p").alias("pa")
    )
    b = wc.select(
        F.col("lang").alias("lang_b"), "tok", F.col("p").alias("pb")
    )
    pairs = a.join(b, "tok").filter(F.col("lang_a") < F.col("lang_b"))
    # full outer union of supports: a term absent from one language
    # contributes p·ln(2) from the present side only. Model it by
    # computing per-(pair, tok) contributions for the JOINED support,
    # then adding each language's leftover mass via the totals of
    # joined probabilities (Σ p over shared support), since
    # Σ_absent p·ln(2) = (1 − Σ_shared p)·ln(2).
    m = (F.col("pa") + F.col("pb")) / 2
    term = (
        F.col("pa") * F.log(F.col("pa") / m)
        + F.col("pb") * F.log(F.col("pb") / m)
    )
    shared = pairs.select(
        "lang_a",
        "lang_b",
        F.floor(term * _JS_GRID + F.lit(0.5)).cast("bigint").alias("tq"),
        F.floor(F.col("pa") * _JS_GRID + F.lit(0.5))
        .cast("bigint")
        .alias("paq"),
        F.floor(F.col("pb") * _JS_GRID + F.lit(0.5))
        .cast("bigint")
        .alias("pbq"),
    )
    agg = shared.groupBy("lang_a", "lang_b").agg(
        F.count("*").alias("n_shared_terms"),
        F.sum("tq").alias("sum_tq"),
        F.sum("paq").alias("sum_paq"),
        F.sum("pbq").alias("sum_pbq"),
    )
    ln2 = 0.6931471805599453
    js = (
        F.col("sum_tq").cast("double") / _JS_GRID
        + (
            F.lit(2 * _JS_GRID)
            - F.col("sum_paq")
            - F.col("sum_pbq")
        ).cast("double")
        / _JS_GRID
        * ln2
    ) / 2
    return agg.select(
        "lang_a",
        "lang_b",
        "n_shared_terms",
        _g6(js).alias("js_divergence"),
    ).orderBy("lang_a", "lang_b")


# --------------------------------------------------------------------------
# Bollinger breakouts
# --------------------------------------------------------------------------

BOLL_WINDOW = 7
BOLL_MIN_N = 4


def q_ts_bollinger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger-band breakout census per event type: a day breaks out
    when its cent total sits more than 2 trailing standard deviations
    from the trailing 7-day mean (band from the PRIOR days only — the
    day never smooths itself). The band test runs in pure integer
    algebra — |x−μ|>2σ ⟺ (x·n−Σx)² > 4·(n·Σx²−(Σx)²) with the squared
    products on DECIMAL(38,0)/HUGEINT — so the breakout counts are
    engine-exact with NO rounded double in the predicate. Windows ride
    the bounded day grain (the changepoint/STL class)."""
    daily = _daily(spark, sf_dir)
    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(-BOLL_WINDOW, -1)
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    framed = daily.select(
        "event_type",
        "d",
        F.col("sd").alias("x"),
        F.count("*").over(w).alias("n"),
        F.sum("sd").over(w).alias("sx"),
        F.sum(dec(F.col("sd")) * dec(F.col("sd"))).over(w).alias("sxx"),
    ).filter(F.col("n") >= BOLL_MIN_N)
    lhs = dec(F.col("x")) * dec(F.col("n")) - dec(F.col("sx"))
    rhs = 4 * (
        dec(F.col("n")) * F.col("sxx")
        - dec(F.col("sx")) * dec(F.col("sx"))
    )
    scored = framed.select(
        "event_type",
        (lhs * lhs > rhs).alias("breakout"),
        (lhs > 0).alias("is_up"),
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.count("*").alias("n_days_scored"),
            F.sum(
                F.when(F.col("breakout") & F.col("is_up"), 1).otherwise(0)
            ).alias("n_breakouts_up"),
            F.sum(
                F.when(F.col("breakout") & ~F.col("is_up"), 1).otherwise(
                    0
                )
            ).alias("n_breakouts_down"),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "q_ts_horizon_backtest": q_ts_horizon_backtest,
    "q_text_js_divergence": q_text_js_divergence,
    "q_ts_bollinger": q_ts_bollinger,
}


_HORIZONS_SQL = ", ".join(f"({h})" for h in HORIZONS)


ORACLE = {
    "q_ts_horizon_backtest": f"""
        WITH daily AS ({_DAILY_SQL}),
        horizons(horizon_days) AS (VALUES {_HORIZONS_SQL}),
        paired AS (
            SELECT c.event_type, h.horizon_days,
                   c.sd AS y, l.sd AS y_lag
            FROM daily c
            CROSS JOIN horizons h
            JOIN daily l ON l.event_type = c.event_type
                        AND l.d = c.d - h.horizon_days
        )
        SELECT event_type, horizon_days,
               count(*)::BIGINT AS n_eval_days,
               {_G6_SQL.format(
                   x="sum(abs(y - y_lag))::DOUBLE / count(*)::DOUBLE / 100"
               )} AS mae_usd
        FROM paired GROUP BY event_type, horizon_days
        ORDER BY event_type, horizon_days
    """,
    "q_text_js_divergence": f"""
        WITH toks AS (
            SELECT lang, unnest(string_split(lower(text), ' ')) AS tok
            FROM documents
        ),
        counts AS (
            SELECT lang, tok, count(*)::BIGINT AS c
            FROM toks GROUP BY lang, tok
        ),
        totals AS (
            SELECT lang, count(*)::BIGINT AS t FROM toks GROUP BY lang
        ),
        wc AS (
            SELECT c.lang, c.tok, c.c::DOUBLE / t.t::DOUBLE AS p
            FROM counts c JOIN totals t ON c.lang = t.lang
        ),
        pairs AS (
            SELECT a.lang AS lang_a, b.lang AS lang_b,
                   a.p AS pa, b.p AS pb
            FROM wc a JOIN wc b ON a.tok = b.tok AND a.lang < b.lang
        ),
        shared AS (
            SELECT lang_a, lang_b,
                   CAST(floor(
                       (pa * ln(pa / ((pa + pb) / 2))
                        + pb * ln(pb / ((pa + pb) / 2)))
                       * {_JS_GRID} + 0.5
                   ) AS BIGINT) AS tq,
                   CAST(floor(pa * {_JS_GRID} + 0.5) AS BIGINT) AS paq,
                   CAST(floor(pb * {_JS_GRID} + 0.5) AS BIGINT) AS pbq
            FROM pairs
        ),
        agg AS (
            SELECT lang_a, lang_b,
                   count(*)::BIGINT AS n_shared_terms,
                   sum(tq)::BIGINT AS sum_tq,
                   sum(paq)::BIGINT AS sum_paq,
                   sum(pbq)::BIGINT AS sum_pbq
            FROM shared GROUP BY lang_a, lang_b
        )
        SELECT lang_a, lang_b, n_shared_terms,
               {_G6_SQL.format(
                   x=f"(sum_tq::DOUBLE / {_JS_GRID}"
                   f" + (2 * {_JS_GRID} - sum_paq - sum_pbq)::DOUBLE"
                   f" / {_JS_GRID} * 0.6931471805599453) / 2"
               )} AS js_divergence
        FROM agg ORDER BY lang_a, lang_b
    """,
    "q_ts_bollinger": f"""
        WITH daily AS ({_DAILY_SQL}),
        framed AS (
            SELECT event_type, d, sd AS x,
                   count(*) OVER w AS n,
                   sum(sd) OVER w AS sx,
                   sum(sd::HUGEINT * sd::HUGEINT) OVER w AS sxx
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY d
                         ROWS BETWEEN {BOLL_WINDOW} PRECEDING
                         AND 1 PRECEDING)
        ),
        scored AS (
            SELECT event_type,
                   (x::HUGEINT * n - sx) AS lhs,
                   4 * (n::HUGEINT * sxx - sx::HUGEINT * sx::HUGEINT)
                       AS rhs
            FROM framed WHERE n >= {BOLL_MIN_N}
        )
        SELECT event_type,
               count(*)::BIGINT AS n_days_scored,
               sum(CASE WHEN lhs * lhs > rhs AND lhs > 0
                        THEN 1 ELSE 0 END)::BIGINT AS n_breakouts_up,
               sum(CASE WHEN lhs * lhs > rhs AND lhs <= 0
                        THEN 1 ELSE 0 END)::BIGINT AS n_breakouts_down
        FROM scored GROUP BY event_type ORDER BY event_type
    """,
}
