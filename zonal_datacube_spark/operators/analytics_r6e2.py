"""Round-6 fifth wave (SURVEY.md §2.24): as-of join with a match
tolerance, an approximate-sketch error eval, and RAKE-lite keyword
extraction.

(Module named _r6e2 because operators/analytics_r5e.py owns the "e"
suffix of the earlier naming scheme.)

Determinism (FIXTURES.md cookbook): as-of lags are integer
microseconds end to end (rules 7/11); RAKE scores are ONE division of
exact integer degree/frequency counts, so the (score, token) ranking
is engine-identical (rule 8); the sketch eval is rows-only by design —
HLL/KLL estimates are engine-specific — with the exact side pinned
against pandas and the estimates pinned for cross-run determinism in
tests/test_analytics_r6e2.py.

Scale notes (100 TB):
- q_join_asof_tolerance is q_join_asof's single-pass window carry (one
  user_id shuffle, no self-join) plus an integer tolerance filter —
  the merge_asof(tolerance=...) semantics at the same cost as the
  unbounded variant.
- q_agg_sketch_error_eval is the eval a production rollup tier ships
  with: exact vs approx distinct counts and quantiles per group, one
  partial-agg pass each. The approx side is O(sketch) memory per
  group — the 100 TB path — while the exact side is the audit run at
  fixture scale.
- q_text_keyword_rake tokenizes map-side (posexplode), selects
  stopwords with a TakeOrdered heap (never a global rank window),
  segments phrases with windows keyed by doc_id / (doc_id, run) —
  both data-scaled keys — and ranks the vocabulary-grain score table
  through another TakeOrdered heap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zonal_datacube_spark.operators.analytics_r6b import _G6_SQL, _g6
from zonal_datacube_spark.sources.loader import load_table


# --------------------------------------------------------------------------
# as-of join with tolerance
# --------------------------------------------------------------------------

ASOF_TOLERANCE_US = 48 * 3600 * 1_000_000  # 48 h


def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a 48 h match tolerance (pandas
    merge_asof(tolerance=...) / kdb wj semantics): each non-signup
    event matches the latest prior-or-equal signup of its user ONLY if
    that signup is at most 48 h old — stale anchors are not matches.
    Same scalable shape as q_join_asof (joins.py:160): one window
    carry over the user_id shuffle, zero self-joins; the tolerance is
    one integer-microsecond filter on top. Output: matched events with
    their exact lag in microseconds."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP '1970-01-01 00:00:00', ts)"
        ).alias("us"),
    )
    is_signup = (F.col("event_type") == "signup").cast("int")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("us").asc(), is_signup.desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = ev.withColumn(
        "signup_us",
        F.last(
            F.when(F.col("event_type") == "signup", F.col("us")),
            ignorenulls=True,
        ).over(w),
    )
    return carried.filter(
        (F.col("event_type") != "signup")
        & F.col("signup_us").isNotNull()
        & (F.col("us") - F.col("signup_us") <= ASOF_TOLERANCE_US)
    ).select(
        "event_id",
        "user_id",
        (F.col("us") - F.col("signup_us")).alias("lag_us"),
    )


# --------------------------------------------------------------------------
# sketch error eval
# --------------------------------------------------------------------------


def q_agg_sketch_error_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy eval per event type: exact distinct users vs
    approx_count_distinct (HLL++) and the exact interpolated median vs
    percentile_approx (KLL-style), with the relative distinct-count
    error — the audit a production rollup tier ships next to its
    sketches (the q_dedup_minhash_eval pattern for the aggregate
    family). Rows-only by design: sketch estimates are engine-specific
    (no DuckDB oracle can reproduce Spark's register layout), but they
    are DETERMINISTIC for fixed data — HLL/KLL merges commute — so the
    test pins cross-run equality and the exact side against pandas."""
    ev = load_table(spark, sf_dir, "events")
    # Two separate aggregations, joined on the 5-row type grain: mixing
    # count_distinct with percentile in ONE agg makes Catalyst's
    # distinct rewrite evaluate percentile partials per (type, user)
    # group — thousands of sketch buffers where five suffice (measured
    # 5 s vs 0.1 s at sf0.1, and a per-user memory blowup at 100 TB).
    distincts = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("distinct_exact"),
        F.approx_count_distinct("user_id").alias("distinct_approx"),
    )
    # the EXACT side folds from the (type, value) grain (functions/
    # percentiles.py, round-10 exact-percentile rewrite — the referee
    # must not itself be the OOM class it audits); the approx side is
    # the bounded KLL-style sketch under test
    from zonal_datacube_spark.functions.grain_cache import table_swept_grain
    from zonal_datacube_spark.functions.percentiles import (
        cached_swept_percentiles,
        pivot_percentiles,
    )

    # r13: extracts from the shared SWEPT (type, value) grain — no
    # per-key prefix sweep (one sweep per axis per process).
    p50e = pivot_percentiles(
        cached_swept_percentiles(
            table_swept_grain(
                spark, sf_dir, "events", ("event_type",), "value", "value"
            ),
            ["event_type"],
            "value",
            (0.5,),
        ),
        ["event_type"],
        {0.5: "p50_exact"},
    )
    pcts = (
        ev.groupBy("event_type")
        .agg(
            F.percentile_approx("value", F.lit(0.5), F.lit(10_000)).alias(
                "p50_approx"
            )
        )
        .join(p50e, "event_type")
    )
    per_type = distincts.join(F.broadcast(pcts), "event_type")
    return per_type.select(
        "event_type",
        "distinct_exact",
        "distinct_approx",
        _g6(
            F.abs(F.col("distinct_approx") - F.col("distinct_exact"))
            .cast("double")
            / F.col("distinct_exact").cast("double")
        ).alias("distinct_rel_err"),
        _g6(F.col("p50_exact")).alias("p50_exact"),
        _g6(F.col("p50_approx")).alias("p50_approx"),
    ).orderBy("event_type")


# --------------------------------------------------------------------------
# RAKE-lite keyword extraction
# --------------------------------------------------------------------------

RAKE_STOPWORDS = 10
RAKE_TOP = 15


def q_text_keyword_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE-lite keyword extraction (Rose 2010): stopwords = the 10
    most frequent tokens corpus-wide (data-driven, selected with a
    TakeOrdered heap — never a global rank window), candidate phrases
    = maximal stopword-free token runs per document (the classic
    gaps-and-islands row_number difference, windowed by doc_id — a
    data-scaled key), and each keyword scores degree/frequency where
    degree sums the lengths of every phrase containing it. Both counts
    are exact integers, the score is their single correctly-rounded
    division (rule 8 — identical rank order in both engines), and the
    top-15 is another TakeOrdered heap over the vocabulary grain."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), " ")).alias("i", "tok"),
    )
    stop = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("c"))
        .orderBy(F.col("c").desc(), F.col("tok").asc())
        .limit(RAKE_STOPWORDS)
        .select("tok", F.lit(True).alias("is_stop"))
    )
    nonstop = (
        toks.join(F.broadcast(stop), "tok", "left")
        .filter(F.col("is_stop").isNull())
        .select("doc_id", "i", "tok")
    )
    w_doc = Window.partitionBy("doc_id").orderBy("i")
    runs = nonstop.withColumn(
        "run", F.col("i") - F.row_number().over(w_doc)
    )
    w_run = Window.partitionBy("doc_id", "run")
    with_len = runs.withColumn("plen", F.count("*").over(w_run))
    stats = with_len.groupBy("tok").agg(
        F.count("*").alias("freq"),
        F.sum("plen").alias("degree"),
    )
    score = F.col("degree").cast("double") / F.col("freq").cast("double")
    return (
        stats.select(
            "tok",
            "freq",
            "degree",
            _g6(score).alias("rake_score"),
        )
        .orderBy(F.col("rake_score").desc(), F.col("tok").asc())
        .limit(RAKE_TOP)
    )


QUERIES = {
    "q_join_asof_tolerance": q_join_asof_tolerance,
    "q_agg_sketch_error_eval": q_agg_sketch_error_eval,
    "q_text_keyword_rake": q_text_keyword_rake,
}


ORACLE = {
    "q_join_asof_tolerance": f"""
        WITH e AS (
            SELECT event_id, user_id, event_type,
                   date_diff('microsecond', TIMESTAMP '1970-01-01',
                             ts)::BIGINT AS us
            FROM events
        ),
        carried AS (
            SELECT event_id, user_id, event_type, us,
                   last_value(
                       CASE WHEN event_type = 'signup' THEN us END
                       IGNORE NULLS
                   ) OVER (
                       PARTITION BY user_id
                       ORDER BY us ASC,
                                CASE WHEN event_type = 'signup'
                                     THEN 0 ELSE 1 END ASC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS signup_us
            FROM e
        )
        SELECT event_id, user_id, us - signup_us AS lag_us
        FROM carried
        WHERE event_type <> 'signup'
          AND signup_us IS NOT NULL
          AND us - signup_us <= {ASOF_TOLERANCE_US}
    """,
    "q_text_keyword_rake": f"""
        WITH toks AS (
            SELECT doc_id, i, toks[i] AS tok
            FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
                  FROM documents),
                 unnest(range(1, len(toks) + 1)) AS u(i)
        ),
        stop AS (
            SELECT tok
            FROM (SELECT tok, count(*) AS c FROM toks GROUP BY tok)
            QUALIFY row_number()
                OVER (ORDER BY c DESC, tok ASC) <= {RAKE_STOPWORDS}
        ),
        ns AS (
            SELECT doc_id, i, tok,
                   i - row_number() OVER (
                       PARTITION BY doc_id ORDER BY i
                   ) AS run
            FROM toks WHERE tok NOT IN (SELECT tok FROM stop)
        ),
        with_len AS (
            SELECT tok,
                   count(*) OVER (PARTITION BY doc_id, run) AS plen
            FROM ns
        ),
        stats AS (
            SELECT tok, count(*)::BIGINT AS freq,
                   sum(plen)::BIGINT AS degree
            FROM with_len GROUP BY tok
        )
        SELECT tok, freq, degree,
               {_G6_SQL.format(x="degree::DOUBLE / freq::DOUBLE")}
                   AS rake_score
        FROM stats
        ORDER BY degree::DOUBLE / freq::DOUBLE DESC, tok ASC
        LIMIT {RAKE_TOP}
    """,
}
