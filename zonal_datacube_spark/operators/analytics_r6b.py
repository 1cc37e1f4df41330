"""Round-6 second wave (SURVEY.md §2.20): changepoint detection, an
ANN-recall eval for the LSH tier, an STL-lite seasonal decomposition,
and k-core peeling of the trade graph. All but the k-core (iterative
peeling to a fixpoint — rows-only by design, python-referee-pinned in
tests/test_analytics_r6b.py) carry independent DuckDB oracles.

Determinism (FIXTURES.md cookbook): every statistic folds from exact
integer moments on the cent grid (rule 8); products that can pass 2^63
ride DECIMAL(38,0) in Spark / HUGEINT in DuckDB (rule 12); values that
feed ranks are single correctly-rounded divisions of exact integers
(rule 8's rank rule — both engines produce the identical double);
detrended residuals quantize to the 1e-6 grid BEFORE any distributed
sum so no float reassociation crosses an aggregation (rule 6); display
doubles floor-half-up on the 1e-6 grid (rule 15).

Scale notes (100 TB):
- changepoint + STL run on the event_type × day grain — time-bounded
  (years × 366), not data-scaled; the fact table folds onto that grain
  in one groupBy and every window after it is grain-sized. The split
  scoring is the classic prefix-sum decomposition: cumulative (Σn, Σs)
  per day, then a closed-form gain per candidate split — one pass,
  no per-split rescan.
- the ANN recall eval's expensive side is the exact ground truth
  (probes × corpus, broadcast brute force, correctly scoped to the
  5-probe eval set); the LSH side scores only same-bucket candidates —
  the eval measures exactly the production tradeoff (candidates
  touched vs recall).
- k-core peels the schema-bounded nation graph (≤ 25 nodes); each
  round is one degree aggregate + one semi-join, converging in ≤ nodes
  rounds with a driver-side emptiness check (the q_graph_sssp loop
  discipline, incl. localCheckpoint lineage truncation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zonal_datacube_spark.sources.loader import load_table


def _g6(c):
    """Floor-half-up on the 1e-6 grid (FIXTURES.md rule 15)."""
    return F.floor(c * 1000000 + F.lit(0.5)) / 1000000


_G6_SQL = "floor(({x}) * 1000000 + 0.5) / 1000000"


def _cents(col):
    return F.floor(col * 100 + F.lit(0.5)).cast("bigint")


_CENTS_SQL = "CAST(floor(({x}) * 100 + 0.5) AS BIGINT)"


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """event_type × epoch-day grain: event count + cent-exact value sum."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", "ts"), F.lit("1970-01-01").cast("date")
        ).alias("d"),
    ).agg(
        F.count("*").alias("nd"),
        F.sum(_cents(F.col("value"))).alias("sd"),
    )


_DAILY_SQL = f"""
            SELECT event_type,
                   date_diff('day', DATE '1970-01-01',
                             CAST(date_trunc('day', ts) AS DATE))::BIGINT AS d,
                   count(*)::BIGINT AS nd,
                   sum({_CENTS_SQL.format(x='value')})::BIGINT AS sd
            FROM events GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# changepoint detection
# --------------------------------------------------------------------------


def q_ts_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-changepoint detection per event type (binary segmentation's
    first split, the building block of PELT-style detectors): the day
    split maximizing the between-segment sum-of-squares gain
    SL²/nL + SR²/nR − ST²/nT over per-event cent sums — the split that
    most reduces squared error when each segment is modeled by its own
    mean. Cumulative (Σn, Σs) come from one growing-frame window over
    the bounded day grain (prefix-sum decomposition — every candidate
    split scores in O(1) from the prefixes); squared sums ride
    DECIMAL(38,0)/HUGEINT (rule 12) and each gain term is one exact
    integer division to double, so the (gain, day) argmax order is
    engine-identical. Output: the split day, segment means, and the
    gain."""
    daily = _daily(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("d")
    grow = w.rowsBetween(Window.unboundedPreceding, 0)
    full = Window.partitionBy("event_type")
    cum = daily.select(
        "event_type",
        "d",
        F.sum("nd").over(grow).alias("nl"),
        F.sum("sd").over(grow).alias("sl"),
        F.sum("nd").over(full).alias("nt"),
        F.sum("sd").over(full).alias("st"),
        F.row_number().over(w).alias("rn"),
        F.count("*").over(full).alias("n_days"),
    ).filter(F.col("rn") < F.col("n_days"))  # right segment non-empty
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    nr = F.col("nt") - F.col("nl")
    sr = F.col("st") - F.col("sl")
    term = lambda s, n: (s * s).cast("double") / n.cast("double")  # noqa: E731
    gain = (
        term(dec("sl"), F.col("nl"))
        + term(sr.cast("decimal(38,0)"), nr)
        - term(dec("st"), F.col("nt"))
    )
    scored = cum.select(
        "event_type",
        "d",
        "nl",
        "sl",
        nr.alias("nr"),
        sr.alias("sr"),
        gain.alias("gain"),
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.col("gain").desc(), F.col("d").asc()
    )
    return (
        scored.withColumn("pick_rn", F.row_number().over(pick))
        .filter(F.col("pick_rn") == 1)
        .select(
            "event_type",
            F.date_format(
                F.expr("date_add(DATE '1970-01-01', CAST(d AS INT))"),
                "yyyy-MM-dd",
            ).alias("split_day"),
            F.col("nl").alias("n_left"),
            F.col("nr").alias("n_right"),
            _g6(F.col("sl").cast("double") / F.col("nl") / 100).alias(
                "mean_left"
            ),
            _g6(F.col("sr").cast("double") / F.col("nr") / 100).alias(
                "mean_right"
            ),
            _g6(F.col("gain") / 10000).alias("gain_usd2"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# ANN recall eval
# --------------------------------------------------------------------------

ANN_EVAL_K = 3


def q_sim_ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@3 of the sign-bit-LSH ANN tier against exact brute force,
    per probe — the q_dedup_minhash_eval twin for the similarity family:
    a production ANN tier ships with its measured recall AND the
    candidate count that bought it (the entire point of LSH is trading
    those two). Both sides are deterministic (round-6 score, id total
    order), so unlike most ANN evals this one has a full SQL oracle:
    the LSH ranking is re-derived relationally, not sampled."""
    from zonal_datacube_spark.operators.similarity import (
        PROBE_IDS,
        _dot,
        _sign_bucket,
    )

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", _sign_bucket("embedding")
    )
    probes = F.broadcast(
        emb.filter(F.col("vec_id").isin(*PROBE_IDS)).select(
            F.col("vec_id").alias("probe_id"),
            F.col("embedding").alias("probe_vec"),
            F.col("bucket").alias("probe_bucket"),
        )
    )

    def topk(scored: DataFrame) -> DataFrame:
        w = Window.partitionBy("probe_id").orderBy(
            F.col("score").desc(), F.col("vec_id").asc()
        )
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= ANN_EVAL_K)
            .select("probe_id", "vec_id")
        )

    exact = topk(
        probes.crossJoin(emb.select("vec_id", "embedding"))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            F.round(_dot("probe_vec", "embedding"), 6).alias("score"),
        )
    )
    ann = topk(
        probes.join(emb, F.col("bucket") == F.col("probe_bucket"))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            "vec_id",
            F.round(_dot("probe_vec", "embedding"), 6).alias("score"),
        )
    )
    hits = ann.join(exact, ["probe_id", "vec_id"], "left_semi").groupBy(
        "probe_id"
    ).agg(F.count("*").alias("n_hits"))
    cand = probes.join(
        emb.select("bucket"), F.col("bucket") == F.col("probe_bucket")
    ).groupBy("probe_id").agg((F.count("*") - 1).alias("n_candidates"))
    return (
        cand.join(hits, "probe_id", "left")
        .select(
            "probe_id",
            "n_candidates",
            F.coalesce(F.col("n_hits"), F.lit(0)).alias("n_hits"),
            _g6(
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                / F.lit(float(ANN_EVAL_K))
            ).alias("recall_at_k"),
        )
        .orderBy("probe_id")
    )


# --------------------------------------------------------------------------
# STL-lite seasonal decomposition
# --------------------------------------------------------------------------

STL_HALF_WINDOW = 3  # centered 7-day trend window


def q_ts_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite seasonal decomposition per event type: trend = pooled
    7-day centered moving mean (Σcents/Σcount over the frame — ONE
    exact-integer division per day, no mean-of-means drift), seasonal =
    per day-of-week average of the detrended daily means, plus the mean
    absolute detrended residual as the remainder readout. Detrended
    values quantize to the 1e-6 grid as integer micro-units BEFORE the
    day-of-week aggregation (rule 6), so the distributed sum is exact
    and both engines divide the same integers. Day-of-week is the
    calendar-free epoch-day mod 7 (bucket label, not locale-dependent
    dayname). Edge days use the frame's available days — the same
    truncated-window semantics in both engines."""
    daily = _daily(spark, sf_dir)
    w = Window.partitionBy("event_type").orderBy("d")
    frame = w.rowsBetween(-STL_HALF_WINDOW, STL_HALF_WINDOW)
    with_trend = daily.select(
        "event_type",
        "d",
        (F.col("sd").cast("double") / F.col("nd").cast("double")).alias("x"),
        (
            F.sum("sd").over(frame).cast("double")
            / F.sum("nd").over(frame).cast("double")
        ).alias("trend"),
    )
    micro = with_trend.select(
        "event_type",
        (F.col("d") % 7).alias("dow"),
        F.floor((F.col("x") - F.col("trend")) * 1000000 + F.lit(0.5))
        .cast("bigint")
        .alias("dt_micro"),
    )
    return (
        micro.groupBy("event_type", "dow")
        .agg(
            F.count("*").alias("n_days"),
            F.sum("dt_micro").alias("sum_dt"),
            F.sum(F.abs(F.col("dt_micro"))).alias("sum_abs_dt"),
        )
        .select(
            "event_type",
            "dow",
            "n_days",
            _g6(
                F.col("sum_dt").cast("double")
                / F.col("n_days").cast("double")
                / 1000000
                / 100
            ).alias("seasonal_usd"),
            _g6(
                F.col("sum_abs_dt").cast("double")
                / F.col("n_days").cast("double")
                / 1000000
                / 100
            ).alias("mean_abs_resid_usd"),
        )
        .orderBy("event_type", "dow")
    )


# --------------------------------------------------------------------------
# k-core peeling
# --------------------------------------------------------------------------

KCORE_K = 5


def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core (k=5) of the undirected HEAVY-route trade graph — the
    dense-backbone extraction community detection and fraud pipelines
    run after edge filtering. The full nation graph saturates to a
    complete graph by sf0.01 (every core trivial), so the same
    SF-invariant top-quartile rank cut q_graph_sssp/q_graph_2hop use
    sparsifies it first; k-core then iteratively peels: drop sub-k
    nodes, recompute degrees, repeat to fixpoint (≤ nodes rounds; the
    driver-side emptiness check + localCheckpoint lineage truncation
    follow the q_graph_sssp loop discipline). Rows-only by design:
    iterative deletion has no monotone recursive-CTE form DuckDB can
    express; the python peeling referee in tests/test_analytics_r6b.py
    pins exact membership and degrees. Output: surviving nations with
    their within-core degree and the rounds-to-converge audit
    column."""
    from zonal_datacube_spark.operators.graph import trade_edges_cached

    edges = trade_edges_cached(spark, sf_dir).filter(F.col("src") != F.col("dst"))
    w_rank = Window.orderBy(
        F.col("w").desc(), F.col("src").asc(), F.col("dst").asc()
    )
    cnt = Window.partitionBy()
    cut = (
        edges.select(
            "src",
            "dst",
            F.row_number().over(w_rank).alias("rnk"),
            F.count("*").over(cnt).alias("n_e"),
        )
        .filter(F.col("rnk") * 4 <= F.col("n_e"))
        .select("src", "dst")
    )
    und = (
        cut.union(
            cut.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .distinct()
        .coalesce(1)
        .localCheckpoint()
    )
    rounds = 0
    while True:
        deg = und.groupBy("src").agg(F.count("*").alias("deg"))
        weak = deg.filter(F.col("deg") < KCORE_K).select("src")
        if not weak.take(1):
            break
        rounds += 1
        keep = deg.filter(F.col("deg") >= KCORE_K).select("src")
        und = (
            und.join(keep, "src", "left_semi")
            .join(
                keep.select(F.col("src").alias("dst")), "dst", "left_semi"
            )
            .coalesce(1)
            .localCheckpoint()
        )
        if not und.take(1):  # graph peeled away entirely
            break
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    return (
        und.groupBy("src")
        .agg(F.count("*").alias("core_degree"))
        .join(nation, F.col("src") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            "core_degree",
            F.lit(rounds).cast("bigint").alias("peel_rounds"),
        )
        .orderBy("nation")
    )


QUERIES = {
    "q_ts_changepoint": q_ts_changepoint,
    "q_sim_ann_recall_eval": q_sim_ann_recall_eval,
    "q_ts_stl_decompose": q_ts_stl_decompose,
    "q_graph_kcore": q_graph_kcore,
}


def _ann_oracle() -> str:
    from zonal_datacube_spark.operators.similarity import (
        _BUCKET_SQL,
        _PROBES_SQL,
    )

    return f"""
        WITH e AS (
            SELECT vec_id, embedding::DOUBLE[] AS v,
                   ({_BUCKET_SQL})::BIGINT AS bucket
            FROM embeddings
        ),
        p AS (SELECT * FROM e WHERE vec_id IN ({_PROBES_SQL})),
        exact AS (
            SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY p.vec_id
                       ORDER BY round(list_inner_product(p.v, e.v), 6) DESC,
                                e.vec_id ASC) AS rn
            FROM p CROSS JOIN e WHERE e.vec_id <> p.vec_id
            QUALIFY rn <= {ANN_EVAL_K}
        ),
        ann AS (
            SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id,
                   row_number() OVER (
                       PARTITION BY p.vec_id
                       ORDER BY round(list_inner_product(p.v, e.v), 6) DESC,
                                e.vec_id ASC) AS rn
            FROM p JOIN e ON e.bucket = p.bucket
            WHERE e.vec_id <> p.vec_id
            QUALIFY rn <= {ANN_EVAL_K}
        ),
        hits AS (
            SELECT a.probe_id, count(*)::BIGINT AS n_hits
            FROM ann a JOIN exact x
              ON a.probe_id = x.probe_id AND a.neighbor_id = x.neighbor_id
            GROUP BY a.probe_id
        ),
        cand AS (
            SELECT p.vec_id AS probe_id, (count(*) - 1)::BIGINT AS n_candidates
            FROM p JOIN e ON e.bucket = p.bucket
            GROUP BY p.vec_id
        )
        SELECT c.probe_id, c.n_candidates,
               coalesce(h.n_hits, 0)::BIGINT AS n_hits,
               {_G6_SQL.format(x=f"coalesce(h.n_hits, 0)::DOUBLE / {ANN_EVAL_K}")}
                   AS recall_at_k
        FROM cand c LEFT JOIN hits h ON c.probe_id = h.probe_id
        ORDER BY c.probe_id
    """


ORACLE = {
    "q_ts_changepoint": f"""
        WITH daily AS ({_DAILY_SQL}),
        cum AS (
            SELECT event_type, d,
                   sum(nd) OVER w AS nl,
                   sum(sd) OVER w AS sl,
                   sum(nd) OVER t AS nt,
                   sum(sd) OVER t AS st,
                   row_number() OVER (PARTITION BY event_type ORDER BY d)
                       AS rn,
                   count(*) OVER t AS n_days
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY d
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   t AS (PARTITION BY event_type)
        ),
        scored AS (
            SELECT event_type, d, nl, sl, nt - nl AS nr, st - sl AS sr,
                   (sl::HUGEINT * sl::HUGEINT)::DOUBLE / nl::DOUBLE
                   + ((st - sl)::HUGEINT * (st - sl)::HUGEINT)::DOUBLE
                     / (nt - nl)::DOUBLE
                   - (st::HUGEINT * st::HUGEINT)::DOUBLE / nt::DOUBLE
                       AS gain
            FROM cum WHERE rn < n_days
        )
        SELECT event_type,
               strftime(DATE '1970-01-01' + d::INT, '%Y-%m-%d') AS split_day,
               nl::BIGINT AS n_left, nr::BIGINT AS n_right,
               {_G6_SQL.format(x="sl::DOUBLE / nl / 100")} AS mean_left,
               {_G6_SQL.format(x="sr::DOUBLE / nr / 100")} AS mean_right,
               {_G6_SQL.format(x="gain / 10000")} AS gain_usd2
        FROM scored
        QUALIFY row_number() OVER (PARTITION BY event_type
                                   ORDER BY gain DESC, d ASC) = 1
        ORDER BY event_type
    """,
    "q_sim_ann_recall_eval": None,  # assembled below (imports band SQL)
    "q_ts_stl_decompose": f"""
        WITH daily AS ({_DAILY_SQL}),
        with_trend AS (
            SELECT event_type, d,
                   sd::DOUBLE / nd::DOUBLE AS x,
                   sum(sd) OVER f::DOUBLE / sum(nd) OVER f::DOUBLE AS trend
            FROM daily
            WINDOW f AS (PARTITION BY event_type ORDER BY d
                         ROWS BETWEEN {STL_HALF_WINDOW} PRECEDING
                         AND {STL_HALF_WINDOW} FOLLOWING)
        ),
        micro AS (
            SELECT event_type, d % 7 AS dow,
                   CAST(floor((x - trend) * 1000000 + 0.5) AS BIGINT)
                       AS dt_micro
            FROM with_trend
        )
        SELECT event_type, dow,
               count(*)::BIGINT AS n_days,
               {_G6_SQL.format(x="sum(dt_micro)::DOUBLE / count(*) / 1000000 / 100")}
                   AS seasonal_usd,
               {_G6_SQL.format(x="sum(abs(dt_micro))::DOUBLE / count(*) / 1000000 / 100")}
                   AS mean_abs_resid_usd
        FROM micro GROUP BY event_type, dow
        ORDER BY event_type, dow
    """,
}

ORACLE["q_sim_ann_recall_eval"] = _ann_oracle()
