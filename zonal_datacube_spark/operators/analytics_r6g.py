"""Round-6 seventh wave (SURVEY.md §2.26): INTERSECT ALL multiset
semantics, top event-path triples, and embedding centroid drift
between corpus halves.

Determinism (FIXTURES.md cookbook): INTERSECT ALL and the path census
are pure integer counting; the drift statistics quantize every per-dim
product/square to a 1e-12 grid integer BEFORE the cross-dim sum (rule
6 — no float reassociation crosses an aggregation), and each final
score is a fixed cast/sqrt/mul/div chain over the same exact integers
in both engines.

Scale notes (100 TB):
- q_sql_intersect_all is the multiset set-op surface (Spark
  intersectAll ⇄ SQL INTERSECT ALL): one shuffle keyed on the value,
  partial-agg census after — the q_set_* family's missing bag
  semantics.
- q_behavior_path_triples builds length-3 paths with two leads over
  ONE user_id ordering (single exchange, data-scaled key), folds the
  path census with a partial-agg groupBy, and takes the top-10 with a
  TakeOrdered heap.
- q_embed_centroid_drift reduces each corpus half to a 64-row per-dim
  sum table (posexplode is map-side; the shuffle carries dims ×
  halves rows), so the drift readout is control-plane sized no matter
  the corpus — the cheap embedding-distribution monitor a retraining
  pipeline polls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zonal_datacube_spark.operators.analytics_r6b import _G6_SQL, _g6
from zonal_datacube_spark.sources.loader import load_table


# --------------------------------------------------------------------------
# INTERSECT ALL
# --------------------------------------------------------------------------


def q_sql_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — bag (multiset) intersection semantics, the
    set-op family's missing piece next to q_set_intersect's DISTINCT
    variant and q_set_symmetric_diff's exceptAll: each nation key
    survives min(#open-order customers, #finished-order customers)
    times. Spark's intersectAll plans one aggregation per side plus a
    join keyed on the value — shuffles scale with data, no enum
    partitioning. Output: the surviving multiset's census."""
    orders = load_table(spark, sf_dir, "orders")
    cust = F.broadcast(
        load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_nationkey"
        )
    )
    def side(status: str) -> DataFrame:
        return (
            orders.filter(F.col("o_orderstatus") == status)
            .join(cust, orders.o_custkey == cust.c_custkey)
            .select(F.col("c_nationkey").alias("nationkey"))
        )

    return (
        side("O")
        .intersectAll(side("F"))
        .groupBy("nationkey")
        .agg(F.count("*").alias("n_surviving"))
        .orderBy("nationkey")
    )


# --------------------------------------------------------------------------
# top path triples
# --------------------------------------------------------------------------

PATH_TOP = 10


def q_behavior_path_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event-path triples — the 'what do users do next' census
    behind sankey/path-analysis dashboards: every consecutive
    (step1, step2, step3) along each user's time-ordered stream,
    counted corpus-wide. Two leads share ONE user_id ordering (single
    exchange over a data-scaled key; ties broken by event_id), the
    census is a partial-agg groupBy on the path tuple, and the top-10
    is a TakeOrdered heap with the full path as tiebreak."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = ev.select(
        F.col("event_type").alias("step1"),
        F.lead("event_type", 1).over(w).alias("step2"),
        F.lead("event_type", 2).over(w).alias("step3"),
    ).filter(F.col("step3").isNotNull())
    return (
        paths.groupBy("step1", "step2", "step3")
        .agg(F.count("*").alias("n_paths"))
        .orderBy(
            F.col("n_paths").desc(),
            F.col("step1").asc(),
            F.col("step2").asc(),
            F.col("step3").asc(),
        )
        .limit(PATH_TOP)
    )


# --------------------------------------------------------------------------
# embedding centroid drift
# --------------------------------------------------------------------------

_DRIFT_SCALE = 1_000_000  # per-component 1e-6 grid
_DRIFT_SQ = 1_000_000_000_000  # 1e-12 grid for squared/product terms


def q_embed_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding centroid drift between corpus halves (vec_id parity
    stands in for before/after snapshots) — the distribution monitor a
    retraining pipeline polls: L2 shift between the halves' centroids
    and their cosine. Components quantize to the 1e-6 grid map-side
    (posexplode), per-(half, dim) integer sums are the ONLY data-sized
    reduction (the shuffle carries 2×64 rows), per-dim means are
    single exact-integer divisions, and every cross-dim term (diff²,
    product, square) quantizes to a 1e-12 grid integer BEFORE the
    64-row sum so neither engine reassociates floats."""
    emb = load_table(spark, sf_dir, "embeddings")
    comps = emb.select(
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(F.col("embedding")).alias("dim", "v"),
    ).select(
        "half",
        "dim",
        F.floor(F.col("v").cast("double") * _DRIFT_SCALE + F.lit(0.5))
        .cast("bigint")
        .alias("q"),
    )
    sums = comps.groupBy("half", "dim").agg(
        F.sum("q").alias("s"), F.count("*").alias("n")
    )
    # de-scale in the SAME single division (s / (n·1e6)): the divisor is
    # an exact integer, so both engines produce the identical unit-scale
    # double, and the 1e-12-grid products below stay far inside int64
    a = sums.filter(F.col("half") == 0).select(
        "dim",
        (
            F.col("s").cast("double")
            / (F.col("n") * _DRIFT_SCALE).cast("double")
        ).alias("ma"),
        F.col("n").alias("n_a"),
    )
    b = sums.filter(F.col("half") == 1).select(
        "dim",
        (
            F.col("s").cast("double")
            / (F.col("n") * _DRIFT_SCALE).cast("double")
        ).alias("mb"),
        F.col("n").alias("n_b"),
    )
    grid = lambda c: F.floor(c * _DRIFT_SQ + F.lit(0.5)).cast(  # noqa: E731
        "bigint"
    )
    joined = a.join(b, "dim").select(
        "n_a",
        "n_b",
        grid((F.col("ma") - F.col("mb")) * (F.col("ma") - F.col("mb"))).alias(
            "d2"
        ),
        grid(F.col("ma") * F.col("mb")).alias("ab"),
        grid(F.col("ma") * F.col("ma")).alias("aa"),
        grid(F.col("mb") * F.col("mb")).alias("bb"),
    )
    agg = joined.agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.sum("d2").alias("sd2"),
        F.sum("ab").alias("sab"),
        F.sum("aa").alias("saa"),
        F.sum("bb").alias("sbb"),
    )
    # the quantized micro-sums are in (1e-6 component)² units: divide by
    # the 1e-12 grid once, then one sqrt/mul/div chain
    dbl = lambda c: F.col(c).cast("double") / _DRIFT_SQ  # noqa: E731
    return agg.select(
        "n_a",
        "n_b",
        _g6(F.sqrt(dbl("sd2"))).alias("l2_shift"),
        _g6(
            dbl("sab") / (F.sqrt(dbl("saa")) * F.sqrt(dbl("sbb")))
        ).alias("centroid_cosine"),
    )


QUERIES = {
    "q_sql_intersect_all": q_sql_intersect_all,
    "q_behavior_path_triples": q_behavior_path_triples,
    "q_embed_centroid_drift": q_embed_centroid_drift,
}


ORACLE = {
    "q_sql_intersect_all": """
        WITH surviving AS (
            SELECT c.c_nationkey AS nationkey
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE o.o_orderstatus = 'O'
            INTERSECT ALL
            SELECT c.c_nationkey AS nationkey
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            WHERE o.o_orderstatus = 'F'
        )
        SELECT nationkey, count(*)::BIGINT AS n_surviving
        FROM surviving GROUP BY nationkey ORDER BY nationkey
    """,
    "q_behavior_path_triples": f"""
        WITH paths AS (
            SELECT event_type AS step1,
                   lead(event_type, 1) OVER w AS step2,
                   lead(event_type, 2) OVER w AS step3
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        )
        SELECT step1, step2, step3, count(*)::BIGINT AS n_paths
        FROM paths WHERE step3 IS NOT NULL
        GROUP BY step1, step2, step3
        ORDER BY n_paths DESC, step1 ASC, step2 ASC, step3 ASC
        LIMIT {PATH_TOP}
    """,
    "q_embed_centroid_drift": f"""
        WITH comps AS (
            SELECT vec_id % 2 AS half, i AS dim,
                   CAST(floor(v[i]::DOUBLE * {_DRIFT_SCALE} + 0.5)
                        AS BIGINT) AS q
            FROM (SELECT vec_id, embedding AS v FROM embeddings),
                 unnest(range(1, len(v) + 1)) AS u(i)
        ),
        sums AS (
            SELECT half, dim, sum(q)::BIGINT AS s, count(*)::BIGINT AS n
            FROM comps GROUP BY half, dim
        ),
        m AS (
            SELECT a.dim,
                   a.s::DOUBLE / (a.n * 1000000)::DOUBLE AS ma,
                   b.s::DOUBLE / (b.n * 1000000)::DOUBLE AS mb,
                   a.n AS n_a, b.n AS n_b
            FROM sums a JOIN sums b ON a.dim = b.dim
            WHERE a.half = 0 AND b.half = 1
        ),
        g AS (
            SELECT n_a, n_b,
                   CAST(floor((ma - mb) * (ma - mb) * {_DRIFT_SQ} + 0.5)
                        AS BIGINT) AS d2,
                   CAST(floor(ma * mb * {_DRIFT_SQ} + 0.5)
                        AS BIGINT) AS ab,
                   CAST(floor(ma * ma * {_DRIFT_SQ} + 0.5)
                        AS BIGINT) AS aa,
                   CAST(floor(mb * mb * {_DRIFT_SQ} + 0.5)
                        AS BIGINT) AS bb
            FROM m
        )
        SELECT max(n_a)::BIGINT AS n_a, max(n_b)::BIGINT AS n_b,
               {_G6_SQL.format(
                   x=f"sqrt(sum(d2)::DOUBLE / {_DRIFT_SQ})"
               )} AS l2_shift,
               {_G6_SQL.format(
                   x=f"(sum(ab)::DOUBLE / {_DRIFT_SQ})"
                   f" / (sqrt(sum(aa)::DOUBLE / {_DRIFT_SQ})"
                   f" * sqrt(sum(bb)::DOUBLE / {_DRIFT_SQ}))"
               )} AS centroid_cosine
        FROM g
    """,
}
