"""Window functions (SURVEY.md §2.5).

All window orderings carry an explicit unique tie-break column (orderkey /
event_id) so ranking, ntile and frame contents are deterministic on both
engines — window results over tied sort keys are otherwise
implementation-defined (SURVEY.md §7 watch-list).

Scale note: every window here partitions by a high-cardinality key
(custkey, user_id) → one shuffle, no global sort. A window without
PARTITION BY would single-task at 100 TB and is deliberately absent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zonal_datacube_spark.sources.loader import load_table

# Whole seconds since epoch for a TIMESTAMP_NTZ, TZ-independent; DuckDB
# twin: date_diff('second', TIMESTAMP '1970-01-01', ts). Both floor.
_EPOCH_S = "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"


def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function battery per customer over order value."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


def q_window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed top-k per group (REPOSE pattern, PAPERS.md:5): rank
    within partition then filter — no global sort, map-side prunable."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("price"), "rn")
    )


def q_window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event deltas via lag/lead."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta_value"),
        F.lead("event_type").over(w).alias("next_type"),
    )


def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + cumulative count per user (rows frame)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 2).alias("running_sum"),
        F.count("*").over(w).alias("running_n"),
    )


def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour sum per user: RANGE frame over an integer epoch-second
    key — Spark range frames need a numeric order key, and aligning both
    engines on floor(epoch seconds) removes sub-second frame-boundary
    ambiguity (SURVEY.md §5.4)."""
    ev = load_table(spark, sf_dir, "events").withColumn("ts_s", F.expr(_EPOCH_S))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_s").asc())
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.col("ts_s").alias("epoch_s"),
        F.round(F.sum("value").over(w), 2).alias("hour_sum"),
        F.count("*").over(w).alias("hour_n"),
    )


QUERIES = {
    "q_window_rank": q_window_rank,
    "q_window_topk_per_group": q_window_topk_per_group,
    "q_window_lag_lead": q_window_lag_lead,
    "q_window_running": q_window_running,
    "q_window_range_frame": q_window_range_frame,
}

ORACLE = {
    "q_window_rank": """
        SELECT o_custkey, o_orderkey,
               row_number() OVER w AS rn,
               rank() OVER w AS rnk,
               dense_rank() OVER w AS drnk,
               round(percent_rank() OVER w, 6) AS pct_rnk,
               ntile(4) OVER w AS quartile
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
    """,
    "q_window_topk_per_group": """
        SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders
        QUALIFY rn <= 3
    """,
    "q_window_lag_lead": """
        SELECT event_id, user_id,
               round(value - lag(value) OVER w, 2) AS delta_value,
               lead(event_type) OVER w AS next_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    """,
    "q_window_running": """
        SELECT event_id, user_id,
               round(sum(value) OVER w, 2) AS running_sum,
               count(*) OVER w AS running_n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    "q_window_range_frame": """
        SELECT event_id, user_id,
               date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts) AS epoch_s,
               round(sum(value) OVER w, 2) AS hour_sum,
               count(*) OVER w AS hour_n
        FROM events
        WINDOW w AS (PARTITION BY user_id
                     ORDER BY date_diff('second', TIMESTAMP '1970-01-01 00:00:00', ts)
                     RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
}
