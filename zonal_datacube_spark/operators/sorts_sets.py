"""Sorts / limits / top-k / set operations (SURVEY.md §2.6).

Scale notes:
- ``orderBy().limit(k)`` plans as TakeOrderedAndProject — per-partition
  top-k then a driver-side merge of k·p rows, never a global sort;
- set ops are distinct-rewritten aggregations/joins underneath and shuffle
  on the full row — kept to narrow projections here, which is also the
  100 TB guidance (dedupe keys, not wide rows).

Every limited sort carries a unique tie-break so the selected row *set* is
deterministic (the hash compare is order-insensitive but the cutoff row
must not depend on partition order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zonal_datacube_spark.sources.loader import load_table


def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 orders by value (TakeOrderedAndProject)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("price"))
    )


def q_sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit NULL ordering (priority '5-LOW' mapped
    to NULL to exercise NULLS LAST), then limit."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn("prio", F.nullif(F.col("o_orderpriority"), F.lit("5-LOW")))
        .orderBy(
            F.col("prio").asc_nulls_last(),
            F.col("o_totalprice").desc(),
            F.col("o_orderkey").asc(),
        )
        .limit(50)
        .select("o_orderkey", "prio", F.round("o_totalprice", 2).alias("price"))
    )


def q_set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union of two filtered branches, tagged by branch."""
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", F.lit("bldg").alias("branch")
    )
    b = cust.filter(F.col("c_acctbal") > 5000).select(
        "c_custkey", F.lit("rich").alias("branch")
    )
    return a.unionByName(b)


def q_set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union: customers in either filter, each key once."""
    cust = load_table(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.union(b).distinct()


def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers in BUILDING who also placed an order."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("custkey")
    )
    b = orders.select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b)


def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordering customers who are NOT in the AUTOMOBILE segment (EXCEPT)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = orders.select(F.col("o_custkey").alias("custkey"))
    b = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select(
        F.col("c_custkey").alias("custkey")
    )
    return a.subtract(b)


def q_set_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-overlap matrix: exact Jaccard similarity between the
    user sets of every event-type pair — the segment-overlap report
    behind campaign planning. One distinct pass builds (type, user);
    the pair expansion self-joins ON user_id, so each user emits at
    most C(|types|, 2) rows regardless of activity volume (no per-user
    quadratic blowup); |A∪B| folds from the broadcast per-type totals
    as |A|+|B|−|A∩B| — the union is never materialized."""
    ev = load_table(spark, sf_dir, "events")
    tu = ev.select("event_type", "user_id").distinct()
    totals = tu.groupBy("event_type").agg(F.count("*").alias("n"))
    a, b = tu.alias("a"), tu.alias("b")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").alias("n_inter"))
    )
    ta = F.broadcast(totals.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a")))
    tb = F.broadcast(totals.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b")))
    return (
        inter.join(ta, "type_a")
        .join(tb, "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_inter",
            F.round(
                F.col("n_inter")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter")),
                6,
            ).alias("jaccard"),
        )
    )


QUERIES = {
    "q_set_overlap_jaccard": q_set_overlap_jaccard,
    "q_sort_limit": q_sort_limit,
    "q_sort_multikey": q_sort_multikey,
    "q_set_union_all": q_set_union_all,
    "q_set_union_distinct": q_set_union_distinct,
    "q_set_intersect": q_set_intersect,
    "q_set_except": q_set_except,
}

ORACLE = {
    "q_set_overlap_jaccard": """
        WITH tu AS (
            SELECT DISTINCT event_type, user_id FROM events
        ),
        totals AS (
            SELECT event_type, count(*) AS n FROM tu GROUP BY event_type
        ),
        inter AS (
            SELECT a.event_type AS type_a, b.event_type AS type_b,
                   count(*) AS n_inter
            FROM tu a JOIN tu b
              ON a.user_id = b.user_id AND a.event_type < b.event_type
            GROUP BY 1, 2
        )
        SELECT type_a, type_b, ta.n AS n_a, tb.n AS n_b, n_inter,
               round(n_inter * 1.0 / (ta.n + tb.n - n_inter), 6) AS jaccard
        FROM inter
        JOIN totals ta ON ta.event_type = type_a
        JOIN totals tb ON tb.event_type = type_b
    """,
    "q_sort_limit": """
        SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS price
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 20
    """,
    "q_sort_multikey": """
        SELECT o_orderkey, nullif(o_orderpriority, '5-LOW') AS prio,
               round(o_totalprice, 2) AS price
        FROM orders
        ORDER BY prio ASC NULLS LAST, o_totalprice DESC, o_orderkey ASC
        LIMIT 50
    """,
    "q_set_union_all": """
        SELECT c_custkey, 'bldg' AS branch FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION ALL
        SELECT c_custkey, 'rich' AS branch FROM customer WHERE c_acctbal > 5000
    """,
    "q_set_union_distinct": """
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000
    """,
    "q_set_intersect": """
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT o_custkey AS custkey FROM orders
    """,
    "q_set_except": """
        SELECT o_custkey AS custkey FROM orders
        EXCEPT
        SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
    """,
}
