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

from zonal_datacube_spark.sources.loader import load_table


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
    """Exact interpolated percentiles (median / p90) per group."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("median_qty"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 4).alias("p90_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("median_price"),
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


QUERIES = {
    "q_join_cross": q_join_cross,
    "q_subquery_scalar": q_subquery_scalar,
    "q_agg_percentile": q_agg_percentile,
    "q_agg_listagg": q_agg_listagg,
    "q_window_cume_nth": q_window_cume_nth,
    "q_str_split_part": q_str_split_part,
}

ORACLE = {
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
}
