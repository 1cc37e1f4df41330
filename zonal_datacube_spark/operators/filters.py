"""Projections / filters / predicates (SURVEY.md §2.2).

Reference analogue: nodata masking + vector attribute filters. All of these
stay inside whole-stage codegen; compound predicates are partially pushed to
parquet (the pushable conjuncts reach PushedFilters, the rest evaluate in
the codegen'd FilterExec).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zonal_datacube_spark.sources.loader import load_table


def q_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AND / OR / NOT / IN / BETWEEN / IS NOT NULL battery."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 40)
        & F.col("l_returnflag").isin("A", "N")
        & (~(F.col("l_tax") > 0.07) | (F.col("l_discount") < 0.02))
        & F.col("l_shipdate").isNotNull()
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_quantity", 2).alias("qty"),
        "l_returnflag",
    )


def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / startswith pattern filters on dimension attributes."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.filter(
        F.col("c_mktsegment").like("%ILD%") | F.col("c_name").like("Customer#00000%")
    ).select("c_custkey", "c_name", "c_mktsegment")


def q_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE WHEN / coalesce / nullif derived columns (the nodata-sentinel
    handling pattern: nullif maps a sentinel to NULL, coalesce fills it)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") > 30, F.lit("bulk"))
        .when(F.col("l_quantity") > 10, F.lit("mid"))
        .otherwise(F.lit("small"))
        .alias("qty_band"),
        F.round(F.coalesce(F.nullif(F.col("l_discount"), F.lit(0.0)), F.lit(-1.0)), 2).alias(
            "discount_or_sentinel"
        ),
    )


QUERIES = {
    "q_filter_predicates": q_filter_predicates,
    "q_filter_like": q_filter_like,
    "q_conditional": q_conditional,
}

ORACLE = {
    "q_filter_predicates": """
        SELECT l_orderkey, l_linenumber, round(l_quantity, 2) AS qty, l_returnflag
        FROM lineitem
        WHERE l_quantity BETWEEN 10 AND 40
          AND l_returnflag IN ('A', 'N')
          AND (NOT (l_tax > 0.07) OR l_discount < 0.02)
          AND l_shipdate IS NOT NULL
    """,
    "q_filter_like": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE c_mktsegment LIKE '%ILD%' OR c_name LIKE 'Customer#00000%'
    """,
    "q_conditional": """
        SELECT l_orderkey, l_linenumber,
               CASE WHEN l_quantity > 30 THEN 'bulk'
                    WHEN l_quantity > 10 THEN 'mid'
                    ELSE 'small' END AS qty_band,
               round(coalesce(nullif(l_discount, 0.0), -1.0), 2) AS discount_or_sentinel
        FROM lineitem
    """,
}
