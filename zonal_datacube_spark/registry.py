"""Query registry — merges every operator module's QUERIES/ORACLE dicts.

This is the single source of truth behind ``__spark_entry__.queries()`` /
``oracle_sql()``. Contract (SURVEY.md §2): every declared key maps to a
callable ``(spark, sf_dir) -> DataFrame``; keys with a matching ORACLE entry
are hash-compared against DuckDB, keys without one get a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = (
    "zonal_datacube_spark.operators.zonal",
    "zonal_datacube_spark.operators.scans",
    "zonal_datacube_spark.operators.filters",
    "zonal_datacube_spark.operators.joins",
    "zonal_datacube_spark.operators.aggregations",
    "zonal_datacube_spark.operators.windows",
    "zonal_datacube_spark.operators.sorts_sets",
    "zonal_datacube_spark.operators.scalar_funcs",
    "zonal_datacube_spark.operators.streaming_batch",
    "zonal_datacube_spark.operators.text",
    "zonal_datacube_spark.operators.dedup",
    "zonal_datacube_spark.operators.similarity",
    "zonal_datacube_spark.operators.udf_queries",
    "zonal_datacube_spark.operators.analytics_ext",
)


def _collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    import importlib

    queries: dict[str, QueryFn] = {}
    oracle: dict[str, str] = {}
    for modname in _MODULES:
        mod = importlib.import_module(modname)
        for k, fn in getattr(mod, "QUERIES", {}).items():
            if k in queries:
                raise ValueError(f"duplicate query key {k!r} in {modname}")
            queries[k] = fn
        for k, sql in getattr(mod, "ORACLE", {}).items():
            if k in oracle:
                raise ValueError(f"duplicate oracle key {k!r} in {modname}")
            oracle[k] = sql
    for k in oracle:
        if k not in queries:
            raise ValueError(f"oracle {k!r} has no matching query")
    return queries, oracle


def all_queries() -> dict[str, QueryFn]:
    return _collect()[0]


def all_oracle_sql() -> dict[str, str]:
    return _collect()[1]
