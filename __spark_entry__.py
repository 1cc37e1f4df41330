"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``zonal_datacube_spark``; this module is a thin
adapter over its registry (``zonal_datacube_spark/registry.py``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from zonal_datacube_spark.registry import all_oracle_sql, all_queries

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (zonal statistics: broadcast range join + per-zone
    multi-aggregate) on /root/testdata/sf0.001; driver checks rows>0."""
    from zonal_datacube_spark.operators.zonal import q_zonal_stats

    return q_zonal_stats(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """Matching ANSI SQL per key, runnable by DuckDB over the
    pre-registered fixture views. Keys absent here (and present in
    ``queries()``) are rows-only checked by design."""
    return all_oracle_sql()
