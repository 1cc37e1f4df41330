"""Data skipping via partitioned layout: the on-disk analogue of fishnet
tile pruning (SURVEY.md §4.1) — a time predicate must prune partitions at
planning time, not filter rows at runtime."""

from __future__ import annotations

import re
import tempfile

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from zonal_datacube_spark.plans.diagnostics import formatted_plan
from zonal_datacube_spark.sources.loader import load_table


@pytest.fixture(scope="module")
def partitioned_events(spark):
    with tempfile.TemporaryDirectory() as d:
        ev = load_table(spark, SF_SMOKE, "events").withColumn(
            "day", F.date_format("ts", "yyyy-MM-dd")
        )
        ev.write.mode("overwrite").partitionBy("day").parquet(f"{d}/events_by_day")
        yield f"{d}/events_by_day"


def test_partition_pruning(spark, partitioned_events):
    df = spark.read.parquet(partitioned_events).filter(F.col("day") == "2024-01-05")
    plan = formatted_plan(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "day" in m.group(1), "day predicate did not become a PartitionFilter"
    # the pruned read returns exactly that day's rows
    expected = (
        load_table(spark, SF_SMOKE, "events")
        .filter(F.date_format("ts", "yyyy-MM-dd") == "2024-01-05")
        .count()
    )
    assert df.count() == expected > 0


def test_unpartitioned_read_sees_all(spark, partitioned_events):
    assert spark.read.parquet(partitioned_events).count() == 1000


def test_tumbling_partitioned_key_prunes_and_matches(spark):
    from zonal_datacube_spark.operators.streaming_batch import (
        TUMBLING_PART_DAYS,
        q_stream_tumbling,
        q_stream_tumbling_partitioned,
    )

    df = q_stream_tumbling_partitioned(spark, SF_SMOKE)
    plan = formatted_plan(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "day" in m.group(1), "day range did not become a PartitionFilter"
    # result == the unpartitioned tumbling key filtered to the same days
    lo, hi = TUMBLING_PART_DAYS
    expected = sorted(
        map(
            tuple,
            q_stream_tumbling(spark, SF_SMOKE)
            .filter(F.substring("bucket_start", 1, 10).between(lo, hi))
            .collect(),
        )
    )
    assert sorted(map(tuple, df.collect())) == expected and expected
