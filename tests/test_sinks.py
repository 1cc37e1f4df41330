from __future__ import annotations

import tempfile

from tests.conftest import SF_SMOKE
from zonal_datacube_spark.operators.zonal import q_zonal_stats
from zonal_datacube_spark.sources.sinks import write_csv, write_json, write_parquet


def test_write_roundtrip_parquet(spark):
    res = q_zonal_stats(spark, SF_SMOKE)
    with tempfile.TemporaryDirectory() as d:
        write_parquet(res, f"{d}/out", n_files=1)
        back = spark.read.parquet(f"{d}/out")
        assert sorted(map(tuple, back.collect())) == sorted(map(tuple, res.collect()))


def test_write_partitioned_parquet_prunes(spark):
    res = q_zonal_stats(spark, SF_SMOKE)
    with tempfile.TemporaryDirectory() as d:
        write_parquet(res, f"{d}/out", partition_by=["zone_id"])
        back = spark.read.parquet(f"{d}/out").filter("zone_id = 3")
        assert back.count() == 1


def test_write_csv_json(spark):
    res = q_zonal_stats(spark, SF_SMOKE)
    with tempfile.TemporaryDirectory() as d:
        write_csv(res, f"{d}/csv")
        write_json(res, f"{d}/json")
        assert spark.read.option("header", "true").csv(f"{d}/csv").count() == res.count()
        assert spark.read.json(f"{d}/json").count() == res.count()
