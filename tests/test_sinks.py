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


def test_csv_json_sources_with_explicit_schema(spark):
    from zonal_datacube_spark.sources.loader import load_csv, load_json

    res = q_zonal_stats(spark, SF_SMOKE)
    schema = (
        "zone_id INT, n_cells BIGINT, sum_value DOUBLE, mean_value DOUBLE,"
        " min_value DOUBLE, max_value DOUBLE, stddev_value DOUBLE"
    )
    with tempfile.TemporaryDirectory() as d:
        write_csv(res, f"{d}/csv")
        write_json(res, f"{d}/json")
        back_csv = load_csv(spark, f"{d}/csv", schema)
        back_json = load_json(spark, f"{d}/json", schema).select(*back_csv.columns)
        want = sorted(map(tuple, res.collect()))
        assert sorted(map(tuple, back_csv.collect())) == want
        assert sorted(map(tuple, back_json.collect())) == want
