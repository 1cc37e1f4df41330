from __future__ import annotations

import tempfile

from tests.conftest import SF_SMOKE
from zonal_datacube_spark.operators.streaming_batch import q_stream_tumbling
from zonal_datacube_spark.streaming.demo import (
    events_stream,
    run_stream_foreach_batch,
    tumbling_counts,
)


def test_foreach_batch_parquet_sink(spark):
    with tempfile.TemporaryDirectory() as d:
        run_stream_foreach_batch(
            tumbling_counts(events_stream(spark, SF_SMOKE)), spark, d
        )
        back = spark.read.parquet(f"{d}/batch=*")
        want = sorted(map(tuple, q_stream_tumbling(spark, SF_SMOKE).collect()))
        got = sorted(map(tuple, back.select(*q_stream_tumbling(spark, SF_SMOKE).columns).collect()))
        assert got == want
