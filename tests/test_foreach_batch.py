from __future__ import annotations

import tempfile

from tests.conftest import SF_SMOKE
from zonal_datacube_spark.operators.streaming_batch import q_stream_tumbling
from zonal_datacube_spark.streaming.demo import (
    events_stream,
    read_foreach_batch_result,
    run_stream_foreach_batch,
    tumbling_counts,
)


def test_foreach_batch_parquet_sink(spark):
    with tempfile.TemporaryDirectory() as d:
        run_stream_foreach_batch(
            tumbling_counts(events_stream(spark, SF_SMOKE)), spark, d
        )
        # complete mode: the max-batch-id dir is the authoritative snapshot
        # (a batch=* union would double-count if availableNow ever split
        # the input into several micro-batches)
        back = read_foreach_batch_result(spark, d)
        want = sorted(map(tuple, q_stream_tumbling(spark, SF_SMOKE).collect()))
        got = sorted(map(tuple, back.select(*q_stream_tumbling(spark, SF_SMOKE).columns).collect()))
        assert got == want
