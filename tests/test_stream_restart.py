"""Checkpoint restart/recovery proof (VERDICT r12 next-round #5).

All 7 TRUE-streaming keys run AvailableNow one-shots; a real pipeline
STOPS and RESTARTS. These tests run a stream over HALF the input files,
let the query terminate, add the remaining files, restart against the
SAME checkpoint dir, and require the final result to hash-match the
batch oracle over the full input — exactly-once across a restart
boundary, in three sink shapes:

1. complete-mode foreachBatch parquet snapshots (aggregation state must
   survive the restart: the phase-2 snapshot counts phase-1 rows it
   never re-read);
2. update-mode foreachBatch upsert into the versioned state table
   (phase 2 carries only changed keys; the merge must land on phase 1's
   committed versions);
3. the custom Python DataSource jsonl stream sink (stateless append:
   the file source's offset log must not re-emit phase-1 files, and
   the sink manifest must expose each batch exactly once).
"""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from zonal_datacube_spark.operators.streaming_batch import q_stream_tumbling
from zonal_datacube_spark.sources.jsonl_sink import (
    JSONL_SINK_NAME,
    read_stream_manifest,
    register_jsonl_sink,
)
from zonal_datacube_spark.sources.loader import load_table
from zonal_datacube_spark.streaming.demo import (
    events_stream,
    read_foreach_batch_result,
    read_versioned_state,
    run_stream_foreach_batch,
    run_stream_upsert,
    tumbling_counts,
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture()
def half_corpus(spark, tmp_path):
    """A corpus dir whose events.parquet is a DIRECTORY currently holding
    only the EARLIER-half of events by event time; returns (sf_dir, grow)
    where grow() drops in the later half — simulating files that arrive
    between a stop and a restart.

    The split must be by EVENT TIME, not by id hash: the checkpoint
    persists the watermark, so a restart fed rows OLDER than phase 1's
    max-ts−1h watermark would (correctly!) drop them as late in update/
    append mode — that is the documented late-data semantic, not a
    recovery bug. Files arriving after a restart are future data."""
    ev = load_table(spark, SF_SMOKE, "events")
    cutoff = ev.agg(
        F.expr("percentile_approx(ts, 0.5)").alias("m")
    ).collect()[0]["m"]
    halves = tmp_path / "halves"
    for name, pred in (
        ("a", F.col("ts") <= F.lit(cutoff)),
        ("b", F.col("ts") > F.lit(cutoff)),
    ):
        ev.filter(pred).coalesce(2).write.parquet(str(halves / name))
    src = tmp_path / "corpus"
    dest = src / "events.parquet"
    dest.mkdir(parents=True)

    def _copy(half: str) -> None:
        d = halves / half
        for f in os.listdir(d):
            if f.endswith(".parquet"):
                shutil.copy(str(d / f), str(dest / f"{half}-{f}"))

    _copy("a")
    return str(src), lambda: _copy("b")


def test_complete_mode_agg_survives_restart(spark, tmp_path, half_corpus):
    sf_dir, grow = half_corpus
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    os.makedirs(out)
    run_stream_foreach_batch(
        tumbling_counts(events_stream(spark, sf_dir)), spark, out, ckpt
    )
    partial = read_foreach_batch_result(spark, out)
    full_oracle = q_stream_tumbling(spark, SF_SMOKE)
    assert _rows(partial) != _rows(full_oracle)  # phase 1 really is partial

    grow()
    run_stream_foreach_batch(
        tumbling_counts(events_stream(spark, sf_dir)), spark, out, ckpt
    )
    # the restart's snapshot must aggregate phase-1 rows it never re-read
    # (state-store recovery) plus the new files — i.e. the batch oracle
    assert _rows(read_foreach_batch_result(spark, out)) == _rows(full_oracle)


def test_upsert_state_survives_restart(spark, tmp_path, half_corpus):
    sf_dir, grow = half_corpus
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    keys = ["bucket_start", "event_type"]
    run_stream_upsert(
        tumbling_counts(events_stream(spark, sf_dir)), spark, state, keys, ckpt
    )
    v1 = {d for d in os.listdir(state) if d.startswith("v=")}
    assert v1  # phase 1 committed at least one version

    grow()
    final = run_stream_upsert(
        tumbling_counts(events_stream(spark, sf_dir)), spark, state, keys, ckpt
    )
    # restart batch ids continue past phase 1's (global per checkpoint),
    # so phase-2 versions stack on the committed ones instead of
    # clobbering them
    assert {d for d in os.listdir(state) if d.startswith("v=")} > v1
    assert _rows(final) == _rows(q_stream_tumbling(spark, SF_SMOKE))
    assert _rows(read_versioned_state(spark, state)) == _rows(final)


def test_python_sink_appends_exactly_once_across_restart(
    spark, tmp_path, half_corpus
):
    sf_dir, grow = half_corpus
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    os.makedirs(out)
    register_jsonl_sink(spark)

    def run():
        q = (
            events_stream(spark, sf_dir)
            .select("event_id", "user_id", "event_type")
            .writeStream.format(JSONL_SINK_NAME)
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    n_phase1 = sum(r["total_rows"] for r in read_stream_manifest(out))
    grow()
    run()
    records = read_stream_manifest(out)
    ev = load_table(spark, sf_dir, "events")
    # manifest-visible rows = full input, each row exactly once: the
    # offset log skipped phase-1 files on restart, and batch ids never
    # repeat across the boundary
    assert sum(r["total_rows"] for r in records) == ev.count()
    assert n_phase1 < ev.count()
    batch_ids = [r["batch"] for r in records]
    assert len(batch_ids) == len(set(batch_ids))
    # the files themselves agree with the manifest
    manifested = [
        (f, n) for r in records for f, n in r["files"]
    ]
    ids = []
    import json

    for fname, n in manifested:
        with open(os.path.join(out, fname)) as fh:
            lines = [json.loads(line) for line in fh if line.strip()]
        assert len(lines) == n
        ids.extend(row["event_id"] for row in lines)
    assert len(ids) == len(set(ids)) == ev.count()
