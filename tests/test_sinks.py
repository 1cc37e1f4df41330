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


def test_stream_sink_exactly_once_across_injected_crash(spark, tmp_path):
    """END-TO-END crash injection for the streaming Python sink (VERDICT
    r08 next-round #9): a real checkpointed StreamingQuery dies in the
    exact window the manifest guard exists for — AFTER the sink's
    per-batch commit, BEFORE the engine's commit log records the batch —
    and the restart replays the batch from the offset WAL. The replayed
    attempt re-writes fresh part files, but its commit hits the
    idempotent batchId guard, so a manifest-following reader sees every
    source offset exactly once; the replay's stray files stay on disk
    UNMANIFESTED, which is the proof the guard (not luck) provided the
    dedup."""
    import os

    import pytest
    from pyspark.sql.datasource import DataSource

    from zonal_datacube_spark.sources.jsonl_sink import (
        JsonlStreamWriter,
        read_stream_manifest,
    )
    from zonal_datacube_spark.sources.tick_stream_source import (
        TICK_STREAM_NAME,
        register_tick_stream_source,
    )

    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    os.makedirs(out)

    class CrashOnceStreamWriter(JsonlStreamWriter):
        def commit(self, messages, batchId):  # noqa: N803 (API name)
            super().commit(messages, batchId)
            marker = os.path.join(self.path, "_injected_crash")
            if batchId == 0 and not os.path.exists(marker):
                with open(marker, "w"):
                    pass
                raise RuntimeError(
                    "injected crash between sink commit and engine commit log"
                )

    class CrashyJsonlSink(DataSource):
        @classmethod
        def name(cls) -> str:
            return "zds_jsonl_sink_crashy"

        def streamWriter(self, schema, overwrite):
            return CrashOnceStreamWriter(self.options)

    spark.dataSource.register(CrashyJsonlSink)
    register_tick_stream_source(spark)

    def run(ticks: int):
        stream = (
            spark.readStream.format(TICK_STREAM_NAME)
            .option("ticks", ticks)
            .option("rows_per_tick", 4)
            .load()
        )
        return (
            stream.writeStream.format("zds_jsonl_sink_crashy")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )

    q1 = run(ticks=2)  # batch 0 = ticks (0, 2]
    with pytest.raises(Exception, match="injected crash"):
        q1.awaitTermination(240)
    # restart from the SAME checkpoint: the Python streaming source runs
    # ONE batch per availableNow start (the engine's documented
    # fallback), so this run IS the batch-0 replay — its commit hits the
    # idempotent guard
    q2 = run(ticks=5)
    assert q2.awaitTermination(240)
    # third start picks up the new ticks (2, 5] as batch 1
    q3 = run(ticks=5)
    assert q3.awaitTermination(240)

    recs = read_stream_manifest(out)
    batches = [r["batch"] for r in recs]
    assert sorted(batches) == sorted(set(batches)), "a batch was manifested twice"
    assert 0 in batches and len(batches) >= 2

    committed = {name for rec in recs for name, _ in rec["files"]}
    on_disk = {f for f in os.listdir(out) if f.startswith("stream-")}
    assert committed < on_disk, (
        "the replayed attempt should have left stray UNMANIFESTED files — "
        "without them the crash window was never actually exercised"
    )

    landed = spark.read.schema("tick int, i int, val int").json(
        [f"{out}/{n}" for n in sorted(committed)]
    )
    keys = [(r.tick, r.i) for r in landed.collect()]
    assert len(keys) == len(set(keys)) == 5 * 4, (
        "manifest-guarded read must deliver every source offset exactly once"
    )


def test_batch_sink_abort_after_commit_keeps_manifested_files(spark, tmp_path):
    """Crash injection for the BATCH jsonl writer (VERDICT r09 next-round
    #5): the streaming twin's r09 test found a real abort-path bug —
    abort() after a post-commit crash deleted files the manifest already
    pointed at. The batch writer shares that manifest logic, so the same
    window gets its own kill test: commit() publishes _MANIFEST.json,
    THEN the driver dies; Spark calls abort(messages), and the guard must
    recognize the manifested files as the committed truth and leave them
    on disk. The retry then overwrites cleanly."""
    import os

    import pytest
    from pyspark.sql.datasource import DataSource

    from zonal_datacube_spark.sources.jsonl_sink import (
        JsonlDirWriter,
        read_manifest,
    )

    out = str(tmp_path / "out")
    os.makedirs(out)
    aborted = str(tmp_path / "_abort_ran")

    class CrashOnceDirWriter(JsonlDirWriter):
        def commit(self, messages):
            super().commit(messages)
            marker = os.path.join(self.path, "_injected_crash")
            if not os.path.exists(marker):
                with open(marker, "w"):
                    pass
                raise RuntimeError(
                    "injected crash after batch manifest publish"
                )

        def abort(self, messages):
            with open(aborted, "w") as fh:
                fh.write("\n".join(m.filename for m in messages))
            super().abort(messages)

    class CrashyBatchSink(DataSource):
        @classmethod
        def name(cls) -> str:
            return "zds_jsonl_sink_batch_crashy"

        def writer(self, schema, overwrite):
            return CrashOnceDirWriter(self.options, overwrite)

    spark.dataSource.register(CrashyBatchSink)
    df = spark.range(0, 40, 1, 4).selectExpr("id", "id * id AS sq")

    def write():
        (
            df.write.format("zds_jsonl_sink_batch_crashy")
            .option("path", out)
            .mode("overwrite")
            .save()
        )

    with pytest.raises(Exception, match="injected crash"):
        write()

    # the crash window was actually exercised: abort ran over the very
    # messages commit had already manifested...
    assert os.path.exists(aborted), "abort() never ran — no window tested"
    manifest = read_manifest(out)
    assert manifest["total_rows"] == 40
    # ...and every manifested file SURVIVED it, byte-complete
    for name, n_rows in manifest["files"]:
        p = os.path.join(out, name)
        assert os.path.exists(p), f"abort deleted manifested file {name}"
        with open(p) as fh:
            assert sum(1 for _ in fh) == n_rows
    first_files = {name for name, _ in manifest["files"]}

    # the retry (same path, overwrite) publishes a fresh manifest and
    # physically removes the superseded first-attempt files
    write()
    manifest2 = read_manifest(out)
    assert manifest2["total_rows"] == 40
    on_disk = {
        f
        for f in os.listdir(out)
        if f.startswith("part-") and f.endswith(".jsonl")
    }
    assert on_disk == {name for name, _ in manifest2["files"]}
    assert not (on_disk & first_files), "overwrite left stale part files"
