"""True Structured Streaming pipeline over the events fixture.

The batch-emulated queries in ``operators/streaming_batch.py`` are the
oracle-checked surface; this module is the genuine ``readStream`` pipeline
for the tumbling case, asserted batch≡stream in tests/test_streaming.py.

Design:
- file source (parquet) with an explicit schema — a streaming source cannot
  infer schemas; ``ts`` arrives as int64 nanos (see sources/loader.py) and
  is rebuilt into TIMESTAMP_NTZ with the same TZ-independent expression;
- event-time watermark bounds state: windows older than the watermark are
  finalized and their state evicted — this is what makes the aggregation
  runnable over an unbounded stream;
- ``Trigger.AvailableNow`` + complete-mode memory sink makes the finite
  fixture run deterministic for the equivalence test.

At scale the same plan runs on a Kafka/file-stream source with
``outputMode("update")`` and a real sink; nothing in the transformation
changes — that is the point of declaring it over the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from zonal_datacube_spark.sources.loader import ensure_session_confs

EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # int64 nanos (nanosAsLong)
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

# Watermarks require TIMESTAMP (LTZ) — TIMESTAMP_NTZ is rejected by
# EventTimeWatermark. The engine session pins timeZone=UTC, so LTZ wall
# times render identically to the batch side's NTZ values.
_TS_EXPR = "timestamp_micros(ts div 1000)"


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as an unbounded stream (file source over the fixture dir)."""
    ensure_session_confs(spark)
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return raw.withColumn("ts", F.expr(_TS_EXPR))


def tumbling_counts(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """1-day tumbling counts/sums per event_type with an event-time
    watermark — the streaming twin of q_stream_tumbling."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """1-day windows sliding 6h — streaming twin of q_stream_sliding."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day", "6 hours").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Streaming dedup on (user_id, minute) within the watermark horizon —
    the true-streaming twin of q_stream_dedup's semantics (state for keys
    older than the watermark is evicted, bounding the store)."""
    keyed = stream.select(
        "user_id",
        F.date_trunc("minute", "ts").alias("minute_ts"),
        "event_id",
    ).withWatermark("minute_ts", watermark)
    return keyed.dropDuplicatesWithinWatermark(["user_id", "minute_ts"])


def run_stream_foreach_batch(
    stream_df: DataFrame, spark: SparkSession, out_dir: str
) -> None:
    """foreachBatch sink: each micro-batch lands as parquet via the normal
    batch writer — the escape hatch for sinks without a native streaming
    writer (JDBC, upserts, multi-table fan-out). Batch id makes the write
    idempotent under same-batch retries (the path encodes it). In
    complete mode every batch dir is a full snapshot, so readers must
    take ONLY the max batch id (``read_foreach_batch_result``) — a
    batch=* union would double-count earlier snapshots whenever
    availableNow splits the input into multiple batches."""

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch={batch_id}")

    q = (
        stream_df.writeStream.foreachBatch(write_batch)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def read_foreach_batch_result(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read the final snapshot written by ``run_stream_foreach_batch``:
    the max batch id's directory (complete-mode snapshots supersede each
    other; earlier batch dirs are retries/history, not data to union)."""
    import os

    batches = [d for d in os.listdir(out_dir) if d.startswith("batch=")]
    last = max(batches, key=lambda d: int(d.split("=", 1)[1]))
    return spark.read.parquet(os.path.join(out_dir, last))


def run_stream_to_memory(
    stream_df: DataFrame, spark: SparkSession, table: str, output_mode: str = "complete"
) -> DataFrame:
    """Drive any finite streaming frame to a memory sink and return it."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(table)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(table)


def run_tumbling_demo(spark: SparkSession, sf_dir: str, table: str = "zds_stream_demo") -> DataFrame:
    """Execute the streaming pipeline to completion over the finite fixture
    and return the materialized result."""
    q = (
        tumbling_counts(events_stream(spark, sf_dir))
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(table)
