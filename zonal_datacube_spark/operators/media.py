"""Multimodal query key (SURVEY.md §2 multimodal family).

Declares the mapInPandas decode pipeline from
``zonal_datacube_spark/functions/multimodal.py`` as a registry key so the
multimodal family shows up in the driver's correctness artifact. The
decode kernel is the documented deterministic stub (no codecs in this
container) — the Spark-side plumbing (binary payload column, Arrow batch
iteration, typed metadata, per-kind aggregate) is the real, tested part.

Rows-only by design: the kernel is Python, there is no SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zonal_datacube_spark.functions.multimodal import decode_media_stats, synthetic_media

N_MEDIA = 96  # deterministic synthetic payloads — fixture-independent


def q_media_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """synthetic media → mapInPandas decode → per-kind aggregate.

    The aggregate runs JVM-side on the decoded (small) stats frame; the
    binary payloads never pass through a shuffle — at 100 TB the decode is
    map-only work colocated with the object-store scan."""
    # right-size parallelism to the data: 96 demo rows across the default
    # 32 partitions would spawn 32 Python workers for 3 rows each — worker
    # spawn, not decode, would dominate. At real scale the partition count
    # comes from splittable input files, not from here.
    media = synthetic_media(spark, N_MEDIA).coalesce(8)
    stats = decode_media_stats(media)
    return (
        stats.groupBy("kind")
        .agg(
            F.count("*").alias("n_media"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("mean_r"), 6).alias("avg_r"),
            F.round(F.avg("mean_g"), 6).alias("avg_g"),
            F.round(F.avg("mean_b"), 6).alias("avg_b"),
        )
        .orderBy("kind")
    )


FRAME_EVERY_N = 30


def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plan over fixture-derived metadata: treat each
    document as a video of ``n_chars % 300 + 30`` frames and emit every
    30th frame index — the metadata-only arithmetic a decoder consumes
    (functions/multimodal.py frame_sample_plan), JVM-side sequence+explode.
    Unlike the decode kernel this is fully relational, so it carries a real
    oracle: frame selection at 100 TB must be plan-side (which byte ranges
    to fetch), never decode-side (fetch everything, drop most)."""
    from zonal_datacube_spark.sources.loader import load_table

    docs = load_table(spark, sf_dir, "documents")
    vids = docs.select(
        F.col("doc_id").alias("media_id"),
        (F.col("n_chars") % 300 + 30).cast("int").alias("n_frames"),
    )
    return vids.select(
        "media_id",
        "n_frames",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(FRAME_EVERY_N))
        ).alias("frame_idx"),
    )


QUERIES = {
    "q_media_decode_stats": q_media_decode_stats,
    "q_media_frame_sample": q_media_frame_sample,
}

ORACLE: dict[str, str] = {
    # q_media_decode_stats: Python decode kernel — rows-only by design
    "q_media_frame_sample": f"""
        WITH vids AS (
            SELECT doc_id AS media_id, (n_chars % 300 + 30)::INT AS n_frames
            FROM documents
        )
        SELECT media_id, n_frames, unnest(range(0, n_frames, {FRAME_EVERY_N})) AS frame_idx
        FROM vids
    """,
}
