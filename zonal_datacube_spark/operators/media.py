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


QUERIES = {
    "q_media_decode_stats": q_media_decode_stats,
}

ORACLE: dict[str, str] = {}  # Python decode kernel — rows-only by design
