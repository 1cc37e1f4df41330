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


CHUNK_MS = 2000
HOP_MS = 1000


def q_media_audio_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio chunking plan (overlapping windows: 2 s chunks, 1 s hop) over
    fixture-derived durations — the byte-range schedule an audio feature
    extractor consumes. Same plan-side principle as frame sampling: the
    chunk table is metadata-sized arithmetic (sequence+explode, map-only);
    only the scheduled ranges are ever fetched/decoded. Every clip yields
    at least the [0, chunk) window even when shorter than one chunk."""
    from zonal_datacube_spark.sources.loader import load_table

    docs = load_table(spark, sf_dir, "documents")
    clips = docs.select(
        F.col("doc_id").alias("media_id"),
        (F.col("n_chars") * 7 + 1000).cast("bigint").alias("dur_ms"),
    )
    last_start = F.greatest(F.col("dur_ms") - CHUNK_MS, F.lit(0)).cast("bigint")
    return clips.select(
        "media_id",
        "dur_ms",
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), last_start, F.lit(HOP_MS).cast("bigint"))
        ).alias("chunk_start"),
    ).select(
        "media_id",
        "dur_ms",
        "chunk_start",
        F.least(F.col("chunk_start") + CHUNK_MS, F.col("dur_ms")).alias("chunk_end"),
    )


PATCH_PX = 16  # ViT-style square patch edge


def q_media_image_patches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image patch schedule (the ViT 16×16 tokenization grid) over
    fixture-derived image metadata — completes the plan-side media triple
    (video frames, audio chunks, image patches). One sequence+explode per
    image emits (patch_idx, row, col, pixel origin): the byte/tile ranges
    a patch embedder fetches. Map-only, no shuffle; at 100 TB the patch
    table is generated next to the object-store scan, and only scheduled
    tiles are ever decoded."""
    from zonal_datacube_spark.sources.loader import load_table

    docs = load_table(spark, sf_dir, "documents")
    imgs = docs.select(
        F.col("doc_id").alias("media_id"),
        (F.col("n_chars") % 224 + 32).cast("int").alias("width"),
        ((F.col("n_chars") * 3) % 224 + 32).cast("int").alias("height"),
    ).select(
        "media_id",
        "width",
        "height",
        (F.col("width") / PATCH_PX).cast("int").alias("n_cols"),
        (F.col("height") / PATCH_PX).cast("int").alias("n_rows"),
    )
    return imgs.select(
        "media_id",
        "width",
        "height",
        F.explode(
            F.sequence(F.lit(0), F.col("n_rows") * F.col("n_cols") - 1)
        ).alias("patch_idx"),
        "n_cols",
    ).select(
        "media_id",
        "width",
        "height",
        "patch_idx",
        (F.col("patch_idx") % F.col("n_cols") * PATCH_PX).alias("x0"),
        (F.floor(F.col("patch_idx") / F.col("n_cols")) * PATCH_PX)
        .cast("int")
        .alias("y0"),
    )


QUERIES = {
    "q_media_decode_stats": q_media_decode_stats,
    "q_media_frame_sample": q_media_frame_sample,
    "q_media_audio_chunks": q_media_audio_chunks,
    "q_media_image_patches": q_media_image_patches,
}

ORACLE: dict[str, str] = {
    # q_media_decode_stats: Python decode kernel — rows-only by design
    "q_media_image_patches": f"""
        WITH imgs AS (
            SELECT doc_id AS media_id,
                   (n_chars % 224 + 32)::INT AS width,
                   ((n_chars * 3) % 224 + 32)::INT AS height
            FROM documents
        ),
        g AS (
            SELECT media_id, width, height,
                   width // {PATCH_PX} AS n_cols, height // {PATCH_PX} AS n_rows
            FROM imgs
        ),
        p AS (
            SELECT media_id, width, height, n_cols,
                   unnest(range(0, n_rows * n_cols))::INT AS patch_idx
            FROM g
        )
        SELECT media_id, width, height, patch_idx,
               (patch_idx % n_cols * {PATCH_PX})::INT AS x0,
               (patch_idx // n_cols * {PATCH_PX})::INT AS y0
        FROM p
    """,
    "q_media_frame_sample": f"""
        WITH vids AS (
            SELECT doc_id AS media_id, (n_chars % 300 + 30)::INT AS n_frames
            FROM documents
        )
        SELECT media_id, n_frames, unnest(range(0, n_frames, {FRAME_EVERY_N})) AS frame_idx
        FROM vids
    """,
    "q_media_audio_chunks": f"""
        WITH clips AS (
            SELECT doc_id AS media_id, (n_chars * 7 + 1000)::BIGINT AS dur_ms
            FROM documents
        ),
        starts AS (
            SELECT media_id, dur_ms,
                   unnest(range(0, greatest(dur_ms - {CHUNK_MS}, 0) + 1,
                                {HOP_MS}))::BIGINT AS chunk_start
            FROM clips
        )
        SELECT media_id, dur_ms, chunk_start,
               least(chunk_start + {CHUNK_MS}, dur_ms) AS chunk_end
        FROM starts
    """,
}
