"""Deduplication operators (SURVEY.md §2.8, §2.10) — the LLM-pipeline core.

Four tiers, each with the scale story a 100 TB corpus needs:

- exact (`q_dedup_exact`): content-hash groupBy — one shuffle on the hash,
  partial aggregation upstream;
- distinct rows (`q_distinct_rows`): distinct-to-aggregate rewrite;
- near-dup exact-Jaccard (`q_dedup_near`): 3-token shingles → inverted
  shingle index self-join → per-pair intersection counts. The shingle join
  only materializes pairs that *share* a shingle — never the n² cross
  product; bucket sizes stay bounded because shingle cardinality grows with
  the corpus;
- MinHash-LSH (`q_dedup_minhash`): 9 portable min-hashes (md5-salted) per
  doc banded 3×3 — candidate pairs must share a full band, then are
  verified with true Jaccard. This is the sub-quadratic 100 TB path: cost
  is O(docs × hashes) + O(candidates), not O(pairs).

Portability: the min-hash uses md5 over salted shingles and *string* min —
byte-identical in Spark and DuckDB (no engine hash functions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zonal_datacube_spark.functions.text_funcs import shingles, tokens
from zonal_datacube_spark.sources.loader import load_table

NEAR_DUP_TAU = 0.8  # planted near-dups in the fixture sit at J >= 0.9
MINHASH_SEEDS = 9  # 3 bands x 3 rows
MINHASH_BANDS = 3


def q_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash: keep the min doc_id per md5(text)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.withColumn("h", F.md5("text"))
        .groupBy("h")
        .agg(
            F.min("doc_id").alias("kept_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


def _doc_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").withColumn("t", tokens())
    return (
        docs.filter(F.size("t") >= 3)
        .select("doc_id", F.explode(shingles("t")).alias("sh"))
    )


def q_dedup_near(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by exact shingle-set Jaccard >= tau.

    Length-bound pruning (lossless): I ≤ min(|A|,|B|) and the union ≥
    max(|A|,|B|), so J ≤ min/max — any pair with min < τ·max can never
    reach τ and is dropped *inside the join probe*, before the pair rows
    ever shuffle to the intersection count. Carrying n_sh on each side
    (via a broadcast of the tiny size table) also removes the two
    post-aggregation size joins."""
    sh = _doc_shingles(spark, sf_dir)
    sz = F.broadcast(sh.groupBy("doc_id").agg(F.count("*").alias("n_sh")))
    sh_sized = sh.join(sz, "doc_id")
    a = sh_sized.select(
        F.col("doc_id").alias("a_id"), F.col("sh").alias("sh_a"), F.col("n_sh").alias("na")
    )
    b = sh_sized.select(
        F.col("doc_id").alias("b_id"), F.col("sh").alias("sh_b"), F.col("n_sh").alias("nb")
    )
    inter = (
        a.join(
            b,
            (F.col("sh_a") == F.col("sh_b"))
            & (F.col("a_id") < F.col("b_id"))
            & (F.least("na", "nb") >= NEAR_DUP_TAU * F.greatest("na", "nb")),
        )
        .groupBy("a_id", "b_id", "na", "nb")
        .agg(F.count("*").alias("inter"))
    )
    j = inter.withColumn(
        "jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    )
    return j.filter(F.col("jaccard") >= NEAR_DUP_TAU).select(
        "a_id", "b_id", "inter", F.round("jaccard", 6).alias("jaccard")
    )


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup: banded min-hash candidates verified with true
    Jaccard. Output = verified candidate pairs (the sub-quadratic plan)."""
    sh = _doc_shingles(spark, sf_dir)
    # all 9 min-hashes in ONE pass over the shingle table (9 aggregate
    # expressions, single shuffle on doc_id) — a seed cross-join would 9×
    # the shuffle volume for no reason
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat_ws("|", F.lit(str(s)), "sh"))).alias(f"h{s}")
            for s in range(MINHASH_SEEDS)
        ]
    )
    rows_per_band = MINHASH_SEEDS // MINHASH_BANDS
    # band value = concat of the band's min-hashes in seed order
    band_frames = [
        sig.select(
            "doc_id",
            F.lit(b).alias("band"),
            F.concat(
                *[F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
            ).alias("bv"),
        )
        for b in range(MINHASH_BANDS)
    ]
    bands = band_frames[0]
    for bf in band_frames[1:]:
        bands = bands.unionByName(bf)
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )
    # verify candidates with true Jaccard — candidates are a tiny fraction
    # of the corpus (that is the point of LSH), so broadcast them into the
    # shingle joins: the 100 TB shingle table streams through map-side
    # joins and never shuffles for verification
    cand = F.broadcast(cand)
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        cand.join(sh.withColumnRenamed("doc_id", "a_id"), "a_id")
        .join(
            sh.withColumnRenamed("doc_id", "b_id").withColumnRenamed("sh", "sh_b"),
            "b_id",
        )
        .filter(F.col("sh") == F.col("sh_b"))
        .groupBy("a_id", "b_id")
        .agg(F.count("*").alias("inter"))
    )
    j = (
        F.broadcast(inter)
        .join(sz.withColumnRenamed("doc_id", "a_id").withColumnRenamed("n_sh", "na"), "a_id")
        .join(sz.withColumnRenamed("doc_id", "b_id").withColumnRenamed("n_sh", "nb"), "b_id")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
    )
    return j.select("a_id", "b_id", F.round("jaccard", 6).alias("jaccard"))


SIMHASH_BITS = 16
SIMHASH_MAX_HAMMING = 1


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 16-bit signature over the shingle set (sign of
    per-bit vote across md5(shingle) bits), pairs at hamming distance <= 1.

    Portable bit plumbing: hex-digit value via locate/strpos into a hex
    alphabet, bit extraction via integer div/mod — byte-identical in both
    engines. The signature build is one explode (shingles × 16 bits) +
    two groupBys; the pair scan compares single BIGINTs (bit_count(xor)) —
    at 100 TB the signature table is 1/1000th the corpus and the pair scan
    blocks on the signature value itself (band the 16 bits) if needed."""
    sh = _doc_shingles(spark, sf_dir)
    bits = sh.select(
        "doc_id",
        F.explode(F.expr("sequence(0, 15)")).alias("j"),
        F.col("sh"),
    ).withColumn(
        "bit",
        F.expr(
            "((locate(substr(md5(sh), 1 + cast(j div 4 AS int), 1), '0123456789abcdef') - 1)"
            " div (CASE j % 4 WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END)) % 2"
        ),
    )
    votes = bits.groupBy("doc_id", "j").agg(
        F.sum(F.when(F.col("bit") == 1, 1).otherwise(-1)).alias("s")
    )
    sig = votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("s") > 0, F.expr("shiftleft(cast(1 AS bigint), j)")).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("simhash")
    )
    a = sig.select(F.col("doc_id").alias("a_id"), F.col("simhash").alias("ha"))
    b = sig.select(F.col("doc_id").alias("b_id"), F.col("simhash").alias("hb"))
    return (
        a.crossJoin(b)
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn("hamming", F.expr("bit_count(ha ^ hb)").cast("bigint"))
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .select("a_id", "b_id", "hamming")
    )


_SH_CTE = """
        toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
        sh AS (SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS sh
               FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
               WHERE len(t) >= 3),
        sz AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id)
"""

QUERIES = {
    "q_distinct_rows": q_distinct_rows,
    "q_dedup_exact": q_dedup_exact,
    "q_dedup_near": q_dedup_near,
    "q_dedup_minhash": q_dedup_minhash,
    "q_dedup_simhash": q_dedup_simhash,
}

ORACLE = {
    "q_distinct_rows": """
        SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
    """,
    "q_dedup_exact": """
        SELECT md5(text) AS h, min(doc_id) AS kept_doc_id, count(*) AS n_copies
        FROM documents
        GROUP BY 1
    """,
    "q_dedup_near": f"""
        WITH {_SH_CTE},
        pairs AS (
            SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
            FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT a_id, b_id, inter,
               round(inter * 1.0 / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
        FROM pairs
        JOIN sz sa ON a_id = sa.doc_id
        JOIN sz sb ON b_id = sb.doc_id
        WHERE inter * 1.0 / (sa.n_sh + sb.n_sh - inter) >= {NEAR_DUP_TAU}
    """,
    "q_dedup_simhash": f"""
        WITH {_SH_CTE},
        bits AS (
            SELECT doc_id, j,
                   sum(CASE WHEN
                       ((strpos('0123456789abcdef', substr(md5(sh), 1 + (j // 4), 1)) - 1)
                        // (CASE j % 4 WHEN 0 THEN 8 WHEN 1 THEN 4 WHEN 2 THEN 2 ELSE 1 END))
                       % 2 = 1
                       THEN 1 ELSE -1 END) AS s
            FROM sh, unnest(range(0, {SIMHASH_BITS})) AS b(j)
            GROUP BY doc_id, j
        ),
        sig AS (
            SELECT doc_id,
                   sum(CASE WHEN s > 0 THEN (1 << j) ELSE 0 END)::BIGINT AS simhash
            FROM bits GROUP BY doc_id
        )
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
               bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
        FROM sig a JOIN sig b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
    """,
    "q_dedup_minhash": f"""
        WITH {_SH_CTE},
        sig AS (
            SELECT doc_id,
                   min(md5('0|' || sh)) AS h0, min(md5('1|' || sh)) AS h1,
                   min(md5('2|' || sh)) AS h2, min(md5('3|' || sh)) AS h3,
                   min(md5('4|' || sh)) AS h4, min(md5('5|' || sh)) AS h5,
                   min(md5('6|' || sh)) AS h6, min(md5('7|' || sh)) AS h7,
                   min(md5('8|' || sh)) AS h8
            FROM sh GROUP BY doc_id
        ),
        bands AS (
            SELECT doc_id, 0 AS band, h0 || h1 || h2 AS bv FROM sig
            UNION ALL
            SELECT doc_id, 1 AS band, h3 || h4 || h5 AS bv FROM sig
            UNION ALL
            SELECT doc_id, 2 AS band, h6 || h7 || h8 AS bv FROM sig
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id
        ),
        inter AS (
            SELECT c.a_id, c.b_id, count(*) AS inter
            FROM cand c
            JOIN sh sa ON sa.doc_id = c.a_id
            JOIN sh sb ON sb.doc_id = c.b_id AND sb.sh = sa.sh
            GROUP BY 1, 2
        )
        SELECT a_id, b_id,
               round(inter * 1.0 / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard
        FROM inter
        JOIN sz sa ON a_id = sa.doc_id
        JOIN sz sb ON b_id = sb.doc_id
    """,
}
