"""Training-data-pipeline operators, round 3 (SURVEY.md §2.13 cont.):
span-level dedup, benchmark decontamination, mixture sampling, sequence
packing, and embedding quantization — the ops between "raw corpus" and
"training batches" that SURVEY's LLM-pipeline mandate (BASELINE.json:6)
calls for beyond doc-level dedup.

Scale notes (100 TB): every shape here is explode → equi-join/groupBy on a
high-cardinality key (gram, doc_id, lang×seq) — never all-pairs; the only
broadcast sides are genuinely tiny dimensions (benchmark gram list, mixture
weight table). No Python on any hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from zonal_datacube_spark.functions.prefix_sweep import prefix_sweep
from zonal_datacube_spark.functions.text_funcs import tokens
from zonal_datacube_spark.sources.loader import load_table
from zonal_datacube_spark.functions.local_rel import local_relation

_TOKS = "string_split(lower(text), ' ')"  # DuckDB-side tokenizer (≡ tokens())

SPAN_N = 5  # n-gram span width for cross-doc span dedup


def _doc_span_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted (doc_id, ghs: array<bigint>) — each doc's 5-token spans as
    xxhash64 values, ONE compact row per doc. Both consumers (the span-
    frequency aggregate and the join-back) explode from this cache, so the
    corpus is tokenized once; and every downstream shuffle carries 8-byte
    longs instead of ~30-byte span strings. The hash is engine-internal
    only (never compared to the oracle), so xxhash64 is safe; a collision
    would need ~2^32 distinct spans per corpus to matter. CacheManager
    dedupes by analyzed plan → one cached copy per sf_dir per session."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .withColumn("t", tokens())
        .filter(F.size("t") >= SPAN_N)
    )
    return docs.select(
        "doc_id",
        F.expr(
            f"transform(sequence(1, size(t) - {SPAN_N - 1}),"
            f" i -> xxhash64(concat_ws(' ', slice(t, i, {SPAN_N}))))"
        ).alias("ghs"),
    ).persist(StorageLevel.MEMORY_AND_DISK)


def q_dedup_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document SPAN dedup (the C4/CCNet line-dedup shape): for each
    doc, the fraction of its 5-token spans that also occur in at least one
    other document. Docs above a threshold are boilerplate/mirror
    candidates; the span table itself is what a line-level dedup pass
    would rewrite.

    Plan: explode the persisted per-doc span-hash arrays, aggregate
    cross-doc span frequency on the hash (count distinct docs per span —
    partial aggs shuffle only distinct pairs), equi-join back on the hash,
    then a doc-keyed aggregate. All keys high-cardinality; no broadcast
    needed and none assumed — at 100 TB both sides of the span join are
    huge and sort-merge is the right physical plan."""
    grams = _doc_span_hashes(spark, sf_dir).select(
        "doc_id", F.explode("ghs").alias("gh")
    )
    span_docs = grams.groupBy("gh").agg(F.countDistinct("doc_id").alias("nd"))
    return (
        grams.join(span_docs, "gh")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_spans"),
            F.sum((F.col("nd") > 1).cast("bigint")).alias("n_dup_spans"),
            F.round(F.avg((F.col("nd") > 1).cast("double")), 6).alias(
                "dup_span_frac"
            ),
        )
    )


# Fixed decontamination list: trigram "benchmark" phrases. In production
# this table is the n-gram index of an eval set (MMLU/GSM8K-style); here a
# pinned list over the fixture vocabulary keeps the check deterministic.
BENCH_GRAMS = (
    "part filter scan",
    "row column sort",
    "stream table hash",
    "window fast query",
    "big data merge",
)
BENCH_N = 3


def q_text_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination scan: find documents whose text contains
    any benchmark n-gram (the overlap test run before training to keep
    eval sets out of the corpus). Returns one row per contaminated doc
    with hit counts — the delete-list a prep pipeline anti-joins against.

    The benchmark gram set broadcasts (it is KB-sized even for real eval
    suites); the corpus explodes to gram positions once and probes the
    broadcast hash map map-side, so the only shuffle is the final doc_id
    aggregate."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .withColumn("t", tokens())
        .filter(F.size("t") >= BENCH_N)
    )
    grams = docs.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(t) - {BENCH_N - 1}),"
                f" i -> concat_ws(' ', slice(t, i, {BENCH_N})))"
            )
        ).alias("g"),
    )
    bench = F.broadcast(
        local_relation(spark, [(g,) for g in BENCH_GRAMS], "g STRING")
    )
    return (
        grams.join(bench, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_hits"),
            F.countDistinct("g").alias("n_bench_grams"),
        )
    )


# Target mixture: per-lang keep-rate out of 256 md5 buckets. The shape of
# a data-mixing pass: upsample/downsample sources to hit a target blend.
MIX_BUCKETS = {"en": 128, "de": 77, "zh": 51, "fr": 26, "es": 13}

_DOC_BUCKET_SPARK = (
    "(locate(substr(md5(cast(doc_id AS string)), 1, 1), '0123456789abcdef') - 1)"
    " * 16 + locate(substr(md5(cast(doc_id AS string)), 2, 1),"
    " '0123456789abcdef') - 1"
)
_DOC_BUCKET_SQL = (
    "(strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 1, 1)) - 1) * 16"
    " + strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 2, 1)) - 1"
)


def q_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture sampling: each language keeps a configured
    fraction of its docs (md5 bucket < per-lang threshold) — the
    data-mixing op that rebalances a corpus toward a target blend.
    Hash-based selection is reproducible across engines, runs, and
    repartitions, unlike rand(); the weight table is a broadcast dim and
    the filter is map-side, so the only shuffle is the report aggregate."""
    docs = load_table(spark, sf_dir, "documents")
    weights = F.broadcast(
        local_relation(
            spark, list(MIX_BUCKETS.items()), "lang STRING, keep_buckets INT"
        )
    )
    bucketed = docs.join(weights, "lang").withColumn(
        "bucket", F.expr(_DOC_BUCKET_SPARK).cast("int")
    )
    return bucketed.groupBy("lang").agg(
        F.count("*").alias("n_total"),
        F.sum((F.col("bucket") < F.col("keep_buckets")).cast("bigint")).alias(
            "n_kept"
        ),
        F.round(
            F.avg((F.col("bucket") < F.col("keep_buckets")).cast("double")), 6
        ).alias("realized_rate"),
    )


PACK_CAP = 256  # tokens per packed training sequence


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing, concat-and-chop form: per language, documents are
    concatenated in doc_id order and chopped into fixed 256-token training
    sequences; each doc's start offset (running token total minus its own
    length) assigns it a sequence id. Exactly the GPT-style packing a
    training pipeline runs before batching — and it is one running token
    cumsum per language, no stateful loop.

    Scale (the r06/r07 what's-wrong #3 shard path, now implemented): the
    cumsum runs through functions/prefix_sweep.py — doc_id ranges bucket
    each language into 64 shards, the cumsum runs inside each (lang,
    shard), and a broadcast shard-offset correction (the swept bucket
    totals) restores the global running total — so no single language
    serializes through one window partition and parallelism grows with
    the corpus, while the packing arithmetic is unchanged and the serial
    oracle still hashes identically."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tok", F.size(tokens()).cast("bigint")
    )
    placed = prefix_sweep(
        docs.select("lang", "doc_id", "n_tok"),
        ["lang"],
        "doc_id",
        sum_cols={"cum_tok": "n_tok"},
    ).select(
        "lang",
        "n_tok",
        (F.col("cum_tok") - F.col("n_tok")).alias("offset"),
    ).select(
        "lang",
        "n_tok",
        F.floor(F.col("offset") / PACK_CAP).alias("seq_id"),
        # doc spills into the next sequence if its span crosses a boundary
        (
            F.floor((F.col("offset") + F.col("n_tok") - 1) / PACK_CAP)
            != F.floor(F.col("offset") / PACK_CAP)
        )
        .cast("bigint")
        .alias("crosses"),
    )
    return placed.groupBy("lang", "seq_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.sum("crosses").alias("n_boundary_docs"),
    )


def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 symmetric quantization of the embedding column (the serving-
    tier compression next to PQ: 4× smaller than float32, SIMD-friendly):
    per vector, scale = max|v|/127, codes = floor(v/s + 0.5); report
    per-label reconstruction error. floor(x + 0.5) is used instead of
    round() because Spark rounds HALF_UP and DuckDB half-to-even — floor
    arithmetic is bit-identical in both. All JVM-side higher-order array
    functions; one groupBy(label) shuffle."""
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .withColumn("ed", F.expr("transform(embedding, v -> cast(v AS double))"))
        .withColumn(
            "s", F.expr("array_max(transform(ed, v -> abs(v))) / 127.0")
        )
        .withColumn(
            "mse",
            F.expr(
                "aggregate(ed, 0D,"
                " (acc, v) -> acc + pow(v - floor(v / s + 0.5) * s, 2))"
                " / size(ed)"
            ),
        )
    )
    return emb.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.round(F.avg("s"), 6).alias("avg_scale"),
        F.round(F.avg(F.col("mse") * 1_000_000), 4).alias("mse_e6"),
    )


# train/val/test boundaries out of 256 md5 buckets (~80/10/10)
SPLIT_TRAIN_LT = 205
SPLIT_VAL_LT = 230


def q_split_train_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: the split is assigned by hashing
    the CANONICAL CONTENT digest (md5 of the text), not the doc_id — so
    every copy of identical content lands in the same split by
    construction, and duplicated documents can never straddle train and
    test (the quiet eval-contamination bug in naive id-hash splits).
    Deterministic md5-bucket arithmetic → reproducible across engines,
    runs, and repartitions; map-only except the report aggregate."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "digest", F.md5("text")
    )
    bucket = F.expr(
        "(locate(substr(md5(digest), 1, 1), '0123456789abcdef') - 1) * 16"
        " + locate(substr(md5(digest), 2, 1), '0123456789abcdef') - 1"
    )
    split = (
        F.when(bucket < SPLIT_TRAIN_LT, "train")
        .when(bucket < SPLIT_VAL_LT, "val")
        .otherwise("test")
    )
    return (
        docs.withColumn("split", split)
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("digest").alias("n_contents"),
        )
    )


DRIFT_SPLIT_TS = "2024-01-15"  # reference window < split ≤ current window
DRIFT_BIN_W = 25.0  # fixed-width value bins


def q_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-drift monitor: Population Stability Index of the event value
    distribution, reference window (first half of the month) vs current
    (second half) — the standard gate an ML-ops pipeline alarms on before
    features feed a model. Fixed-width binning keeps the histogram
    deterministic; per-bin PSI terms ((q−p)·ln(q/p)) emit alongside the
    shares so the alarm can localize WHICH bins moved. Bins are inner-
    joined (both windows populate every bin on this fixture); production
    adds epsilon smoothing for bins that empty out. One scan, two
    bin-keyed aggregates, a bin equi-join — scale-free."""
    ev = load_table(spark, sf_dir, "events")
    split = F.lit(DRIFT_SPLIT_TS).cast("timestamp_ntz")
    binned = ev.select(
        F.floor(F.col("value") / DRIFT_BIN_W).alias("bin"),
        (F.col("ts") < split).alias("is_ref"),
    )

    def shares(df: DataFrame, flag: bool, name: str) -> DataFrame:
        counts = (
            df.filter(F.col("is_ref") == flag)
            .groupBy("bin")
            .agg(F.count("*").alias("c"))
        )
        total = counts.agg(F.sum("c").alias("tot"))  # bin-sized reagg, no action
        return counts.crossJoin(F.broadcast(total)).select(
            "bin", (F.col("c") / F.col("tot")).alias(name)
        )

    p = shares(binned, True, "p_ref")
    q = shares(binned, False, "q_cur")
    return (
        p.join(q, "bin")
        .select(
            F.col("bin").cast("bigint").alias("bin"),
            F.round("p_ref", 6).alias("p_ref"),
            F.round("q_cur", 6).alias("q_cur"),
            F.round(
                (F.col("q_cur") - F.col("p_ref"))
                * F.log(F.col("q_cur") / F.col("p_ref")),
                6,
            ).alias("psi_term"),
        )
    )


def q_prep_pipeline_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE corpus-prep pipeline as one declared plan — mixture
    sampling → exact dedup → benchmark decontamination → leakage-safe
    train split → per-(lang, source) report. Each stage is an operator
    already proven alone (q_sample_weighted, q_dedup_exact,
    q_text_contamination, q_split_train_test); this key proves they
    COMPOSE: one map-side scoring pass, ONE digest-window shuffle for
    canonical-doc selection, a broadcast anti-join against the (tiny)
    contaminated-id set, and the final rollup. At 100 TB that is the
    entire prep run's shuffle budget."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .withColumn("t", tokens())
        .withColumn("digest", F.md5("text"))
    )
    # stage 1: deterministic mixture sample (per-lang md5 keep-rate)
    weights = F.broadcast(
        local_relation(
            spark, list(MIX_BUCKETS.items()), "lang STRING, keep_buckets INT"
        )
    )
    sampled = (
        docs.join(weights, "lang")
        .withColumn("bucket", F.expr(_DOC_BUCKET_SPARK).cast("int"))
        .filter(F.col("bucket") < F.col("keep_buckets"))
    )
    # stage 2: exact dedup — keep the min doc_id per content digest
    w = Window.partitionBy("digest").orderBy("doc_id")
    deduped = (
        sampled.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    # stage 3: decontamination — anti-join the benchmark-gram hit set
    # (built from the sampled survivors only: docs dropped by stage 1
    # can't reach the output, so scanning them would be wasted work)
    grams = sampled.filter(F.size("t") >= BENCH_N).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(t) - {BENCH_N - 1}),"
                f" i -> concat_ws(' ', slice(t, i, {BENCH_N})))"
            )
        ).alias("g"),
    )
    bench = F.broadcast(
        local_relation(spark, [(g,) for g in BENCH_GRAMS], "g STRING")
    )
    contaminated = grams.join(bench, "g").select("doc_id").distinct()
    clean = deduped.join(F.broadcast(contaminated), "doc_id", "left_anti")
    # stage 4: keep the train split (content-hash assignment)
    split_bucket = F.expr(
        "(locate(substr(md5(digest), 1, 1), '0123456789abcdef') - 1) * 16"
        " + locate(substr(md5(digest), 2, 1), '0123456789abcdef') - 1"
    )
    train = clean.filter(split_bucket < SPLIT_TRAIN_LT)
    # stage 5: report
    return train.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size("t").cast("bigint")).alias("n_tokens"),
    )


QUERIES = {
    "q_dedup_span": q_dedup_span,
    "q_split_train_test": q_split_train_test,
    "q_drift_psi": q_drift_psi,
    "q_prep_pipeline_full": q_prep_pipeline_full,
    "q_text_contamination": q_text_contamination,
    "q_sample_weighted": q_sample_weighted,
    "q_pack_sequences": q_pack_sequences,
    "q_embed_quantize": q_embed_quantize,
}

_BENCH_VALUES = ", ".join(f"('{g}')" for g in BENCH_GRAMS)
_MIX_VALUES = ", ".join(f"('{k}', {v})" for k, v in MIX_BUCKETS.items())

ORACLE = {
    "q_prep_pipeline_full": f"""
        WITH weights(lang, keep_buckets) AS (VALUES {_MIX_VALUES}),
        base AS (
            SELECT doc_id, lang, source, text, md5(text) AS digest,
                   {_TOKS} AS toks
            FROM documents
        ),
        sampled AS (
            SELECT b.* FROM base b JOIN weights w USING (lang)
            WHERE ({_DOC_BUCKET_SQL}) < w.keep_buckets
        ),
        deduped AS (
            SELECT * FROM sampled
            QUALIFY row_number() OVER (PARTITION BY digest ORDER BY doc_id) = 1
        ),
        bench(g) AS (VALUES {_BENCH_VALUES}),
        contaminated AS (
            SELECT DISTINCT doc_id
            FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(toks) - {BENCH_N - 2}),
                              i -> array_to_string(
                                  list_slice(toks, i, i + {BENCH_N - 1}), ' ')))
                           AS g
                FROM sampled WHERE len(toks) >= {BENCH_N}
            ) x JOIN bench USING (g)
        ),
        clean AS (
            SELECT * FROM deduped d
            WHERE NOT EXISTS (SELECT 1 FROM contaminated c
                              WHERE c.doc_id = d.doc_id)
        ),
        train AS (
            SELECT * FROM clean
            WHERE (strpos('0123456789abcdef', substr(md5(digest), 1, 1)) - 1)
                      * 16
                  + strpos('0123456789abcdef', substr(md5(digest), 2, 1)) - 1
                  < {SPLIT_TRAIN_LT}
        )
        SELECT lang, source, count(*) AS n_docs,
               sum(len(toks))::BIGINT AS n_tokens
        FROM train GROUP BY lang, source
    """,
    "q_drift_psi": f"""
        WITH binned AS (
            SELECT floor(value / {DRIFT_BIN_W}) AS bin,
                   ts < TIMESTAMP '{DRIFT_SPLIT_TS}' AS is_ref
            FROM events
        ),
        p AS (
            SELECT bin, count(*) * 1.0 / sum(count(*)) OVER () AS p_ref
            FROM binned WHERE is_ref GROUP BY bin
        ),
        q AS (
            SELECT bin, count(*) * 1.0 / sum(count(*)) OVER () AS q_cur
            FROM binned WHERE NOT is_ref GROUP BY bin
        )
        SELECT bin::BIGINT AS bin,
               round(p_ref, 6) AS p_ref,
               round(q_cur, 6) AS q_cur,
               round((q_cur - p_ref) * ln(q_cur / p_ref), 6) AS psi_term
        FROM p JOIN q USING (bin)
    """,
    "q_split_train_test": f"""
        WITH d AS (SELECT lang, md5(text) AS digest FROM documents),
        b AS (
            SELECT lang, digest,
                   (strpos('0123456789abcdef', substr(md5(digest), 1, 1)) - 1)
                       * 16
                   + strpos('0123456789abcdef', substr(md5(digest), 2, 1)) - 1
                       AS bucket
            FROM d
        )
        SELECT CASE WHEN bucket < {SPLIT_TRAIN_LT} THEN 'train'
                    WHEN bucket < {SPLIT_VAL_LT} THEN 'val'
                    ELSE 'test' END AS split,
               lang,
               count(*) AS n_docs,
               count(DISTINCT digest) AS n_contents
        FROM b
        GROUP BY split, lang
    """,
    "q_dedup_span": f"""
        WITH t AS (
            SELECT doc_id, {_TOKS} AS toks FROM documents
            WHERE len({_TOKS}) >= {SPAN_N}
        ),
        g AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(toks) - {SPAN_N - 2}),
                          i -> array_to_string(
                              list_slice(toks, i, i + {SPAN_N - 1}), ' '))) AS g
            FROM t
        ),
        gd AS (SELECT g, count(DISTINCT doc_id) AS nd FROM g GROUP BY g)
        SELECT doc_id,
               count(*) AS n_spans,
               sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END)::BIGINT AS n_dup_spans,
               round(avg(CASE WHEN nd > 1 THEN 1.0 ELSE 0.0 END), 6)
                   AS dup_span_frac
        FROM g JOIN gd USING (g)
        GROUP BY doc_id
    """,
    "q_text_contamination": f"""
        WITH bench(g) AS (VALUES {_BENCH_VALUES}),
        t AS (
            SELECT doc_id, {_TOKS} AS toks FROM documents
            WHERE len({_TOKS}) >= {BENCH_N}
        ),
        g AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(toks) - {BENCH_N - 2}),
                          i -> array_to_string(
                              list_slice(toks, i, i + {BENCH_N - 1}), ' '))) AS g
            FROM t
        )
        SELECT doc_id, count(*) AS n_hits,
               count(DISTINCT g) AS n_bench_grams
        FROM g JOIN bench USING (g)
        GROUP BY doc_id
    """,
    "q_sample_weighted": f"""
        WITH weights(lang, keep_buckets) AS (VALUES {_MIX_VALUES}),
        b AS (
            SELECT d.lang, w.keep_buckets,
                   ({_DOC_BUCKET_SQL}) AS bucket
            FROM documents d JOIN weights w USING (lang)
        )
        SELECT lang, count(*) AS n_total,
               sum(CASE WHEN bucket < keep_buckets THEN 1 ELSE 0 END)::BIGINT
                   AS n_kept,
               round(avg(CASE WHEN bucket < keep_buckets THEN 1.0 ELSE 0.0 END),
                     6) AS realized_rate
        FROM b GROUP BY lang
    """,
    "q_pack_sequences": f"""
        WITH placed AS (
            SELECT lang,
                   len({_TOKS})::BIGINT AS n_tok,
                   sum(len({_TOKS})) OVER (PARTITION BY lang ORDER BY doc_id)
                       - len({_TOKS}) AS o
            FROM documents
        )
        SELECT lang,
               (o // {PACK_CAP})::BIGINT AS seq_id,
               count(*) AS n_docs,
               sum(n_tok)::BIGINT AS n_tokens,
               sum(CASE WHEN (o + n_tok - 1) // {PACK_CAP} != o // {PACK_CAP}
                        THEN 1 ELSE 0 END)::BIGINT AS n_boundary_docs
        FROM placed
        GROUP BY lang, seq_id
    """,
    "q_embed_quantize": """
        WITH q AS (
            SELECT label,
                   embedding::DOUBLE[] AS e,
                   list_max(list_transform(embedding::DOUBLE[], v -> abs(v)))
                       / 127.0 AS s
            FROM embeddings
        )
        SELECT label, count(*) AS n_vecs,
               round(avg(s), 6) AS avg_scale,
               round(avg(list_sum(list_transform(e,
                         v -> pow(v - floor(v / s + 0.5) * s, 2)))
                         / len(e) * 1000000), 4) AS mse_e6
        FROM q GROUP BY label
    """,
}
