"""Round-8 surface growth (SURVEY.md §2.28): the two pipeline-tier keys
VERDICT r07 next-round #10 asked for —

- INCREMENTAL near-dup maintenance (``q_dedup_incremental``): a new
  document batch probed against the EXISTING corpus' MinHash band index
  — the O(|batch|) operation a production dedup tier runs per ingest
  instead of re-deduping the whole corpus. The oracle is the full
  recompute on the blended corpus restricted to (batch, base) pairs,
  which the band-probe equals by construction — the hash gate IS the
  incremental-maintenance correctness proof.
- retrieval-stack evaluation (``q_text_retrieval_eval``): chunk-level
  known-item recall@k / MRR of the chunking + lexical-retrieval stack
  against a synthetic relevance set (each probe chunk's own text is the
  query; its own (doc, start) is the one relevant item — the standard
  pseudo-query construction when no labeled qrels exist).

Determinism: candidate ranks order by exact integer score with full
(doc_id, start) tiebreaks; MRR folds from an exact integer numerator
(6/rank per hit) with ONE terminal division — no accumulated floats
cross engines (rule 8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zonal_datacube_spark.sources.loader import load_table
from zonal_datacube_spark.operators.analytics_r6 import (
    CHUNK_SIZE,
    CHUNK_STRIDE,
    _doc_chunks,
)
from zonal_datacube_spark.functions.prefix_sweep import prefix_sweep
from zonal_datacube_spark.functions.text_funcs import tokens
from zonal_datacube_spark.operators.dedup import (
    NEAR_DUP_TAU,
    _SH_CTE,
    _doc_shingle_arrays,
    _minhash_bands,
    _verify_jaccard,
)

# ---------------------------------------------------------------------------
# incremental near-dup maintenance
# ---------------------------------------------------------------------------

INC_BATCH_MOD = 10  # doc_id % 10 == 0 → the incoming batch (~10% of corpus)


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental MinHash-LSH maintenance: the incoming batch's band
    values probe the EXISTING corpus' band index; only (batch, base)
    candidates are generated and exact-Jaccard-verified — never a
    base × base pair, so per-ingest work is O(|batch| + candidates), not
    O(|corpus|²-blocked). Output: every verified (batch, base) pair with
    its exact Jaccard and the dedup verdict at the production threshold.

    Scale: the band join shuffles on (band, bv) — the index's natural
    bucketing key, so at 100 TB the probe co-locates with a bucketed
    band table and the batch never rescans the corpus; verification
    joins only the candidate ids back to the shingle arrays (the
    q_dedup_minhash discipline). Equivalence: a batch×base band match
    in the blended-corpus recompute is exactly a probe hit (band values
    are per-doc), so incremental ≡ full-recompute-restricted — the
    DuckDB oracle computes the latter."""
    bands = _minhash_bands(spark, sf_dir)
    batch = bands.filter(F.col("doc_id") % INC_BATCH_MOD == 0).alias("a")
    base = bands.filter(F.col("doc_id") % INC_BATCH_MOD != 0).alias("b")
    cand = (
        batch.join(
            base,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv")),
        )
        .select(
            F.col("a.doc_id").alias("a_id"),
            F.col("b.doc_id").alias("b_id"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .distinct()
    )
    j = _verify_jaccard(cand, _doc_shingle_arrays(spark, sf_dir))
    jr = F.round("jaccard", 6)
    return j.select(
        F.col("a_id").alias("batch_id"),
        F.col("b_id").alias("base_id"),
        jr.alias("jaccard"),
        (jr >= F.lit(NEAR_DUP_TAU)).alias("is_dup"),
    )


# ---------------------------------------------------------------------------
# retrieval-stack evaluation
# ---------------------------------------------------------------------------

PROBE_MOD = 50  # every 50th doc contributes a probe query
PROBE_START = CHUNK_STRIDE  # the probe is each probe doc's SECOND chunk
RETR_TOPK = 3
QUERY_TERMS = 8  # each pseudo-query keeps its 8 RAREST distinct terms


def q_text_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Known-item retrieval evaluation of the chunking + lexical stack:
    every 50th document's second chunk becomes a pseudo-query (its 8
    RAREST distinct tokens by chunk-df with the term itself as tiebreak
    — the IDF-style selection real pseudo-query generators use, and one
    that never degenerates on a small synthetic vocabulary); the
    relevance set is
    synthetic and exact (the probe's own (doc_id, start) chunk); ranking
    is distinct-term overlap with (overlap DESC, doc_id, start) total
    order. Reports recall@1, recall@3, and MRR@3 over ALL probes —
    identical boilerplate chunks elsewhere in the corpus legitimately
    outrank a probe's own chunk, which is exactly the corpus-quality
    signal this eval ships to measure.

    Scale: candidates come from the inverted postings join on term (the
    sparse dot-product plan — never query × chunks); rarest-first term
    selection keeps every touched posting list as small as the corpus
    allows, the overlap aggregate shuffles on (probe, chunk), and both
    windows partition on the DATA-SCALED probe key. The exact integer rank key sidesteps the
    float-rank trap (rule 8); MRR sums integer 6/rank credits and
    divides once. Candidate volume is |probes| × rare-term posting
    size; the fixture scales the probe set WITH the corpus (doc_id %
    50) so the oracle stays meaningful at every SF — a production eval
    holds the probe set FIXED (eval sets don't grow with the corpus),
    making the sweep linear in corpus size; impact-ordered/WAND pruning
    on the postings is the further extension, and the plan shape
    (postings join → bounded rank) is the one both drop into."""
    chunks = _chunk_terms(spark, sf_dir)
    post = chunks.select(
        "doc_id", "start", F.explode("cts").alias("term")
    )
    dfs = post.groupBy("term").agg(F.count("*").alias("df"))
    probes = chunks.filter(
        (F.col("doc_id") % PROBE_MOD == 0) & (F.col("start") == PROBE_START)
    )
    return _retrieval_metrics(post, dfs, probes)


def _chunk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, start, cts) — each chunk's distinct-term array."""
    return _doc_chunks(spark, sf_dir).select(
        "doc_id",
        "start",
        F.array_distinct(
            F.slice(
                "toks",
                F.col("start").cast("int") + 1,
                F.col("chunk_len").cast("int"),
            )
        ).alias("cts"),
    )


def _retrieval_metrics(
    post: DataFrame, dfs: DataFrame, probes: DataFrame
) -> DataFrame:
    """Shared scoring tail of the retrieval evals: rarest-term
    pseudo-queries → postings join → bounded rank → recall@1/@3 +
    MRR@3. ``probes`` supplies (doc_id, start, cts); the two variants
    differ only in how the probe set is drawn."""
    wq = Window.partitionBy("probe_id", "probe_start").orderBy(
        F.col("df").asc(), F.col("term").asc()
    )
    qterms = (
        probes.select(
            F.col("doc_id").alias("probe_id"),
            F.col("start").alias("probe_start"),
            F.explode("cts").alias("term"),
        )
        .join(dfs, "term")
        .withColumn("qrn", F.row_number().over(wq))
        .filter(F.col("qrn") <= QUERY_TERMS)
        .select("probe_id", "probe_start", "term")
    )
    overlap = (
        post.join(qterms, "term")
        .groupBy("probe_id", "probe_start", "doc_id", "start")
        .agg(F.count("*").alias("overlap"))
    )
    w = Window.partitionBy("probe_id", "probe_start").orderBy(
        F.col("overlap").desc(), F.col("doc_id").asc(), F.col("start").asc()
    )
    top = overlap.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= RETR_TOPK
    )
    hit = (F.col("doc_id") == F.col("probe_id")) & (
        F.col("start") == F.col("probe_start")
    )
    scored = top.agg(
        F.sum((hit & (F.col("rn") == 1)).cast("bigint")).alias("n_hit1"),
        F.sum(hit.cast("bigint")).alias("n_hit3"),
        # 6/rank ∈ {6,3,2}: exact integer reciprocal-rank credits
        F.sum(F.when(hit, F.lit(6) / F.col("rn")).otherwise(0).cast("bigint")).alias(
            "rr6"
        ),
    )
    n_probes = probes.agg(F.count("*").alias("n_probes"))
    return scored.crossJoin(F.broadcast(n_probes)).select(
        "n_probes",
        "n_hit1",
        "n_hit3",
        F.round(F.col("n_hit1") / F.col("n_probes"), 6).alias("recall_at_1"),
        F.round(F.col("n_hit3") / F.col("n_probes"), 6).alias("recall_at_3"),
        F.round(F.col("rr6") / (6 * F.col("n_probes")), 6).alias("mrr_at_3"),
    )


FIXED_PROBES = 32  # production eval sets are FIXED-SIZE, not corpus-scaled
PROBE_HASH_A = 2654435761  # Knuth multiplicative-hash constant
PROBE_HASH_M = 4294967296  # 2^32
PROBE_HASH_R = 2147483648  # 2^31 — pre-reduction keeps the product int64-safe


def q_text_retrieval_eval_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Known-item retrieval eval over a FIXED-SIZE probe set — the
    production variant the corpus-scaled key's docstring designs
    (VERDICT r08 next-round #5): eval sets don't grow with the corpus,
    so the probe draw is the ``FIXED_PROBES`` lowest values of the
    multiplicative hash ``((doc_id mod 2³¹) · A) mod 2³²`` among
    second-chunk candidates — deterministic, pseudo-random, and
    expressible identically in both engines (unlike xxhash64, which
    DuckDB lacks). The mod-2³¹ pre-reduction (ADVICE r09) caps the
    product at 2³¹·A < 2⁶³, so the expression never overflows int64 for
    ANY doc_id — without it, ids ≥ ~3.5e9 kill the query on both
    engines (ANSI-mode Spark raises like DuckDB; a non-ANSI deployment
    would silently wrap and diverge from the oracle instead); on ids
    below 2³¹ (every fixture) the reduction is the identity.
    ``orderBy(h).limit(n)`` plans as TakeOrderedAndProject
    (per-partition heaps — no global sort), so probe selection is one
    linear pass; the scoring tail is shared with the corpus-scaled twin
    and its candidate volume is now |fixed probes| × rare-term posting
    size — LINEAR in corpus size where the twin's SCALING ratio was
    3.33× per ~10× data. Metrics columns match the twin's exactly."""
    chunks = _chunk_terms(spark, sf_dir)
    post = chunks.select("doc_id", "start", F.explode("cts").alias("term"))
    dfs = post.groupBy("term").agg(F.count("*").alias("df"))
    probes = (
        chunks.filter(F.col("start") == PROBE_START)
        .withColumn(
            "h",
            F.pmod(
                F.pmod(F.col("doc_id"), F.lit(PROBE_HASH_R))
                * F.lit(PROBE_HASH_A),
                F.lit(PROBE_HASH_M),
            ),
        )
        .orderBy("h", "doc_id")
        .limit(FIXED_PROBES)
        .drop("h")
    )
    return _retrieval_metrics(post, dfs, probes)


# ---------------------------------------------------------------------------
# batch padding-efficiency evaluation
# ---------------------------------------------------------------------------

BATCH_SIZE = 16  # documents per training batch


def q_batch_padding_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batching evaluation: how many PAD tokens does the
    batcher burn? Each batch of {B} docs pads every member to the
    batch's max token length; compares NATURAL (doc_id) order against
    LENGTH-SORTED order (the standard bucketing trick — sorting by
    length makes batches length-homogeneous, collapsing padding waste).
    Reports batches, padded tokens, and pad share per strategy — the
    number a training-efficiency dashboard tracks before/after enabling
    bucketed batching. All-integer arithmetic: padded = Σ(max·count −
    Σlen) per batch, one terminal division for the share.

    Scale: both global row numbers ride the range-bucketed prefix sweep
    (64 value-range buckets over doc_id / token length — NO global sort,
    the sweep's entire reason to exist); the batch grain then groups on
    the data-scaled batch_id. Production note: a distributed trainer
    batches per (shard, local rank) — same arithmetic with the sweep's
    bucket id as the shard, zero plan change."""
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tok", F.size(tokens()).cast("bigint")
    )
    base = docs.select("doc_id", "n_tok")
    nat = prefix_sweep(base, [], "doc_id", row_number_col="rn")
    srt = prefix_sweep(
        base, [], "n_tok", tiebreak=["doc_id"], row_number_col="rn"
    )

    def pad_stats(df: DataFrame, strategy: str) -> DataFrame:
        per = (
            df.withColumn(
                "batch_id", F.floor((F.col("rn") - 1) / BATCH_SIZE)
            )
            .groupBy("batch_id")
            .agg(
                F.max("n_tok").alias("mx"),
                F.sum("n_tok").alias("s"),
                F.count("*").alias("c"),
            )
        )
        grid = F.sum(F.col("mx") * F.col("c"))
        return per.agg(
            F.count("*").alias("n_batches"),
            (grid - F.sum("s")).alias("padded_tokens"),
            F.round((grid - F.sum("s")) / grid, 6).alias("pad_share"),
        ).select(
            F.lit(strategy).alias("strategy"),
            "n_batches",
            "padded_tokens",
            "pad_share",
        )

    return pad_stats(nat, "natural").unionByName(
        pad_stats(srt, "length_sorted")
    )


# ---------------------------------------------------------------------------
# raster slope (Horn's method) — integer gradient algebra
# ---------------------------------------------------------------------------

SLOPE_N = 256  # synthetic raster edge; 256² = 65,536 cells
SLOPE_CLASS_W = 30_000  # slope² units per steepness class (max ≈ 295k)


def q_raster_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terrain slope via Horn's 3×3 gradient (Horn 1981, the
    slope/aspect kernel every raster engine ships next to focal stats):
    gx = (E·2 + NE + SE) − (W·2 + NW + SW), gy symmetric, on the same
    deterministic synthetic raster as q_raster_focal (zonal.py) — and
    ENTIRELY in integer algebra: the report classifies by slope² =
    gx² + gy² (monotone in slope, so the class census is identical) and
    never evaluates the float atan/sqrt, sidestepping rule 8 outright.

    Scale: same scatter-gather as q_raster_focal — each cell explodes
    to its 8 weighted neighbor contributions and one partial+final
    aggregate keyed by target cell folds both gradient sums; interior
    cells identify as contribution-count == 8 (no branchy edge logic).
    At 100 TB: tile the grid and halo-exchange tile borders — the 2-D
    instance of functions/chunked_window.py's pattern."""
    n = SLOPE_N
    cells = spark.range(0, n * n).select(
        (F.col("id") % n).alias("x"),
        F.floor(F.col("id") / n).alias("y"),
    ).select(
        "x", "y", ((F.col("x") * 31 + F.col("y") * 17) % 97).alias("val")
    )
    offsets = F.expr(
        "filter(flatten(transform(sequence(-1, 1), dx ->"
        " transform(sequence(-1, 1), dy -> struct(dx, dy)))),"
        " o -> o.dx != 0 OR o.dy != 0)"
    )
    wx = F.when(F.col("o.dx") == 0, F.lit(0)).otherwise(
        F.col("o.dx") * F.when(F.col("o.dy") == 0, 2).otherwise(1)
    )
    wy = F.when(F.col("o.dy") == 0, F.lit(0)).otherwise(
        F.col("o.dy") * F.when(F.col("o.dx") == 0, 2).otherwise(1)
    )
    scattered = (
        cells.select("x", "y", "val", F.explode(offsets).alias("o"))
        .select(
            (F.col("x") - F.col("o.dx")).alias("tx"),
            (F.col("y") - F.col("o.dy")).alias("ty"),
            (wx * F.col("val")).alias("wxv"),
            (wy * F.col("val")).alias("wyv"),
        )
        .filter(
            (F.col("tx") >= 0) & (F.col("tx") < n)
            & (F.col("ty") >= 0) & (F.col("ty") < n)
        )
    )
    grad = scattered.groupBy("tx", "ty").agg(
        F.sum("wxv").alias("gx"),
        F.sum("wyv").alias("gy"),
        F.count("*").alias("nc"),
    )
    steep = grad.filter(F.col("nc") == 8).select(
        (F.col("gx") * F.col("gx") + F.col("gy") * F.col("gy")).alias("ss")
    )
    return steep.groupBy(
        F.expr(f"least(9L, ss div {SLOPE_CLASS_W})").alias("steep_class")
    ).agg(
        F.count("*").alias("n_cells"),
        F.min("ss").alias("min_slope_sq"),
        F.max("ss").alias("max_slope_sq"),
        F.round(F.avg("ss"), 6).alias("avg_slope_sq"),
    )


# ---------------------------------------------------------------------------
# PSI distribution-drift detection
# ---------------------------------------------------------------------------

PSI_BINS = 10
PSI_REF_BEFORE = 1998  # reference period: order years < 1998 (fixture spans 1995-2001)
_PSI_GRID = 1_000_000_000  # 1e-9 quantization grid (the JS-divergence trick)


def q_dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index drift monitor: the order-value
    distribution of the CURRENT period (years ≥ 1998) against the
    REFERENCE period (< 1998) over 10 fixed-width bins — the standard
    model-monitoring drift metric (PSI = Σ (p−q)·ln(p/q); < 0.1 stable,
    > 0.25 drifted). Reported at bin grain (the dashboard artifact),
    with each bin's PSI contribution.

    Determinism (rule 8): bin edges come from integer CENTS (DECIMAL
    (15,2) × 100 is exact) with pure integer bin arithmetic; counts are
    Laplace-smoothed (+1 per bin) so empty bins stay defined; p, q, and
    ln(p/q) are built from two exact-integer divisions and ONE ln call,
    and the contribution quantizes to a 1e-9 grid before the 1e-6
    output rounding — the same ulp-absorbing ladder q_text_js_divergence
    uses. Scale: one broadcast bounds aggregate, one partial+final
    count keyed by (bin), a 10-row spine join — map-side everything."""
    orders = load_table(spark, sf_dir, "orders").select(
        (F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        (F.year("o_orderdate") < PSI_REF_BEFORE).alias("is_ref"),
    )
    bounds = orders.agg(
        F.min("cents").alias("lo"), F.max("cents").alias("hi")
    )
    binned = orders.crossJoin(F.broadcast(bounds)).select(
        F.expr(
            f"least({PSI_BINS - 1}L,"
            f" ((cents - lo) * {PSI_BINS}) div (hi - lo + 1))"
        ).alias("bin"),
        "is_ref",
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.col("is_ref").cast("bigint")).alias("n_ref"),
        F.sum((~F.col("is_ref")).cast("bigint")).alias("n_cur"),
    )
    spine = spark.range(PSI_BINS).select(F.col("id").alias("bin"))
    full = (
        spine.join(counts, "bin", "left")
        .fillna(0, subset=["n_ref", "n_cur"])
    )
    totals = full.agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    p = (F.col("n_ref") + 1) / (F.col("t_ref") + PSI_BINS)
    q = (F.col("n_cur") + 1) / (F.col("t_cur") + PSI_BINS)
    contrib = (p - q) * F.log(p / q)
    return full.crossJoin(F.broadcast(totals)).select(
        "bin",
        "n_ref",
        "n_cur",
        F.round(p, 6).alias("p_ref"),
        F.round(q, 6).alias("p_cur"),
        F.round(
            F.floor(contrib * _PSI_GRID + F.lit(0.5)) / _PSI_GRID, 6
        ).alias("psi_term"),
    )


QUERIES = {
    "q_dedup_incremental": q_dedup_incremental,
    "q_text_retrieval_eval": q_text_retrieval_eval,
    "q_text_retrieval_eval_fixed": q_text_retrieval_eval_fixed,
    "q_batch_padding_eval": q_batch_padding_eval,
    "q_raster_slope": q_raster_slope,
    "q_dq_psi_drift": q_dq_psi_drift,
}

_TOKS_SQL = "string_split(lower(text), ' ')"

ORACLE = {
    "q_dedup_incremental": f"""
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
            SELECT DISTINCT a.doc_id AS batch_id, b.doc_id AS base_id
            FROM bands a JOIN bands b
              ON a.band = b.band AND a.bv = b.bv
            WHERE a.doc_id % {INC_BATCH_MOD} = 0
              AND b.doc_id % {INC_BATCH_MOD} != 0
        ),
        inter AS (
            SELECT c.batch_id, c.base_id, count(*) AS inter
            FROM cand c
            JOIN sh sa ON sa.doc_id = c.batch_id
            JOIN sh sb ON sb.doc_id = c.base_id AND sb.sh = sa.sh
            GROUP BY 1, 2
        )
        SELECT batch_id, base_id,
               round(inter * 1.0 / (sa.n_sh + sb.n_sh - inter), 6) AS jaccard,
               round(inter * 1.0 / (sa.n_sh + sb.n_sh - inter), 6)
                   >= {NEAR_DUP_TAU} AS is_dup
        FROM inter
        JOIN sz sa ON batch_id = sa.doc_id
        JOIN sz sb ON base_id = sb.doc_id
    """,
    "q_text_retrieval_eval": f"""
        WITH d AS (
            SELECT doc_id, {_TOKS_SQL} AS toks,
                   len({_TOKS_SQL})::BIGINT AS n
            FROM documents
        ),
        g AS (
            SELECT doc_id, toks, n,
                   unnest(generate_series(0, (n - 1) // {CHUNK_STRIDE})) AS gs
            FROM d
        ),
        c AS (
            SELECT doc_id, (gs * {CHUNK_STRIDE})::BIGINT AS start,
                   list_distinct(
                       toks[(gs * {CHUNK_STRIDE} + 1):(gs * {CHUNK_STRIDE}
                            + least({CHUNK_SIZE}, n - gs * {CHUNK_STRIDE}))]
                   ) AS cts
            FROM g
        ),
        post AS (SELECT doc_id, start, unnest(cts) AS term FROM c),
        dfs AS (SELECT term, count(*)::BIGINT AS df FROM post GROUP BY term),
        probes AS (
            SELECT doc_id AS probe_id, start AS probe_start, cts
            FROM c
            WHERE doc_id % {PROBE_MOD} = 0 AND start = {PROBE_START}
        ),
        qterms AS (
            SELECT probe_id, probe_start, term FROM (
                SELECT probe_id, probe_start, term,
                       row_number() OVER (PARTITION BY probe_id, probe_start
                                          ORDER BY df, term) AS qrn
                FROM (SELECT probe_id, probe_start, unnest(cts) AS term
                      FROM probes)
                JOIN dfs USING (term)
            ) WHERE qrn <= {QUERY_TERMS}
        ),
        overlap AS (
            SELECT q.probe_id, q.probe_start, p.doc_id, p.start,
                   count(*)::BIGINT AS overlap
            FROM qterms q JOIN post p USING (term)
            GROUP BY 1, 2, 3, 4
        ),
        top AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (
                           PARTITION BY probe_id, probe_start
                           ORDER BY overlap DESC, doc_id, start) AS rn
                FROM overlap
            ) WHERE rn <= {RETR_TOPK}
        ),
        scored AS (
            SELECT
              sum(CASE WHEN doc_id = probe_id AND start = probe_start
                            AND rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hit1,
              sum(CASE WHEN doc_id = probe_id AND start = probe_start
                       THEN 1 ELSE 0 END)::BIGINT AS n_hit3,
              sum(CASE WHEN doc_id = probe_id AND start = probe_start
                       THEN 6 // rn ELSE 0 END)::BIGINT AS rr6
            FROM top
        ),
        np AS (SELECT count(*)::BIGINT AS n_probes FROM probes)
        SELECT n_probes, n_hit1, n_hit3,
               round(n_hit1 * 1.0 / n_probes, 6) AS recall_at_1,
               round(n_hit3 * 1.0 / n_probes, 6) AS recall_at_3,
               round(rr6 * 1.0 / (6 * n_probes), 6) AS mrr_at_3
        FROM scored, np
    """,
    "q_text_retrieval_eval_fixed": f"""
        WITH d AS (
            SELECT doc_id, {_TOKS_SQL} AS toks,
                   len({_TOKS_SQL})::BIGINT AS n
            FROM documents
        ),
        g AS (
            SELECT doc_id, toks, n,
                   unnest(generate_series(0, (n - 1) // {CHUNK_STRIDE})) AS gs
            FROM d
        ),
        c AS (
            SELECT doc_id, (gs * {CHUNK_STRIDE})::BIGINT AS start,
                   list_distinct(
                       toks[(gs * {CHUNK_STRIDE} + 1):(gs * {CHUNK_STRIDE}
                            + least({CHUNK_SIZE}, n - gs * {CHUNK_STRIDE}))]
                   ) AS cts
            FROM g
        ),
        post AS (SELECT doc_id, start, unnest(cts) AS term FROM c),
        dfs AS (SELECT term, count(*)::BIGINT AS df FROM post GROUP BY term),
        probes AS (
            SELECT doc_id AS probe_id, start AS probe_start, cts
            FROM c
            WHERE start = {PROBE_START}
            ORDER BY ((doc_id % {PROBE_HASH_R}) * {PROBE_HASH_A})
                     % {PROBE_HASH_M}, doc_id
            LIMIT {FIXED_PROBES}
        ),
        qterms AS (
            SELECT probe_id, probe_start, term FROM (
                SELECT probe_id, probe_start, term,
                       row_number() OVER (PARTITION BY probe_id, probe_start
                                          ORDER BY df, term) AS qrn
                FROM (SELECT probe_id, probe_start, unnest(cts) AS term
                      FROM probes)
                JOIN dfs USING (term)
            ) WHERE qrn <= {QUERY_TERMS}
        ),
        overlap AS (
            SELECT q.probe_id, q.probe_start, p.doc_id, p.start,
                   count(*)::BIGINT AS overlap
            FROM qterms q JOIN post p USING (term)
            GROUP BY 1, 2, 3, 4
        ),
        top AS (
            SELECT * FROM (
                SELECT *, row_number() OVER (
                           PARTITION BY probe_id, probe_start
                           ORDER BY overlap DESC, doc_id, start) AS rn
                FROM overlap
            ) WHERE rn <= {RETR_TOPK}
        ),
        scored AS (
            SELECT
              sum(CASE WHEN doc_id = probe_id AND start = probe_start
                            AND rn = 1 THEN 1 ELSE 0 END)::BIGINT AS n_hit1,
              sum(CASE WHEN doc_id = probe_id AND start = probe_start
                       THEN 1 ELSE 0 END)::BIGINT AS n_hit3,
              sum(CASE WHEN doc_id = probe_id AND start = probe_start
                       THEN 6 // rn ELSE 0 END)::BIGINT AS rr6
            FROM top
        ),
        np AS (SELECT count(*)::BIGINT AS n_probes FROM probes)
        SELECT n_probes, n_hit1, n_hit3,
               round(n_hit1 * 1.0 / n_probes, 6) AS recall_at_1,
               round(n_hit3 * 1.0 / n_probes, 6) AS recall_at_3,
               round(rr6 * 1.0 / (6 * n_probes), 6) AS mrr_at_3
        FROM scored, np
    """,
    "q_batch_padding_eval": f"""
        WITH d AS (
            SELECT doc_id, len({_TOKS_SQL})::BIGINT AS n_tok FROM documents
        ),
        nat AS (
            SELECT n_tok,
                   (row_number() OVER (ORDER BY doc_id) - 1)
                       // {BATCH_SIZE} AS b
            FROM d
        ),
        srt AS (
            SELECT n_tok,
                   (row_number() OVER (ORDER BY n_tok, doc_id) - 1)
                       // {BATCH_SIZE} AS b
            FROM d
        ),
        pn AS (SELECT b, max(n_tok) AS mx, sum(n_tok) AS s,
                      count(*) AS c FROM nat GROUP BY b),
        ps AS (SELECT b, max(n_tok) AS mx, sum(n_tok) AS s,
                      count(*) AS c FROM srt GROUP BY b)
        SELECT 'natural' AS strategy,
               count(*) AS n_batches,
               sum(mx * c - s)::BIGINT AS padded_tokens,
               round(sum(mx * c - s) * 1.0 / sum(mx * c), 6) AS pad_share
        FROM pn
        UNION ALL
        SELECT 'length_sorted', count(*),
               sum(mx * c - s)::BIGINT,
               round(sum(mx * c - s) * 1.0 / sum(mx * c), 6)
        FROM ps
    """,
    "q_raster_slope": f"""
        WITH cells AS (
            SELECT i % {SLOPE_N} AS x, i // {SLOPE_N} AS y,
                   ((i % {SLOPE_N}) * 31 + (i // {SLOPE_N}) * 17) % 97 AS val
            FROM range(0, {SLOPE_N * SLOPE_N}) t(i)
        ),
        off(dx, dy) AS (
            VALUES (-1,-1), (-1,0), (-1,1), (0,-1),
                   (0,1), (1,-1), (1,0), (1,1)
        ),
        scat AS (
            SELECT x - dx AS tx, y - dy AS ty,
                   (CASE WHEN dx = 0 THEN 0
                         ELSE dx * (CASE WHEN dy = 0 THEN 2 ELSE 1 END)
                    END) * val AS wxv,
                   (CASE WHEN dy = 0 THEN 0
                         ELSE dy * (CASE WHEN dx = 0 THEN 2 ELSE 1 END)
                    END) * val AS wyv
            FROM cells, off
            WHERE x - dx BETWEEN 0 AND {SLOPE_N - 1}
              AND y - dy BETWEEN 0 AND {SLOPE_N - 1}
        ),
        g AS (
            SELECT tx, ty, sum(wxv) AS gx, sum(wyv) AS gy,
                   count(*) AS nc
            FROM scat GROUP BY tx, ty
        ),
        s AS (SELECT gx * gx + gy * gy AS ss FROM g WHERE nc = 8)
        SELECT least(9, ss // {SLOPE_CLASS_W})::BIGINT AS steep_class,
               count(*) AS n_cells,
               min(ss)::BIGINT AS min_slope_sq,
               max(ss)::BIGINT AS max_slope_sq,
               round(avg(ss), 6) AS avg_slope_sq
        FROM s GROUP BY steep_class
    """,
    "q_dq_psi_drift": f"""
        WITH o AS (
            SELECT (o_totalprice * 100)::BIGINT AS cents,
                   year(o_orderdate) < {PSI_REF_BEFORE} AS is_ref
            FROM orders
        ),
        bounds AS (SELECT min(cents) AS lo, max(cents) AS hi FROM o),
        binned AS (
            SELECT least({PSI_BINS - 1},
                         ((cents - lo) * {PSI_BINS}) // (hi - lo + 1))
                       AS bin,
                   is_ref
            FROM o, bounds
        ),
        counts AS (
            SELECT bin,
                   sum(CASE WHEN is_ref THEN 1 ELSE 0 END)::BIGINT AS n_ref,
                   sum(CASE WHEN is_ref THEN 0 ELSE 1 END)::BIGINT AS n_cur
            FROM binned GROUP BY bin
        ),
        spine AS (SELECT unnest(range({PSI_BINS})) AS bin),
        full_bins AS (
            SELECT spine.bin,
                   coalesce(n_ref, 0) AS n_ref,
                   coalesce(n_cur, 0) AS n_cur
            FROM spine LEFT JOIN counts ON spine.bin = counts.bin
        ),
        tot AS (SELECT sum(n_ref) AS t_ref, sum(n_cur) AS t_cur
                FROM full_bins)
        SELECT bin, n_ref, n_cur,
               round((n_ref + 1) * 1.0 / (t_ref + {PSI_BINS}), 6) AS p_ref,
               round((n_cur + 1) * 1.0 / (t_cur + {PSI_BINS}), 6) AS p_cur,
               round(floor(((n_ref + 1) * 1.0 / (t_ref + {PSI_BINS})
                            - (n_cur + 1) * 1.0 / (t_cur + {PSI_BINS}))
                     * ln(((n_ref + 1) * 1.0 / (t_ref + {PSI_BINS}))
                          / ((n_cur + 1) * 1.0 / (t_cur + {PSI_BINS})))
                     * {_PSI_GRID} + 0.5) / {_PSI_GRID}, 6) AS psi_term
        FROM full_bins, tot
    """,
}
