"""Round-10 continuation: the two data-SELECTION operators a pretraining
pipeline runs between cleaning and sampling.

- ``q_data_dsir_weights`` — importance-resampling weights in the DSIR
  family (Xie et al. 2023, "Data Selection for Language Models via
  Importance Resampling"): score every document by the mean
  log-likelihood RATIO of its bigrams under a target-domain bigram model
  vs the raw-corpus bigram model (both add-1 smoothed over the raw
  vocabulary universe). Positive weight = "looks more like the target
  than like the average of the pile" — the resampling key DSIR draws
  against. DSIR proper hashes n-grams into a fixed bucket count to bound
  the feature space; this operator keeps raw bigram types (exact DSIR,
  zero collisions) because the feature tables here are bigram-keyed and
  open-vocabulary EXACTLY like q_text_lm_score's probability table — the
  same un-hinted join contract applies (AQE broadcasts at runtime when
  the built side fits; a hashed variant would only shrink that table).

- ``q_data_curriculum_tokens`` — token-budgeted quality selection (the
  "top-p of the corpus by quality score" pass behind quality-ordered
  curricula and budget-capped data diets): order documents by the
  composite quality score (the q_text_quality formula on an exact e6
  integer grid), take the prefix until the cumulative token count
  crosses ``total_tokens / CURRICULUM_BUDGET_DIV``, and report the
  per-source composition of the selected slice. The global ordered
  cumulative sum is the textbook one-reducer trap; it runs through the
  range-bucketed prefix sweep (functions/prefix_sweep.py) in quantile
  mode, so the sweep parallelism follows n_buckets, not the single
  global ordering. Token counts are integers, the quality key is an
  integer grid, and the budget is an integer floor — the selection
  predicate never touches engine-ordered float summation.

Determinism notes (FIXTURES.md cookbook): the DSIR per-bigram log ratio
is one identical IEEE chain per bigram in both engines (``ln((c+1.0)/
(N+V))`` on exact integer counts); the per-doc mean rounds at 6dp — the
q_text_lm_score convention. The curriculum quality key divides by the
PRIME 101 (q_text_quality's trick) so the e6 grid snap never lands on an
engine-divergent half-boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zonal_datacube_spark.functions.prefix_sweep import prefix_sweep
from zonal_datacube_spark.functions.text_funcs import stopword_count, tokens
from zonal_datacube_spark.sources.loader import load_table

# ---------------------------------------------------------------------------
# DSIR importance-resampling weights
# ---------------------------------------------------------------------------

DSIR_TARGET_LANG = "en"  # the target-domain slice the ratio model favors

_TOKS = "string_split(lower(text), ' ')"  # DuckDB-side tokenizer (≡ tokens())


def q_data_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weight per document: the occurrence-weighted
    mean over the doc's bigrams of ``ln(p_target(b)) − ln(p_raw(b))``,
    where p_target is the add-1-smoothed bigram distribution of the
    ``lang = 'en'`` slice and p_raw the same over the whole corpus (both
    smoothed over the raw bigram-type universe V, so target-unseen
    bigrams contribute a well-defined negative evidence term instead of
    −inf). This is the scoring half of importance resampling: the
    downstream sampler draws documents with probability ∝ exp(weight).

    Scale shape: ONE (doc, bigram) explode (persisted — it feeds the raw
    counts, the target counts, and the per-doc attach), two bigram-keyed
    count tables folded map-side, scalar totals broadcast from a one-row
    aggregate, and an un-hinted bigram equi-join back to the occurrence
    table (open-vocabulary key — the q_text_lm_score contract; AQE
    broadcasts the ratio table at runtime whenever it fits). The heavy
    text column never shuffles; every shuffled row is fixed-width."""
    from pyspark.storagelevel import StorageLevel

    t = (
        load_table(spark, sf_dir, "documents")
        .withColumn("t", tokens())
        .filter(F.size("t") >= 2)
    )
    doc_bi = (
        t.select(
            "doc_id",
            "source",
            (F.col("lang") == DSIR_TARGET_LANG).alias("is_target"),
            F.explode(
                F.expr(
                    "transform(sequence(1, size(t) - 1),"
                    " i -> named_struct('w1', element_at(t, i),"
                    "                   'w2', element_at(t, i + 1)))"
                )
            ).alias("b"),
        )
        .select("doc_id", "source", "is_target", "b.w1", "b.w2")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    raw = doc_bi.groupBy("w1", "w2").agg(
        F.count("*").alias("c_raw"),
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("c_tgt"),
    )
    totals = raw.agg(
        F.sum("c_raw").alias("n_raw"),
        F.sum("c_tgt").alias("n_tgt"),
        F.count("*").alias("v_types"),
    )
    # one identical IEEE chain per bigram in both engines: exact integer
    # counts -> (c + 1.0) / (N + V) -> ln; the subtraction is the ratio
    ratios = raw.crossJoin(F.broadcast(totals)).select(
        "w1",
        "w2",
        (
            F.log(
                (F.col("c_tgt") + F.lit(1.0))
                / (F.col("n_tgt") + F.col("v_types"))
            )
            - F.log(
                (F.col("c_raw") + F.lit(1.0))
                / (F.col("n_raw") + F.col("v_types"))
            )
        ).alias("lr"),
    )
    # Scale contract: `ratios` is bigram-keyed and open-vocabulary — NOT
    # broadcast-hinted (the r09/r10 policy for vocabulary-scaled tables);
    # the shuffle hash join is the 100 TB plan, AQE upgrades it at
    # fixture scale.
    return (
        doc_bi.join(ratios, ["w1", "w2"])
        .groupBy("doc_id", "source")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg("lr"), 6).alias("dsir_logratio"),
        )
    )


# ---------------------------------------------------------------------------
# token-budgeted quality curriculum selection
# ---------------------------------------------------------------------------

CURRICULUM_BUDGET_DIV = 4  # keep the top-quality quarter of corpus tokens


def _quality_e6() -> F.Column:
    """The q_text_quality composite on an exact e6 integer grid:
    ``floor(quality · 1e6 + 0.5)`` of ``least(1, n/101) · (1 − stop) ·
    ttr`` — the same expression chain (and the same prime-101 tie
    avoidance) as operators/text.py:98-104, snapped to BIGINT so the
    curriculum ORDER KEY is integer-exact in both engines."""
    n_tok = F.size("t").cast("double")
    ttr = F.size(F.array_distinct("t")) / n_tok
    stop_ratio = stopword_count("t") / n_tok
    quality = F.least(F.lit(1.0), n_tok / 101.0) * (1.0 - stop_ratio) * ttr
    return F.floor(quality * 1e6 + 0.5).cast("bigint")


def q_data_curriculum_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budgeted quality selection: documents ordered by the integer
    quality grid (ties by doc_id), selected while the tokens BEFORE each
    document stay under ``floor(total_tokens / 4)`` — i.e. the crossing
    document is kept, so the slice always covers the budget. The output
    is the per-source composition of the selected slice (docs, tokens,
    and the source's lowest admitted quality), with the budget riding
    every row so the driver's hash compare attests the cut itself.

    Scale shape: the global quality-ordered cumulative token sum is a
    ONE-REDUCER window if written naively; here it runs through the
    range-bucketed prefix sweep in quantile mode (per-bucket windows +
    one bucket-grain offset sweep — functions/prefix_sweep.py), and the
    rollup that follows is a bounded groupBy on source. All selection
    arithmetic is integer-exact: token counts are BIGINTs, the quality
    key is an e6 integer, the budget is one integer floor of a global
    sum (exact below 2^53 tokens — ~9e15, two decades above a 100 TB
    corpus)."""
    per_doc = (
        load_table(spark, sf_dir, "documents")
        .withColumn("t", tokens())
        .select(
            "doc_id",
            "source",
            F.size("t").cast("bigint").alias("n_tokens"),
            _quality_e6().alias("q_e6"),
        )
    )
    swept = prefix_sweep(
        per_doc,
        [],
        "q_e6",
        descending=True,
        tiebreak=["doc_id"],
        sum_cols={"cum_tokens": "n_tokens"},
        total_sum_cols={"total_tokens": "n_tokens"},
        boundaries="quantile",
    )
    budget = F.floor(F.col("total_tokens") / CURRICULUM_BUDGET_DIV).cast(
        "bigint"
    )
    selected = swept.filter(
        (F.col("cum_tokens") - F.col("n_tokens")) < budget
    ).withColumn("budget_tokens", budget)
    return (
        selected.groupBy("source")
        .agg(
            F.count("*").alias("n_docs_selected"),
            F.sum("n_tokens").alias("tokens_selected"),
            F.min("q_e6").alias("min_q_e6"),
            F.any_value("budget_tokens").alias("budget_tokens"),
        )
        .orderBy("source")
    )


QUERIES = {
    "q_data_dsir_weights": q_data_dsir_weights,
    "q_data_curriculum_tokens": q_data_curriculum_tokens,
}

_STOP_FILTER = "list_filter(toks, x -> x = 'the' OR x = 'a')"

ORACLE = {
    "q_data_dsir_weights": f"""
        WITH t AS (
            SELECT doc_id, source, (lang = '{DSIR_TARGET_LANG}') AS is_target,
                   {_TOKS} AS toks
            FROM documents
            WHERE len({_TOKS}) >= 2
        ),
        doc_bi AS (
            SELECT doc_id, source, is_target, toks[i] AS w1, toks[i + 1] AS w2
            FROM t, unnest(range(1, len(toks))) AS u(i)
        ),
        raw AS (
            SELECT w1, w2, count(*) AS c_raw,
                   sum(CASE WHEN is_target THEN 1 ELSE 0 END) AS c_tgt
            FROM doc_bi GROUP BY w1, w2
        ),
        tot AS (
            SELECT sum(c_raw) AS n_raw, sum(c_tgt) AS n_tgt,
                   count(*) AS v_types
            FROM raw
        ),
        ratios AS (
            SELECT w1, w2,
                   ln((c_tgt + 1.0) / (n_tgt + v_types))
                   - ln((c_raw + 1.0) / (n_raw + v_types)) AS lr
            FROM raw CROSS JOIN tot
        )
        SELECT d.doc_id, d.source, count(*) AS n_bigrams,
               round(avg(lr), 6) AS dsir_logratio
        FROM doc_bi d JOIN ratios USING (w1, w2)
        GROUP BY d.doc_id, d.source
    """,
    "q_data_curriculum_tokens": f"""
        WITH t AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
        per_doc AS (
            SELECT doc_id, source, len(toks)::BIGINT AS n_tokens,
                   floor(least(1.0, len(toks) / 101.0)
                         * (1.0 - len({_STOP_FILTER}) * 1.0 / len(toks))
                         * (len(list_distinct(toks)) * 1.0 / len(toks))
                         * 1e6 + 0.5)::BIGINT AS q_e6
            FROM t
        ),
        swept AS (
            SELECT *,
                   sum(n_tokens) OVER (ORDER BY q_e6 DESC, doc_id
                                       ROWS UNBOUNDED PRECEDING)
                       AS cum_tokens,
                   sum(n_tokens) OVER () AS total_tokens
            FROM per_doc
        )
        SELECT source,
               count(*) AS n_docs_selected,
               sum(n_tokens)::BIGINT AS tokens_selected,
               min(q_e6) AS min_q_e6,
               any_value(floor(total_tokens / {CURRICULUM_BUDGET_DIV})::BIGINT)
                   AS budget_tokens
        FROM swept
        WHERE cum_tokens - n_tokens
              < floor(total_tokens / {CURRICULUM_BUDGET_DIV})::BIGINT
        GROUP BY source
        ORDER BY source
    """,
}
