"""Round-5c analytics additions (SURVEY.md §2.18): the remaining
hypothesis-test surface (two-sample Kolmogorov–Smirnov, one-way ANOVA),
a one-pass Pearson correlation matrix from exact integer moments,
training-data curation economics (temperature-scaled source mixture
weights, a first-failing-rule filter funnel ledger, tokenizer fertility),
plus — in the second batch — snapshot time travel, write-audit-publish,
LOCF null repair, degree assortativity, and multi-lag ACF. Each key has
an independent DuckDB oracle.

Determinism (FIXTURES.md cookbook): every statistic here derives from
exact integers — event values quantize to the cent grid (rule 8) so
distributed sums are associativity-exact; products that would overflow
BIGINT ride DECIMAL(38,0) in Spark and HUGEINT in DuckDB (rule 12's
widening, made explicit); final doubles are identical closed forms over
identical integers, display-rounded floor-half-up on the 1e-6 grid
(rule 15). The KS maximum is selected on an INTEGER-scaled statistic
|c1*n2 - c2*n1| so the argmax needs no FP tolerance at all.

Scale notes (100 TB):
- KS collapses both samples to the VALUE GRAIN first (bounded by the
  cent grid's domain, not row count) and sweeps the grain through
  functions/prefix_sweep.py — the Mann-Whitney lesson re-applied; the
  max/argmax is one struct-max aggregate, never a sorted collect.
- ANOVA / correlation-matrix / assortativity are single groupBy moment
  folds — map-side partial aggregation, one reduce, O(groups) rows out.
- mixture weights and fertility aggregate per source/lang (bounded
  dims); the token counting is map-only (F.size over the split — the
  corpus text itself is never shuffled).
- the funnel is one map pass + a 5-row groupBy: each doc is attributed
  to its FIRST failing rule with integer-exact comparisons (k·count vs
  n), so the ledger is reproducible bit-for-bit at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zonal_datacube_spark.functions.prefix_sweep import prefix_sweep
from zonal_datacube_spark.functions.text_funcs import tokens
from zonal_datacube_spark.sources.loader import load_table


def _g6(c):
    """Floor-half-up on the 1e-6 grid — the shared display rounding
    (FIXTURES.md rule 15; F.round's HALF_UP and DuckDB's round disagree
    at double midpoints, floor(x*1e6 + 0.5) does not)."""
    return F.floor(c * 1000000 + F.lit(0.5)) / 1000000


_G6_SQL = "floor(({x}) * 1000000 + 0.5) / 1000000"


def _cents(col):
    """Cent-grid quantization of a double measure (rule 8): every
    statistic downstream of this is integer-exact on both engines."""
    return F.floor(col * 100 + F.lit(0.5)).cast("bigint")


_CENTS_SQL = "CAST(floor(({x}) * 100 + 0.5) AS BIGINT)"


# --------------------------------------------------------------------------
# hypothesis tests
# --------------------------------------------------------------------------

KS_A, KS_B = "view", "click"


def q_stats_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov test between the view and click
    value distributions — the standard drift/shape screen (PSI's
    nonparametric sibling; `q_drift_psi` bins, KS doesn't). Both samples
    collapse to the shared cent-value grain, the two ECDFs come from one
    range-bucketed prefix sweep over that grain, and the decision
    statistic is kept INTEGER-scaled: D·n1·n2 = max|c1·n2 − c2·n1|, so
    the max and its argmax location are exact — no FP tolerance anywhere
    until the final display division. Also emits the α=0.05 two-sample
    threshold c(α)·sqrt((n1+n2)/(n1·n2)) for the read-off."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(KS_A, KS_B)
    )
    grain = ev.groupBy(_cents(F.col("value")).alias("v")).agg(
        F.sum(F.when(F.col("event_type") == KS_A, 1).otherwise(0))
        .cast("bigint")
        .alias("ca"),
        F.sum(F.when(F.col("event_type") == KS_B, 1).otherwise(0))
        .cast("bigint")
        .alias("cb"),
    )
    swept = prefix_sweep(
        grain,
        [],
        "v",
        sum_cols={"cum_a": "ca", "cum_b": "cb"},
        total_sum_cols={"n1": "ca", "n2": "cb"},
        # width, not quantile: the sweep runs at the cent-grid value
        # grain of the bounded events domain — occupancy counts
        # distinct grid values, saturating toward exact balance at
        # scale; see functions/percentiles.py's boundary-mode docstring
        boundaries="width",
    )
    ds = F.abs(
        F.col("cum_a") * F.col("n2") - F.col("cum_b") * F.col("n1")
    ).alias("ds")
    # one struct-max pass: lexicographic (ds, -v) max == max ds, then
    # min v among its attainers — integer fields, so ties break exactly
    scored = swept.select("n1", "n2", ds, (-F.col("v")).alias("negv"))
    m = scored.groupBy("n1", "n2").agg(
        F.max(F.struct("ds", "negv")).alias("m")
    )
    n1d, n2d = F.col("n1").cast("double"), F.col("n2").cast("double")
    return m.select(
        "n1",
        "n2",
        F.col("m.ds").alias("d_scaled"),
        _g6(F.col("m.ds").cast("double") / (n1d * n2d)).alias("d_stat"),
        _g6(F.lit(1.358) * F.sqrt((n1d + n2d) / (n1d * n2d))).alias(
            "d_crit_05"
        ),
        F.round(-F.col("m.negv") / 100.0, 2).alias("ks_at_value"),
    )


def q_stats_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA across the five event types (does mean value differ
    by type?) — the k-group generalization `q_stats_ttest` stops short
    of. Everything folds from per-group (n, Σv, Σv²) on the CENT grid:
    the moments are exact integers, so SSB/SSW/F are identical doubles
    on both engines (the F ratio is scale-invariant, the cent unit
    cancels). One groupBy + one 5-row rollup."""
    ev = load_table(spark, sf_dir, "events")
    g = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(_cents(F.col("value"))).alias("s"),
        F.sum(_cents(F.col("value")) * _cents(F.col("value"))).alias("ss"),
    )
    sd = F.col("s").cast("double")
    rolled = g.agg(
        F.count("*").alias("k"),
        F.sum("n").alias("n_total"),
        F.sum("s").alias("s_tot"),
        F.sum("ss").alias("ss_tot"),
        F.sum(sd * sd / F.col("n").cast("double")).alias("ssq_over_n"),
    )
    st = F.col("s_tot").cast("double")
    nt = F.col("n_total").cast("double")
    ssb = F.col("ssq_over_n") - st * st / nt
    ssw = F.col("ss_tot").cast("double") - F.col("ssq_over_n")
    sst = F.col("ss_tot").cast("double") - st * st / nt
    kd = F.col("k").cast("double")
    f_stat = (ssb / (kd - 1)) / (ssw / (nt - kd))
    return rolled.select(
        "k",
        "n_total",
        _g6(f_stat).alias("f_stat"),
        _g6(ssb / sst).alias("eta_sq"),
    )


_CORR_MEASURES = (
    ("quantity", "l_quantity", 1),
    ("price", "l_extendedprice", 100),
    ("discount", "l_discount", 100),
    ("tax", "l_tax", 100),
)


def q_stats_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation matrix over the four lineitem
    measures in ONE aggregation pass (the EDA screen `q_agg_corr_regr`
    computes for a single pair): each measure quantizes onto its own
    data grid, all 14 moments (4 sums, 4 sums-of-squares, 6 cross
    products) fold in a single map-side-combined groupBy, and the six
    correlations assemble from the moment row via explode — the corpus
    is scanned exactly once however many pairs you ask for. Products
    ride DECIMAL(38,0) (price-cents² sums overflow BIGINT at sf≥0.1);
    DuckDB's HUGEINT widening mirrors it, and both convert the same
    exact integer to the same double before the closed form."""
    li = load_table(spark, sf_dir, "lineitem")
    qcols = {
        name: F.floor(F.col(src) * scale + F.lit(0.5)).cast("decimal(38,0)")
        for name, src, scale in _CORR_MEASURES
    }
    aggs = [F.count("*").alias("n")]
    names = [name for name, _, _ in _CORR_MEASURES]
    for a in names:
        aggs.append(F.sum(qcols[a]).alias(f"s_{a}"))
        aggs.append(F.sum(qcols[a] * qcols[a]).alias(f"ss_{a}"))
    pairs = [
        (names[i], names[j])
        for i in range(len(names))
        for j in range(i + 1, len(names))
    ]
    for a, b in pairs:
        aggs.append(F.sum(qcols[a] * qcols[b]).alias(f"sp_{a}_{b}"))
    row = li.agg(*aggs)
    pair_structs = F.array(
        *[
            F.struct(
                F.lit(a).alias("m_x"),
                F.lit(b).alias("m_y"),
                F.col(f"s_{a}").cast("double").alias("sx"),
                F.col(f"s_{b}").cast("double").alias("sy"),
                F.col(f"ss_{a}").cast("double").alias("sxx"),
                F.col(f"ss_{b}").cast("double").alias("syy"),
                F.col(f"sp_{a}_{b}").cast("double").alias("sxy"),
            )
            for a, b in pairs
        ]
    )
    ex = row.select(
        F.col("n").cast("double").alias("nd"),
        F.col("n").alias("n_rows"),
        F.explode(pair_structs).alias("p"),
    )
    nd, p = F.col("nd"), F.col("p")
    corr = (nd * p.sxy - p.sx * p.sy) / F.sqrt(
        (nd * p.sxx - p.sx * p.sx) * (nd * p.syy - p.sy * p.sy)
    )
    return ex.select(
        p.m_x.alias("m_x"),
        p.m_y.alias("m_y"),
        "n_rows",
        _g6(corr).alias("pearson_r"),
    ).orderBy("m_x", "m_y")


# --------------------------------------------------------------------------
# training-data curation economics
# --------------------------------------------------------------------------


def q_data_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled training-mixture allocation (τ = 0.5, the
    multilingual-sampling standard): per-source token counts → sampling
    shares ∝ sqrt(tokens) → per-source epoch counts against a token
    budget of half the corpus. This is the planning query a pretraining
    data pipeline runs before building its sampler — upsampling factors
    for small sources, downsampling for large ones. Token counts are
    map-only (F.size over the split; the text never shuffles) and the
    allocation arithmetic runs on the bounded 20-source rollup."""
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens()).cast("bigint")).alias("tokens"),
    )
    w = F.sqrt(F.col("tokens").cast("double"))
    scored = per_src.withColumn("w", w)
    totals = scored.agg(
        F.sum("tokens").alias("total_tokens"), F.sum("w").alias("z")
    )
    joined = scored.crossJoin(F.broadcast(totals))
    budget = F.floor(F.col("total_tokens") / 2).cast("double")
    samp_share = F.col("w") / F.col("z")
    return joined.select(
        "source",
        "n_docs",
        "tokens",
        _g6(F.col("tokens").cast("double") / F.col("total_tokens")).alias(
            "nat_share"
        ),
        _g6(samp_share).alias("samp_share"),
        _g6(budget * samp_share / F.col("tokens").cast("double")).alias(
            "epochs"
        ),
    ).orderBy("source")


FUNNEL_MIN_TOKENS = 12
FUNNEL_STOPWORDS = ("the", "a")


def q_text_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter funnel ledger: every document is attributed to its
    FIRST failing rule (lang → min-length → stopword ratio → max-token
    repetition), the per-stage attrition report a C4/Gopher-style
    curation pipeline publishes next to its output. One map pass scores
    all rules, one 5-row groupBy counts; `q_text_prep_pipeline` keeps
    the survivors, this key accounts for the drops. Ratio rules compare
    as integer cross-multiplications (7·stop > n, 6·maxrep > n) so the
    classification is grid-exact on both engines (rule 8)."""
    docs = load_table(spark, sf_dir, "documents").withColumn("t", tokens())
    n = F.size("t")
    stop_arr = F.array(*[F.lit(wd) for wd in FUNNEL_STOPWORDS])
    stop = F.size(F.filter("t", lambda y: F.array_contains(stop_arr, y)))
    maxc = F.array_max(
        F.transform(
            F.array_distinct("t"),
            lambda x: F.size(F.filter("t", lambda y: y == x)),
        )
    )
    stage = (
        F.when(F.col("lang") != "en", "1_lang")
        .when(n < FUNNEL_MIN_TOKENS, "2_too_short")
        .when(stop * 7 > n, "3_stopword_ratio")
        .when(maxc * 6 > n, "4_repetition")
        .otherwise("5_pass")
    )
    staged = docs.select(stage.alias("stage"))
    counts = staged.groupBy("stage").agg(F.count("*").alias("n_docs"))
    total = counts.agg(F.sum("n_docs").alias("n_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "stage",
            "n_docs",
            _g6(F.col("n_docs").cast("double") / F.col("n_total")).alias(
                "share"
            ),
        )
        .orderBy("stage")
    )


_BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility per language: subword-tokens-per-word and
    chars-per-subword-token under the BPE-ish regex tokenizer
    (`q_text_token_regex`'s classes) — the standard readout when
    deciding whether a tokenizer taxes some languages more than others
    (fertility ≈ 1 means near-word-level; high fertility means long
    sequences and higher training cost for that language). Map-only
    integer sums per bounded lang key; the ratios are exact integer
    quotients."""
    docs = load_table(spark, sf_dir, "documents")
    low = F.lower(F.col("text"))
    scored = docs.select(
        "lang",
        F.size(F.split(low, " ")).cast("bigint").alias("words"),
        F.size(F.regexp_extract_all(low, F.lit(_BPE_RE), 0))
        .cast("bigint")
        .alias("bpe"),
        F.length("text").cast("bigint").alias("chars"),
    )
    g = scored.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("words").alias("n_words"),
        F.sum("bpe").alias("n_bpe_tokens"),
        F.sum("chars").alias("n_chars"),
    )
    return g.select(
        "lang",
        "n_docs",
        "n_words",
        "n_bpe_tokens",
        "n_chars",
        _g6(
            F.col("n_bpe_tokens").cast("double")
            / F.col("n_words").cast("double")
        ).alias("fertility"),
        _g6(
            F.col("n_chars").cast("double")
            / F.col("n_bpe_tokens").cast("double")
        ).alias("chars_per_token"),
    ).orderBy("lang")


QUERIES = {
    "q_stats_ks_test": q_stats_ks_test,
    "q_stats_anova": q_stats_anova,
    "q_stats_corr_matrix": q_stats_corr_matrix,
    "q_data_mixture_weights": q_data_mixture_weights,
    "q_text_filter_funnel": q_text_filter_funnel,
    "q_tokenizer_fertility": q_tokenizer_fertility,
}


_TOKS = "string_split(lower(text), ' ')"

ORACLE = {
    "q_stats_ks_test": f"""
        WITH s AS (
            SELECT {_CENTS_SQL.format(x='value')} AS v, event_type AS t
            FROM events WHERE event_type IN ('{KS_A}', '{KS_B}')
        ),
        g AS (
            SELECT v,
                   count_if(t = '{KS_A}')::BIGINT AS ca,
                   count_if(t = '{KS_B}')::BIGINT AS cb
            FROM s GROUP BY v
        ),
        tot AS (
            SELECT sum(ca)::BIGINT AS n1, sum(cb)::BIGINT AS n2 FROM g
        ),
        c AS (
            SELECT v,
                   sum(ca) OVER (ORDER BY v)::BIGINT AS cum_a,
                   sum(cb) OVER (ORDER BY v)::BIGINT AS cum_b
            FROM g
        ),
        d AS (
            SELECT v,
                   abs(cum_a * tot.n2 - cum_b * tot.n1)::BIGINT AS ds
            FROM c, tot
        ),
        m AS (SELECT max(ds)::BIGINT AS md FROM d)
        SELECT tot.n1, tot.n2, m.md AS d_scaled,
               {_G6_SQL.format(x='m.md::DOUBLE / (tot.n1::DOUBLE * tot.n2::DOUBLE)')}
                   AS d_stat,
               {_G6_SQL.format(x='1.358 * sqrt((tot.n1::DOUBLE + tot.n2::DOUBLE) / (tot.n1::DOUBLE * tot.n2::DOUBLE))')}
                   AS d_crit_05,
               round(min(d.v) / 100.0, 2) AS ks_at_value
        FROM d, m, tot
        WHERE d.ds = m.md
        GROUP BY tot.n1, tot.n2, m.md
    """,
    "q_stats_anova": f"""
        WITH q AS (
            SELECT event_type, {_CENTS_SQL.format(x='value')} AS v
            FROM events
        ),
        g AS (
            SELECT event_type, count(*)::BIGINT AS n,
                   sum(v)::BIGINT AS s, sum(v * v)::BIGINT AS ss
            FROM q GROUP BY event_type
        ),
        r AS (
            SELECT count(*)::BIGINT AS k,
                   sum(n)::BIGINT AS n_total,
                   sum(s)::BIGINT AS s_tot,
                   sum(ss)::BIGINT AS ss_tot,
                   sum(s::DOUBLE * s::DOUBLE / n::DOUBLE) AS ssq_over_n
            FROM g
        )
        SELECT k, n_total,
               {_G6_SQL.format(x='((ssq_over_n - s_tot::DOUBLE * s_tot::DOUBLE / n_total::DOUBLE) / (k::DOUBLE - 1)) / ((ss_tot::DOUBLE - ssq_over_n) / (n_total::DOUBLE - k::DOUBLE))')}
                   AS f_stat,
               {_G6_SQL.format(x='(ssq_over_n - s_tot::DOUBLE * s_tot::DOUBLE / n_total::DOUBLE) / (ss_tot::DOUBLE - s_tot::DOUBLE * s_tot::DOUBLE / n_total::DOUBLE)')}
                   AS eta_sq
        FROM r
    """,
    "q_stats_corr_matrix": None,  # assembled below
    "q_data_mixture_weights": f"""
        WITH per_src AS (
            SELECT source, count(*)::BIGINT AS n_docs,
                   sum(len({_TOKS}))::BIGINT AS tokens
            FROM documents GROUP BY source
        ),
        t AS (
            SELECT sum(tokens)::BIGINT AS total_tokens,
                   sum(sqrt(tokens::DOUBLE)) AS z
            FROM per_src
        )
        SELECT source, n_docs, tokens,
               {_G6_SQL.format(x='tokens::DOUBLE / t.total_tokens')}
                   AS nat_share,
               {_G6_SQL.format(x='sqrt(tokens::DOUBLE) / t.z')}
                   AS samp_share,
               {_G6_SQL.format(x='(t.total_tokens // 2)::DOUBLE * (sqrt(tokens::DOUBLE) / t.z) / tokens::DOUBLE')}
                   AS epochs
        FROM per_src, t
        ORDER BY source
    """,
    "q_text_filter_funnel": f"""
        WITH f AS (
            SELECT lang, {_TOKS} AS toks FROM documents
        ),
        scored AS (
            SELECT lang, len(toks) AS n,
                   len(list_filter(toks, y -> y = 'the' OR y = 'a'))
                       AS stop,
                   list_max(list_transform(list_distinct(toks),
                       x -> len(list_filter(toks, y -> y = x)))) AS maxc
            FROM f
        ),
        staged AS (
            SELECT CASE
                WHEN lang <> 'en' THEN '1_lang'
                WHEN n < {FUNNEL_MIN_TOKENS} THEN '2_too_short'
                WHEN stop * 7 > n THEN '3_stopword_ratio'
                WHEN maxc * 6 > n THEN '4_repetition'
                ELSE '5_pass' END AS stage
            FROM scored
        ),
        c AS (
            SELECT stage, count(*)::BIGINT AS n_docs FROM staged
            GROUP BY stage
        ),
        t AS (SELECT sum(n_docs)::BIGINT AS n_total FROM c)
        SELECT stage, n_docs,
               {_G6_SQL.format(x='n_docs::DOUBLE / t.n_total')} AS share
        FROM c, t ORDER BY stage
    """,
    "q_tokenizer_fertility": f"""
        WITH s AS (
            SELECT lang,
                   len(string_split(lower(text), ' '))::BIGINT AS words,
                   len(regexp_extract_all(lower(text), '{_BPE_RE}'))::BIGINT
                       AS bpe,
                   len(text)::BIGINT AS chars
            FROM documents
        ),
        g AS (
            SELECT lang, count(*)::BIGINT AS n_docs,
                   sum(words)::BIGINT AS n_words,
                   sum(bpe)::BIGINT AS n_bpe_tokens,
                   sum(chars)::BIGINT AS n_chars
            FROM s GROUP BY lang
        )
        SELECT lang, n_docs, n_words, n_bpe_tokens, n_chars,
               {_G6_SQL.format(x='n_bpe_tokens::DOUBLE / n_words::DOUBLE')}
                   AS fertility,
               {_G6_SQL.format(x='n_chars::DOUBLE / n_bpe_tokens::DOUBLE')}
                   AS chars_per_token
        FROM g ORDER BY lang
    """,
}


def _corr_oracle() -> str:
    """The 6-pair correlation matrix oracle, assembled from the same
    (name, column, grid-scale) table the Spark side uses so the two can
    never disagree on quantization."""
    qexpr = {
        name: f"CAST(floor(({src}) * {scale} + 0.5) AS BIGINT)"
        for name, src, scale in _CORR_MEASURES
    }
    names = [name for name, _, _ in _CORR_MEASURES]
    moments = ["count(*)::BIGINT AS n"]
    for a in names:
        moments.append(f"sum({qexpr[a]}::HUGEINT) AS s_{a}")
        moments.append(
            f"sum({qexpr[a]}::HUGEINT * {qexpr[a]}::HUGEINT) AS ss_{a}"
        )
    pairs = [
        (names[i], names[j])
        for i in range(len(names))
        for j in range(i + 1, len(names))
    ]
    for a, b in pairs:
        moments.append(
            f"sum({qexpr[a]}::HUGEINT * {qexpr[b]}::HUGEINT) AS sp_{a}_{b}"
        )
    selects = []
    for a, b in pairs:
        corr = (
            f"(n::DOUBLE * sp_{a}_{b}::DOUBLE - s_{a}::DOUBLE * s_{b}::DOUBLE)"
            f" / sqrt((n::DOUBLE * ss_{a}::DOUBLE - s_{a}::DOUBLE * s_{a}::DOUBLE)"
            f" * (n::DOUBLE * ss_{b}::DOUBLE - s_{b}::DOUBLE * s_{b}::DOUBLE))"
        )
        selects.append(
            f"SELECT '{a}' AS m_x, '{b}' AS m_y, n AS n_rows, "
            f"{_G6_SQL.format(x=corr)} AS pearson_r FROM m"
        )
    return (
        "WITH m AS (SELECT "
        + ", ".join(moments)
        + " FROM lineitem) "
        + " UNION ALL ".join(selects)
        + " ORDER BY m_x, m_y"
    )


ORACLE["q_stats_corr_matrix"] = _corr_oracle()
