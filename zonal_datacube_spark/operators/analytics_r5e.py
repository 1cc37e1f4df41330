"""Round-5e additions (SURVEY.md §2.18, third batch): privacy auditing
and governance (k-anonymity census, randomized-response private counts),
statistical process control (x-bar chart), exact-ranked BM25 retrieval,
and Theil–Sen robust trend estimation. Each key has an independent
DuckDB oracle.

Determinism (FIXTURES.md cookbook): randomness is md5-hash-derived
(engine-bit-identical, the q_sample_hash idiom); money and values ride
the cent grid (rule 8); every ranking/threshold decision is made on
exact integers or on doubles produced by ONE correctly-rounded IEEE
division of exact integers (never an accumulated float) — BM25's rank
key is the rational 10·S·tf / (10·S·tf + 3·S + 9·n·dl) and the control
chart compares SQUARED deviations (no sqrt in the decision); display
doubles floor-half-up on the 1e-6 grid (rule 15).

Scale notes (100 TB):
- k-anonymity is one groupBy on the quasi-identifier tuple + a bounded
  class-size rollup — map-side combine does the heavy lifting; the
  risky-rows census never materializes per-row risk.
- randomized response is a pure map pass (hash → flip/replace) into a
  5-row aggregate; the debiasing arithmetic runs on the rollup.
- the control chart folds exact daily moments (grain = type×day,
  time-bounded) and flags via squared-deviation comparisons.
- BM25 filters to docs CONTAINING each term BEFORE ranking (postings-
  list semantics: the window only sees matching docs), computes corpus
  stats once, and broadcasts them; top-k per term via one rank window
  over the filtered postings.
- Theil–Sen runs over the bounded type×day grain: the pairwise-slope
  self-join is grain², not rows², and the grain is time-bounded — the
  standard way a robust trend survives 100 TB of raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zonal_datacube_spark.functions.prefix_sweep import prefix_sweep
from zonal_datacube_spark.sources.loader import load_table


def _g6(c):
    """Floor-half-up on the 1e-6 grid (FIXTURES.md rule 15)."""
    return F.floor(c * 1000000 + F.lit(0.5)) / 1000000


_G6_SQL = "floor(({x}) * 1000000 + 0.5) / 1000000"


def _cents(col):
    return F.floor(col * 100 + F.lit(0.5)).cast("bigint")


_CENTS_SQL = "CAST(floor(({x}) * 100 + 0.5) AS BIGINT)"


# --------------------------------------------------------------------------
# privacy / governance
# --------------------------------------------------------------------------

K_ANON_K = 5


def q_privacy_k_anon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit of the customer table under the quasi-identifier
    (nation, market segment, account-balance kilo-band) — the census a
    governance review runs before a dataset leaves its enclave: how many
    equivalence classes exist, how small is the smallest, and what share
    of ROWS sit in classes below k=5 (those rows are re-identifiable by
    the QI alone). One groupBy on the QI tuple, one bounded rollup."""
    cust = load_table(spark, sf_dir, "customer")
    qi = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
    )
    classes = qi.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.count("*").alias("s")
    )
    return classes.agg(
        F.sum("s").alias("n_rows"),
        F.count("*").alias("n_classes"),
        F.min("s").alias("min_class_size"),
        F.sum((F.col("s") == 1).cast("bigint")).alias("n_singleton_classes"),
        F.sum(F.when(F.col("s") < K_ANON_K, F.col("s")).otherwise(0)).alias(
            "n_rows_risky"
        ),
    ).select(
        "n_rows",
        "n_classes",
        "min_class_size",
        "n_singleton_classes",
        "n_rows_risky",
        _g6(
            F.col("n_rows_risky").cast("double")
            / F.col("n_rows").cast("double")
        ).alias("risky_share"),
    )


RR_TYPES = ("click", "error", "purchase", "signup", "view")
RR_FLIP_NUM = 64  # flip probability p = 64/256 = 1/4, exact


def _hex_digit(expr: str, pos: int) -> str:
    """SQL for one md5 hex digit as 0..15 (engine-portable)."""
    return (
        f"(locate(substr(md5({expr}), {pos}, 1), '0123456789abcdef') - 1)"
    )


def q_privacy_rr_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Randomized-response private counting (Warner 1965, the local-DP
    mechanism): each event reports its TRUE type with probability 3/4,
    otherwise a hash-chosen uniform type — then the per-type count is
    debiased with the exact closed form est = (obs − p·n/5)/(1−p). All
    coins are md5-derived (first two hex digits → flip bucket, third →
    replacement type), so both engines toss IDENTICAL coins and the
    whole mechanism is replayable; the debiasing runs in exact integer
    arithmetic until one final division. Reports observed vs debiased vs
    true counts and the signed estimation error per type."""
    ev = load_table(spark, sf_dir, "events")
    h = "cast(event_id as string)"
    bucket = F.expr(
        f"{_hex_digit(h, 1)} * 16 + {_hex_digit(h, 2)}"
    ).cast("int")
    repl_idx = F.expr(_hex_digit(h, 3)).cast("int") % len(RR_TYPES)
    types_arr = F.array(*[F.lit(t) for t in RR_TYPES])
    reported = F.when(
        bucket < RR_FLIP_NUM, F.element_at(types_arr, repl_idx + F.lit(1))
    ).otherwise(F.col("event_type"))
    noised = ev.select(
        "event_type", reported.alias("reported")
    )
    obs = noised.groupBy(F.col("reported").alias("t")).agg(
        F.count("*").alias("observed")
    )
    true = noised.groupBy(F.col("event_type").alias("t")).agg(
        F.count("*").alias("true_count")
    )
    total = noised.agg(F.count("*").alias("n"))
    k = len(RR_TYPES)
    joined = (
        obs.join(true, "t", "full_outer")
        .crossJoin(F.broadcast(total))
        .select(
            "t",
            F.coalesce("observed", F.lit(0)).alias("observed"),
            F.coalesce("true_count", F.lit(0)).alias("true_count"),
            "n",
        )
    )
    # est = (obs - n·p/k) / (1-p) with p = 1/4, k = 5:
    #     = (20·obs - n) / 15  — exact integer numerator, one division
    est = (F.col("observed") * 20 - F.col("n")).cast("double") / 15.0
    return joined.select(
        "t",
        "observed",
        "true_count",
        _g6(est).alias("estimated"),
        _g6(est - F.col("true_count").cast("double")).alias("est_error"),
    ).orderBy("t")


# --------------------------------------------------------------------------
# statistical process control
# --------------------------------------------------------------------------


def q_dq_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-bar control chart per event type: each day is a subgroup, the
    center line is the pooled mean S/N and the limits are ±3σ/√n_d with
    the pooled population σ — the monitoring chart a data-quality SLA
    dashboard renders. Every moment is an exact cent-grid integer; the
    out-of-control DECISION compares squared deviations ((x̄_d − c)² ·
    n_d · N² > 9·σ²·N² …) entirely in arithmetic both engines perform
    identically on the same exact integers — no sqrt, no tolerance.
    Reports per-type day census, out-of-control day count, and the
    worst day's deviation."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("d")
    ).agg(
        F.count("*").alias("nd"),
        F.sum(_cents(F.col("value"))).alias("sd"),
    )
    tot = daily.groupBy("event_type").agg(
        F.sum("nd").alias("n"),
        F.sum("sd").alias("s"),
    )
    # pooled second moment must come from the raw rows, not daily sums
    tot2 = ev.groupBy("event_type").agg(
        F.sum(_cents(F.col("value")) * _cents(F.col("value"))).alias("ss")
    )
    stats = tot.join(tot2, "event_type")
    j = daily.join(F.broadcast(stats), "event_type")
    nd, sd = F.col("nd").cast("double"), F.col("sd").cast("double")
    n, s, ss = (
        F.col("n").cast("double"),
        F.col("s").cast("double"),
        F.col("ss").cast("double"),
    )
    xbar = sd / nd
    center = s / n
    var = ss / n - center * center  # population variance, exact-int inputs
    dev_sq = (xbar - center) * (xbar - center)
    ooc = dev_sq * nd > F.lit(9.0) * var
    flagged = j.select(
        "event_type",
        "nd",
        ooc.alias("ooc"),
        dev_sq.alias("dev_sq"),
        center.alias("center"),
        var.alias("var"),
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count("*").alias("n_days"),
            F.sum(F.col("ooc").cast("bigint")).alias("n_ooc_days"),
            F.max("dev_sq").alias("max_dev_sq"),
            F.first("center").alias("c"),
            F.first("var").alias("v"),
        )
        .select(
            "event_type",
            "n_days",
            "n_ooc_days",
            _g6(F.col("c") / 100).alias("center_line"),
            _g6(F.sqrt(F.col("v")) / 100).alias("sigma"),
            _g6(F.sqrt(F.col("max_dev_sq")) / 100).alias("max_day_dev"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# BM25 retrieval
# --------------------------------------------------------------------------

BM25_TERMS = ("scan", "window", "join")
BM25_TOPK = 5
# k1 = 1.2, b = 0.75 — written as exact ratios in the rank key


def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-5 retrieval for three single-term queries — the lexical
    ranking half of every retrieval pipeline. The novelty is the EXACT
    rank key: for one term, BM25 ordering reduces to the rational
    10·S·tf / (10·S·tf + 3·S + 9·n·dl) (k1=6/5, b=3/4 cleared of
    denominators; S=Σdl, n=docs), ONE correctly-rounded division of
    exact integers — so the ranking is bit-identical across engines with
    doc_id as the total tiebreak, sidestepping rule 8's float-rank trap
    entirely. The displayed bm25 score (with its ln idf) is display-only.

    Scale (VERDICT r05 weak #1): postings are corpus-sized, so the rank
    window must NEVER see them. Per term, the top-k threshold comes from
    an ``orderBy(rk desc, doc_id).limit(k)`` — Spark plans that as
    TakeOrderedAndProject (per-partition heaps, no global sort) — and
    only rows with ``rk >= threshold`` reach the ranking window: every
    final top-k row has rk ≥ the k-th row's rk, so the candidate set
    contains the answer and is (k + ties)-sized, not corpus-sized. Three
    constant terms → three heap scans, same asymptote as
    q_sort_limit_with_ties (analytics_ext.py)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("toks")
    )
    def _tf(term: str):
        # one-arg lambda on purpose: a two-arg callable would be treated
        # as (element, index) by F.filter
        return (
            F.size(F.filter("toks", lambda y: y == F.lit(term)))
            .cast("bigint")
            .alias(f"tf_{term}")
        )

    scored = docs.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("dl"),
        *[_tf(t) for t in BM25_TERMS],
    )
    corpus = scored.agg(
        F.count("*").alias("n"),
        F.sum("dl").alias("s"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("bigint")).alias(f"df_{t}")
            for t in BM25_TERMS
        ],
    )
    postings = scored.select(
        "doc_id",
        "dl",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("term"),
                        F.col(f"tf_{t}").alias("tf"),
                    )
                    for t in BM25_TERMS
                ]
            )
        ).alias("p"),
    ).select("doc_id", "dl", "p.term", "p.tf").filter(F.col("tf") > 0)
    j = postings.crossJoin(F.broadcast(corpus))
    df_col = F.when(F.col("term") == BM25_TERMS[0], F.col(f"df_{BM25_TERMS[0]}"))
    for t in BM25_TERMS[1:]:
        df_col = df_col.when(F.col("term") == t, F.col(f"df_{t}"))
    tf, dl = F.col("tf").cast("double"), F.col("dl").cast("double")
    n, s = F.col("n").cast("double"), F.col("s").cast("double")
    num = F.col("tf") * 10 * F.col("s")
    den = num + 3 * F.col("s") + 9 * F.col("n") * F.col("dl")
    rank_key = num.cast("double") / den.cast("double")
    dfd = df_col.cast("double")
    idf = F.log((n - dfd + 0.5) / (dfd + 0.5) + 1.0)
    k_term = F.lit(0.3) + F.lit(0.9) * dl * n / s
    bm25 = idf * tf * 2.2 / (tf + k_term)
    scored_posts = j.select(
        "term",
        "doc_id",
        "tf",
        "dl",
        rank_key.alias("rk"),
        _g6(bm25).alias("bm25"),
    )
    # per-term lazy top-k threshold: each is a TakeOrderedAndProject over
    # a term-filtered scan (distributed heaps), reduced to one scalar row
    thr = None
    for t in BM25_TERMS:
        t_thr = (
            scored_posts.filter(F.col("term") == t)
            .select("rk", "doc_id")
            .orderBy(F.col("rk").desc(), F.col("doc_id").asc())
            .limit(BM25_TOPK)
            .agg(F.lit(t).alias("term"), F.min("rk").alias("rk_thr"))
        )
        thr = t_thr if thr is None else thr.unionByName(t_thr)
    cand = scored_posts.join(F.broadcast(thr), "term").filter(
        F.col("rk") >= F.col("rk_thr")
    )
    # the window now sorts only (k + ties) candidate rows per term
    ranked = cand.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("term").orderBy(
                F.col("rk").desc(), F.col("doc_id").asc()
            )
        ),
    )
    return (
        ranked.filter(F.col("rank") <= BM25_TOPK)
        .select("term", "rank", "doc_id", "tf", "dl", "bm25")
        .orderBy("term", "rank")
    )


WAND_TOPK = 10
# quantization grids for the integer impact algebra (all floor divisions,
# identical in Spark `div` and DuckDB `//`)
_W_LEN = 1_000_000  # normalized-length grid
_W_SAT = 1_000_000  # tf-saturation grid (impacts land on [0, 1e6] per unit w)
_W_IDF = 1_000  # rational-idf weight grid


def q_text_bm25_wand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Impact-ordered disjunctive top-k (the WAND/JASS pruning tier,
    VERDICT r08 next-round #9): one 3-term OR query over the corpus,
    scored by QUANTIZED INTEGER impacts — exactly the trick
    impact-ordered indexes use (JASS stores small-int quantized scores),
    and here it also makes every engine comparison exact, sidestepping
    the float-rank trap without the single-term rational-key restriction
    of q_text_bm25. Impact algebra (all floor divs of bigints):
    normalized length L = (9e6·n·dl) div s; saturation
    sat = (1e7·1e6·tf) div (1e7·tf + 3e6 + L) ∈ [0, 1e6]; rational-idf
    weight w = (1e3·(2n−2df+1)) div (2df+1) — the BM25 odds ratio
    without the ln, monotone in true idf; impact = w·sat, doc score =
    Σ impacts. int64 bound (ADVICE r09, stated jointly): the binding
    numerator is l_norm's 9e6·n·dl, so the algebra is exact while
    n·dl ≤ ~1e12 — e.g. 4·10⁹ docs at ≤ 250 tokens each, or 10⁹ docs
    at ≤ 1 000 tokens (the other numerators bound lower: w·sat ≤ 2e18
    needs only n ≤ 10⁹·avg_df ratios). Past that point both engines
    fail loudly under this repo's sessions (Spark 4 defaults to ANSI
    mode, so it raises ARITHMETIC_OVERFLOW exactly like DuckDB; a
    non-ANSI deployment would wrap silently instead) — a corpus beyond
    the bound needs the l_norm numerator lifted to DECIMAL before the
    div (documented bound, not a silent contract).

    The WAND machinery, re-expressed batch-first:
    1. SEED: per-term top-k postings by impact (TakeOrderedAndProject
       heaps — never a global sort), unioned and summed per doc: each
       partial sum is a LOWER BOUND on that doc's full score, and the
       k-th largest lower bound is the entry threshold θ.
    2. PRUNE (the WAND upper-bound argument): a doc's full score is at
       most |q|·(its max posting impact), so any doc whose every posting
       has impact·|q| < θ is safely out — with integer impacts the bound
       is strict: 3·floor((θ−1)/3) ≤ θ−1 < θ. One filter over the
       postings, no per-doc state.
    3. RESCUE: survivors' FULL posting lists rescore exactly (semi-join
       + sum), and the final top-k comes from another TakeOrdered limit;
       ≥ k docs score ≥ θ by construction, so no pruned doc can reach
       the answer — the prune is lossless, same proof shape as the
       dedup prefix filter. The k-row rank window runs on the ≤ k-row
       limit result (whitelisted bounded no-partition window)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower(F.col("text")), " ").alias("toks")
    )
    per_doc = docs.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("dl"),
        *[
            F.size(F.filter("toks", lambda y: y == F.lit(t)))
            .cast("bigint")
            .alias(f"tf_{t}")
            for t in BM25_TERMS
        ],
    )
    corpus = per_doc.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("dl").alias("s"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("bigint")).alias(f"df_{t}")
            for t in BM25_TERMS
        ],
    )
    raw_posts = per_doc.select(
        "doc_id",
        "dl",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(t).alias("term"), F.col(f"tf_{t}").alias("tf")
                    )
                    for t in BM25_TERMS
                ]
            )
        ).alias("p"),
    ).select("doc_id", "dl", "p.term", "p.tf").filter(F.col("tf") > 0)
    df_col = F.when(
        F.col("term") == BM25_TERMS[0], F.col(f"df_{BM25_TERMS[0]}")
    )
    for t in BM25_TERMS[1:]:
        df_col = df_col.when(F.col("term") == t, F.col(f"df_{t}"))
    postings = (
        raw_posts.crossJoin(F.broadcast(corpus))
        .withColumn("df", df_col)
        .withColumn("l_norm", F.expr(f"(9 * n * dl * {_W_LEN}) div s"))
        .withColumn(
            "sat",
            F.expr(
                f"(tf * 10000000 * {_W_SAT})"
                f" div (tf * 10000000 + 3000000 + l_norm)"
            ),
        )
        .withColumn(
            "w", F.expr(f"((2 * n - 2 * df + 1) * {_W_IDF}) div (2 * df + 1)")
        )
        .select("term", "doc_id", (F.col("w") * F.col("sat")).alias("impact"))
    )
    seeds = None
    for t in BM25_TERMS:
        t_top = (
            postings.filter(F.col("term") == t)
            .orderBy(F.col("impact").desc(), F.col("doc_id").asc())
            .limit(WAND_TOPK)
        )
        seeds = t_top if seeds is None else seeds.unionByName(t_top)
    theta = (
        seeds.groupBy("doc_id")
        .agg(F.sum("impact").alias("lb"))
        .orderBy(F.col("lb").desc(), F.col("doc_id").asc())
        .limit(WAND_TOPK)
        .agg(F.min("lb").alias("theta"))
    )
    survivors = (
        postings.crossJoin(F.broadcast(theta))
        .filter(F.col("impact") * len(BM25_TERMS) >= F.col("theta"))
        .select("doc_id")
        .distinct()
    )
    exact = (
        postings.join(survivors, "doc_id", "left_semi")
        .groupBy("doc_id")
        .agg(
            F.sum("impact").alias("score"),
            F.count("*").cast("bigint").alias("n_terms"),
        )
    )
    topk = exact.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(
        WAND_TOPK
    )
    return (
        topk.withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("score").desc(), F.col("doc_id").asc())
            ),
        )
        .select("rank", "doc_id", "score", "n_terms")
        .orderBy("rank")
    )


# --------------------------------------------------------------------------
# Theil–Sen robust trend
# --------------------------------------------------------------------------


def q_ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per event type: the LOWER MEDIAN of all
    pairwise slopes between daily mean values — the outlier-proof slope
    a monitoring system prefers over OLS (one wild day cannot move it).
    Daily means are single divisions of exact cent/count integers, day
    distances are exact integer day diffs, so every slope is ONE IEEE
    division both engines round identically; the median picks the
    k=(m+1)÷2-th smallest with (slope, day-pair) total order. The
    pairwise self-join runs on the bounded type×day grain (grain², not
    rows²).

    Scale (VERDICT r05 weak #2): the pairs table is day-grain² — time-
    bounded, not data-scaled, but multi-year corpora still put 10⁶–10⁷
    rows behind each of 5 event_type reducers. The median rank therefore
    rides the range-bucketed two-level prefix sweep
    (functions/prefix_sweep.py row_number, the Mann-Whitney precedent):
    parallelism is type×64 value buckets, and the pair count comes from
    the sweep's bucket-grain totals for free."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(
            F.date_trunc("day", "ts"), F.lit("1970-01-01").cast("date")
        ).alias("d"),
    ).agg(
        F.count("*").alias("nd"),
        F.sum(_cents(F.col("value"))).alias("sd"),
    )
    a = daily.select(
        "event_type",
        F.col("d").alias("d1"),
        (F.col("sd").cast("double") / F.col("nd").cast("double")).alias("v1"),
    )
    b = daily.select(
        "event_type",
        F.col("d").alias("d2"),
        (F.col("sd").cast("double") / F.col("nd").cast("double")).alias("v2"),
    )
    pairs = a.join(b, "event_type").filter(F.col("d1") < F.col("d2"))
    # nullif-guarded denominator: the d1 < d2 filter makes d2 − d1 > 0
    # for every SURVIVING row, but under ANSI mode that guarantee is
    # only as strong as Catalyst's predicate ordering — an added
    # conjunct (observed with an experimental sampling filter in the
    # downstream sweep) can evaluate an expression containing this
    # division before the d1 < d2 conjunct and raise DIVIDE_BY_ZERO on
    # a d1 == d2 row. nullif makes the expression total (NULL, never an
    # error) with identical values on all surviving rows.
    slopes = pairs.select(
        "event_type",
        "d1",
        "d2",
        (
            (F.col("v2") - F.col("v1"))
            / F.nullif((F.col("d2") - F.col("d1")).cast("double"), F.lit(0.0))
        ).alias("slope"),
    )
    ranked = prefix_sweep(
        slopes,
        ["event_type"],
        "slope",
        tiebreak=["d1", "d2"],
        row_number_col="rn",
        total_count_col="n_pairs",
        boundaries="quantile",
    )
    med = ranked.filter(
        F.col("rn") == F.floor((F.col("n_pairs") + 1) / 2)
    )
    days = daily.groupBy("event_type").agg(F.count("*").alias("n_days"))
    return (
        med.join(F.broadcast(days), "event_type")
        .select(
            "event_type",
            "n_days",
            "n_pairs",
            _g6(F.col("slope") / 100).alias("median_slope"),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "q_privacy_k_anon": q_privacy_k_anon,
    "q_privacy_rr_count": q_privacy_rr_count,
    "q_dq_control_chart": q_dq_control_chart,
    "q_text_bm25": q_text_bm25,
    "q_text_bm25_wand": q_text_bm25_wand,
    "q_ts_theil_sen": q_ts_theil_sen,
}


ORACLE = {
    "q_privacy_k_anon": f"""
        WITH classes AS (
            SELECT c_nationkey, c_mktsegment,
                   CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
                   count(*)::BIGINT AS s
            FROM customer GROUP BY 1, 2, 3
        )
        SELECT sum(s)::BIGINT AS n_rows,
               count(*)::BIGINT AS n_classes,
               min(s)::BIGINT AS min_class_size,
               count_if(s = 1)::BIGINT AS n_singleton_classes,
               sum(CASE WHEN s < {K_ANON_K} THEN s ELSE 0 END)::BIGINT
                   AS n_rows_risky,
               {_G6_SQL.format(x="sum(CASE WHEN s < " + str(K_ANON_K) + " THEN s ELSE 0 END)::DOUBLE / sum(s)::DOUBLE")}
                   AS risky_share
        FROM classes
    """,
    "q_privacy_rr_count": None,  # assembled below
    "q_dq_control_chart": f"""
        WITH daily AS (
            SELECT event_type, date_trunc('day', ts) AS d,
                   count(*)::BIGINT AS nd,
                   sum({_CENTS_SQL.format(x='value')})::BIGINT AS sd
            FROM events GROUP BY 1, 2
        ),
        tot AS (
            SELECT event_type, count(*)::BIGINT AS n,
                   sum({_CENTS_SQL.format(x='value')})::BIGINT AS s,
                   sum({_CENTS_SQL.format(x='value')}::HUGEINT
                       * {_CENTS_SQL.format(x='value')}::HUGEINT) AS ss
            FROM events GROUP BY 1
        ),
        j AS (
            SELECT daily.event_type, nd,
                   (sd::DOUBLE / nd::DOUBLE - s::DOUBLE / n::DOUBLE)
                       * (sd::DOUBLE / nd::DOUBLE - s::DOUBLE / n::DOUBLE)
                       AS dev_sq,
                   s::DOUBLE / n::DOUBLE AS c,
                   ss::DOUBLE / n::DOUBLE
                       - (s::DOUBLE / n::DOUBLE) * (s::DOUBLE / n::DOUBLE)
                       AS v
            FROM daily JOIN tot USING (event_type)
        )
        SELECT event_type, count(*)::BIGINT AS n_days,
               count_if(dev_sq * nd::DOUBLE > 9.0 * v)::BIGINT AS n_ooc_days,
               {_G6_SQL.format(x='any_value(c) / 100')} AS center_line,
               {_G6_SQL.format(x='sqrt(any_value(v)) / 100')} AS sigma,
               {_G6_SQL.format(x='sqrt(max(dev_sq)) / 100')} AS max_day_dev
        FROM j GROUP BY event_type ORDER BY event_type
    """,
    "q_text_bm25": None,  # assembled below
    "q_text_bm25_wand": None,  # assembled below
    "q_ts_theil_sen": f"""
        WITH daily AS (
            SELECT event_type,
                   date_diff('day', DATE '1970-01-01',
                             CAST(date_trunc('day', ts) AS DATE)) AS d,
                   count(*)::BIGINT AS nd,
                   sum({_CENTS_SQL.format(x='value')})::BIGINT AS sd
            FROM events GROUP BY 1, 2
        ),
        slopes AS (
            SELECT a.event_type, a.d AS d1, b.d AS d2,
                   (b.sd::DOUBLE / b.nd::DOUBLE
                    - a.sd::DOUBLE / a.nd::DOUBLE)
                       / (b.d - a.d)::DOUBLE AS slope
            FROM daily a JOIN daily b
              ON a.event_type = b.event_type AND a.d < b.d
        ),
        ranked AS (
            SELECT event_type, slope,
                   row_number() OVER (
                       PARTITION BY event_type ORDER BY slope, d1, d2
                   ) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n_pairs
            FROM slopes
        ),
        days AS (
            SELECT event_type, count(*)::BIGINT AS n_days
            FROM daily GROUP BY event_type
        )
        SELECT ranked.event_type, days.n_days,
               n_pairs::BIGINT AS n_pairs,
               {_G6_SQL.format(x='slope / 100')} AS median_slope
        FROM ranked JOIN days USING (event_type)
        WHERE rn = (n_pairs + 1) // 2
        ORDER BY event_type
    """,
}


def _rr_oracle() -> str:
    hex1 = "(strpos('0123456789abcdef', substr(md5(CAST(event_id AS VARCHAR)), 1, 1)) - 1)"
    hex2 = "(strpos('0123456789abcdef', substr(md5(CAST(event_id AS VARCHAR)), 2, 1)) - 1)"
    hex3 = "(strpos('0123456789abcdef', substr(md5(CAST(event_id AS VARCHAR)), 3, 1)) - 1)"
    types = ", ".join(f"'{t}'" for t in RR_TYPES)
    return f"""
        WITH noised AS (
            SELECT event_type,
                   CASE WHEN {hex1} * 16 + {hex2} < {RR_FLIP_NUM}
                        THEN ([{types}])[{hex3} % {len(RR_TYPES)} + 1]
                        ELSE event_type END AS reported
            FROM events
        ),
        obs AS (
            SELECT reported AS t, count(*)::BIGINT AS observed
            FROM noised GROUP BY reported
        ),
        tru AS (
            SELECT event_type AS t, count(*)::BIGINT AS true_count
            FROM noised GROUP BY event_type
        ),
        tot AS (SELECT count(*)::BIGINT AS n FROM noised)
        SELECT t,
               coalesce(observed, 0)::BIGINT AS observed,
               coalesce(true_count, 0)::BIGINT AS true_count,
               {_G6_SQL.format(x='(coalesce(observed, 0) * 20 - n)::DOUBLE / 15.0')}
                   AS estimated,
               {_G6_SQL.format(x='(coalesce(observed, 0) * 20 - n)::DOUBLE / 15.0 - coalesce(true_count, 0)::DOUBLE')}
                   AS est_error
        FROM obs FULL OUTER JOIN tru USING (t), tot
        ORDER BY t
    """


def _bm25_oracle() -> str:
    branches = []
    for t in BM25_TERMS:
        branches.append(
            f"""
        SELECT '{t}' AS term, doc_id, dl,
               len(list_filter(toks, y -> y = '{t}'))::BIGINT AS tf
        FROM d"""
        )
    union = " UNION ALL ".join(branches)
    rank_key = (
        "(tf * 10 * c.s)::DOUBLE / (tf * 10 * c.s + 3 * c.s + 9 * c.n * dl)::DOUBLE"
    )
    bm25 = (
        "ln((c.n::DOUBLE - df.df::DOUBLE + 0.5) / (df.df::DOUBLE + 0.5) + 1.0)"
        " * tf::DOUBLE * 2.2"
        " / (tf::DOUBLE + (0.3 + 0.9 * dl::DOUBLE * c.n::DOUBLE / c.s::DOUBLE))"
    )  # parenthesized to match Spark's tf + (0.3 + ...) addition order
    return f"""
        WITH d AS (
            SELECT doc_id, string_split(lower(text), ' ') AS toks,
                   len(string_split(lower(text), ' '))::BIGINT AS dl
            FROM documents
        ),
        c AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS s FROM d),
        postings AS ({union}),
        p AS (SELECT * FROM postings WHERE tf > 0),
        dfreq AS (
            SELECT term, count(*)::BIGINT AS df FROM p GROUP BY term
        ),
        ranked AS (
            SELECT p.term, p.doc_id, p.tf, p.dl,
                   row_number() OVER (
                       PARTITION BY p.term
                       ORDER BY {rank_key} DESC, p.doc_id ASC
                   ) AS rank,
                   {_G6_SQL.format(x=bm25)} AS bm25
            FROM p CROSS JOIN c JOIN dfreq df ON df.term = p.term
        )
        SELECT term, rank, doc_id, tf, dl, bm25
        FROM ranked WHERE rank <= {BM25_TOPK}
        ORDER BY term, rank
    """



def _bm25_wand_oracle() -> str:
    branches = " UNION ALL ".join(
        f"""
        SELECT '{t}' AS term, doc_id, dl,
               len(list_filter(toks, y -> y = '{t}'))::BIGINT AS tf
        FROM d"""
        for t in BM25_TERMS
    )
    nq = len(BM25_TERMS)
    return f"""
        WITH d AS (
            SELECT doc_id, string_split(lower(text), ' ') AS toks,
                   len(string_split(lower(text), ' '))::BIGINT AS dl
            FROM documents
        ),
        c AS (SELECT count(*)::BIGINT AS n, sum(dl)::BIGINT AS s FROM d),
        p0 AS ({branches}),
        p1 AS (SELECT * FROM p0 WHERE tf > 0),
        dfreq AS (SELECT term, count(*)::BIGINT AS df FROM p1 GROUP BY term),
        postings AS (
            SELECT p1.term, p1.doc_id,
                   (((2 * c.n - 2 * df.df + 1) * {_W_IDF}) // (2 * df.df + 1))
                   * ((p1.tf * 10000000 * {_W_SAT})
                      // (p1.tf * 10000000 + 3000000
                          + ((9 * c.n * p1.dl * {_W_LEN}) // c.s))) AS impact
            FROM p1 CROSS JOIN c JOIN dfreq df ON df.term = p1.term
        ),
        seeds AS (
            SELECT * FROM (
                SELECT term, doc_id, impact,
                       row_number() OVER (PARTITION BY term
                                          ORDER BY impact DESC, doc_id) AS rn
                FROM postings
            ) WHERE rn <= {WAND_TOPK}
        ),
        theta AS (
            SELECT min(lb)::BIGINT AS theta FROM (
                SELECT doc_id, sum(impact)::BIGINT AS lb
                FROM seeds GROUP BY doc_id
                ORDER BY lb DESC, doc_id LIMIT {WAND_TOPK}
            )
        ),
        survivors AS (
            SELECT DISTINCT doc_id
            FROM postings CROSS JOIN theta
            WHERE impact * {nq} >= theta
        ),
        exact AS (
            SELECT p.doc_id, sum(p.impact)::BIGINT AS score,
                   count(*)::BIGINT AS n_terms
            FROM postings p JOIN survivors USING (doc_id)
            GROUP BY p.doc_id
        )
        SELECT row_number() OVER (ORDER BY score DESC, doc_id) AS rank,
               doc_id, score, n_terms
        FROM (SELECT * FROM exact ORDER BY score DESC, doc_id
              LIMIT {WAND_TOPK})
        ORDER BY rank
    """

ORACLE["q_privacy_rr_count"] = _rr_oracle()
ORACLE["q_text_bm25"] = _bm25_oracle()
ORACLE["q_text_bm25_wand"] = _bm25_wand_oracle()
