"""Round-10 surface growth (VERDICT r09 next-round #7): the two
highest-value absent shapes.

- ``q_sim_join_auto`` — the COST-BOUNDED similarity-join tier: LSH band
  width (``bits``) is selected at plan time from corpus statistics
  instead of being a fixture-tuned constant. This is the dial the
  banded-LSH cost model (functions/banded_lsh.py) describes but the
  declared ``q_sim_join`` key pins: candidates ≈ bands·n²/2^bits, so
  holding per-bucket occupancy constant requires bits ≈ log2(n/occ).
  The selection is an exact INTEGER ladder (smallest b with
  occ·2^b ≥ n, clamped to [MIN, MAX]) computed from one count — the
  same number both engines derive, so the DuckDB oracle runs the
  IDENTICAL blocking with SQL-computed ``bits`` and parity is by
  construction at every scale factor (sf0.001/0.01 pick bits=5,
  sf0.1 picks bits=7 — the ladder is exercised across SFs, not pinned).

- ``q_join_skew_split`` — a fact⋈fact join on an ENGINEERED hot key:
  ~57% of lineitem rows collapse onto one join key, the shape AQE's
  skew-join splitting exists for. The suite asserts
  ``spark.sql.adaptive.skewJoin.enabled`` in config but never
  demonstrated the behavior under data that actually skews;
  tests/test_analytics_r10.py lowers the skew thresholds to
  fixture-reachable values and asserts the executed plan carries
  ``skew=true`` with results bit-identical to the unsplit run. The
  declared key itself leaves session confs alone — at fixture scale AQE
  correctly broadcasts the dim-sized side; at 100 TB both sides are
  fact-sized, the join sort-merges, and the hot key's partition splits.

Determinism (FIXTURES.md cookbook): revenue rides the 1e4 integer grid
(``floor(price·(1−disc)·1e4 + 0.5)`` — one identical IEEE chain per row
in both engines, then an exact DECIMAL(38,0) fold emitted as its decimal
string, since the engineered 57%-hot group would overflow an int64 sum
near 2.6e10 rows/group), cosine scores round at 6dp on DOUBLE inner
products exactly like the existing similarity keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zonal_datacube_spark.functions.banded_lsh import banded_cosine_join
from zonal_datacube_spark.operators.similarity import SIM_JOIN_TAU
from zonal_datacube_spark.sources.loader import load_table

# ---------------------------------------------------------------------------
# cost-bounded auto-bits similarity join
# ---------------------------------------------------------------------------

SIM_AUTO_BANDS = 8  # dim 64 = bands × max bits keeps every band in-vector
SIM_AUTO_TARGET_OCC = 16  # target rows per (band, key) bucket
SIM_AUTO_MIN_BITS = 2
SIM_AUTO_MAX_BITS = 8


def _auto_bits(n: int) -> int:
    """Smallest ``b`` with ``TARGET_OCC · 2^b ≥ n``, clamped to
    [MIN_BITS, MAX_BITS] — i.e. the band width that holds expected
    per-bucket occupancy at ~TARGET_OCC under uniformly-spread signs
    (bucket ≈ n/2^bits). Pure integer arithmetic: the ladder compares
    n against TARGET_OCC << b, so the Spark side (this function, at
    plan time) and the DuckDB oracle (a CASE ladder over the same
    thresholds) cannot disagree on a boundary the way a float
    ceil(log2(·)) could."""
    b = SIM_AUTO_MIN_BITS
    while b < SIM_AUTO_MAX_BITS and n > (SIM_AUTO_TARGET_OCC << b):
        b += 1
    return b


# the identical ladder as SQL (generated from the same constants so the
# two sides can never drift)
_BITS_CASE_SQL = "CASE " + " ".join(
    f"WHEN n <= {SIM_AUTO_TARGET_OCC << b} THEN {b}"
    for b in range(SIM_AUTO_MIN_BITS, SIM_AUTO_MAX_BITS)
) + f" ELSE {SIM_AUTO_MAX_BITS} END"


def q_sim_join_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-bounded similarity self-join: banded sign-LSH blocking where
    the band width is chosen AT PLAN TIME from the corpus row count —
    bits = smallest b with 16·2^b ≥ n (clamped [2, 8]), i.e. the
    standard "grow bits with log2(n)" LSH dial that keeps expected
    bucket occupancy (and with it candidate volume ≈ bands·n·occ)
    LINEAR in n instead of quadratic. ``q_sim_join`` pins (bits=4,
    bands=8) so its cost model is fixture-tuned; this tier is what a
    deployment actually runs: the same blocking, sized by the data.

    The row count is one COUNT aggregate (scalar collect — the loud-
    guard control-plane class; a production catalog would serve it from
    table statistics without a scan). Both the count and the ladder are
    exact integers, the oracle recomputes them in SQL, and the chosen
    ``bits``/``n_corpus`` ride the output so the driver's hash compare
    attests the selection itself, not just the pairs."""
    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    bits = _auto_bits(n)
    pairs = banded_cosine_join(emb, SIM_JOIN_TAU, bits, SIM_AUTO_BANDS)
    return pairs.select(
        "label",
        "a_id",
        "b_id",
        "score",
        F.lit(n).cast("bigint").alias("n_corpus"),
        F.lit(bits).cast("int").alias("bits"),
    )


# ---------------------------------------------------------------------------
# engineered-skew join (the AQE skew-split shape)
# ---------------------------------------------------------------------------

SKEW_HOT_KEY = 1  # every l_linenumber >= 4 row collapses onto this orderkey


def _rev_e4() -> F.Column:
    # revenue on the 1e4 integer grid: floor(x + 0.5) of one identical
    # IEEE chain (mul, mul, add) per row in both engines; Spark floor on
    # DOUBLE is already BIGINT
    return F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000 + 0.5
    )


def q_join_skew_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈fact join on an engineered hot key — the skew-split stress
    shape. ~57% of lineitem rows (every l_linenumber ≥ 4) remap their
    join key to one hot orderkey, so the shuffle partition holding that
    key carries the majority of the fact table: the exact pathology
    ``spark.sql.adaptive.skewJoin`` exists to split (one oversized
    partition → N sub-partitions, the matching build rows replicated).

    The query itself is declarative and conf-free — the point is the
    DATA shape, not a hint: at fixture scale AQE broadcasts the
    dim-sized orders side (skew in a broadcast join is harmless — no
    partition boundary exists to overload); at 100 TB orders is
    fact-sized, the join sort-merges, and the skewed partition splits.
    tests/test_analytics_r10.py proves the split fires (executed plan
    ``skew=true``) by lowering the skew thresholds to fixture-reachable
    bytes with the broadcast path disabled, and that the split run's
    result is row-identical to the default run — AQE only re-plans
    the exchange, never the answer. Revenue folds on the 1e4 integer
    grid into an exact DECIMAL(38,0) sum emitted as its decimal string
    (the hot group's int64 sum would overflow near 2.6e10 rows/group;
    a double sum would round above 2^53 — see _skew_join_fold)."""
    li = _skewed_fact(load_table(spark, sf_dir, "lineitem"))
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    return _skew_join_fold(li, orders)


def _skewed_fact(lineitem: DataFrame) -> DataFrame:
    """(jk, rev_e4) projection with the engineered hot key."""
    return lineitem.select(
        F.when(F.col("l_linenumber") >= 4, F.lit(SKEW_HOT_KEY))
        .otherwise(F.col("l_orderkey"))
        .alias("jk"),
        _rev_e4().alias("rev_e4"),
    )


def _skew_join_fold(li: DataFrame, orders: DataFrame) -> DataFrame:
    """The join + fold, split out so the test can feed a MULTI-MAPPER
    fact side: AQE splits a skewed reducer partition by regrouping MAP
    outputs (PartialReducerPartitionSpec), so the split's granularity
    is one mapper — a single-file/single-row-group fixture scan yields
    ONE mapper and an unsplittable hot partition no matter the
    thresholds. At 100 TB the fact side arrives from thousands of
    mappers and the same plan splits freely; the test reproduces that
    precondition with a repartition on the fixture."""
    return (
        li.join(orders, li.jk == orders.o_orderkey)
        .groupBy(
            (F.col("jk") == SKEW_HOT_KEY).alias("is_hot"), "o_orderpriority"
        )
        .agg(
            F.count("*").alias("n_items"),
            # DECIMAL(38,0) accumulation, not BIGINT: the hot group holds
            # ~57% of the corpus, and at ~3.6e8 mean rev_e4 an int64 sum
            # overflows near 2.6e10 rows per group (~4 TB of lineitem) —
            # far below the 100 TB regime this key stress-tests. The
            # decimal fold is exact to 1e38; emitted as its exact decimal
            # string (the q_agg_decimal_exact convention — a cast back to
            # BIGINT would re-introduce the overflow, a double would
            # round above 2^53). DuckDB accumulates HUGEINT and renders
            # the same digits.
            F.sum(F.col("rev_e4").cast("decimal(38,0)"))
            .cast("string")
            .alias("revenue_e4"),
        )
        .orderBy("is_hot", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# hard-negative mining (contrastive training pairs)
# ---------------------------------------------------------------------------

HARDNEG_K = 3


def q_sim_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-pair mining for embedding training: for each anchor
    (probe), the top-k SAME-label neighbors (positives) and the top-k
    DIFFERENT-label neighbors — the "hard negatives" whose high
    similarity despite the label mismatch carries most of the gradient
    signal in triplet/InfoNCE training. One broadcast probe × corpus
    scan scores every candidate, then a single window ranks within
    (probe, label-match arm); both arms come from the same pass — the
    mining job never scans the corpus twice.

    Scale shape: the anchor set is FIXED-SIZE (an eval/anchor draw, not
    corpus-scaled — same contract as q_sim_knn's probe set), so the
    scan is one linear pass with a broadcast probe table and the window
    runs over |probes|×2 partitions. At production recall targets the
    exact scan swaps for the LSH-blocked candidate generator
    (functions/banded_lsh.py) with the identical rank tail. Scores are
    6dp-rounded DOUBLE dots (the similarity-family contract); the rank
    tiebreak is (score DESC, neighbor ASC) — engine-stable."""
    emb = load_table(spark, sf_dir, "embeddings")
    probes = F.broadcast(
        emb.filter(F.col("vec_id").isin(*_HARDNEG_PROBES)).select(
            F.col("vec_id").alias("probe_id"),
            F.col("label").alias("probe_label"),
            F.col("embedding").alias("probe_vec"),
        )
    )
    from zonal_datacube_spark.operators.similarity import _dot

    scored = (
        probes.crossJoin(emb.select("vec_id", "label", "embedding"))
        .filter(F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            (F.col("label") == F.col("probe_label")).alias("is_positive"),
            F.round(_dot("probe_vec", "embedding"), 6).alias("score"),
        )
    )
    w = Window.partitionBy("probe_id", "is_positive").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= HARDNEG_K)
        .select("probe_id", "neighbor_id", "is_positive", "score", "rn")
    )


# ---------------------------------------------------------------------------
# BPE merge-candidate scan (tokenizer training, iteration one)
# ---------------------------------------------------------------------------

BPE_TOPK = 20


def q_text_bpe_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first merge-candidate scan of BPE tokenizer training: corpus
    term frequencies collapse the text to the VOCABULARY grain, every
    distinct token explodes to its adjacent character pairs, and each
    pair's count is the sum of its hosting tokens' corpus frequencies —
    exactly the statistic the first BPE merge maximizes. Top-20 by
    count with the pair itself as tiebreak: all-integer, engine-stable.

    Scale shape: the heavy text never re-tokenizes per pair — the pair
    explosion runs on the vocabulary grain (types, not tokens), which
    is sub-linear in the corpus; the only corpus-scaled pass is the
    token count's map-side partial aggregate. This is the real BPE
    training layout (HuggingFace tokenizers pre-counts words for the
    same reason). Single-char tokens host no pair and are filtered
    explicitly on both engines (Spark's sequence(1, 0) counts DOWN —
    the shingles() lesson)."""
    from zonal_datacube_spark.functions.text_funcs import tokens

    vocab = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(tokens()).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n_tok"))
        .filter(F.length("tok") >= 2)
    )
    pairs = vocab.select(
        "n_tok",
        F.explode(
            F.expr(
                "transform(sequence(1, length(tok) - 1),"
                " i -> substring(tok, i, 2))"
            )
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n_tok").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "pair")
        .limit(BPE_TOPK)
    )


_HARDNEG_PROBES = (0, 1, 2, 3, 4)
_HARDNEG_PROBES_SQL = ", ".join(str(p) for p in _HARDNEG_PROBES)


QUERIES = {
    "q_sim_join_auto": q_sim_join_auto,
    "q_join_skew_split": q_join_skew_split,
    "q_sim_hard_negatives": q_sim_hard_negatives,
    "q_text_bpe_pairs": q_text_bpe_pairs,
}

ORACLE = {
    "q_sim_join_auto": f"""
        WITH e AS (
            SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
        ),
        stats AS (SELECT count(*)::BIGINT AS n FROM e),
        sel AS (SELECT n, ({_BITS_CASE_SQL}) AS bits FROM stats),
        bands AS (
            SELECT vec_id, label, k,
                   list_transform(
                       v[k * bits + 1 : k * bits + bits],
                       x -> CASE WHEN x > 0 THEN 1 ELSE 0 END) AS bk
            FROM e, sel, generate_series(0, {SIM_AUTO_BANDS - 1}) AS t(k)
        ),
        cand AS (
            SELECT DISTINCT a.label, a.vec_id AS a_id, b.vec_id AS b_id
            FROM bands a JOIN bands b
              ON a.label = b.label AND a.k = b.k AND a.bk = b.bk
             AND a.vec_id < b.vec_id
        )
        SELECT c.label, c.a_id, c.b_id,
               round(list_inner_product(ea.v, eb.v), 6) AS score,
               s.n::BIGINT AS n_corpus, s.bits::INT AS bits
        FROM cand c
        JOIN e ea ON c.a_id = ea.vec_id
        JOIN e eb ON c.b_id = eb.vec_id
        CROSS JOIN sel s
        WHERE round(list_inner_product(ea.v, eb.v), 6) >= {SIM_JOIN_TAU}
    """,
    "q_join_skew_split": f"""
        WITH l AS (
            SELECT CASE WHEN l_linenumber >= 4 THEN {SKEW_HOT_KEY}
                        ELSE l_orderkey END AS jk,
                   floor(l_extendedprice * (1 - l_discount) * 10000
                         + 0.5)::BIGINT AS rev_e4
            FROM lineitem
        )
        SELECT (jk = {SKEW_HOT_KEY}) AS is_hot, o_orderpriority,
               count(*)::BIGINT AS n_items,
               sum(rev_e4)::DECIMAL(38,0)::VARCHAR AS revenue_e4
        FROM l JOIN orders ON o_orderkey = jk
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
    "q_sim_hard_negatives": f"""
        WITH e AS (
            SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
        ),
        scored AS (
            SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id,
                   (e.label = p.label) AS is_positive,
                   round(list_inner_product(p.v, e.v), 6) AS score
            FROM (SELECT * FROM e
                  WHERE vec_id IN ({_HARDNEG_PROBES_SQL})) p
            CROSS JOIN e
            WHERE e.vec_id <> p.vec_id
        )
        SELECT probe_id, neighbor_id, is_positive, score,
               row_number() OVER (PARTITION BY probe_id, is_positive
                                  ORDER BY score DESC, neighbor_id ASC) AS rn
        FROM scored
        QUALIFY rn <= {HARDNEG_K}
    """,
    "q_text_bpe_pairs": f"""
        WITH vocab AS (
            SELECT tok, count(*)::BIGINT AS n_tok
            FROM (SELECT unnest(string_split(lower(text), ' ')) AS tok
                  FROM documents)
            GROUP BY tok
            HAVING length(tok) >= 2
        ),
        pairs AS (
            SELECT tok[i : i + 1] AS pair, n_tok
            FROM vocab, unnest(range(1, length(tok))) AS t(i)
        )
        SELECT pair, sum(n_tok)::BIGINT AS n_occurrences
        FROM pairs
        GROUP BY pair
        ORDER BY n_occurrences DESC, pair
        LIMIT {BPE_TOPK}
    """,
}
