"""Round-6 sixth wave (SURVEY.md §2.25): a decode-shard planner for
multimodal ingestion, link-prediction scores and reciprocity on the
trade graph, and a k-anonymity generalization (repair) eval.

Determinism (FIXTURES.md cookbook): shard boundaries come from exact
integer char-count prefix sums (rule 6 by construction); link scores
and reciprocity are single correctly-rounded divisions of exact
integer set sizes / weights (rule 8); the generalization eval is
integer counting end to end with one display division per row.

Scale notes (100 TB):
- q_media_decode_shards is the scheduling half of a multimodal decode
  pipeline: size-balanced shards need a GLOBAL ordered prefix sum of
  per-item byte/char sizes, which rides functions/prefix_sweep.py
  (value-bucket parallelism, no single-reducer sort) — the shard
  rollup after it is shard-grain.
- q_graph_link_jaccard / q_graph_reciprocity work on the nation-grain
  trade rollup (schema-bounded ≤ 625 edges at any SF, derived by one
  fact-table fold); the common-neighbor self-join is bounded-squared,
  never data-scaled.
- q_privacy_generalization is two QI groupBys + bounded rollups — the
  q_privacy_k_anon shape at two generalization levels, showing the
  exact re-identification risk the coarsening buys down.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from zonal_datacube_spark.functions.prefix_sweep import prefix_sweep
from zonal_datacube_spark.operators.analytics_r6b import _G6_SQL, _g6
from zonal_datacube_spark.functions.local_rel import local_relation
from zonal_datacube_spark.sources.loader import load_table


# --------------------------------------------------------------------------
# decode-shard planner
# --------------------------------------------------------------------------

SHARD_CHARS = 32_000


def q_media_decode_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode-shard planner — the scheduling step before a multimodal
    decode pass: pack documents (stand-ins for binary media items,
    sized by n_chars) into size-balanced shards in doc_id order, shard
    = floor(chars_before / 32k), so every shard holds a contiguous
    id-range totalling ≈32k chars and a decode executor gets even work.
    The global ordered prefix sum rides the range-bucketed prefix sweep
    (no single-reducer sort); the per-shard rollup is shard-grain.
    Output: each shard's item count, char total, and id range."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    )
    swept = prefix_sweep(
        docs,
        [],
        "doc_id",
        strict_sum_cols={"chars_before": "n_chars"},
    )
    # explicit floor on both engines: DuckDB CAST(DOUBLE AS BIGINT)
    # rounds to nearest while Spark's cast truncates
    sharded = swept.select(
        "doc_id",
        "n_chars",
        F.floor(
            F.coalesce(F.col("chars_before"), F.lit(0))
            / F.lit(SHARD_CHARS)
        )
        .cast("bigint")
        .alias("shard_id"),
    )
    return (
        sharded.groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("shard_id")
    )


# --------------------------------------------------------------------------
# link-prediction Jaccard
# --------------------------------------------------------------------------

LINK_TOP = 10


def _und_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected top-quartile trade edges (the q_graph_sssp /
    q_graph_kcore sparsification), one row per direction."""
    from pyspark.sql import Window

    from zonal_datacube_spark.operators.graph import trade_edges_cached

    edges = trade_edges_cached(spark, sf_dir).filter(
        F.col("src") != F.col("dst")
    )
    w_rank = Window.orderBy(
        F.col("w").desc(), F.col("src").asc(), F.col("dst").asc()
    )
    cnt = Window.partitionBy()
    cut = (
        edges.select(
            "src",
            "dst",
            F.row_number().over(w_rank).alias("rnk"),
            F.count("*").over(cnt).alias("n_e"),
        )
        .filter(F.col("rnk") * 4 <= F.col("n_e"))
        .select("src", "dst")
    )
    return cut.union(
        cut.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def q_graph_link_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link prediction by neighborhood Jaccard (the classic
    common-neighbors baseline): for every NON-adjacent nation pair on
    the sparsified trade graph, |N(a)∩N(b)| / |N(a)∪N(b)| — the pairs
    a recommender would propose wiring next. Common neighbors come
    from one self-join of the undirected edge list on the shared
    endpoint (bounded² — the graph is nation-grain); adjacency is an
    anti-join back onto the edges; the score is ONE division of exact
    integer set sizes, ranked (score desc, pair asc) for a
    deterministic top-10. The edge list is referenced four times
    (self-join x2, adjacency, degrees), so like q_graph_2hop_neighbors
    it materializes the SCHEMA-bounded rollup once and rebuilds it as a
    local relation — one fact pass instead of four (guarded: fails
    loudly if the edge grain ever stops being nation-bounded)."""
    collected = _und_edges(spark, sf_dir).collect()
    if len(collected) > 10_000:
        raise AssertionError(
            "q_graph_link_jaccard: edge rollup is no longer "
            f"schema-bounded ({len(collected)} rows collected)"
        )
    # LocalRelation, not LogicalRDD — same rationale as
    # q_graph_2hop_neighbors (four references, each was a 32-task scan)
    und = local_relation(spark, collected, "src long, dst long")
    deg = und.groupBy("src").agg(F.count("*").alias("deg"))
    e1 = und.select(F.col("src").alias("a"), F.col("dst").alias("n"))
    e2 = und.select(F.col("src").alias("b"), F.col("dst").alias("n"))
    common = (
        e1.join(e2, "n")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_common"))
    )
    adj = und.select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    cand = common.join(adj, ["a", "b"], "left_anti")
    da = deg.select(F.col("src").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("src").alias("b"), F.col("deg").alias("deg_b"))
    scored = (
        cand.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            "a",
            "b",
            "n_common",
            (F.col("deg_a") + F.col("deg_b") - F.col("n_common")).alias(
                "n_union"
            ),
        )
    )
    score = F.col("n_common").cast("double") / F.col("n_union").cast(
        "double"
    )
    return (
        scored.select(
            "a", "b", "n_common", "n_union", _g6(score).alias("jaccard")
        )
        .orderBy(
            F.col("jaccard").desc(), F.col("a").asc(), F.col("b").asc()
        )
        .limit(LINK_TOP)
    )


# --------------------------------------------------------------------------
# reciprocity
# --------------------------------------------------------------------------


def q_graph_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocity of the DIRECTED nation trade graph: the share of
    directed edges whose reverse edge exists, and the weighted variant
    Σ min(w_ab, w_ba) / Σ w — how symmetric trade flows are. One
    self-join of the nation-grain rollup on the reversed key (bounded);
    exact integer counts and weights until the two display divisions."""
    from zonal_datacube_spark.operators.graph import trade_edges_cached

    edges = trade_edges_cached(spark, sf_dir).filter(
        F.col("src") != F.col("dst")
    )
    rev = edges.select(
        F.col("dst").alias("src"),
        F.col("src").alias("dst"),
        F.col("w").alias("w_rev"),
    )
    joined = edges.join(F.broadcast(rev), ["src", "dst"], "left")
    return joined.agg(
        F.count("*").alias("n_edges"),
        F.sum(F.col("w_rev").isNotNull().cast("bigint")).alias(
            "n_reciprocated"
        ),
        F.sum("w").alias("total_weight"),
        F.sum(
            F.when(
                F.col("w_rev").isNotNull(),
                F.least(F.col("w"), F.col("w_rev")),
            ).otherwise(0)
        ).alias("reciprocated_weight"),
    ).select(
        "n_edges",
        "n_reciprocated",
        _g6(
            F.col("n_reciprocated").cast("double")
            / F.col("n_edges").cast("double")
        ).alias("edge_reciprocity"),
        "total_weight",
        "reciprocated_weight",
        _g6(
            F.col("reciprocated_weight").cast("double")
            / F.col("total_weight").cast("double")
        ).alias("weight_reciprocity"),
    )


# --------------------------------------------------------------------------
# k-anonymity generalization eval
# --------------------------------------------------------------------------

GEN_K = 5


def q_privacy_generalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generalization (repair) eval for k-anonymity: the re-id risk of
    the FINE quasi-identifier (nation, segment, 1k balance band) vs
    the GENERALIZED one (region, segment, 5k band) — the measurement
    that justifies a coarsening step in an anonymization pipeline.
    Each level is one QI groupBy + bounded rollup (the
    q_privacy_k_anon shape); regions come through the broadcast dim.
    Output: one row per level with class census and risky-row share."""
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            "n_nationkey", "n_regionkey"
        )
    )
    withreg = cust.join(
        nation, cust.c_nationkey == nation.n_nationkey
    )

    def level(df: DataFrame, name: str, geo: str, band: int) -> DataFrame:
        classes = df.groupBy(
            F.col(geo),
            F.col("c_mktsegment"),
            F.floor(F.col("c_acctbal") / band)
            .cast("bigint")
            .alias("bal_band"),
        ).agg(F.count("*").alias("s"))
        return classes.agg(
            F.lit(name).alias("level"),
            F.sum("s").alias("n_rows"),
            F.count("*").alias("n_classes"),
            F.min("s").alias("min_class_size"),
            F.sum(
                F.when(F.col("s") < GEN_K, F.col("s")).otherwise(0)
            ).alias("n_rows_risky"),
        )

    fine = level(withreg, "fine", "c_nationkey", 1000)
    coarse = level(withreg, "generalized", "n_regionkey", 5000)
    both = fine.unionByName(coarse)
    return both.select(
        "level",
        "n_rows",
        "n_classes",
        "min_class_size",
        "n_rows_risky",
        _g6(
            F.col("n_rows_risky").cast("double")
            / F.col("n_rows").cast("double")
        ).alias("risky_share"),
    ).orderBy("level")


QUERIES = {
    "q_media_decode_shards": q_media_decode_shards,
    "q_graph_link_jaccard": q_graph_link_jaccard,
    "q_graph_reciprocity": q_graph_reciprocity,
    "q_privacy_generalization": q_privacy_generalization,
}


_EDGES_SQL = """
            SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
                   count(*)::BIGINT AS w
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            GROUP BY 1, 2
"""

_UND_SQL = f"""
        edges AS MATERIALIZED (
            SELECT * FROM ({_EDGES_SQL}) WHERE src <> dst
        ),
        cut AS MATERIALIZED (
            SELECT src, dst FROM (
                SELECT src, dst,
                       row_number() OVER (
                           ORDER BY w DESC, src ASC, dst ASC
                       ) AS rnk,
                       count(*) OVER () AS n_e
                FROM edges
            ) WHERE rnk * 4 <= n_e
        ),
        und AS MATERIALIZED (
            SELECT src, dst FROM cut
            UNION
            SELECT dst AS src, src AS dst FROM cut
        )
"""


ORACLE = {
    "q_media_decode_shards": f"""
        WITH swept AS (
            SELECT doc_id, n_chars,
                   coalesce(sum(n_chars) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS chars_before
            FROM documents
        )
        SELECT CAST(floor(chars_before / {SHARD_CHARS}) AS BIGINT)
                   AS shard_id,
               count(*)::BIGINT AS n_docs,
               sum(n_chars)::BIGINT AS total_chars,
               min(doc_id)::BIGINT AS first_doc,
               max(doc_id)::BIGINT AS last_doc
        FROM swept GROUP BY 1 ORDER BY 1
    """,
    "q_graph_link_jaccard": f"""
        WITH {_UND_SQL},
        deg AS (SELECT src, count(*)::BIGINT AS deg FROM und GROUP BY src),
        common AS (
            SELECT e1.src AS a, e2.src AS b, count(*)::BIGINT AS n_common
            FROM und e1 JOIN und e2
              ON e1.dst = e2.dst AND e1.src < e2.src
            GROUP BY 1, 2
        ),
        cand AS (
            -- hash anti-join, not a correlated NOT EXISTS: DuckDB
            -- re-evaluated the whole und pipeline per probe (196 s)
            SELECT c.a, c.b, c.n_common
            FROM common c
            LEFT JOIN und u ON u.src = c.a AND u.dst = c.b
            WHERE u.src IS NULL
        )
        SELECT a, b, n_common,
               (da.deg + db.deg - n_common)::BIGINT AS n_union,
               {_G6_SQL.format(
                   x="n_common::DOUBLE"
                   " / (da.deg + db.deg - n_common)::DOUBLE"
               )} AS jaccard
        FROM cand
        JOIN deg da ON da.src = cand.a
        JOIN deg db ON db.src = cand.b
        ORDER BY jaccard DESC, a ASC, b ASC
        LIMIT {LINK_TOP}
    """,
    "q_graph_reciprocity": f"""
        WITH edges AS MATERIALIZED (
            SELECT * FROM ({_EDGES_SQL}) WHERE src <> dst
        ),
        joined AS (
            SELECT e.w, r.w AS w_rev
            FROM edges e
            LEFT JOIN edges r ON r.src = e.dst AND r.dst = e.src
        )
        SELECT count(*)::BIGINT AS n_edges,
               sum(CASE WHEN w_rev IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                   AS n_reciprocated,
               {_G6_SQL.format(
                   x="sum(CASE WHEN w_rev IS NOT NULL THEN 1 ELSE 0 "
                   "END)::DOUBLE / count(*)::DOUBLE"
               )} AS edge_reciprocity,
               sum(w)::BIGINT AS total_weight,
               sum(CASE WHEN w_rev IS NOT NULL THEN least(w, w_rev)
                        ELSE 0 END)::BIGINT AS reciprocated_weight,
               {_G6_SQL.format(
                   x="sum(CASE WHEN w_rev IS NOT NULL THEN least(w, w_rev)"
                   " ELSE 0 END)::DOUBLE / sum(w)::DOUBLE"
               )} AS weight_reciprocity
        FROM joined
    """,
    "q_privacy_generalization": f"""
        WITH withreg AS (
            SELECT c.*, n.n_regionkey
            FROM customer c JOIN nation n
              ON c.c_nationkey = n.n_nationkey
        ),
        fine AS (
            SELECT c_nationkey AS g, c_mktsegment,
                   CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
                   count(*)::BIGINT AS s
            FROM withreg GROUP BY 1, 2, 3
        ),
        coarse AS (
            SELECT n_regionkey AS g, c_mktsegment,
                   CAST(floor(c_acctbal / 5000) AS BIGINT) AS bal_band,
                   count(*)::BIGINT AS s
            FROM withreg GROUP BY 1, 2, 3
        ),
        levels AS (
            SELECT 'fine' AS level, sum(s)::BIGINT AS n_rows,
                   count(*)::BIGINT AS n_classes,
                   min(s)::BIGINT AS min_class_size,
                   sum(CASE WHEN s < {GEN_K} THEN s ELSE 0 END)::BIGINT
                       AS n_rows_risky
            FROM fine
            UNION ALL
            SELECT 'generalized', sum(s)::BIGINT, count(*)::BIGINT,
                   min(s)::BIGINT,
                   sum(CASE WHEN s < {GEN_K} THEN s ELSE 0 END)::BIGINT
            FROM coarse
        )
        SELECT level, n_rows, n_classes, min_class_size, n_rows_risky,
               {_G6_SQL.format(
                   x="n_rows_risky::DOUBLE / n_rows::DOUBLE"
               )} AS risky_share
        FROM levels ORDER BY level
    """,
}
