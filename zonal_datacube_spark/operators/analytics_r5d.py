"""Round-5d additions (SURVEY.md §2.18, second batch): snapshot time
travel over a manifest log, the write-audit-publish sink contract, LOCF
null repair, weighted degree assortativity of the trade graph, and a
multi-lag autocorrelation function. Each key has an independent DuckDB
oracle.

Determinism (FIXTURES.md cookbook): money quantizes to the cent grid
(rule 8) before any sum; orderings that feed window functions use the
integer epoch-µs + unique-key tiebreak (rules 7/11); moment products
that can exceed BIGINT ride DECIMAL(38,0) in Spark and HUGEINT in
DuckDB (rule 12); display doubles floor-half-up on the 1e-6 grid
(rule 15).

Scale notes (100 TB):
- time travel reads ONLY the manifest-listed delta files for the
  requested version (file-level pruning — the same contract Iceberg/
  Delta snapshots provide) and applies tombstones as a broadcast
  anti-join; no version materializes a full copy of the table.
- WAP audits run on the STAGED files, not the source — the audit cost
  is output-sized (the rollup), and the publish step is a manifest
  write, not a data rewrite.
- LOCF partitions by the series key (user), so repair parallelism is
  the number of series; within a series the carry-forward is one
  incremental running window, never a shrinking frame.
- assortativity folds integer moments edge-wise after two broadcast
  degree joins — the node-degree tables are graph-node-sized, orders
  of magnitude smaller than the event log that built the edges.
- the ACF computes all K lags from ONE window pass over the bounded
  minute grain (K lag columns, one shuffle), then explodes to
  (lag, pair) rows for a single moment fold — the grain is scanned
  once however many lags you ask for.
"""

from __future__ import annotations

import json
import os
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from zonal_datacube_spark.functions.tempdirs import fresh_dirs
from zonal_datacube_spark.operators.analytics_r5 import _minute_grain
from zonal_datacube_spark.operators.graph import trade_edges_cached
from zonal_datacube_spark.sources.loader import load_table
from zonal_datacube_spark.functions.local_rel import local_relation


def _g6(c):
    """Floor-half-up on the 1e-6 grid (FIXTURES.md rule 15)."""
    return F.floor(c * 1000000 + F.lit(0.5)) / 1000000


_G6_SQL = "floor(({x}) * 1000000 + 0.5) / 1000000"


# --------------------------------------------------------------------------
# snapshot time travel
# --------------------------------------------------------------------------

TT_V1_CUT = "1997-01-01"
TT_V2_CUT = "1998-01-01"
TT_PURGE_CUT = "1996-01-01"


def q_warehouse_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot time travel over a manifest log — the AS OF read every
    table format (Iceberg/Delta) provides, built from first principles:
    three versions of an orders extract land as immutable delta parquet
    files (v0 base load, v1 append of 1997, v2 append of 1998+ PLUS a
    retention purge tombstoning 'F' orders older than 1996), each
    version's JSON manifest lists exactly the live delta files and
    tombstone files visible at that version. Reading AS OF v = union the
    manifest's delta files, broadcast-anti-join its tombstone keys —
    file-level pruning, no copy-per-version. The result audits all three
    versions (row count, cent-exact price sum, rows removed by
    tombstones); the oracle reconstructs each version relationally."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderdate",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("price_c"),
    )
    (root,) = fresh_dirs("q_warehouse_time_travel", "zds_timetravel_")
    deltas = os.path.join(root, "deltas")
    d0 = os.path.join(deltas, "ver=0")
    d1 = os.path.join(deltas, "ver=1")
    d2 = os.path.join(deltas, "ver=2")
    tomb2 = os.path.join(root, "tomb_v2")
    v1c = F.lit(TT_V1_CUT).cast("timestamp_ntz")
    v2c = F.lit(TT_V2_CUT).cast("timestamp_ntz")
    cols = ("o_orderkey", "o_orderstatus", "o_orderdate", "price_c")

    # r14 (guide §1.2 job count, §2.6 overlap independent jobs): the three
    # version extracts used to be three sequential write jobs over the
    # same orders scan; ONE dynamic-partitioned write routes every row to
    # its delta dir in a single pass (`ver` is a routing column only —
    # partitionBy excludes it from the data files, so each ver=N dir holds
    # exactly the old delta schema and as_of() reads are unchanged). The
    # independent tombstone extract overlaps it from a second driver
    # thread instead of waiting behind it.
    def _write_deltas() -> None:
        orders.withColumn(
            "ver",
            F.when(F.col("o_orderdate") < v1c, F.lit(0))
            .when(F.col("o_orderdate") < v2c, F.lit(1))
            .otherwise(F.lit(2)),
        ).select(*cols, "ver").write.mode("overwrite").partitionBy(
            "ver"
        ).parquet(deltas)

    def _write_tombstones() -> None:
        orders.filter(
            (F.col("o_orderstatus") == "F")
            & (
                F.col("o_orderdate")
                < F.lit(TT_PURGE_CUT).cast("timestamp_ntz")
            )
        ).select("o_orderkey").write.mode("overwrite").parquet(tomb2)

    with ThreadPoolExecutor(max_workers=2) as pool:
        futures = [pool.submit(_write_deltas), pool.submit(_write_tombstones)]
        for fut in futures:
            fut.result()  # surface any write failure, don't swallow it
    manifests = {
        0: {"deltas": [d0], "tombstones": []},
        1: {"deltas": [d0, d1], "tombstones": []},
        2: {"deltas": [d0, d1, d2], "tombstones": [tomb2]},
    }
    for v, m in manifests.items():
        with open(os.path.join(root, f"manifest_v{v}.json"), "w") as fh:
            json.dump({"version": v, **m}, fh)

    def as_of(v: int) -> DataFrame:
        with open(os.path.join(root, f"manifest_v{v}.json")) as fh:
            m = json.load(fh)
        df = spark.read.parquet(*m["deltas"])
        removed = df
        for t in m["tombstones"]:
            keys = spark.read.parquet(t)
            df = df.join(F.broadcast(keys), "o_orderkey", "left_anti")
        stat = df.agg(
            F.count("*").alias("n_rows"),
            F.sum("price_c").alias("sum_price_c"),
        )
        if m["tombstones"]:
            gone = removed.join(
                F.broadcast(spark.read.parquet(*m["tombstones"])),
                "o_orderkey",
                "left_semi",
            ).agg(F.count("*").alias("n_tombstoned"))
        else:
            gone = spark.range(1).select(
                F.lit(0).cast("bigint").alias("n_tombstoned")
            )
        return stat.crossJoin(gone).select(
            F.lit(v).alias("version"), "n_rows", "sum_price_c", "n_tombstoned"
        )

    out = as_of(0).unionByName(as_of(1)).unionByName(as_of(2))
    return out.orderBy("version")


# --------------------------------------------------------------------------
# write-audit-publish
# --------------------------------------------------------------------------


def q_sink_write_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish — the production sink contract that keeps bad
    batches out of consumer-visible tables: the daily×type rollup lands
    in a STAGING dir; four audits run against the staged read-back (row
    count covers every source day, no null keys, no non-positive counts,
    staged event total reconciles to the source scan); only when all
    pass does the publish step write the consumer manifest + data. The
    result is the audit ledger itself (check, observed value, verdict)
    plus the published row count read back through the manifest — the
    artifact an on-call engineer actually looks at."""
    ev = load_table(spark, sf_dir, "events")
    cand = ev.groupBy(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "event_type",
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")).alias(
            "sum_v_c"
        ),
    )
    (root,) = fresh_dirs("q_sink_write_audit_publish", "zds_wap_")
    n_src = ev.count()
    return _audit_and_publish(spark, cand, n_src, root)


def _audit_and_publish(spark, cand: DataFrame, n_src: int, root: str) -> DataFrame:
    """The stage → audit → publish machinery, factored so the failing
    path is injectable: tests/test_analytics_r5d.py feeds a candidate
    batch with a poisoned key and asserts the WAP CONTRACT — a batch
    that fails any audit leaves NO manifest and NO published data
    (consumer-invisible), while the ledger records the failure."""
    staging = os.path.join(root, "staging")
    publish = os.path.join(root, "published")
    cand.write.mode("overwrite").parquet(staging)
    staged = spark.read.parquet(staging)
    m = staged.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("day").alias("n_days"),
        # coalesce: F.sum over an EMPTY staged batch returns NULL, and the
        # ledger build below casts every observed value with int(o) — the
        # injectable empty-candidate failure must emit a failed ledger row,
        # never crash on a None.
        F.coalesce(
            F.sum(
                (F.col("day").isNull() | F.col("event_type").isNull()).cast(
                    "bigint"
                )
            ),
            F.lit(0),
        ).alias("n_nullkey"),
        F.coalesce(
            F.sum((F.col("n") <= 0).cast("bigint")), F.lit(0)
        ).alias("n_nonpos"),
        F.coalesce(F.sum("n"), F.lit(0)).alias("staged_total"),
    )
    row = m.collect()[0]
    audits = [
        ("1_row_count", row.n_rows, row.n_rows >= row.n_days),
        ("2_null_keys", row.n_nullkey, row.n_nullkey == 0),
        ("3_nonpos_counts", row.n_nonpos, row.n_nonpos == 0),
        (
            "4_reconcile_total",
            (row.staged_total or 0) - n_src,
            row.staged_total == n_src,
        ),
    ]
    if all(p for _, _, p in audits):
        staged.write.mode("overwrite").parquet(publish)
        with open(os.path.join(root, "manifest.json"), "w") as fh:
            json.dump({"published": publish, "audits": "pass"}, fh)
        with open(os.path.join(root, "manifest.json")) as fh:
            published_path = json.load(fh)["published"]
        n_pub = spark.read.parquet(published_path).count()
        audits.append(("5_published_rows", n_pub, True))
    else:
        audits.append(("5_published_rows", 0, False))
    return local_relation(
        spark,
        [(c, int(o), bool(p)) for c, o, p in audits],
        "check_name string, observed bigint, passed boolean",
    ).orderBy("check_name")


# --------------------------------------------------------------------------
# LOCF null repair
# --------------------------------------------------------------------------

LOCF_MOD, LOCF_RESIDUE = 11, 3


def q_ts_locf_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward null repair — the sensor-dropout
    fix every telemetry pipeline ships: readings whose event_id ≡ 3
    (mod 11) are deterministically masked as missing, then repaired per
    user series with the last non-null value at or before each row
    (F.last ignorenulls over an incremental growing frame; ordering is
    integer epoch-µs + event_id tiebreak, rules 7/11). The report counts
    missing/repaired/unrepairable rows per event type and proves the
    repaired series' cent-exact sum; leading missings with no prior
    observation stay null (honest: LOCF cannot invent a first value)."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_type",
        "user_id",
        "event_id",
        F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        ).alias("eus"),
        F.when(
            F.col("event_id") % LOCF_MOD == LOCF_RESIDUE, F.lit(None)
        )
        .otherwise(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint"))
        .alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("eus", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rep = base.select(
        "event_type", "v", F.last("v", ignorenulls=True).over(w).alias("r")
    )
    return (
        rep.groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("v").isNull().cast("bigint")).alias("n_missing"),
            F.sum(
                (F.col("v").isNull() & F.col("r").isNotNull()).cast("bigint")
            ).alias("n_repaired"),
            F.sum(
                (F.col("v").isNull() & F.col("r").isNull()).cast("bigint")
            ).alias("n_unrepairable"),
            F.sum("v").alias("sum_observed_c"),
            F.sum("r").alias("sum_repaired_c"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# degree assortativity
# --------------------------------------------------------------------------


def q_graph_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the nation trade graph (do high-volume
    exporters sell to high-volume importers?): the Pearson correlation,
    across edges, of source weighted out-degree vs destination weighted
    in-degree — edge-weighted and unweighted variants side by side
    (Newman 2002's r, directed out-in flavor). Degrees are integer edge
    weights, so every moment is exact: products ride DECIMAL(38,0) /
    HUGEINT (rule 12 — deg³ passes 2^63 well below 100 TB), and both
    engines convert the same exact integers to doubles for the one
    closed form. Two broadcast joins against the 25-row degree tables;
    one moment fold."""
    edges = trade_edges_cached(spark, sf_dir)
    outw = edges.groupBy("src").agg(F.sum("w").alias("x"))
    inw = edges.groupBy("dst").agg(F.sum("w").alias("y"))
    e = edges.join(F.broadcast(outw), "src").join(F.broadcast(inw), "dst")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = e.agg(
        F.count("*").alias("n_edges"),
        F.sum("w").alias("w_tot"),
        F.sum(dec("w") * dec("x")).alias("wsx"),
        F.sum(dec("w") * dec("y")).alias("wsy"),
        F.sum(dec("w") * dec("x") * dec("x")).alias("wsxx"),
        F.sum(dec("w") * dec("y") * dec("y")).alias("wsyy"),
        F.sum(dec("w") * dec("x") * dec("y")).alias("wsxy"),
        F.sum(dec("x")).alias("sx"),
        F.sum(dec("y")).alias("sy"),
        F.sum(dec("x") * dec("x")).alias("sxx"),
        F.sum(dec("y") * dec("y")).alias("syy"),
        F.sum(dec("x") * dec("y")).alias("sxy"),
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst")))
        .distinct()
        .agg(F.count("*").alias("n_nodes"))
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731

    def pearson(n, sx, sy, sxx, syy, sxy):
        return (d(n) * d(sxy) - d(sx) * d(sy)) / F.sqrt(
            (d(n) * d(sxx) - d(sx) * d(sx))
            * (d(n) * d(syy) - d(sy) * d(sy))
        )

    return m.crossJoin(F.broadcast(nodes)).select(
        "n_nodes",
        "n_edges",
        "w_tot",
        _g6(pearson("w_tot", "wsx", "wsy", "wsxx", "wsyy", "wsxy")).alias(
            "r_weighted"
        ),
        _g6(pearson("n_edges", "sx", "sy", "sxx", "syy", "sxy")).alias(
            "r_unweighted"
        ),
    )


# --------------------------------------------------------------------------
# multi-lag ACF
# --------------------------------------------------------------------------

ACF_MAX_LAG = 6


def q_ts_acf_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function at lags 1..6 of each type's minute-mean
    series — the correlogram read before picking AR terms or seasonal
    windows (`q_ts_autocorr` is its lag-1 slice). All K lag columns come
    from ONE window pass over the bounded minute grain, explode to
    (lag, pair) rows, and each (type, lag) cell folds exact integer
    moments: the 6-dp-rounded minute means are integers on the 1e-6
    grid, so Σx, Σx², Σxy are DECIMAL(38,0)/HUGEINT-exact and the
    Pearson closed form sees identical doubles on both engines — no
    distributed-FP corr in the loop. Lags index the OBSERVED series
    (row lag over the grain), the standard gap-skipping correlogram."""
    g = _minute_grain(spark, sf_dir).select(
        "event_type",
        "epm",
        F.round(F.col("mv") * 1000000, 0).cast("bigint").alias("mvi"),
    )
    w = Window.partitionBy("event_type").orderBy("epm")
    lagged = g.select(
        "event_type",
        "mvi",
        *[
            F.lag("mvi", k).over(w).alias(f"p{k}")
            for k in range(1, ACF_MAX_LAG + 1)
        ],
    )
    stacked = (
        lagged.select(
            "event_type",
            "mvi",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(k).alias("lag"),
                            F.col(f"p{k}").alias("prev"),
                        )
                        for k in range(1, ACF_MAX_LAG + 1)
                    ]
                )
            ).alias("s"),
        )
        .select("event_type", "mvi", "s.lag", "s.prev")
        .filter(F.col("prev").isNotNull())
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    m = stacked.groupBy("event_type", "lag").agg(
        F.count("*").alias("n_pairs"),
        F.sum(dec("mvi")).alias("sx"),
        F.sum(dec("prev")).alias("sy"),
        F.sum(dec("mvi") * dec("mvi")).alias("sxx"),
        F.sum(dec("prev") * dec("prev")).alias("syy"),
        F.sum(dec("mvi") * dec("prev")).alias("sxy"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    corr = (d("n_pairs") * d("sxy") - d("sx") * d("sy")) / F.sqrt(
        (d("n_pairs") * d("sxx") - d("sx") * d("sx"))
        * (d("n_pairs") * d("syy") - d("sy") * d("sy"))
    )
    return m.select(
        "event_type", "lag", "n_pairs", _g6(corr).alias("acf")
    ).orderBy("event_type", "lag")


QUERIES = {
    "q_warehouse_time_travel": q_warehouse_time_travel,
    "q_sink_write_audit_publish": q_sink_write_audit_publish,
    "q_ts_locf_repair": q_ts_locf_repair,
    "q_graph_assortativity": q_graph_assortativity,
    "q_ts_acf_multi": q_ts_acf_multi,
}


_PC_SQL = "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"

# the trade-graph edge rollup, mirroring graph._trade_edges / _EDGES_SQL
_EDGES_ONLY_SQL = """
        edges AS (
            SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
                   count(*)::BIGINT AS w
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            GROUP BY 1, 2
        )
"""

_MINUTE_GRAIN_SQL = """
        grain AS (
            SELECT event_type,
                   date_diff('minute', TIMESTAMP '1970-01-01 00:00:00', ts)
                       AS epm,
                   round(avg(value), 6) AS mv
            FROM events GROUP BY 1, 2
        )
"""


def _acf_oracle() -> str:
    branches = []
    corr = (
        "(n_pairs::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)"
        " / sqrt((n_pairs::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)"
        " * (n_pairs::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE))"
    )
    for k in range(1, ACF_MAX_LAG + 1):
        branches.append(
            f"""
        SELECT event_type, {k} AS lag, count(*)::BIGINT AS n_pairs,
               sum(mvi::HUGEINT) AS sx, sum(prev::HUGEINT) AS sy,
               sum(mvi::HUGEINT * mvi::HUGEINT) AS sxx,
               sum(prev::HUGEINT * prev::HUGEINT) AS syy,
               sum(mvi::HUGEINT * prev::HUGEINT) AS sxy
        FROM (
            SELECT event_type, mvi,
                   lag(mvi, {k}) OVER (PARTITION BY event_type ORDER BY epm)
                       AS prev
            FROM scaled
        ) WHERE prev IS NOT NULL GROUP BY event_type"""
        )
    union = " UNION ALL ".join(branches)
    return f"""
        WITH {_MINUTE_GRAIN_SQL.strip()},
        scaled AS (
            SELECT event_type, epm,
                   CAST(round(mv * 1000000) AS BIGINT) AS mvi
            FROM grain
        ),
        cells AS ({union})
        SELECT event_type, lag, n_pairs,
               {_G6_SQL.format(x=corr)} AS acf
        FROM cells
        ORDER BY event_type, lag
    """


ORACLE = {
    "q_warehouse_time_travel": f"""
        WITH pc AS (
            SELECT o_orderkey, o_orderdate, o_orderstatus,
                   {_PC_SQL} AS price_c
            FROM orders
        ),
        tomb AS (
            SELECT o_orderkey FROM pc
            WHERE o_orderstatus = 'F'
              AND o_orderdate < TIMESTAMP '{TT_PURGE_CUT}'
        ),
        v2 AS (
            SELECT * FROM pc
            WHERE o_orderkey NOT IN (SELECT o_orderkey FROM tomb)
        )
        SELECT 0 AS version, count(*)::BIGINT AS n_rows,
               sum(price_c)::BIGINT AS sum_price_c, 0::BIGINT AS n_tombstoned
        FROM pc WHERE o_orderdate < TIMESTAMP '{TT_V1_CUT}'
        UNION ALL
        SELECT 1, count(*)::BIGINT, sum(price_c)::BIGINT, 0::BIGINT
        FROM pc WHERE o_orderdate < TIMESTAMP '{TT_V2_CUT}'
        UNION ALL
        SELECT 2, count(*)::BIGINT, sum(price_c)::BIGINT,
               (SELECT count(*)::BIGINT FROM tomb)
        FROM v2
        ORDER BY version
    """,
    "q_sink_write_audit_publish": """
        WITH cand AS (
            SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   event_type, count(*)::BIGINT AS n
            FROM events GROUP BY 1, 2
        ),
        m AS (
            SELECT count(*)::BIGINT AS n_rows,
                   count(DISTINCT day)::BIGINT AS n_days,
                   count_if(day IS NULL OR event_type IS NULL)::BIGINT
                       AS n_nullkey,
                   count_if(n <= 0)::BIGINT AS n_nonpos,
                   sum(n)::BIGINT AS staged_total
            FROM cand
        ),
        src AS (SELECT count(*)::BIGINT AS n_src FROM events)
        SELECT '1_row_count' AS check_name, m.n_rows AS observed,
               m.n_rows >= m.n_days AS passed FROM m
        UNION ALL
        SELECT '2_null_keys', n_nullkey, n_nullkey = 0 FROM m
        UNION ALL
        SELECT '3_nonpos_counts', n_nonpos, n_nonpos = 0 FROM m
        UNION ALL
        SELECT '4_reconcile_total', staged_total - n_src,
               staged_total = n_src FROM m, src
        UNION ALL
        SELECT '5_published_rows', n_rows, true FROM m
        ORDER BY check_name
    """,
    "q_ts_locf_repair": f"""
        WITH base AS (
            SELECT event_type, user_id, event_id,
                   date_diff('microsecond',
                             TIMESTAMP '1970-01-01 00:00:00', ts) AS eus,
                   CASE WHEN event_id % {LOCF_MOD} = {LOCF_RESIDUE}
                        THEN NULL
                        ELSE CAST(floor(value * 100 + 0.5) AS BIGINT)
                   END AS v
            FROM events
        ),
        rep AS (
            SELECT event_type, v,
                   last_value(v IGNORE NULLS) OVER (
                       PARTITION BY user_id ORDER BY eus, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS r
            FROM base
        )
        SELECT event_type, count(*)::BIGINT AS n_rows,
               count_if(v IS NULL)::BIGINT AS n_missing,
               count_if(v IS NULL AND r IS NOT NULL)::BIGINT AS n_repaired,
               count_if(v IS NULL AND r IS NULL)::BIGINT AS n_unrepairable,
               sum(v)::BIGINT AS sum_observed_c,
               sum(r)::BIGINT AS sum_repaired_c
        FROM rep GROUP BY event_type ORDER BY event_type
    """,
    "q_graph_assortativity": f"""
        WITH {_EDGES_ONLY_SQL.strip()},
        outw AS (SELECT src, sum(w)::BIGINT AS x FROM edges GROUP BY src),
        inw AS (SELECT dst, sum(w)::BIGINT AS y FROM edges GROUP BY dst),
        e AS (
            SELECT edges.w, outw.x, inw.y
            FROM edges JOIN outw USING (src) JOIN inw USING (dst)
        ),
        m AS (
            SELECT count(*)::BIGINT AS n_edges, sum(w)::BIGINT AS w_tot,
                   sum(w::HUGEINT * x::HUGEINT) AS wsx,
                   sum(w::HUGEINT * y::HUGEINT) AS wsy,
                   sum(w::HUGEINT * x::HUGEINT * x::HUGEINT) AS wsxx,
                   sum(w::HUGEINT * y::HUGEINT * y::HUGEINT) AS wsyy,
                   sum(w::HUGEINT * x::HUGEINT * y::HUGEINT) AS wsxy,
                   sum(x::HUGEINT) AS sx, sum(y::HUGEINT) AS sy,
                   sum(x::HUGEINT * x::HUGEINT) AS sxx,
                   sum(y::HUGEINT * y::HUGEINT) AS syy,
                   sum(x::HUGEINT * y::HUGEINT) AS sxy
            FROM e
        ),
        nodes AS (
            SELECT count(*)::BIGINT AS n_nodes FROM (
                SELECT src AS node FROM edges
                UNION SELECT dst FROM edges
            )
        )
        SELECT nodes.n_nodes, m.n_edges, m.w_tot,
               {_G6_SQL.format(x='(w_tot::DOUBLE * wsxy::DOUBLE - wsx::DOUBLE * wsy::DOUBLE) / sqrt((w_tot::DOUBLE * wsxx::DOUBLE - wsx::DOUBLE * wsx::DOUBLE) * (w_tot::DOUBLE * wsyy::DOUBLE - wsy::DOUBLE * wsy::DOUBLE))')}
                   AS r_weighted,
               {_G6_SQL.format(x='(n_edges::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE) / sqrt((n_edges::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE) * (n_edges::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE))')}
                   AS r_unweighted
        FROM m, nodes
    """,
    "q_ts_acf_multi": _acf_oracle(),
}
