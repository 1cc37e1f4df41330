"""Parquet sources for the fixture star schema (TESTDATA.md).

The reference's sources are windowed COG/raster reads and vector file reads
(rioxarray / geopandas); ours is ``spark.read.parquet`` — Catalyst pushes
predicates to parquet row-group statistics and prunes columns, the direct
analogue of the reference's fishnet tile pruning + windowed reads
(SURVEY.md §4.1).
"""

from __future__ import annotations

import os
from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Confs the engine depends on for oracle parity, set idempotently at load
# time because the harness may hand us a session it built itself:
# - UTC session TZ + NTZ inference → tz-naive fixture timestamps read as the
#   same wall time DuckDB sees (FIXTURES.md parity rules);
# - nanosAsLong → events.ts is TIMESTAMP(NANOS) parquet, which Spark 4
#   refuses natively; we read raw int64 nanos and rebuild a TIMESTAMP_NTZ.
_SESSION_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.inferTimestampNTZ.enabled": "true",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


# Sessions whose confs were already pinned — every conf.get/.set is a
# py4j round trip, and ensure_session_confs runs on EVERY table load
# (r13, guide §1.2 per-task work: ~3 driver round trips × several loads
# × 345 bench keys was pure fixed overhead). Nothing on a declared path
# unsets these confs after pinning (the only mid-session conf the engine
# touches is shuffle.partitions, not in this set).
_CONFS_PINNED: set[str] = set()


def ensure_session_confs(spark: SparkSession) -> None:
    app = spark.sparkContext.applicationId
    if app in _CONFS_PINNED:
        return
    for k, v in _SESSION_CONFS.items():
        if spark.conf.get(k, None) != v:
            spark.conf.set(k, v)
    _CONFS_PINNED.add(app)


def source_stamp(path: str) -> tuple:
    """Content-identity stamp of a fixture source: (mtime_ns, size) for a
    plain file; for a DIRECTORY of part files, the folded sorted
    (name, mtime_ns, size) listing of its entries. The directory's own
    stat is NOT sufficient (ADVICE r12): rewriting part-file CONTENTS in
    place — same filenames, e.g. ``cp`` over an existing part — leaves
    the directory's mtime and size unchanged, so a regenerated corpus
    would silently serve a stale cached grain or derived-layout copy,
    exactly the aliasing class the r12 content-stamp change closed."""
    st = os.stat(path)
    if not os.path.isdir(path):
        return (st.st_mtime_ns, st.st_size)
    parts = []
    for name in sorted(os.listdir(path)):
        pst = os.stat(os.path.join(path, name))
        parts.append((name, pst.st_mtime_ns, pst.st_size))
    return (len(parts), tuple(parts))


def corpus_cache_tag(sf_dir: str, table: str) -> str:
    """Identity tag for derived-layout caches (CSV/ORC/partitioned/
    z-ordered/bucketed copies materialized once per corpus under the
    temp dir): the dir basename PLUS a hash of the source table's
    identity (absolute path + ``source_stamp`` — for a directory of
    part files the stamp folds the per-part listing, so an in-place
    part rewrite misses the cache too, ADVICE r12).

    Basename-only tags were the r12 review's silent-wrong-answer find:
    two corpora sharing a basename — the rehearsal relayout of sf0.01
    vs the fixture sf0.01 — would alias each other's cached copies, and
    a regenerated fixture would silently serve the stale one (the same
    failure class as the r11 streaming-glob weak mark; it only ever
    passed because the aliased copies happened to hold identical
    data)."""
    import hashlib

    base = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    stamp = source_stamp(os.path.join(sf_dir, f"{table}.parquet"))
    ident = f"{os.path.abspath(sf_dir)}:{stamp}"
    return f"{base}-{hashlib.md5(ident.encode()).hexdigest()[:10]}"


# Memo of the lazy table DataFrames, keyed by (session, corpus path,
# table, source content stamp). This caches the RELATION — file listing
# + footer schema inference, each a driver-side py4j + filesystem pass
# that `spark.read.parquet` repeats on every call (~40–80 ms; r13,
# guide §6 listing cost / §1.2 fixed overhead: several loads × 345 bench
# keys) — never data or results: every action on the returned DataFrame
# re-reads the parquet from disk. The stamp folds the per-part (name,
# mtime, size) listing, so a rewritten corpus (even in place) misses,
# exactly like the grain cache (ADVICE r12).
_RELATION_CACHE: "OrderedDict[tuple, DataFrame]" = OrderedDict()
_RELATION_CAP = 64


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Schema is inferred from parquet footers —
    no full-file scan happens at load time (lazy, like the reference's
    xarray open)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    ensure_session_confs(spark)
    key = (
        spark.sparkContext.applicationId,
        os.path.realpath(sf_dir),
        name,
        source_stamp(f"{sf_dir}/{name}.parquet"),
    )
    hit = _RELATION_CACHE.get(key)
    if hit is not None:
        _RELATION_CACHE.move_to_end(key)
        return hit
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # TIMESTAMP(NANOS) fixtures surface as raw int64 under the
        # nanosAsLong conf: floor-div nanos → µs (matching DuckDB's ns→µs
        # truncation) and rebuild a TIMESTAMP_NTZ TZ-independently.
        # µs-precision fixtures (current driver output) read natively as
        # TIMESTAMP_NTZ and skip this.
        df = df.withColumn(
            "ts",
            F.expr(
                "timestampadd(MICROSECOND, ts div 1000,"
                " TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ),
        )
    _RELATION_CACHE[key] = df
    while len(_RELATION_CACHE) > _RELATION_CAP:
        _RELATION_CACHE.popitem(last=False)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in (names or TABLES)}


def load_csv(spark: SparkSession, path: str, schema: str, header: bool = True) -> DataFrame:
    """CSV source with an explicit schema — inference would scan the data
    twice and guess types; at 100 TB both are unacceptable."""
    ensure_session_confs(spark)
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .csv(path)
    )


def load_json(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """JSON-lines source with an explicit schema (same rationale)."""
    ensure_session_confs(spark)
    return spark.read.schema(schema).json(path)


def load_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC source (native reader). Like parquet: footer-only schema read,
    predicate pushdown into stripe/row-group statistics, column pruning."""
    ensure_session_confs(spark)
    return spark.read.orc(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view so ``spark.sql`` queries
    (GROUPING SETS etc.) can reference them by name."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
