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
)

# Explicit registry iteration order. The driver's CORRECTNESS artifact
# records the first ~50 keys in queries() iteration order, so the front
# of this list is the judged shop window. Round-5 policy (VERDICT r04
# next-round #5): (a) every key whose implementation changed in round 5
# — the prefix-sweep family, the minute-grain anomaly rewrite, the
# entropy guard, and the per-day dynamic-overwrite oracle — needs a
# fresh driver row; (b) the remaining ~40 slots go to keys that have
# NEVER appeared in any CORRECTNESS_r0x window (93 dark keys after r04;
# tests/test_registry_bench.py derives the dark set from the artifacts
# and enforces >= 40 of them here). Keys not listed sort after listed
# ones, alphabetically; round 6 rotates in the remaining dark keys.
KEY_ORDER = (
    # --- (a) implementations changed in round 5: re-verify first ---
    "q_ts_anomaly",
    "q_agg_weighted_median",
    "q_skyline_dominance",
    "q_agg_gini",
    "q_report_ltv_deciles",
    "q_agg_entropy",
    "q_window_pareto",
    "q_report_abc_class",
    "q_sort_limit_with_ties",
    "q_sink_dynamic_overwrite",
    # --- (b) never-driver-sampled keys: first driver attestation ---
    "q_report_big_orders",
    "q_report_customer_distribution",
    "q_report_dominant_suppliers",
    "q_report_idle_balance",
    "q_report_important_stock",
    "q_report_late_shipment_priority",
    "q_report_local_supplier_volume",
    "q_report_top_supplier",
    "q_report_waiting_suppliers",
    "q_graph_pagerank",
    "q_cohort_retention",
    "q_funnel_conversion",
    "q_merge_upsert",
    "q_scd2_build",
    "q_sim_lsh_ann",
    "q_sim_label_centroid",
    "q_dedup_embed",
    "q_dedup_semantic",
    "q_stream_enrich_join",
    "q_stream_stream_join",
    "q_stream_upsert_roundtrip",
    "q_source_csv_roundtrip",
    "q_source_partitioned_pruning",
    "q_join_dpp",
    "q_join_range_bucketed",
    "q_join_bucketed",
    "q_text_prep_pipeline",
    "q_zonal_timeseries",
    # --- (c) declared new in round 5 (§2.16): first attestation ---
    "q_ts_sessionize",
    "q_ts_autocorr",
    "q_ts_cusum",
    "q_agg_skew_kurt",
    "q_agg_boolean",
    "q_agg_winsorized_mean",
    "q_behavior_rfm",
    "q_report_yoy_growth",
    "q_report_order_gap_stats",
    "q_join_nearest_event",
    "q_agg_ols_multi",
    "q_agg_percentile_disc",
    # --- (d) declared new in round 5b/5c (§2.17): positions 50+, outside
    # the ~50-key driver window by design — the (a)+(b)+(c) slots above
    # are spoken for; these are parity-proofed in PARITY_r05 and rotate
    # into the r06 driver window with the remaining dark keys (r06
    # window = these 24 §2.17 keys + ~26 of the never-sampled
    # remainder) ---
    "q_sql_pipe_syntax",
    "q_ts_interval_merge",
    "q_stats_ttest",
    "q_stats_chi2",
    "q_stats_mannwhitney",
    "q_ts_rolling_corr",
    "q_behavior_stickiness",
    "q_dedup_cross_source",
    "q_geo_nearest_neighbor",
    "q_window_percent_rank",
    "q_sql_session_variable",
    "q_sql_udf",
    "q_sql_lateral_alias",
    "q_sink_python_ds_write",
    "q_report_segment_migration",
    "q_sample_neyman",
    "q_agg_grouping_flags",
    "q_ts_range_interval_window",
    "q_embed_matryoshka_eval",
    "q_stream_python_sink",
    "q_sql_try_arithmetic",
    "q_scan_metadata_cols",
    "q_sql_scripting_block",
    "q_report_pvm_decomposition",
    # --- (e) declared new in round 5c (§2.18): same rotation story ---
    "q_stats_ks_test",
    "q_stats_anova",
    "q_stats_corr_matrix",
    "q_data_mixture_weights",
    "q_text_filter_funnel",
    "q_tokenizer_fertility",
    "q_warehouse_time_travel",
    "q_sink_write_audit_publish",
    "q_ts_locf_repair",
    "q_graph_assortativity",
    "q_ts_acf_multi",
    "q_privacy_k_anon",
    "q_privacy_rr_count",
    "q_dq_control_chart",
    "q_text_bm25",
    "q_ts_theil_sen",
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
