"""Registry ordering + bench-output contracts.

The driver records the first ~50 registry keys in CORRECTNESS_r{N}.json and
keeps only a ~2 KB stdout tail of bench.py (round 1: a 2.3 KB JSON line got
truncated → ``parsed: null``). These tests lock both artifacts' shape.
"""

from __future__ import annotations

import json

from bench import bench_json_line
from zonal_datacube_spark.registry import KEY_ORDER, all_oracle_sql, all_queries


CHANGED_IN_R05 = (
    # the prefix-sweep family + minute-grain anomaly + oracle/guard edits
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
)


def test_registry_order_puts_priority_keys_first():
    """Window policy (VERDICT r04 next-round #5): the driver records
    CORRECTNESS rows for the first ~50 keys only. Round-5 window = (a)
    every key whose implementation changed this round (fresh driver
    attestation for the rewrites), then (b) keys that have NEVER been in
    any driver CORRECTNESS window — at least 40 of them, pushing
    driver-attested coverage past 80% after this round. The dark set is
    derived from the CORRECTNESS_r0x artifacts themselves, so this test
    re-validates whenever a new artifact lands."""
    import glob
    import json
    import os

    keys = list(all_queries())
    assert keys[: len(KEY_ORDER)] == list(KEY_ORDER)
    window = set(keys[:50])

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sampled: set[str] = set()
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r0[1-4].json"))):
        with open(path) as fh:
            sampled |= set(json.load(fh))
    dark_in_window = [k for k in keys[:50] if k not in sampled]
    assert len(dark_in_window) >= 40, (
        f"only {len(dark_in_window)} never-sampled keys in the window"
    )
    for k in CHANGED_IN_R05:
        assert k in window, k


def test_oracle_keys_subset_and_ordered_like_queries():
    queries, oracle = all_queries(), all_oracle_sql()
    assert set(oracle) <= set(queries)
    qpos = {k: i for i, k in enumerate(queries)}
    assert sorted(oracle, key=qpos.__getitem__) == list(oracle)


def test_bench_json_line_fits_driver_tail_buffer():
    # plausible worst case: a slow tail of 8 two-digit queries, the rest
    # sub-10s (a suite where EVERY query is >10s would be 800s+ — far past
    # any state this repo ships in)
    keys = list(all_queries())
    timings = {k: (13.3476 if i < 8 else 9.5832) for i, k in enumerate(keys)}
    line = bench_json_line(timings, 0.1)
    assert len(line) <= 1880, len(line)
    parsed = json.loads(line)
    assert parsed["unit"] == "sec"
    assert "\n" not in line
    kept = set(parsed["queries"])
    assert kept <= set(keys)
    if "queries_omitted" in parsed:
        # omission tier: count must reconcile, BASELINE.md headline keys
        # and the slowest (most-judged) keys must survive
        assert len(kept) + parsed["queries_omitted"] == len(keys)
        for k in ("q_agg_groupby", "q_join_multiway", "q_window_topk_per_group"):
            assert k in kept, k
        slowest = sorted(timings, key=timings.get, reverse=True)[:8]
        assert set(slowest) <= kept
        assert "p50" in parsed and "p95" in parsed
    else:
        assert kept == set(keys)


def test_rows_only_keys_emit_scalar_only_schemas(spark):
    """The driver's rows-only canonicalizer sorts every output column —
    array/map/struct cells are unhashable there and crash the check
    (CORRECTNESS_r02's q_agg_percentile_approx red row). Lock the
    invariant: every key declared without an oracle returns scalars."""
    from tests.conftest import SF_SMOKE

    queries, oracle = all_queries(), all_oracle_sql()
    rows_only = [k for k in queries if k not in oracle]
    assert rows_only, "suite always carries rows-only keys"
    for k in rows_only:
        df = queries[k](spark, SF_SMOKE)
        nested = [
            f.name
            for f in df.schema.fields
            if type(f.dataType).__name__ in ("ArrayType", "MapType", "StructType")
        ]
        assert not nested, f"{k} returns unhashable columns: {nested}"
