"""Behavior locks for the Bloom semi-join prefilter and the
degree-oriented triangle count."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from zonal_datacube_spark.functions.bloom import build_bloom, might_contain
from zonal_datacube_spark.operators.graph import q_graph_triangles
from zonal_datacube_spark.operators.joins import (
    BLOOM_REGION,
    q_join_bloom_semi,
)
from zonal_datacube_spark.plans.diagnostics import formatted_plan
from zonal_datacube_spark.sources.loader import load_table


def test_bloom_no_false_negatives_and_bounded_fp(spark):
    supp = load_table(spark, SF_SMOKE, "supplier").select("s_suppkey")
    words = build_bloom(supp, "s_suppkey", 1 << 12, 3)
    # every inserted key passes the membership test
    misses = supp.filter(
        ~might_contain(F.col("s_suppkey"), words, 1 << 12, 3)
    ).count()
    assert misses == 0
    # disjoint probes mostly fail: false-positive rate stays small
    probe = spark.range(1_000_000, 1_010_000).select(
        F.col("id").alias("s_suppkey")
    )
    fp = probe.filter(
        might_contain(F.col("s_suppkey"), words, 1 << 12, 3)
    ).count()
    assert fp / 10_000 < 0.05


def test_bloom_semi_equals_direct_semi_join(spark):
    got = {
        r.n_name: (r.n_items, r.revenue)
        for r in q_join_bloom_semi(spark, SF_SMOKE).collect()
    }
    nation = load_table(spark, SF_SMOKE, "nation")
    region = load_table(spark, SF_SMOKE, "region")
    supp = (
        load_table(spark, SF_SMOKE, "supplier")
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == BLOOM_REGION)
        .select("s_suppkey", "n_name")
    )
    want = {
        r.n_name: (r.n_items, r.revenue)
        for r in load_table(spark, SF_SMOKE, "lineitem")
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .collect()
    }
    assert got == want


def test_bloom_prefilter_is_in_plan_before_join(spark):
    plan = formatted_plan(q_join_bloom_semi(spark, SF_SMOKE))
    assert "xxhash64" in plan  # map-side bit probes survived optimization


def test_triangles_sane_and_no_cartesian(spark):
    row = q_graph_triangles(spark, SF_SMOKE).collect()[0]
    assert row.n_nodes > 0 and row.n_edges > 0
    # urgent orders with >=3 items form cliques, so triangles exist
    assert row.n_triangles > 0
    assert 0.0 <= row.clustering <= 1.0
    assert row.n_edges <= row.n_nodes * (row.n_nodes - 1) // 2
    plan = formatted_plan(q_graph_triangles(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan


def test_sssp_bfs_properties(spark):
    from zonal_datacube_spark.operators.graph import SSSP_SOURCE, q_graph_sssp
    from zonal_datacube_spark.sources.loader import load_table

    rows = q_graph_sssp(spark, SF_SMOKE).collect()
    by_hops = {}
    src_name = {
        r.n_nationkey: r.n_name
        for r in load_table(spark, SF_SMOKE, "nation").collect()
    }[SSSP_SOURCE]
    hops = {r.nation: r.hops for r in rows}
    assert hops[src_name] == 0
    for h in hops.values():
        assert 0 <= h < 25
        by_hops.setdefault(h, 0)
        by_hops[h] += 1
    # BFS levels are contiguous: if hop k is populated, so is k-1
    for h in sorted(by_hops):
        if h > 0:
            assert h - 1 in by_hops


def test_triangles_match_bruteforce(spark):
    """Degree-oriented count vs a plain Python triple-loop on the
    smoke-SF co-purchase graph — catches any orientation bug the
    SQL oracle (itself join-based) could share."""
    from itertools import combinations

    from zonal_datacube_spark.operators.graph import (
        TRIANGLE_PRIORITY,
        q_graph_triangles,
    )

    ev = load_table(spark, SF_SMOKE, "lineitem").join(
        load_table(spark, SF_SMOKE, "orders").filter(
            F.col("o_orderpriority") == TRIANGLE_PRIORITY
        ),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    baskets = {}
    for r in ev.select("o_orderkey", "l_partkey").distinct().collect():
        baskets.setdefault(r.o_orderkey, set()).add(r.l_partkey)
    edges = set()
    for parts in baskets.values():
        for a, b in combinations(sorted(parts), 2):
            edges.add((a, b))
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
    n_tri = sum(
        1
        for (a, b) in edges
        for c in adj.get(b, ())
        if (a, c) in edges
    )
    row = q_graph_triangles(spark, SF_SMOKE).collect()[0]
    assert row.n_edges == len(edges)
    assert row.n_triangles == n_tri
