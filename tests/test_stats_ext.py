"""Behavior + plan locks for the stats_ext keys: regression aggregates,
IQR fences, weighted median, skyline dominance, bitwise aggregates,
symmetric difference."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from zonal_datacube_spark.operators.stats_ext import (
    q_agg_bitwise,
    q_agg_corr_regr,
    q_agg_weighted_median,
    q_dq_outlier_iqr,
    q_set_symmetric_diff,
    q_skyline_dominance,
)
from zonal_datacube_spark.plans.diagnostics import formatted_plan
from zonal_datacube_spark.sources.loader import load_table


def test_corr_regr_bounds(spark):
    rows = q_agg_corr_regr(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert -1.0 <= r.corr_qp <= 1.0
        assert 0.0 <= r.r2 <= 1.0
        # r2 of simple OLS is corr² (up to rounding noise)
        assert abs(r.r2 - r.corr_qp**2) < 1e-4
        # slope and covariance share their sign
        assert (r.slope >= 0) == (r.covar_qp >= 0)


def test_iqr_fences_ordered_and_outliers_bounded(spark):
    rows = q_dq_outlier_iqr(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.fence_lo <= r.q1 <= r.q3 <= r.fence_hi
        assert 0 <= r.n_outliers < r.n_rows


def test_weighted_median_is_weight_midpoint(spark):
    """The weighted median must be a real data value with cumulative
    weight straddling half the total."""
    rows = {r.l_returnflag: r for r in q_agg_weighted_median(spark, SF_SMOKE).collect()}
    li = load_table(spark, SF_SMOKE, "lineitem")
    for flag, r in rows.items():
        below, at, total = (
            li.filter(F.col("l_returnflag") == flag)
            .agg(
                F.sum(
                    F.when(
                        F.col("l_extendedprice") < r.w_median, F.col("l_quantity")
                    ).otherwise(F.lit(0))
                ),
                F.sum(
                    F.when(
                        F.col("l_extendedprice") == r.w_median, F.col("l_quantity")
                    ).otherwise(F.lit(0))
                ),
                F.sum("l_quantity"),
            )
            .collect()[0]
        )
        assert at > 0, "median must be an actual data value"
        assert below * 2 < total or below == 0
        assert (below + at) * 2 >= total


def test_skyline_is_mutually_nondominated_and_maximal(spark):
    sky = q_skyline_dominance(spark, SF_SMOKE).collect()
    assert sky
    # pairwise non-domination within the skyline
    for a in sky:
        for b in sky:
            if a.p_partkey == b.p_partkey:
                continue
            dominates = (
                a.p_retailprice <= b.p_retailprice
                and a.p_size >= b.p_size
                and (a.p_retailprice < b.p_retailprice or a.p_size > b.p_size)
            )
            assert not dominates
    # no excluded part dominates a skyline member (maximality spot check:
    # the cheapest part overall is always on the skyline)
    part = load_table(spark, SF_SMOKE, "part")
    min_price = part.agg(F.min("p_retailprice")).collect()[0][0]
    assert any(r.p_retailprice == min_price for r in sky)


def test_skyline_plan_has_no_quadratic_join(spark):
    import re

    plan = formatted_plan(q_skyline_dominance(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    # prefix_sweep's global-bounds broadcast is a ONE-ROW build side that
    # Catalyst plans as a nested-loop node (the same shape as every
    # scalar-subquery broadcast in the repo); the subtree feeds both the
    # window path and the bucket-totals rollup, so it appears twice. The
    # bucket-offset join itself must stay a HASH join — any further NLJ
    # would be a genuine quadratic pair join.
    nlj_nodes = re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)
    assert len(nlj_nodes) <= 2, plan
    assert "BroadcastHashJoin" in plan


def test_bitwise_identities(spark):
    rows = q_agg_bitwise(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # AND result bits are a subset of OR result bits
        assert r.key_and & r.key_or == r.key_and
        assert r.key_xor & ~r.key_or == 0


def test_symmetric_diff_sides_disjoint(spark):
    rows = q_set_symmetric_diff(spark, SF_SMOKE).collect()
    a = {r.o_custkey for r in rows if r.side.endswith("1996")}
    b = {r.o_custkey for r in rows if r.side.endswith("1997")}
    assert a or b
    assert not (a & b)


def test_lateral_topn_shape(spark):
    from zonal_datacube_spark.operators.joins import (
        LATERAL_TOPN,
        q_join_lateral_topn,
    )

    rows = q_join_lateral_topn(spark, SF_SMOKE).collect()
    by_nation = {}
    for r in rows:
        by_nation.setdefault(r.n_name, []).append(r.c_acctbal)
    assert by_nation
    for bals in by_nation.values():
        assert 1 <= len(bals) <= LATERAL_TOPN
        assert bals == sorted(bals, reverse=True)


def test_overlap_jaccard_bounds(spark):
    from zonal_datacube_spark.operators.sorts_sets import q_set_overlap_jaccard

    rows = q_set_overlap_jaccard(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.type_a < r.type_b
        assert 0 < r.n_inter <= min(r.n_a, r.n_b)
        assert 0.0 < r.jaccard <= 1.0


def test_mad_outliers_sane(spark):
    from zonal_datacube_spark.operators.stats_ext import q_dq_outlier_mad

    rows = q_dq_outlier_mad(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert r.mad > 0
        assert 0 <= r.n_outliers < r.n_rows
        # flagged points exist iff the max modified-z clears the cutoff
        assert (r.n_outliers > 0) == (r.max_abs_mz > 3.5)


def test_kmeans_key_partitions_all_vectors(spark):
    from zonal_datacube_spark.operators.similarity import (
        KMEANS_K,
        q_embed_kmeans,
    )

    rows = q_embed_kmeans(spark, SF_SMOKE).collect()
    assert 1 <= len(rows) <= KMEANS_K
    total = load_table(spark, SF_SMOKE, "embeddings").count()
    assert sum(r.n_vecs for r in rows) == total
    for r in rows:
        assert -1.0 - 1e-9 <= r.avg_cos <= 1.0 + 1e-9


def test_geomean_am_gm_inequality(spark):
    from zonal_datacube_spark.operators.stats_ext import q_agg_geomean

    rows = q_agg_geomean(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 < r.geo_mean <= r.arith_mean  # AM-GM


def test_entropy_normalized_bounds(spark):
    from zonal_datacube_spark.operators.stats_ext import (
        ENTROPY_BUCKETS,
        q_agg_entropy,
    )

    rows = q_agg_entropy(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_buckets_hit <= ENTROPY_BUCKETS
        assert 0.0 <= r.norm_entropy <= 1.0 + 1e-9
        if r.n_buckets_hit == 1:
            assert r.norm_entropy == 0.0


def test_gini_bounds_and_known_cases(spark):
    from zonal_datacube_spark.operators.stats_ext import q_agg_gini

    rows = q_agg_gini(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # Gini of positive values lies in [0, 1)
        assert 0.0 <= r.gini < 1.0


def test_pmi_symmetric_in_definition(spark):
    from zonal_datacube_spark.operators.text import PMI_TOPK, q_text_pmi

    rows = q_text_pmi(spark, SF_SMOKE).collect()
    assert 1 <= len(rows) <= PMI_TOPK
    counts = [r.n_ab for r in rows]
    assert counts == sorted(counts, reverse=True)
    for r in rows:
        assert r.w1 < r.w2
        # co-occurrence can't exceed either unigram doc count, so
        # PMI ≤ ln(N / max(n_a, n_b)) ≤ ln(N); loose sanity bound
        assert r.pmi <= 20


def test_quantiles_multi_monotone(spark):
    from zonal_datacube_spark.operators.stats_ext import (
        QUANTILE_PS,
        q_agg_quantiles_multi,
    )

    rows = q_agg_quantiles_multi(spark, SF_SMOKE).collect()
    by_flag = {}
    for r in rows:
        by_flag.setdefault(r.l_returnflag, {})[r.p] = r.q
    for qs in by_flag.values():
        assert set(qs) == set(QUANTILE_PS)
        ordered = [qs[p] for p in sorted(qs)]
        assert ordered == sorted(ordered)  # quantiles are monotone in p


def test_ltv_deciles_shares_sum_to_one(spark):
    from zonal_datacube_spark.operators.stats_ext import (
        LTV_DECILES,
        q_report_ltv_deciles,
    )

    rows = sorted(q_report_ltv_deciles(spark, SF_SMOKE).collect(), key=lambda r: r.decile)
    assert len(rows) == LTV_DECILES
    assert abs(sum(r.rev_share for r in rows) - 1.0) < 1e-4
    revs = [r.revenue / r.n_customers for r in rows]
    assert revs == sorted(revs, reverse=True)  # avg spend falls by decile


def test_skyline_matches_bruteforce(spark):
    """Sort-based sweep vs the O(n²) definition evaluated in Python —
    independent of BOTH the Spark plan and the SQL oracle."""
    parts = load_table(spark, SF_SMOKE, "part").select(
        "p_partkey", "p_retailprice", "p_size"
    ).collect()
    brute = {
        p.p_partkey
        for p in parts
        if not any(
            q.p_retailprice <= p.p_retailprice
            and q.p_size >= p.p_size
            and (q.p_retailprice < p.p_retailprice or q.p_size > p.p_size)
            for q in parts
        )
    }
    got = {r.p_partkey for r in q_skyline_dominance(spark, SF_SMOKE).collect()}
    assert got == brute


def test_concurrency_sweep_matches_bruteforce(spark):
    """+1/−1 sweep vs the O(n²) point-stabbing count at every interval
    start — the maximum overlap is always attained at some start."""
    import datetime

    from zonal_datacube_spark.operators.timeseries import (
        CONCURRENCY_DAYS,
        q_ts_concurrency,
    )

    got = {
        r.o_orderpriority: r.max_concurrent
        for r in q_ts_concurrency(spark, SF_SMOKE).collect()
    }
    span = datetime.timedelta(days=CONCURRENCY_DAYS)
    starts = {}
    for r in load_table(spark, SF_SMOKE, "orders").select(
        "o_orderpriority", "o_orderdate"
    ).collect():
        starts.setdefault(r.o_orderpriority, []).append(r.o_orderdate)
    for prio, ss in starts.items():
        brute = max(
            sum(1 for t in ss if t <= s < t + span) for s in ss
        )
        assert got[prio] == brute, prio


def test_zonal_change_epochs_partition_cells(spark):
    from zonal_datacube_spark.operators.zonal import (
        q_zonal_change,
        q_zonal_stats,
    )

    change = {r.zone_id: r for r in q_zonal_change(spark, SF_SMOKE).collect()}
    totals = {r.zone_id: r.n_cells for r in q_zonal_stats(spark, SF_SMOKE).collect()}
    assert change
    for z, r in change.items():
        assert r.n_p1 + r.n_p2 == totals[z]  # epochs partition every zone
        if r.mean_p1 and r.mean_p2:
            assert abs(r.delta - round(r.mean_p2 - r.mean_p1, 6)) < 1e-9


def test_raster_focal_neighborhood_classes(spark):
    from zonal_datacube_spark.operators.zonal import RASTER_N, q_raster_focal

    rows = {r.n_nbrs: r for r in q_raster_focal(spark, SF_SMOKE).collect()}
    assert set(rows) == {4, 6, 9}
    assert rows[4].n_cells == 4  # corners
    assert rows[6].n_cells == 4 * (RASTER_N - 2)  # edges
    assert rows[9].n_cells == (RASTER_N - 2) ** 2  # interior
    for r in rows.values():
        assert 0 <= r.min_focal_mean <= r.avg_focal_mean <= r.max_focal_mean <= 96


def test_entropy_matches_numpy(spark):
    """Bucketed Shannon entropy vs a numpy histogram on identical
    equal-width edges."""
    import numpy as np

    from zonal_datacube_spark.operators.stats_ext import (
        ENTROPY_BUCKETS,
        q_agg_entropy,
    )

    got = {r.event_type: r for r in q_agg_entropy(spark, SF_SMOKE).collect()}
    ev = load_table(spark, SF_SMOKE, "events").select("event_type", "value")
    by_type = {}
    for r in ev.collect():
        by_type.setdefault(r.event_type, []).append(r.value)
    for etype, vals in by_type.items():
        v = np.asarray(vals)
        lo, hi = v.min(), v.max()
        idx = np.minimum(
            ENTROPY_BUCKETS - 1,
            np.floor((v - lo) / ((hi - lo) / ENTROPY_BUCKETS)).astype(int),
        )
        counts = np.bincount(idx, minlength=ENTROPY_BUCKETS)
        p = counts[counts > 0] / counts.sum()
        ref = float(-(p * np.log2(p)).sum() / np.log2(ENTROPY_BUCKETS))
        assert abs(got[etype].norm_entropy - ref) < 1e-5
        assert got[etype].n_buckets_hit == int((counts > 0).sum())
