"""Round-6 seventh wave: referees for INTERSECT ALL, path triples, and
centroid drift, plus plan gates."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE
from zonal_datacube_spark.plans.diagnostics import formatted_plan
from zonal_datacube_spark.registry import all_queries

Q = all_queries()


def _g6(x: float) -> float:
    return math.floor(x * 1_000_000 + 0.5) / 1_000_000


def test_intersect_all_is_multiset_min(spark):
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    cust = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")[
        ["c_custkey", "c_nationkey"]
    ]
    j = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    bag_o = Counter(j.loc[j["o_orderstatus"] == "O", "c_nationkey"])
    bag_f = Counter(j.loc[j["o_orderstatus"] == "F", "c_nationkey"])
    want = {
        k: min(bag_o[k], bag_f[k]) for k in bag_o if k in bag_f
    }
    rows = Q["q_sql_intersect_all"](spark, SF_SMOKE).collect()
    got = {r["nationkey"]: r["n_surviving"] for r in rows}
    assert got == {k: v for k, v in want.items() if v > 0}


def test_path_triples_match_bruteforce(spark):
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    counts: Counter = Counter()
    for _, grp in ev.groupby("user_id"):
        ts = list(grp["event_type"])
        for i in range(len(ts) - 2):
            counts[(ts[i], ts[i + 1], ts[i + 2])] += 1
    want = sorted(
        counts.items(), key=lambda kv: (-kv[1], kv[0])
    )[:10]
    rows = Q["q_behavior_path_triples"](spark, SF_SMOKE).collect()
    got = [
        ((r["step1"], r["step2"], r["step3"]), r["n_paths"]) for r in rows
    ]
    assert got == want


def test_path_triples_single_user_exchange_and_heap(spark):
    plan = formatted_plan(Q["q_behavior_path_triples"](spark, SF_SMOKE))
    assert plan.count("hashpartitioning(user_id") == 1, plan
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_centroid_drift_matches_numpy(spark):
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    x = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    q = np.floor(x * 1_000_000 + 0.5).astype(np.int64)
    half = (emb["vec_id"].to_numpy() % 2).astype(int)
    out = {}
    for h in (0, 1):
        rows = q[half == h]
        s = rows.sum(axis=0)
        n = len(rows)
        out[h] = (s.astype(np.float64) / (n * 1_000_000), n)
    ma, n_a = out[0]
    mb, n_b = out[1]
    g = lambda arr: np.floor(arr * 1e12 + 0.5).astype(np.int64)  # noqa: E731
    sd2 = int(g((ma - mb) * (ma - mb)).sum())
    sab = int(g(ma * mb).sum())
    saa = int(g(ma * ma).sum())
    sbb = int(g(mb * mb).sum())
    row = Q["q_embed_centroid_drift"](spark, SF_SMOKE).collect()[0]
    assert row["n_a"] == n_a and row["n_b"] == n_b
    assert row["l2_shift"] == _g6(math.sqrt(sd2 / 1e12))
    assert row["centroid_cosine"] == _g6(
        (sab / 1e12)
        / (math.sqrt(saa / 1e12) * math.sqrt(sbb / 1e12))
    )
    # centroids of near-isotropic unit vectors are close to the origin,
    # so their cosine is a legitimate noise reading — only range-check it
    assert -1 - 1e-9 <= row["centroid_cosine"] <= 1 + 1e-9
    # ...but the L2 shift between random halves of one corpus is small
    assert row["l2_shift"] < 0.5
