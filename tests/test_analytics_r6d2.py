"""Round-6 fourth wave: independent pandas/numpy referees for the
IGNORE-NULLS window surface, the l-diversity audit, the seasonal-naive
backtest, and kNN-distance outlier scoring, plus plan gates for the
shapes the docstrings claim."""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE
from zonal_datacube_spark.plans.diagnostics import formatted_plan
from zonal_datacube_spark.registry import all_queries

Q = all_queries()


def _g6(x: float) -> float:
    return math.floor(x * 1_000_000 + 0.5) / 1_000_000


def _events() -> pd.DataFrame:
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["us"] = (
        (ev["ts"] - pd.Timestamp("1970-01-01")) // pd.Timedelta("1us")
    ).astype("int64")
    ev["cents"] = np.floor(ev["value"].to_numpy() * 100 + 0.5).astype(
        "int64"
    )
    return ev


# --------------------------------------------------------------------------
# IGNORE NULLS
# --------------------------------------------------------------------------


def test_ignore_nulls_matches_bruteforce(spark):
    ev = _events().sort_values(["user_id", "us", "event_id"])
    got = {
        r["event_id"]: r
        for r in Q["q_window_ignore_nulls"](spark, SF_SMOKE).collect()
    }
    assert len(got) == len(ev)
    for _, grp in ev.groupby("user_id"):
        rows = grp.to_dict("records")
        for i, r in enumerate(rows):
            prev_p = [
                x["cents"]
                for x in rows[:i]
                if x["event_type"] == "purchase"
            ]
            nxt_e = [
                x["cents"]
                for x in rows[i:]
                if x["event_type"] == "error"
            ]
            second_p = [
                x["cents"]
                for x in rows[: i + 1]
                if x["event_type"] == "purchase"
            ]
            g = got[r["event_id"]]
            assert g["prev_purchase_cents"] == (
                prev_p[-1] if prev_p else -1
            )
            assert g["next_error_cents"] == (nxt_e[0] if nxt_e else -1)
            assert g["second_purchase_cents"] == (
                second_p[1] if len(second_p) >= 2 else -1
            )


def test_ignore_nulls_windows_share_one_user_exchange(spark):
    plan = formatted_plan(Q["q_window_ignore_nulls"](spark, SF_SMOKE))
    assert plan.count("hashpartitioning(user_id") == 1, plan
    assert "CartesianProduct" not in plan


# --------------------------------------------------------------------------
# l-diversity
# --------------------------------------------------------------------------


def test_l_diversity_matches_pandas(spark):
    cust = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    cust["band"] = np.floor(cust["c_acctbal"] / 1000).astype("int64")
    cls = cust.groupby(["c_nationkey", "band"]).agg(
        s=("c_mktsegment", "size"), l=("c_mktsegment", "nunique")
    )
    row = Q["q_privacy_l_diversity"](spark, SF_SMOKE).collect()[0]
    assert row["n_rows"] == len(cust)
    assert row["n_classes"] == len(cls)
    assert row["min_l"] == int(cls["l"].min())
    low = cls[cls["l"] < 3]
    assert row["n_classes_low_l"] == len(low)
    assert row["n_rows_low_l"] == int(low["s"].sum())
    assert row["low_l_row_share"] == _g6(low["s"].sum() / len(cust))


# --------------------------------------------------------------------------
# seasonal-naive backtest
# --------------------------------------------------------------------------


def test_seasonal_naive_matches_pandas(spark):
    ev = _events()
    ev["d"] = (
        ev["ts"].dt.floor("D") - pd.Timestamp("1970-01-01")
    ).dt.days
    daily = (
        ev.groupby(["event_type", "d"])["cents"].sum().reset_index()
    )
    got = {
        r["event_type"]: r
        for r in Q["q_ts_seasonal_naive_eval"](spark, SF_SMOKE).collect()
    }
    for et, grp in daily.groupby("event_type"):
        m = dict(zip(grp["d"], grp["cents"]))
        ae1 = ae7 = n = 0
        for d, y in m.items():
            if d - 1 in m and d - 7 in m:
                n += 1
                ae1 += abs(y - m[d - 1])
                ae7 += abs(y - m[d - 7])
        r = got[et]
        assert r["n_eval_days"] == n
        assert r["mae_naive_usd"] == _g6(ae1 / n / 100)
        assert r["mae_seasonal_usd"] == _g6(ae7 / n / 100)
        want = (
            "seasonal_naive"
            if ae7 < ae1
            else ("naive" if ae1 < ae7 else "tie")
        )
        assert r["better_model"] == want


def test_seasonal_naive_joins_are_broadcast(spark):
    plan = formatted_plan(Q["q_ts_seasonal_naive_eval"](spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


# --------------------------------------------------------------------------
# kNN outlier
# --------------------------------------------------------------------------


def test_outlier_knn_matches_bruteforce(spark):
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    x = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    bucket = (x[:, :8] > 0) @ (1 << np.arange(8))
    ids = emb["vec_id"].to_numpy()
    labels = emb["label"].to_numpy()
    scores = []
    for i in range(len(ids)):
        cand = np.where((bucket == bucket[i]) & (ids != ids[i]))[0]
        if not len(cand):
            continue
        sims = [
            (
                int(
                    math.floor(
                        round(float(np.dot(x[i], x[j])), 6) * 1_000_000
                        + 0.5
                    )
                ),
                ids[j],
            )
            for j in cand
        ]
        sims.sort(key=lambda t: (-t[0], t[1]))
        top = sims[:3]
        dist_sum = sum(1_000_000 - s for s, _ in top)
        scores.append(
            (
                ids[i],
                int(labels[i]),
                len(top),
                _g6(dist_sum / (len(top) * 1_000_000)),
            )
        )
    scores.sort(key=lambda t: (-t[3], t[0]))
    want = scores[:20]
    rows = Q["q_embed_outlier_knn"](spark, SF_SMOKE).collect()
    got = [
        (
            r["vec_id"],
            r["label"],
            r["n_neighbors"],
            r["mean_knn_dist"],
        )
        for r in rows
    ]
    assert got == want


def test_outlier_knn_is_bucketed_and_heap_limited(spark):
    plan = formatted_plan(Q["q_embed_outlier_knn"](spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    assert "TakeOrderedAndProject" in plan  # top-20 is a heap, not a sort
