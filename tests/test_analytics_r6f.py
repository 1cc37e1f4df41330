"""Round-6 sixth wave: referees for the decode-shard planner, the
link-prediction Jaccard, graph reciprocity, and the generalization
eval, plus plan/shape gates."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from tests.conftest import SF_SMOKE
from zonal_datacube_spark.plans.diagnostics import formatted_plan
from zonal_datacube_spark.registry import all_queries

Q = all_queries()


def _g6(x: float) -> float:
    return math.floor(x * 1_000_000 + 0.5) / 1_000_000


def test_decode_shards_match_sequential_packing(spark):
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet").sort_values(
        "doc_id"
    )
    cum = 0
    shards: dict[int, list] = {}
    for _, r in docs.iterrows():
        sid = cum // 32_000
        shards.setdefault(sid, []).append(r)
        cum += r["n_chars"]
    rows = Q["q_media_decode_shards"](spark, SF_SMOKE).collect()
    assert len(rows) == len(shards)
    for r in rows:
        members = shards[r["shard_id"]]
        assert r["n_docs"] == len(members)
        assert r["total_chars"] == sum(m["n_chars"] for m in members)
        assert r["first_doc"] == members[0]["doc_id"]
        assert r["last_doc"] == members[-1]["doc_id"]
    # shard ranges are contiguous and ordered — an executor reads one
    # id range
    ordered = sorted(rows, key=lambda r: r["shard_id"])
    for a, b in zip(ordered, ordered[1:]):
        assert b["first_doc"] == a["last_doc"] + 1


def test_decode_shards_ride_the_prefix_sweep(spark):
    plan = formatted_plan(Q["q_media_decode_shards"](spark, SF_SMOKE))
    assert "_zds_ps_bucket" in plan
    assert "CartesianProduct" not in plan


def _und_ref() -> set[tuple[int, int]]:
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")[
        ["l_orderkey", "l_suppkey"]
    ]
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")[
        ["o_orderkey", "o_custkey"]
    ]
    cust = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")[
        ["c_custkey", "c_nationkey"]
    ]
    supp = pd.read_parquet(f"{SF_SMOKE}/supplier.parquet")[
        ["s_suppkey", "s_nationkey"]
    ]
    j = (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    )
    edges = (
        j.groupby(["c_nationkey", "s_nationkey"])
        .size()
        .reset_index(name="w")
    )
    edges = edges[edges["c_nationkey"] != edges["s_nationkey"]]
    edges = edges.sort_values(
        ["w", "c_nationkey", "s_nationkey"],
        ascending=[False, True, True],
    ).reset_index(drop=True)
    n_e = len(edges)
    cut = edges[(edges.index + 1) * 4 <= n_e]
    und = set()
    for _, r in cut.iterrows():
        und.add((r["c_nationkey"], r["s_nationkey"]))
        und.add((r["s_nationkey"], r["c_nationkey"]))
    return und


def test_link_jaccard_matches_bruteforce(spark):
    und = _und_ref()
    nbrs: dict[int, set] = {}
    for a, b in und:
        nbrs.setdefault(a, set()).add(b)
    cands = []
    nodes = sorted(nbrs)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1 :]:
            if (a, b) in und:
                continue
            common = len(nbrs[a] & nbrs[b])
            if common == 0:
                continue
            union = len(nbrs[a] | nbrs[b])
            cands.append((common / union, a, b, common, union))
    cands.sort(key=lambda t: (-t[0], t[1], t[2]))
    want = cands[:10]
    rows = Q["q_graph_link_jaccard"](spark, SF_SMOKE).collect()
    assert len(rows) == len(want)
    for r, (score, a, b, common, union) in zip(rows, want):
        assert (r["a"], r["b"]) == (a, b)
        assert r["n_common"] == common
        assert r["n_union"] == union
        assert r["jaccard"] == _g6(score)


def test_reciprocity_matches_bruteforce(spark):
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")[
        ["l_orderkey", "l_suppkey"]
    ]
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")[
        ["o_orderkey", "o_custkey"]
    ]
    cust = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")[
        ["c_custkey", "c_nationkey"]
    ]
    supp = pd.read_parquet(f"{SF_SMOKE}/supplier.parquet")[
        ["s_suppkey", "s_nationkey"]
    ]
    j = (
        li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
        .merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(supp, left_on="l_suppkey", right_on="s_suppkey")
    )
    w = {
        (a, b): c
        for (a, b), c in j.groupby(["c_nationkey", "s_nationkey"])
        .size()
        .items()
        if a != b
    }
    n_edges = len(w)
    n_rec = sum(1 for (a, b) in w if (b, a) in w)
    total = sum(w.values())
    rec_w = sum(
        min(c, w[(b, a)]) for (a, b), c in w.items() if (b, a) in w
    )
    row = Q["q_graph_reciprocity"](spark, SF_SMOKE).collect()[0]
    assert row["n_edges"] == n_edges
    assert row["n_reciprocated"] == n_rec
    assert row["total_weight"] == total
    assert row["reciprocated_weight"] == rec_w
    assert row["edge_reciprocity"] == _g6(n_rec / n_edges)
    assert row["weight_reciprocity"] == _g6(rec_w / total)


def test_generalization_reduces_risk(spark):
    cust = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    nation = pd.read_parquet(f"{SF_SMOKE}/nation.parquet")
    j = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    rows = {
        r["level"]: r
        for r in Q["q_privacy_generalization"](spark, SF_SMOKE).collect()
    }

    def census(geo: str, band: int):
        g = j.copy()
        g["band"] = np.floor(g["c_acctbal"] / band).astype("int64")
        cls = g.groupby([geo, "c_mktsegment", "band"]).size()
        risky = int(cls[cls < 5].sum())
        return len(cls), int(cls.min()), risky

    for level, geo, band in (
        ("fine", "c_nationkey", 1000),
        ("generalized", "n_regionkey", 5000),
    ):
        n_classes, min_size, risky = census(geo, band)
        r = rows[level]
        assert r["n_rows"] == len(j)
        assert r["n_classes"] == n_classes
        assert r["min_class_size"] == min_size
        assert r["n_rows_risky"] == risky
        assert r["risky_share"] == _g6(risky / len(j))
    # the whole point of the key: coarsening buys risk down
    assert (
        rows["generalized"]["n_rows_risky"] <= rows["fine"]["n_rows_risky"]
    )
