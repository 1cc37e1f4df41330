"""Round-6 eighth wave: referees for the multi-horizon backtest, the
Jensen–Shannon language divergence, and the Bollinger breakout census,
plus plan gates."""

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


def _daily() -> pd.DataFrame:
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    d = (ev["ts"].dt.floor("D") - pd.Timestamp("1970-01-01")).dt.days
    cents = np.floor(ev["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    return (
        pd.DataFrame({"event_type": ev["event_type"], "d": d, "c": cents})
        .groupby(["event_type", "d"], as_index=False)["c"]
        .sum()
    )


def test_horizon_backtest_matches_pandas(spark):
    daily = _daily()
    got = {
        (r["event_type"], r["horizon_days"]): r
        for r in Q["q_ts_horizon_backtest"](spark, SF_SMOKE).collect()
    }
    for et, grp in daily.groupby("event_type"):
        m = dict(zip(grp["d"], grp["c"]))
        for h in (1, 3, 7, 14):
            errs = [
                abs(y - m[d - h]) for d, y in m.items() if d - h in m
            ]
            r = got[(et, h)]
            assert r["n_eval_days"] == len(errs)
            assert r["mae_usd"] == _g6(sum(errs) / len(errs) / 100)


def test_js_divergence_matches_python(spark):
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    by_lang: dict[str, Counter] = {}
    for _, r in docs.iterrows():
        by_lang.setdefault(r["lang"], Counter()).update(
            r["text"].lower().split(" ")
        )
    probs = {
        lang: {t: c / sum(cnt.values()) for t, c in cnt.items()}
        for lang, cnt in by_lang.items()
    }
    got = {
        (r["lang_a"], r["lang_b"]): r
        for r in Q["q_text_js_divergence"](spark, SF_SMOKE).collect()
    }
    langs = sorted(probs)
    G = 1_000_000_000
    for i, la in enumerate(langs):
        for lb in langs[i + 1 :]:
            pa, pb = probs[la], probs[lb]
            shared = set(pa) & set(pb)
            sum_tq = sum_paq = sum_pbq = 0
            for t in shared:
                m = (pa[t] + pb[t]) / 2
                term = pa[t] * math.log(pa[t] / m) + pb[t] * math.log(
                    pb[t] / m
                )
                sum_tq += math.floor(term * G + 0.5)
                sum_paq += math.floor(pa[t] * G + 0.5)
                sum_pbq += math.floor(pb[t] * G + 0.5)
            js = (
                sum_tq / G
                + (2 * G - sum_paq - sum_pbq) / G * 0.6931471805599453
            ) / 2
            r = got[(la, lb)]
            assert r["n_shared_terms"] == len(shared)
            assert abs(r["js_divergence"] - _g6(js)) <= 1e-9
            # JS in nats is bounded by ln 2 and non-negative
            assert -1e-9 <= r["js_divergence"] <= 0.6931472


def test_bollinger_matches_integer_reference(spark):
    daily = _daily()
    got = {
        r["event_type"]: r
        for r in Q["q_ts_bollinger"](spark, SF_SMOKE).collect()
    }
    for et, grp in daily.groupby("event_type"):
        xs = list(grp.sort_values("d")["c"])
        n_scored = up = down = 0
        for i in range(len(xs)):
            window = xs[max(0, i - 7) : i]
            n = len(window)
            if n < 4:
                continue
            n_scored += 1
            sx, sxx = sum(window), sum(v * v for v in window)
            lhs = xs[i] * n - sx
            rhs = 4 * (n * sxx - sx * sx)
            if lhs * lhs > rhs:
                if lhs > 0:
                    up += 1
                else:
                    down += 1
        r = got[et]
        assert r["n_days_scored"] == n_scored
        assert r["n_breakouts_up"] == up
        assert r["n_breakouts_down"] == down


def test_wave8_plans_are_clean(spark):
    for k in (
        "q_ts_horizon_backtest",
        "q_text_js_divergence",
        "q_ts_bollinger",
    ):
        plan = formatted_plan(Q[k](spark, SF_SMOKE))
        assert "CartesianProduct" not in plan, k
    # the horizon table is broadcast, never shuffled
    plan = formatted_plan(Q["q_ts_horizon_backtest"](spark, SF_SMOKE))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
