#!/usr/bin/env python
"""Driver-shaped bench delta (VERDICT r12 next-round #2): compare the
cold 1-run artifact (BENCH_FULL_1run.json — fresh process, registry
order, the exact invocation the driver makes) against the committed
3-run warm medians (BENCH_FULL.json), and flag every key whose cold
1-run exceeds 2x its warm median — the first-touch/attribution class
that made BENCH_r12's only two over-bar keys, surfaced BEFORE the
driver's artifact is judged. Exit 1 if any flagged key also exceeds the
per-key seconds bar."""

from __future__ import annotations

import json
import sys

BAR_SECONDS = 6.2  # 2x-of-baseline per-key bar (VERDICT r12)


def main() -> int:
    with open("BENCH_FULL.json") as f:
        warm = json.load(f)["queries"]
    with open("BENCH_FULL_1run.json") as f:
        cold_doc = json.load(f)
    cold = cold_doc["queries"]
    flagged = sorted(
        (
            (k, cold[k], warm.get(k))
            for k in cold
            if warm.get(k) and cold[k] > 2 * warm[k] and cold[k] > 1.0
        ),
        key=lambda t: -t[1],
    )
    print(f"cold total {cold_doc['total']:.1f} s over {len(cold)} keys")
    print("| key | cold 1-run s | warm 3-run median s | ratio |")
    print("|---|---|---|---|")
    over_bar = False
    for k, c, w in flagged[:10]:
        print(f"| {k} | {c:.2f} | {w:.2f} | {c / w:.2f}x |")
        over_bar = over_bar or c > BAR_SECONDS
    if not flagged:
        print("| (none flagged: no key cold 1-run > 2x warm median) | | | |")
    worst = max(cold.items(), key=lambda t: t[1])
    print(f"\nslowest cold key: {worst[0]} {worst[1]:.2f} s "
          f"(bar {BAR_SECONDS} s)")
    if worst[1] > BAR_SECONDS:
        print("FAIL: a key exceeds the per-key bar in the driver-shaped run")
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
