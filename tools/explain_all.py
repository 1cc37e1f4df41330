#!/usr/bin/env python
"""Dump the formatted physical plan for every declared query — the
development loop behind SURVEY.md §4.2 ('.explain the plan and iterate
until it's the plan you'd want').

Usage: python tools/explain_all.py [sf_dir] [key ...]
Greppable output: one '== key ==' header per plan. Quick red flags:
  - CartesianProduct where a broadcast was intended
  - SortMergeJoin against a dimension table (missing broadcast)
  - more Exchange nodes than the operator needs
  - a Scan without PushedFilters under a filtering query
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zonal_datacube_spark.plans.diagnostics import formatted_plan
from zonal_datacube_spark.registry import all_queries
from zonal_datacube_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and os.path.isdir(args[0]) else "/root/testdata/sf0.001"
    keys = [a for a in args if not os.path.isdir(a)]
    queries = all_queries()
    spark = get_spark("explain-all")
    for k in keys or sorted(queries):
        print(f"\n== {k} ==")
        try:
            print(formatted_plan(queries[k](spark, sf_dir)))
        except Exception as exc:
            print(f"ERROR: {type(exc).__name__}: {exc}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
