"""Canonicalizer-parity guard: the repo's comparison must be at least as
strict as the driver's. The r02 driver run crashed hashing an array-valued
output cell (q_agg_percentile_approx) that the repo's stringifying
canonicalizer accepted — this class of divergence must be caught locally.

Two layers:
- unit semantics of `_canon` (float repr, int/bool, datetime, NULL
  sentinel, column sort, order-insensitive row sort);
- a full-registry sweep asserting NO declared key's result schema carries
  a driver-unhashable column (array/map at any nesting). Schema-only, so
  the sweep declares 201 plans without executing them.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE
from zonal_datacube_spark.compare import _canon, driver_unhashable_cols
from zonal_datacube_spark.registry import all_queries


class TestCanonSemantics:
    def test_column_sort_and_row_sort_order_insensitive(self):
        a = pd.DataFrame({"b": [2, 1], "a": ["y", "x"]})
        b = pd.DataFrame({"a": ["x", "y"], "b": [1, 2]})
        assert _canon(a).equals(_canon(b))

    def test_float_cells_repr_after_round9(self):
        # driver hashes post-round values; 1e-10 noise must not split rows
        a = pd.DataFrame({"v": [0.1 + 1e-12]})
        b = pd.DataFrame({"v": [0.1]})
        assert _canon(a).equals(_canon(b))

    def test_int_float_dtype_unified_to_value(self):
        # an int64 1 and a float 1.0 canonicalize differently by design
        # (dtype drift is a separate check) but each is deterministic
        a = pd.DataFrame({"v": pd.array([1, None], dtype="Int64")})
        out = _canon(a)
        assert out["v"].iloc[1] == "\0NULL" or out["v"].iloc[0] == "\0NULL"

    def test_null_vs_string_null_distinct(self):
        a = pd.DataFrame({"v": [None]})
        b = pd.DataFrame({"v": ["None"]})
        assert not _canon(a).equals(_canon(b))

    def test_datetime_formatting_stable(self):
        a = pd.DataFrame({"t": pd.to_datetime(["2024-01-02 03:04:05.000006"])})
        assert _canon(a)["t"].iloc[0] == "2024-01-02 03:04:05.000006"


class TestDriverHashability:
    def test_array_column_flagged(self, spark):
        df = spark.createDataFrame([(1, [1.0, 2.0])], "id INT, emb ARRAY<DOUBLE>")
        assert driver_unhashable_cols(df.schema) == ["emb"]

    def test_map_and_nested_struct_flagged(self, spark):
        df = spark.createDataFrame(
            [], "m MAP<STRING,INT>, s STRUCT<x: INT, a: ARRAY<INT>>, ok STRUCT<x: INT>"
        )
        assert driver_unhashable_cols(df.schema) == ["m", "s"]

    def test_every_declared_key_is_driver_hashable(self, spark):
        # schema-only sweep of the full registry: declaring the plan reads
        # parquet footers but runs no query jobs
        bad = {}
        for key, fn in sorted(all_queries().items()):
            schema = fn(spark, SF_SMOKE).schema
            cols = driver_unhashable_cols(schema)
            if cols:
                bad[key] = cols
        assert not bad, f"driver-unhashable result columns: {bad}"
