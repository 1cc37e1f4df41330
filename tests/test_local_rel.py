"""functions/local_rel.py — LocalRelation re-distribution contracts.

The exactness + plan-shape pin for the percentile-fold path lives in
tests/test_grain_percentiles.py::test_local_relation_exact_values_and_
plan_shape; this file pins the helper's own edges: the DDL-string schema
form, the empty-input fallback, and the cell-cap fallback (array cells
count per ELEMENT, so an oversized LUT can't sneak past a row-based cap
into the superlinear parameter-binding path)."""

from __future__ import annotations

from zonal_datacube_spark.functions.local_rel import _MAX_CELLS, local_relation


def _plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().getClass().getSimpleName()


def test_ddl_schema_and_values(spark):
    df = local_relation(spark, [(1, "a"), (2, None)], "k INT, s STRING")
    assert _plan(df) == "LocalRelation"
    assert sorted((r.k, r.s) for r in df.collect()) == [(1, "a"), (2, None)]
    assert [f.dataType.simpleString() for f in df.schema.fields] == [
        "int",
        "string",
    ]


def test_empty_rows_fall_back(spark):
    df = local_relation(spark, [], "k INT, s STRING")
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["k", "s"]


def test_cell_cap_counts_array_elements(spark):
    # 2 rows x (1 + 512) cells > _MAX_CELLS: must take the createDataFrame
    # fallback (binding 1024 literals is slower than the job it saves)
    rows = [(i, [float(j) for j in range(512)]) for i in range(2)]
    assert 2 * 513 > _MAX_CELLS
    df = local_relation(spark, rows, "k INT, v ARRAY<DOUBLE>")
    assert _plan(df) != "LocalRelation"
    assert df.count() == 2
    # while a small array-typed relation stays on the fast path
    small = local_relation(
        spark, [(1, [0.5, 1.5])], "k INT, v ARRAY<DOUBLE>"
    )
    assert _plan(small) == "LocalRelation"
    assert small.collect()[0].v == [0.5, 1.5]
