"""Z-order layout: Morton key correctness vs a Python reference, and the
actual data-skipping win — parquet footers (read with pyarrow) must show
that a filter on the SECOND dimension can skip files under the z-ordered
layout while the single-column-sorted layout cannot skip any."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from zonal_datacube_spark.functions.zorder import write_zordered, zorder_key2

BITS = 6  # 64x64 grid
N_FILES = 8


def _morton_ref(a: int, b: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((a >> i) & 1) << (2 * i)
        out |= ((b >> i) & 1) << (2 * i + 1)
    return out


def _grid_df(spark):
    # a uniform 64x64 grid: every (x, y) cell once
    return spark.range(64 * 64).select(
        (F.col("id") % 64).cast("int").alias("x"),
        (F.col("id") / 64).cast("int").alias("y"),
        F.col("id").alias("payload"),
    )


def test_zorder_key_matches_reference(spark):
    rows = (
        _grid_df(spark)
        .withColumn("zkey", zorder_key2("x", "y", BITS))
        .limit(500)
        .collect()
    )
    for r in rows:
        assert r.zkey == _morton_ref(r.x, r.y, BITS), (r.x, r.y)


def _files_a_filter_must_read(path: str, col: str, lo: int, hi: int) -> int:
    """Count output files whose footer [min, max] for col intersects
    [lo, hi] — files a statistics-pruning reader would actually open."""
    touched = 0
    for f in glob.glob(f"{path}/part-*.parquet"):
        meta = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(meta.num_row_groups):
            for ci in range(meta.num_columns):
                c = meta.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        if fmin is None or (fmax >= lo and fmin <= hi):
            touched += 1
    return touched


def test_zorder_skips_on_second_dimension(spark, tmp_path):
    grid = _grid_df(spark)
    z_path = str(tmp_path / "zordered")
    lin_path = str(tmp_path / "x_sorted")
    write_zordered(grid, z_path, "x", "y", bits=BITS, n_files=N_FILES)
    # baseline: classic single-column sort on x
    (
        grid.repartitionByRange(N_FILES, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(lin_path)
    )
    # filter on y (the SECOND dimension) — a 1/8th band of the grid
    z_touched = _files_a_filter_must_read(z_path, "y", 0, 7)
    lin_touched = _files_a_filter_must_read(lin_path, "y", 0, 7)
    # x-sorted layout: y is uniform inside every file -> nothing skips
    assert lin_touched == N_FILES
    # z-ordered layout: the y-band lives in a subset of Morton rectangles
    assert z_touched < N_FILES, f"z-order skipped nothing ({z_touched} files)"
    # and the data itself is intact
    assert spark.read.parquet(z_path).count() == 64 * 64