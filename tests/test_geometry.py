"""Polygon containment: the relational ray-casting pipeline agrees with an
independent Python reference over a dense probe grid, including the
concave polygon's notch."""

from __future__ import annotations

from pyspark.sql import functions as F

from zonal_datacube_spark.operators.geometry import (
    POLYGONS,
    edges_df,
    points_in_polygons,
)


def _pip_ref(px: float, py: float, ring: list[tuple[float, float]]) -> bool:
    inside = False
    n = len(ring)
    for i in range(n):
        x1, y1 = ring[i]
        x2, y2 = ring[(i + 1) % n]
        if (y1 > py) != (y2 > py) and px < x1 + (x2 - x1) * (py - y1) / (y2 - y1):
            inside = not inside
    return inside


def test_ray_casting_matches_python_reference(spark):
    # 21x21 probe grid over the whole space, off-lattice offsets
    probes = [
        (i * 21 + j, 0.25 + i * 10.0, 0.75 + j * 10.0)
        for i in range(21)
        for j in range(21)
    ]
    pts = spark.createDataFrame(probes, "pid INT, px DOUBLE, py DOUBLE")
    got = {
        (r.pid, r.zone_id)
        for r in points_in_polygons(pts, edges_df(spark)).collect()
    }
    want = {
        (pid, zid)
        for pid, px, py in probes
        for zid, ring in POLYGONS.items()
        if _pip_ref(px, py, ring)
    }
    assert got == want
    assert want, "probe grid should hit at least one polygon"


def test_concave_notch_is_outside(spark):
    # (40.25, 165.75) sits in the concave notch of P2: inside the bbox,
    # outside the polygon — bbox containment would get this wrong
    ring = POLYGONS[2]
    xs, ys = [p[0] for p in ring], [p[1] for p in ring]
    px, py = 40.25, 165.75
    assert min(xs) < px < max(xs) and min(ys) < py < max(ys)  # inside bbox
    assert not _pip_ref(px, py, ring)  # outside polygon (reference)
    pts = spark.createDataFrame([(0, px, py)], "pid INT, px DOUBLE, py DOUBLE")
    hits = points_in_polygons(pts, edges_df(spark)).filter(F.col("zone_id") == 2)
    assert hits.count() == 0  # engine agrees
