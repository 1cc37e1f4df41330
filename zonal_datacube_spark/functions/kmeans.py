"""Distributed k-means (Lloyd) over embedding arrays — fits the IVF coarse
quantizer when no label/cluster column exists (ROADMAP item; pairs with
functions/ivf_ann.py).

Spark-shaped iteration: the *assignment* step is a broadcast cross join
against k centroids (k tiny), the *update* step is posexplode → per-dim
mean — both fully distributed. Only the k×dim centroid matrix ever touches
the driver (to be re-broadcast), which is the textbook structure for
iterative ML on Spark: per-iteration driver traffic is O(k·dim), not
O(rows).

Deterministic: seeds are the first k vectors by vec_id; ties in assignment
break on the lower cell id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from zonal_datacube_spark.operators.similarity import _dot


def _normalize(vec: list[float]) -> list[float]:
    # spherical k-means: the mean of unit vectors is not unit-norm; the
    # centroid must be re-normalized or cosine similarities collapse
    norm = sum(v * v for v in vec) ** 0.5
    return [v / norm for v in vec] if norm > 0 else vec


def _centroids_to_rows(spark, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    return spark.createDataFrame(
        [(c, _normalize([float(v) for v in vec])) for c, vec in centroids],
        "cell INT, centroid ARRAY<DOUBLE>",
    )


def assign_cells(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid assignment (max dot product — vectors are
    unit-norm). Returns emb columns + cell."""
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cell").asc())
    return (
        emb.crossJoin(F.broadcast(centroids))
        .withColumn("sim", _dot("embedding", "centroid"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("sim", "rn", "centroid")
    )


def kmeans_fit(emb: DataFrame, k: int = 8, iters: int = 3) -> DataFrame:
    """Fit k centroids; returns DataFrame(cell INT, centroid ARRAY<DOUBLE>)."""
    spark = emb.sparkSession
    current = [
        (i, [float(v) for v in r.embedding])
        for i, r in enumerate(emb.orderBy("vec_id").limit(k).collect())
    ]
    centroids = _centroids_to_rows(spark, current)
    for _ in range(iters):
        assigned = assign_cells(emb, centroids)
        per_dim = (
            assigned.select("cell", F.posexplode("embedding").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
        )
        new_rows = (
            per_dim.groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("centroid")
            )
            .collect()
        )
        # a cell that attracted zero points vanishes from the aggregate —
        # keep its previous centroid so callers always get k cells back
        # (deterministic; the cell can re-acquire points next iteration)
        updated = {r.cell: list(r.centroid) for r in new_rows}
        current = [(c, updated.get(c, vec)) for c, vec in current]
        centroids = _centroids_to_rows(spark, current)
    return centroids


def inertia(emb: DataFrame, centroids: DataFrame) -> float:
    """Mean best-similarity (higher = tighter clustering, cosine world)."""
    w = Window.partitionBy("vec_id").orderBy(F.col("sim").desc(), F.col("cell").asc())
    best = (
        emb.crossJoin(F.broadcast(centroids))
        .withColumn("sim", _dot("embedding", "centroid"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return best.agg(F.avg("sim")).collect()[0][0]
