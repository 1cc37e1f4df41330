"""IVF ANN: structure + recall against the exact brute-force kNN."""

from __future__ import annotations

from tests.conftest import SF_SMOKE
from zonal_datacube_spark.functions.ivf_ann import build_centroids, ivf_ann
from zonal_datacube_spark.operators.similarity import PROBE_IDS, q_sim_knn
from zonal_datacube_spark.sources.loader import load_table


def test_centroids_shape(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    cents = build_centroids(emb).collect()
    assert len(cents) == 10
    assert all(len(r.centroid) == 64 for r in cents)


def test_ivf_ann_recall(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    approx = ivf_ann(emb, list(PROBE_IDS), k=5, n_probe=3)
    got = {(r.probe_id, r.neighbor_id) for r in approx.collect()}
    exact = {(r.probe_id, r.neighbor_id) for r in q_sim_knn(spark, SF_SMOKE).collect()}
    assert len(got) == len(exact) == 25
    recall = len(got & exact) / len(exact)
    # the fixture's labels carry almost no cluster signal (same-label mean
    # cosine ≈ 0.002), so searching 3/10 cells ≈ sampling 30% of the corpus
    # → expected recall ≈ 0.3·(true-neighbor hit rate). Assert the
    # mechanism beats degenerate behavior, not clustering magic.
    assert recall >= 0.1, f"recall {recall}"


def test_ivf_kmeans_quantizer_recall(spark):
    """The label-free path: kmeans_fit as the coarse quantizer. Unlike the
    signal-free labels, k-means Voronoi cells align with cosine
    neighborhoods, so probing 2/8 cells already recovers >80% of the exact
    top-5 (measured 0.92 on the fixture)."""
    from zonal_datacube_spark.functions.ivf_ann import ivf_ann_quantized
    from zonal_datacube_spark.functions.kmeans import kmeans_fit

    emb = load_table(spark, SF_SMOKE, "embeddings")
    quantizer = kmeans_fit(emb, k=8, iters=3)
    approx = ivf_ann_quantized(emb, list(PROBE_IDS), quantizer, k=5, n_probe=2)
    got = {(r.probe_id, r.neighbor_id) for r in approx.collect()}
    exact = {(r.probe_id, r.neighbor_id) for r in q_sim_knn(spark, SF_SMOKE).collect()}
    assert len(exact) == 25
    recall = len(got & exact) / len(exact)
    assert recall >= 0.8, f"recall {recall}"


def test_kmeans_always_returns_k_cells(spark):
    """Empty cells keep their previous centroid instead of silently
    vanishing (duplicate/collinear seeds make shrinkage likely)."""
    from zonal_datacube_spark.functions.kmeans import kmeans_fit

    emb = load_table(spark, SF_SMOKE, "embeddings")
    for iters in (0, 1, 3):
        assert kmeans_fit(emb, k=8, iters=iters).count() == 8


def test_ivf_deterministic(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    a = sorted(map(tuple, ivf_ann(emb, [0, 1], k=3).collect()))
    b = sorted(map(tuple, ivf_ann(emb, [0, 1], k=3).collect()))
    assert a == b
