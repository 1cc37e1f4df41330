"""Connected-components dedup clustering: graph invariants on the fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from zonal_datacube_spark.operators.dedup import (
    NEAR_DUP_TAU,
    q_dedup_clusters,
    q_dedup_minhash,
)


def test_clusters_are_transitive_and_min_labeled(spark):
    # same pair source the operator clusters over (the LSH tier)
    pairs = [
        (r.a_id, r.b_id)
        for r in q_dedup_minhash(spark, SF_SMOKE)
        .filter(F.col("jaccard") >= NEAR_DUP_TAU)
        .collect()
    ]
    labels = {r.doc_id: r.cluster_id for r in q_dedup_clusters(spark, SF_SMOKE).collect()}
    assert pairs and set(labels) == {d for p in pairs for d in p}
    # every emitted pair must collapse into one cluster (transitivity)
    for a, b in pairs:
        assert labels[a] == labels[b], (a, b)
    # the cluster id is the component's min doc id, and a member
    from collections import defaultdict

    members = defaultdict(set)
    for d, c in labels.items():
        members[c].add(d)
    for c, docs in members.items():
        assert c == min(docs)
        assert len(docs) >= 2  # singletons never enter the pair graph
