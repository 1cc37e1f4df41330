"""UDTF surface + native session_window cross-validation."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from zonal_datacube_spark.functions.udtf_demo import TokenizeUDTF, register
from zonal_datacube_spark.operators.streaming_batch import q_stream_session
from zonal_datacube_spark.sources.loader import load_table


def test_udtf_tokenize(spark):
    register(spark)
    out = spark.sql(
        "SELECT * FROM zds_tokenize(1, 'the fast scan a table')"
    ).collect()
    assert [(r.pos, r.token, r.is_stop) for r in out] == [
        (0, "the", True),
        (1, "fast", False),
        (2, "scan", False),
        (3, "a", True),
        (4, "table", False),
    ]


def test_udtf_lateral_join(spark):
    register(spark)
    load_table(spark, SF_SMOKE, "documents").limit(5).createOrReplaceTempView("zds_docs5")
    rows = spark.sql(
        """
        SELECT d.doc_id, t.pos, t.token
        FROM zds_docs5 d, LATERAL zds_tokenize(d.doc_id, d.text) t
        """
    ).collect()
    assert len(rows) > 5
    # positions dense from 0 per doc
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.pos)
    assert all(sorted(v) == list(range(len(v))) for v in by_doc.values())


def test_native_session_window_matches_lag_based(spark):
    """Spark's built-in session_window (batch mode) must produce the same
    sessions as the engine's lag+cumsum formulation — two independent
    implementations of the 30-minute-gap semantics."""
    ev = load_table(spark, SF_SMOKE, "events")
    native = (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", "n_events")
    )
    ours = q_stream_session(spark, SF_SMOKE).select("user_id", "n_events")
    assert sorted(map(tuple, native.collect())) == sorted(map(tuple, ours.collect()))
