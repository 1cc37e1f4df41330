"""Round-5c surface invariants (operators/sql_surface.py): plan-shape
proofs that the SQL-scripting surface stays JVM-side and pushes down, the
sink's manifest accounting, and numpy referees for the Neyman allocation
and migration census."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE
from zonal_datacube_spark.operators.sql_surface import (
    MIGRATION_TILES,
    NEYMAN_TOTAL,
    q_report_segment_migration,
    q_sample_neyman,
    q_sink_python_ds_write,
    q_sql_lateral_alias,
    q_sql_session_variable,
    q_sql_udf,
)
from zonal_datacube_spark.plans.diagnostics import formatted_plan
from zonal_datacube_spark.sources.loader import load_table


def test_session_variable_folds_into_pushdown(spark):
    df = q_sql_session_variable(spark, SF_SMOKE)
    plan = formatted_plan(df)
    # the variable-bound predicate reaches the parquet scan as a literal
    assert "PushedFilters" in plan
    assert "l_quantity" in plan and "l_returnflag" in plan
    rows = df.collect()
    assert {r.l_linestatus for r in rows} <= {"F", "O"}
    assert all(r.n_rows > 0 for r in rows)


def test_sql_udf_inlines_no_python(spark):
    df = q_sql_udf(spark, SF_SMOKE)
    plan = formatted_plan(df)
    for marker in ("BatchEvalPython", "ArrowEvalPython"):
        assert marker not in plan
    rows = {r.band: r for r in df.collect()}
    assert set(rows) == {"low", "mid", "high"}


def test_lateral_alias_chain_is_consistent(spark):
    for r in q_sql_lateral_alias(spark, SF_SMOKE).collect():
        assert abs(r.net - (r.gross - r.disc_amt)) < 1e-9
        assert 0.9 < r.net_share < 1.0  # discounts are single-digit %


def test_sink_write_manifest_accounts_every_row(spark):
    import glob
    import json

    df = q_sink_python_ds_write(spark, SF_SMOKE)
    rows = df.collect()
    # recover the sink dir from the read path baked into the plan
    files = df.inputFiles()
    assert files, "read-back should come from sink files"
    out = files[0].rsplit("/", 1)[0].replace("file:", "")
    manifest = json.load(open(f"{out}/_MANIFEST.json"))
    assert manifest["total_rows"] == len(rows)
    assert sum(n for _, n in manifest["files"]) == len(rows)
    on_disk = {f.rsplit("/", 1)[1] for f in glob.glob(f"{out}/part-*.jsonl")}
    assert {f for f, _ in manifest["files"]} <= on_disk
    # read-back equals direct computation
    direct = (
        load_table(spark, SF_SMOKE, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_rows"))
        .collect()
    )
    got = {(r.l_returnflag, r.l_linestatus): r.n_rows for r in rows}
    for d in direct:
        assert got[(d.l_returnflag, d.l_linestatus)] == d.n_rows


def test_segment_migration_census_conserves_customers(spark):
    rows = q_report_segment_migration(spark, SF_SMOKE).collect()
    assert rows
    by_from: dict[int, int] = {}
    for r in rows:
        assert 1 <= r.q_from <= MIGRATION_TILES
        assert 1 <= r.q_to <= MIGRATION_TILES
        by_from[r.q_from] = by_from.get(r.q_from, 0) + r.n_customers
        assert 0 < r.row_share <= 1.0
    # quartiles of the SAME joined population are near-balanced per origin
    sizes = list(by_from.values())
    assert max(sizes) - min(sizes) <= max(2, int(0.5 * max(sizes)))
    for q in by_from:
        share_sum = sum(r.row_share for r in rows if r.q_from == q)
        assert abs(share_sum - 1.0) < 1e-3


def test_neyman_allocation_matches_numpy(spark):
    rows = q_sample_neyman(spark, SF_SMOKE).collect()
    assert rows
    pdf = (
        load_table(spark, SF_SMOKE, "customer")
        .select("c_mktsegment", "c_acctbal")
        .toPandas()
    )
    weights = {}
    for seg, grp in pdf.groupby("c_mktsegment"):
        s = np.floor(grp["c_acctbal"].std(ddof=1) * 100 + 0.5) / 100
        weights[seg] = len(grp) * s
    wtot = sum(weights.values())
    total_alloc = 0
    for r in rows:
        expect = int(np.floor(NEYMAN_TOTAL * weights[r.c_mktsegment] / wtot + 0.5))
        assert r.n_alloc == min(r.n_stratum, expect)
        assert r.n_alloc <= r.n_stratum
        total_alloc += r.n_alloc
    # floor-half-up quotas sum to ~the target (off by at most one per stratum)
    assert abs(total_alloc - NEYMAN_TOTAL) <= len(rows)


def test_grouping_flags_distinguish_subtotals(spark):
    from zonal_datacube_spark.operators.sql_surface import q_agg_grouping_flags

    rows = q_agg_grouping_flags(spark, SF_SMOKE).collect()
    gids = [r.gid for r in rows]
    assert set(gids) == {0, 1, 3}  # detail, per-flag subtotal, grand total
    grand = [r for r in rows if r.gid == 3]
    assert len(grand) == 1 and grand[0].l_returnflag is None
    detail_n = sum(r.n_rows for r in rows if r.gid == 0)
    assert grand[0].n_rows == detail_n
    for r in rows:
        assert r.gid == 2 * r.g_flag + r.g_status


def test_range_interval_window_matches_direct_frame(spark):
    """The chunked-halo rewrite must reproduce the literal ANSI interval
    frame Spark itself evaluates (the oracle proves DuckDB equivalence;
    this pins Spark-vs-Spark)."""
    from zonal_datacube_spark.operators.sql_surface import (
        q_ts_range_interval_window,
    )

    got = {r.event_type: r for r in q_ts_range_interval_window(spark, SF_SMOKE).collect()}
    load_table(spark, SF_SMOKE, "events").createOrReplaceTempView("zds_ev_riw")
    direct = {
        r.event_type: r
        for r in spark.sql(
            """
            WITH w AS (
                SELECT event_type,
                       count(*) OVER win AS n1h,
                       round(sum(value) OVER win, 4) AS s1h
                FROM zds_ev_riw
                WINDOW win AS (PARTITION BY event_type ORDER BY ts
                               RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                               AND CURRENT ROW)
            )
            SELECT event_type, count(*) AS n_rows, max(n1h) AS max_hourly_n,
                   max(s1h) AS max_hourly_sum
            FROM w GROUP BY event_type
            """
        ).collect()
    }
    assert set(got) == set(direct)
    for ty, d in direct.items():
        g = got[ty]
        assert g.n_rows == d.n_rows
        assert g.max_hourly_n == d.max_hourly_n
        assert abs(g.max_hourly_sum - d.max_hourly_sum) < 1e-9


def test_matryoshka_recall_matches_numpy(spark):
    from zonal_datacube_spark.operators.similarity import (
        MRL_DIM,
        MRL_K,
        MRL_PROBE_MOD,
        q_embed_matryoshka_eval,
    )

    got = {
        r.p_label: r for r in q_embed_matryoshka_eval(spark, SF_SMOKE).collect()
    }
    pdf = load_table(spark, SF_SMOKE, "embeddings").toPandas()
    vecs = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    labels = pdf["label"].to_numpy()
    probe_mask = ids % MRL_PROBE_MOD == 0
    t = vecs[:, :MRL_DIM]
    tn = t / np.linalg.norm(t, axis=1, keepdims=True)
    recalls: dict[int, list] = {}
    for pi in np.flatnonzero(probe_mask):
        others = ids != ids[pi]
        full_s = np.round(vecs[others] @ vecs[pi], 6)
        trunc_s = np.round(tn[others] @ tn[pi], 6)
        oid = ids[others]
        # (score desc, id asc) exactly like both engines
        top_f = set(oid[np.lexsort((oid, -full_s))][:MRL_K])
        top_t = set(oid[np.lexsort((oid, -trunc_s))][:MRL_K])
        recalls.setdefault(labels[pi], []).append(
            len(top_f & top_t) / MRL_K
        )
    assert set(got) == set(recalls)
    for lb, rs in recalls.items():
        assert got[lb].n_probes == len(rs)
        assert abs(got[lb].avg_recall_at_5 - np.mean(rs)) < 1e-5
        assert 0.0 <= got[lb].avg_recall_at_5 <= 1.0


def test_stream_python_sink_manifest_per_batch(spark):
    """The streaming sink's per-batch manifest must account for every
    landed row, and the key must be re-runnable (fresh checkpoint+dir
    per invocation) with identical results."""
    from zonal_datacube_spark.operators.sources_ext import (
        TICK_STREAM_ROWS,
        TICK_STREAM_TICKS,
        q_stream_python_sink,
    )

    rows1 = {r.val_bucket: r for r in q_stream_python_sink(spark, SF_SMOKE).collect()}
    total = sum(r.n_rows for r in rows1.values())
    assert total == TICK_STREAM_TICKS * TICK_STREAM_ROWS
    rows2 = {r.val_bucket: r for r in q_stream_python_sink(spark, SF_SMOKE).collect()}
    assert set(rows1) == set(rows2)
    for b in rows1:
        assert rows1[b].n_rows == rows2[b].n_rows
        assert rows1[b].tick_sum == rows2[b].tick_sum


def test_try_arithmetic_nulls_where_plain_ansi_crashes(spark):
    import pytest as _pytest

    from zonal_datacube_spark.operators.sql_surface import (
        q_sql_try_arithmetic,
    )

    rows = q_sql_try_arithmetic(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_div_ok < r.n_rows  # k % 5 == 0 rows nulled out
        assert 0 < r.n_clean_casts < r.n_rows  # k % 3 == 0 rows nulled out
    # the same division WITHOUT try_ under ANSI mode fails the job —
    # proving the quarantine valve is load-bearing, not decorative
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    ev = load_table(spark, SF_SMOKE, "events").select(
        F.get_json_object("props", "$.k").cast("int").alias("k"), "value"
    )
    with _pytest.raises(Exception, match="DIVIDE_BY_ZERO|divide"):
        ev.select((F.col("value") / (F.col("k") % 5)).alias("x")).agg(
            F.sum("x")
        ).collect()


def test_metadata_cols_lineage_accounting(spark):
    from zonal_datacube_spark.operators.sql_surface import (
        q_scan_metadata_cols,
    )

    rows = q_scan_metadata_cols(spark, SF_SMOKE).collect()
    assert len(rows) == 5
    total = load_table(spark, SF_SMOKE, "events").count()
    assert sum(r.n_rows for r in rows) == total
    for r in rows:
        assert r.n_files == 1
        assert r.files_nonempty is True


def test_scripting_block_takes_data_branch(spark):
    from zonal_datacube_spark.operators.sql_surface import (
        q_sql_scripting_block,
    )

    rows = q_sql_scripting_block(spark, SF_SMOKE).collect()
    assert {r.l_returnflag for r in rows} == {"A", "N", "R"}
    assert all(r.l_returnflag != "unexpected" for r in rows)
    total = load_table(spark, SF_SMOKE, "lineitem").count()
    kept = sum(r.n_rows for r in rows)
    assert 0 < kept < total  # the threshold actually filtered


def test_pvm_effects_reconstruct_delta(spark):
    from zonal_datacube_spark.operators.sql_surface import (
        q_report_pvm_decomposition,
    )

    rows = q_report_pvm_decomposition(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        # Δrev = volume_effect + price_effect is an algebraic identity
        assert abs(r.delta_rev - (r.volume_effect + r.price_effect)) < 2e-4
        assert abs(r.delta_rev - (r.rev1 - r.rev0)) < 2e-4


def test_stream_sink_commit_is_idempotent_per_batch(tmp_path):
    """A batch replayed after a crash between sink-commit and the
    engine's offset-log write calls commit() twice with the same
    batchId — the manifest must record it once (and the reader dedupes
    as a belt)."""
    from zonal_datacube_spark.sources.jsonl_sink import (
        JsonlStreamWriter,
        _FileCommit,
        read_stream_manifest,
    )

    w = JsonlStreamWriter({"path": str(tmp_path)})
    w.commit([_FileCommit("stream-a.jsonl", 7)], batchId=0)
    w.commit([_FileCommit("stream-b.jsonl", 7)], batchId=0)  # replay
    w.commit([_FileCommit("stream-c.jsonl", 3)], batchId=1)
    recs = read_stream_manifest(str(tmp_path))
    assert [r["batch"] for r in recs] == [0, 1]
    assert recs[0]["files"] == [["stream-a.jsonl", 7]]  # first attempt wins
    assert sum(r["total_rows"] for r in recs) == 10


def test_stream_sink_manifest_tolerates_torn_trailing_line(tmp_path):
    """ADVICE r05: a crash mid-append (pre-atomic-write manifests) left a
    torn JSON line that made every later commit and read raise forever.
    Both the replay guard and the reader must skip unparseable lines,
    and new commits must go through write-then-rename (no torn state
    reachable going forward)."""
    import os

    from zonal_datacube_spark.sources.jsonl_sink import (
        STREAM_MANIFEST,
        JsonlStreamWriter,
        _FileCommit,
        read_stream_manifest,
    )

    manifest = os.path.join(str(tmp_path), STREAM_MANIFEST)
    with open(manifest, "w") as fh:
        fh.write('{"batch": 0, "files": [["stream-a.jsonl", 7]], "total_rows": 7}\n')
        fh.write('{"batch": 1, "files": [["stream-')  # torn mid-append
    w = JsonlStreamWriter({"path": str(tmp_path)})
    w.commit([_FileCommit("stream-b.jsonl", 3)], batchId=1)  # must not raise
    recs = read_stream_manifest(str(tmp_path))
    assert [r["batch"] for r in recs] == [0, 1]
    assert recs[1]["files"] == [["stream-b.jsonl", 3]]
    # the rewrite healed the file: no torn line remains on disk
    with open(manifest) as fh:
        lines = [l for l in fh.read().splitlines() if l.strip()]
    import json as _json

    assert all(_json.loads(l) for l in lines)
    assert not [f for f in os.listdir(tmp_path) if f.endswith(".tmp")]


def test_batch_sink_overwrite_removes_stale_part_files(tmp_path, spark):
    """ADVICE r05: mode('overwrite') replaced the manifest but left the
    previous run's part files on disk — a directory-scanning reader saw
    stale rows mixed with new ones. Overwrite commits must delete parts
    absent from the new manifest; append-mode commits must not."""
    import glob
    import os

    from zonal_datacube_spark.sources.jsonl_sink import (
        JSONL_SINK_NAME,
        read_manifest,
        register_jsonl_sink,
    )

    register_jsonl_sink(spark)
    out = str(tmp_path)
    df1 = spark.range(5).selectExpr("id", "id * 2 AS v")
    df1.write.format(JSONL_SINK_NAME).option("path", out).mode("append").save()
    first_parts = set(glob.glob(os.path.join(out, "part-*.jsonl")))
    assert first_parts
    df2 = spark.range(3).selectExpr("id", "id * 3 AS v")
    df2.write.format(JSONL_SINK_NAME).option("path", out).mode("overwrite").save()
    on_disk = set(glob.glob(os.path.join(out, "part-*.jsonl")))
    manifest = read_manifest(out)
    manifested = {os.path.join(out, name) for name, _ in manifest["files"]}
    assert on_disk == manifested  # stale first-run parts physically gone
    assert not (on_disk & first_parts)
    assert manifest["total_rows"] == 3
