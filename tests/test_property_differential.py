"""Property-based differential testing (SURVEY.md §5.3 layer 3).

Hypothesis generates random filter+aggregate queries over lineitem; each is
executed by both Spark and DuckDB and must agree exactly. This catches
semantics drift beyond the fixed §2 suite (comparison ops, NULL handling,
predicate composition) on the same engine pair the driver uses.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.conftest import SF_ORACLE
from zonal_datacube_spark.sources.loader import load_table

NUM_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
STR_COLS = ("l_returnflag", "l_linestatus")
OPS = ("<", "<=", ">", ">=", "=", "<>")


@st.composite
def predicates(draw) -> str:
    clauses = []
    for _ in range(draw(st.integers(1, 3))):
        if draw(st.booleans()):
            col = draw(st.sampled_from(NUM_COLS))
            op = draw(st.sampled_from(OPS))
            val = draw(st.floats(0, 60, allow_nan=False, allow_infinity=False))
            clauses.append(f"{col} {op} {round(val, 2)}")
        else:
            col = draw(st.sampled_from(STR_COLS))
            val = draw(st.sampled_from(("A", "N", "R", "O", "F")))
            clauses.append(f"{col} {'=' if draw(st.booleans()) else '<>'} '{val}'")
    joiner = draw(st.sampled_from((" AND ", " OR ")))
    pred = joiner.join(clauses)
    return f"NOT ({pred})" if draw(st.booleans()) else pred


@given(pred=predicates(), group=st.sampled_from(STR_COLS))
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_filter_agg_agrees(pred, group, spark, duck):
    sql = f"""
        SELECT {group} AS g, count(*) AS n, round(sum(l_quantity), 2) AS s
        FROM lineitem
        WHERE {pred}
        GROUP BY {group}
    """
    load_table(spark, SF_ORACLE, "lineitem").createOrReplaceTempView("lineitem")
    got = {
        (r.g, r.n, r.s) for r in spark.sql(sql).collect()
    }
    want = {tuple(r) for r in duck.execute(sql).fetchall()}
    assert got == want, f"disagreement for predicate: {pred}"


@given(
    pred=predicates(),
    join_type=st.sampled_from(("JOIN", "LEFT JOIN", "SEMI JOIN", "ANTI JOIN")),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_join_agrees(pred, join_type, spark, duck):
    """Random predicate under each join flavor; Spark SQL supports the same
    SEMI/ANTI syntax as DuckDB."""
    sql = f"""
        SELECT o_orderkey, count(*) AS n
        FROM orders {join_type} (SELECT * FROM lineitem WHERE {pred}) li
          ON o_orderkey = li.l_orderkey
        GROUP BY o_orderkey
    """
    load_table(spark, SF_ORACLE, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, SF_ORACLE, "orders").createOrReplaceTempView("orders")
    got = {(r.o_orderkey, r.n) for r in spark.sql(sql).collect()}
    want = {tuple(r) for r in duck.execute(sql).fetchall()}
    assert got == want, f"disagreement for {join_type} with predicate: {pred}"


@st.composite
def string_exprs(draw) -> str:
    """Random scalar string expression valid (and identical) in both SQL
    dialects over part.p_name."""
    base = "p_name"
    for _ in range(draw(st.integers(1, 3))):
        kind = draw(st.sampled_from(("upper", "lower", "trim", "reverse", "substr", "replace", "concat")))
        if kind == "substr":
            s = draw(st.integers(1, 6))
            ln = draw(st.integers(1, 8))
            base = f"substr({base}, {s}, {ln})"
        elif kind == "replace":
            frm = draw(st.sampled_from(("a", "e", "r", " ")))
            to = draw(st.sampled_from(("", "X", "zz")))
            base = f"replace({base}, '{frm}', '{to}')"
        elif kind == "concat":
            base = f"({base} || '{draw(st.sampled_from(('-', '_t', '')))}')"
        else:
            base = f"{kind}({base})"
    return base


@given(expr=string_exprs(), m=st.integers(2, 7))
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_string_exprs_agree(expr, m, spark, duck):
    sql = f"""
        SELECT p_partkey, {expr} AS e, length({expr}) AS n
        FROM part WHERE p_partkey % {m} = 1
    """
    load_table(spark, SF_ORACLE, "part").createOrReplaceTempView("part")
    got = {(r.p_partkey, r.e, r.n) for r in spark.sql(sql).collect()}
    want = {tuple(r) for r in duck.execute(sql).fetchall()}
    assert got == want, f"disagreement for string expr: {expr}"


@st.composite
def date_exprs(draw) -> str:
    """Random date expression over l_shipdate, dialect-shared surface:
    date_trunc (cast to DATE — Spark returns TIMESTAMP), extract, and
    interval arithmetic."""
    kind = draw(st.sampled_from(("trunc", "extract", "shift")))
    if kind == "trunc":
        unit = draw(st.sampled_from(("month", "quarter", "year", "week")))
        return f"cast(date_trunc('{unit}', cast(l_shipdate AS DATE)) AS DATE)"
    if kind == "extract":
        unit = draw(st.sampled_from(("year", "month", "day", "quarter")))
        return f"cast(extract({unit} FROM l_shipdate) AS BIGINT)"
    # outer cast: DuckDB yields TIMESTAMP for DATE ± INTERVAL, Spark DATE
    n = draw(st.integers(-40, 40))
    shift = f"+ INTERVAL {n} DAY" if n >= 0 else f"- INTERVAL {-n} DAY"
    return f"cast(cast(l_shipdate AS DATE) {shift} AS DATE)"


@given(expr=date_exprs(), pred=predicates())
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_date_exprs_agree(expr, pred, spark, duck):
    sql = f"""
        SELECT l_orderkey, l_linenumber, {expr} AS e
        FROM lineitem WHERE {pred}
    """
    load_table(spark, SF_ORACLE, "lineitem").createOrReplaceTempView("lineitem")
    got = {(r.l_orderkey, r.l_linenumber, r.e) for r in spark.sql(sql).collect()}
    want = {tuple(r) for r in duck.execute(sql).fetchall()}
    assert got == want, f"disagreement for date expr: {expr}"


@given(
    p1=predicates(),
    p2=predicates(),
    setop=st.sampled_from(("UNION", "UNION ALL", "INTERSECT", "EXCEPT")),
)
@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_set_ops_agree(p1, p2, setop, spark, duck):
    """Random projections under each set operator; UNION ALL compares
    multisets (duplicates preserved), the rest distinct sets."""
    from collections import Counter

    sql = f"""
        SELECT l_returnflag AS a, l_linestatus AS b, round(l_quantity, 0) AS q
        FROM lineitem WHERE {p1}
        {setop}
        SELECT l_returnflag, l_linestatus, round(l_quantity, 0)
        FROM lineitem WHERE {p2}
    """
    load_table(spark, SF_ORACLE, "lineitem").createOrReplaceTempView("lineitem")
    got = Counter((r.a, r.b, r.q) for r in spark.sql(sql).collect())
    want = Counter(tuple(r) for r in duck.execute(sql).fetchall())
    assert got == want, f"disagreement for {setop} with {p1!r} / {p2!r}"


@given(pred=predicates(), a=st.integers(0, 3), b=st.integers(0, 3))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_window_frames_agree(pred, a, b, spark, duck):
    """Random ROWS BETWEEN frames under random predicates — frame-boundary
    semantics (preceding/following row counts) on both engines.

    The ORDER BY must be a TOTAL order for ROWS frames to be well-defined:
    the fixture has ~12k duplicate (l_orderkey, l_linenumber) pairs with
    differing quantities (found by this test, 2026-08-13), so l_linenumber
    alone leaves the frame contents engine-dependent. Adding l_quantity
    makes any remaining ties interchangeable for sum(l_quantity)/count(*),
    pinning the output without constraining either engine's sort."""
    sql = f"""
        SELECT l_orderkey, l_linenumber,
               round(sum(l_quantity) OVER (
                   PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity
                   ROWS BETWEEN {a} PRECEDING AND {b} FOLLOWING), 2) AS s,
               count(*) OVER (
                   PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity
                   ROWS BETWEEN {a} PRECEDING AND {b} FOLLOWING) AS n
        FROM lineitem WHERE {pred}
    """
    load_table(spark, SF_ORACLE, "lineitem").createOrReplaceTempView("lineitem")
    got = {(r.l_orderkey, r.l_linenumber, r.s, r.n) for r in spark.sql(sql).collect()}
    want = {tuple(r) for r in duck.execute(sql).fetchall()}
    assert got == want, f"disagreement for frame [{a} PRECEDING, {b} FOLLOWING]: {pred}"


@given(pred=predicates(), cut=st.floats(5, 50), pred2=predicates())
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_case_exprs_agree(pred, cut, pred2, spark, duck):
    """Random CASE ladders built from random predicates — conditional
    evaluation order and fall-through agree."""
    c = round(cut, 2)
    sql = f"""
        SELECT l_orderkey, l_linenumber,
               CASE WHEN {pred} THEN 'p1'
                    WHEN l_quantity > {c} THEN 'big'
                    WHEN {pred2} THEN 'p2'
                    ELSE 'rest' END AS bucket
        FROM lineitem
    """
    load_table(spark, SF_ORACLE, "lineitem").createOrReplaceTempView("lineitem")
    got = {(r.l_orderkey, r.l_linenumber, r.bucket) for r in spark.sql(sql).collect()}
    want = {tuple(r) for r in duck.execute(sql).fetchall()}
    assert got == want, f"disagreement for CASE with {pred!r} / {pred2!r}"


@given(pred=predicates(), shape=st.sampled_from(("ROLLUP", "CUBE")))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_grouping_sets_agree(pred, shape, spark, duck):
    """ROLLUP/CUBE under random predicates — super-aggregate NULL rows and
    their values agree. Empty filtered input is excluded: the engines
    genuinely diverge there (see test_rollup_empty_input_divergence)."""
    from hypothesis import assume

    n_in = duck.execute(f"SELECT count(*) FROM lineitem WHERE {pred}").fetchone()[0]
    assume(n_in > 0)
    sql = f"""
        SELECT l_returnflag, l_linestatus, count(*) AS n,
               round(sum(l_quantity), 2) AS s
        FROM lineitem WHERE {pred}
        GROUP BY {shape} (l_returnflag, l_linestatus)
    """
    load_table(spark, SF_ORACLE, "lineitem").createOrReplaceTempView("lineitem")
    got = {
        (r.l_returnflag, r.l_linestatus, r.n, r.s) for r in spark.sql(sql).collect()
    }
    want = {tuple(r) for r in duck.execute(sql).fetchall()}
    assert got == want, f"disagreement for {shape} with predicate: {pred}"


def test_rollup_empty_input_divergence(spark, duck):
    """Documented engine divergence (found by the property above): on EMPTY
    input, the SQL standard (and DuckDB) still emit the () grouping set's
    grand-total row — count 0, NULL aggregates — while Spark's
    Expand-based grouping sets yield zero rows. None of the declared §2
    keys can hit this (their inputs are non-empty by fixture construction),
    but pipeline authors composing ROLLUP over arbitrary filters should
    coalesce the empty case explicitly."""
    sql = """
        SELECT l_returnflag, count(*) AS n
        FROM lineitem WHERE l_returnflag = 'no-such-flag'
        GROUP BY ROLLUP (l_returnflag)
    """
    load_table(spark, SF_ORACLE, "lineitem").createOrReplaceTempView("lineitem")
    assert spark.sql(sql).count() == 0  # Spark: no groups, no rows
    assert duck.execute(sql).fetchall() == [(None, 0)]  # DuckDB: grand total


@given(pred=predicates(), k=st.integers(1, 4))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_window_topk_agrees(pred, k, spark, duck):
    """Random-filtered top-k per group via row_number — window semantics
    under arbitrary predicates."""
    sql = f"""
        SELECT l_orderkey, l_linenumber
        FROM (
            SELECT l_orderkey, l_linenumber,
                   row_number() OVER (PARTITION BY l_orderkey
                                      ORDER BY l_extendedprice DESC, l_linenumber ASC) AS rn
            FROM lineitem WHERE {pred}
        ) t
        WHERE rn <= {k}
    """
    load_table(spark, SF_ORACLE, "lineitem").createOrReplaceTempView("lineitem")
    got = {(r.l_orderkey, r.l_linenumber) for r in spark.sql(sql).collect()}
    want = {tuple(r) for r in duck.execute(sql).fetchall()}
    assert got == want, f"disagreement for window top-{k} with predicate: {pred}"


@given(cap=st.integers(32, 1024), m=st.integers(2, 5))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_pack_capacity_agrees(cap, m, spark, duck):
    """Sequence packing under random capacities — the window-cumsum
    chop arithmetic agrees with DuckDB for any capacity. Token counts
    derive from n_chars (shared-dialect integer arithmetic; the
    tokenizer itself is pinned by the fixed q_pack_sequences oracle)."""
    sql = f"""
        WITH placed AS (
            SELECT lang,
                   (n_chars % 97 + 3) AS n_tok,
                   sum(n_chars % 97 + 3)
                       OVER (PARTITION BY lang ORDER BY doc_id)
                       - (n_chars % 97 + 3) AS o
            FROM documents WHERE doc_id % {m} != 0
        )
        SELECT lang, cast(floor(o * 1.0 / {cap}) AS BIGINT) AS seq_id,
               count(*) AS n_docs, sum(n_tok) AS n_tokens
        FROM placed GROUP BY lang, seq_id
    """
    load_table(spark, SF_ORACLE, "documents").createOrReplaceTempView("documents")
    got = {(r.lang, r.seq_id, r.n_docs, r.n_tokens) for r in spark.sql(sql).collect()}
    want = {tuple(r) for r in duck.execute(sql).fetchall()}
    assert got == want, f"packing disagrees for cap={cap} m={m}"


@given(train_lt=st.integers(1, 254), val_w=st.integers(1, 64))
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_split_boundaries_agree(train_lt, val_w, spark, duck):
    """Content-hash split assignment under random bucket boundaries —
    the md5-bucket arithmetic and CASE laddering agree bit-for-bit
    (instr/substr/md5 are the shared dialect)."""
    val_lt = min(train_lt + val_w, 255)
    sql = f"""
        WITH b AS (
            SELECT lang,
                   (instr('0123456789abcdef', substr(md5(md5(text)), 1, 1)) - 1)
                       * 16
                   + instr('0123456789abcdef', substr(md5(md5(text)), 2, 1)) - 1
                       AS bucket
            FROM documents
        )
        SELECT CASE WHEN bucket < {train_lt} THEN 'train'
                    WHEN bucket < {val_lt} THEN 'val'
                    ELSE 'test' END AS split,
               lang, count(*) AS n_docs
        FROM b GROUP BY split, lang
    """
    load_table(spark, SF_ORACLE, "documents").createOrReplaceTempView("documents")
    got = {(r.split, r.lang, r.n_docs) for r in spark.sql(sql).collect()}
    want = {tuple(r) for r in duck.execute(sql).fetchall()}
    assert got == want, f"split disagrees for train<{train_lt} val<{val_lt}"
