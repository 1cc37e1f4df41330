"""Skew mitigation: salted two-phase aggregation (SURVEY.md §1.3, §4).

A zonal workload is structurally skewed: one giant zone (ocean, desert)
can hold most pixels, making its reduce task the straggler. AQE's skew-join
splitting handles joins; for *aggregations* the standard fix is salting:

  phase 1: partial aggregate on (key, salt) — the hot key's rows spread
           over ``n_salts`` reducers;
  phase 2: final aggregate on key — merges ``n_salts`` partial states.

Only associative statistics pass through this helper (sum/count/min/max —
mean is derived sum/count at the end). Results are identical to the direct
aggregation (tested), only the shuffle distribution changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    n_salts: int = 8,
) -> DataFrame:
    """Skew-mitigated inner equi-join: the big (probe) side gets a random
    salt, the small (build) side is replicated once per salt value, and the
    join runs on (keys + salt) — a hot key's probe rows now spread over
    ``n_salts`` tasks instead of one straggler. Row-identical to the plain
    join (tested); use when AQE's skew splitting isn't available (e.g. the
    build side is already bucketed) or the skew is in an aggregation-free
    pipeline. Cost: build side ships n_salts×."""
    salt_values = F.array(*[F.lit(i) for i in range(n_salts)])
    big_salted = big.withColumn("_salt", (F.rand(seed=11) * n_salts).cast("int"))
    small_rep = small.withColumn("_salt", F.explode(salt_values))
    return big_salted.join(small_rep, [*keys, "_salt"], "inner").drop("_salt")


# whole-partition window aggregates expressible as two-level salted merges
_WINDOW_AGGS = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_partition_window(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe replacement for a FULL-PARTITION window aggregate
    (``F.sum(x).over(Window.partitionBy(k))`` and friends): every row of a
    hot key otherwise lands on ONE window task — the same straggler shape
    the salted groupBy fixes for aggregations, but WindowExec has no
    partial-aggregation escape hatch of its own.

    Two-level rewrite: (1) partial aggregate on (key, salt) spreads the
    hot key over ``n_salts`` reducers; (2) final merge on key yields one
    small row per key; (3) broadcast-join the per-key row back onto the
    input. Row-identical to the direct window for associative stats
    (sum/count/min/max — avg derives as sum/count; differential-tested on
    a skewed fixture), but no task ever materializes a full key partition.

    ``aggs``: {out_col: (op, in_col)} with op in sum|count|min|max.
    The salt is a deterministic hash of the row's partition id + offset,
    so re-runs produce identical partials (no rand() in the plan)."""
    for out, (op, _) in aggs.items():
        if op not in _WINDOW_AGGS:
            raise ValueError(
                f"{out}: op {op!r} not associative-mergeable "
                f"(supported: {sorted(_WINDOW_AGGS)})"
            )
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(
            *[
                _WINDOW_AGGS[op][0](in_col).alias(f"_p_{out}")
                for out, (op, in_col) in aggs.items()
            ]
        )
    )
    finals = partial.groupBy(*key_cols).agg(
        *[
            _WINDOW_AGGS[op][1](f"_p_{out}").alias(out)
            for out, (op, _) in aggs.items()
        ]
    )
    # null-safe equality: a window treats NULL keys as one partition, so
    # the join-back must too. finals is one row per distinct key — the
    # skewed-enum case this targets — hence broadcast; swap for a shuffle
    # join if the key domain is itself huge.
    right = finals.select(
        *[F.col(c).alias(f"_k_{c}") for c in key_cols],
        *aggs.keys(),
    )
    cond = None
    for c in key_cols:
        eq = F.col(c).eqNullSafe(F.col(f"_k_{c}"))
        cond = eq if cond is None else cond & eq
    return df.join(F.broadcast(right), cond, "left").drop(
        *[f"_k_{c}" for c in key_cols]
    )


def salted_zonal_stats(
    cells: DataFrame,
    key_col: str = "zone_id",
    value_col: str = "value",
    n_salts: int = 16,
) -> DataFrame:
    """Per-key count/sum/mean/min/max with the hot-key shuffle spread over
    ``n_salts`` partial reducers."""
    salted = cells.withColumn("salt", (F.rand(seed=7) * n_salts).cast("int"))
    partial = salted.groupBy(key_col, "salt").agg(
        F.count(value_col).alias("n"),
        F.sum(value_col).alias("s"),
        F.min(value_col).alias("mn"),
        F.max(value_col).alias("mx"),
    )
    return partial.groupBy(key_col).agg(
        F.sum("n").alias("n_cells"),
        F.round(F.sum("s"), 2).alias("sum_value"),
        F.round(F.sum("s") / F.sum("n"), 6).alias("mean_value"),
        F.round(F.min("mn"), 2).alias("min_value"),
        F.round(F.max("mx"), 2).alias("max_value"),
    )
