"""Skew-mitigation utilities: two-phase (salted) aggregation and a salted
broadcast join helper.

AQE's skew-join splitting handles sort-merge join skew automatically
(session.py turns it on), but a skewed GROUP BY key still funnels one
reducer.  ``salted_agg`` is the standard fix: pre-aggregate on
(key, salt) — spreading a hot key over ``n_salts`` reducers — then finish on
key.  Results are identical to the unsalted aggregate for any algebraic
aggregate (sum/count/min/max); the cost is one extra (tiny) shuffle of
partial rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def with_salt(df: DataFrame, n_salts: int = 16, col_name: str = "_salt") -> DataFrame:
    """Deterministic salt derived from a hash of the whole row's partition —
    uses spark_partition_id + a per-row monotonic component so hot keys
    spread without requiring a random() (reproducible plans)."""
    return df.withColumn(
        col_name, (F.monotonically_increasing_id() % n_salts).cast("int")
    )


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation: ``aggs`` maps output name → (partial_agg_expr,
    final_agg_expr-over-column).  E.g.::

        salted_agg(df, ["k"], {
            "n":   (F.count(F.lit(1)),  F.sum),
            "tot": (F.sum("x"),         F.sum),
            "mx":  (F.max("x"),         F.max),
        })

    Phase 1 groups by (key, salt) — the hot key's rows split across
    ``n_salts`` reducers; phase 2 groups the tiny partial table by key.
    """
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(*key_cols, "_salt").agg(
        *[expr.alias(f"_p_{name}") for name, (expr, _) in aggs.items()]
    )
    return partial.groupBy(*key_cols).agg(
        *[final(F.col(f"_p_{name}")).alias(name) for name, (_, final) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the big side gets a deterministic salt,
    the small side is replicated ``n_salts``x, and the join key becomes
    (key, salt) — a hot key's rows land on ``n_salts`` reducers instead of
    one.  The result set is IDENTICAL to the plain join (every big row
    still meets every matching small row exactly once, in the one salt
    partition it picked).

    This is the manual fix for the case AQE skew-splitting can't touch:
    the 'small' side is too large to broadcast but small enough that an
    n_salts-fold replication is cheap relative to one straggler reducer.
    The salt comes from monotonically_increasing_id — deterministic within
    a plan, no random() (keeps the plan reproducible and re-runnable).
    Only inner/left joins are safe (a right/full join would see the small
    side's unmatched rows n_salts times)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left only")
    b = with_salt(big, n_salts)
    s = small.crossJoin(
        F.broadcast(
            small.sparkSession.range(n_salts).select(F.col("id").cast("int").alias("_salt"))
        )
    )
    out = b.join(s, [key, "_salt"], how)
    return out.drop("_salt")
