"""GROUPS window frames and EXCLUDE clauses (SURVEY §2.B8 gap).

SQLite >= 3.25 accepts ``GROUPS BETWEEN n PRECEDING AND m FOLLOWING`` and
``EXCLUDE {CURRENT ROW | GROUP | TIES}`` in any pass-through query, but
Spark's Window API has neither.  This module closes the gap by composition
instead of a Python UDF:

  g = dense_rank() OVER (PARTITION BY p ORDER BY o)      -- peer-group index
  agg  OVER (PARTITION BY p ORDER BY g
             RANGE BETWEEN n PRECEDING AND m FOLLOWING)  -- GROUPS == RANGE on g

EXCLUDE variants are pure arithmetic on top: subtract the current row's
value (CURRENT ROW), the whole peer group's aggregate (GROUP), or the
peers-minus-self (TIES) from the frame aggregate.  Every window here shares
the same partitioning key, so the whole operator is ONE shuffle; the extra
passes re-sort data that is already hash-partitioned and sorted.

Scale: identical cost profile to any windowed aggregate — state is one
partition's rows; no driver collection, no Python row path.  Works for
SUM / COUNT / AVG (subtractable aggregates).  MIN/MAX cannot be expressed
via subtraction and stay unsupported under EXCLUDE (raise).

Reference parity: the reference passes window SQL through to SQLite
unchanged (trough/read.py:33-52 executes arbitrary SELECTs); SQLite's own
window implementation (sqlite3 window.c) defines the GROUPS/EXCLUDE
semantics reproduced here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

NO_OTHERS = "no others"
CURRENT_ROW = "current row"
GROUP = "group"
TIES = "ties"

_EXCLUDES = (NO_OTHERS, CURRENT_ROW, GROUP, TIES)


def _cols(spec) -> list:
    if isinstance(spec, (str, Column)):
        return [spec]
    return list(spec)


def groups_frame(
    df: DataFrame,
    partition_by,
    order_by,
    value,
    preceding: int | None,
    following: int | None,
    exclude: str = NO_OTHERS,
    out_sum: str = "groups_sum",
    out_count: str = "groups_count",
) -> DataFrame:
    """Append ``out_sum`` / ``out_count`` columns aggregating ``value`` over a
    ``GROUPS BETWEEN preceding PRECEDING AND following FOLLOWING`` frame with
    the given EXCLUDE clause.

    ``preceding`` / ``following`` are non-negative group counts; ``None``
    means UNBOUNDED on that side.  ``value`` is a column name or Column; its
    NULLs are ignored by both outputs (COUNT counts non-null values, like
    ``COUNT(value)``).  The empty-frame SUM is NULL, matching SQL.
    """
    if exclude not in _EXCLUDES:
        raise ValueError(f"exclude must be one of {_EXCLUDES}, got {exclude!r}")
    pb = _cols(partition_by)
    ob = _cols(order_by)
    v = F.col(value) if isinstance(value, str) else value

    df = df.withColumn("_gf_v", v)
    base = W.partitionBy(*pb).orderBy(*ob)
    df = df.withColumn("_grp", F.dense_rank().over(base))

    lo = W.unboundedPreceding if preceding is None else -int(preceding)
    hi = W.unboundedFollowing if following is None else int(following)
    frame = W.partitionBy(*pb).orderBy("_grp").rangeBetween(lo, hi)
    fsum = F.sum("_gf_v").over(frame)
    fcnt = F.count("_gf_v").over(frame)

    if exclude == NO_OTHERS:
        esum, ecnt = fsum, fcnt
    else:
        self_sum = F.coalesce(F.col("_gf_v"), F.lit(0))
        self_cnt = F.when(F.col("_gf_v").isNotNull(), 1).otherwise(0)
        if exclude == CURRENT_ROW:
            esum, ecnt = fsum - self_sum, fcnt - self_cnt
        else:
            peer = W.partitionBy(*pb, "_grp")
            gsum = F.coalesce(F.sum("_gf_v").over(peer), F.lit(0))
            gcnt = F.count("_gf_v").over(peer)
            if exclude == GROUP:
                esum, ecnt = fsum - gsum, fcnt - gcnt
            else:  # TIES: drop peers but keep the current row
                esum, ecnt = fsum - gsum + self_sum, fcnt - gcnt + self_cnt

    # empty-after-exclusion frames sum to NULL, not 0 (SQL semantics)
    esum = F.when(ecnt > 0, esum)
    return (
        df.withColumn(out_sum, esum)
        .withColumn(out_count, ecnt)
        .drop("_grp", "_gf_v")
    )
