"""Temporal join operators Spark lacks as built-ins: as-of join (point-in-
time correctness) and interval/range join.

As-of join — the union+window technique, NOT a pandas merge_asof:
tag both sides, union them, and take per-key ``last(right_value ignorenulls)``
over (time, side) ordering.  Cost: ONE shuffle on the key — the same price as
any equi-join — with no row explosion and no Python.  A merge_asof via
applyInPandas would force the same shuffle AND serialize every row through
Arrow; the union+window form stays entirely in Tungsten.

Interval join — banding: intervals are exploded to the fixed-width buckets
they overlap, points map to their bucket, and the join is an equi-join on
(key, bucket) with a residual range predicate.  This bounds the pair work to
per-bucket occupancy (the standard trick to keep range joins off the
quadratic nested-loop path at scale).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: list[str],
    tolerance_before: str | None = None,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.on <= left.on`` within the same ``by`` group (ties: the right row
    at an equal timestamp matches).

    ``right`` must be unique per (by, on) — pre-aggregate if not.
    Returns all left columns plus ``value_cols`` from the matched right row
    (NULL when no right row precedes the left row).
    """
    lcols = left.columns
    l_tagged = left.select(
        *lcols, F.lit(1).alias("_side"), *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols]
    )
    r_tagged = right.select(
        F.col(by),
        F.col(on),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in (by, on)],
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    ).select(*lcols, "_side", *[f"_r_{c}" for c in value_cols])
    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(by)
        .orderBy(F.col(on).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        "_side",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(c + "_asof")
            for c in value_cols
        ],
        F.last(F.when(F.col("_side") == 0, F.col(on)), ignorenulls=True).over(w).alias("_asof_ts"),
    )
    out = carried.filter(F.col("_side") == 1).drop("_side")
    if tolerance_before is not None:
        within = F.col(on) - F.expr(f"INTERVAL {tolerance_before}") <= F.col("_asof_ts")
        out = out.select(
            *lcols,
            *[
                F.when(within, F.col(c + "_asof")).alias(c + "_asof")
                for c in value_cols
            ],
        )
    else:
        out = out.drop("_asof_ts")
    return out


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Join each point to the intervals containing it ([start, end], same
    key), via bucket banding + residual predicate.  ``bucket_width`` is in
    the column's native units; choose it near the median interval length so
    each interval explodes to O(1) buckets."""
    ivl = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                (F.col(start_col) / bucket_width).cast("long"),
                (F.col(end_col) / bucket_width).cast("long"),
            )
        ),
    )
    pts = points.withColumn("_bucket", (F.col(point_col) / bucket_width).cast("long"))
    joined = pts.join(ivl, [key, "_bucket"]).filter(
        (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) <= F.col(end_col))
    )
    return joined.drop("_bucket")


def multigrain_rollup(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    grains: tuple[str, ...] = ("minute", "hour", "day"),
) -> DataFrame:
    """Hypertable-style continuous aggregate: event counts and value sums at
    several time granularities in one pass (TimescaleDB's multi-level
    continuous aggregates; the reference has no time-series surface at all).

    Scale shape: the input shuffles ONCE, at the finest grain; every coarser
    grain re-aggregates the previous level's already-tiny output (minute
    rows -> hour rows -> day rows).  That cascade is exact because the
    partial states (COUNT, DECIMAL SUM) are associative — unlike a GROUPING
    SETS plan, which expands every input row once per grain before the
    shuffle (grains x the scan volume at 100 TB).

    Output: (grain, bucket_start, n_events, total_value), the union of all
    levels.  ``grains`` must be ordered finest-first and each must be a
    valid date_trunc unit.
    """
    finest, *coarser = grains
    level = (
        df.select(
            F.date_trunc(finest, F.col(ts_col)).alias("bucket_start"),
            F.col(value_col).cast("decimal(12,2)").alias("_v"),
        )
        .groupBy("bucket_start")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("_v").alias("_sum"))
    )
    levels = [level.select(F.lit(finest).alias("grain"), "bucket_start", "n_events", "_sum")]
    for g in coarser:
        level = (
            level.select(
                F.date_trunc(g, F.col("bucket_start")).alias("bucket_start"),
                "n_events",
                "_sum",
            )
            .groupBy("bucket_start")
            .agg(F.sum("n_events").alias("n_events"), F.sum("_sum").alias("_sum"))
        )
        levels.append(level.select(F.lit(g).alias("grain"), "bucket_start", "n_events", "_sum"))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.select(
        "grain",
        "bucket_start",
        "n_events",
        F.col("_sum").cast("double").alias("total_value"),
    )


def rate_anomaly(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    trailing: int = 24,
    k: int = 3,
) -> DataFrame:
    """Per-stream rate-spike detection: for every (event_type, hour), flag
    hours whose count deviates from the trailing ``trailing``-hour window
    by more than ``k`` standard deviations — the ingest-monitoring pass a
    training-data pipeline runs over its event firehose (a feed going
    silent or 10x-ing is the thing you want to catch before it poisons a
    snapshot).

    Exactness (house pattern): the z-test is algebraically cleared of
    division and sqrt —

        z^2 >= k^2   <=>   (W*c - S)^2 >= k^2 * (W*Q - S^2)

    with W the window size, S/Q the trailing sum and sum-of-squares; both
    sides are exact BIGINT products, so the flag is bit-identical across
    engines.  ``z2_ppm`` = 1e6*(W*c-S)^2 // (W*Q-S^2) is emitted for
    ranking (NULL when the trailing window has zero variance; the flag
    then degrades to ANY deviation).  Long-overflow bound: hourly counts
    to ~6e4 per type; beyond that the same ratio computes in
    decimal(38,0) — the scale-up switch, as in pmi_cooccurrence.

    Scale: ONE data-sized shuffle (the (type, hour) partial-agg groupBy —
    the count collapses map-side); the dense hour spine is types x hours
    (tiny, broadcast), and the trailing window partitions by type over
    already-hourly rows.  Missing hours COUNT AS ZERO via the spine —
    a silent feed is an anomaly, which windowing only observed hours
    would never see.

    Extension operator per SURVEY §2.D (reference has no analytics
    surface, /root/reference/trough/read.py:66).
    """
    h = F.date_trunc("hour", F.col(ts_col))
    hourly = events.groupBy(
        F.col(type_col).alias("event_type"), h.alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    bounds = events.agg(
        F.date_trunc("hour", F.min(ts_col)).alias("h0"),
        F.date_trunc("hour", F.max(ts_col)).alias("h1"),
    )
    spine = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    types = events.select(F.col(type_col).alias("event_type")).distinct()
    dense = (
        types.crossJoin(F.broadcast(spine))
        .join(hourly, ["event_type", "h"], "left")
        .select(
            "event_type", "h", F.coalesce("n", F.lit(0)).cast("bigint").alias("c")
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-trailing, -1)
    )
    W = F.lit(trailing).cast("bigint")
    stats = dense.select(
        "event_type",
        "h",
        "c",
        F.sum("c").over(w).alias("s_w"),
        F.sum(F.col("c") * F.col("c")).over(w).alias("q_w"),
        F.count("c").over(w).alias("n_w"),
    ).where(F.col("n_w") == trailing)
    num = (W * F.col("c") - F.col("s_w")) * (W * F.col("c") - F.col("s_w"))
    den = W * F.col("q_w") - F.col("s_w") * F.col("s_w")
    return stats.select(
        "event_type",
        F.col("h").alias("hour_start"),
        F.col("c").alias("n_events"),
        F.col("s_w").cast("bigint").alias("s_w"),
        F.col("q_w").cast("bigint").alias("q_w"),
        F.when(den > 0, F.expr(
            f"CAST((1000000 * ({trailing} * c - s_w) * ({trailing} * c - s_w)) "
            f"DIV ({trailing} * q_w - s_w * s_w) AS BIGINT)"
        )).alias("z2_ppm"),
        F.when(den > 0, num >= F.lit(k * k) * den)
        .otherwise(W * F.col("c") != F.col("s_w"))
        .alias("is_anomaly"),
    )
