"""Batch-mode correctness queries for the streaming pipelines
(streaming/events.py) — the same logical plans run on the static `events`
table, so DuckDB can oracle them.  True incremental execution (watermarks,
state, late data) is asserted in tests/test_streaming.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from trough_spark.queries import query
from trough_spark.streaming import events as E
from trough_spark.tables import load_table as T


@query(
    "stream_tumbling_hourly",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_hourly(spark, sf_dir):
    # window('1 hour') is epoch-aligned, identical to date_trunc('hour').
    return E.tumbling_counts(T(spark, sf_dir, "events"), window="1 hour")


@query(
    "stream_sliding_2h_1h",
    oracle="""
    WITH contrib AS (
      SELECT date_trunc('hour', ts) AS window_start FROM events
      UNION ALL
      SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR FROM events
    )
    SELECT window_start, COUNT(*) AS n FROM contrib GROUP BY 1
    """,
)
def stream_sliding_2h_1h(spark, sf_dir):
    # Each event belongs to exactly duration/slide = 2 windows; the oracle
    # materializes that membership explicitly.
    return E.sliding_counts(T(spark, sf_dir, "events"), window="2 hours", slide="1 hour")


@query(
    "stream_sessionization",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id, COUNT(*) AS n_events,
           MIN(ts) AS session_start, MAX(ts) AS session_end
    FROM sess GROUP BY 1, 2
    """,
)
def stream_sessionization(spark, sf_dir):
    # Batch sessionization: gap-detection via lag + running sum — one shuffle
    # on user_id serving both window specs.  The streaming path uses
    # session_window instead (state-bounded); both produce the same sessions
    # (asserted against each other in tests/test_streaming.py).
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    flagged = e.withColumn(
        "new_session", F.when(gap_us.isNull() | (gap_us > 1_800_000_000), 1).otherwise(0)
    )
    sess = flagged.withColumn(
        "session_id",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)),
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@query(
    "stream_funnel_conversion",
    oracle="""
    WITH s AS (
      SELECT user_id, MIN(ts) AS signup_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    conv AS (
      SELECT s.user_id,
             CAST(SUM(CASE WHEN e.event_type = 'purchase' AND e.ts >= s.signup_ts
                           THEN 1 ELSE 0 END) AS BIGINT) AS purchases_after
      FROM s LEFT JOIN events e ON e.user_id = s.user_id
      GROUP BY s.user_id
    )
    SELECT COUNT(*) AS n_signup_users,
           CAST(SUM(CASE WHEN purchases_after > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
           ROUND(SUM(CASE WHEN purchases_after > 0 THEN 1 ELSE 0 END) / COUNT(*), 6)
             AS conversion_rate
    FROM conv
    """,
)
def stream_funnel_conversion(spark, sf_dir):
    # Funnel: of users who signed up, how many purchased at-or-after their
    # first signup.  One shuffle on user_id serves both aggregates; the
    # signup-time dim is joined back without row explosion.
    e = T(spark, sf_dir, "events")
    s = e.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts").alias("signup_ts")
    )
    conv = (
        s.join(e, "user_id", "left")
        .groupBy(s.user_id)
        .agg(
            F.sum(
                F.when(
                    (F.col("event_type") == "purchase") & (F.col("ts") >= F.col("signup_ts")), 1
                ).otherwise(0)
            ).alias("purchases_after")
        )
    )
    return conv.agg(
        F.count(F.lit(1)).alias("n_signup_users"),
        F.sum(F.when(F.col("purchases_after") > 0, 1).otherwise(0)).alias("n_converted"),
        F.round(
            F.sum(F.when(F.col("purchases_after") > 0, 1).otherwise(0)) / F.count(F.lit(1)), 6
        ).alias("conversion_rate"),
    )


@query(
    "stream_stream_join",
    oracle="""
    WITH l AS (SELECT user_id, ts AS left_ts FROM events WHERE event_type = 'signup'),
    r AS (SELECT user_id AS r_user, ts AS right_ts FROM events WHERE event_type = 'purchase')
    SELECT l.user_id, l.left_ts, r.right_ts,
           (epoch_us(r.right_ts) - epoch_us(l.left_ts)) // 60000000 AS delay_min
    FROM l JOIN r ON r.r_user = l.user_id
     AND r.right_ts >= l.left_ts
     AND r.right_ts <= l.left_ts + INTERVAL 2 HOUR
    """,
)
def stream_stream_join(spark, sf_dir):
    """Batch twin of the watermarked stream-stream interval join
    (signup→purchase attribution within 2 hours).  The streaming run — with
    join-state expiry driven by both watermarks — executes in
    tests/test_streaming.py on the same builder."""
    return E.correlate_events(T(spark, sf_dir, "events"))


@query(
    "stream_cohort_retention",
    oracle="""
    WITH cohort AS (
      SELECT user_id, MIN(date_trunc('day', ts)) AS cohort_day
      FROM events WHERE event_type = 'signup' GROUP BY 1
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS active_day FROM events
    )
    SELECT CAST(c.cohort_day AS DATE) AS cohort_day,
           CAST(datediff('day', c.cohort_day, a.active_day) AS BIGINT) AS day_offset,
           CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
    FROM cohort c JOIN activity a USING (user_id)
    WHERE a.active_day >= c.cohort_day
    GROUP BY 1, 2
    """,
)
def stream_cohort_retention(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-signup day, counted
    on each later day they were active (day_offset 0 = signup day).  The
    classic product-analytics rollup.

    Scale: cohorts and activity are both per-user aggregates (map-side
    partial + one shuffle on user_id each); joining them on user_id reuses
    that key, and the final matrix is tiny (days x offsets).  Integer day
    arithmetic keeps the result engine-exact."""
    ev = T(spark, sf_dir, "events")
    cohort = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.date_trunc("day", F.col("ts"))).alias("cohort_day"))
    )
    activity = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("active_day")
    ).distinct()
    return (
        cohort.join(activity, "user_id")
        .where(F.col("active_day") >= F.col("cohort_day"))
        .groupBy(
            F.to_date("cohort_day").alias("cohort_day"),
            F.datediff(F.to_date("active_day"), F.to_date("cohort_day"))
            .cast("bigint")
            .alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_users"))
    )


@query(
    "events_attribution_touch",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT user_id,
           MIN(CASE WHEN rn_a = 1 THEN event_type END) AS first_touch,
           MIN(CASE WHEN rn_d = 1 THEN event_type END) AS last_touch,
           COUNT(*) AS n_events,
           MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
    FROM ranked
    GROUP BY user_id
    """,
)
def events_attribution_touch(spark, sf_dir):
    """First-/last-touch attribution per user: which event type opened the
    journey, which closed it, and whether the user ever converted.

    Scale: both row_number specs share the partition key, so Catalyst plans
    ONE exchange on user_id (two sorts reuse it), and the follow-on groupBy
    on the same key needs no further shuffle.  Ordering includes event_id so
    same-timestamp events rank deterministically."""
    e = T(spark, sf_dir, "events")
    w_a = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_d = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        e.select(
            "user_id",
            "event_type",
            F.row_number().over(w_a).alias("rn_a"),
            F.row_number().over(w_d).alias("rn_d"),
        )
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("rn_a") == 1, F.col("event_type"))).alias("first_touch"),
            F.min(F.when(F.col("rn_d") == 1, F.col("event_type"))).alias("last_touch"),
            F.count(F.lit(1)).alias("n_events"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("converted"),
        )
    )


@query(
    "stream_dedup_ids",
    oracle="""
    SELECT DISTINCT event_id, ts, user_id, event_type, value, props
    FROM (SELECT * FROM events UNION ALL SELECT * FROM events)
    """,
)
def stream_dedup_ids(spark, sf_dir):
    """Batch-mode contract of the streaming deduplicator (streaming/events.py
    dedup_stream): replaying a doubled feed yields each event exactly once.
    In streaming mode the same operator is dropDuplicatesWithinWatermark —
    state expires as the watermark passes, so the dedup table never grows
    unboundedly (the 100 TB requirement for replayed/at-least-once feeds)."""
    from trough_spark.streaming import events as E

    e = T(spark, sf_dir, "events")
    return E.dedup_stream(e.unionAll(e))
