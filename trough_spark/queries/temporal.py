"""As-of and interval join queries over `events`, oracled against DuckDB's
native ASOF JOIN / inequality joins."""

from __future__ import annotations

import pyspark.sql.functions as F

from trough_spark.operators import temporal as TP
from trough_spark.queries import query
from trough_spark.tables import load_table as T


@query(
    "asof_join_last_signup",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    signups AS (
      SELECT user_id, ts, MAX(value) AS value
      FROM events WHERE event_type = 'signup' GROUP BY user_id, ts
    )
    SELECT l.event_id, l.user_id, l.ts, r.value AS value_asof
    FROM purchases l
    ASOF LEFT JOIN signups r ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
)
def asof_join_last_signup(spark, sf_dir):
    # Point-in-time join: for every purchase, the user's most recent signup
    # value at-or-before the purchase.  One shuffle on user_id (union+window
    # technique, operators/temporal.py) vs DuckDB's native ASOF JOIN.
    e = T(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    signups = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("value"))
    )
    return TP.asof_join(purchases, signups, on="ts", by="user_id", value_cols=["value"])


@query(
    "interval_join_sessions",
    oracle="""
    WITH intervals AS (
      SELECT user_id, epoch_us(ts) AS start_us, epoch_us(ts) + 600000000 AS end_us,
             event_id AS anchor_id
      FROM events WHERE event_type = 'signup'
    ),
    points AS (
      SELECT user_id, epoch_us(ts) AS p_us, event_id FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id, i.anchor_id
    FROM points p JOIN intervals i
      ON p.user_id = i.user_id AND p.p_us >= i.start_us AND p.p_us <= i.end_us
    """,
)
def interval_join_sessions(spark, sf_dir):
    # Which clicks land within 10 minutes after each signup — banded interval
    # join (bucket width = interval length), per-bucket bounded work.
    e = T(spark, sf_dir, "events")
    intervals = (
        e.filter(F.col("event_type") == "signup")
        .select(
            "user_id",
            F.unix_micros("ts").alias("start_us"),
            (F.unix_micros("ts") + 600_000_000).alias("end_us"),
            F.col("event_id").alias("anchor_id"),
        )
    )
    points = (
        e.filter(F.col("event_type") == "click")
        .select("user_id", F.unix_micros("ts").alias("p_us"), "event_id")
    )
    return TP.interval_join(
        points, intervals, key="user_id", point_col="p_us",
        start_col="start_us", end_col="end_us", bucket_width=600_000_000,
    ).select("event_id", "user_id", "anchor_id")


@query(
    "events_multigrain_rollup",
    oracle="""
    WITH m AS (
      SELECT date_trunc('minute', ts) AS bucket_start,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             SUM(CAST(value AS DECIMAL(12,2))) AS s
      FROM events GROUP BY 1
    ),
    h AS (
      SELECT date_trunc('hour', bucket_start) AS bucket_start,
             CAST(SUM(n_events) AS BIGINT) AS n_events, SUM(s) AS s
      FROM m GROUP BY 1
    ),
    d AS (
      SELECT date_trunc('day', bucket_start) AS bucket_start,
             CAST(SUM(n_events) AS BIGINT) AS n_events, SUM(s) AS s
      FROM h GROUP BY 1
    )
    SELECT 'minute' AS grain, bucket_start, n_events, CAST(s AS DOUBLE) AS total_value FROM m
    UNION ALL
    SELECT 'hour', bucket_start, n_events, CAST(s AS DOUBLE) FROM h
    UNION ALL
    SELECT 'day', bucket_start, n_events, CAST(s AS DOUBLE) FROM d
    """,
)
def events_multigrain_rollup(spark, sf_dir):
    """Hypertable-style continuous aggregate: minute/hour/day counts and
    value sums in ONE pass — the input shuffles once at the finest grain
    and every coarser level re-aggregates the previous level's tiny output
    (exact: COUNT and DECIMAL SUM are associative).  A GROUPING SETS plan
    would instead expand every input row once per grain before the
    shuffle — grains x scan volume at 100 TB.  See
    operators/temporal.multigrain_rollup."""
    from trough_spark.operators.temporal import multigrain_rollup

    return multigrain_rollup(
        T(spark, sf_dir, "events"), "ts", "value", grains=("minute", "hour", "day")
    )


@query(
    "events_rate_anomaly",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS h0, date_trunc('hour', MAX(ts)) AS h1
      FROM events
    ),
    spine AS (
      SELECT UNNEST(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM bounds
    ),
    types AS (SELECT DISTINCT event_type FROM events),
    dense AS (
      SELECT t.event_type, s.h, COALESCE(hh.n, 0::BIGINT) AS c
      FROM types t CROSS JOIN spine s
      LEFT JOIN hourly hh ON hh.event_type = t.event_type AND hh.h = s.h
    ),
    win AS (
      SELECT event_type, h, c,
             SUM(c) OVER w AS s_w,
             SUM(c * c) OVER w AS q_w,
             COUNT(*) OVER w AS n_w
      FROM dense
      WINDOW w AS (PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, h AS hour_start, c AS n_events,
           CAST(s_w AS BIGINT) AS s_w, CAST(q_w AS BIGINT) AS q_w,
           CASE WHEN 24 * q_w - s_w * s_w > 0
                THEN CAST(1000000 * (24 * c - s_w) * (24 * c - s_w)
                          // (24 * q_w - s_w * s_w) AS BIGINT) END AS z2_ppm,
           CASE WHEN 24 * q_w - s_w * s_w > 0
                THEN (24 * c - s_w) * (24 * c - s_w) >= 9 * (24 * q_w - s_w * s_w)
                ELSE 24 * c != s_w END AS is_anomaly
    FROM win WHERE n_w = 24
    """,
)
def events_rate_anomaly(spark, sf_dir):
    """Hourly rate-spike detection per event_type over a dense hour spine
    (silent feeds count as zero): trailing-24h z-test cleared of division
    and sqrt so every comparison is an exact BIGINT product
    (operators/temporal.py:rate_anomaly)."""
    return TP.rate_anomaly(
        T(spark, sf_dir, "events"), ts_col="ts", type_col="event_type",
        trailing=24, k=3,
    )
