"""Sketch queries: HLL distinct estimates and count-min heavy hitters.

Both estimates are deterministic (md5 hashes, exact integer register math)
so the DuckDB oracle reproduces them bit-for-bit — see
`operators/sketches.py` for the construction and the scale rationale
(constant-size, map-side-combinable aggregation state).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from trough_spark.operators import sketches as SK
from trough_spark.queries import query
from trough_spark.tables import load_table as T


@query(
    "sketch_hll_distinct",
    oracle="""
    WITH est AS ({hll}),
    exact AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
      FROM events GROUP BY event_type
    )
    SELECT est.event_type, est.est_distinct, exact.n_exact
    FROM est JOIN exact ON est.event_type = exact.event_type
    """.format(
        hll=SK.hll_oracle_sql(
            "SELECT event_type, user_id FROM events", "user_id", group_by="event_type"
        )
    ),
)
def sketch_hll_distinct(spark, sf_dir):
    """Per-event-type distinct-user estimate (HLL, p=7 → 128 registers)
    next to the exact distinct count.  At 100 TB the HLL column costs one
    scan with constant aggregation state per group; the exact column is the
    expensive dedup it replaces (kept here to show the error)."""
    ev = T(spark, sf_dir, "events").select("event_type", "user_id")
    est = SK.hll_estimate(ev, "user_id", group_by="event_type")
    exact = ev.groupBy("event_type").agg(
        F.count_distinct(F.col("user_id")).alias("n_exact")
    )
    return est.join(exact, "event_type")


@query(
    "sketch_countmin_heavy_hitters",
    oracle="""
    WITH est AS ({cms}),
    truth AS (
      SELECT CAST(user_id AS VARCHAR) AS user_key, COUNT(*) AS true_count
      FROM events WHERE user_id IS NOT NULL GROUP BY CAST(user_id AS VARCHAR)
    )
    SELECT est.user_key, est.est_count, truth.true_count
    FROM est JOIN truth ON est.user_key = truth.user_key
    ORDER BY est.est_count DESC, est.user_key
    LIMIT 25
    """.format(
        cms=SK.cms_oracle_sql(
            "SELECT CAST(user_id AS VARCHAR) AS user_key FROM events", "user_key"
        )
    ),
)
def sketch_countmin_heavy_hitters(spark, sf_dir):
    """Top-25 heaviest users by count-min estimate (d=3, w=256), with the
    true count alongside (CMS estimates are upper bounds; collisions show
    as est > true).  Sketch is depth x width = 768 cells regardless of
    input size, built by one map-side-combinable aggregation and broadcast
    for lookup."""
    ev = T(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("user_key")
    )
    sketch = SK.cms_build(ev, "user_key")
    keys = ev.where(F.col("user_key").isNotNull()).distinct()
    est = SK.cms_lookup(sketch, keys, "user_key")
    truth = (
        ev.where(F.col("user_key").isNotNull())
        .groupBy("user_key")
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
    return (
        est.join(truth, "user_key")
        .orderBy(F.col("est_count").desc(), "user_key")
        .limit(25)
    )


@query(
    "sketch_hll_hourly_users",
    oracle="""
    WITH est AS ({hll})
    SELECT window_start, est_distinct FROM est
    """.format(
        hll=SK.hll_oracle_sql(
            "SELECT date_trunc('hour', ts) AS window_start, user_id FROM events",
            "user_id",
            group_by="window_start",
        )
    ),
)
def sketch_hll_hourly_users(spark, sf_dir):
    """Distinct users per hour, estimated: the sketch composes with any
    grouping — here a time window, the shape a streaming dashboard needs
    (per-window registers merge by max, so this runs identically as a
    watermarked streaming aggregate).  State is 128 registers per open
    window instead of the window's full user set."""
    ev = T(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("window_start"), "user_id"
    )
    return SK.hll_estimate(ev, "user_id", group_by="window_start")


@query(
    "sketch_equidepth_histogram",
    oracle=f"""
    WITH {SK.equidepth_oracle_sql("SELECT n_chars, doc_id FROM documents", "n_chars", "doc_id", 10)}
    SELECT bucket, n_rows, lo, hi, sum_val FROM hist ORDER BY bucket
    """,
)
def sketch_equidepth_histogram(spark, sf_dir):
    """Exact 10-bucket equi-depth histogram of document lengths — the
    distribution profile a curation pipeline computes before choosing
    length cutoffs.  No global sort: global rank decomposes into a
    broadcast cumulative table over DISTINCT lengths plus a window
    partitioned by length, so everything row-scale stays hash-partitioned
    (see operators/sketches.equidepth_histogram)."""
    docs = T(spark, sf_dir, "documents")
    return SK.equidepth_histogram(docs, "n_chars", "doc_id", n_buckets=10)


@query(
    "sketch_kmv_quantiles",
    oracle="""
    WITH h AS (
      SELECT CAST(('0x' || substr(md5(CAST(l_orderkey * 10 + l_linenumber AS VARCHAR)), 1, 15))
               AS BIGINT) AS kmv_h,
             l_extendedprice AS v
      FROM lineitem
    ),
    sample AS (SELECT * FROM h ORDER BY kmv_h LIMIT 256),
    ranked AS (
      SELECT v, kmv_h,
             ROW_NUMBER() OVER (ORDER BY v, kmv_h) AS r,
             COUNT(*) OVER () AS n,
             MAX(kmv_h) OVER () AS hk
      FROM sample
    )
    SELECT q, v AS boundary,
           CASE WHEN n < 256 THEN CAST(n AS DOUBLE)
                ELSE ROUND(255.0 / (hk / 1152921504606846976.0), 3) END AS est_ndv
    FROM ranked, UNNEST(generate_series(0, 10)) AS t(q)
    WHERE r = (2 * q * (n - 1) + 10) // 20 + 1
    """,
)
def sketch_kmv_quantiles(spark, sf_dir):
    """KMV bottom-k sketch over lineitem prices: 11 decile boundaries +
    distinct-key estimate from a 256-row deterministic sample.  The
    mergeable answer to "where are the quantiles" at 100 TB — per-partition
    top-k combine, k rows cross the wire instead of the corpus (vs the
    exact full-data equi-depth histogram, sketch_equidepth_histogram)."""
    li = T(spark, sf_dir, "lineitem").select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).cast("long").alias("k"),
        "l_extendedprice",
    )
    return SK.kmv_quantiles(li, F.col("k"), "l_extendedprice", k=256, n_buckets=10)


@query(
    "sketch_source_overlap",
    oracle="""
    WITH h AS (
      SELECT source AS grp,
             CAST(('0x' || substr(md5(md5(text)), 1, 15)) AS BIGINT) AS h
      FROM documents
    ),
    sig AS (
      SELECT grp, CAST(h % 64 AS INT) AS bucket, MIN(h) AS minh
      FROM h GROUP BY 1, 2
    )
    SELECT a.grp AS grp_a, b.grp AS grp_b,
           COUNT(*) AS n_common_buckets,
           CAST(SUM(CASE WHEN a.minh = b.minh THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
           ROUND(CAST(SUM(CASE WHEN a.minh = b.minh THEN 1 ELSE 0 END) AS BIGINT)
                 / COUNT(*), 6) AS est_jaccard
    FROM sig a JOIN sig b ON a.bucket = b.bucket AND a.grp < b.grp
    GROUP BY 1, 2
    ORDER BY grp_a, grp_b
    """,
)
def sketch_source_overlap(spark, sf_dir):
    """Cross-source content-overlap estimates from one-permutation MinHash
    signatures over content hashes — n_sources^2 x 64 integers compared,
    never a corpus join.  Keys off md5(text) so byte-identical documents
    are the overlap unit (the cross-source dedup planning question)."""
    docs = T(spark, sf_dir, "documents")
    sig = SK.source_minhash_signature(
        docs, "source", F.md5(F.col("text")), n_buckets=64
    )
    return SK.source_overlap_estimate(sig, n_buckets=64)
