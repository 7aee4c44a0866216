"""Coverage for the operators trough implements in its own code —
SURVEY.md §2.A — re-expressed Spark-first.

The sharding/routing layer (A3/A12/A13) is modeled exactly as the engine
stores segments: a ``segment_id`` column that is a partition key, so a
per-segment query is a partition-pruned scan and a regex fan-out is ONE Spark
query over the matching partitions (the capability upgrade over the
reference's scatter-only client loop, trough/shell/__init__.py:242-262).
Here the synthetic tables carry no segment column, so the queries derive one
deterministically — the pruning behavior on real partitioned storage is
exercised in tests/test_store.py.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from trough_spark.functions import build_redirect_array, regexp, seed_crawled_status
from trough_spark.queries import query
from trough_spark.tables import load_table as T

def _segment():
    # lazy: Column construction needs an active SparkSession
    return F.concat(F.lit("seg"), F.lpad((F.col("l_orderkey") % 16).cast("string"), 2, "0"))


_SEGMENT_SQL = "'seg' || lpad(CAST(l_orderkey % 16 AS VARCHAR), 2, '0')"


# ---------------------------------------------------------------------------
# A3: segment routing — query exactly one segment (partition pruning)
# ---------------------------------------------------------------------------
@query(
    "a3_segment_routing",
    oracle=f"""
    SELECT {_SEGMENT_SQL} AS segment_id,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM lineitem
    WHERE {_SEGMENT_SQL} = 'seg03'
    GROUP BY 1
    """,
)
def a3_segment_routing(spark, sf_dir):
    # reference: trough/read.py:74 resolves ?segment= to one SQLite file; here
    # the filter on the segment key prunes to one partition directory when the
    # table is stored partitionBy("segment_id") (see store.py) — same
    # worst-case-bounded latency argument as README.rst:16-31.
    l = T(spark, sf_dir, "lineitem").withColumn("segment_id", _segment())
    return (
        l.filter(F.col("segment_id") == "seg03")
        .groupBy("segment_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double").alias(
                "total_price"
            ),
        )
    )


# ---------------------------------------------------------------------------
# A12 + A13: regex segment lookup + scatter/fan-out read — one Spark query
# ---------------------------------------------------------------------------
@query(
    "a12_fanout_regex",
    oracle=f"""
    SELECT segment_id, COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue
    FROM (SELECT *, {_SEGMENT_SQL} AS segment_id FROM lineitem)
    WHERE regexp_matches(segment_id, '^seg0[0-5]$')
    GROUP BY segment_id
    """,
)
def a12_fanout_regex(spark, sf_dir):
    # reference: client.py:171-188 regex-matches segment ids, then the shell
    # scatters one HTTP POST per segment with NO merge (shell/__init__.py:242-262).
    # Spark-first: the regex filter prunes partitions and the per-segment
    # GROUP BY *is* the fan-out — plus a real global merge the reference
    # never had.
    l = T(spark, sf_dir, "lineitem").withColumn("segment_id", _segment())
    net = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(12,2)")
    )
    return (
        l.filter(regexp(F.lit("^seg0[0-5]$"), F.col("segment_id")))
        .groupBy("segment_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(net).cast("double").alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# A12b: cross-segment global aggregate — the upgrade over scatter-only
# ---------------------------------------------------------------------------
@query(
    "a12_cross_segment_global",
    oracle=f"""
    SELECT COUNT(DISTINCT segment_id) AS n_segments,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM (SELECT *, {_SEGMENT_SQL} AS segment_id FROM lineitem)
    """,
)
def a12_cross_segment_global(spark, sf_dir):
    l = T(spark, sf_dir, "lineitem").withColumn("segment_id", _segment())
    return l.agg(
        F.countDistinct("segment_id").alias("n_segments"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_extendedprice").cast("decimal(12,2)")).cast("double").alias("total"),
    )


# ---------------------------------------------------------------------------
# A7: REGEXP(pattern, item) — reference arg order, re.search semantics
# ---------------------------------------------------------------------------
@query(
    "a7_regexp_function",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE COALESCE(regexp_matches(text, 'join .* (scan|merge)'), FALSE)
      AND lang IN ('en', 'de')
    """,
)
def a7_regexp_function(spark, sf_dir):
    # reference: trough/sync.py:41-49; rlike is JVM regex — stays codegen'd,
    # unlike the reference's per-row Python callback into SQLite.
    d = T(spark, sf_dir, "documents")
    return d.filter(
        regexp(F.lit("join .* (scan|merge)"), F.col("text")) & F.col("lang").isin("en", "de")
    ).select("doc_id", "lang")


# ---------------------------------------------------------------------------
# A8: SEEDCRAWLEDSTATUS — every bucket exercised
# ---------------------------------------------------------------------------
_CODE_SQL = """
    CASE WHEN value > 48 THEN NULL
         WHEN event_type = 'click' THEN 200
         WHEN event_type = 'view' THEN 301
         WHEN event_type = 'error' THEN 404
         WHEN event_type = 'signup' THEN 0
         WHEN event_type = 'purchase' THEN -9998
         ELSE -1 END
"""


@query(
    "a8_seed_crawled_status",
    oracle=f"""
    WITH coded AS (SELECT {_CODE_SQL} AS status_code FROM events)
    SELECT (CASE WHEN status_code IS NULL THEN 'Not crawled (None)'
          WHEN status_code >= 300 AND status_code < 400 THEN 'Redirected'
          WHEN status_code >= 400 THEN 'Crawled (HTTP error ' || CAST(status_code AS VARCHAR) || ')'
          WHEN status_code > 0 THEN 'Crawled'
          WHEN status_code IN (0, -5003, -5004) THEN 'Not crawled (queued)'
          WHEN status_code = -9998 THEN 'Not crawled (blocked by robots)'
          ELSE 'Not crawled (' || CAST(status_code AS VARCHAR) || ')' END) AS status,
          COUNT(*) AS n
    FROM coded
    GROUP BY 1
    """,
)
def a8_seed_crawled_status(spark, sf_dir):
    # reference: trough/sync.py:52-70 — a Python per-row callback there; a
    # CASE chain inside whole-stage codegen here.
    e = T(spark, sf_dir, "events")
    code = (
        F.when(F.col("value") > 48, F.lit(None).cast("int"))
        .when(F.col("event_type") == "click", 200)
        .when(F.col("event_type") == "view", 301)
        .when(F.col("event_type") == "error", 404)
        .when(F.col("event_type") == "signup", 0)
        .when(F.col("event_type") == "purchase", -9998)
        .otherwise(-1)
    )
    return (
        e.select(seed_crawled_status(code).alias("status"))
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------------------
# A9: BUILDREDIRECTARRAY — JSON accumulator as native array ops
# ---------------------------------------------------------------------------
@query(
    "a9_build_redirect_array",
    oracle="""
    WITH coded AS (
      -- NB: explicit FLOOR — DuckDB's double→bigint cast rounds, Spark's truncates
      SELECT event_id, user_id, CAST(FLOOR(value) AS BIGINT) % 500 + 100 AS sc
      FROM events WHERE event_id <= 200
    )
    SELECT event_id,
           '[{"seed":"' || 'https://example.org/u/' || CAST(user_id AS VARCHAR) ||
           '","status":"' ||
           (CASE WHEN sc >= 300 AND sc < 400 THEN 'Redirected'
                 WHEN sc >= 400 THEN 'Crawled (HTTP error ' || CAST(sc AS VARCHAR) || ')'
                 ELSE 'Crawled' END) ||
           '"}]' AS redirects
    FROM coded
    """,
)
def a9_build_redirect_array(spark, sf_dir):
    # reference: trough/sync.py:72-82.  hop_path 'L' → hop 1, empty input
    # accumulator; output is the canonical compact JSON of the one-entry array.
    e = T(spark, sf_dir, "events").filter(F.col("event_id") <= 200)
    url = F.concat(F.lit("https://example.org/u/"), F.col("user_id").cast("string"))
    status = (F.floor("value").cast("bigint") % 500 + 100).cast("int")
    return e.select(
        "event_id",
        build_redirect_array(url, status, F.lit("L"), F.lit(None).cast("string")).alias(
            "redirects"
        ),
    )


# ---------------------------------------------------------------------------
# A2: row→JSON projection (the read path's result shape)
# ---------------------------------------------------------------------------
@query(
    "a2_row_to_json",
    oracle="""
    SELECT o_orderkey,
           '{"o_orderkey":' || CAST(o_orderkey AS VARCHAR) ||
           ',"o_orderstatus":"' || o_orderstatus ||
           '","o_orderpriority":"' || o_orderpriority || '"}' AS row_json
    FROM orders
    WHERE o_orderkey <= 100
    """,
)
def a2_row_to_json(spark, sf_dir):
    # reference: trough/read.py:33-52 zips cursor.description with each row
    # into {column: value} dicts.  Spark-first: to_json(struct(...)) — the
    # JSON serialization happens distributed, not on a single worker.
    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    return o.select(
        "o_orderkey",
        F.to_json(F.struct("o_orderkey", "o_orderstatus", "o_orderpriority")).alias("row_json"),
    )


# ---------------------------------------------------------------------------
# B3/B4/B12 through the dialect shim itself: a SQLite-dialect query string is
# translated by dialect.sqlite_to_spark and executed — putting the shim under
# the driver's correctness gate, not just pytest
# ---------------------------------------------------------------------------
@query(
    "b12_dialect_shim_roundtrip",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS un,
           substr(p_type, 1, 4) AS t4,
           coalesce(nullif(p_brand, 'Brand#1'), 'OTHER') AS b,
           -- FLOOR: SQLite/Spark CAST(real AS int) truncates, DuckDB rounds
           CAST(FLOOR(p_retailprice) AS BIGINT) AS ip
    FROM part
    WHERE lower(p_name) LIKE lower('%BOLT%')
      AND regexp_matches(p_brand, '^Brand#1.*$')
    """,
)
def b12_dialect_shim_roundtrip(spark, sf_dir):
    from trough_spark.dialect import sqlite_to_spark
    from trough_spark.tables import register_views

    register_views(spark, sf_dir, ["part"])
    sqlite_sql = (
        "SELECT p_partkey, upper(p_name) AS un, substr(p_type, 1, 4) AS t4, "
        "ifnull(nullif(p_brand, 'Brand#1'), 'OTHER') AS b, "
        "CAST(p_retailprice AS INTEGER) AS ip "
        "FROM part "
        "WHERE p_name LIKE '%BOLT%' AND p_brand GLOB 'Brand#1*'"
    )
    return spark.sql(sqlite_to_spark(sqlite_sql))


@query(
    "b12_dialect_shim_roundtrip2",
    oracle="""
    SELECT p_partkey,
           '''' || p_brand || '''' AS qb,
           CASE WHEN p_retailprice IS NULL THEN NULL
                WHEN p_retailprice < 1500.0 THEN p_retailprice
                ELSE 1500.0 END AS mn,
           TIMESTAMP '2024-04-02 00:00:00' AS dt,
           CASE WHEN p_size IS NOT DISTINCT FROM 10 THEN 'ten' ELSE 'other' END AS s10
    FROM part
    WHERE p_partkey IS DISTINCT FROM 5
    ORDER BY p_partkey
    LIMIT 20 OFFSET 10
    """,
)
def b12_dialect_shim_roundtrip2(spark, sf_dir):
    """Round-6 dialect constructs under the driver gate: quote() typed
    rendering, NULL-strict scalar min via the named_struct binding, chained
    month modifiers via the transform() lambda, null-safe IS / IS NOT, the
    LIMIT offset-comma form, and a NOT INDEXED hint."""
    from trough_spark.dialect import sqlite_to_spark
    from trough_spark.tables import register_views

    register_views(spark, sf_dir, ["part"])
    sqlite_sql = (
        "SELECT p_partkey, quote(p_brand) AS qb, "
        "min(p_retailprice, 1500.0) AS mn, "
        "datetime('2024-01-31 00:00:00', '+1 month', '+1 month') AS dt, "
        "CASE WHEN p_size IS 10 THEN 'ten' ELSE 'other' END AS s10 "
        "FROM part NOT INDEXED "
        "WHERE p_partkey IS NOT 5 "
        "ORDER BY p_partkey LIMIT 10, 20"
    )
    return spark.sql(sqlite_to_spark(sqlite_sql))


@query(
    "b12_shim_window_filter",
    oracle="""
    SELECT o_orderkey,
           CAST(SUM(o_custkey) FILTER (WHERE o_orderstatus = 'O')
                OVER (ORDER BY o_orderkey) AS BIGINT) AS s,
           COUNT(*) FILTER (WHERE lower(o_orderpriority) LIKE '1%')
                OVER (ORDER BY o_orderkey) AS c,
           -- NO filter on the max: the source query's sliding-start
           -- min/max FILTER is silently ignored by SQLite (probed,
           -- dialect._rewrite_window_filter docstring) and the shim
           -- reproduces that, so the expected result is the unfiltered max
           MAX(o_custkey) OVER (ORDER BY o_orderkey
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS m
    FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey
    """,
)
def b12_shim_window_filter(spark, sf_dir):
    """SQLite's aggregate FILTER clause through the dialect shim, under the
    driver gate: grouped/unbounded-window FILTER runs natively or via the
    CASE rewrite (Spark rejects window FILTER), and the probed SQLite
    quirk — min/max over a SLIDING frame start silently ignore their
    FILTER — is reproduced bug-compatibly (the oracle's max is
    unfiltered on purpose)."""
    from trough_spark.dialect import sqlite_to_spark
    from trough_spark.tables import register_views

    register_views(spark, sf_dir, ["orders"])
    sqlite_sql = (
        "SELECT o_orderkey, "
        "sum(o_custkey) FILTER (WHERE o_orderstatus = 'O') "
        "OVER (ORDER BY o_orderkey) AS s, "
        "count(*) FILTER (WHERE o_orderpriority LIKE '1%') "
        "OVER (ORDER BY o_orderkey) AS c, "
        "max(o_custkey) FILTER (WHERE o_orderstatus = 'F') "
        "OVER (ORDER BY o_orderkey ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS m "
        "FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey"
    )
    return spark.sql(sqlite_to_spark(sqlite_sql))


@query(
    "b12_shim_json_each",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey <= 50
    )
    SELECT o_orderkey, t.k.key AS key, t.k.value AS value,
           t.k.type AS type, t.k.fullkey AS fullkey
    FROM o, UNNEST([
      {'key': '0', 'value': CAST(o_orderkey AS VARCHAR),
       'type': 'integer', 'fullkey': '$[0]'},
      {'key': '1', 'value': o_orderstatus, 'type': 'text', 'fullkey': '$[1]'},
      {'key': '2', 'value': CAST(NULL AS VARCHAR), 'type': 'null',
       'fullkey': '$[2]'}
    ]) AS t(k)
    ORDER BY o_orderkey, fullkey
    """,
)
def b12_shim_json_each(spark, sf_dir):
    """SQLite's json_each table-valued function through the dialect shim,
    under the driver gate: a per-row JSON document is exploded by the
    variant_explode rewrite (dialect._rewrite_json_each) with SQLite's
    probed column contract; the oracle states the expected rows directly
    (key '0' integer, key '1' text, key '2' null per order).  key/value
    are CAST to TEXT in the source query — the documented dynamic-typing
    divergence of the json family."""
    from trough_spark.dialect import sqlite_to_spark
    from trough_spark.tables import register_views

    register_views(spark, sf_dir, ["orders"])
    sqlite_sql = (
        "SELECT o.o_orderkey, CAST(je.key AS TEXT) AS key, "
        "CAST(je.value AS TEXT) AS value, je.type, je.fullkey "
        "FROM orders o, json_each('[' || o.o_orderkey || ', \"' || o.o_orderstatus || '\", null]') je "
        "WHERE o.o_orderkey <= 50 "
        "ORDER BY o.o_orderkey, je.fullkey"
    )
    return spark.sql(sqlite_to_spark(sqlite_sql))


@query(
    "b12_shim_json_tree",
    oracle="""
    WITH o AS (
      SELECT o_orderkey AS k, o_orderstatus AS s FROM orders WHERE o_orderkey <= 50
    )
    SELECT k AS o_orderkey, t.r.key AS key, t.r.value AS value,
           t.r.type AS type, t.r.atom AS atom, t.r.fullkey AS fullkey,
           t.r.path AS path
    FROM o, UNNEST([
      {'key': CAST(NULL AS VARCHAR),
       'value': '{"k":' || k || ',"tags":["' || s || '",2]}',
       'type': 'object', 'atom': CAST(NULL AS VARCHAR),
       'fullkey': '$', 'path': '$'},
      {'key': 'k', 'value': CAST(k AS VARCHAR), 'type': 'integer',
       'atom': CAST(k AS VARCHAR), 'fullkey': '$.k', 'path': '$'},
      {'key': 'tags', 'value': '["' || s || '",2]', 'type': 'array',
       'atom': CAST(NULL AS VARCHAR), 'fullkey': '$.tags', 'path': '$'},
      {'key': '0', 'value': s, 'type': 'text', 'atom': s,
       'fullkey': '$.tags[0]', 'path': '$.tags'},
      {'key': '1', 'value': '2', 'type': 'integer', 'atom': '2',
       'fullkey': '$.tags[1]', 'path': '$.tags'}
    ]) AS t(r)
    ORDER BY o_orderkey, fullkey
    """,
)
def b12_shim_json_tree(spark, sf_dir):
    """SQLite's json_tree recursive walk through the dialect shim, under
    the driver gate (round 10): each per-row document expands to the root
    row PLUS every descendant with parent-text/fullkey threading
    (dialect._json_tree_subquery, a bounded-depth UNION of level
    expansions — the probed SQLite 3.40 column contract incl. the root
    row's NULL key, container values minified, path = parent fullkey).
    The oracle states the expected five rows per order directly.
    key/value/atom are CAST to TEXT in the source query — the documented
    dynamic-typing divergence of the json family; id/parent are opaque
    ordinals in both engines and not compared."""
    from trough_spark.dialect import sqlite_to_spark
    from trough_spark.tables import register_views

    register_views(spark, sf_dir, ["orders"])
    sqlite_sql = (
        "SELECT o.o_orderkey, CAST(jt.key AS TEXT) AS key, "
        "CAST(jt.value AS TEXT) AS value, jt.type, "
        "CAST(jt.atom AS TEXT) AS atom, jt.fullkey, jt.path "
        'FROM orders o, json_tree(\'{"k":\' || o.o_orderkey || '
        "',\"tags\":[\"' || o.o_orderstatus || '\",2]}') jt "
        "WHERE o.o_orderkey <= 50 "
        "ORDER BY o.o_orderkey, jt.fullkey"
    )
    return spark.sql(sqlite_to_spark(sqlite_sql))


@query(
    "b12_shim_literal_escape",
    oracle=r"""
    SELECT o_orderkey,
           'c:\dir\' || o_orderstatus AS p,
           CAST(3 AS BIGINT) AS n,
           CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END AS m1,
           CASE WHEN o_orderpriority LIKE '1-%' THEN 1 ELSE 0 END AS m2
    FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey
    """,
)
def b12_shim_literal_escape(spark, sf_dir):
    """Backslash string literals and LIKE ... ESCAPE through the dialect
    shim, under the driver gate (round 9): SQLite literals have NO escape
    character (the shim respells them for Spark's parser), a backslash in
    a literal LIKE pattern is an ORDINARY character (value-level
    re-doubling), and an explicit ESCAPE char may precede any character
    (the pattern is re-encoded to Spark's narrower escape grammar and the
    clause dropped).  The oracle states the expected rows directly —
    DuckDB literals are already escape-free, and its LIKE needs none of
    the shim's fix-ups for the plain '1-%' equivalent."""
    from trough_spark.dialect import sqlite_to_spark
    from trough_spark.tables import register_views

    register_views(spark, sf_dir, ["orders"])
    sqlite_sql = (
        "SELECT o_orderkey, 'c:\\dir\\' || o_orderstatus AS p, "
        "CAST(length('a\\b') AS BIGINT) AS n, "
        "CASE WHEN ('c:\\dir\\' || o_orderstatus) LIKE 'c:\\dir\\O' "
        "THEN 1 ELSE 0 END AS m1, "
        "CASE WHEN o_orderpriority LIKE '1X-%' ESCAPE 'X' "
        "THEN 1 ELSE 0 END AS m2 "
        "FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey"
    )
    return spark.sql(sqlite_to_spark(sqlite_sql))
