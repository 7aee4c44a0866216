"""Relational operator coverage — SURVEY.md §2.B rows B1-B12.

The reference passes any single SQLite SELECT through to the embedded library
(reference: trough/read.py:58,66); parity here means each SQLite SQL category
re-expressed as an idiomatic Spark DataFrame plan.  Scale notes per query
explain why the plan survives 100 TB (pruned scans, broadcast dims, partial
aggregation, single shuffle per groupBy).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from trough_spark.queries import query
from trough_spark.tables import load_table as T

DEC = "decimal(12,2)"  # exact for the 2-decimal synthetic money columns


# ---------------------------------------------------------------------------
# B1 + B3: scan, projection, expressions (CASE / CAST / concat / arithmetic)
# ---------------------------------------------------------------------------
@query(
    "b3_projection_expressions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(CAST(l_extendedprice AS DECIMAL(12,2)) *
                (1 - CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS net_price,
           CAST(l_quantity AS BIGINT) AS qty_int,
           l_returnflag || '/' || l_linestatus AS flag_status,
           CASE WHEN l_discount >= 0.08 THEN 'deep'
                WHEN l_discount >= 0.04 THEN 'mid'
                ELSE 'shallow' END AS discount_band,
           CAST(l_tax * 100 AS BIGINT) AS tax_pct
    FROM lineitem
    WHERE l_orderkey <= 100
    """,
)
def b3_projection_expressions(spark, sf_dir):
    # Scale: filter + projection both push into the parquet scan (PushedFilters
    # + pruned ReadSchema); no shuffle at any data size.
    l = T(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    return l.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount").cast(DEC)))
        .cast("double")
        .alias("net_price"),
        F.col("l_quantity").cast("bigint").alias("qty_int"),
        F.concat_ws("/", "l_returnflag", "l_linestatus").alias("flag_status"),
        F.when(F.col("l_discount") >= 0.08, "deep")
        .when(F.col("l_discount") >= 0.04, "mid")
        .otherwise("shallow")
        .alias("discount_band"),
        (F.col("l_tax") * 100).cast("bigint").alias("tax_pct"),
    )


# ---------------------------------------------------------------------------
# B4: filter predicates — =, <, IN, BETWEEN, LIKE, IS NULL, AND/OR
# ---------------------------------------------------------------------------
@query(
    "b4_filter_predicates",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority,
           CAST(o_totalprice AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderstatus IN ('F', 'O')
      AND o_totalprice BETWEEN 1000 AND 150000
      AND o_orderpriority LIKE '%URGENT%'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_custkey IS NOT NULL
    """,
)
def b4_filter_predicates(spark, sf_dir):
    # Scale: every conjunct is a pushable parquet filter; row-group min/max
    # stats skip whole row groups — the moral equivalent of trough picking a
    # single SQLite shard (reference: trough/read.py:74).
    o = T(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("F", "O")
        & F.col("o_totalprice").between(1000, 150000)
        & F.col("o_orderpriority").like("%URGENT%")
        & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & F.col("o_custkey").isNotNull()
    ).select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        F.col("o_totalprice").cast("double").alias("total_price"),
    )


# ---------------------------------------------------------------------------
# B5: multi-way join (TPC-H Q5 shape): dims broadcast, one shuffle agg
# ---------------------------------------------------------------------------
@query(
    "b5_join_multiway",
    oracle="""
    SELECT n_name AS nation,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS line_count
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name IN ('ASIA', 'EUROPE')
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY n_name
    """,
)
def b5_join_multiway(spark, sf_dir):
    # Scale: only the TRUE dims (region: 5 rows, nation: 25 rows) carry
    # broadcast hints — customer is fact-scale (~15% of orders rows), so a
    # forced broadcast would OOM executors at 100×.  Customer picks up
    # nation/region map-side via the broadcast dim, then joins the
    # lineitem⋈orders chain as a key-partitioned shuffle join under AQE
    # (skew-split if a key is hot; AQE may still downgrade to broadcast at
    # tiny SFs where customer measures under the threshold — that's the
    # point of leaving the decision to the runtime).
    l, o = T(spark, sf_dir, "lineitem"), T(spark, sf_dir, "orders")
    c, n, r = (T(spark, sf_dir, t) for t in ("customer", "nation", "region"))
    o = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    dims = n.join(
        F.broadcast(r.filter(F.col("r_name").isin("ASIA", "EUROPE"))),
        n.n_regionkey == r.r_regionkey,
    )
    cust = c.join(F.broadcast(dims), c.c_nationkey == n.n_nationkey)
    net = F.col("l_extendedprice").cast(DEC) * (F.lit(1) - F.col("l_discount").cast(DEC))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.sum(net).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


# ---------------------------------------------------------------------------
# B5: outer / semi / anti joins (SQLite spells semi/anti as IN / NOT EXISTS)
# ---------------------------------------------------------------------------
@query(
    "b5_join_outer_semi_anti",
    oracle="""
    WITH per_customer AS (
      SELECT c_custkey, c_mktsegment,
             (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
      FROM customer
    )
    SELECT c_mktsegment AS mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(CASE WHEN n_orders = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_without_orders,
           CAST(SUM(n_orders) AS BIGINT) AS n_orders_total
    FROM per_customer
    GROUP BY c_mktsegment
    """,
)
def b5_join_outer_semi_anti(spark, sf_dir):
    # Left outer join + conditional aggregation covers the semi ("has orders")
    # and anti ("no orders") cases in one pass.  Scale: orders is pre-aggregated
    # to one row per custkey BEFORE the join (partial agg shrinks the shuffle),
    # then joined to customer — never a row explosion.
    c, o = T(spark, sf_dir, "customer"), T(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    joined = c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left").withColumn(
        "n_orders", F.coalesce("n_orders", F.lit(0))
    )
    return joined.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.when(F.col("n_orders") == 0, 1).otherwise(0)).alias("n_without_orders"),
        F.sum("n_orders").alias("n_orders_total"),
    )


# ---------------------------------------------------------------------------
# B6: aggregation sweep (TPC-H Q1 shape) — the flagship
# ---------------------------------------------------------------------------
@query(
    "b6_agg_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                    (1 - CAST(l_discount AS DECIMAL(12,2))) *
                    (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
           SUM(l_quantity) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def b6_agg_pricing_summary(spark, sf_dir):
    # Scale: classic partial+final hash aggregation — map-side combine reduces
    # the shuffle to (#groups x #partitions) rows; 6 groups means the exchange
    # is trivially small at any SF.  Whole-stage codegen covers scan→agg.
    l = T(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp")
    )
    ep = F.col("l_extendedprice").cast(DEC)
    disc = F.col("l_discount").cast(DEC)
    tax = F.col("l_tax").cast(DEC)
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(ep).cast("double").alias("sum_base_price"),
            F.sum(ep * (F.lit(1) - disc)).cast("double").alias("sum_disc_price"),
            F.sum(ep * (F.lit(1) - disc) * (F.lit(1) + tax)).cast("double").alias("sum_charge"),
            (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(ep).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(disc).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# B6: group_concat / distinct aggregates
# ---------------------------------------------------------------------------
@query(
    "b6_group_concat_distinct",
    oracle="""
    SELECT n_name AS nation,
           COUNT(DISTINCT c_mktsegment) AS n_segments,
           STRING_AGG(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
           COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def b6_group_concat_distinct(spark, sf_dir):
    # SQLite group_concat ≡ sorted collect_set + concat_ws (SURVEY §2.B6).
    # Scale: collect_set is bounded by segment cardinality (5), not row count;
    # nation is broadcast.
    c, n = T(spark, sf_dir, "customer"), T(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.countDistinct("c_mktsegment").alias("n_segments"),
            F.concat_ws(",", F.array_sort(F.collect_set("c_mktsegment"))).alias("segments"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


# ---------------------------------------------------------------------------
# B7: ROLLUP (a Spark superset — SQLite has no grouping sets, SURVEY §2.B7)
# ---------------------------------------------------------------------------
@query(
    "b7_rollup",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS status,
           COALESCE(o_orderpriority, 'ALL') AS priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
)
def b7_rollup(spark, sf_dir):
    # Scale: rollup expands each input row to 3 grouping sets map-side, but
    # partial aggregation still collapses them before the single shuffle.
    o = T(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total",
        )
    )


# ---------------------------------------------------------------------------
# B8: window functions — ranking, lag/lead, running frames
# ---------------------------------------------------------------------------
@query(
    "b8_window_functions",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(o_totalprice AS DOUBLE) AS price,
           ROW_NUMBER()  OVER w AS rn,
           RANK()        OVER w AS rnk,
           DENSE_RANK()  OVER w AS drnk,
           LAG(o_orderkey)  OVER w AS prev_order,
           LEAD(o_orderkey) OVER w AS next_order,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_spend
    FROM orders
    WHERE o_custkey <= 50
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def b8_window_functions(spark, sf_dir):
    # Scale: one shuffle on the partition key (o_custkey) serves every window
    # expression — Catalyst collapses same-spec windows into a single exchange
    # + sort.  Ordering includes o_orderkey so frames are total-ordered
    # (deterministic across engines).
    o = T(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 50)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.col("o_totalprice").cast("double").alias("price"),
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.lag("o_orderkey").over(w).alias("prev_order"),
        F.lead("o_orderkey").over(w).alias("next_order"),
        F.sum(F.col("o_totalprice").cast(DEC)).over(wsum).cast("double").alias("running_spend"),
    )


# ---------------------------------------------------------------------------
# B9: sort / limit / offset / top-k per group
# ---------------------------------------------------------------------------
@query(
    "b9_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT c_nationkey AS nation_key, c_custkey, c_name,
             CAST(c_acctbal AS DOUBLE) AS acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rnk
      FROM customer
    ) WHERE rnk <= 3
    """,
)
def b9_topk_per_group(spark, sf_dir):
    # Top-k per group: window + filter.  Scale: Spark pushes a per-partition
    # top-k (WindowGroupLimit) below the shuffle, so each mapper emits only k
    # rows per group — this survives arbitrarily large groups.
    c = T(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.select(
            F.col("c_nationkey").alias("nation_key"),
            "c_custkey",
            "c_name",
            F.col("c_acctbal").cast("double").alias("acctbal"),
            F.row_number().over(w).alias("rnk"),
        )
        .filter(F.col("rnk") <= 3)
    )


@query(
    "b9_order_limit_offset",
    oracle="""
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS total_price
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20 OFFSET 5
    """,
)
def b9_order_limit_offset(spark, sf_dir):
    # Scale: ORDER BY + LIMIT compiles to TakeOrderedAndProject — each
    # partition keeps its top (20+5), only those reach the driver; no global
    # sort materialization.
    o = T(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", F.col("o_totalprice").cast("double").alias("total_price"))
        .offset(5)
        .limit(20)
    )


# ---------------------------------------------------------------------------
# B10: set operations
# ---------------------------------------------------------------------------
@query(
    "b10_set_ops",
    oracle="""
    WITH c_nat AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
         s_nat AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
    SELECT 'union' AS op, nationkey FROM (SELECT nationkey FROM c_nat UNION SELECT nationkey FROM s_nat)
    UNION ALL
    SELECT 'intersect' AS op, nationkey FROM (SELECT nationkey FROM c_nat INTERSECT SELECT nationkey FROM s_nat)
    UNION ALL
    SELECT 'except' AS op, nationkey FROM (SELECT nationkey FROM c_nat EXCEPT SELECT nationkey FROM s_nat)
    """,
)
def b10_set_ops(spark, sf_dir):
    # UNION / INTERSECT / EXCEPT with SQLite's distinct semantics
    # (SURVEY §2.B10).  Scale: inputs are pre-distincted (tiny key domains);
    # intersect/except become semi/anti joins under Catalyst.
    c = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey")).distinct()
    s = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey")).distinct()
    tag = lambda df, op: df.select(F.lit(op).alias("op"), "nationkey")  # noqa: E731
    return (
        tag(c.union(s).distinct(), "union")
        .unionAll(tag(c.intersect(s), "intersect"))
        .unionAll(tag(c.exceptAll(s).distinct(), "except"))
    )


# ---------------------------------------------------------------------------
# B11: subqueries & CTEs — scalar, IN, correlated EXISTS
# ---------------------------------------------------------------------------
@query(
    "b11_subqueries_cte",
    oracle="""
    WITH big_orders AS (
      SELECT * FROM orders
      WHERE o_totalprice > (SELECT AVG(o_totalprice) FROM orders)
    )
    SELECT c_mktsegment AS mktsegment, COUNT(*) AS n_big_orders
    FROM big_orders
    JOIN customer ON o_custkey = c_custkey
    WHERE o_custkey IN (SELECT o_custkey FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 2)
    GROUP BY c_mktsegment
    """,
)
def b11_subqueries_cte(spark, sf_dir):
    # SQLite spells these as scalar/IN subqueries; Catalyst rewrites IN to a
    # left-semi join and the scalar subquery to a broadcast one-row join —
    # exactly the plan we build explicitly here.
    o, c = T(spark, sf_dir, "orders"), T(spark, sf_dir, "customer")
    avg_price = o.agg(F.avg("o_totalprice").alias("a"))
    repeat_cust = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("cnt")).filter(
        F.col("cnt") >= 2
    )
    big = o.join(F.broadcast(avg_price)).filter(F.col("o_totalprice") > F.col("a"))
    return (
        big.join(repeat_cust.select("o_custkey"), "o_custkey", "left_semi")
        .join(c, F.col("o_custkey") == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("mktsegment"))
        .agg(F.count(F.lit(1)).alias("n_big_orders"))
    )


# ---------------------------------------------------------------------------
# B12: scalar function sweep — strings, dates, conditionals, json
# ---------------------------------------------------------------------------
@query(
    "b12_scalar_functions",
    oracle="""
    SELECT p_partkey,
           LOWER(p_name) AS name_lower,
           UPPER(p_brand) AS brand_upper,
           LENGTH(p_name) AS name_len,
           SUBSTR(p_name, 1, 5) AS name_prefix,
           REPLACE(p_type, ' ', '_') AS type_snake,
           TRIM(' x ' || p_brand || ' ') AS brand_wrapped,
           INSTR(p_name, 'a') AS first_a,
           COALESCE(NULLIF(p_brand, 'Brand#1'), 'OTHER') AS brand_or_other,
           ABS(p_size - 25) AS size_dist,
           CAST(ROUND(CAST(p_retailprice AS DECIMAL(12,2)) / 10, 1) AS DOUBLE) AS price_tenth
    FROM part
    WHERE p_partkey <= 150
    """,
)
def b12_scalar_functions(spark, sf_dir):
    # The SQLite core scalar set (SURVEY §2.B12) mapped 1:1 to pyspark.sql
    # functions — all JVM-side, whole-stage-codegen'd; zero Python in the row
    # path at any scale.
    p = T(spark, sf_dir, "part").filter(F.col("p_partkey") <= 150)
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_prefix"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.trim(F.concat(F.lit(" x "), F.col("p_brand"), F.lit(" "))).alias("brand_wrapped"),
        F.instr(F.col("p_name"), "a").alias("first_a"),
        F.coalesce(F.nullif(F.col("p_brand"), F.lit("Brand#1")), F.lit("OTHER")).alias(
            "brand_or_other"
        ),
        F.abs(F.col("p_size") - 25).alias("size_dist"),
        F.round(F.col("p_retailprice").cast(DEC) / 10, 1).cast("double").alias("price_tenth"),
    )


@query(
    "b12_datetime_functions",
    oracle="""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS order_year,
           CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS order_month,
           STRFTIME(MIN(o_orderdate), '%Y-%m-%d') AS first_day,
           STRFTIME(MAX(o_orderdate), '%Y-%m-%d') AS last_day,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY 1, 2
    """,
)
def b12_datetime_functions(spark, sf_dir):
    # SQLite date/time (`strftime`, `datetime`) → Spark date_format / extract
    # (SURVEY §2.B12's dialect-shim row); group-by-month is partial-agg
    # friendly at any scale.
    o = T(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            F.month("o_orderdate").cast("bigint").alias("order_month"),
        )
        .agg(
            F.date_format(F.min("o_orderdate"), "yyyy-MM-dd").alias("first_day"),
            F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_day"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "b12_json_functions",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
)
def b12_json_functions(spark, sf_dir):
    # SQLite json1 (`json_extract`) → get_json_object (SURVEY §2.B12).
    # Scale: JSON parse happens map-side before the 5-group aggregation.
    e = T(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# B5: theta join + cross join (SQLite nested-loop surface, SURVEY §2.B5)
# ---------------------------------------------------------------------------
@query(
    "b5_theta_cross_join",
    oracle="""
    SELECT s_suppkey, COUNT(*) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS price_sum
    FROM supplier JOIN part ON p_size > s_suppkey AND p_size <= s_suppkey + 10
    GROUP BY s_suppkey
    """,
)
def b5_theta_cross_join(spark, sf_dir):
    # Theta (range) join: Catalyst executes small-side broadcast nested loop.
    # Scale note: theta joins over TWO big tables are inherently quadratic —
    # the engine keeps them legal but the scale path is banding the range
    # into equi-join buckets (as the dedup operators do).
    s, p = T(spark, sf_dir, "supplier"), T(spark, sf_dir, "part")
    return (
        F.broadcast(s)
        .join(p, (p.p_size > s.s_suppkey) & (p.p_size <= s.s_suppkey + 10))
        .groupBy("s_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum(F.col("p_retailprice").cast(DEC)).cast("double").alias("price_sum"),
        )
    )


# ---------------------------------------------------------------------------
# B6: HAVING
# ---------------------------------------------------------------------------
@query(
    "b6_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS spend
    FROM orders
    GROUP BY o_custkey
    HAVING COUNT(*) >= 3 AND SUM(CAST(o_totalprice AS DECIMAL(12,2))) > 300000
    """,
)
def b6_having(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    spend_dec = F.sum(F.col("o_totalprice").cast(DEC))
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            spend_dec.cast("double").alias("spend"),
            spend_dec.alias("_spend_dec"),
        )
        .filter((F.col("n_orders") >= 3) & (F.col("_spend_dec") > 300000))
        .drop("_spend_dec")
    )


# ---------------------------------------------------------------------------
# B8: RANGE frames (value-based windows)
# ---------------------------------------------------------------------------
@query(
    "b8_range_frames",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           CAST(o_totalprice AS DOUBLE) AS price,
           COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice
                          RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS n_within_1k
    FROM orders
    WHERE o_orderkey <= 500
    """,
)
def b8_range_frames(spark, sf_dir):
    from pyspark.sql import Window as W

    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    w = W.partitionBy("o_orderstatus").orderBy("o_totalprice").rangeBetween(-1000, 1000)
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").cast("double").alias("price"),
        F.count(F.lit(1)).over(w).alias("n_within_1k"),
    )


# ---------------------------------------------------------------------------
# B8: GROUPS frames + EXCLUDE (dense_rank composition — Spark lacks both)
# ---------------------------------------------------------------------------
@query(
    "b8_groups_frames",
    oracle="""
    WITH t AS (
      SELECT o_orderkey, o_orderstatus,
             CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS band,
             CAST(o_totalprice AS DECIMAL(12,2)) AS price_dec,
             DENSE_RANK() OVER (PARTITION BY o_orderstatus
                                ORDER BY CAST(FLOOR(o_totalprice / 50000) AS BIGINT)) AS g
      FROM orders WHERE o_orderkey <= 500
    )
    SELECT o_orderkey, o_orderstatus, band,
           CAST(SUM(price_dec) OVER (PARTITION BY o_orderstatus ORDER BY g
                RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE) AS band_sum,
           COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY g
                RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS band_n,
           COUNT(*) OVER (PARTITION BY o_orderstatus ORDER BY g
                RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP) AS n_nbr,
           CAST(SUM(price_dec) OVER (PARTITION BY o_orderstatus ORDER BY g
                RANGE BETWEEN 1 PRECEDING AND CURRENT ROW EXCLUDE TIES) AS DOUBLE)
             AS run_excl_ties
    FROM t
    """,
)
def b8_groups_frames(spark, sf_dir):
    """GROUPS BETWEEN 1 PRECEDING AND 1 FOLLOWING (+ EXCLUDE GROUP / TIES)
    over price bands.  Spark has no GROUPS frame; `operators.windows`
    composes it as dense_rank + RANGE — the DuckDB oracle uses the same
    identity because DuckDB lacks GROUPS too (SQLite window.c defines the
    semantics both reproduce).  One shuffle: every window shares the
    o_orderstatus partitioning."""
    from trough_spark.operators import windows as GW

    o = T(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 500)
    t = o.select(
        "o_orderkey",
        "o_orderstatus",
        F.floor(F.col("o_totalprice") / 50000).cast("bigint").alias("band"),
        F.col("o_totalprice").cast(DEC).alias("price_dec"),
    )
    t = GW.groups_frame(
        t, "o_orderstatus", "band", "price_dec", 1, 1,
        out_sum="_band_sum_dec", out_count="band_n",
    )
    t = GW.groups_frame(
        t, "o_orderstatus", "band", "price_dec", 1, 1, exclude=GW.GROUP,
        out_sum="_drop1", out_count="n_nbr",
    )
    t = GW.groups_frame(
        t, "o_orderstatus", "band", "price_dec", 1, 0, exclude=GW.TIES,
        out_sum="_ret_dec", out_count="_drop2",
    )
    return t.select(
        "o_orderkey",
        "o_orderstatus",
        "band",
        F.col("_band_sum_dec").cast("double").alias("band_sum"),
        "band_n",
        "n_nbr",
        F.col("_ret_dec").cast("double").alias("run_excl_ties"),
    )


# ---------------------------------------------------------------------------
# B9: NULLS FIRST/LAST ordering
# ---------------------------------------------------------------------------
@query(
    "b9_nulls_ordering",
    oracle="""
    SELECT p_partkey, NULLIF(p_brand, 'Brand#1') AS brand_or_null
    FROM part
    WHERE p_partkey <= 60
    ORDER BY NULLIF(p_brand, 'Brand#1') DESC NULLS FIRST, p_partkey
    LIMIT 30
    """,
)
def b9_nulls_ordering(spark, sf_dir):
    p = T(spark, sf_dir, "part").filter(F.col("p_partkey") <= 60)
    brand = F.nullif(F.col("p_brand"), F.lit("Brand#1"))
    return (
        p.select("p_partkey", brand.alias("brand_or_null"))
        .orderBy(F.col("brand_or_null").desc_nulls_first(), F.col("p_partkey"))
        .limit(30)
    )


# ---------------------------------------------------------------------------
# B11: correlated EXISTS / NOT EXISTS → semi/anti joins
# ---------------------------------------------------------------------------
@query(
    "b11_exists_anti",
    oracle="""
    SELECT n_name AS nation,
           (SELECT COUNT(*) FROM customer c
            WHERE c.c_nationkey = n.n_nationkey
              AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderpriority = '1-URGENT')) AS with_urgent,
           (SELECT COUNT(*) FROM customer c
            WHERE c.c_nationkey = n.n_nationkey
              AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS no_orders
    FROM nation n
    """,
)
def b11_exists_anti(spark, sf_dir):
    # EXISTS/NOT EXISTS are SQLite's spelling of semi/anti joins
    # (SURVEY §2.B5/B11); built explicitly as left_semi / left_anti here.
    c, o, n = (T(spark, sf_dir, t) for t in ("customer", "orders", "nation"))
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    with_urgent = (
        c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi")
        .groupBy(F.col("c_nationkey").alias("nk_u"))
        .agg(F.count(F.lit(1)).alias("with_urgent"))
    )
    no_orders = (
        c.join(o.select("o_custkey"), c.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("nk_n"))
        .agg(F.count(F.lit(1)).alias("no_orders"))
    )
    return (
        n.join(with_urgent, n.n_nationkey == F.col("nk_u"), "left")
        .join(no_orders, n.n_nationkey == F.col("nk_n"), "left")
        .select(
            F.col("n_name").alias("nation"),
            F.coalesce("with_urgent", F.lit(0)).alias("with_urgent"),
            F.coalesce("no_orders", F.lit(0)).alias("no_orders"),
        )
    )


# ---------------------------------------------------------------------------
# B6+: exact percentiles (interpolated) — analytics staple beyond SQLite
# ---------------------------------------------------------------------------
@query(
    "b6_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_extendedprice, 0.25) AS p25_price,
           quantile_cont(l_extendedprice, 0.95) AS p95_price,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def b6_percentiles(spark, sf_dir):
    # Spark's exact `percentile` and DuckDB's quantile_cont share the same
    # linear-interpolation definition — verified bit-identical.  At 100 TB
    # swap to approx_percentile with a documented error bound; the exact
    # form is the correctness baseline.
    l = T(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_extendedprice, 0.25)").alias("p25_price"),
        F.expr("percentile(l_extendedprice, 0.95)").alias("p95_price"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# B7 (completion): CUBE + GROUPING SETS with grouping markers
# ---------------------------------------------------------------------------
@query(
    "b7_cube_grouping_sets",
    oracle="""
    SELECT COALESCE(o_orderstatus, '<all>')   AS status,
           COALESCE(o_orderpriority, '<all>') AS priority,
           GROUPING(o_orderstatus)            AS g_status,
           GROUPING(o_orderpriority)          AS g_priority,
           COUNT(*)                           AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def b7_cube_grouping_sets(spark, sf_dir):
    # Scale: CUBE expands each row to 4 grouping sets map-side, but partial
    # aggregation collapses them before the single shuffle — same exchange
    # count as a plain groupBy.  GROUPING() markers (not the coalesced
    # label) are what disambiguate a real '<all>' value from a rollup row.
    o = T(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(DEC)).cast("double").alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "g_status",
            "g_priority",
            "n_orders",
            "total",
        )
    )


# ---------------------------------------------------------------------------
# B6 (completion): PIVOT — wide per-category aggregates
# ---------------------------------------------------------------------------
@query(
    "b6_pivot_priority",
    oracle="""
    SELECT o_orderstatus AS status,
           COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT')  AS p1_urgent,
           COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH')    AS p2_high,
           COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM')  AS p3_medium,
           COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p4_notspec,
           COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW')     AS p5_low
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def b6_pivot_priority(spark, sf_dir):
    # Scale: the pivot VALUE LIST is fixed, so Spark skips the extra
    # distinct-collect job it would otherwise run to discover columns —
    # at 100 TB that discovery pass is a full scan you don't want.  The
    # pivot itself is a normal partial-agg groupBy: one shuffle.
    o = T(spark, sf_dir, "orders")
    pivoted = (
        o.groupBy(F.col("o_orderstatus").alias("status"))
        .pivot(
            "o_orderpriority",
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
        )
        .agg(F.count(F.lit(1)))
    )
    renames = {
        "1-URGENT": "p1_urgent",
        "2-HIGH": "p2_high",
        "3-MEDIUM": "p3_medium",
        "4-NOT SPECIFIED": "p4_notspec",
        "5-LOW": "p5_low",
    }
    out = pivoted
    for old, new in renames.items():
        out = out.withColumnRenamed(old, new)
    # pivot leaves NULL where a (status, priority) cell has no rows; the
    # FILTER oracle produces 0 — align on 0
    return out.select(
        "status",
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in renames.values()],
    )


# ---------------------------------------------------------------------------
# Data layout: Z-order clustering key (operators/layout.py)
# ---------------------------------------------------------------------------
def _zorder_oracle() -> str:
    from trough_spark.operators.layout import zvalue_sql

    return f"""
    WITH d AS (
      SELECT o_orderkey,
             CAST(o_custkey & 65535 AS BIGINT) AS x,
             CAST(floor(o_totalprice) AS BIGINT) & 65535 AS y
      FROM orders
    )
    SELECT o_orderkey, x, y, {zvalue_sql('x', 'y')} AS z
    FROM d
    ORDER BY z, o_orderkey
    LIMIT 50
    """


@query("layout_zorder_key", oracle=_zorder_oracle())
def layout_zorder_key(spark, sf_dir):
    """Morton keys for orders on (custkey, price) — first 50 in z order.
    The full layout op is layout.zorder_repartition (range partition + sort
    by this key); the query pins the key computation bit-for-bit."""
    from trough_spark.operators.layout import zvalue

    o = T(spark, sf_dir, "orders")
    d = o.select(
        "o_orderkey",
        F.col("o_custkey").cast("bigint").bitwiseAND(F.lit(65535)).alias("x"),
        F.floor("o_totalprice").cast("bigint").bitwiseAND(F.lit(65535)).alias("y"),
    )
    return (
        d.select("o_orderkey", "x", "y", zvalue(F.col("x"), F.col("y")).alias("z"))
        .orderBy("z", "o_orderkey")
        .limit(50)
    )
