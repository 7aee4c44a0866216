"""Bloom-filter semi-join pruning query, hash-checked against DuckDB.

Shows the full prune pipeline on TPC-H-ish tables: a selective customer
predicate builds a ~0.5 KB filter, the orders fact table is marked by a
pure-map membership check (no shuffle), and the output audits the filter —
rows passed, true semi-join members, and false positives per order
priority.  Downstream, `bloom_pass` is the prefilter applied before the
real join's exchange; false positives are harmless (the join re-checks),
false negatives are impossible.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from trough_spark.operators import bloom as B
from trough_spark.queries import query
from trough_spark.tables import load_table as T

_K = 4
_WORDS = 64

_ORACLE = f"""
    WITH {B.bloom_oracle_sql(
        "SELECT c_custkey AS key FROM customer WHERE c_acctbal > 9000",
        "SELECT o_custkey AS key FROM orders",
        "key", k=_K, n_words=_WORDS,
    )}
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN pm.bloom_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pass,
           CAST(SUM(CASE WHEN bk.key IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
           CAST(SUM(CASE WHEN pm.bloom_pass AND bk.key IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_false_pos
    FROM orders o
    LEFT JOIN probe_marked pm ON o.o_custkey = pm.key
    LEFT JOIN build_keys bk ON o.o_custkey = bk.key
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
"""


@query("bloom_semijoin_prune", oracle=_ORACLE)
def bloom_semijoin_prune(spark, sf_dir):
    """Per-priority audit of bloom pruning: orders marked against a filter
    built from high-balance customers.  At 100 TB the marked fact table
    feeds the real join with ~(selectivity + fp rate) of its rows — the
    shuffle shrinks by the same factor, for one broadcast of 64 BIGINTs."""
    cust = (
        T(spark, sf_dir, "customer")
        .where(F.col("c_acctbal") > 9000)
        .select(F.col("c_custkey").alias("key"))
    )
    bloom = B.bloom_build(cust, "key", k=_K, n_words=_WORDS)
    orders = T(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    marked = B.bloom_might_contain(orders, "o_custkey", bloom, k=_K, n_words=_WORDS)
    truth = cust.distinct().withColumnRenamed("key", "o_custkey").withColumn(
        "_true", F.lit(True)
    )
    audited = marked.join(F.broadcast(truth), "o_custkey", "left")
    return (
        audited.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("bloom_pass").cast("int")).cast("bigint").alias("n_bloom_pass"),
            F.sum(F.coalesce(F.col("_true"), F.lit(False)).cast("int"))
            .cast("bigint")
            .alias("n_true"),
            F.sum((F.col("bloom_pass") & F.col("_true").isNull()).cast("int"))
            .cast("bigint")
            .alias("n_false_pos"),
        )
        .orderBy("o_orderpriority")
    )
